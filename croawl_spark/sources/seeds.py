"""Seed-list source (S3): a text file of URLs, one per line; line number is
the discovery sequence (disc_seq) BEFORE canonicalization.

File order matters (first-wins dedup), but ``spark.read.text`` gives no
row-order guarantee across splits. ``zipWithIndex`` over the text RDD is
deterministic for file sources (splits are ordered by file offset) — one of
the rare sanctioned RDD uses (SURVEY.md S3). For multi-file seed dirs the
order is (file name, offset), also deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_seeds(spark: SparkSession, path: str) -> DataFrame:
    """-> DataFrame(url string, seed_seq long) preserving file order."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(
        rdd.map(lambda t: (t[0].strip(), t[1])), "url string, seed_seq long"
    ).filter("url <> ''")
