"""Similarity search over embedding columns.

Two paths (task brief "similarity search"):
  * brute-force cosine top-k — exact baseline, DataFrame-native
    (verify_queries.q_ann_cosine is the oracle-checked integer-exact form)
  * multi-table random-hyperplane LSH — the scale path. T independent
    tables of b hyperplanes each; a candidate is considered if it shares a
    bucket with the query in ANY table (OR-amplification), then exact
    cosine re-ranks the candidate set. Recall/pruning trade-off:
    P(candidate) = 1-(1-p^b)^T with p = 1 - angle/pi. At 100 TB the
    bucket equi-join replaces the quadratic cross join; tables explode the
    data T-fold but each join partition stays bucket-local and AQE
    rebalances skewed buckets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType


def _hyperplanes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    rng = np.random.RandomState(42)  # fixed: buckets must be deterministic
    return rng.standard_normal((n_tables, dim, n_planes)).astype(np.float64)


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 5,
    n_tables: int = 12,
) -> DataFrame:
    """Append ``buckets: array<long>`` — one sign-bit bucket per table."""
    out_schema = StructType(
        list(df.schema.fields) + [StructField("buckets", ArrayType(LongType()))]
    )
    W = _hyperplanes(dim, n_planes, n_tables)
    pw = 1 << np.arange(n_planes, dtype=np.int64)

    def bucketize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            if len(pdf):
                M = np.vstack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
                bks = []
                for t in range(n_tables):
                    signs = (M @ W[t]) > 0
                    bks.append((signs * pw).sum(axis=1).astype(np.int64))
                stacked = np.stack(bks, axis=1)  # (n, T)
                pdf["buckets"] = [row.tolist() for row in stacked]
            else:
                pdf["buckets"] = pd.Series([], dtype=object)
            yield pdf

    return df.mapInPandas(bucketize, out_schema)


def cosine_expr(a: str, b: str) -> F.Column:
    """Exact cosine between two array<float/double> columns, JVM-side:
    zip_with product fold — no Python."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    n2 = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return dot / (n1 * n2)


def _explode_tables(df: DataFrame, prefix: str) -> DataFrame:
    return df.select(
        F.col("id").alias(f"{prefix}_id"),
        F.col("vec").alias(f"{prefix}_vec"),
        F.posexplode("buckets").alias("table", "bucket"),
    )


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 5,
    n_tables: int = 12,
) -> DataFrame:
    """Approximate top-k: multi-table bucket join -> distinct candidate
    pairs -> exact cosine re-rank."""
    vb = _explode_tables(
        with_lsh_buckets(
            vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
            "vec", dim, n_planes, n_tables,
        ),
        "cand",
    )
    qb = _explode_tables(
        with_lsh_buckets(
            queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
            "vec", dim, n_planes, n_tables,
        ),
        "query",
    )
    pairs = (
        qb.join(vb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "query_vec", "cand_id", "cand_vec")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = pairs.withColumn("cosine", cosine_expr("query_vec", "cand_vec"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cosine", "rk")
    )
