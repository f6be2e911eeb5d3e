"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the crawl-cycle skeleton (canonicalize →
hash → seen anti-join → salted per-host top-k) over sf0.001 tables.
``queries()`` / ``oracle_sql()`` — operator battery from SURVEY.md §2,
verified against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-host politeness top-k with anti-join dedup (J1+W1),
    the crawl cycle's skeleton (SURVEY.md §7.2), over sf0.001."""
    from pyspark.sql import functions as F

    from croawl_spark.functions import urls as U
    from croawl_spark.operators.ranking import salted_topk

    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    raw = orders.select(
        F.concat(
            F.lit("HTTP://Host"),
            (F.col("o_custkey") % 20).cast("string"),
            F.lit(".Example/a/../order/"),
            F.col("o_orderkey").cast("string"),
            F.lit("#frag"),
        ).alias("url"),
        (F.col("o_orderkey") % 3).cast("int").alias("depth"),
        F.col("o_orderkey").alias("disc_seq"),
    )
    frontier = raw.select(
        U.canon("url").alias("canon_url"), "depth", "disc_seq"
    ).withColumn("url_hash", U.url_hash("canon_url")).withColumn(
        "host", U.host_of("canon_url")
    )
    seen = frontier.filter(F.col("disc_seq") % 5 == 0).select("url_hash")
    candidates = frontier.join(seen, "url_hash", "left_anti")
    batch = salted_topk(
        candidates,
        group_col="host",
        order_cols=[F.col("depth"), F.col("disc_seq")],
        k=3,
        salt_src="url_hash",
        n_salt=8,
    )
    return batch.select("host", "canon_url", "depth", "disc_seq", "host_rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from croawl_spark.plans.verify_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from croawl_spark.plans.verify_queries import ORACLE

    return dict(ORACLE)
