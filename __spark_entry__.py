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
    """Flagship: a REAL scheduler cycle end-to-end — bootstrap 80 seeds
    (canonicalize -> first-wins dedup -> robots -> bloom), run cycle 0
    (salted politeness ranking -> deterministic fetch_seq -> fetch -> DC/OAI
    parse -> frontier update), return the fetch log."""
    from croawl_spark import synth
    from croawl_spark.plans.cycle import CrawlConfig, run_crawl

    cfg = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, m_bits=1 << 12)
    io = run_crawl(
        spark, synth.gen_seeds(80), 2, "/tmp/croawl_entry_warehouse", cfg
    )
    return io.read_log("fetch_log").orderBy("fetch_seq")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from croawl_spark.plans.verify_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from croawl_spark.plans.verify_queries import ORACLE

    return dict(ORACLE)
