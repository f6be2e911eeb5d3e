"""Deterministic dedup operators (A4 + training-data dedup family).

``dropDuplicates`` is shuffle-order-dependent (keeps an arbitrary row per
key), so the crawl path never uses it; first-wins dedup is expressed as an
explicit min-by over a total order — identical result at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_wins(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """Keep, per key, the row that is minimal under order_cols (A4).

    order_cols must be a total order per key (include a unique tiebreaker).
    Implemented as a window rank — one shuffle on key, map-side pre-filter
    free via AQE; at 10^10 scale the key is url_hash so the shuffle is the
    same exchange the downstream anti-join needs (reused partitioning).
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_fw", F.row_number().over(w))
        .filter(F.col("_fw") == 1)
        .drop("_fw")
    )


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact content dedup: group by content, keep smallest id (deterministic)."""
    return df.groupBy(content_col).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt")
    )
