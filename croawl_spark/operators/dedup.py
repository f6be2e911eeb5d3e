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
    Implemented as ``min_by(struct(<row>), struct(<order>))`` — a hash
    aggregate with MAP-SIDE PARTIAL AGGREGATION, so duplicate keys collapse
    before the shuffle. A window-rank formulation would ship every raw row
    through the exchange; on a link stream with ~4x duplication that is 4x
    the shuffle bytes. Deterministic: min over a total order.
    """
    cols = df.columns
    row = F.struct(*[F.col(c) for c in cols])
    order = F.struct(*[F.col(c) for c in order_cols])
    agg = df.groupBy(key).agg(F.min_by(row, order).alias("_row"))
    return agg.select(*[F.col(f"_row.{c}").alias(c) for c in cols])


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact content dedup: group by content, keep smallest id (deterministic)."""
    return df.groupBy(content_col).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt")
    )
