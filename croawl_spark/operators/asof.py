"""As-of join (J6) — OSS Spark has no native as-of, so it is emulated.

Two known emulations:

  window form (the oracle): range-join then ``row_number() OVER
  (PARTITION BY left_key ORDER BY right_time DESC) = 1``. Correct, but the
  window SHUFFLES every (left x matching-right) row before discarding all
  but one — under power-key skew (one user with 10^6 orders) the full
  match explosion crosses the exchange.

  aggregate form (this operator): the same range-join feeds a hash
  aggregate ``max_by(value, (right_time, tiebreak))`` keyed by the left
  row id. max_by is a declarative aggregate with MAP-SIDE PARTIAL
  aggregation, so each join task collapses its matches to one candidate
  per left row before the shuffle — the exchange carries at most
  (#left-rows x #join-tasks) rows instead of the full explosion.

Both forms are deterministic given a total tiebreak order; the driver key
``join_asof_emul`` runs the aggregate form against the window-form DuckDB
oracle, proving equivalence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_key: str,
    pick: str,
    order_by: list[str],
    how: str = "left",
    alias: str | None = None,
) -> DataFrame:
    """For each left row (identified by unique ``left_key``), attach
    ``pick`` from the right row maximal under ``order_by`` among rows
    matching ``on`` (put the as-of range condition, e.g.
    ``right.ts <= left.ts``, inside ``on``).

    order_by must be a total order over matching right rows (include a
    unique tiebreaker). With how='left', unmatched left rows yield NULL.
    Returns (left_key, <alias or pick>); join back on left_key for more
    left columns — the aggregate keeps the hot path narrow.
    """
    j = left.join(right, on, how)
    ord_struct = F.struct(*[F.col(c) for c in order_by])
    return j.groupBy(left_key).agg(
        F.max_by(pick, ord_struct).alias(alias or pick)
    )
