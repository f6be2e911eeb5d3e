"""Bucketed range join — interval ⋈ point without a nested-loop join.

Spark plans an inequality-only join condition as BroadcastNestedLoopJoin
(or a cartesian product): O(|L|·|R|) comparisons, which is the classic
100-TB cliff for event-in-window analytics (fetches within a host's
maintenance window, events inside an order's validity interval, ...).

The standard fix (Databricks' range-join hint, Flink's interval join) is
binning: quantize the dimension into fixed-width bins, explode each
interval over the bins it covers, bin the points once, equi-join on the
bin id — a plain shuffled hash join — and apply the exact inequality as a
residual filter. Candidates per point = intervals overlapping its bin, so
comparisons drop from |L|·|R| to roughly |pairs that nearly match|. Bin
width trades explode factor (wide intervals -> many bins) against
candidate precision; pick it near the median interval length.

Intervals are exploded with a JVM ``sequence()`` — no Python, and the
explode output carries ONLY (bin, interval_id); interval payload columns
re-attach to matched pairs by id (the same narrow-shuffle discipline as
the minhash band join and the IVF cell join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    interval_id: str,
    lo_col: str,
    hi_col: str,
    point_id: str,
    point_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs (interval_id, point_id) with lo <= point <= hi (inclusive).

    lo/hi/point must be integral (cast timestamps to epoch seconds first).
    how: "inner" (matched pairs) — the only shape the residual filter
    needs; callers outer-join the result back by id for left semantics.
    """
    assert how == "inner", "outer shapes: join the pair set back by id"
    w = int(bin_width)
    ivals = intervals.select(
        F.col(interval_id).alias("_iid"),
        F.col(lo_col).cast("long").alias("_lo"),
        F.col(hi_col).cast("long").alias("_hi"),
    ).filter(F.col("_lo") <= F.col("_hi"))
    # Binning uses truncating division on BOTH sides. Trunc != floor for
    # negatives, but correctness only needs the SAME monotone non-decreasing
    # bin function everywhere: lo <= pt <= hi then implies
    # bin(lo) <= bin(pt) <= bin(hi), so every matching point lands in a bin
    # the interval exploded into.
    # explode each interval over the bins it covers — narrow (bin, id) rows
    ibins = ivals.select(
        "_iid",
        "_lo",
        "_hi",
        F.explode(
            F.sequence(
                (F.col("_lo") / w).cast("long"),
                (F.col("_hi") / w).cast("long"),
            )
        ).alias("_bin"),
    )
    pbins = points.select(
        F.col(point_id).alias("_pid"),
        F.col(point_col).cast("long").alias("_pt"),
        (F.col(point_col).cast("long") / w).cast("long").alias("_bin"),
    )
    pairs = (
        ibins.join(pbins, "_bin")
        .filter((F.col("_pt") >= F.col("_lo")) & (F.col("_pt") <= F.col("_hi")))
        .select(
            F.col("_iid").alias(interval_id),
            F.col("_pid").alias(point_id),
        )
        # a point can meet the same interval in ONE bin only (its own), so
        # no dedup is needed — the pair set is exact as-is
    )
    return pairs


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_lo: str,
    left_hi: str,
    right_id: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
) -> DataFrame:
    """Interval ⋈ interval overlap join ([l_lo,l_hi] ∩ [r_lo,r_hi] ≠ ∅,
    inclusive) without a nested loop — the span-alignment primitive
    (subtitle spans vs video-frame spans, fetch windows vs maintenance
    windows, token spans vs annotation spans).

    Same binning as range_join, on BOTH sides. A pair of overlapping
    intervals shares every bin their intersection covers, which would
    duplicate pairs; instead of a dropDuplicates shuffle, each pair is
    emitted from exactly ONE canonical bin — the bin of
    max(l_lo, r_lo), a point that always lies inside the intersection, so
    both sides are guaranteed to have exploded into it. The join output
    is therefore exact with no dedup pass.

    lo/hi must be integral (cast timestamps to epoch seconds first).
    -> (left_id, right_id) pairs.
    """
    w = int(bin_width)

    def bins(df: DataFrame, idc: str, lo: str, hi: str, p: str) -> DataFrame:
        return (
            df.select(
                F.col(idc).alias(f"_{p}id"),
                F.col(lo).cast("long").alias(f"_{p}lo"),
                F.col(hi).cast("long").alias(f"_{p}hi"),
            )
            .filter(F.col(f"_{p}lo") <= F.col(f"_{p}hi"))
            .select(
                f"_{p}id",
                f"_{p}lo",
                f"_{p}hi",
                F.explode(
                    F.sequence(
                        (F.col(f"_{p}lo") / w).cast("long"),
                        (F.col(f"_{p}hi") / w).cast("long"),
                    )
                ).alias("_bin"),
            )
        )

    lb = bins(left, left_id, left_lo, left_hi, "l")
    rb = bins(right, right_id, right_lo, right_hi, "r")
    return (
        lb.join(rb, "_bin")
        .filter(
            (F.col("_llo") <= F.col("_rhi")) & (F.col("_rlo") <= F.col("_lhi"))
        )
        .filter(
            F.col("_bin")
            == (F.greatest("_llo", "_rlo") / w).cast("long")
        )
        .select(F.col("_lid").alias(left_id), F.col("_rid").alias(right_id))
    )
