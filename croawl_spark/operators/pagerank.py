"""Host-level PageRank — crawl prioritization signal over the link graph.

A frontier scheduler that knows host importance can spend its politeness
budget on high-value hosts first; PageRank over the host->host link graph
is the classic signal (Page et al., 1999; Cho/Garcia-Molina/Page used it
to order crawls). Expressed as the standard iterative power method in
DataFrame joins:

  rank_{t+1}(v) = (1-d)/N + d * sum_{u->v} rank_t(u) / out_deg(u)

Scale shape (same discipline as operators/cluster.py):
  * each round is ONE equi-join (edges ⋈ ranks on src) + one map-side-
    partial sum aggregate on dst — both shuffle narrow (src, dst, double).
  * dangling mass (vertices with no outlinks) is redistributed uniformly
    via a single scalar aggregate per round, not a cross join.
  * fixed iteration count (deterministic at any parallelism; convergence
    at web scale takes ~50 rounds, callers tune n_iter), lineage truncated
    per round with localCheckpoint so plans don't grow.
  * out-degrees computed once and persisted; the per-round join reuses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """-> (id, rank); sum(rank) == 1 up to float error every round.

    vertices: one row per vertex (isolated vertices allowed). edges:
    directed pair list; duplicate edges are deduped (unweighted graph).
    """
    v = vertices.select(F.col(id_col).alias("id")).distinct().localCheckpoint()
    n = v.count()
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .join(v.select(F.col("id").alias("src")), "src", "left_semi")
        .join(v.select(F.col("id").alias("dst")), "dst", "left_semi")
        .persist()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).persist()
    ranks = v.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for _ in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        # dangling vertices leak their mass: recover it as ONE scalar and
        # spread uniformly (1 - sum of mass that flowed through edges).
        # This is a tiny per-round collect ON PURPOSE: folding the scalar
        # into the round's plan as a broadcast 1-row aggregate (crossJoin)
        # was measured ~30% SLOWER at sf0.1 — the heavier single AQE job
        # costs more than the extra trivial job, the same result as the
        # connected-components convergence experiments (cluster.py).
        flowed = (
            ranks.join(out_deg, ranks.id == out_deg.src, "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        dangling = (1.0 - flowed) / n
        ranks = (
            v.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.lit(dangling))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    out_deg.unpersist()
    return ranks
