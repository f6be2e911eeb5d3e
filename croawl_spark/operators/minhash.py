"""MinHash + LSH near-duplicate detection — fully DataFrame-native.

Everything stays JVM-side (no Python in the hot path): shingling via
higher-order array functions, permutation hashes via ``xxhash64(shingle, p)``
(seeded by the permutation index as a literal column), signatures via
grouped MIN aggregates, banding via ``xxhash64`` over signature slices.

Scale shape: one explode (docs x shingles), one groupBy(doc) for signatures,
one explode (docs x bands), one self-join on (band, key) — the classic
shingle -> minhash -> band -> bucket-join pipeline. The band join is an
equi-join on a high-cardinality key, so it shuffles well and AQE handles
skewed buckets (e.g. boilerplate-heavy corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(df: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """Add ``shingles: array<string>`` of k-word shingles (distinct)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return df.withColumn("shingles", F.array_distinct(sh))


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n_perm: int = 16, k: int = 3
) -> DataFrame:
    """-> (id_col, h0..h{n_perm-1}) MinHash signature per document."""
    ex = shingles(df, text_col, k).select(
        id_col, F.explode("shingles").alias("shingle")
    )
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(p))).alias(f"h{p}") for p in range(n_perm)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, n_perm: int = 16, n_bands: int = 4
) -> DataFrame:
    """Band the signatures and self-join: pairs sharing >=1 band bucket.

    -> (id_a, id_b, est_sim) with id_a < id_b; est_sim = fraction of equal
    signature components (unbiased Jaccard estimate).
    """
    rows = n_perm // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)], F.lit(b)).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sig.select(
        F.col(id_col), *[F.col(f"h{p}") for p in range(n_perm)],
        F.explode(bands).alias("bk"),
    ).select(id_col, *[f"h{p}" for p in range(n_perm)], "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[
                (F.col(f"a.h{p}") == F.col(f"b.h{p}")).cast("int").alias(f"eq{p}")
                for p in range(n_perm)
            ],
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = sum(F.col(f"eq{p}") for p in range(n_perm)) / F.lit(float(n_perm))
    return pairs.select("id_a", "id_b", est.alias("est_sim"))


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_perm: int = 16,
    n_bands: int = 4,
    k: int = 3,
) -> DataFrame:
    sig = minhash_signature(df, id_col, text_col, n_perm, k)
    return lsh_candidate_pairs(sig, id_col, n_perm, n_bands).filter(
        F.col("est_sim") >= threshold
    )
