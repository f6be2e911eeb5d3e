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
    """(id, buckets) -> (prefix_id, table, bucket): the NARROW projection
    that rides the bucket join — vectors re-attach to the (much smaller)
    candidate set afterwards via id-keyed joins (same slimming as the
    minhash band join)."""
    return df.select(
        F.col("id").alias(f"{prefix}_id"),
        F.posexplode("buckets").alias("table", "bucket"),
    )


def embed_dedup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    dim: int = 64,
    n_planes: int = 5,
    n_tables: int = 12,
) -> DataFrame:
    """Embedding-cosine near-dup PAIRS at scale: hyperplane-LSH bucket
    self-join replaces the quadratic all-pairs scan, exact cosine confirms
    candidates (so no false positives ever — only probabilistic recall).

    Recall: a pair at angle theta collides in one table with p^n_planes,
    p = 1 - theta/pi; P(found) = 1-(1-p^b)^T. At the defaults and
    cosine >= 0.85 that is ~99.7%; exact duplicates (cosine 1.0) hash to
    identical buckets in every table, so they are ALWAYS found. The bucket
    self-join ships (id, table, bucket) only; vectors re-attach to the
    deduped candidate pairs via two narrow id joins.

    -> (id_a, id_b, cosine) with id_a < id_b, cosine >= threshold. Feed
    into operators/cluster.keep_one_per_cluster to actually drop rows.
    """
    base = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    ex = _explode_tables(
        with_lsh_buckets(base, "vec", dim, n_planes, n_tables), "x"
    )
    a = ex.select(F.col("x_id").alias("id_a"), "table", "bucket")
    b = ex.select(F.col("x_id").alias("id_b"), "table", "bucket")
    pairs = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = base.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    vb = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine_expr("vec_a", "vec_b").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def build_embed_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 5,
    n_tables: int = 12,
) -> DataFrame:
    """Persistable ANN bucket index: narrow (id, table, bucket) rows —
    ~24 bytes x n_tables per vector instead of the embedding itself. The
    hyperplanes are a fixed-seed pure function, so an index built today
    probes identically forever; exact-cosine confirmation fetches vectors
    from the corpus by id at probe time (the seen-filter / exact-dedup
    pattern: approximate prefilter, exact confirm)."""
    base = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return _explode_tables(
        with_lsh_buckets(base, "vec", dim, n_planes, n_tables), "x"
    ).select(F.col("x_id").alias("id"), "table", "bucket")


def incremental_embed_pairs(
    new_vectors: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    dim: int = 64,
    n_planes: int = 5,
    n_tables: int = 12,
) -> DataFrame:
    """Near-dup pairs for a NEW embedding batch against the persisted
    bucket index (plus within-batch self pairs) — old vectors are neither
    re-bucketed nor bulk-read: only candidate ids are fetched from the
    corpus for the exact-cosine confirm.

    -> (id_a, id_b, cosine) with id_a < id_b (least/greatest-normalized;
    precondition: old and new id SETS are disjoint). Equals the
    whole-corpus embed_dedup_pairs restricted to pairs involving a new id,
    because buckets are a deterministic function of the vector.
    """
    base_new = new_vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    nb = _explode_tables(
        with_lsh_buckets(base_new, "vec", dim, n_planes, n_tables), "n"
    )
    cross = (
        nb.join(
            index.select(F.col("id").alias("_oid"), "table", "bucket"),
            ["table", "bucket"],
        )
        .select(
            F.least("_oid", "n_id").alias("id_a"),
            F.greatest("_oid", "n_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    self_pairs = (
        nb.select(F.col("n_id").alias("id_a"), "table", "bucket")
        .join(nb.select(F.col("n_id").alias("id_b"), "table", "bucket"),
              ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = cross.unionByName(self_pairs).dropDuplicates(["id_a", "id_b"])
    # vector lookup over corpus ∪ new — the inner joins touch candidate ids
    # only, so the corpus embedding column is read for candidates, not bulk
    allv = corpus.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")
    ).unionByName(base_new.select(F.col("id").alias("_vid"), F.col("vec").alias("_v")))
    va = allv.select(F.col("_vid").alias("id_a"), F.col("_v").alias("vec_a"))
    vb = allv.select(F.col("_vid").alias("id_b"), F.col("_v").alias("vec_b"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine_expr("vec_a", "vec_b").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant: k-means cells + n_probe nearest-cell search.
# Centroids are trained ONCE on a bounded, deterministically-chosen sample
# (driver-side numpy Lloyd iterations — the sample is small by construction;
# at 100 TB you train on a fixed-size sample exactly the same way), then
# assignment is a vectorized mapInPandas argmin and search is an equi-join
# on cell id over the union of the query's n_probe nearest cells.
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    sample: int = 512,
    iters: int = 5,
) -> np.ndarray:
    """Deterministic k-means: sample = lowest ids (stable), k-means++-free
    init from evenly-spaced sample rows, fixed Lloyd iterations."""
    rows = (
        vectors.orderBy(id_col).limit(sample).select(vec_col).collect()
    )
    X = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    idx = np.linspace(0, len(X) - 1, k).astype(int)
    C = X[idx].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def with_ivf_cell(df: DataFrame, centroids: np.ndarray, vec_col: str = "vec") -> DataFrame:
    out_schema = StructType(list(df.schema.fields) + [StructField("cell", LongType())])
    C = centroids

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            if len(pdf):
                M = np.vstack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
                d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                pdf["cell"] = d.argmin(axis=1).astype(np.int64)
            else:
                pdf["cell"] = pd.Series([], dtype="int64")
            yield pdf

    return df.mapInPandas(assign, out_schema)


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF search: assign corpus to cells once; each query probes its
    n_probe nearest cells; exact cosine re-rank on the candidate union.

    The cell join is NARROW — both sides ship (id, cell) only, and the
    vectors are re-attached to the deduped candidate pairs by id (the same
    slimming as the minhash band join, operators/minhash.py). A cell join
    that carries the arrays rides every embedding through the exchange
    n_probe times; at 100 TB that is the whole corpus × n_probe in shuffle
    bytes for no information the id join can't recover.
    """
    C = ivf_train_centroids(vectors, id_col, vec_col, k=n_cells)
    cands = vectors.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")
    )
    vb = with_ivf_cell(cands, C, "cand_vec").select("cand_id", "cell")

    # per-query probe cells (driver-free: computed in the same assign UDF
    # shape, emitting n_probe narrow (query_id, cell) rows per query)
    out_schema = StructType(
        [
            StructField("query_id", queries.schema[id_col].dataType),
            StructField("cell", LongType()),
        ]
    )

    def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for qid, vec in zip(pdf[id_col], pdf[vec_col]):
                v = np.asarray(vec, dtype=np.float64)
                d = ((C - v[None, :]) ** 2).sum(axis=1)
                for cell in np.argsort(d)[:n_probe]:
                    rows.append((qid, int(cell)))
            yield pd.DataFrame(rows, columns=["query_id", "cell"])

    qb = queries.mapInPandas(probe, out_schema)
    pairs = (
        qb.join(vb, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .dropDuplicates(["query_id", "cand_id"])
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    scored = (
        pairs.join(qs, "query_id")
        .join(cands, "cand_id")
        .withColumn("cosine", cosine_expr("query_vec", "cand_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cosine", "rk")
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
    cands = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    qs = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    vb = _explode_tables(
        with_lsh_buckets(cands, "vec", dim, n_planes, n_tables), "cand"
    )
    qb = _explode_tables(
        with_lsh_buckets(qs, "vec", dim, n_planes, n_tables), "query"
    )
    pairs = (
        qb.join(vb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = (
        pairs.join(qs.select(F.col("id").alias("query_id"), F.col("vec").alias("query_vec")), "query_id")
        .join(cands.select(F.col("id").alias("cand_id"), F.col("vec").alias("cand_vec")), "cand_id")
        .withColumn("cosine", cosine_expr("query_vec", "cand_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cosine", "rk")
    )
