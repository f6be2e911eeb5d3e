"""MinHash + LSH near-duplicate detection — fully DataFrame-native.

Everything stays JVM-side (no Python in the hot path): shingling via
higher-order array functions, permutation hashes via ``xxhash64(shingle, p)``
(seeded by the permutation index as a literal column), signatures via
grouped MIN aggregates collected into ONE ``array<long>`` column, banding
via ``xxhash64`` over signature slices.

Scale shape: one explode (docs x shingles), one groupBy(doc) for signatures,
one explode (docs x bands), one self-join on (band, key) — the classic
shingle -> minhash -> band -> bucket-join pipeline. The band self-join is
projected down to (id, band, key) BEFORE the shuffle: signatures are
re-attached to the (much smaller) candidate-pair set afterwards by two
narrow id-keyed joins, so the widest columns never ride the widest join.
The band join is an equi-join on a high-cardinality key, so it shuffles
well and AQE handles skewed buckets (e.g. boilerplate-heavy corpora).

Incremental path: ``minhash_signature`` output is the persistable index
(one array<long> row per doc — ~136 B at n_perm=16); a new batch probes it
with ``incremental_minhash_pairs`` — band keys for the old corpus are
re-derived from the stored signatures (16 JVM hashes/doc, no re-shingling
of old text) and only the new batch pays the shingle+minhash cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Signature tables at or below this many collected rows run LSH banding +
# candidate pairing + est_sim driver-local (n_perm=16 longs + id ≈ 136 B/row
# ≈ 3 MB through Arrow at the gate) instead of paying the band self-join /
# dropDuplicates / two re-attach joins as ~10 AQE stage jobs. Same
# collect-gate pattern as cluster.py / ann.py (r06): the corpus-scale pass
# (shingle+minhash signature aggregate) stays distributed — only the
# already-collapsed signature table crosses to the driver. Above the gate,
# or for non-integer/NULL ids, the distributed band join is unchanged.
# Gate MEASURED, not guessed: at 100k sigs with a heavy duplicate profile
# (20 copies/doc -> 1.05M true pairs) the local pairing ran 2.5x SLOWER
# than the distributed join (16.5 s vs 6.5 s warm, local[32]) — the win
# is job-overhead elimination at small candidate sets, so the gate stays
# where that regime ends (~20k sigs: local ~1 s vs ~4-6 s of stage jobs).
DRIVER_LOCAL_MAX_SIGS = 20_000
# Bound the materialized candidate set too: a pathological bucket structure
# (everything in one band bucket) is quadratic in EITHER engine, but the
# distributed join spills to disk where the driver cannot — fall back.
_DRIVER_LOCAL_MAX_PAIRS = 2_000_000


def shingles(df: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """Add ``shingles: array<string>`` of k-word shingles (distinct).

    The token array is materialized in its own projection before the
    per-position lambda (r06): an inline ``split()`` referenced inside
    ``transform``'s lambda re-splits the text once per position —
    O(tokens²) per doc. Shingle strings (and so every downstream MinHash
    signature value) are byte-identical to the inline form."""
    toks = F.col("_mh_toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return (
        df.withColumn("_mh_toks", F.split(F.lower(F.col(text_col)), " "))
        .withColumn("shingles", F.array_distinct(sh))
        .drop("_mh_toks")
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n_perm: int = 16, k: int = 3
) -> DataFrame:
    """-> (id_col, sig: array<long>[n_perm]) MinHash signature per document
    (``id_col`` is a document key — one row per id).

    This is also the persistable dedup index (write it with TableIO and
    probe later batches against it).

    Zero-exchange (r06 third pass, guide §2.4): each permutation minimum
    is ``array_min`` over the doc's own shingle array — a per-row JVM
    expression — instead of the historical explode + groupBy(min x16),
    which paid a full (doc x shingle) shuffle to compute a value that
    never needed cross-row data. Signature VALUES are byte-identical
    (min over the same distinct-shingle multiset, same ``xxhash64(shingle,
    p)`` hashes); the empty/NULL-shingle filter reproduces the explode
    form's row semantics (such docs emitted no row)."""
    sh = shingles(df, text_col, k)

    def _perm_min(p: int) -> F.Column:
        # NB: the lambda must stay single-argument — pyspark treats a
        # two-argument transform lambda as (element, index)
        return F.array_min(F.transform("shingles", lambda s: F.xxhash64(s, F.lit(p))))

    mins = [_perm_min(p) for p in range(n_perm)]
    return sh.filter(
        F.col("shingles").isNotNull() & (F.size("shingles") > 0)
    ).select(id_col, F.array(*mins).alias("sig"))


def _band_structs(n_perm: int, n_bands: int) -> F.Column:
    """array<struct<band,key>> derived from the ``sig`` array column."""
    rows = n_perm // n_bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.element_at("sig", b * rows + r + 1) for r in range(rows)],
                    F.lit(b),
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )


def band_keys(
    sig: DataFrame, id_col: str, n_perm: int = 16, n_bands: int = 4
) -> DataFrame:
    """(id, sig) -> (id, band, key): the narrow projection that rides the
    LSH bucket join (12 B of key per row instead of the full signature)."""
    return sig.select(
        id_col, F.explode(_band_structs(n_perm, n_bands)).alias("bk")
    ).select(id_col, "bk.band", "bk.key")


def _est_sim(n_perm: int) -> F.Column:
    """Fraction of equal components of sig_a/sig_b (unbiased Jaccard est)."""
    eq = F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / F.lit(float(n_perm))


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, n_perm: int = 16, n_bands: int = 4
) -> DataFrame:
    """Band the signatures and self-join: pairs sharing >=1 band bucket.

    -> (id_a, id_b, est_sim) with id_a < id_b. The self-join ships only
    (id, band, key); signatures re-attach to the deduped candidate pairs
    via two narrow id-keyed joins (pairs << corpus, so these joins are
    broadcast-able and the signature table crosses the wire once per doc,
    not 2 x n_bands times).
    """
    banded = band_keys(sig, id_col, n_perm, n_bands)
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
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", _est_sim(n_perm).alias("est_sim"))
    )


def _driver_local_lsh_pairs(
    sig: DataFrame, id_col: str, n_perm: int, n_bands: int
):
    """Replicate lsh_candidate_pairs driver-locally over a collected
    signature table: same band slices, same candidate semantics (pairs
    sharing >= 1 band), same est_sim arithmetic (#equal components /
    float(n_perm) — k/n_perm is float64-exact, so the downstream threshold
    compare is bit-identical).

    Bands group on the raw slice TUPLE where the distributed form groups
    on ``xxhash64(slice..., band)``; equal tuples hash equal, so the
    candidate sets coincide absent a 2^-64 xxhash64 collision — the exact
    equality standard the shingle/dedup family already documents.

    -> pandas DataFrame (id_a, id_b, est_sim) or None when ineligible
    (non-integer ids, NULLs, or a candidate blow-up past the pair cap)."""
    import numpy as np
    import pandas as pd
    import pyarrow.types as pat

    tbl = sig.toArrow()
    id_f, sig_f = tbl.schema.field(0), tbl.schema.field(1)
    if not pat.is_integer(id_f.type):
        return None
    if tbl.column(0).null_count or tbl.column(1).null_count:
        return None
    ids = tbl.column(0).to_numpy().astype(np.int64, copy=False)
    if tbl.num_rows == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "est_sim": []})
    sig_col = tbl.column(1).combine_chunks()
    flat = sig_col.flatten()
    if flat.null_count or len(flat) != tbl.num_rows * n_perm:
        return None  # ragged or null-element signatures: not ours to handle
    sigs = flat.to_numpy().astype(np.int64, copy=False).reshape(
        tbl.num_rows, n_perm
    )
    rows = n_perm // n_bands
    cand_a: list[np.ndarray] = []
    cand_b: list[np.ndarray] = []
    n_pairs = 0
    for b in range(n_bands):
        band = np.ascontiguousarray(sigs[:, b * rows : (b + 1) * rows])
        # group rows by identical band slice: lexsort + boundary detection
        order = np.lexsort(band.T[::-1])
        sb = band[order]
        new_grp = np.empty(len(sb), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (sb[1:] != sb[:-1]).any(axis=1)
        starts = np.flatnonzero(new_grp)
        ends = np.append(starts[1:], len(sb))
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2:
                continue
            n_pairs += g * (g - 1) // 2
            if n_pairs > _DRIVER_LOCAL_MAX_PAIRS:
                return None
            gi = order[s:e]
            ii, jj = np.triu_indices(g, k=1)
            cand_a.append(gi[ii])
            cand_b.append(gi[jj])
    if not cand_a:
        return pd.DataFrame({"id_a": [], "id_b": [], "est_sim": []})
    ia = np.concatenate(cand_a)
    ib = np.concatenate(cand_b)
    # orient by id value (the join predicate is id_a < id_b, not index
    # order) and drop duplicates across bands
    lo = np.where(ids[ia] < ids[ib], ia, ib)
    hi = np.where(ids[ia] < ids[ib], ib, ia)
    uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
    lo, hi = uniq[:, 0], uniq[:, 1]
    est = (sigs[lo] == sigs[hi]).sum(axis=1) / float(n_perm)
    return pd.DataFrame({"id_a": ids[lo], "id_b": ids[hi], "est_sim": est})


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_perm: int = 16,
    n_bands: int = 4,
    k: int = 3,
    driver_local_max_sigs: int | None = None,
) -> DataFrame:
    # eager (r06): the signature table feeds THREE consumers inside
    # lsh_candidate_pairs (band derivation + both re-attach sides) —
    # checkpoint it once so the shingle+minhash aggregate (the corpus-
    # scale pass) runs once instead of three times per plan. Signature
    # VALUES are untouched; the streaming ingest (jobs.py) already
    # checkpoints its signatures for the same reason.
    sig = minhash_signature(df, id_col, text_col, n_perm, k).localCheckpoint()
    # Driver-local fast path (r06 third pass): the corpus-scale pass is
    # the signature aggregate above; banding + pairing over the collapsed
    # signature table fits the driver below the gate (see
    # _driver_local_lsh_pairs for the exactness argument).
    if driver_local_max_sigs is None:
        driver_local_max_sigs = DRIVER_LOCAL_MAX_SIGS
    if sig.count() <= driver_local_max_sigs:
        local = _driver_local_lsh_pairs(sig, id_col, n_perm, n_bands)
        if local is not None:
            spark = df.sparkSession
            id_t = sig.schema[id_col].dataType.simpleString()
            flt = local[local["est_sim"] >= threshold]
            if len(flt) == 0:
                # pure-JVM empty relation: createDataFrame of an empty
                # pandas frame falls back to the pickled-RDD path, whose
                # first evaluation spins up Python workers (~1.4 s
                # measured in bench context) to produce zero rows
                return spark.range(0).select(
                    F.col("id").cast(id_t).alias("id_a"),
                    F.col("id").cast(id_t).alias("id_b"),
                    F.col("id").cast("double").alias("est_sim"),
                )
            return spark.createDataFrame(
                flt, schema=f"id_a {id_t}, id_b {id_t}, est_sim double"
            )
    return lsh_candidate_pairs(sig, id_col, n_perm, n_bands).filter(
        F.col("est_sim") >= threshold
    )


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs via banded LSH on the 64-bit simhash.

    The 64-bit signature splits into n_bands 16-bit bands; by pigeonhole,
    any pair within hamming distance <= n_bands - 1 shares at least one
    unchanged band, so with the default (4 bands, max_hamming=3) the
    candidate join has EXACT recall — identical output to the all-pairs
    hamming filter, at bucket-join cost. Same scale shape as the minhash
    path: the band join ships (id, band, key); signatures re-attach to
    candidates for the exact ``bit_count(xor)`` filter (JVM built-ins).

    -> (id_a, id_b, hamming) with id_a < id_b, hamming <= max_hamming.
    """
    from croawl_spark.functions.text import simhash_udf

    assert max_hamming < n_bands, "exact recall needs n_bands > max_hamming"
    width = 64 // n_bands
    # eager (r06): the simhash column comes out of a vectorized Python
    # UDF and feeds three consumers (banding + both re-attach sides) —
    # checkpoint so the Arrow crossing runs once per corpus, not thrice
    sims = df.select(
        id_col, simhash_udf(F.col(text_col)).alias("sh")
    ).localCheckpoint()
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("sh", b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    banded = sims.select(id_col, F.explode(bands).alias("bk")).select(
        id_col, "bk.band", "bk.key"
    )
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
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sims.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sims.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def incremental_minhash_pairs(
    new_df: DataFrame,
    index_sig: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_perm: int = 16,
    n_bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Near-dup pairs for a NEW batch against a persisted signature index
    (plus within-batch self pairs) — the old corpus text is never touched.

    -> (id_a, id_b, est_sim) with id_a < id_b (pair orientation normalized
    via least/greatest, so the result equals the whole-corpus self-dedup
    restricted to pairs involving a new doc regardless of how old and new
    ids interleave — the precondition is only that the id SETS are
    disjoint, not that old ids sort below new ones). Cross pairs against
    the index plus new-vs-new pairs; signatures/band keys are identical
    deterministic functions of the text.
    """
    # eager (r06): new_sig feeds the cross-pair banding, the signature
    # union AND the within-batch self-pair derivation — checkpoint once
    # (same rationale as minhash_dedup_pairs)
    new_sig = minhash_signature(
        new_df, id_col, text_col, n_perm, k
    ).localCheckpoint()
    nb = band_keys(new_sig, id_col, n_perm, n_bands).select(
        F.col(id_col).alias("_nid"), "band", "key"
    )
    ob = band_keys(index_sig, id_col, n_perm, n_bands).select(
        F.col(id_col).alias("_oid"), "band", "key"
    )
    cross = (
        nb.join(ob, ["band", "key"])
        .select(
            F.least("_oid", "_nid").alias("id_a"),
            F.greatest("_oid", "_nid").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # after orientation normalization either side of a cross pair can be
    # the old or the new doc, so signature lookup goes against the union
    # (id sets are disjoint by precondition — no ambiguity)
    all_sig = index_sig.select(F.col(id_col).alias("_sid"), "sig").unionByName(
        new_sig.select(F.col(id_col).alias("_sid"), "sig")
    )
    sa = all_sig.select(F.col("_sid").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = all_sig.select(F.col("_sid").alias("id_b"), F.col("sig").alias("sig_b"))
    cross_scored = (
        cross.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", _est_sim(n_perm).alias("est_sim"))
        .filter(F.col("est_sim") >= threshold)
    )
    self_pairs = lsh_candidate_pairs(new_sig, id_col, n_perm, n_bands).filter(
        F.col("est_sim") >= threshold
    )
    return cross_scored.unionByName(self_pairs)
