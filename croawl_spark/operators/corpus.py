"""Corpus-preparation operators for training-data pipelines.

Beyond the reference crawler's own surface (SURVEY.md §2 is fully covered
elsewhere): the operations a large-scale LLM-training data pipeline runs on
the crawled corpus — relevance scoring, deterministic dataset splits, and
token-budget sequence packing. All three are pure built-in-function
DataFrame plans (no Python in the hot path) with exact ANSI-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from croawl_spark.operators.ranking import global_sequence  # noqa: F401 (re-export family)

# (id, n_tokens) frames at or below this many rows run the pack_sequences
# cumsum driver-local (two int64 columns ≈ 32 MB through Arrow at the gate)
# instead of paying the range-partition sample + offset-collect + window
# chain of Spark jobs. Same collect-gate pattern as cluster.py §r06 /
# ann.py §r06; above the gate (or for non-integer/NULL/duplicate ids) the
# distributed two-phase cumsum below is unchanged — it remains the 100-TB
# path.
DRIVER_LOCAL_MAX_PACK_DOCS = 2_000_000

# resample_sources: ranked-source row sets at or below this size compute
# the kept-id set driver-local (one Arrow collect of (id, source) + a
# python md5 rank — ~1 µs/row) instead of the prefilter + salted two-phase
# rank + verification chain of stage jobs; the kept set re-attaches with a
# broadcast semi-join, so the docs frame itself never moves. The gate is
# smaller than the other collect gates because the local cost is
# hashlib-md5-bound, not numpy-bound.
DRIVER_LOCAL_MAX_MIX_DOCS = 500_000


def _distinct_shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int, hash_shingles: bool
) -> DataFrame:
    """-> (id, _gram): one row per DISTINCT n-token shingle per doc —
    the shared shingling kernel of ngram_contamination / ngram_novelty.

    Perf shape (r06, same fix as dedup._shingle_occurrences): the token
    array is materialized in a child Project before the per-position
    lambda (an inline split() inside transform's lambda re-splits the
    text once per position — O(tokens²) per doc), and the hashed path
    hashes each token once then combines the n token-hashes with one
    ``xxhash64`` call per position (no n-token string ever built). A
    shingle's hash equality coincides with string equality absent
    birthday(2^64) collisions — the only property the distinct + join
    consumers rely on — so outputs are unchanged."""
    if hash_shingles:
        th = df.select(
            F.col(id_col),
            F.transform(F.split(text_col, " "), lambda t: F.xxhash64(t)).alias(
                "_th"
            ),
        )
        tv = F.col("_th")
        gram = F.explode(
            F.when(
                F.size(tv) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(tv) - F.lit(n - 1)),
                    lambda i: F.xxhash64(
                        *[F.element_at(tv, i + j) for j in range(n)]
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("_gram")
        return th.select(F.col(id_col), gram).dropDuplicates([id_col, "_gram"])
    toks = df.select(F.col(id_col), F.split(text_col, " ").alias("_w"))
    wv = F.col("_w")
    gram = F.explode(
        F.when(
            F.size(wv) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(wv) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(wv, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    ).alias("_gram")
    return toks.select(F.col(id_col), gram).dropDuplicates([id_col, "_gram"])


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Cluster-size-invariant INCLUSIVE cumulative sum over a global total
    order — without the single-partition window that makes the naive
    ``SUM() OVER (ORDER BY ...)`` a serial bottleneck at scale.

    Two-phase, mirroring ranking.global_sequence: range-partition on the
    order columns (parallel sort), take each partition's value sum (an
    O(#partitions) collect), then cumsum within partitions plus the exact
    offset of all earlier partitions. Output depends only on the data
    (order_cols must be a total order); range boundaries affect placement,
    never values. value_col must be integral — offsets stay exact.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
    parted = df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
    parted = parted.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    sums = {
        r["_pid"]: r["s"]
        for r in parted.groupBy("_pid")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).cast("long").alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid])
    # pandas + Arrow -> a JVM LocalTableScan instead of a pickled-RDD scan
    # (same fix as ranking.global_sequence, r06)
    import pandas as pd

    if offsets:
        off_df = spark.createDataFrame(
            pd.DataFrame(
                {"_pid": list(offsets), "_off": [offsets[p] for p in offsets]}
            ),
            schema="_pid int, _off long",
        )
    else:
        off_df = spark.range(0).select(
            F.col("id").cast("int").alias("_pid"), F.col("id").alias("_off")
        )
    off_df = F.broadcast(off_df)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parted.join(off_df, "_pid")
        .withColumn(out_col, (F.sum(value_col).over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    driver_local_max_docs: int | None = None,
) -> DataFrame:
    """Token-budget sequence packing: assign documents (in id order) to
    training batches of ~``budget`` whitespace tokens.

    batch_id = floor(tokens_before_this_doc / budget) — the scalable
    quantization of greedy packing (true greedy restart-on-overflow is
    inherently sequential; this form is a pure function of the global
    cumsum, so it distributes, and a batch overflows by at most one
    document). -> (id, n_tokens, cum_tokens, batch_id).
    """
    # eager (r06): global_cumsum's range-partition exchange SAMPLES its
    # child to pick boundaries, so an un-materialized input pays the
    # corpus tokenize twice (sample pass + shuffle pass). Checkpoint the
    # narrow (id, n_tokens) projection once — 16 bytes/doc — so both
    # passes read it instead of re-splitting the text column.
    toks = docs.select(
        F.col(id_col),
        F.size(F.split(text_col, " ")).cast("long").alias("n_tokens"),
    ).localCheckpoint()
    # Driver-local fast path (r06 third pass): the tokenize pass above is
    # the only corpus-scale work — the cumsum itself runs over two int64
    # columns. Below the gate, collect them through Arrow and compute the
    # inclusive cumsum locally (int64-exact, identical values by
    # definition: cum[i] = sum of n_tokens over ids <= id[i]); the
    # distributed two-phase form below stays the >gate path.
    if driver_local_max_docs is None:
        driver_local_max_docs = DRIVER_LOCAL_MAX_PACK_DOCS
    if toks.count() <= driver_local_max_docs:
        local = _driver_local_pack_cumsum(toks, id_col)
        if local is not None:
            cum = local
            return cum.withColumn(
                "batch_id",
                F.floor(
                    (F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)
                ).cast("long"),
            )
    cum = global_cumsum(toks, [id_col], "n_tokens", "cum_tokens")
    return cum.withColumn(
        "batch_id",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)).cast("long"),
    )


def _driver_local_pack_cumsum(toks: DataFrame, id_col: str) -> DataFrame | None:
    """(id, n_tokens) -> (id, n_tokens, cum_tokens) computed driver-local.

    Exactness: sort by id (unique integer total order — the same order the
    distributed range partition + window uses), inclusive int64 cumsum.
    Returns None (caller keeps the distributed path) for non-integer id
    types, NULLs, or duplicate ids (a duplicated id is not a total order,
    so the distributed window's intra-key order would be ambiguous too —
    never silently pick one here)."""
    import numpy as np
    import pandas as pd
    import pyarrow.types as pat

    tbl = toks.toArrow()
    if not all(pat.is_integer(f.type) for f in tbl.schema):
        return None
    if any(c.null_count for c in tbl.columns):
        return None
    ids = tbl.column(0).to_numpy().astype(np.int64, copy=False)
    n_tok = tbl.column(1).to_numpy().astype(np.int64, copy=False)
    order = np.argsort(ids, kind="stable")
    ids, n_tok = ids[order], n_tok[order]
    if len(ids) > 1 and (ids[1:] == ids[:-1]).any():
        return None
    cum = np.cumsum(n_tok, dtype=np.int64)
    spark = toks.sparkSession
    out = pd.DataFrame({id_col: ids, "n_tokens": n_tok, "cum_tokens": cum})
    id_field = toks.schema[id_col]
    return spark.createDataFrame(
        out,
        schema=(
            f"{id_col} {id_field.dataType.simpleString()}, "
            "n_tokens long, cum_tokens long"
        ),
    )


def split_assign(
    docs: DataFrame,
    id_col: str,
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent hash
    of the id: bucket = first 4 hex chars of md5(id) mod 100. Stable across
    runs, engines and cluster sizes (md5 is bit-identical everywhere —
    unlike xxhash64/hash, which are engine-specific), so the split never
    silently reshuffles when the pipeline is re-run or re-platformed.
    -> (id, bucket, split) with P(val) = val_pct%, P(test) = test_pct%.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    ).cast("int")
    return docs.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def bm25_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of each document to a bag-of-terms query (Robertson/
    Sparck Jones; the corpus-curation form used to mine topical subsets).

    Scale shape: the per-token explode is pre-filtered to the query terms
    with a JVM array filter, so the exploded stream — and the (doc, term)
    shuffle behind the tf aggregate — carries only query-term hits, never
    the corpus token stream. Corpus stats (N, avgdl) ride a broadcast
    one-row cross join; df per term is a tiny broadcast join. Scores are
    rounded to 4 decimals (cross-engine float-parity margin).

    -> (id, bm25) for documents matching >= 1 term.
    """
    terms = F.array(*[F.lit(t) for t in query_terms])
    # eager (r06): base feeds THREE consumers (corpus stats, tf, df) and
    # contains no exchange Spark could reuse across them — without the
    # checkpoint the corpus is tokenized+filtered once per consumer. The
    # cached rows are narrow by construction: doc length + query-term
    # hits only, never the text.
    base = docs.select(
        F.col(id_col),
        F.size(F.split(text_col, " ")).cast("long").alias("_dl"),
        F.filter(
            F.split(text_col, " "), lambda x: F.array_contains(terms, x)
        ).alias("_hits"),
    ).localCheckpoint()
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    tf = (
        base.select(F.col(id_col), "_dl", F.explode("_hits").alias("_t"))
        .groupBy(F.col(id_col), "_dl", "_t")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )
    df_t = (
        base.select(F.explode(F.array_distinct("_hits")).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).cast("double").alias("_df"))
    )
    scored = (
        tf.join(F.broadcast(df_t), "_t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf", F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5))
        )
        .withColumn(
            "_term_score",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1.0))
            / (
                F.col("_tf")
                + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("_term_score"), 4).alias("bm25"))
    )


def ngram_contamination(
    candidates: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    hash_shingles: bool = True,
) -> DataFrame:
    """Benchmark-contamination screen — the decontamination step of an LLM
    training-data pipeline: flag candidate documents sharing any n-token
    shingle with a held-out benchmark/eval set (n=8 follows the
    GPT-3/PaLM-style 8-13-gram overlap convention).

    Scale shape: shingling explodes the token stream n-fold, so with
    ``hash_shingles`` (the default) each shingle is collapsed to its
    xxhash64 BEFORE the per-doc distinct and the semi-join — the shuffle
    carries 8 bytes per shingle instead of the n-token string, and the
    benchmark side (tiny: eval sets are thousands of docs) broadcasts.
    False positives from 64-bit collisions are birthday(2^64) — vanishing,
    and conservative in the safe direction for decontamination (a flagged
    doc gets dropped/reviewed). Set hash_shingles=False for the exact
    string form (the DuckDB oracle's semantics; identical output absent
    collisions).

    -> (id, n_shared, contaminated): count of DISTINCT shared shingles
    per candidate doc (0 for docs shorter than n tokens), flag = any.
    """

    def shingles(df: DataFrame) -> DataFrame:
        return _distinct_shingle_rows(df, id_col, text_col, n, hash_shingles)

    bench = shingles(benchmark).select("_gram").distinct()
    cand = shingles(candidates)
    hits = (
        cand.join(bench, "_gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        candidates.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shared", F.lit(0).cast("long")).alias("n_shared"),
        )
        .withColumn("contaminated", F.col("n_shared") > 0)
    )


def unigram_nll(
    docs: DataFrame, id_col: str, text_col: str, heavy_k: int = 1024
) -> DataFrame:
    """Per-document unigram-LM negative log-likelihood (mean -ln p(w) with
    p estimated from the corpus itself) — the classic cheap quality /
    outlier signal: rare-token-heavy or garbled documents score high,
    boilerplate scores low.

    Scale shape: one token explode feeding a map-side-partial term-
    frequency aggregate; the corpus total rides a broadcast one-row cross
    join (the bm25_score pattern). The token->frequency join is SPLIT on
    heavy hitters (VERDICT r04 item #5): natural-language token streams
    are Zipfian, so an equi-join keyed on the raw token sends a huge
    fraction of all rows to the handful of partitions owning "the"/"of"/
    etc. The ``heavy_k`` most frequent terms instead ride a BROADCAST
    join (map-side, no exchange of their token rows at all); only the
    long tail — whose per-term multiplicity is bounded by the k-th
    frequency — reaches the shuffled equi-join. Identical output by
    construction (same _tf whichever path a term takes). Rounded to 4
    decimals (cross-engine float-parity margin for the order-dependent
    per-doc mean).

    -> (id, nll), one row per document.
    """
    tok = docs.select(F.col(id_col), F.explode(F.split(text_col, " ")).alias("_t"))
    freq = tok.groupBy("_t").agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    stats = freq.agg(F.sum("_tf").alias("_tot"))
    # deterministic top-K (ties broken on the term) -> tiny frame, broadcast
    heavy = freq.orderBy(F.col("_tf").desc(), "_t").limit(heavy_k)
    probed = tok.join(F.broadcast(heavy), "_t", "left")
    hot = probed.filter(F.col("_tf").isNotNull())
    tail = probed.filter(F.col("_tf").isNull()).drop("_tf").join(freq, "_t")
    return (
        hot.unionByName(tail)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log(F.col("_tf") / F.col("_tot"))), 4).alias("nll")
        )
    )


def repetition_filter(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_distinct_frac: float = 0.45,
    max_top_token_frac: float = 0.15,
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """Gopher/MassiveText-style repetition screens (Rae et al. 2021 §A1.1,
    adapted to token granularity): documents dominated by repeated tokens
    or a single repeated bigram are boilerplate/spam, not training text.

    Per doc: distinct-token fraction, most-common-token fraction, and the
    fraction of tokens covered by the most common bigram; ``keep`` ands
    the three thresholds (compared on the UNROUNDED single-division
    values — one float op per signal, so cross-engine comparison is
    exact; reported fractions rounded to 4dp for display parity).

    Scale shape: two explode->map-side-partial count aggregates (tokens,
    bigrams) keyed on (doc, term) — no windows, no UDFs; the bigram
    stream rides the same JVM transform/slice shingling as
    ngram_contamination.

    -> (id, n_tokens, distinct_frac, top_token_frac, top_bigram_frac,
    keep), one row per document.
    """
    w = F.split(text_col, " ")
    base = docs.select(F.col(id_col), w.alias("_w"))
    tc = (
        base.select(F.col(id_col), F.explode("_w").alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    d1 = tc.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).alias("_dt"),
        F.max("_c").alias("_mx"),
    )
    bigrams = F.when(
        F.size("_w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice("_w", i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d2 = (
        base.select(F.col(id_col), F.explode(bigrams).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_mbg"))
    )
    n = F.col("_n").cast("double")
    df_ = F.col("_dt").cast("double") / n
    tf_ = F.col("_mx").cast("double") / n
    bf_ = F.lit(2.0) * F.coalesce(F.col("_mbg"), F.lit(0)).cast("double") / n
    return (
        d1.join(d2, id_col, "left")
        .select(
            F.col(id_col),
            F.col("_n").alias("n_tokens"),
            F.round(df_, 4).alias("distinct_frac"),
            F.round(tf_, 4).alias("top_token_frac"),
            F.round(bf_, 4).alias("top_bigram_frac"),
            (
                (df_ >= F.lit(min_distinct_frac))
                & (tf_ <= F.lit(max_top_token_frac))
                & (bf_ <= F.lit(max_top_bigram_frac))
            ).alias("keep"),
        )
    )


def scrub_pii(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction pass (the C4/CCNet-style scrub): e-mail addresses ->
    <EMAIL>, 6+-digit runs (phone/ID shapes) -> <NUM>, with per-doc match
    counts for audit. Pure JVM regexp_replace/regexp_count — no Python in
    the hot path; patterns restricted to a dialect-portable subset
    (character classes + bounded quantifiers behave identically in Java
    regex and RE2, so the DuckDB oracle runs the same patterns verbatim).

    -> (id, clean_text, n_emails, n_longnums).
    """
    email = r"[a-z0-9._]+@[a-z0-9.]+"
    longnum = r"[0-9]{6,}"
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.regexp_replace(
            F.regexp_replace(t, email, "<EMAIL>"), longnum, "<NUM>"
        ).alias("clean_text"),
        F.regexp_count(t, F.lit(email)).alias("n_emails"),
        F.regexp_count(t, F.lit(longnum)).alias("n_longnums"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping fixed-token training windows (the
    context-window chunking step between cleaning and packing: window
    tokens per chunk, stride < window gives window-stride tokens of
    overlap so no span is ever cut without context).

    Chunk starts are a JVM ``sequence(1, max(1, n-window+stride),
    stride)`` — one explode, no Python, no window functions. The stop
    bound extends one stride past the last full window so the stride-
    aligned tail chunk (clamped by slice at the document end) always
    covers the final tokens: every token position lands in >= 1 chunk
    (property-tested). A doc shorter than ``window`` yields exactly one
    chunk; chunk_id = (start-1)/stride is dense per doc and
    deterministic. Requires stride <= window (coverage would gap
    otherwise).

    -> (id, chunk_id, start_tok, n_chunk_tokens, chunk_text).
    """
    assert 0 < stride <= window, "stride must be in (0, window]"
    w = F.split(text_col, " ")
    n = F.size(w)
    stop = F.greatest(F.lit(1), n - F.lit(window - stride))
    base = docs.select(
        F.col(id_col),
        w.alias("_w"),
        F.explode(F.sequence(F.lit(1), stop, F.lit(stride))).alias("_s"),
    )
    chunk = F.slice("_w", F.col("_s"), window)
    return base.select(
        F.col(id_col),
        ((F.col("_s") - 1) / stride).cast("int").alias("chunk_id"),
        F.col("_s").cast("int").alias("start_tok"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def _driver_local_rank_select(narrow: DataFrame, quotas: dict):
    """Collect the ranked sources' (id, source) pairs and take, per
    source, the ``quota`` rows with the smallest (md5(cast(id as
    string)), id) — literally the rank that defines resample_sources'
    output (the distributed prefilter + salted two-phase rank +
    verification machinery computes the same set). hashlib.md5 over
    str(id) equals Spark's ``md5(cast(id as string))`` for integer and
    string ids (lowercase hex both sides; UTF-8 byte order == codepoint
    order), and the (hex, id) tuple sort equals the window's
    ORDER BY (_m, id).

    -> pandas DataFrame (id, source) of kept pairs, or None when
    ineligible (non-integer/string id type, NULLs, or duplicate ids —
    a duplicated id makes the distributed tie-break ambiguous and would
    over-select through the semi-join re-attach)."""
    import hashlib

    import pandas as pd
    import pyarrow.types as pat

    tbl = narrow.toArrow()
    f0 = tbl.schema.field(0)
    if not (
        pat.is_integer(f0.type)
        or pat.is_string(f0.type)
        or pat.is_large_string(f0.type)
    ):
        return None
    if tbl.column(0).null_count or tbl.column(1).null_count:
        return None
    ids = tbl.column(0).to_pylist()
    srcs = tbl.column(1).to_pylist()
    by_src: dict[str, list] = {}
    for i, s in zip(ids, srcs):
        by_src.setdefault(s, []).append(i)
    kept_ids: list = []
    kept_srcs: list = []
    for s, q in quotas.items():
        sub = by_src.get(s, [])
        if len(sub) != len(set(sub)):
            return None
        ranked = sorted(
            (hashlib.md5(str(i).encode("utf-8")).hexdigest(), i) for i in sub
        )
        kept_ids.extend(i for _, i in ranked[:q])
        kept_srcs.extend([s] * min(q, len(sub)))
    return pd.DataFrame({"id": kept_ids, "source": kept_srcs})


def resample_sources(
    docs: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    n_salt: int = 16,
    driver_local_max_docs: int | None = None,
) -> DataFrame:
    """Deterministic source-mixture rebalancing (the "domain mixing" step
    of a training-data pipeline: given target mixture weights per source,
    downsample every source so the output matches the target mixture
    EXACTLY, without upsampling anything).

    Quotas: T = min over weighted sources of n[s]/w[s];
    quota[s] = floor(w[s] * T), evaluated in IEEE double — for weights
    that are not exactly representable (e.g. 0.3) the limiting source's
    quota can floor to n-1 instead of n, dropping one row of the
    limiting source (ADVICE r05). This is INTENTIONAL, pinned behavior:
    the DuckDB oracle for ``domain_mix`` performs the identical float
    arithmetic, so the two engines agree bit-for-bit; "the limiting
    source is kept (near-)whole" is a property of the construction, not
    a hard invariant, and changing the quota rule would silently change
    the declared query's output. Selection is
    rank-by-hash: per source, the quota rows with the smallest
    (md5(id), id) survive — content-independent, engine-portable (md5 is
    bit-identical everywhere, the split_assign argument) and stable under
    re-runs, re-platforms and cluster resizing.

    Scale shape (no per-source global sort): a full per-source rank is a
    skewed window at corpus scale (one source can own most of the data).
    Instead:
      1. keep-all shortcut: sources with quota == n skip selection
         entirely (zero work for the limiting source);
      2. threshold prefilter: u = first-60-bits-of-md5 / 2^60 is uniform;
         rows with u <= quota/n + 6 sigma survive — a MAP-SIDE filter
         against broadcast quotas that discards all but ~quota rows per
         source before any exchange;
      3. exact rank over the ~quota survivors per (source, salt) subgroup
         then per source (the salted_topk two-phase shape) — partitions
         are now quota-bounded, not corpus-bounded.
      4. the prefilter is VERIFIED (per-source survivor count >= quota, a
         bounded collect); a source that falls short — possible only in
         adversarial hash distributions — reruns with the filter wide
         open, so the output is always exactly the rank-defined set.

    -> kept rows (id, source) — the exact rank-defined subset.
    """
    counts = {
        r["_s"]: r["_n"]
        for r in docs.groupBy(F.col(source_col).alias("_s"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }  # bounded: one row per source
    present = {s: w for s, w in weights.items() if w > 0 and s in counts}
    if not present:
        raise ValueError(
            f"no weighted source present in the data: weights name "
            f"{sorted(s for s, w in weights.items() if w > 0)}, data has "
            f"{sorted(counts)}"
        )
    t = min(counts[s] / w for s, w in present.items())
    quotas = {
        s: int(w * t)
        for s, w in weights.items()
        if w > 0 and s in counts
    }
    spark = docs.sparkSession
    md5 = F.md5(F.col(id_col).cast("string"))
    u = (
        F.conv(F.substring(md5, 1, 15), 16, 10).cast("double")
        / F.lit(float(1 << 60))
    )
    keep_all = [s for s, q in quotas.items() if q >= counts[s]]
    ranked_srcs = {s: q for s, q in quotas.items() if 0 < q < counts[s]}
    out_all = docs.filter(F.col(source_col).isin(keep_all)) if keep_all else None

    def _select(src_quotas: dict, open_filter: bool) -> DataFrame:
        import pandas as pd  # Arrow path -> JVM LocalTableScan (r06)

        taus = [
            1.0
            if open_filter
            else min(
                1.0,
                q / counts[s]
                + 6.0 * (q / counts[s] / counts[s]) ** 0.5
                + 16.0 / counts[s],
            )
            for s, q in src_quotas.items()
        ]
        qdf = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(
                    {
                        source_col: list(src_quotas),
                        "_q": list(src_quotas.values()),
                        "_tau": taus,
                    }
                ),
                schema=f"{source_col} string, _q long, _tau double",
            )
        )
        cand = (
            docs.join(qdf, source_col)  # broadcast: map-side
            .withColumn("_u", u)
            .filter(F.col("_u") <= F.col("_tau"))
            .withColumn("_m", md5)
        )
        salt = F.pmod(F.conv(F.substring("_m", 29, 4), 16, 10).cast("long"), F.lit(n_salt))
        w1 = Window.partitionBy(source_col, salt).orderBy("_m", id_col)
        pruned = (
            cand.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= F.col("_q"))
            .drop("_r1")
        )
        w2 = Window.partitionBy(source_col).orderBy("_m", id_col)
        return (
            pruned.withColumn("_r2", F.row_number().over(w2))
            .filter(F.col("_r2") <= F.col("_q"))
            .drop("_r2", "_u", "_m", "_q", "_tau")
        )

    if ranked_srcs:
        # Driver-local fast path (r06 third pass): below the gate, compute
        # the rank-defined kept set in one Arrow collect of (id, source)
        # and re-attach with a broadcast semi-join — the docs frame never
        # shuffles either way; this replaces the prefilter + two windows +
        # verification count as sequential stage jobs. Above the gate, or
        # for ineligible id types/NULLs/duplicates, the distributed
        # machinery below is unchanged.
        if driver_local_max_docs is None:
            driver_local_max_docs = DRIVER_LOCAL_MAX_MIX_DOCS
        n_ranked_rows = sum(counts[s] for s in ranked_srcs)
        if n_ranked_rows <= driver_local_max_docs:
            kept = _driver_local_rank_select(
                docs.filter(F.col(source_col).isin(list(ranked_srcs))).select(
                    F.col(id_col), F.col(source_col)
                ),
                ranked_srcs,
            )
            if kept is not None:
                id_t = dict(docs.dtypes)[id_col]
                src_t = dict(docs.dtypes)[source_col]
                kept_df = spark.createDataFrame(
                    kept, schema=f"{id_col} {id_t}, {source_col} {src_t}"
                )
                sel = docs.join(
                    F.broadcast(kept_df), [id_col, source_col], "left_semi"
                )
                return (
                    sel if out_all is None else out_all.unionByName(sel)
                )
        sel = _select(ranked_srcs, open_filter=False).localCheckpoint()
        got = {
            r["_s"]: r["_n"]
            for r in sel.groupBy(F.col(source_col).alias("_s"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        }
        short = {
            s: q for s, q in ranked_srcs.items() if got.get(s, 0) < q
        }
        if short:  # adversarial-hash fallback: exact, rare by construction
            sel = sel.filter(~F.col(source_col).isin(list(short))).unionByName(
                _select(short, open_filter=True)
            )
        out_all = sel if out_all is None else out_all.unionByName(sel)
    return out_all if out_all is not None else docs.limit(0)


def corpus_report(
    docs: DataFrame, id_col: str, text_col: str, source_col: str
) -> DataFrame:
    """Per-source corpus report card — the monitoring aggregate a
    training-data pipeline publishes after every ingest/filter stage:
    document count, token volume, mean document length, vocabulary size,
    and the exact-duplicate rate within the source.

    Scale shape: three narrow aggregates joined on the (tiny) source key —
    (a) per-doc token counts fold map-side into per-source sums;
    (b) vocabulary = distinct (source, token) then count per source;
    (c) distinct texts counted via xxhash64(text) so the exchange carries
        8-byte hashes, never the corpus body (collision odds birthday
        2^64 — the exact_dedup caveat; the DuckDB oracle uses the text
        itself, identical absent collisions).

    -> (source, n_docs, n_tokens, mean_tokens 4dp, n_vocab,
        n_distinct_texts, dup_frac 4dp).
    """
    toks = F.split(text_col, " ")
    basic = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.round(F.avg(F.size(toks).cast("double")), 4).alias("mean_tokens"),
        F.count_distinct(F.xxhash64(text_col)).alias("n_distinct_texts"),
    )
    vocab = (
        docs.select(F.col(source_col).alias("source"), F.explode(toks).alias("_t"))
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_vocab"))
    )
    return (
        basic.join(vocab, "source")
        .withColumn(
            "dup_frac",
            F.round(
                1.0 - F.col("n_distinct_texts") / F.col("n_docs").cast("double"),
                4,
            ),
        )
    )


def shard_assign(
    docs: DataFrame,
    id_col: str,
    docs_per_shard: int,
) -> DataFrame:
    """Deterministic shard assignment for training-data export (the
    webdataset/tfrecord-style sharding step: fixed-size shards, stable
    membership so a re-export or a resumed download sees identical
    files). shard_id = global_rank(id) // docs_per_shard over the id
    total order — a pure function of the data, identical at any
    parallelism (ranking.global_sequence: range-partitioned parallel
    sort + O(#partitions) offsets, no single-partition window).

    -> (id, seq, shard_id). Feed to :func:`export_shards` to write.
    """
    seq = global_sequence(docs.select(F.col(id_col)), [id_col], "seq")
    return seq.withColumn(
        "shard_id", F.floor(F.col("seq") / F.lit(docs_per_shard)).cast("long")
    )


def export_shards(
    docs: DataFrame,
    id_col: str,
    out_dir: str,
    docs_per_shard: int,
) -> int:
    """Write the corpus as Hive-partitioned parquet shards
    (``shard_id=K/``) of exactly ``docs_per_shard`` docs (last shard
    ragged), membership fixed by :func:`shard_assign`. Returns the shard
    count. One file per shard directory (repartition on shard_id before
    write) — downstream trainers stream shards independently."""
    assigned = docs.join(shard_assign(docs, id_col, docs_per_shard), id_col)
    (
        assigned.repartition("shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    # shard ids are dense by construction (global rank // size), so the
    # count is ceil(n_docs / docs_per_shard) — a cheap narrow count, NOT a
    # second evaluation of the range-partitioned sort + join above
    n_docs = docs.count()
    return -(-n_docs // docs_per_shard) if n_docs else 0


def ngram_novelty(
    candidates: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    hash_shingles: bool = True,
) -> DataFrame:
    """Per-document novelty against a reference corpus: the fraction of a
    candidate's DISTINCT n-token shingles not present anywhere in the
    reference — the inverse of the contamination screen, used to score
    how much genuinely new content an ingest batch adds (dedup
    diagnostics, crawl-frontier prioritization by novelty).

    Same scale shape as ngram_contamination: shingles collapse to
    xxhash64 before the distinct and the join (8-byte shuffle rows); the
    reference side is distinct-compressed. Ratio computed on unrounded
    counts, reported at 4dp (exact cross-engine: one division).

    -> (id, n_shingles, n_novel, novelty) — docs shorter than n tokens
    get n_shingles = 0 and novelty = NULL (no signal, distinguishable
    from "all shingles known" = 0.0).
    """

    def sh(df: DataFrame) -> DataFrame:
        return _distinct_shingle_rows(df, id_col, text_col, n, hash_shingles)

    ref = sh(reference).select("_gram").distinct()
    # (r06 note: checkpointing cand was measured at two scales and
    # REGRESSED both — the per-consumer re-shingle is map-side work the
    # join pipelines absorb, cheaper than materializing the distinct
    # shingle rows. Left lazy.)
    cand = sh(candidates)
    novel = (
        cand.join(ref, "_gram", "left_anti")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    totals = cand.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        candidates.select(id_col)
        .join(totals, id_col, "left")
        .join(novel, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0).cast("long")).alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.when(
                F.col("n_shingles") > 0,
                F.round(F.col("n_novel") / F.col("n_shingles"), 4),
            ),
        )
    )


def token_length_histogram(
    docs: DataFrame, text_col: str, bin_width: int = 32
) -> DataFrame:
    """Document-length histogram in token bins — the packing/chunking
    diagnostic a pipeline publishes to size context windows and spot
    truncation cliffs. One map-side-partial aggregate over a JVM size()
    expression; no explode, no shuffle of the token stream.

    -> (bin_start, bin_end, n_docs), bins of ``bin_width`` tokens.
    """
    ntok = F.size(F.split(text_col, " "))
    b = F.floor(ntok / F.lit(bin_width)).cast("long")
    return (
        docs.groupBy(b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            (F.col("_b") * bin_width).alias("bin_start"),
            (F.col("_b") * bin_width + bin_width - 1).alias("bin_end"),
            "n_docs",
        )
    )


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 50,
    end_token: str = "</w>",
    driver_local_max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed byte-pair-encoding tokenizer training (Sennrich et al.
    2016, https://arxiv.org/abs/1508.07909) — the learn-a-vocabulary step
    a training pipeline runs over its own corpus.

    Classic BPE trains on the WORD-FREQUENCY table, not the raw token
    stream, so the first step collapses the corpus to one row per
    distinct word with its count (a narrow map-side-partial aggregate —
    the only pass that touches the full corpus). Each of the
    ``n_merges`` rounds then runs over the word table only:

      1. per-word adjacent symbol pairs, weighted by word frequency —
         a JVM transform over the symbol array + explode (pairs of a
         word with itself collapsed first: no per-row Python);
      2. global pair counts via map-side-partial sum; the winning pair
         is the count argmax with a DETERMINISTIC tiebreak on the pair
         itself (orderBy count desc, left, right → limit 1: an O(1)
         driver collect per round, the pagerank/exact_dedup discipline);
      3. the merge applies to every word's symbol array in a vectorized
         Arrow pass (per-word python loop over ~word-length symbols —
         bounded, off the corpus hot path since words are distinct).

    The word table is localCheckpointed per round (lineage truncation,
    iterative-loop discipline of operators/cluster.py). Stops early when
    no pair occurs >= 2 times. Returns the learned merge list in order —
    the artifact a tokenizer ships; parity with a pure-python reference
    implementation is pinned by tests/test_training_ops.py::
    test_bpe_train_matches_reference.

    Driver-local fast path (r06, VERDICT r05 minor #3): the word-
    frequency collapse is the only scale-bearing pass — after it the
    distinct-word table of even a web-scale corpus is usually small
    (natural-language vocabularies grow ~O(corpus^0.5), Heaps' law).
    When it fits under ``driver_local_max_words`` the merge loop runs
    driver-local over the collected table instead of paying one Spark
    job + one O(1) collect per merge round (a real 32k-merge vocabulary
    means 32k sequential rounds — hours of pure scheduling overhead).
    The local loop is the SAME algorithm with the SAME deterministic
    tiebreak (count desc, then lexicographic pair; Python str ordering
    equals Spark's UTF8 binary ordering because UTF-8 byte order
    preserves codepoint order), so the merge list is identical — pinned
    by test_bpe_train_local_equals_distributed. Set
    ``driver_local_max_words=0`` to force the distributed loop.
    """
    import pandas as pd

    words = (
        docs.select(F.explode(F.split(text_col, " ")).alias("_w"))
        .filter(F.col("_w") != "")
        .groupBy("_w")
        .agg(F.count(F.lit(1)).cast("long").alias("_freq"))
        .select(
            F.concat(
                F.split(F.col("_w"), ""), F.array(F.lit(end_token))
            ).alias("_syms"),
            "_freq",
        )
        .localCheckpoint()
    )
    if words.count() <= driver_local_max_words:
        vocab = [(list(r["_syms"]), int(r["_freq"])) for r in words.collect()]
        local_merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            counts: dict[tuple[str, str], int] = {}
            for syms, fr in vocab:
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + fr
            if not counts:
                break
            (left, right), n = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if n < 2:
                break
            local_merges.append((left, right))
            joined = left + right
            for w in range(len(vocab)):
                syms, fr = vocab[w]
                s, i, nn = [], 0, len(syms)
                while i < nn:
                    if i + 1 < nn and syms[i] == left and syms[i + 1] == right:
                        s.append(joined)
                        i += 2
                    else:
                        s.append(syms[i])
                        i += 1
                vocab[w] = (s, fr)
        return local_merges
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                F.explode(
                    F.when(
                        F.size("_syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("_syms") - 1),
                            lambda i: F.struct(
                                F.element_at("_syms", i).alias("l"),
                                F.element_at("_syms", i + 1).alias("r"),
                            ),
                        ),
                    ).otherwise(
                        F.array().cast("array<struct<l:string,r:string>>")
                    )
                ).alias("_p"),
                "_freq",
            )
            .groupBy("_p")
            .agg(F.sum("_freq").alias("_n"))
        )
        top = (
            pairs.orderBy(
                F.col("_n").desc(), F.col("_p.l"), F.col("_p.r")
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["_n"] < 2:
            break
        left, right = top[0]["_p"]["l"], top[0]["_p"]["r"]
        merges.append((left, right))
        joined = left + right

        def apply_merge(it):
            for pdf in it:
                out = []
                for syms in pdf["_syms"]:
                    s, i, n = [], 0, len(syms)
                    while i < n:
                        if (
                            i + 1 < n
                            and syms[i] == left
                            and syms[i + 1] == right
                        ):
                            s.append(joined)
                            i += 2
                        else:
                            s.append(syms[i])
                            i += 1
                    out.append(s)
                pdf = pdf.copy()
                pdf["_syms"] = pd.Series(out, index=pdf.index)
                yield pdf

        nxt = words.mapInPandas(
            apply_merge, "_syms array<string>, _freq long"
        ).localCheckpoint()
        words.unpersist()
        words = nxt
    return merges
