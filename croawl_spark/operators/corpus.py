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
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
        )
    )
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
) -> DataFrame:
    """Token-budget sequence packing: assign documents (in id order) to
    training batches of ~``budget`` whitespace tokens.

    batch_id = floor(tokens_before_this_doc / budget) — the scalable
    quantization of greedy packing (true greedy restart-on-overflow is
    inherently sequential; this form is a pure function of the global
    cumsum, so it distributes, and a batch overflows by at most one
    document). -> (id, n_tokens, cum_tokens, batch_id).
    """
    toks = docs.select(
        F.col(id_col),
        F.size(F.split(text_col, " ")).cast("long").alias("n_tokens"),
    )
    cum = global_cumsum(toks, [id_col], "n_tokens", "cum_tokens")
    return cum.withColumn(
        "batch_id",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)).cast("long"),
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
    base = docs.select(
        F.col(id_col),
        F.size(F.split(text_col, " ")).cast("long").alias("_dl"),
        F.filter(
            F.split(text_col, " "), lambda x: F.array_contains(terms, x)
        ).alias("_hits"),
    )
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
        w = F.split(text_col, " ")
        gram = F.explode(
            F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(w, i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_gram")
        out = df.select(F.col(id_col), gram)
        if hash_shingles:
            out = out.select(F.col(id_col), F.xxhash64("_gram").alias("_gram"))
        return out.dropDuplicates([id_col, "_gram"])

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


def unigram_nll(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document unigram-LM negative log-likelihood (mean -ln p(w) with
    p estimated from the corpus itself) — the classic cheap quality /
    outlier signal: rare-token-heavy or garbled documents score high,
    boilerplate scores low.

    Scale shape: one token explode feeding a map-side-partial term-
    frequency aggregate; the corpus total rides a broadcast one-row cross
    join (the bm25_score pattern) and the token->frequency join is a
    plain equi-join on the term (vocab-sized right side — AQE broadcasts
    it when it fits). Rounded to 4 decimals (cross-engine float-parity
    margin for the order-dependent per-doc mean).

    -> (id, nll), one row per document.
    """
    tok = docs.select(F.col(id_col), F.explode(F.split(text_col, " ")).alias("_t"))
    freq = tok.groupBy("_t").agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    stats = freq.agg(F.sum("_tf").alias("_tot"))
    return (
        tok.join(freq, "_t")
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
