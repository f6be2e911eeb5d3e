"""The crawl scheduler cycle — one DataFrame DAG per cycle (SURVEY.md §3.1).

Pinned semantics (the ordering oracle in tests/oracle_sim.py implements the
SAME rules independently, single-threaded; byte-identical fetch_log and
seen-set are the driver's correctness gate):

  bootstrap (cycle 0)
    seeds: line i of the seed list has disc_seq=i BEFORE canonicalization;
    first-wins dedup per canon_url keeps the smallest disc_seq; surviving
    rows are renumbered disc_seq = rank over (original disc_seq) so the
    frontier starts with disc_seq = 0..n-1, depth = 0.

  each cycle t:
    1. robots gate: every queued URL whose path is disallowed by its host's
       rules (longest-prefix match, allow wins ties, default allow) is
       REMOVED from the frontier this cycle. Robots for a host are known
       when the host first enters the frontier (deterministic synthetic web
       => robots fetch is a pure function of host).
    2. due-time gate: host eligible iff last_fetch_cycle is null or
       t >= last_fetch_cycle + ceil(crawl_delay)   [delay unit = cycles]
    3. batch: per eligible host, top-k queued by (depth, disc_seq) —
       salted two-phase window (W1). fetch_seq = base + rank over
       (depth, disc_seq) across the whole batch; base = total prior fetches.
    4. fetch (V6): deterministic gen_page per canon_url -> status, kind,
       bytes, interleaved spans. fetched_at = BASE_TIME + t seconds.
    5. parse (V3): DC/OAI metadata + outlinks from text spans in offset
       order. doc_id = canon_url.
    6. frontier update: outlinks -> canonicalize -> first-wins per canon_url
       by (parent fetch_seq, link position) -> Bloom prefilter -> exact
       anti-join against seen on (url_hash, canon_url) -> assign
       disc_seq = max(seen.disc_seq) + rank over (parent_fetch_seq,
       link_pos); depth = parent_depth + 1. Batch rows leave the frontier;
       new rows enter with state 'queued'.
    7. checkpoint: snapshots (frontier, seen, host_state, seen_filter) +
       logs (fetch_log, documents, metadata, metrics) written, then the
       cycle manifest commits atomically (TableIO).

Determinism discipline: every rank/sequence derives from data columns
(depth, disc_seq, fetch_seq, link_pos) — never partition ids, never wall
clock — so local[8] and local[32] produce byte-identical fetch logs.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from croawl_spark import synth, tables
from croawl_spark.functions import robots as R
from croawl_spark.functions import urls as U
from croawl_spark.functions.extract import extract_all
from croawl_spark.operators.dedup import first_wins
from croawl_spark.operators.ranking import salted_topk
from croawl_spark.operators.seenfilter import build_filter, probe_filter
from croawl_spark.sources.tableio import TableIO

BASE_TIME = _dt.datetime(2024, 1, 1)


@dataclass
class CrawlConfig:
    k_per_host: int = 2          # politeness budget: fetches per host per cycle
    n_salt: int = 8              # W1 skew salt
    n_buckets: int = 64          # seen_filter buckets (scale: O(millions))
    m_bits: int = 1 << 15        # bloom bits per bucket (fixed per deployment)
    use_filter: bool = True
    shuffle_partitions: int | None = None


# ---------------------------------------------------------------------------
# vectorized stages (the four sanctioned Python boundaries)
# ---------------------------------------------------------------------------

_FETCH_OUT = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("url_hash", LongType()),
        StructField("host", StringType()),
        StructField("depth", IntegerType()),
        StructField("disc_seq", LongType()),
        StructField("fetch_seq", LongType()),
        StructField("status", IntegerType()),
        StructField("content_kind", StringType()),
        StructField("bytes", LongType()),
        StructField("spans", ArrayType(tables.SPAN)),
    ]
)


def _fetch_stage(batch: DataFrame) -> DataFrame:
    """V6 synthetic fetch: mapInPandas, Arrow batches, no shuffle."""

    def fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pages = pdf["canon_url"].map(synth.gen_page)
            out = pdf[
                ["canon_url", "url_hash", "host", "depth", "disc_seq", "fetch_seq"]
            ].copy()
            out["status"] = pages.map(lambda p: p["status"]).astype("int32")
            out["content_kind"] = pages.map(lambda p: p["content_kind"])
            out["bytes"] = pages.map(lambda p: p["nbytes"]).astype("int64")
            out["spans"] = pages.map(lambda p: p["spans"])
            yield out

    return batch.mapInPandas(fetch, _FETCH_OUT)


_PARSE_OUT = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("url_hash", LongType()),
        StructField("depth", IntegerType()),
        StructField("fetch_seq", LongType()),
        StructField("dc_title", StringType()),
        StructField("dc_creator", ArrayType(StringType())),
        StructField("dc_identifier", StringType()),
        StructField("oai_endpoint", StringType()),
        StructField("outlinks", ArrayType(StringType())),
        StructField("n_spans", IntegerType()),
    ]
)


def _parse_stage(fetched: DataFrame) -> DataFrame:
    """V3 DC/OAI + outlink extraction over interleaved spans (mapInPandas)."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                raw = r.spans if r.spans is not None else []
                spans = [
                    {"kind": s["kind"], "text": s["text"],
                     "media_ref": s["media_ref"], "offset": s["offset"]}
                    for s in raw
                ]
                ex = extract_all(spans)
                rows.append(
                    (
                        r.canon_url, r.url_hash, r.depth, r.fetch_seq,
                        ex["dc_title"], ex["dc_creator"], ex["dc_identifier"],
                        ex["oai_endpoint"], ex["outlinks"], len(spans),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _PARSE_OUT.fields])

    return fetched.filter(F.col("status") == 200).mapInPandas(parse, _PARSE_OUT)


_HOST_ROBOTS_OUT = tables.HOST_STATE


def _robots_stage(hosts: DataFrame) -> DataFrame:
    """S4: per-host robots fetch+parse (deterministic synthetic web)."""

    def rob(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for h in pdf["host"]:
                rules, delay = R.parse_robots(synth.robots_body(h))
                rows.append((h, [(a, p) for a, p in rules], delay, None))
            yield pd.DataFrame(
                rows, columns=["host", "robots_rules", "crawl_delay", "last_fetch_cycle"]
            )

    return hosts.mapInPandas(rob, _HOST_ROBOTS_OUT)


def _robots_allowed_col() -> F.Column:
    """F6 predicate as a vectorized pandas UDF over (rules, path)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def _allowed(rules: pd.Series, paths: pd.Series) -> pd.Series:
        def one(rp):
            rules_i, path = rp
            if rules_i is None:
                return True
            return R.allowed([(r["allow"], r["path_prefix"]) for r in rules_i], path)

        return pd.Series(map(one, zip(rules, paths)))

    return _allowed


# ---------------------------------------------------------------------------
# cycle driver
# ---------------------------------------------------------------------------


def bootstrap(
    spark: SparkSession, seeds: list[str], io: TableIO, cfg: CrawlConfig
) -> None:
    raw = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds)], "url string, seed_seq long"
    )
    canon = (
        raw.withColumn("canon_url", U.canon("url"))
        .filter(F.col("canon_url").isNotNull())
    )
    ded = first_wins(canon, "canon_url", ["seed_seq"])
    w = Window.orderBy("seed_seq")
    frontier = (
        ded.withColumn("disc_seq", F.row_number().over(w).cast("long") - 1)
        .select(
            "url",
            "canon_url",
            U.url_hash("canon_url").alias("url_hash"),
            U.host_of("canon_url").alias("host"),
            F.lit(0).cast("int").alias("depth"),
            "disc_seq",
            F.lit(0).cast("int").alias("priority"),
            F.lit("queued").alias("state"),
            F.lit(0).cast("int").alias("added_cycle"),
        )
    )
    seen = frontier.select("url_hash", "canon_url", "disc_seq")
    host_state = _robots_stage(frontier.select("host").distinct())
    io.write_snapshot(frontier, "frontier", -1)
    io.write_snapshot(seen, "seen", -1)
    io.write_snapshot(host_state, "host_state", -1)
    if cfg.use_filter:
        filt = build_filter(seen, cfg.n_buckets, cfg.m_bits)
        io.write_snapshot(filt, "seen_filter", -1)
    io.commit_cycle(-1, ["frontier", "seen", "host_state"] + (["seen_filter"] if cfg.use_filter else []))


def run_cycle(spark: SparkSession, io: TableIO, cycle: int, cfg: CrawlConfig) -> dict:
    """One scheduler cycle; returns counters for metrics/bench."""
    frontier = io.read_snapshot("frontier", cycle - 1)
    seen = io.read_snapshot("seen", cycle - 1)
    host_state = io.read_snapshot("host_state", cycle - 1)
    filt = io.read_snapshot("seen_filter", cycle - 1) if cfg.use_filter else None

    # 1+2. robots + due-time gates (J2 broadcast join: hosts << frontier)
    hs = F.broadcast(host_state)
    cand = frontier.join(hs, "host", "left")
    allowed_udf = _robots_allowed_col()
    cand = cand.withColumn("path", U.path_of("canon_url")).withColumn(
        "allowed", allowed_udf(F.col("robots_rules"), F.col("path"))
    )
    kept = cand.filter(F.col("allowed"))  # denied rows leave the frontier
    eligible = kept.filter(
        F.col("last_fetch_cycle").isNull()
        | (F.lit(cycle) >= F.col("last_fetch_cycle") + F.ceil("crawl_delay"))
    )

    # 3. salted politeness ranking (W1) + deterministic fetch_seq
    batch = salted_topk(
        eligible,
        group_col="host",
        order_cols=[F.col("depth"), F.col("disc_seq")],
        k=cfg.k_per_host,
        salt_src="url_hash",
        n_salt=cfg.n_salt,
    )
    try:
        fetch_base = (
            io.read_log("fetch_log", cycle - 1).agg(F.count(F.lit(1))).collect()[0][0]
        )
    except FileNotFoundError:
        fetch_base = 0
    wseq = Window.orderBy("depth", "disc_seq")
    batch = batch.withColumn(
        "fetch_seq", F.row_number().over(wseq).cast("long") + F.lit(fetch_base) - 1
    ).select("canon_url", "url_hash", "host", "depth", "disc_seq", "fetch_seq")
    batch = batch.localCheckpoint()  # cut the window lineage; batch is small

    # 4. fetch
    fetched = _fetch_stage(batch)
    fetched_at = F.lit(
        (BASE_TIME + _dt.timedelta(seconds=cycle)).strftime("%Y-%m-%d %H:%M:%S")
    ).cast("timestamp")
    fetch_log = fetched.select(
        F.lit(cycle).cast("int").alias("cycle"),
        "fetch_seq",
        "url_hash",
        "canon_url",
        "host",
        "status",
        "content_kind",
        fetched_at.alias("fetched_at"),
        "bytes",
    )
    documents = fetched.filter(F.col("status") == 200).select(
        F.col("canon_url").alias("doc_id"),
        "spans",
        "url_hash",
        F.lit(cycle).cast("int").alias("cycle"),
    )

    # 5. parse
    parsed = _parse_stage(fetched)
    metadata = parsed.select(
        F.col("canon_url").alias("doc_id"),
        "dc_title",
        "dc_creator",
        "dc_identifier",
        "oai_endpoint",
    )

    # 6. frontier update
    links = parsed.select(
        F.col("fetch_seq").alias("parent_fetch_seq"),
        (F.col("depth") + 1).cast("int").alias("depth"),
        F.posexplode_outer("outlinks").alias("link_pos", "url"),
    ).filter(F.col("url").isNotNull())
    links = (
        links.withColumn("canon_url", U.canon("url"))
        .filter(F.col("canon_url").isNotNull())
        .withColumn("url_hash", U.url_hash("canon_url"))
        .withColumn("host", U.host_of("canon_url"))
    )
    ded = first_wins(links, "canon_url", ["parent_fetch_seq", "link_pos"])
    if cfg.use_filter and filt is not None:
        probed = probe_filter(ded, filt, cfg.n_buckets, cfg.m_bits)
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        survivors = maybe.join(seen, ["url_hash", "canon_url"], "left_anti")
        new_links = fresh.unionByName(survivors)
    else:
        new_links = ded.join(seen, ["url_hash", "canon_url"], "left_anti")

    seen_base = (
        seen.agg(F.coalesce(F.max("disc_seq") + 1, F.lit(0))).collect()[0][0]
    )
    wnew = Window.orderBy("parent_fetch_seq", "link_pos")
    new_rows = new_links.withColumn(
        "disc_seq", F.row_number().over(wnew).cast("long") + F.lit(seen_base) - 1
    ).select(
        "url",
        "canon_url",
        "url_hash",
        "host",
        "depth",
        "disc_seq",
        F.lit(0).cast("int").alias("priority"),
        F.lit("queued").alias("state"),
        F.lit(cycle).cast("int").alias("added_cycle"),
    )
    new_rows = new_rows.localCheckpoint()

    remaining = kept.select(*[f.name for f in tables.FRONTIER.fields]).join(
        batch.select("url_hash", "canon_url"), ["url_hash", "canon_url"], "left_anti"
    )
    frontier_next = remaining.unionByName(new_rows)
    seen_next = seen.unionByName(new_rows.select("url_hash", "canon_url", "disc_seq"))

    # host_state: mark fetched hosts; add rows for newly-seen hosts
    batch_hosts = batch.select("host").distinct().withColumn("_f", F.lit(cycle))
    hs_known = host_state.join(batch_hosts, "host", "left").select(
        "host",
        "robots_rules",
        "crawl_delay",
        F.coalesce(F.col("_f"), F.col("last_fetch_cycle")).cast("int").alias("last_fetch_cycle"),
    )
    new_hosts = (
        new_rows.select("host").distinct().join(host_state.select("host"), "host", "left_anti")
    )
    host_state_next = hs_known.unionByName(_robots_stage(new_hosts))

    # 7. metrics (per hash-bucket lineage) + checkpoint commit
    n_sched = batch.count()
    n_parsed_df = parsed.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("n_spans"), F.lit(0)).alias("s")
    ).collect()[0]
    metrics = (
        batch.groupBy(F.pmod("url_hash", F.lit(cfg.n_buckets)).cast("int").alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("urls_scheduled"))
        .select(
            F.lit(cycle).cast("int").alias("cycle"),
            "partition_id",
            "urls_scheduled",
            F.lit(int(n_parsed_df["n"])).cast("long").alias("urls_parsed"),
            F.lit(int(n_parsed_df["s"])).cast("long").alias("spans_parsed"),
            F.lit(0).cast("long").alias("wall_ms"),
            F.concat(F.lit(f"{cycle}:"), F.col("partition_id")).alias("lineage_ref"),
        )
    )

    io.write_snapshot(fetch_log, "fetch_log", cycle)
    io.write_snapshot(documents, "documents", cycle)
    io.write_snapshot(metadata, "metadata", cycle)
    io.write_snapshot(metrics, "metrics", cycle)
    io.write_snapshot(frontier_next, "frontier", cycle)
    io.write_snapshot(seen_next, "seen", cycle)
    io.write_snapshot(host_state_next, "host_state", cycle)
    committed = [
        "fetch_log", "documents", "metadata", "metrics",
        "frontier", "seen", "host_state",
    ]
    if cfg.use_filter:
        delta = new_rows.select("url_hash")
        filt_next = build_filter(delta, cfg.n_buckets, cfg.m_bits, existing=filt)
        io.write_snapshot(filt_next, "seen_filter", cycle)
        committed.append("seen_filter")
    io.commit_cycle(cycle, committed)
    return {"cycle": cycle, "scheduled": n_sched, "parsed": int(n_parsed_df["n"]),
            "spans": int(n_parsed_df["s"])}


def run_crawl(
    spark: SparkSession,
    seeds: list[str],
    n_cycles: int,
    base_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
) -> TableIO:
    """Batch entry point (§3.1). With resume=True, continues from the last
    committed cycle in base_dir — the resumability contract."""
    cfg = cfg or CrawlConfig()
    io = TableIO(spark, base_dir)
    start = 0
    if resume:
        start = io.last_committed_cycle() + 1
    else:
        io.destroy()
        io = TableIO(spark, base_dir)
        bootstrap(spark, seeds, io, cfg)
    for t in range(start, n_cycles):
        run_cycle(spark, io, t, cfg)
    return io
