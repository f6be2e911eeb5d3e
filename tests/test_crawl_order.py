"""Crawl-order + URL-seen equality vs the single-process oracle — the
driver's binding correctness rule (BASELINE.json north_rule)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from croawl_spark import synth
from croawl_spark.plans.cycle import CrawlConfig, run_crawl, run_cycle
from croawl_spark.sources.tableio import TableIO
from tests.oracle_sim import simulate

N_SEEDS = 100
N_CYCLES = 4
CFG = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, m_bits=1 << 12)


def _spark_log_rows(io: TableIO):
    log = io.read_log("fetch_log")
    rows = (
        log.orderBy("fetch_seq")
        .select("cycle", "fetch_seq", "canon_url", "host", "status",
                "content_kind", "bytes")
        .collect()
    )
    return [tuple(r) for r in rows]


@pytest.fixture(scope="module")
def crawl(spark):
    seeds = synth.gen_seeds(N_SEEDS)
    with tempfile.TemporaryDirectory() as d:
        io = run_crawl(spark, seeds, N_CYCLES, f"{d}/warehouse", CFG)
        oracle_log, oracle_seen, _ = simulate(seeds, N_CYCLES, CFG.k_per_host)
        yield io, oracle_log, oracle_seen


def test_fetch_order_exact(crawl):
    io, oracle_log, _ = crawl
    got = _spark_log_rows(io)
    want = [
        (c, s, url, host, st, kind, b) for (c, s, url, host, st, kind, b) in oracle_log
    ]
    assert len(got) == len(want), f"{len(got)} vs {len(want)} fetches"
    for g, w in zip(got, want):
        assert g == w, f"first divergence: spark={g} oracle={w}"


def test_seen_membership_exact(crawl):
    io, _, oracle_seen = crawl
    seen = io.read_log("seen")
    got = {r["canon_url"]: r["disc_seq"] for r in seen.collect()}
    assert got == oracle_seen


def test_seen_has_no_hash_dupes(crawl):
    io, _, _ = crawl
    seen = io.read_log("seen")
    n = seen.count()
    assert seen.select("canon_url").distinct().count() == n
    assert seen.select("disc_seq").distinct().count() == n


def test_content_seen_tables(crawl):
    """Content-seen side tables: one content_dups row per parsed doc; the
    content_seen log holds exactly the distinct content hashes, keyed by
    their first fetch_seq (deterministic first-wins)."""
    io, _, _ = crawl
    dups = io.read_log("content_dups")
    docs = io.read_log("documents")
    assert dups.count() == docs.count()
    seen_log = io.read_log("content_seen")
    n_distinct = dups.select("content_hash").distinct().count()
    assert seen_log.count() == n_distinct
    assert seen_log.select("content_hash").distinct().count() == n_distinct
    # non-dup rows are exactly the log's first_fetch_seq rows
    firsts = {r["first_fetch_seq"] for r in seen_log.collect()}
    originals = {r["fetch_seq"] for r in dups.filter("NOT is_content_dup").collect()}
    assert firsts == originals


def test_frontier_disjoint_from_fetched(crawl):
    """invariant: no queued URL was ever fetched (U3-style audit)."""
    io, _, _ = crawl
    f = io.read_snapshot("frontier")
    log = io.read_log("fetch_log")
    assert f.join(log, "canon_url", "left_semi").count() == 0


def test_shuffle_partition_invariance(spark):
    """Same seeds, radically different shuffle parallelism => identical log."""
    seeds = synth.gen_seeds(60)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    logs = []
    try:
        for np_ in ("2", "27"):
            spark.conf.set("spark.sql.shuffle.partitions", np_)
            with tempfile.TemporaryDirectory() as d:
                io = run_crawl(spark, seeds, 3, f"{d}/w", CFG)
                logs.append(_spark_log_rows(io))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert logs[0] == logs[1]


def test_resume_equals_uninterrupted(spark):
    """Kill after cycle 1, resume, compare vs straight-through run."""
    seeds = synth.gen_seeds(60)
    with tempfile.TemporaryDirectory() as d:
        io_full = run_crawl(spark, seeds, 3, f"{d}/full", CFG)
        full = _spark_log_rows(io_full)
        io_part = run_crawl(spark, seeds, 2, f"{d}/part", CFG)
        # resume picks up after the last committed cycle
        io_res = run_crawl(spark, seeds, 3, f"{d}/part", CFG, resume=True)
        assert _spark_log_rows(io_res) == full


def test_bloom_filter_off_same_result(spark):
    """The AMQ prefilter is a pure optimization: on/off must not change
    the crawl (FP erased by exact anti-join; FN impossible)."""
    seeds = synth.gen_seeds(60)
    cfg_off = CrawlConfig(k_per_host=2, n_salt=4, use_filter=False)
    with tempfile.TemporaryDirectory() as d:
        a = _spark_log_rows(run_crawl(spark, seeds, 3, f"{d}/a", CFG))
        b = _spark_log_rows(run_crawl(spark, seeds, 3, f"{d}/b", cfg_off))
    assert a == b


def test_filter_autosize_rebuilds_and_restores_fp(spark):
    """Drive the bloom filter past its design load: the auto-sizer must
    start a new generation (m_bits doubled in the committed counters),
    restore projected FP under fp_max, and never change crawl output."""
    from croawl_spark.operators.seenfilter import projected_fp

    seeds = synth.gen_seeds(80)
    tiny = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=4, m_bits=1 << 8, fp_max=0.05)
    off = CrawlConfig(k_per_host=2, n_salt=4, use_filter=False)
    with tempfile.TemporaryDirectory() as d:
        io = run_crawl(spark, seeds, 3, f"{d}/tiny", tiny)
        want = _spark_log_rows(run_crawl(spark, seeds, 3, f"{d}/off", off))
        got = _spark_log_rows(io)
        counters = io.counters()
        m_committed = counters["filter_m_bits"]
        n_seen = io.read_log("seen").count()
        filt = io.read_snapshot("seen_filter")
        n_rows = filt.count()
    assert got == want  # filter is a pure optimization, resized or not
    assert m_committed > (1 << 8), "auto-sizer never fired"
    per_bucket = -(-n_seen // tiny.n_buckets)
    assert projected_fp(per_bucket, m_committed) <= tiny.fp_max
    assert n_rows == tiny.n_buckets


def test_resume_with_different_filter_geometry(spark):
    """Resuming with a different --n-buckets must rebuild the filter from
    the seen log (committed geometry wins until rebuilt), not mis-probe
    old blobs under a new pmod — fetch_log stays byte-identical."""
    seeds = synth.gen_seeds(60)
    cfg_a = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, m_bits=1 << 12)
    cfg_b = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=4, m_bits=1 << 10)
    with tempfile.TemporaryDirectory() as d:
        full = _spark_log_rows(run_crawl(spark, seeds, 3, f"{d}/full", cfg_a))
        run_crawl(spark, seeds, 2, f"{d}/part", cfg_a)
        io_res = run_crawl(spark, seeds, 3, f"{d}/part", cfg_b, resume=True)
        assert _spark_log_rows(io_res) == full
        # the resumed run now owns cfg_b geometry in the committed counters
        assert io_res.counters()["filter_n_buckets"] == 4


def test_committed_filter_kind_resolution():
    """Kind resolution for committed manifests (ADVICE r03, medium): an
    explicit counter wins; a legacy manifest (geometry counter, no kind)
    resolves to the kind that geometry counter implies — NEVER to cfg;
    only a manifest with no filter counters at all falls back to cfg."""
    from croawl_spark.operators.seenfilter import committed_filter_kind

    assert committed_filter_kind({"filter_kind": "cuckoo"}, "bloom") == "cuckoo"
    # pre-filter_kind manifests were written by the bloom-only engine
    assert committed_filter_kind({"filter_m_bits": 4096}, "cuckoo") == "bloom"
    assert committed_filter_kind({"filter_m_slots": 64}, "bloom") == "cuckoo"
    assert committed_filter_kind({}, "cuckoo") == "cuckoo"  # fresh warehouse


def test_resume_legacy_manifest_as_cuckoo_rebuilds(spark):
    """Resuming a pre-upgrade (no filter_kind counter) bloom warehouse
    with cfg.filter_kind='cuckoo' must detect the kind mismatch and
    rebuild from the seen log — the old cfg-fallback skipped the rebuild
    and probe_cuckoo reinterpreted the bloom blob; at m_bits == 64*m_slots
    the sizes coincide so the mis-probe was silent and its false negatives
    bypassed the exact anti-join (re-admitting seen URLs)."""
    import json as _json

    seeds = synth.gen_seeds(60)
    # the exact silent-mis-probe geometry from the advisory:
    # bloom blob bytes (m_bits/8) == cuckoo blob bytes (m_slots*8)
    bloom = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, m_bits=1 << 12)
    cuckoo = CrawlConfig(
        k_per_host=2, n_salt=4, n_buckets=16,
        filter_kind="cuckoo", m_slots=(1 << 12) // 64,
    )
    with tempfile.TemporaryDirectory() as d:
        full = _spark_log_rows(run_crawl(spark, seeds, 3, f"{d}/full", bloom))
        io_part = run_crawl(spark, seeds, 2, f"{d}/part", bloom)
        # forge a legacy manifest: geometry counters present, kind absent
        mpath = io_part._manifest_path
        with open(mpath) as f:
            m = _json.load(f)
        assert m["counters"].pop("filter_kind") == "bloom"
        with open(mpath, "w") as f:
            _json.dump(m, f)
        io_res = run_crawl(spark, seeds, 3, f"{d}/part", cuckoo, resume=True)
        assert _spark_log_rows(io_res) == full
        c = io_res.counters()
        assert c["filter_kind"] == "cuckoo" and "filter_m_slots" in c


def test_expire_recrawl_forgets_and_requeues(spark):
    """Recrawl-TTL maintenance: URLs last-fetched > ttl cycles ago are
    compacted out of the seen log AND the rebuilt filter, so a rediscovered
    link to them passes the whole seen gate (filter probe + exact
    anti-join) as new; the continued crawl stays consistent and
    deterministic across reruns."""
    from croawl_spark.operators.seenfilter import probe_filter
    from croawl_spark.plans.maintenance import expire_recrawl

    seeds = synth.gen_seeds(60)

    def run_with_expiry(d, check=False):
        io = run_crawl(spark, seeds, 3, d, CFG)
        stats = expire_recrawl(spark, io, ttl=2, cfg=CFG)
        if check:
            # asserts at the post-expiry point, before the continuation
            assert stats["expired"] > 0
            log = io.read_log("fetch_log")
            expired = (
                log.groupBy("url_hash", "canon_url")
                .agg(F.max("cycle").alias("lc"))
                .filter("lc <= 0")  # cutoff = last(2) - ttl(2)
                .select("url_hash", "canon_url")
            )
            seen = io.read_log("seen")
            n_expired = expired.count()
            assert n_expired == stats["expired"] and n_expired > 0
            # the full seen gate treats them as new: exact anti-join passes
            # all of them, and the rebuilt filter genuinely forgot them
            assert (
                expired.join(seen, ["url_hash", "canon_url"], "left_anti").count()
                == n_expired
            )
            filt = io.read_snapshot("seen_filter")
            counters = io.counters()
            probed = probe_filter(
                expired, filt,
                int(counters["filter_n_buckets"]), int(counters["filter_m_bits"]),
            )
            assert probed.filter(~F.col("maybe_seen")).count() > 0
        io = run_crawl(spark, seeds, 7, d, CFG, resume=True)
        return io

    with tempfile.TemporaryDirectory() as d:
        io = run_with_expiry(f"{d}/a", check=True)
        seen = io.read_log("seen")
        assert seen.select("canon_url").distinct().count() == seen.count()
        # determinism: identical rerun -> identical post-expiry fetch log
        io2 = run_with_expiry(f"{d}/b")
        assert _spark_log_rows(io2) == _spark_log_rows(io)


def test_tombstone_frontier_read_volume_is_live_not_history(spark):
    """VERDICT r03 item #5 guard: under the default tombstone frontier
    with periodic compaction, the adds volume read_merge scans stays
    O(live rows + deltas since the last compaction), never O(history):
      * every tombstone kills exactly one add, so adds - dels == resolved
        live view at all times;
      * the manifest never references more than compact_every segments of
        either side (compaction folds them in one replace-commit);
      * a never-compacting run scans strictly more adds rows for a
        byte-identical crawl (compaction is a pure read-cost optimization).
    """
    seeds = synth.gen_seeds(60)
    k = 4
    cfg_c = CrawlConfig(k_per_host=2, n_salt=4, frontier_compact_every=k)
    cfg_n = CrawlConfig(k_per_host=2, n_salt=4, frontier_compact_every=0)
    with tempfile.TemporaryDirectory() as d:
        io_c = run_crawl(spark, seeds, 10, f"{d}/c", cfg_c)
        io_n = run_crawl(spark, seeds, 10, f"{d}/n", cfg_n)
        assert _spark_log_rows(io_c) == _spark_log_rows(io_n)
        adds_c = io_c.read_log("frontier__adds").count()
        dels_c = io_c.read_log("frontier__dels").count()
        live = io_c.read_merge("frontier").count()
        assert adds_c - dels_c == live
        m = io_c.read_manifest()
        assert 0 < len(m["tables"]["frontier__adds"]) <= k
        assert len(m["tables"]["frontier__dels"]) < k
        adds_n = io_n.read_log("frontier__adds").count()
        assert adds_c < adds_n


def test_enable_filter_mid_crawl(spark):
    """Turning the bloom prefilter ON for a warehouse crawled without one
    must rebuild from the seen log and continue identically."""
    seeds = synth.gen_seeds(60)
    off = CrawlConfig(k_per_host=2, n_salt=4, use_filter=False)
    with tempfile.TemporaryDirectory() as d:
        full = _spark_log_rows(run_crawl(spark, seeds, 3, f"{d}/full", off))
        run_crawl(spark, seeds, 2, f"{d}/mix", off)
        io = run_crawl(spark, seeds, 3, f"{d}/mix", CFG, resume=True)
        assert _spark_log_rows(io) == full
        assert io.read_snapshot("seen_filter").count() == CFG.n_buckets


def test_cuckoo_filter_crawl_equals_bloom(spark):
    """filter_kind='cuckoo' is a drop-in AMQ: fetch log + seen set must be
    byte-identical to the bloom crawl (and hence to the oracle), including
    through the auto-sizer (tiny m_slots forces a mid-crawl regeneration)."""
    seeds = synth.gen_seeds(60)
    ck = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=4,
                     filter_kind="cuckoo", m_slots=16)  # forces auto-resize
    with tempfile.TemporaryDirectory() as d:
        io_ck = run_crawl(spark, seeds, 3, f"{d}/ck", ck)
        io_bl = run_crawl(spark, seeds, 3, f"{d}/bl", CFG)
        assert _spark_log_rows(io_ck) == _spark_log_rows(io_bl)
        a = {r["canon_url"]: r["disc_seq"] for r in io_ck.read_log("seen").collect()}
        b = {r["canon_url"]: r["disc_seq"] for r in io_bl.read_log("seen").collect()}
        assert a == b
        c = io_ck.counters()
        assert c["filter_kind"] == "cuckoo"
        assert c["filter_m_slots"] > 16, "cuckoo auto-sizer never fired"
        assert io_ck.read_snapshot("seen_filter").filter("kind != 'cuckoo'").count() == 0


def test_expire_recrawl_cuckoo_streams_deletes(spark):
    """Cuckoo expiry: the expired hashes are DELETED from the existing
    blobs (O(expired), no O(seen) rebuild) — expired URLs then pass the
    probe as new, retained URLs still probe maybe-seen (deletion is
    copy-safe, no false negatives), and the continued crawl matches the
    bloom-expiry continuation exactly."""
    from croawl_spark.operators.seenfilter import probe_cuckoo, probe_filter
    from croawl_spark.plans.maintenance import expire_recrawl

    seeds = synth.gen_seeds(60)
    ck = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, filter_kind="cuckoo")

    def crawl_expire_continue(d, cfg, probe):
        io = run_crawl(spark, seeds, 3, d, cfg)
        stats = expire_recrawl(spark, io, ttl=2, cfg=cfg)
        assert stats["expired"] > 0
        counters = io.counters()
        nb = int(counters["filter_n_buckets"])
        geo = int(counters.get("filter_m_slots", counters.get("filter_m_bits", 0)))
        filt = io.read_snapshot("seen_filter")
        log = io.read_log("fetch_log")
        expired = (
            log.groupBy("url_hash", "canon_url").agg(F.max("cycle").alias("lc"))
            .filter("lc <= 0").select("url_hash", "canon_url")
        )
        retained = io.read_log("seen")
        # expired URLs probe definitely-new; retained have no false negatives
        assert probe(expired, filt, nb, geo).filter(F.col("maybe_seen")).count() == 0
        assert (
            probe(retained.select("url_hash"), filt, nb, geo)
            .filter(~F.col("maybe_seen")).count() == 0
        )
        io = run_crawl(spark, seeds, 6, d, cfg, resume=True)
        return _spark_log_rows(io)

    with tempfile.TemporaryDirectory() as d:
        got = crawl_expire_continue(f"{d}/ck", ck, probe_cuckoo)
        want = crawl_expire_continue(f"{d}/bl", CFG, probe_filter)
        assert got == want


def test_tableio_merge_semantics(spark, tmp_path):
    """Cycle-aware tombstone resolution: a delete kills only STRICTLY
    earlier adds, so re-add-after-delete and same-cycle add+delete both
    survive (the expiry-rediscovery and fetch-while-rediscovered cases);
    compaction folds everything into one segment atomically."""
    io = TableIO(spark, str(tmp_path / "w"))

    def add(rows):
        return spark.createDataFrame(rows, "k long, v string")

    def dels(ks):
        return spark.createDataFrame([(k,) for k in ks], "k long")

    io.commit_cycle(0, io.write_merge_delta(add([(1, "a"), (2, "b")]), None, "t", 0))
    io.commit_cycle(1, io.write_merge_delta(add([(3, "c")]), dels([1]), "t", 1))
    io.commit_cycle(2, io.write_merge_delta(add([(1, "a2"), (9, "z")]), dels([2, 9]), "t", 2))

    assert {tuple(r) for r in io.read_merge("t", 1).collect()} == {(2, "b"), (3, "c")}
    want = {(3, "c"), (1, "a2"), (9, "z")}
    assert {tuple(r) for r in io.read_merge("t").collect()} == want
    # read_snapshot falls back to the resolved merge view transparently
    assert {tuple(r) for r in io.read_snapshot("t").collect()} == want

    # compaction: resolved view becomes the only segment, dels empty — one
    # atomic replace-commit, then lazy orphan pruning
    resolved = io.read_merge("t")
    written = io.write_merge_delta(resolved, None, "t", 3)
    io.commit_cycle(3, written, replace={"t__adds": [3], "t__dels": []})
    io.prune_orphans("t__adds")
    io.prune_orphans("t__dels")
    assert {tuple(r) for r in io.read_merge("t").collect()} == want
    m = io.read_manifest()
    assert m["tables"]["t__adds"] == [3] and m["tables"]["t__dels"] == []
    import os

    assert os.listdir(os.path.join(io.base, "t__adds")) == ["cycle=3"]
    # deletes still compose after compaction
    io.commit_cycle(4, io.write_merge_delta(None, dels([3]), "t", 4))
    assert {tuple(r) for r in io.read_merge("t").collect()} == {(1, "a2"), (9, "z")}


def test_tombstone_frontier_equals_rewrite_and_compacts(spark):
    """VERDICT r02 item #2 done-criteria: O(delta) frontier checkpointing
    must leave the fetch log AND the resolved frontier byte-identical to
    the full-rewrite engine, survive an interrupt+resume across a
    compaction boundary, and actually write only O(batch+new) rows on
    non-compact cycles."""
    seeds = synth.gen_seeds(60)
    ts = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, m_bits=1 << 12,
                     frontier_mode="tombstone", frontier_compact_every=3)
    rw = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, m_bits=1 << 12,
                     frontier_mode="rewrite")
    with tempfile.TemporaryDirectory() as d:
        io_ts = run_crawl(spark, seeds, 5, f"{d}/ts", ts)
        io_rw = run_crawl(spark, seeds, 5, f"{d}/rw", rw)
        assert _spark_log_rows(io_ts) == _spark_log_rows(io_rw)
        cols = io_rw.read_snapshot("frontier").columns
        a = sorted(tuple(r) for r in io_ts.read_snapshot("frontier").select(*cols).collect())
        b = sorted(tuple(r) for r in io_rw.read_snapshot("frontier").collect())
        assert a == b
        # compaction fired at cycle 2 ((2+1) % 3 == 0): one adds segment
        # there, deltas after, and no tombstones older than the compaction
        m = io_ts.read_manifest()
        assert m["tables"]["frontier__adds"] == [2, 3, 4]
        assert m["tables"]["frontier__dels"] == [3, 4]
        # O(delta) write volume: cycle 3's segments hold the cycle's new
        # URLs and fetched batch only — strictly smaller than the frontier
        adds3 = spark.read.parquet(f"{d}/ts/frontier__adds/cycle=3").count()
        dels3 = spark.read.parquet(f"{d}/ts/frontier__dels/cycle=3").count()
        n_batch3 = io_ts.read_log("fetch_log").filter(F.col("cycle") == 3).count()
        assert dels3 == n_batch3
        n_frontier = io_ts.read_snapshot("frontier").count()
        assert adds3 + dels3 < n_frontier
        # resume across the compaction boundary: stop after cycle 2's
        # commit (post-compaction), resume to 5 -> identical log
        io_part = run_crawl(spark, seeds, 3, f"{d}/part", ts)
        assert io_part.read_manifest()["tables"]["frontier__adds"] == [2]
        io_res = run_crawl(spark, seeds, 5, f"{d}/part", ts, resume=True)
        assert _spark_log_rows(io_res) == _spark_log_rows(io_rw)


def test_tombstone_crash_orphans_are_replayed(spark):
    """Crash between data write and manifest commit leaves orphan
    frontier__adds/__dels segment dirs; replay must overwrite them
    idempotently and produce the uninterrupted log (the TableIO commit
    protocol's core guarantee, extended to merge tables)."""
    import os

    seeds = synth.gen_seeds(60)
    ts = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, m_bits=1 << 12,
                     frontier_mode="tombstone", frontier_compact_every=3)
    with tempfile.TemporaryDirectory() as d:
        full = _spark_log_rows(run_crawl(spark, seeds, 4, f"{d}/full", ts))
        io = run_crawl(spark, seeds, 2, f"{d}/part", ts)
        # fake a crash mid-cycle-2: uncommitted garbage segments on disk
        for t in ("frontier__adds", "frontier__dels", "fetch_log"):
            p = os.path.join(io.base, t, "cycle=2")
            os.makedirs(p, exist_ok=True)
            spark.range(3).write.mode("overwrite").parquet(p)
        assert io.last_committed_cycle() == 1  # manifest untouched
        io_res = run_crawl(spark, seeds, 4, f"{d}/part", ts, resume=True)
        assert _spark_log_rows(io_res) == full


def test_salted_topk_equals_plain_topk(spark):
    """W1 correctness: the salted two-phase ranking must select EXACTLY the
    rows a plain per-host window would (salt defuses skew, never changes
    results)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from croawl_spark.functions import urls as U
    from croawl_spark.operators.ranking import salted_topk

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    fr = o.select(
        F.concat(F.lit("http://h"), (F.col("o_custkey") % 7).cast("string"),
                 F.lit(".t/p/"), F.col("o_orderkey").cast("string")).alias("canon_url"),
        (F.col("o_orderkey") % 3).cast("int").alias("depth"),
        F.col("o_orderkey").alias("disc_seq"),
    ).withColumn("url_hash", U.url_hash("canon_url")).withColumn(
        "host", U.host_of("canon_url"))
    for k, n_salt in ((5, 1), (5, 16), (50, 8)):
        salted = salted_topk(fr, "host", [F.col("depth"), F.col("disc_seq")],
                             k=k, n_salt=n_salt)
        w = Window.partitionBy("host").orderBy("depth", "disc_seq")
        plain = (fr.withColumn("host_rank", F.row_number().over(w))
                 .filter(F.col("host_rank") <= k))
        got = sorted((r["host"], r["canon_url"], r["host_rank"])
                     for r in salted.collect())
        want = sorted((r["host"], r["canon_url"], r["host_rank"])
                      for r in plain.collect())
        assert got == want, (k, n_salt)


def test_load_seeds_preserves_file_order(spark, tmp_path):
    from croawl_spark.sources.seeds import load_seeds

    lines = [f"http://h{i % 3}.test/p/{i}" for i in range(500)]
    f = tmp_path / "seeds.txt"
    f.write_text("\n".join(lines) + "\n")
    got = {r["url"]: r["seed_seq"] for r in load_seeds(spark, str(f)).collect()}
    assert got == {u: i for i, u in enumerate(lines)}


def test_spark_submit_py_files_deployment(tmp_path):
    """north_rule deployment surface: the batch job must run under
    ``spark-submit --py-files croawl_spark.zip`` with the package shipped
    ONLY via the zip (cwd is outside the repo, so imports cannot fall
    back to the source tree) and emit per-cycle metrics."""
    import json
    import os
    import subprocess
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = tmp_path / "croawl_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(repo, "croawl_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, repo))
    seeds = tmp_path / "seeds.txt"
    seeds.write_text("\n".join(synth.gen_seeds(30)))
    out = subprocess.run(
        [
            "spark-submit", "--py-files", str(zpath),
            os.path.join(repo, "croawl_spark", "plans", "crawl_job.py"),
            "--seeds", str(seeds), "--cycles", "1", "--budget", "2",
            "--warehouse", str(tmp_path / "wh"),
        ],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"cycle"')]
    assert len(lines) == 1
    assert json.loads(lines[0])["scheduled"] > 0
