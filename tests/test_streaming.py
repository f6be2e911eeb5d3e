"""Streaming operator tests (ST1-ST5): each streaming computation must agree
with its batch equivalent, and the streaming crawl must equal the batch crawl
(hence equal the ordering oracle)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from croawl_spark import synth
from croawl_spark.plans.cycle import CrawlConfig, run_crawl
from croawl_spark.streaming import jobs as SJ

EVENTS = "/root/testdata/sf0.01/events.parquet"


def _run_stream_to_memory(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


@pytest.fixture()
def events_stream(spark):
    batch = spark.read.parquet(EVENTS)
    stream = spark.readStream.schema(batch.schema).parquet(
        "/root/testdata/sf0.01", pathGlobFilter="events.parquet"
    )
    # parquet infers timestamp_ntz, which watermarks reject — cast both sides
    cast = lambda df: df.withColumn("ts", F.col("ts").cast("timestamp"))
    return cast(batch), cast(stream)


def test_stream_crawl_equals_batch(spark):
    """ST1: the foreachBatch streaming crawl produces the exact same
    fetch_log as the batch crawl loop."""
    seeds = synth.gen_seeds(60)
    cfg = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, m_bits=1 << 12)
    cols = ["cycle", "fetch_seq", "canon_url", "host", "status", "content_kind", "bytes"]
    with tempfile.TemporaryDirectory() as d:
        io_b = run_crawl(spark, seeds, 3, f"{d}/batch", cfg)
        batch_log = [tuple(r) for r in io_b.read_log("fetch_log").orderBy("fetch_seq").select(*cols).collect()]
        io_s = SJ.stream_crawl(spark, seeds, 3, f"{d}/stream", cfg)
        stream_log = [tuple(r) for r in io_s.read_log("fetch_log").orderBy("fetch_seq").select(*cols).collect()]
    assert stream_log == batch_log


def test_stream_crawl_resume_equals_straight_through(spark):
    """ST1 resumability: stop the streaming crawl after 2 cycles, resume to
    4 — the stream's offset checkpoint skips the done ticks and the result
    equals an uninterrupted 4-cycle batch run."""
    seeds = synth.gen_seeds(60)
    cfg = CrawlConfig(k_per_host=2, n_salt=4, n_buckets=16, m_bits=1 << 12)
    cols = ["cycle", "fetch_seq", "canon_url", "host", "status", "content_kind", "bytes"]
    with tempfile.TemporaryDirectory() as d:
        io_b = run_crawl(spark, seeds, 4, f"{d}/batch", cfg)
        want = [tuple(r) for r in io_b.read_log("fetch_log").orderBy("fetch_seq").select(*cols).collect()]
        SJ.stream_crawl(spark, seeds, 2, f"{d}/stream", cfg)
        io_s = SJ.stream_crawl(spark, seeds, 4, f"{d}/stream", cfg, resume=True)
        got = [tuple(r) for r in io_s.read_log("fetch_log").orderBy("fetch_seq").select(*cols).collect()]
    assert got == want


def test_windowed_rates_stream_equals_batch(spark, events_stream):
    batch, stream = events_stream
    want = sorted(tuple(r) for r in SJ.windowed_rates(batch).collect())
    _run_stream_to_memory(SJ.windowed_rates(stream), "wr", mode="complete")
    got = sorted(tuple(r) for r in spark.sql("select * from wr").collect())
    assert got == want


def test_sliding_window_rows(spark, events_stream):
    batch, _ = events_stream
    slid = SJ.windowed_rates(batch, window="2 hours", slide="1 hour")
    tumb = SJ.windowed_rates(batch)
    assert slid.count() > tumb.count()  # overlapping windows


def test_session_windows_stream_equals_batch(spark, events_stream):
    batch, stream = events_stream
    want = sorted(tuple(r) for r in SJ.session_activity(batch).collect())
    _run_stream_to_memory(SJ.session_activity(stream), "sw", mode="complete")
    got = sorted(tuple(r) for r in spark.sql("select * from sw").collect())
    assert got == want


def test_stream_seen_dedup(spark):
    import tempfile as tf

    with tf.TemporaryDirectory() as d:
        rows = [
            (1, "2024-01-01 00:00:00"),
            (2, "2024-01-01 00:00:01"),
            (1, "2024-01-01 00:00:02"),  # dup within horizon
            (3, "2024-01-01 00:00:03"),
            (2, "2024-01-01 00:00:04"),  # dup
        ]
        df = spark.createDataFrame(rows, "url_hash long, ts_s string").select(
            "url_hash", F.col("ts_s").cast("timestamp").alias("ts")
        )
        df.write.mode("overwrite").parquet(f"{d}/in")
        stream = spark.readStream.schema("url_hash long, ts timestamp").parquet(f"{d}/in")
        _run_stream_to_memory(SJ.stream_seen_dedup(stream), "dedup")
        got = sorted(r["url_hash"] for r in spark.sql("select * from dedup").collect())
        assert got == [1, 2, 3]


def test_host_fetch_state(spark):
    import tempfile as tf

    with tf.TemporaryDirectory() as d:
        rows = [
            ("a.test", "2024-01-01 00:00:00"),
            ("a.test", "2024-01-01 00:00:10"),
            ("a.test", "2024-01-01 00:00:40"),
            ("b.test", "2024-01-01 00:00:05"),
        ]
        df = spark.createDataFrame(rows, "host string, ts_s string").select(
            "host", F.col("ts_s").cast("timestamp").alias("ts")
        )
        df.write.mode("overwrite").parquet(f"{d}/in")
        stream = spark.readStream.schema("host string, ts timestamp").parquet(f"{d}/in")
        _run_stream_to_memory(SJ.host_fetch_state(stream), "hstate", mode="update")
        got = {r["host"]: (r["n_fetches"], r["max_gap_s"]) for r in spark.sql("select * from hstate").collect()}
        assert got["a.test"] == (3, 30)
        assert got["b.test"] == (1, 0)


def test_stream_corpus_ingest_equals_batch(spark):
    """ST6 (training side): streaming corpus ingest over 3 single-file
    micro-batches — with exact duplicates planted both WITHIN a batch and
    ACROSS batches — must equal the batch pipeline over the concatenated
    input (quality screen, then global first-wins on content hash)."""
    from croawl_spark.operators.corpus import repetition_filter
    from croawl_spark.operators.dedup import first_wins

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    b1 = docs.filter(F.col("doc_id") < 120)
    # within-batch dup (id 10 copied as 90010) + fresh rows
    b2 = (
        docs.filter((F.col("doc_id") >= 120) & (F.col("doc_id") < 240))
        .unionByName(
            docs.filter(F.col("doc_id") == 10).select(
                (F.col("doc_id") + 90000).alias("doc_id"), "text", "lang",
                "source", "n_chars",
            ).select(*docs.columns)
        )
    )
    # cross-batch dups: ids 5 and 130 re-arrive with new ids in batch 3
    b3 = (
        docs.filter((F.col("doc_id") >= 240) & (F.col("doc_id") < 360))
        .unionByName(
            docs.filter(F.col("doc_id").isin(5, 130)).select(
                (F.col("doc_id") + 91000).alias("doc_id"), "text", "lang",
                "source", "n_chars",
            ).select(*docs.columns)
        )
    )
    with tempfile.TemporaryDirectory() as d:
        import glob as _g
        import os as _os

        _os.makedirs(f"{d}/docs")
        for i, b in enumerate((b1, b2, b3)):
            b.coalesce(1).write.parquet(f"{d}/in/b{i}", mode="overwrite")
            # one FILE per micro-batch: move the part file up
            part = _g.glob(f"{d}/in/b{i}/part-*.parquet")[0]
            _os.rename(part, f"{d}/docs/b{i}.parquet")
        io = SJ.stream_corpus_ingest(spark, f"{d}/docs", f"{d}/wh")
        got = {r["doc_id"] for r in io.read_log("corpus").collect()}
        n_cycles = io.last_committed_cycle() + 1
    allb = b1.unionByName(b2).unionByName(b3)
    kept = allb.join(
        repetition_filter(allb, "doc_id", "text").filter("keep").select("doc_id"),
        "doc_id", "left_semi",
    )
    want = {
        r["doc_id"]
        for r in first_wins(
            kept.withColumn("_h", F.xxhash64("text")), "_h", ["doc_id"]
        ).collect()
    }
    assert n_cycles == 3  # one commit per micro-batch file
    assert got == want
    assert 90010 not in got and 91005 not in got and 91130 not in got


def test_stream_corpus_ingest_resume(spark):
    """ST6 resumability: restart the ingest after new batch files appear —
    Spark's offset checkpoint skips the already-processed files and only
    the new batch commits a new cycle."""
    import glob as _g
    import os as _os

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    parts = [
        docs.filter(F.col("doc_id") < 100),
        docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)),
        docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300)),
    ]
    with tempfile.TemporaryDirectory() as d:
        _os.makedirs(f"{d}/docs")

        def drop_file(i):
            parts[i].coalesce(1).write.parquet(f"{d}/in/b{i}", mode="overwrite")
            part = _g.glob(f"{d}/in/b{i}/part-*.parquet")[0]
            _os.rename(part, f"{d}/docs/b{i}.parquet")

        drop_file(0)
        drop_file(1)
        io = SJ.stream_corpus_ingest(spark, f"{d}/docs", f"{d}/wh")
        assert io.last_committed_cycle() == 1
        n_before = io.read_log("corpus").count()
        drop_file(2)
        io = SJ.stream_corpus_ingest(spark, f"{d}/docs", f"{d}/wh", resume=True)
        assert io.last_committed_cycle() == 2  # exactly ONE new cycle
        assert io.read_log("corpus").count() > n_before
        # batches 0/1 were not re-ingested: corpus doc_ids stay unique
        c = io.read_log("corpus")
        assert c.select("doc_id").distinct().count() == c.count()


def test_stream_corpus_ingest_read_volume(spark):
    """ST6 scale guard (VERDICT r04 item #1): the cross-batch dedup must
    NOT scan the accumulated content_seen log every batch —
      * a batch with no cross-history duplicates is fully resolved by the
        Bloom prefilter (seen_scanned=False in its metrics row: the log
        was never read);
      * a batch WITH planted dups reads the log, but only its maybe-seen
        remainder (n_maybe ~= dups + FPs << n_batch) hits the exact join;
      * compaction bounds the manifest to <= compact_every content_seen
        segments, and the log holds exactly one row per live corpus doc
        (O(live), never O(history));
      * the log is Hive-partitioned on bucket=pmod(_h, n_buckets) so the
        exact-confirm read prunes to the candidates' directories.
    """
    import glob as _g
    import os as _os

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    lo = [docs.filter((F.col("doc_id") >= i * 100) & (F.col("doc_id") < (i + 1) * 100)) for i in range(5)]
    # batch 4 carries dups of batch-0 content (ids re-keyed): cross-HISTORY
    # dups that an un-prefiltered design would pay a full log scan to find
    # ids 3 and 5 pass the quality screen (id 7 does not, and a screened-out
    # doc never reaches the dedup probe in either batch)
    dup = docs.filter(F.col("doc_id").isin(3, 5)).select(
        (F.col("doc_id") + 95000).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    ).select(*docs.columns)
    parts = lo[:4] + [lo[4].unionByName(dup)]
    with tempfile.TemporaryDirectory() as d:
        _os.makedirs(f"{d}/docs")
        for i, b in enumerate(parts):
            b.coalesce(1).write.parquet(f"{d}/in/b{i}", mode="overwrite")
            part = _g.glob(f"{d}/in/b{i}/part-*.parquet")[0]
            _os.rename(part, f"{d}/docs/b{i}.parquet")
        io = SJ.stream_corpus_ingest(
            spark, f"{d}/docs", f"{d}/wh", compact_every=2,
            metrics_level="full",
        )
        # batch cycle numbers skip over compaction commits: order by cycle
        m = sorted(
            io.read_log("ingest_metrics").collect(), key=lambda r: r["cycle"]
        )
        assert len(m) == 5
        # dup-free batches never read the log (prefilter early-exit);
        # FP odds at this fill (~500 hashes / 16x32Ki-bit buckets) ~ 0
        for r in m[1:4]:
            assert not r["seen_scanned"], f"cycle {r['cycle']} scanned the log"
            assert r["n_maybe"] == 0
        # the dup batch reads the log, but only the 2 planted dups (+FP~0)
        # reach the exact join — not the whole batch
        assert m[4]["seen_scanned"]
        assert 2 <= m[4]["n_maybe"] <= 4
        assert m[4]["n_batch"] > 10 * m[4]["n_maybe"]  # probe << batch
        # log volume: one row per live doc, bounded segment count
        assert io.read_log("content_seen").count() == io.read_log("corpus").count()
        mf = io.read_manifest()
        assert 0 < len(mf["tables"]["content_seen"]) <= 2
        # planted dups were dropped
        got = {r["doc_id"] for r in io.read_log("corpus").collect()}
        assert 95003 not in got and 95005 not in got
        # physical layout: bucket=N partition dirs inside each segment
        seg = sorted(mf["tables"]["content_seen"])[-1]
        assert _g.glob(f"{d}/wh/content_seen/cycle={seg}/bucket=*")


def test_stream_corpus_ingest_all_duplicate_batch(spark):
    """An entirely-duplicate batch (the shape of a crash replay of an
    already-committed batch) must commit a metrics-only cycle: no empty
    data segments (an empty Hive-partitioned segment would poison the
    multi-root content_seen read), corpus unchanged, and the stream keeps
    working for later fresh batches."""
    import glob as _g
    import os as _os

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    b0 = docs.filter(F.col("doc_id") < 100)
    # batch 1 = same CONTENT as batch 0, re-keyed -> 100% cross-batch dups
    b1 = b0.select(
        (F.col("doc_id") + 70000).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    ).select(*docs.columns)
    b2 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    with tempfile.TemporaryDirectory() as d:
        _os.makedirs(f"{d}/docs")
        for i, b in enumerate((b0, b1, b2)):
            b.coalesce(1).write.parquet(f"{d}/in/b{i}", mode="overwrite")
            part = _g.glob(f"{d}/in/b{i}/part-*.parquet")[0]
            _os.rename(part, f"{d}/docs/b{i}.parquet")
        io = SJ.stream_corpus_ingest(spark, f"{d}/docs", f"{d}/wh")
        m = sorted(
            io.read_log("ingest_metrics").collect(), key=lambda r: r["cycle"]
        )
        assert len(m) == 3
        assert m[1]["n_novel"] == 0 and m[1]["seen_scanned"]
        # the all-dup cycle committed NO data segments
        mf = io.read_manifest()
        assert m[1]["cycle"] not in mf["tables"]["content_seen"]
        assert m[1]["cycle"] not in mf["tables"]["corpus"]
        # corpus = batch 0 + batch 2 survivors only; reads still work
        got = {r["doc_id"] for r in io.read_log("corpus").collect()}
        assert not any(70000 <= i < 80000 for i in got)
        assert io.read_log("content_seen").count() == len(got)


def test_stream_neardup_ingest_drops_planted_neardups(spark):
    """ST7: streaming MinHash ingest drops (a) an exact copy and (b) a
    lightly-edited near-copy of docs ingested in EARLIER batches, and
    (c) resolves within-batch near-dup clusters to one survivor; novel
    docs pass through. Deterministic: a re-run produces the byte-same
    corpus."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    b0 = docs.filter(F.col("doc_id") < 150)
    exact = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 95000).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    ).select(*docs.columns)
    near = docs.filter(F.col("doc_id") == 5).select(
        (F.col("doc_id") + 96000).alias("doc_id"),
        *[
            F.concat(F.col(c), F.lit(" extra")).alias(c) if c == "text" else F.col(c)
            for c in docs.columns
            if c != "doc_id"
        ],
    ).select(*docs.columns)
    # within-batch near-dup pair: two fresh copies of doc 160's text
    twin1 = docs.filter(F.col("doc_id") == 160).select(
        (F.col("doc_id") + 97000).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    ).select(*docs.columns)
    b1 = (
        docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 250))
        .unionByName(exact).unionByName(near).unionByName(twin1)
    )
    import glob as _g
    import os as _os

    def run(dst):
        _os.makedirs(f"{dst}/docs")
        for i, b in enumerate((b0, b1)):
            b.coalesce(1).write.parquet(f"{dst}/in/b{i}", mode="overwrite")
            part = _g.glob(f"{dst}/in/b{i}/part-*.parquet")[0]
            _os.rename(part, f"{dst}/docs/b{i}.parquet")
        return SJ.stream_neardup_ingest(
            spark, f"{dst}/docs", f"{dst}/wh", threshold=0.7,
            metrics_level="full",
        )

    with tempfile.TemporaryDirectory() as d:
        io = run(d)
        got = {r["doc_id"] for r in io.read_log("corpus").collect()}
        # doc 3 and 5 pass the quality screen (see read_volume test);
        # their copies arrived in batch 1 and must be gone
        assert 95003 not in got and 96005 not in got
        assert 3 in got and 5 in got
        # within-batch twin: 160 survives (min id), 97160 dropped.
        # doc 160 is verified to pass the repetition screen at sf0.01
        # (like docs 3/5 in the read-volume test), so the within-batch
        # near-dup claim is asserted UNCONDITIONALLY (ADVICE r05 #4 —
        # the old `if 160 in got` guard could silently skip it)
        assert 160 in got
        assert 97160 not in got
        # novel batch-1 docs survived (quality-screen survivors)
        assert any(150 <= i < 250 for i in got)
        m = sorted(io.read_log("ingest_metrics").collect(), key=lambda r: r["cycle"])
        assert len(m) == 2 and m[1]["n_idx_rows_read"] > 0
        with tempfile.TemporaryDirectory() as d2:
            io2 = run(d2)
            got2 = {r["doc_id"] for r in io2.read_log("corpus").collect()}
            assert got2 == got  # deterministic re-run


def test_stream_neardup_ingest_resume(spark):
    """ST7 resumability: restart after a new batch file appears — offset
    checkpoint skips processed files; exactly one new cycle commits."""
    import glob as _g
    import os as _os

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    parts = [
        docs.filter(F.col("doc_id") < 100),
        docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)),
    ]
    with tempfile.TemporaryDirectory() as d:
        _os.makedirs(f"{d}/docs")

        def drop_file(i):
            parts[i].coalesce(1).write.parquet(f"{d}/in/b{i}", mode="overwrite")
            part = _g.glob(f"{d}/in/b{i}/part-*.parquet")[0]
            _os.rename(part, f"{d}/docs/b{i}.parquet")

        drop_file(0)
        io = SJ.stream_neardup_ingest(spark, f"{d}/docs", f"{d}/wh")
        n0 = io.read_log("corpus").count()
        c0 = io.last_committed_cycle()
        drop_file(1)
        io = SJ.stream_neardup_ingest(spark, f"{d}/docs", f"{d}/wh", resume=True)
        assert io.last_committed_cycle() == c0 + 1
        c = io.read_log("corpus")
        assert c.count() > n0
        assert c.select("doc_id").distinct().count() == c.count()


def test_stream_neardup_ingest_resume_geometry_guard(spark):
    """ST7 resume with different index-structural geometry must raise —
    persisted band keys / bucket ids would not match (code-review r05)."""
    import glob as _g
    import os as _os

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    with tempfile.TemporaryDirectory() as d:
        _os.makedirs(f"{d}/docs")
        b = docs.filter(F.col("doc_id") < 60)
        b.coalesce(1).write.parquet(f"{d}/in/b0", mode="overwrite")
        part = _g.glob(f"{d}/in/b0/part-*.parquet")[0]
        _os.rename(part, f"{d}/docs/b0.parquet")
        SJ.stream_neardup_ingest(spark, f"{d}/docs", f"{d}/wh")
        with pytest.raises(ValueError, match="geometry mismatch"):
            SJ.stream_neardup_ingest(
                spark, f"{d}/docs", f"{d}/wh", resume=True, n_buckets=16
            )
        # matching geometry resumes fine (no new files -> no new cycle)
        io = SJ.stream_neardup_ingest(spark, f"{d}/docs", f"{d}/wh", resume=True)
        assert io.last_committed_cycle() == 0


def test_stream_corpus_ingest_resume_legacy_warehouse(spark):
    """ST6 resume on a warehouse with a committed content_seen log but NO
    content_filter snapshot (legacy layout / lost snapshot) must rebuild
    the filter from the exact log, not fall into the fresh-warehouse
    branch — cross-batch duplicates would otherwise be silently admitted
    (ADVICE r05, medium). The legacy log also lacks the bucket column:
    the pruned read must derive it row-wise instead of failing."""
    import glob as _g
    import os as _os

    from croawl_spark.sources.tableio import TableIO

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    with tempfile.TemporaryDirectory() as d:
        # hand-build the legacy warehouse: content_seen + corpus committed
        # for cycle 0, WITHOUT content_filter and WITHOUT bucket dirs
        io = TableIO(spark, f"{d}/wh")
        b0 = docs.filter(F.col("doc_id").isin(3, 5))
        io.write_snapshot(b0, "corpus", 0)
        io.write_snapshot(
            b0.select(
                F.xxhash64("text").alias("_h"),
                F.col("doc_id").alias("first_doc_id"),
            ),
            "content_seen",
            0,
        )
        io.commit_cycle(0, ["corpus", "content_seen"])
        # batch 1: a re-keyed copy of doc 3 (cross-batch dup) + novel docs
        dup = b0.filter(F.col("doc_id") == 3).select(
            (F.col("doc_id") + 95000).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        ).select(*docs.columns)
        b1 = docs.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 150)
        ).unionByName(dup)
        _os.makedirs(f"{d}/docs")
        b1.coalesce(1).write.parquet(f"{d}/in/b1", mode="overwrite")
        part = _g.glob(f"{d}/in/b1/part-*.parquet")[0]
        _os.rename(part, f"{d}/docs/b1.parquet")
        io = SJ.stream_corpus_ingest(
            spark, f"{d}/docs", f"{d}/wh", resume=True
        )
        got = {r["doc_id"] for r in io.read_log("corpus").collect()}
        assert 95003 not in got, "legacy resume admitted a cross-batch dup"
        assert 3 in got and any(100 <= i < 150 for i in got)
        # the filter snapshot now exists (rebuilt + extended + committed)
        assert io.read_snapshot("content_filter").count() > 0


def test_stream_neardup_compacted_index_is_bucketed(spark):
    """ST7 + TableIO bucketed-index mode (VERDICT r05 item #1): after
    compaction the minhash_sig log is ONE segment stored bucketBy(band,
    key); probes against it still drop cross-batch dups, and the probe
    join against the compacted segment has ZERO index-side exchange
    (broadcast probe: no exchange anywhere in the join subtree)."""
    import glob as _g
    import json as _json
    import os as _os

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    parts = [
        docs.filter(F.col("doc_id") < 80),
        docs.filter((F.col("doc_id") >= 80) & (F.col("doc_id") < 160)),
        # batch 2 arrives AFTER compaction (compact_every=2) and carries a
        # re-keyed exact copy of doc 3 — it must be caught by probing the
        # COMPACTED bucketed segment
        docs.filter((F.col("doc_id") >= 160) & (F.col("doc_id") < 220))
        .unionByName(
            docs.filter(F.col("doc_id") == 3).select(
                (F.col("doc_id") + 95000).alias("doc_id"),
                *[c for c in docs.columns if c != "doc_id"],
            ).select(*docs.columns)
        ),
    ]
    with tempfile.TemporaryDirectory() as d:
        _os.makedirs(f"{d}/docs")
        for i, b in enumerate(parts):
            b.coalesce(1).write.parquet(f"{d}/in/b{i}", mode="overwrite")
            part = _g.glob(f"{d}/in/b{i}/part-*.parquet")[0]
            _os.rename(part, f"{d}/docs/b{i}.parquet")
        io = SJ.stream_neardup_ingest(
            spark, f"{d}/docs", f"{d}/wh", threshold=0.7, compact_every=2
        )
        got = {r["doc_id"] for r in io.read_log("corpus").collect()}
        assert 95003 not in got and 3 in got
        # layout: exactly one bucketed compacted segment + the batch-2
        # delta; the compacted one carries the bucket_layout sidecar
        segs = io.read_log_segments("minhash_sig")
        metas = [m for _, m in segs]
        assert any(m is not None for m in metas), "no bucketed segment"
        bucketed = [(df, m) for df, m in segs if m is not None]
        bdf, bmeta = bucketed[0]
        assert bmeta["cols"] == ["band", "key"]
        # probe-shaped join against the compacted segment: index side must
        # not move (broadcast probe -> no exchange in the plan at all)
        probe = bdf.limit(50).select("band", "key").distinct()
        j = F.broadcast(probe).join(bdf, ["band", "key"])
        j.count()
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in p
        # the catalog re-registration path: drop the session entry and
        # read again — the sidecar recreates the bucketed table
        spark.sql(f"DROP TABLE IF EXISTS {bmeta['name']}")
        segs2 = io.read_log_segments("minhash_sig")
        bdf2 = [df for df, m in segs2 if m is not None][0]
        assert bdf2.count() == bdf.count()
        p2 = (
            F.broadcast(probe).join(bdf2, ["band", "key"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange hashpartitioning" not in p2
