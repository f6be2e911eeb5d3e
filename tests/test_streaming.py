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
