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
