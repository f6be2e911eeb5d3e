"""Long-stream ingest endurance demonstration (VERDICT r04 item #6 — the
ST6 analogue of tools/long_crawl_demo.py).

Runs the streaming corpus ingest over ~100 single-file micro-batches with
exact duplicates planted across the FULL accumulated history (every batch
re-sends copies of documents first seen many batches earlier), and reads
back the per-batch ``ingest_metrics`` lineage the job commits with each
cycle: in-batch wall, Bloom-probe outcome (n_maybe), whether the
content_seen log was read at all, the ACTUAL pruned read volume when it
was, and the segment count across compaction boundaries
(compact_every=8 by default).

Design claims under test:
  * per-batch cost is FLAT while history grows ~100x (the Bloom prefilter
    + bucket pruning keep the exact-confirm read O(candidate buckets),
    and compaction keeps the segment count bounded);
  * dup-free batches never read the log at all (seen_scanned=False);
  * planted cross-history dups are still all caught (exactness).

The companion regression test
(tests/test_streaming.py::test_stream_corpus_ingest_read_volume) pins the
invariants; this script produces the measured curve for BENCH/BASELINE.md.

Usage: python tools/long_ingest_demo.py [n_batches] [docs_per_batch]
Prints one JSON line per batch cycle and a summary line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> int:
    neardup = "--neardup" in sys.argv
    # r06: lineage counts are opt-in (metrics_level="full") — the default
    # "basic" level reads each pruned slice exactly once per batch
    level = "full" if "--full-metrics" in sys.argv else "basic"
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(args[0]) if len(args) > 0 else 100
    per_batch = int(args[1]) if len(args) > 1 else 50

    sys.path.insert(0, ".")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from croawl_spark.session import get_spark
    from croawl_spark.streaming.jobs import (
        stream_corpus_ingest,
        stream_neardup_ingest,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        f"long-ingest-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    need = n_batches * per_batch
    # recycle the table with distinct ids if the SF is too small for the
    # requested run length (texts repeat -> extra REAL cross-history dups,
    # which only makes the endurance claim harder)
    if need > n_docs:
        from functools import reduce

        from pyspark.sql import DataFrame

        reps = -(-need // n_docs)
        parts = [
            docs.select((F.col("doc_id") + 10_000_000 * r).alias("doc_id"),
                        *[c for c in docs.columns if c != "doc_id"])
            for r in range(reps)
        ]
        docs = reduce(DataFrame.unionByName, parts)
    rn = F.row_number().over(Window.orderBy("doc_id"))
    docs = (
        docs.withColumn("_rn", rn).filter(F.col("_rn") <= need)
        .localCheckpoint()
    )

    d = tempfile.mkdtemp(prefix="long_ingest_")
    os.makedirs(f"{d}/docs")
    t_prep = time.perf_counter()
    data_cols = [c for c in docs.columns if c != "_rn"]
    for b in range(n_batches):
        lo, hi = b * per_batch, (b + 1) * per_batch
        batch = docs.filter(
            (F.col("_rn") > lo) & (F.col("_rn") <= hi)
        ).select(*data_cols)
        if b >= 2:
            # plant 3 dups of docs first seen in batches 0..b-1 (spread
            # across the WHOLE history, not just the previous batch)
            hist = docs.filter(
                F.col("_rn").isin([1 + (b * 37 + j * 13) % lo for j in range(3)])
            )
            batch = batch.unionByName(
                hist.select(
                    (F.col("doc_id") + 500_000_000 + b).alias("doc_id"),
                    *[c for c in data_cols if c != "doc_id"],
                ).select(*data_cols)
            )
        batch.coalesce(1).write.parquet(f"{d}/in", mode="overwrite")
        part = glob.glob(f"{d}/in/part-*.parquet")[0]
        os.rename(part, f"{d}/docs/b{b:04d}.parquet")
    prep_sec = round(time.perf_counter() - t_prep, 1)

    t0 = time.perf_counter()
    if neardup:
        # ST7 variant: MinHash near-dup across batches vs the bucketed
        # persisted band-key index (planted dups are byte-identical,
        # so they are est_sim=1 cases for the LSH path too)
        io = stream_neardup_ingest(spark, f"{d}/docs", f"{d}/wh", metrics_level=level)
    else:
        io = stream_corpus_ingest(spark, f"{d}/docs", f"{d}/wh", metrics_level=level)
    stream_wall = round(time.perf_counter() - t0, 1)

    rows = sorted(
        (r.asDict() for r in io.read_log("ingest_metrics").collect()),
        key=lambda r: r["cycle"],
    )
    for r in rows:
        print(json.dumps(r), flush=True)

    half = len(rows) // 2
    # skip 2 warmup cycles when the run is long enough; a short run
    # (n_batches < 6) falls back to a plain halves split so the summary
    # never divides by an empty slice
    a = [r["wall_sec"] for r in (rows[2:half] if half > 2 else rows[:half])]
    b_ = [r["wall_sec"] for r in rows[half:]]
    ma = sum(a) / len(a) if a else float("nan")
    mb = sum(b_) / len(b_) if b_ else float("nan")
    if neardup:
        live = io.read_log("minhash_sig").select("doc_id").distinct().count()
        print(
            json.dumps(
                {
                    "summary": f"ST7 neardup: {len(rows)} micro-batches x "
                    f"~{per_batch} docs, 3 cross-history dups/batch, "
                    "compact_every=8",
                    "prep_sec": prep_sec,
                    "stream_wall_sec": stream_wall,
                    "mean_wall_first_half": round(ma, 3),
                    "mean_wall_second_half": round(mb, 3),
                    "flatness_ratio": round(mb / ma, 3),
                    "max_idx_rows_read": max(
                        (r["n_idx_rows_read"] for r in rows), default=0
                    ),
                    "live_index_docs_final": live,
                    "total_novel": sum(r["n_novel"] for r in rows),
                }
            ),
            flush=True,
        )
        shutil.rmtree(d, ignore_errors=True)
        return 0
    scanned = [r for r in rows if r["seen_scanned"]]
    live = io.read_log("content_seen").count()
    print(
        json.dumps(
            {
                "summary": f"{len(rows)} micro-batches x ~{per_batch} docs, "
                "3 cross-history dups planted per batch, compact_every=8",
                "prep_sec": prep_sec,
                "stream_wall_sec": stream_wall,
                "mean_wall_first_half": round(ma, 3),
                "mean_wall_second_half": round(mb, 3),
                "flatness_ratio": round(mb / ma, 3),
                "batches_scanning_seen": len(scanned),
                "max_seen_rows_read": max(
                    (r["n_seen_rows_read"] for r in rows), default=0
                ),
                "live_seen_rows_final": live,
                "max_seen_segments": max(r["n_seen_segments"] for r in rows),
                "total_novel": sum(r["n_novel"] for r in rows),
                "total_maybe": sum(r["n_maybe"] for r in rows),
            }
        ),
        flush=True,
    )
    shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
