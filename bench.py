"""Benchmark harness (driver contract + BASELINE.md M7).

Runs the headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the crawl-throughput
benchmark (URLs scheduled+parsed/sec — the primary BASELINE.json metric),
and prints ONE JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "crawl": {"urls_scheduled": N, "urls_parsed": N, "wall_sec": s,
             "urls_scheduled_parsed_per_sec": rate}}

Scaling-efficiency runs (local[8] vs local[32]) are produced by
``python bench.py --scaling`` and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _last_json_line(r, leg: str) -> str:
    """Extract a scaling-leg subprocess's JSON result line, surfacing the
    child's stderr if it crashed (ADVICE r04: a bare [-1] on an empty line
    list raised IndexError and swallowed the real failure, e.g. an OOM)."""
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if r.returncode != 0 or not lines:
        tail = (r.stderr or "")[-2000:]
        raise RuntimeError(
            f"scaling leg {leg} failed (rc={r.returncode}); stderr tail:\n{tail}"
        )
    return lines[-1]


def _bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from croawl_spark.plans.verify_queries import QUERIES

    headline = [
        "agg_hash",          # TPC-H Q1 shape: scan + hash agg
        "join_inner",        # shuffle join + agg
        "join_asof_emul",    # range join + map-side max_by collapse
        "win_rank",          # partitioned window
        "topk",              # global top-k
        "dedup_exact",       # two-level (hash,len) dedup
        "dedup_minhash",     # shingle->minhash->LSH pipeline
        "ann_cosine",        # explode + join + window re-rank
        "span_extract",      # Arrow pandas-UDF extraction path
        "stream_window",     # tumbling window agg
        # added in round 2 (absent from BENCH_r01):
        "dedup_cluster",     # iterative converging joins (components)
        "dedup_incremental", # probe persisted exact index
        "corpus_clean",      # composite quality->lang->dedup pipeline
        # added in round 3:
        "bm25",              # term-filtered explode + broadcast stats
        "pack_sequences",    # two-phase distributed global cumsum
        "join_range",        # bucketed range join (no NLJ)
        "host_rank",         # PageRank power method (8 fixed rounds)
        # added in round 4:
        "contamination",     # hashed 8-gram shingle overlap screen
        "doc_perplexity",    # unigram-LM NLL (broadcast corpus stats)
        "dedup_embed_lsh",   # capped hyperplane-LSH embedding near-dup
        "rep_filter",        # Gopher repetition screens (token+bigram aggs)
        "pii_scrub",         # JVM regexp redaction pass
        "doc_chunks",        # stride-aligned context-window chunking
        "join_interval",     # binned interval-overlap join (no dedup pass)
        # added in round 5:
        "dedup_substring",   # shingle-hash agg + per-doc span merge
        "dedup_substring_rm",# keep-first removal + JVM text rebuild
        "dedup_substring_inc",  # new batch vs persisted shingle index
        "dedup_cluster_star",# large/small-star CC (megachain path)
        "domain_mix",        # quota selection behind threshold prefilter
        "corpus_report",     # per-source report-card aggregates
    ]
    QUERIES["scan_parquet"](spark, sf_dir).count()  # JVM+python-worker warmup
    times: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        _ = n
    return times


def _seed_df(spark, n: int):
    """Distributed deterministic seed generation (no driver-side list)."""
    import pandas as pd

    from croawl_spark import synth

    def gen(it):
        for pdf in it:
            ids = pdf["id"]
            yield pd.DataFrame(
                {
                    "url": [synth.target_url(f"bench{i // 3}", int(i) % 3) for i in ids],
                    "seed_seq": ids,
                }
            )

    return spark.range(n).mapInPandas(gen, "url string, seed_seq long")


def _load_guard(max_load: float = 2.0, wait_sec: float = 600.0) -> dict:
    """Ambient-load guard: the r02 driver artifact recorded a ~20%-low crawl
    rate from a box still draining other work (idle reruns contradicted it),
    and the r04 artifact's 120 s budget expired while the box was still
    draining (load 2.9 at start, microbenches inflated up to 3.5x). Wait
    (bounded, default ~10 min — VERDICT r04 item #3) for the 1-minute load
    average to settle below max_load and RECORD the final value — a
    contaminated run is then visible in the artifact instead of
    masquerading as a regression."""
    t0 = time.time()
    load = os.getloadavg()[0]
    while load > max_load and time.time() - t0 < wait_sec:
        time.sleep(10)
        load = os.getloadavg()[0]
    return {
        "load1_at_start": round(load, 2),
        "load_wait_sec": round(time.time() - t0, 1),
        "loaded": load > max_load,
    }


def _bench_crawl_once(spark, n_seeds: int, n_cycles: int = 3,
                      guard_wait: float = 120.0) -> dict:
    from croawl_spark.plans.cycle import CrawlConfig, bootstrap, run_cycle
    from croawl_spark.sources.tableio import TableIO

    cfg = CrawlConfig(k_per_host=4000, n_salt=32, n_buckets=64, m_bits=1 << 18)
    guard = _load_guard(wait_sec=guard_wait)
    with tempfile.TemporaryDirectory() as d:
        io = TableIO(spark, f"{d}/warehouse")
        bootstrap(spark, _seed_df(spark, n_seeds), io, cfg)
        t0 = time.perf_counter()
        scheduled = parsed = 0
        for t in range(n_cycles):
            m = run_cycle(spark, io, t, cfg)
            scheduled += m["scheduled"]
            parsed += m["parsed"]
        wall = time.perf_counter() - t0
    return {
        "urls_scheduled": scheduled,
        "urls_parsed": parsed,
        "wall_sec": round(wall, 3),
        "urls_scheduled_parsed_per_sec": round((scheduled + parsed) / wall, 1),
        **guard,
    }


def _bench_crawl(spark, n_seeds: int | None = None, n_cycles: int = 3,
                 attempts: int = 2, max_attempts: int = 4) -> dict:
    """Best-of-N crawl throughput: single-box rates vary ±20% with ambient
    load; max-of-N plus the recorded per-attempt load averages keeps the
    artifact honest without hiding a real regression (a genuine slowdown
    shows up in EVERY attempt). VERDICT r04 item #3: if every baseline
    attempt ran with the box still loaded, keep retrying (longer per-
    attempt guard epochs, up to ``max_attempts`` total) until one leg runs
    unloaded or the cap is hit — each attempt's load flag is recorded."""
    n_seeds = n_seeds or int(os.environ.get("CROAWL_BENCH_SEEDS", "300000"))
    runs = [_bench_crawl_once(spark, n_seeds, n_cycles) for _ in range(attempts)]
    while all(r["loaded"] for r in runs) and len(runs) < max_attempts:
        runs.append(
            _bench_crawl_once(spark, n_seeds, n_cycles, guard_wait=300.0)
        )
    best = max(runs, key=lambda r: r["urls_scheduled_parsed_per_sec"])
    out = dict(best)
    if len(runs) > 1:
        out["attempt_rates"] = [r["urls_scheduled_parsed_per_sec"] for r in runs]
        out["attempt_loaded"] = [r["loaded"] for r in runs]
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    scaling_mode = "--scaling" in sys.argv
    # enlarge the synthetic web for throughput runs (env propagates to the
    # python workers); correctness tests keep the pinned 50x2000 universe
    os.environ.setdefault("CROAWL_SYNTH_HOSTS", "400")
    os.environ.setdefault("CROAWL_SYNTH_PATHS", "20000")

    from croawl_spark.session import get_spark

    if scaling_mode:
        # Evidence for the N -> 4N executors rule (sandbox proxy): the same
        # job at local[4] and local[16] on identical input, realistic
        # tag-dense pages (CROAWL_SYNTH_META_TAGS) so per-URL parse cost is
        # representative. Each leg runs in a FRESH process (clean JVM/heap).
        # See BENCH/BASELINE.md for the full parallelism curve and the
        # single-box caveats (shared memory bandwidth + SMT beyond 8 procs).
        import subprocess

        out = {}
        for n in (4, 16):
            r = subprocess.run(
                [sys.executable, __file__, "--crawl-only"],
                env={
                    **os.environ,
                    "SPARK_GRAFT_CPUS": str(n),
                    "CROAWL_BENCH_ATTEMPTS": "1",
                    "CROAWL_SYNTH_META_TAGS": os.environ.get(
                        "CROAWL_SYNTH_META_TAGS", "120"
                    ),
                },
                capture_output=True,
                text=True,
                timeout=1800,
            )
            out[f"local{n}"] = json.loads(_last_json_line(r, f"local[{n}]"))
        r4 = out["local4"]["urls_scheduled_parsed_per_sec"]
        r16 = out["local16"]["urls_scheduled_parsed_per_sec"]
        out["scaling_efficiency_4_to_16"] = round((r16 / r4) / 4.0, 3)
        print(json.dumps(out))
        return

    if "--scaling-corpus" in sys.argv:
        # Second scaling axis: the TRAINING-DATA pipeline (not the crawl)
        # at two parallelism levels — a compute-heavy chain of corpus
        # operators over identical sf0.1 input, fresh process per leg.
        import subprocess

        out = {}
        for n in (4, 16):
            r = subprocess.run(
                [sys.executable, __file__, "--corpus-only"],
                env={**os.environ, "SPARK_GRAFT_CPUS": str(n)},
                capture_output=True, text=True, timeout=1800,
            )
            out[f"local{n}"] = json.loads(_last_json_line(r, f"local[{n}]"))
        t4 = out["local4"]["corpus_wall_sec"]
        t16 = out["local16"]["corpus_wall_sec"]
        out["scaling_efficiency_4_to_16"] = round((t4 / t16) / 4.0, 3)
        print(json.dumps(out))
        return

    if "--corpus-only" in sys.argv:
        # A compute-bound corpus-dedup workload: the sf documents table
        # inflated 20x with distinct ids (every doc gains 19 exact copies
        # — a heavy but realistic duplication profile), pushed through the
        # full near-dup pipeline: shingle->minhash->LSH band join ->
        # cluster resolution -> survivor selection. ~100k docs of real
        # Arrow + shuffle work per leg, so the wall measures the engine,
        # not fixed job-scheduling overhead (unlike the per-key chain,
        # which is overhead-bound at sf0.1 — see BENCH/BASELINE.md).
        from functools import reduce

        from pyspark.sql import DataFrame, functions as Fn

        from croawl_spark.operators.cluster import keep_one_per_cluster
        from croawl_spark.operators.minhash import minhash_dedup_pairs

        spark = get_spark(f"bench-corpus-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=2 * int(cpus))
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        copies = [
            docs.select(
                (Fn.col("doc_id") + Fn.lit(k * 1_000_000)).alias("doc_id"),
                "text",
            )
            for k in range(20)
        ]
        big = reduce(DataFrame.unionByName, copies)
        big.count()  # warmup: scan + JVM spin-up outside the timed window
        t0 = time.perf_counter()
        pairs = minhash_dedup_pairs(big, "doc_id", "text", threshold=0.9)
        kept = keep_one_per_cluster(big, pairs, "doc_id")
        n_kept = kept.count()
        wall = round(time.perf_counter() - t0, 3)
        print(json.dumps({
            "corpus_wall_sec": wall,
            "rows": {"input": 20 * docs.count(), "kept": n_kept},
            "docs_per_sec": round(20 * docs.count() / wall, 1),
        }))
        spark.stop()
        return

    if "--crawl-only" in sys.argv:
        spark = get_spark(f"bench-crawl-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=2 * int(cpus))
        # scaling legs time a single attempt (the ratio is the metric);
        # standalone --crawl-only keeps best-of-2 for a citable rate
        n_att = 1 if os.environ.get("CROAWL_BENCH_ATTEMPTS") == "1" else 2
        print(json.dumps(_bench_crawl(spark, attempts=n_att)))
        spark.stop()
        return

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=2 * int(cpus))
    # guard the query microbenches too, not just the crawl legs — the r04
    # driver artifact's per-query times were inflated up to 3.5x by a box
    # still draining other work (VERDICT r04 "What's wrong" #2)
    query_guard = _load_guard()
    t0 = time.perf_counter()
    queries = _bench_queries(spark, sf_dir)
    crawl = _bench_crawl(spark)
    total = round(time.perf_counter() - t0, 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "query_guard": query_guard,
                "crawl": crawl,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
