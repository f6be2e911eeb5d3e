"""Long-crawl stability demonstration (VERDICT r03 item #5).

Runs a ~50-cycle crawl under the DEFAULT O(delta) tombstone frontier and
records, per cycle: wall time, the frontier adds/dels row volume that
``read_merge`` scans, and the resolved live-frontier size — across several
compaction boundaries (frontier_compact_every=8). The design claim under
test: per-cycle cost is FLAT (driven by live rows + bounded tombstone
deltas), not growing with crawl history; at the 10^10-URL design point a
history-proportional term would dominate everything.

The companion regression test
(tests/test_crawl_order.py::test_tombstone_frontier_read_volume_is_live_not_history)
pins the invariant exactly; this script produces the measured curve for
BENCH/BASELINE.md.

Usage: python tools/long_crawl_demo.py [n_cycles] [n_seeds] [n_hosts]
Prints one JSON line per cycle and a summary line:
  {"cycle": i, "wall_sec": s, "adds_rows": n, "dels_rows": n,
   "live_rows": n, "adds_segments": n, "dels_segments": n, "fetches": n}
  {"summary": ..., "mean_wall_first_half": s, "mean_wall_second_half": s,
   "flatness_ratio": r}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> int:
    n_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    n_hosts = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    # enlarge the synthetic web BEFORE importing synth (universe knobs are
    # read at import): more hosts -> more fetches/cycle, and the crawl
    # keeps discovering for the full 50 cycles
    os.environ.setdefault("CROAWL_SYNTH_HOSTS", str(n_hosts))
    os.environ.setdefault("CROAWL_SYNTH_PATHS", "4000")

    sys.path.insert(0, ".")
    from croawl_spark import synth
    from croawl_spark.plans.cycle import CrawlConfig, bootstrap, run_cycle
    from croawl_spark.session import get_spark
    from croawl_spark.sources.tableio import TableIO

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        f"long-crawl-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    cfg = CrawlConfig(k_per_host=2, n_salt=8)  # defaults: tombstone, K=8
    seeds = synth.gen_seeds(n_seeds)
    rows = []
    with tempfile.TemporaryDirectory() as d:
        io = TableIO(spark, f"{d}/warehouse")
        bootstrap(spark, seeds, io, cfg)
        total_fetch_prev = 0
        for c in range(n_cycles):
            t0 = time.perf_counter()
            run_cycle(spark, io, c, cfg)
            wall = time.perf_counter() - t0
            m = io.read_manifest()
            adds_seg = m["tables"].get("frontier__adds", [])
            dels_seg = m["tables"].get("frontier__dels", [])
            adds_rows = io.read_log("frontier__adds").count()
            dels_rows = (
                io.read_log("frontier__dels").count() if dels_seg else 0
            )
            live = adds_rows - dels_rows  # == read_merge count (tested)
            tf = int(io.counters().get("total_fetches", 0))
            rec = {
                "cycle": c,
                "wall_sec": round(wall, 2),
                "adds_rows": adds_rows,
                "dels_rows": dels_rows,
                "live_rows": live,
                "adds_segments": len(adds_seg),
                "dels_segments": len(dels_seg),
                "fetches": tf - total_fetch_prev,
            }
            total_fetch_prev = tf
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    # flatness: mean wall of the steady-state halves (skip 2 warmup cycles)
    half = len(rows) // 2
    a = [r["wall_sec"] for r in rows[2:half]]
    b = [r["wall_sec"] for r in rows[half:]]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    print(
        json.dumps(
            {
                "summary": f"{n_cycles} cycles, {n_hosts} hosts, "
                f"compact_every={cfg.frontier_compact_every}",
                "mean_wall_first_half": round(ma, 2),
                "mean_wall_second_half": round(mb, 2),
                "flatness_ratio": round(mb / ma, 3),
                "max_dels_rows": max(r["dels_rows"] for r in rows),
                "max_adds_segments": max(r["adds_segments"] for r in rows),
                "total_fetches": sum(r["fetches"] for r in rows),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
