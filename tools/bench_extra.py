"""Round-6 optimization measurement harness (guide §1).

Separate from the FROZEN bench.py: times individual declared queries with
the same methodology (df.count()) plus noop-sink isolation, captures
.explain("formatted") for plan evidence, and prints one JSON line.

Usage:
  python tools/bench_extra.py --sf /root/testdata/sf1.0 \
      --queries dedup_substring,host_rank --repeat 2 \
      --plans plans/r06 --tag before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--queries", required=True, help="comma-separated query keys")
    p.add_argument("--repeat", type=int, default=2)
    p.add_argument("--plans", default=None, help="dir to write explain('formatted') files")
    p.add_argument("--tag", default="before")
    p.add_argument("--noop", action="store_true", help="also time a noop-sink write")
    args = p.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from croawl_spark.session import get_spark
    from croawl_spark.plans.verify_queries import QUERIES

    spark = get_spark(f"bench-extra-{args.tag}", master=f"local[{cpus}]",
                      shuffle_partitions=2 * int(cpus))
    QUERIES["scan_parquet"](spark, args.sf).count()  # warmup

    names = [q for q in args.queries.split(",") if q]
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"{name}:{args.tag}")
        samples = []
        for r in range(args.repeat):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf)
            n = df.count()
            samples.append(round(time.perf_counter() - t0, 3))
        rec: dict = {"count_sec": samples, "rows": n}
        if args.noop:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            rec["noop_sec"] = round(time.perf_counter() - t0, 3)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            with open(f"{args.plans}/{name}_{args.tag}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        out[name] = rec
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "tag": args.tag, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
