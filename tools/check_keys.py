"""Spot-check individual query keys against the DuckDB oracle (the same
rows/schema/hash comparison as tools/full_battery.py) — fast iteration
during optimization rounds.

Usage: python tools/check_keys.py key1,key2 [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.full_battery import _value_hash  # noqa: E402


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from croawl_spark.session import get_spark

    keys = sys.argv[1].split(",")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("check-keys", master="local[8]", shuffle_partitions=8)
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    rc = 0
    for k in keys:
        t0 = time.perf_counter()
        sp = queries[k](spark, sf).toPandas()
        if k in oracles:
            du = con.sql(oracles[k]).df()
            cols = sorted(sp.columns)
            ok = (
                len(sp) == len(du)
                and sorted(du.columns) == cols
                and _value_hash(sp, cols) == _value_hash(du, cols)
            )
            print(f"{k}: {'OK' if ok else 'FAIL'} rows {len(sp)}/{len(du)} "
                  f"({time.perf_counter()-t0:.1f}s)", flush=True)
            rc |= 0 if ok else 1
        else:
            print(f"{k}: rows-only, ran {len(sp)} rows "
                  f"({time.perf_counter()-t0:.1f}s)", flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
