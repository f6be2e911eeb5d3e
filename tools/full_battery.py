"""Run the FULL query battery (every registered key, not just the driver's
50-key sampling window) against the DuckDB oracle at sf0.01 and write an
ORACLE_FULL_r{N}.json artifact.

Why this exists (ADVICE r03): the registry is rotated each round so the
grading driver's first-50 window lands on the keys with the least driver
evidence — which means previously-green keys rotate OUT of the window and
a regression in them would not appear in that round's CORRECTNESS artifact.
This script closes the gap: each round, the full battery runs locally and
the committed artifact carries hard evidence for every key.

Usage (from the repo root):
    python tools/full_battery.py [round_number] [sf_dir]
Writes ORACLE_FULL_r{N}.json with one row per key:
    oracle keys   -> {rows_match, schema_match, hash_match, spark_rows,
                      oracle_rows, err}
    rows-only keys -> {rows_run, spark_rows, err}
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if hasattr(v, "item"):
        return _norm(v.item())
    return v


def _value_hash(df, cols):
    rows = sorted(
        [tuple(_norm(v) for v in r) for r in df[cols].itertuples(index=False, name=None)],
        key=repr,
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()


def main() -> int:
    import duckdb

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from croawl_spark.session import get_spark

    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    spark = get_spark("full-battery", master="local[8]", shuffle_partitions=8)
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    out, n_fail = {}, 0
    for k, fn in queries.items():
        t0 = time.perf_counter()
        try:
            sp = fn(spark, sf).toPandas()
            if k in oracles:
                du = con.sql(oracles[k]).df()
                cols = sorted(sp.columns)
                rec = {
                    "rows_match": len(sp) == len(du),
                    "schema_match": sorted(du.columns) == cols,
                    "hash_match": (
                        sorted(du.columns) == cols
                        and _value_hash(sp, cols) == _value_hash(du, cols)
                    ),
                    "spark_rows": len(sp),
                    "oracle_rows": len(du),
                    "err": None,
                }
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            else:
                rec = {"rows_run": True, "spark_rows": len(sp), "err": None}
                ok = True
        except Exception as ex:  # record, keep going — artifact must be complete
            rec = {"err": repr(ex)[:300]}
            ok = False
        rec["sec"] = round(time.perf_counter() - t0, 2)
        out[k] = rec
        n_fail += 0 if ok else 1
        print(f"{k}: {'OK' if ok else 'FAIL'} ({rec['sec']}s)", flush=True)

    path = f"ORACLE_FULL_r{rnd:02d}.json"
    with open(path, "w") as f:
        json.dump(
            {"sf_dir": sf, "n_keys": len(out), "n_fail": n_fail, "keys": out},
            f,
            indent=1,
        )
    print(f"wrote {path}: {len(out)} keys, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
