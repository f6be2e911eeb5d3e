"""Local mirror of the driver's correctness gate: every ORACLE-backed query
runs in Spark and in DuckDB at sf0.01; row multisets must match exactly
(order-insensitive, value-exact — floats compared bitwise)."""

from __future__ import annotations

import math

import duckdb
import pytest

from croawl_spark.plans.verify_queries import ORACLE, QUERIES

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _rows(df_pandas, cols):
    out = []
    for row in df_pandas[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF).toPandas()
    ddf = duck.sql(ORACLE[name]).df()
    cols = sorted(sdf.columns)
    assert sorted(ddf.columns) == cols, f"schema mismatch: {sorted(ddf.columns)} vs {cols}"
    assert len(sdf) == len(ddf), f"rowcount {len(sdf)} vs {len(ddf)}"
    srows, drows = _rows(sdf, cols), _rows(ddf, cols)
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} mismatching rows; first: {mismatches[0]}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLE)):
        df = QUERIES[name](spark, SF)
        assert df.count() >= 0, name
