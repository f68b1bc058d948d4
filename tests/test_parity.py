"""Local replica of the driver's correctness gate: run every Spark query in
``queries()`` and its DuckDB ``oracle_sql()`` side by side at sf0.001 and
compare row count, column names, and order-insensitive values (driver
semantics per __spark_entry__.py docstring).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")
    return con


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


ORACLES = entrymod.oracle_sql()
ALL = list(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", ALL, ids=[n for n, _ in ALL])
def test_query_matches_oracle(spark, name, fn):
    sdf = fn(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        # rows-only check (driver's weaker path): query must run
        assert isinstance(srows, list)
        return
    con = duck_con(SF)
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    assert canon_rows(scols, srows) == canon_rows(ocols, orows), f"{name}: value mismatch"
