"""Smoke-check the driver contract: entry() runs and yields a stable schema."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["Answer", "Score", "Content", "Source",
                          "Similarity", "Page"]
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["Score"] <= 100
        assert -1.0 <= r["Similarity"] <= 1.0 + 1e-9


def test_queries_and_oracles_consistent():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
