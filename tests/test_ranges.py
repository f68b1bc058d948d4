"""Banded range join — operator-level semantics the parity query can't pin:
overlapping bands, boundary inclusivity, fan-out guard, name collisions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.ranges import band_join


def _points(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], ["p"])


def _bands(spark, triples):
    return spark.createDataFrame(
        [(n, float(lo), float(hi)) for n, lo, hi in triples],
        ["band", "lo", "hi"])


def test_boundaries_half_open(spark):
    """[lo, hi): lo matches, hi does not — including on bucket edges."""
    pts = _points(spark, [0.0, 5.0, 9.999, 10.0])
    bands = _bands(spark, [("a", 0, 10)])
    got = sorted(r.p for r in band_join(pts, bands, "p").collect())
    assert got == [0.0, 5.0, 9.999]


def test_overlapping_bands_emit_one_row_each(spark):
    pts = _points(spark, [7.0])
    bands = _bands(spark, [("a", 0, 10), ("b", 5, 15), ("c", 20, 30)])
    got = sorted(r.band for r in band_join(pts, bands, "p").collect())
    assert got == ["a", "b"]


@pytest.mark.slow
def test_equals_naive_nonequi_join(spark):
    """Bucketed plan ≡ naive non-equi join on a random-ish fixture, at a
    width that forces multi-bucket bands."""
    vals = [(i * 37 % 100) + (i % 7) / 10 for i in range(200)]
    pts = _points(spark, vals)
    bands = _bands(spark, [(f"b{i}", i * 8, i * 8 + 20) for i in range(12)])
    got = band_join(pts, bands, "p", bucket_width=3.0)
    naive = pts.join(bands, (F.col("p") >= F.col("lo"))
                     & (F.col("p") < F.col("hi")))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, naive.collect()))


def test_negative_values(spark):
    pts = _points(spark, [-12.5, -0.1, 0.1])
    bands = _bands(spark, [("neg", -100, 0), ("pos", 0, 100)])
    got = {r.p: r.band for r in band_join(pts, bands, "p").collect()}
    assert got == {-12.5: "neg", -0.1: "neg", 0.1: "pos"}


def test_fanout_guard_raises(spark):
    pts = _points(spark, [1.0])
    bands = _bands(spark, [("huge", 0, 10_000_000)])
    with pytest.raises(ValueError, match="buckets"):
        band_join(pts, bands, "p", bucket_width=1.0,
                  max_buckets_per_band=100)


def test_column_collision_raises(spark):
    pts = spark.createDataFrame([(1.0, "x")], ["p", "band"])
    bands = _bands(spark, [("a", 0, 10)])
    with pytest.raises(ValueError, match="collision"):
        band_join(pts, bands, "p")


def test_plan_is_equi_join_not_nested_loop(spark):
    """The point of the operator: the physical plan must be a hash/sort
    equi-join on the bucket key, never BroadcastNestedLoopJoin."""
    pts = _points(spark, [1.0, 2.0])
    bands = _bands(spark, [("a", 0, 10)])
    plan = band_join(pts, bands, "p")._jdf.queryExecution().executedPlan() \
        .toString()
    assert "NestedLoop" not in plan
    assert "Join" in plan
