"""Exact distributed quantiles (operators/quantiles.py): the bounded-
memory exact tier.  Contracts: the k = ceil(q·n) order statistic
exactly (Python twin), partitioning invariance, degenerate-value
robustness (the observed-[min,max] float-exactness claim), and pass
bounding."""

from __future__ import annotations

import math
import random

import pytest

from openai_vector_search_demo_spark.operators.quantiles import exact_quantiles


def _twin(values, qs):
    s = sorted(values)
    return {q: s[max(1, math.ceil(q * len(s))) - 1] for q in qs}


def _check(spark, values_by_group, qs, **kw):
    rows = [(g, float(v)) for g, vs in values_by_group.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r.g, r.q): r.value
           for r in exact_quantiles(df, "v", ["g"], qs, **kw).collect()}
    want = {(g, q): _twin(vs, qs)[q]
            for g, vs in values_by_group.items() for q in qs}
    assert got == want


def test_matches_python_twin_random(spark):
    rng = random.Random(7)
    data = {"a": [rng.uniform(-100, 100) for _ in range(500)],
            "b": [rng.gauss(0, 1) for _ in range(333)]}
    _check(spark, data, [0.01, 0.5, 0.9, 0.99, 1.0],
           bins=16, final_threshold=8)


def test_heavy_duplicates_and_constant_group(spark):
    rng = random.Random(11)
    data = {"dup": [float(rng.choice([1.0, 2.0, 2.0, 2.0, 9.0]))
                    for _ in range(400)],
            "const": [5.0] * 100}
    _check(spark, data, [0.25, 0.5, 0.75], bins=4, final_threshold=2)


def test_adjacent_doubles_interval(spark):
    # interval of two adjacent representable doubles: the observed
    # [min,max] rule must still terminate and pick the right element
    lo = 1.0
    hi = math.nextafter(1.0, 2.0)
    data = {"g": [lo] * 30 + [hi] * 70}
    _check(spark, data, [0.2, 0.3, 0.31, 0.9], bins=8, final_threshold=1)


def test_partitioning_invariant(spark):
    rng = random.Random(3)
    rows = [("g", float(rng.uniform(0, 1))) for _ in range(300)]
    a = spark.createDataFrame(rows, "g string, v double")
    b = a.repartition(13)
    qa = sorted(map(tuple, exact_quantiles(
        a, "v", ["g"], [0.5, 0.95], bins=8, final_threshold=4).collect()))
    qb = sorted(map(tuple, exact_quantiles(
        b, "v", ["g"], [0.5, 0.95], bins=8, final_threshold=4).collect()))
    assert qa == qb


def test_nulls_excluded_and_q_edges(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", 3.0), ("g", 1.0), ("g", None), ("g", 2.0)],
        "g string, v double")
    got = {r.q: r.value
           for r in exact_quantiles(df, "v", ["g"],
                                    [0.0, 1.0], bins=4,
                                    final_threshold=1).collect()}
    assert got == {0.0: 1.0, 1.0: 3.0}       # n=3 non-null; k=1 and k=3


def test_validation(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", ["g"], [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", ["g"], [1.5])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", ["g"], [0.5], bins=1)


def test_boolean_group_column_round_trips(spark):
    # group keys normalize through Spark's own string cast (str(True)
    # vs 'true' was a silent empty-result bug)
    df = spark.createDataFrame(
        [(True, 1.0), (True, 3.0), (False, 7.0)], "g boolean, v double")
    got = {(r.g, r.q): r.value
           for r in exact_quantiles(df, "v", ["g"], [1.0], bins=4,
                                    final_threshold=1).collect()}
    assert got == {("true", 1.0): 3.0, ("false", 1.0): 7.0}


def test_subnormal_width_interval_freezes_not_crashes(spark):
    # (hi-lo)/bins underflows to 0.0: the state must freeze BEFORE the
    # histogram pass divides by it (ANSI cast overflow on the +Inf)
    d1 = 5e-324 * 10
    d2 = math.nextafter(d1, 1.0)
    assert (d2 - d1) / 8 == 0.0
    vals = [d1] * 30 + [d2] * 20
    data = {"g": vals}
    _check(spark, data, [0.5, 0.9], bins=8, final_threshold=1)


def test_empty_group_cols_rejected(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="group_cols"):
        exact_quantiles(df, "v", [], [0.5])


def _wtwin(pairs, qs):
    """Weighted twin: min v whose cumulative weight over values <= v
    reaches ceil(q * W)."""
    W = sum(w for _, w in pairs)
    by_v = {}
    for v, w in pairs:
        by_v[v] = by_v.get(v, 0) + w
    out = {}
    for q in qs:
        k = max(1, math.ceil(q * W))
        cum = 0
        for v in sorted(by_v):
            cum += by_v[v]
            if cum >= k:
                out[q] = v
                break
    return out


def test_weighted_matches_python_twin(spark):
    rng = random.Random(19)
    pairs = [(round(rng.uniform(0, 50), 3), rng.randint(1, 9))
             for _ in range(400)]
    df = spark.createDataFrame([("g", v, w) for v, w in pairs],
                               "g string, v double, w int")
    got = {r.q: r.value
           for r in exact_quantiles(df, "v", ["g"], [0.1, 0.5, 0.9, 1.0],
                                    bins=8, final_threshold=4,
                                    weight_col="w").collect()}
    assert got == _wtwin(pairs, [0.1, 0.5, 0.9, 1.0])


def test_weighted_heavy_ties_and_dominant_weight(spark):
    # one value carries 90% of the weight: every inner quantile hits it
    pairs = [(1.0, 5), (2.0, 180), (3.0, 5), (4.0, 10)]
    df = spark.createDataFrame([("g", v, w) for v, w in pairs],
                               "g string, v double, w int")
    got = {r.q: r.value
           for r in exact_quantiles(df, "v", ["g"], [0.05, 0.5, 0.9, 1.0],
                                    bins=4, final_threshold=1,
                                    weight_col="w").collect()}
    assert got == _wtwin(pairs, [0.05, 0.5, 0.9, 1.0])
    assert got[0.5] == 2.0


def test_weight_one_equals_unweighted(spark):
    rng = random.Random(23)
    rows = [("g", float(rng.uniform(0, 9)), 1) for _ in range(150)]
    df = spark.createDataFrame(rows, "g string, v double, w int")
    a = sorted(map(tuple, exact_quantiles(
        df, "v", ["g"], [0.25, 0.75], bins=8, final_threshold=4,
        weight_col="w").collect()))
    b = sorted(map(tuple, exact_quantiles(
        df, "v", ["g"], [0.25, 0.75], bins=8,
        final_threshold=4).collect()))
    assert a == b
