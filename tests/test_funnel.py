"""Funnel analysis (operators/funnel.py) — strict sequential ordering."""

from __future__ import annotations

import pytest

from openai_vector_search_demo_spark.operators.funnel import funnel_counts

STEPS = ["view", "click", "purchase"]


def _run(spark, rows, steps=STEPS):
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    out = funnel_counts(df, steps).collect()
    return {r.step: r for r in out}


def test_order_matters_not_just_presence(spark):
    # u1: correct order; u2: purchase BEFORE view+click (has all three
    # types but never converts); u3: view then click only
    rows = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "purchase", 5), (2, "view", 10), (2, "click", 20),
        (3, "view", 10), (3, "click", 15),
    ]
    out = _run(spark, rows)
    assert out[1].users == 3
    assert out[2].users == 3
    assert out[3].users == 1           # only u1
    assert out[3].conversion == pytest.approx(1 / 3, abs=1e-6)


def test_strictly_later_required(spark):
    # click at the SAME timestamp as view does not advance the funnel
    rows = [(1, "view", 10), (1, "click", 10), (1, "click", 11)]
    out = _run(spark, rows, steps=["view", "click"])
    assert out[2].users == 1           # via the ts=11 click
    out2 = _run(spark, [(1, "view", 10), (1, "click", 10)],
                steps=["view", "click"])
    assert out2[2].users == 0


def test_greedy_earliest_chain(spark):
    # the EARLIEST view anchors the chain — a later view cannot resurrect
    # a click that happened before it, but the click after the first view
    # counts even if a 'better' view exists later
    rows = [(1, "click", 5), (1, "view", 10), (1, "click", 20),
            (1, "view", 15)]
    out = _run(spark, rows, steps=["view", "click"])
    assert out[2].users == 1           # view@10 then click@20


def test_repeated_step_type_needs_two_events(spark):
    out = _run(spark, [(1, "click", 10)], steps=["click", "click"])
    assert out[1].users == 1 and out[2].users == 0
    out2 = _run(spark, [(1, "click", 10), (1, "click", 11)],
                steps=["click", "click"])
    assert out2[2].users == 1


def test_empty_steps_raise(spark):
    df = spark.createDataFrame([(1, "view", 1)],
                               "user_id long, event_type string, ts_us long")
    with pytest.raises(ValueError, match="steps"):
        funnel_counts(df, [])


def test_zero_entrants_zero_conversion(spark):
    out = _run(spark, [(1, "click", 10)])
    assert out[1].users == 0 and out[1].conversion == 0.0


def test_njoin_form_equals_fold_form(spark):
    """The whale-safe N-join form and the one-shuffle fold form are the
    same operator: identical output on a corpus with repeats, ties, and
    a skewed whale user."""
    from openai_vector_search_demo_spark.operators.funnel import (
        funnel_counts,
        funnel_counts_njoin,
    )
    rows = []
    # user 1: clean conversion; user 2: click before view (no conversion
    # past step 1); user 3 (whale): thousands of interleaved events
    rows += [(1, "view", 10), (1, "click", 20), (1, "purchase", 30)]
    rows += [(2, "click", 5), (2, "view", 50)]
    for i in range(2000):
        rows.append((3, ["view", "click", "purchase"][i % 3], 100 + i))
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    steps = ["view", "click", "purchase"]
    a = sorted(map(tuple, funnel_counts(ev, steps).collect()))
    b = sorted(map(tuple, funnel_counts_njoin(ev, steps).collect()))
    assert a == b
    by_step = {r[0]: r[2] for r in a}
    assert by_step[1] == 3 and by_step[3] == 2  # whale + user 1 convert


def test_auto_routes_and_matches_both_forms(spark):
    """method='auto' must return the same values as both physical forms,
    and the probe must pick 'fold' on ordinary data and flip to 'njoin'
    when the estimated max per-user count crosses the whale threshold."""
    from openai_vector_search_demo_spark.operators.funnel import (
        funnel_counts,
        funnel_counts_auto,
        funnel_counts_njoin,
    )
    rows = [(1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            (2, "click", 5), (2, "view", 50)]
    for i in range(400):
        rows.append((3, ["view", "click", "purchase"][i % 3], 100 + i))
    ev = spark.createDataFrame(rows,
                               "user_id long, event_type string, ts_us long")
    steps = ["view", "click", "purchase"]
    want = sorted(map(tuple, funnel_counts(ev, steps).collect()))
    assert sorted(map(tuple,
                      funnel_counts_auto(ev, steps).collect())) == want
    # force each branch explicitly — both value-locked to the fold
    for method in ("fold", "njoin"):
        got = sorted(map(tuple, funnel_counts_auto(
            ev, steps, method=method).collect()))
        assert got == want, method
    # whale flip: with the threshold lowered to the fixture's scale the
    # probe must route to njoin — and values must not change
    got = sorted(map(tuple, funnel_counts_auto(
        ev, steps, probe_fraction=0.5, whale_events=100).collect()))
    assert got == want
    with pytest.raises(ValueError, match="method"):
        funnel_counts_auto(ev, steps, method="flod")


def test_auto_probe_detects_synthetic_whale(spark):
    """The sampled estimator must see a genuine whale: one user holding
    ~200k relevant events against a 1k-user background, threshold 100k."""
    from pyspark.sql import functions as F

    from openai_vector_search_demo_spark.operators.funnel import (
        funnel_counts_auto,
        funnel_counts_njoin,
    )
    whale = spark.range(200_000).select(
        F.lit(9_999_999).alias("user_id"),
        F.element_at(F.array(F.lit("view"), F.lit("click"),
                             F.lit("purchase")),
                     (F.col("id") % 3 + 1).cast("int")).alias("event_type"),
        F.col("id").alias("ts_us"))
    crowd = spark.range(1_000).select(
        F.col("id").alias("user_id"), F.lit("view").alias("event_type"),
        F.lit(1).cast("long").alias("ts_us"))
    ev = whale.unionByName(crowd)
    steps = ["view", "click", "purchase"]
    want = sorted(map(tuple, funnel_counts_njoin(ev, steps).collect()))
    got = sorted(map(tuple, funnel_counts_auto(
        ev, steps, whale_events=100_000).collect()))
    assert got == want
    by_step = {r[0]: r[2] for r in got}
    assert by_step[1] == 1_001 and by_step[3] == 1  # whale converts alone
