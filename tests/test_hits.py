"""HITS invariants: L1 mass on both sides, determinism, mutual
reinforcement, weight sensitivity, lineage checkpointing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def supply(spark):
    # suppliers a,b -> parts 1..3; b concentrates on the popular part 1
    edges = [("a", 1, 1), ("a", 2, 1), ("a", 3, 1),
             ("b", 1, 3), ("c", 1, 1)]
    return spark.createDataFrame(edges, "src string, dst int, w int")


def test_l1_mass_and_determinism(supply):
    from openai_vector_search_demo_spark.operators.hits import hits
    h1, a1 = hits(supply, iters=3)
    h2, a2 = hits(supply, iters=3)
    hd = {r.node: r.hub for r in h1.collect()}
    ad = {r.node: r.auth for r in a1.collect()}
    assert hd == {r.node: r.hub for r in h2.collect()}
    assert ad == {r.node: r.auth for r in a2.collect()}
    assert abs(sum(hd.values()) - 1.0) < 5e-8
    assert abs(sum(ad.values()) - 1.0) < 5e-8


def test_mutual_reinforcement(supply):
    from openai_vector_search_demo_spark.operators.hits import hits
    h, a = hits(supply, iters=3)
    hd = {r.node: r.hub for r in h.collect()}
    ad = {r.node: r.auth for r in a.collect()}
    # part 1 draws from every supplier (and b's triple weight): top authority
    assert ad[1] > ad[2] and ad[1] > ad[3]
    # b points only (and heavily) at the top authority: best hub
    assert hd["b"] > hd["a"] > hd["c"]


def test_node_sets_are_sides(supply):
    from openai_vector_search_demo_spark.operators.hits import hits
    h, a = hits(supply, iters=2)
    assert {r.node for r in h.collect()} == {"a", "b", "c"}
    assert {r.node for r in a.collect()} == {1, 2, 3}


def test_empty_edges_raise(spark):
    from openai_vector_search_demo_spark.operators.hits import hits
    df = spark.createDataFrame([], "src string, dst int, w int")
    with pytest.raises(ValueError):
        hits(df)


def test_iters_below_one_raises(supply):
    """ADVICE r11: iters=0 used to return (uniform hubs, None) — a None
    authorities frame for any caller unpacking the pair."""
    from openai_vector_search_demo_spark.operators.hits import hits
    for bad in (0, -1):
        with pytest.raises(ValueError, match="iters"):
            hits(supply, iters=bad)


def test_all_zero_weights_raise_not_null_scores(spark):
    """ADVICE r11: an all-zero weight column made the L1 total 0, and the
    division produced null scores; now it fails loudly."""
    from openai_vector_search_demo_spark.operators.hits import hits
    df = spark.createDataFrame(
        [("a", 1, 0), ("b", 1, 0)], "src string, dst int, w int")
    with pytest.raises(ValueError, match="zero"):
        hits(df, iters=1)[1].collect()


@pytest.mark.slow
def test_checkpoint_every_pins_plan_depth(supply):
    from openai_vector_search_demo_spark.operators.hits import hits

    def plan_joins(df):
        return df._jdf.queryExecution().optimizedPlan().toString().count("Join")

    deep_h, _ = hits(supply, iters=6)
    shallow_h, _ = hits(supply, iters=6, checkpoint_every=2)
    two_h, _ = hits(supply, iters=2)
    assert plan_joins(shallow_h) <= plan_joins(two_h)
    assert plan_joins(deep_h) > 2 * plan_joins(shallow_h)
    a = {r.node: r.hub for r in deep_h.collect()}
    b = {r.node: r.hub
         for r in hits(supply, iters=6, checkpoint_every=2)[0].collect()}
    assert a == b
