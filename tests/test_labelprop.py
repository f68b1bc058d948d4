"""Label-propagation invariants: hand-computed spread, plurality
tie-break, seed clamping, unreached-null, and the rounds guard."""

from __future__ import annotations

import pytest


def _run(spark, edges, seeds, rounds=3):
    from openai_vector_search_demo_spark.operators.labelprop import (
        label_propagation,
    )
    e = spark.createDataFrame(edges, "a long, b long")
    s = spark.createDataFrame(seeds, "node long, label string")
    out = label_propagation(e, s, rounds=rounds).collect()
    return {r.node: (r.label, r.round_labeled) for r in out}


def test_chain_spreads_one_hop_per_round(spark):
    # 1 - 2 - 3 - 4, seed at 1
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], [(1, "x")], rounds=2)
    assert got == {1: ("x", 0), 2: ("x", 1), 3: ("x", 2),
                   4: (None, None)}


def test_plurality_wins_and_ties_break_label_asc(spark):
    # node 10 sees two 'a' seeds and one 'b' seed -> 'a';
    # node 20 sees one 'a' and one 'b' -> tie -> 'a' (label asc)
    got = _run(spark, [(1, 10), (2, 10), (3, 10), (1, 20), (3, 20)],
               [(1, "a"), (2, "a"), (3, "b")], rounds=1)
    assert got[10] == ("a", 1)
    assert got[20] == ("a", 1)


def test_seeds_are_clamped(spark):
    # seed 1='x' surrounded by 'y' neighbors keeps 'x'
    got = _run(spark, [(1, 2), (1, 3), (2, 3)],
               [(1, "x"), (2, "y"), (3, "y")], rounds=3)
    assert got[1] == ("x", 0)


def test_newly_labeled_vote_next_round(spark):
    # 1(seed) - 2 - 3: round1 labels 2, round2 labels 3 via 2's vote
    got = _run(spark, [(1, 2), (2, 3)], [(1, "x")], rounds=3)
    assert got[3] == ("x", 2)


def test_seed_not_in_graph_is_ignored(spark):
    got = _run(spark, [(1, 2)], [(99, "x")], rounds=1)
    assert got == {1: (None, None), 2: (None, None)}


def test_rounds_guard(spark):
    from openai_vector_search_demo_spark.operators.labelprop import (
        label_propagation,
    )
    e = spark.createDataFrame([(1, 2)], "a long, b long")
    s = spark.createDataFrame([(1, "x")], "node long, label string")
    with pytest.raises(ValueError):
        label_propagation(e, s, rounds=0)
