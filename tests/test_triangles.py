"""Triangle-count invariants on known graphs: K4, triangle+pendant,
triangle-free star, direction/duplicate collapsing."""

from __future__ import annotations

import pytest


def _counts(spark, pairs):
    from openai_vector_search_demo_spark.operators.triangles import (
        triangle_counts, undirected_edges)
    df = spark.createDataFrame(pairs, "a long, b long")
    return {r.node: (r.degree, r.triangles, r.lcc)
            for r in triangle_counts(undirected_edges(df)).collect()}


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    res = _counts(spark, k4)
    # K4 has C(4,3)=4 triangles; each node is in 3 of them, lcc=1
    assert res == {n: (3, 3, 1.0) for n in range(4)}


def test_triangle_with_pendant(spark):
    res = _counts(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert res[1] == (2, 1, 1.0)
    assert res[2] == (2, 1, 1.0)
    d, t, lcc = res[3]
    assert (d, t) == (3, 1) and abs(lcc - 1 / 3) < 1e-12
    assert res[4] == (1, 0, 0.0)  # pendant: degree<2 -> lcc 0


def test_star_is_triangle_free(spark):
    res = _counts(spark, [(0, i) for i in range(1, 5)])
    assert all(t == 0 and lcc == 0.0 for _, t, lcc in res.values())
    assert res[0][0] == 4


def test_duplicates_loops_and_direction_collapse(spark):
    # same triangle given twice, in both directions, plus a self-loop
    noisy = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3), (2, 2)]
    res = _counts(spark, noisy)
    assert res == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}
