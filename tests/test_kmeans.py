"""Distributed Lloyd k-means invariants: determinism, unit-norm
centroids, monotone cohesion, codegen assignment."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .filter(F.col("vec_id") >= 20))


@pytest.mark.slow
def test_kmeans_deterministic_and_unit_norm(corpus):
    from openai_vector_search_demo_spark.operators.kmeans import (
        kmeans_lloyd_spherical,
    )
    c1, n1 = kmeans_lloyd_spherical(corpus, k=8, iters=3)
    c2, n2 = kmeans_lloyd_spherical(corpus, k=8, iters=3)
    assert c1 == c2 and n1 == n2
    assert sum(n1) == corpus.count()
    for c in c1:
        # 6-dp rounded unit vectors: |1 - ||c||| bounded by dim*5e-7
        assert abs(1.0 - math.sqrt(sum(x * x for x in c))) < 1e-4


@pytest.mark.slow
def test_kmeans_cohesion_monotone(corpus):
    """Lloyd's invariant: mean cosine to the assigned centroid never
    decreases with more iterations (up to the 6-dp rounding noise)."""
    from openai_vector_search_demo_spark.functions.vectors import (
        cosine_similarity,
        vector_lit,
    )
    from openai_vector_search_demo_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_lloyd_spherical,
    )

    def cohesion(iters):
        cent, _ = kmeans_lloyd_spherical(corpus, k=8, iters=iters)
        a = kmeans_assign(corpus, cent)
        # per-row sim to the row's OWN centroid via a chained when
        expr = F.lit(0.0)
        for cid, c in enumerate(cent):
            expr = F.when(F.col("cell") == cid,
                          cosine_similarity(F.col("embedding"),
                                            vector_lit(c))).otherwise(expr)
        return a.agg(F.avg(expr)).first()[0]

    assert cohesion(3) >= cohesion(1) - 1e-6


def test_kmeans_assign_is_codegen(corpus):
    import contextlib
    import io

    from openai_vector_search_demo_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_lloyd_spherical,
    )
    cent, _ = kmeans_lloyd_spherical(corpus, k=8, iters=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        kmeans_assign(corpus, cent).explain("formatted")
    p = buf.getvalue()
    assert "MapInPandas" not in p and "ArrowEval" not in p
    assert "BatchEvalPython" not in p


def test_kmeans_empty_cell_keeps_centroid(spark):
    """A centroid that captures no rows must survive unchanged — the
    train_centroids contract, required for oracle parity."""
    from openai_vector_search_demo_spark.operators.kmeans import (
        kmeans_lloyd_spherical,
    )
    # two tight groups + one far-out init row that attracts nothing
    # after its own assignment moves: k=3 init picks ids 0,1,2
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.707, 0.707, 0.0, 0.0]),
            (3, [1.0, 0.01, 0.0, 0.0]), (4, [0.01, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cent, counts = kmeans_lloyd_spherical(df, k=3, iters=2)
    assert len(cent) == 3 and sum(counts) == 5
    for c in cent:
        assert abs(1.0 - math.sqrt(sum(x * x for x in c))) < 1e-4


def test_kmeans_numpy_path_matches_sql(corpus):
    """The Arrow/BLAS fast path must reproduce the SQL path exactly at
    the 6-dp in-engine rounding (the q2 sql/numpy contract) — same
    centroids, same counts, across all iterations' feedback."""
    from openai_vector_search_demo_spark.operators.kmeans import (
        kmeans_lloyd_spherical,
    )
    cs, ns = kmeans_lloyd_spherical(corpus, k=8, iters=3, method="sql")
    cn, nn = kmeans_lloyd_spherical(corpus, k=8, iters=3, method="numpy")
    assert ns == nn
    assert cs == cn


def test_kmeans_auto_routes_by_ops(corpus):
    from openai_vector_search_demo_spark.operators.kmeans import (
        KMEANS_AUTO_NUMPY_MIN_OPS,
        kmeans_lloyd_spherical,
    )
    # k=8 x dim 64 = 512 >= crossover: auto == numpy == sql values
    assert KMEANS_AUTO_NUMPY_MIN_OPS == 512
    ca, na = kmeans_lloyd_spherical(corpus, k=8, iters=2, method="auto")
    cn, nn = kmeans_lloyd_spherical(corpus, k=8, iters=2, method="numpy")
    assert (ca, na) == (cn, nn)
