"""Matryoshka prefix-ANN invariants: full-prefix identity with exact KNN,
prefix-only ranking uses only prefix dims, NULL drop."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.matryoshka import (
    matryoshka_knn,
)

DIM = 8


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(3)
    rows = [(i, i % 3, [round(float(x), 6) for x in rng.randn(DIM)])
            for i in range(1, 41)]
    rows.append((41, 0, None))
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")


def test_full_prefix_equals_exact_knn(emb):
    """prefix_dim = dim ⇒ the shortlist rank IS the exact rank; with a
    corpus-sized shortlist the refine must return exact KNN."""
    from openai_vector_search_demo_spark.operators.knn import knn
    qvec = [0.4] * DIM
    exact = [r.vec_id for r in
             knn(emb.filter(F.col("embedding").isNotNull()), qvec, k=10,
                 sim_col="sim", tie_break="vec_id").collect()]
    got = [r.vec_id for r in
           matryoshka_knn(emb, qvec, k=10, prefix_dim=DIM,
                          shortlist=100).collect()]
    assert got == exact


def test_prefix_only_ranking_ignores_tail(spark):
    """Two vectors with identical prefixes but different tails must tie
    on the prefix rank (id tiebreak) in refine=False mode."""
    rows = [(1, 0, [1.0, 0.0, 5.0, 5.0]),
            (2, 0, [1.0, 0.0, -5.0, 3.0]),
            (3, 0, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    got = [r.vec_id for r in
           matryoshka_knn(df, [1.0, 0.0, 0.0, 0.0], k=2, prefix_dim=2,
                          shortlist=3, refine=False).collect()]
    assert got == [1, 2]  # same prefix cosine, id breaks the tie


def test_null_embeddings_drop(emb):
    ids = [r.vec_id for r in
           matryoshka_knn(emb, [0.1] * DIM, k=50, prefix_dim=4,
                          shortlist=50).collect()]
    assert 41 not in ids
