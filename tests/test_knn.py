"""KNN operator tests: exact top-k vs numpy brute force (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.knn import knn, similarity_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def brute_force_topk(emb_rows, qvec, k):
    ids = np.array([r["vec_id"] for r in emb_rows])
    mat = np.array([r["embedding"] for r in emb_rows], dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))
    return [(int(ids[i]), float(sims[i])) for i in order[:k]]


@pytest.mark.parametrize("method", ["sql", "numpy"])
def test_knn_matches_numpy_brute_force(spark, emb, method):
    rows = emb.collect()
    qvec = rows[7]["embedding"]
    expected = brute_force_topk(rows, qvec, 10)
    got = knn(emb, qvec, k=10, sim_col="sim", tie_break="vec_id",
              method=method).select("vec_id", "sim").collect()
    assert [r["vec_id"] for r in got] == [i for i, _ in expected]
    for (_, es), r in zip(expected, got):
        assert abs(r["sim"] - es) < 1e-9


def test_knn_self_is_top1(spark, emb):
    row0 = emb.filter(F.col("vec_id") == 0).first()
    got = knn(emb, row0["embedding"], k=1, sim_col="sim",
              tie_break="vec_id").first()
    assert got["vec_id"] == 0
    assert abs(got["sim"] - 1.0) < 1e-9


def test_similarity_join_topk_per_query(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    out = similarity_join(queries, emb, k=5).collect()
    assert len(out) == 15
    by_query = {}
    for r in out:
        by_query.setdefault(r["vec_id_query"], []).append(r)
    rows = emb.collect()
    for qid, hits in by_query.items():
        qvec = next(r["embedding"] for r in rows if r["vec_id"] == qid)
        expected = brute_force_topk(rows, qvec, 5)
        hits.sort(key=lambda r: r["rank"])
        assert [h["vec_id"] for h in hits] == [i for i, _ in expected]


def test_zero_vector_never_wins_knn(spark):
    """Regression: cosine 0/0 = NaN, and NaN ranks ABOVE every double in a
    descending Spark sort — an all-zero embedding would silently top any
    KNN.  The guarded cosine scores it 0 on both scoring paths."""
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    for method in ("sql", "numpy"):
        top = knn(df, [1.0, 0.0], k=3, sim_col="sim",
                  tie_break="vec_id", method=method).collect()
        assert [r.vec_id for r in top] == [1, 2, 3], method
        assert top[-1].sim == 0.0, method


def test_knn_auto_picks_path_by_dim(spark, emb):
    """method='auto' is a physical choice only: SQL codegen below the
    measured crossover (no Python boundary in the plan), BLAS matvec at or
    above it — results identical either way."""
    import contextlib
    import io

    from openai_vector_search_demo_spark.operators.knn import (
        KNN_AUTO_NUMPY_MIN_DIM,
        knn,
    )

    rows = emb.collect()
    qvec = rows[7]["embedding"]
    assert len(qvec) < KNN_AUTO_NUMPY_MIN_DIM

    def plan(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    narrow = knn(emb, qvec, k=5, sim_col="sim", tie_break="vec_id",
                 method="auto")
    assert "MapInPandas" not in plan(narrow)         # codegen path
    wide_vec = list(qvec) * (KNN_AUTO_NUMPY_MIN_DIM // len(qvec) + 1)
    wide = emb.select("vec_id",
                      F.flatten(F.array_repeat(
                          F.col("embedding"),
                          KNN_AUTO_NUMPY_MIN_DIM // len(qvec) + 1))
                      .alias("embedding"))
    wide_df = knn(wide, wide_vec, k=5, sim_col="sim", tie_break="vec_id",
                  method="auto")
    assert "MapInPandas" in plan(wide_df)            # BLAS path
    # identical results across the crossover (tiling preserves cosine)
    a = [r.vec_id for r in narrow.collect()]
    b = [r.vec_id for r in wide_df.collect()]
    assert a == b
