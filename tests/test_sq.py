"""SQ8 scalar-quantization invariants: code range/determinism, degenerate
dims, decode-error bound, sql==numpy physical equivalence, refine
dominance, NULL handling, and store byte-budget (no fp32 column)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.sq import (
    SQ8_LEVELS,
    sq8_encode,
    sq8_knn,
    sq8_stored_knn,
    sq8_train,
    write_sq8_index,
)

DIM = 8


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(11)
    rows = [(i, i % 3, [round(float(x), 6) for x in rng.randn(DIM)])
            for i in range(1, 41)]
    rows.append((41, 0, None))  # NULL embedding must drop, not crash
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")


def test_train_matches_numpy_minmax(emb):
    mins, maxs = sq8_train(emb, dim=DIM)
    mat = np.array([r.embedding for r in emb.collect()
                    if r.embedding is not None])
    assert mins == pytest.approx(mat.min(axis=0), abs=0)
    assert maxs == pytest.approx(mat.max(axis=0), abs=0)


def test_codes_in_range_and_extremes_hit_bounds(emb):
    mins, maxs = sq8_train(emb, dim=DIM)
    codes = [r.codes for r in sq8_encode(emb, mins, maxs).collect()]
    arr = np.array(codes)
    assert arr.min() >= 0 and arr.max() <= SQ8_LEVELS - 1
    # per-dim: the min value encodes 0, the max value encodes 255
    mat = np.array([r.embedding for r in emb.collect()
                    if r.embedding is not None])
    for j in range(DIM):
        assert arr[mat[:, j].argmin(), j] == 0
        assert arr[mat[:, j].argmax(), j] == SQ8_LEVELS - 1


def test_degenerate_dim_encodes_zero(spark):
    rows = [(i, [1.5, float(i)]) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mins, maxs = sq8_train(df, dim=2)
    assert mins[0] == maxs[0] == 1.5
    codes = np.array([r.codes for r in sq8_encode(df, mins, maxs).collect()])
    assert (codes[:, 0] == 0).all()


def test_decode_error_within_half_bucket(emb):
    """Bucket-midpoint reconstruction error is ≤ span/(2·256) per dim —
    the bound that makes the unrefined tier usable at moderate dims."""
    mins, maxs = sq8_train(emb, dim=DIM)
    mn, mx = np.array(mins), np.array(maxs)
    span = mx - mn
    rows = sq8_encode(emb, mins, maxs).collect()
    for r in rows:
        x = np.array(r.embedding)
        dec = mn + (np.array(r.codes) + 0.5) * span / SQ8_LEVELS
        assert (np.abs(dec - x) <= span / (2 * SQ8_LEVELS) + 1e-12).all()


def test_sql_numpy_equivalence(emb):
    qvec = [0.3] * DIM
    a = sq8_knn(emb, qvec, k=10, method="sql").select("vec_id").collect()
    b = sq8_knn(emb, qvec, k=10, method="numpy").select("vec_id").collect()
    assert [r.vec_id for r in a] == [r.vec_id for r in b]


def test_refine_recovers_exact_topk_with_full_shortlist(emb):
    """With R = corpus size the refine stage must return the exact KNN —
    quantization can then only reorder the shortlist, not drop anyone."""
    from openai_vector_search_demo_spark.operators.knn import knn
    qvec = [0.3] * DIM
    exact = [r.vec_id for r in
             knn(emb.filter(F.col("embedding").isNotNull()), qvec, k=10,
                 sim_col="sim", tie_break="vec_id").collect()]
    got = [r.vec_id for r in
           sq8_knn(emb, qvec, k=10, shortlist=100).collect()]
    assert got == exact


def test_null_embeddings_drop_in_both_paths(emb):
    qvec = [0.1] * DIM
    for method in ("sql", "numpy"):
        ids = [r.vec_id for r in
               sq8_knn(emb, qvec, k=50, shortlist=50,
                       method=method).collect()]
        assert 41 not in ids


def test_stored_path_equals_inline(spark, emb, tmp_path):
    qvec = [0.2] * DIM
    mins, maxs = sq8_train(emb, dim=DIM)
    store = str(tmp_path / "sq8")
    write_sq8_index(emb, store, mins, maxs)
    inline = [(r.vec_id, round(r.similarity, 6)) for r in
              sq8_knn(emb, qvec, k=10, mins=mins, maxs=maxs,
                      sim_col="similarity").collect()]
    stored = [(r.vec_id, round(r.similarity, 6)) for r in
              sq8_stored_knn(spark, store, emb, qvec, mins, maxs,
                             k=10).select("vec_id", "similarity").collect()]
    assert stored == inline


def test_store_holds_codes_not_vectors(spark, emb, tmp_path):
    mins, maxs = sq8_train(emb, dim=DIM)
    store = str(tmp_path / "sq8")
    write_sq8_index(emb, store, mins, maxs)
    cols = spark.read.parquet(store).columns
    assert "codes" in cols and "embedding" not in cols
