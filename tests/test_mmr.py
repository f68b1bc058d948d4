"""MMR diversified retrieval (operators/mmr.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.knn import knn
from openai_vector_search_demo_spark.operators.mmr import mmr_select


@pytest.fixture(scope="module")
def pool(spark):
    # 1 and 2 are near-identical and most relevant to q = x-axis (but not
    # equal to q — if doc 1 WERE q, every candidate's penalty would equal
    # its relevance and all MMR scores would tie at 0); 3 is less relevant
    # but far from both
    rows = [
        (1, [0.9, 0.1, 0.0]),
        (2, [0.89, 0.12, 0.0]),
        (3, [0.6, 0.0, 0.8]),
        (4, [0.5, 0.5, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return knn(df, [1.0, 0.0, 0.0], k=4, sim_col="rel",
               tie_break="vec_id").persist()


def test_mmr_prefers_diversity_over_redundancy(pool):
    out = {r.rank: r.vec_id for r in mmr_select(pool, k=3,
                                                lam=0.5).collect()}
    assert out[1] == 1            # first pick: pure relevance
    assert out[2] == 3            # NOT the near-duplicate 2
    assert out[3] == 2


def test_lambda_one_is_pure_relevance(pool):
    out = [r.vec_id for r in mmr_select(pool, k=4, lam=1.0)
           .orderBy("rank").collect()]
    by_rel = [r.vec_id for r in pool.orderBy(F.col("rel").desc(),
                                             "vec_id").collect()]
    assert out == by_rel


def test_rank_is_selection_order_and_complete(pool):
    out = mmr_select(pool, k=4, lam=0.3).collect()
    assert sorted(r.rank for r in out) == [1, 2, 3, 4]
    assert len({r.vec_id for r in out}) == 4


def test_k_larger_than_pool_returns_pool(pool):
    # each extra round finds an empty remainder; selection just stops
    out = mmr_select(pool, k=10, lam=0.5).collect()
    assert len(out) == 4


def test_validation(pool):
    with pytest.raises(ValueError, match="k must"):
        mmr_select(pool, k=0)
    with pytest.raises(ValueError, match="lam"):
        mmr_select(pool, k=1, lam=1.5)


def test_oversized_pool_fails_loudly(spark):
    from openai_vector_search_demo_spark.operators.mmr import MMR_MAX_POOL
    n = MMR_MAX_POOL + 1
    big = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
        F.lit(0.5).alias("rel"))
    with pytest.raises(ValueError, match="MMR_MAX_POOL"):
        mmr_select(big, k=2)


def test_duplicate_ids_fail_loudly(spark):
    rows = [(1, [1.0, 0.0], 0.9), (1, [0.0, 1.0], 0.8)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, rel double")
    with pytest.raises(ValueError, match="unique"):
        mmr_select(df, k=1)


def test_null_id_fails_loudly(spark):
    rows = [(None, [1.0, 0.0], 0.9), (2, [0.0, 1.0], 0.8)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, rel double")
    with pytest.raises(ValueError, match="non-null"):
        mmr_select(df, k=1)
