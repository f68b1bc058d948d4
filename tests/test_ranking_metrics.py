"""ranking_metrics invariants: hand-computed nDCG/MRR on a tiny case,
perfect-list identity, and the no-overlap zero case."""

from __future__ import annotations

import math

import pytest


def _frame(spark, ids_scores):
    return spark.createDataFrame(ids_scores,
                                 "vec_id long, similarity double")


def test_perfect_list_scores_one(spark):
    from openai_vector_search_demo_spark.operators.ranking_metrics import (
        ranking_metrics,
    )
    exact = _frame(spark, [(i, 1.0 - i / 100) for i in range(1, 11)])
    row = ranking_metrics(exact, exact, k=10).collect()[0]
    assert (row.n_overlap, row.recall_at_10, row.mrr, row.ndcg_at_10) \
        == (10, 1.0, 1.0, 1.0)


def test_hand_computed_case(spark):
    """Approx list = exact ranks (2, 1, miss) at k=3, rel = 4 − e_rank:
    rel by approx position = (2, 3, 0); DCG = 2/log2(2) + 3/log2(3);
    IDCG = 3/log2(2) + 2/log2(3) + 1/log2(4); MRR = 1 (first approx
    item is relevant)."""
    from openai_vector_search_demo_spark.operators.ranking_metrics import (
        ranking_metrics,
    )
    exact = _frame(spark, [(1, 0.9), (2, 0.8), (3, 0.7)])
    approx = _frame(spark, [(2, 0.95), (1, 0.85), (99, 0.75)])
    row = ranking_metrics(approx, exact, k=3).collect()[0]
    dcg = 2 / math.log2(2) + 3 / math.log2(3)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert row.n_overlap == 2
    assert row.recall_at_3 == pytest.approx(round(2 / 3, 3))
    assert row.mrr == 1.0
    assert row.ndcg_at_3 == pytest.approx(round(dcg / idcg, 6))


def test_disjoint_lists_score_zero(spark):
    from openai_vector_search_demo_spark.operators.ranking_metrics import (
        ranking_metrics,
    )
    exact = _frame(spark, [(1, 0.9), (2, 0.8)])
    approx = _frame(spark, [(8, 0.9), (9, 0.8)])
    row = ranking_metrics(approx, exact, k=2).collect()[0]
    assert (row.n_overlap, row.recall_at_2, row.mrr, row.ndcg_at_2) \
        == (0, 0.0, 0.0, 0.0)
