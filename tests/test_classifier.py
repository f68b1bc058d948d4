"""Distributed logistic-regression quality classifier
(`operators/classifier.py`): training dynamics, scoring plan shape, AUC
evaluator invariants.  Engine-vs-oracle value parity for the two
registered queries is covered by tests/test_parity.py like every other
registered query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.classifier import (
    FEATURE_NAMES,
    N_FEATURES,
    auc_frame,
    logreg_features,
    logreg_prob,
    logreg_train_gd,
    with_split,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def feat(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return logreg_features(with_split(docs)).persist()


def test_features_shape_and_ranges(feat):
    rows = feat.select("y", *[f"f{j}" for j in range(N_FEATURES)]).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["y"] in (0.0, 1.0)
        assert r["f0"] == 1.0
        for j in range(N_FEATURES):
            assert r[f"f{j}"] is not None and r[f"f{j}"] >= 0.0


def test_train_learns_the_teacher_direction(feat):
    """The teacher is quality >= cut; quality grows with the en-stopword
    ratio and the length term, so those student weights must come out
    positive (and the model must actually move off the origin)."""
    w = logreg_train_gd(feat.filter(F.col("split") == "train"))
    assert len(w) == N_FEATURES
    by_name = dict(zip(FEATURE_NAMES, w))
    assert by_name["sw_en"] > 0
    assert by_name["len_sat"] > 0
    assert any(abs(x) > 0.1 for x in w)


def test_heldout_auc_beats_chance(feat):
    w = logreg_train_gd(feat.filter(F.col("split") == "train"))
    scored = feat.filter(F.col("split") == "test") \
        .withColumn("prob", logreg_prob(w))
    row = auc_frame(scored, "prob", "y").collect()[0]
    assert row["n_test"] == row["n_pos"] + row["n_neg"]
    assert row["auc"] > 0.8, row


def test_scoring_is_pure_codegen(feat):
    """The serving path (the thing that runs over 100 TB) must stay
    whole-stage codegen: no Python evals, no Arrow exchange."""
    plan = feat.withColumn(
        "prob", logreg_prob([0.1] * N_FEATURES)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert plan.lstrip().startswith("*(")  # whole-stage codegen root


def test_auc_single_class_is_half(spark):
    df = spark.createDataFrame(
        [(0.9, 1.0), (0.2, 1.0)], "prob double, y double")
    row = auc_frame(df, "prob", "y").collect()[0]
    assert row["auc"] == 0.5 and row["n_neg"] == 0


def test_auc_perfect_separation(spark):
    df = spark.createDataFrame(
        [(0.9, 1.0), (0.8, 1.0), (0.3, 0.0), (0.1, 0.0)],
        "prob double, y double")
    assert auc_frame(df, "prob", "y").collect()[0]["auc"] == 1.0


def test_auc_ties_average(spark):
    """All scores equal → AUC exactly 0.5 through the ½·P(=) term."""
    df = spark.createDataFrame(
        [(0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0)],
        "prob double, y double")
    assert auc_frame(df, "prob", "y").collect()[0]["auc"] == 0.5


def test_split_is_deterministic_and_keyed(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in with_split(docs).collect()}
    b = {r["doc_id"]: r["split"]
         for r in with_split(docs.repartition(7)).collect()}
    assert a == b
    assert set(a.values()) == {"train", "test"}
