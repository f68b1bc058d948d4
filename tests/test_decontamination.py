"""Benchmark-decontamination invariants: exact n-gram overlap detection,
the clean/contaminated partition, and the broadcast-side scale shape."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.operators.decontamination import (
    benchmark_contamination,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpora(spark):
    train = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),      # copies bench 100
        (2, "one two three four five six seven"),        # clean
        (3, "x alpha beta gamma delta epsilon y"),       # shares a 5-gram
        (4, "alpha beta gamma"),                         # too short for n=5
    ], "doc_id long, text string")
    bench = spark.createDataFrame([
        (100, "alpha beta gamma delta epsilon"),
        (101, "unrelated benchmark prompt entirely"),
    ], "doc_id long, text string")
    return train, bench


def test_contamination_exact_overlap(corpora):
    train, bench = corpora
    hits = {r.doc_id: (r.n_bench_docs, r.n_shared_ngrams)
            for r in benchmark_contamination(train, bench, n=5).collect()}
    # docs 1 and 3 each share the one 5-gram of bench doc 100; doc 2 is
    # clean; doc 4 has no 5-gram at all
    assert hits == {1: (1, 1), 3: (1, 1)}


def test_decontaminate_partitions_corpus(corpora):
    train, bench = corpora
    kept = {r.doc_id for r in
            decontaminate(train, bench, n=5).collect()}
    assert kept == {2, 4}


def test_benchmark_side_broadcasts(corpora):
    train, bench = corpora
    plan = benchmark_contamination(train, bench, n=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
