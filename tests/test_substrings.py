"""Exact-substring dedup at n-gram granularity (operators/substrings.py)."""

from __future__ import annotations

import pytest

from openai_vector_search_demo_spark.operators.substrings import (
    repeated_ngram_dedup,
)


def _run(spark, rows, n=3, min_df=2):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.id: r for r in repeated_ngram_dedup(df, n=n,
                                                  min_df=min_df).collect()}


def test_shared_phrase_is_removed_as_one_span(spark):
    # the 5-token phrase appears in both docs; with n=3 its three
    # overlapping grams union into the full 5-token span
    out = _run(spark, [
        (1, "alpha the quick brown fox jumps omega"),
        (2, "start the quick brown fox jumps end"),
    ])
    assert out[1].cleaned == "alpha omega"
    assert out[2].cleaned == "start end"
    assert out[1].n_removed == 5 and out[2].n_removed == 5
    assert out[1].n_tokens == 7


def test_unique_docs_are_untouched(spark):
    out = _run(spark, [(1, "one two three four"), (2, "five six seven eight")])
    assert out[1].n_removed == 0 and out[1].cleaned == "one two three four"
    assert out[2].n_removed == 0


def test_within_document_repeat_counts(spark):
    # min_df counts occurrences, not documents — an internal repeat of the
    # same 3-gram scrubs both occurrences
    out = _run(spark, [(1, "x a b c y a b c z")])
    assert out[1].n_removed == 6
    assert out[1].cleaned == "x y z"


def test_doc_shorter_than_n_is_kept_whole(spark):
    out = _run(spark, [(1, "hi there"), (2, "hi there"), (3, "hi there")])
    # 2-token docs produce no 3-grams: nothing can be flagged
    assert all(r.n_removed == 0 for r in out.values())


def test_identical_docs_fully_scrubbed(spark):
    out = _run(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    assert out[1].cleaned == "" and out[2].cleaned == ""
    assert out[1].n_removed == 6 == out[1].n_tokens


def test_n_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n must be"):
        repeated_ngram_dedup(df, n=0)
