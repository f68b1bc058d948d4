"""BPE merge training (operators/bpe.py) — the arXiv:1508.07909 loop as
relational algebra."""

from __future__ import annotations

import pytest

from openai_vector_search_demo_spark.operators.bpe import train_bpe_merges


def _train(spark, text, n=5):
    df = spark.createDataFrame([(text,)], "text string")
    return [tuple(r) for r in train_bpe_merges(df, num_merges=n).collect()]


def test_textbook_corpus_learns_the_textbook_merges(spark):
    # the classic low/lower/lowest example: l+o and o+w tie at 5,
    # lexicographic tie-break picks (l, o); then lo+w; then the e-pairs
    out = _train(spark, "low low low lower lowest newer newest")
    assert out == [(1, "l", "o", "lo", 5),
                   (2, "lo", "w", "low", 5),
                   (3, "e", "r", "er", 2),
                   (4, "e", "s", "es", 2),
                   (5, "e", "w", "ew", 2)]


def test_merge_application_is_left_to_right_non_overlapping(spark):
    # 'aaaa': round 1 counts pair (a,a) 3 times but applies it
    # non-overlapping -> [aa, aa]; round 2 then merges (aa, aa)
    out = _train(spark, "aaaa", n=2)
    assert out[0] == (1, "a", "a", "aa", 3)
    assert out[1] == (2, "aa", "aa", "aaaa", 1)


def test_merged_symbol_not_reeligible_within_pass(spark):
    # 'aba abab': merging (a,b) -> [ab, a] and [ab, ab]; the new 'ab'
    # never chains with a following 'a' in the same pass
    out = _train(spark, "aba abab", n=2)
    assert out[0] == (1, "a", "b", "ab", 3)
    # round 2 candidates: (ab,a):1, (ab,ab):1 -> lexicographic (ab, a)
    assert out[1] == (2, "ab", "a", "aba", 1)


def test_fewer_pairs_than_rounds_stops_early(spark):
    out = _train(spark, "ab", n=5)
    assert len(out) == 1 and out[0] == (1, "a", "b", "ab", 1)
    # after 'ab' every word is one symbol: no pairs remain


def test_validation(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe_merges(df, num_merges=0)


def test_segment_stats_hand_computed(spark):
    from openai_vector_search_demo_spark.operators.bpe import (
        bpe_segment_stats,
    )
    # "aaaa aaaa": 2 words, 8 chars; merges (a,a) then (aa,aa):
    # each word segments to [aaaa] -> 2 symbols total
    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    r = bpe_segment_stats(df, num_merges=2).first()
    assert (r.n_words, r.chars_total, r.symbols_after) == (2, 8, 2)
    assert r.compression == 0.25
