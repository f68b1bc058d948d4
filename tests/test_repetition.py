"""Gopher repetition signals (`operators.repetition`) — hand-computed
fractions, short-doc edges, and the clamp (SURVEY.md §5.3 conventions)."""

from __future__ import annotations

import pytest

from openai_vector_search_demo_spark.operators.repetition import (
    GOPHER_REP_THRESHOLDS,
    ngram_repetition_signals,
)


def _sig(spark, text, ns=(2,)):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = ngram_repetition_signals(df, ns=ns).collect()
    return {r["n"]: (r["top_char_frac"], r["dup_char_frac"]) for r in rows}


def test_hand_computed_bigram_fractions(spark):
    # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] — top "a b"
    # appears 3x, len 3 -> 9 chars of 11; dup counts repeats BEYOND the
    # first (reference-reproduction semantics): (3-1)*3 + (2-1)*3 = 9
    text = "a b a b a b"
    top, dup = _sig(spark, text)[2]
    assert top == round(9 / 11, 6)
    assert dup == round(9 / 11, 6)


def test_no_repetition_dup_is_zero(spark):
    text = "one two three four five"
    top, dup = _sig(spark, text)[2]
    assert dup == 0.0
    # all counts are 1, so top is the LONGEST bigram's char share
    assert top == round(len("three four") / len(text), 6)


def test_doc_shorter_than_n_emits_no_row(spark):
    assert _sig(spark, "single", ns=(2, 3)) == {}


def test_thresholds_are_the_published_table(spark):
    assert GOPHER_REP_THRESHOLDS["top_2gram_char_frac"] == 0.20
    assert GOPHER_REP_THRESHOLDS["dup_5gram_char_frac"] == 0.15
    assert GOPHER_REP_THRESHOLDS["dup_10gram_char_frac"] == 0.10


def test_slot_rule_rows_cover_all_and_conjunction(spark):
    from openai_vector_search_demo_spark.queries.graph_ann import (
        gopher_repetition_rules,
    )
    rows = {r["rule"]: r for r in
            gopher_repetition_rules(spark, "/root/testdata/sf0.001")
            .collect()}
    from openai_vector_search_demo_spark.queries.graph_ann import (
        _REP_RULES,
    )
    # the FULL Table A1 gate set: top 2/3/4-gram + dup 5..10-gram
    assert set(rows) == {name for name, *_ in _REP_RULES} | {"ALL"}
    assert len(rows) == 10
    for r in rows.values():
        assert r["n_pass"] + r["n_fail"] > 0
    # the conjunction can never pass more docs than any single rule
    assert all(rows["ALL"]["n_pass"] <= rows[k]["n_pass"]
               for k in rows if k != "ALL")


def test_top_is_most_frequent_not_max_coverage(spark):
    # 'hello world' occurs 2x (coverage 22) but 'a b' occurs 3x
    # (coverage 9): the Gopher rule scores the MOST FREQUENT n-gram's
    # coverage — a long rare gram must not outscore a short frequent one
    text = "hello world hello world a b a b a b"
    top, dup = _sig(spark, text)[2]
    assert top == round(3 * len("a b") / len(text), 6)
    # dup still counts every duplicated gram's coverage
    assert dup > top


def test_line_signals_hand_computed(spark):
    # 4 lines, 'dup line' occurs 2x: dup_line_frac = 2/4,
    # dup_line_char_frac = 2*8 / len(text)
    text = "dup line\nunique one\ndup line\nunique two"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    from openai_vector_search_demo_spark.operators.repetition import (
        line_repetition_signals,
    )
    r = line_repetition_signals(df).collect()[0]
    # repeats beyond the first: 1 of 4 lines, 8 of len(text) chars
    assert r["dup_line_frac"] == 0.25
    assert r["dup_line_char_frac"] == round(8 / len(text), 6)


def test_line_signals_skip_empty_lines_and_lineless_docs(spark):
    df = spark.createDataFrame(
        [(0, "a\n\n\na"), (1, "\n\n")], "doc_id long, text string")
    from openai_vector_search_demo_spark.operators.repetition import (
        line_repetition_signals,
    )
    rows = {r["doc_id"]: r for r in line_repetition_signals(df).collect()}
    assert set(rows) == {0}          # doc 1 has no non-empty line
    # one repeat beyond the first of 2 lines
    assert rows[0]["dup_line_frac"] == 0.5


def test_line_signals_paragraph_separator(spark):
    # the paper's duplicate-PARAGRAPH rules are the same operator with
    # a paragraph separator: 3 paragraphs, one repeated once
    text = "para one\n\npara two\n\npara one"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    from openai_vector_search_demo_spark.operators.repetition import (
        line_repetition_signals,
    )
    r = line_repetition_signals(df, line_sep="\n\n").collect()[0]
    assert r["dup_line_frac"] == round(1 / 3, 6)
    assert r["dup_line_char_frac"] == round(len("para one") / len(text), 6)
