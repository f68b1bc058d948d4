"""Cross-document line dedup (operators/line_dedup.py) — hand-computed
policies, order preservation, and edge cases."""

import pytest

from openai_vector_search_demo_spark.operators.line_dedup import (
    dedup_lines_across_docs,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "unique alpha\nshared banner\nunique beta"),
        (1, "shared banner\nunique gamma"),
        (2, "unique delta\nunique delta\nshared banner"),
        (3, "\n\n"),          # no non-empty line: no output row
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_drops_every_occurrence(spark, docs):
    out = {r.doc_id: r for r in
           dedup_lines_across_docs(docs, policy="boilerplate").collect()}
    assert set(out) == {0, 1, 2}
    # 'shared banner' is in 3 docs -> gone everywhere; the WITHIN-doc
    # repeat 'unique delta' is one doc -> kept (that's repetition.py's
    # job, not this operator's)
    assert out[0].text == "unique alpha\nunique beta"
    assert out[1].text == "unique gamma"
    assert out[2].text == "unique delta\nunique delta"
    assert (out[0].n_lines, out[0].n_kept, out[0].n_removed) == (3, 2, 1)
    assert (out[2].n_lines, out[2].n_kept, out[2].n_removed) == (3, 2, 1)


def test_keep_first_keeps_globally_smallest_occurrence(spark, docs):
    out = {r.doc_id: r for r in
           dedup_lines_across_docs(docs, policy="keep_first").collect()}
    # 'shared banner': first occurrence is (doc 0, pos 1) -> doc 0 keeps
    # it, docs 1 and 2 lose it; 'unique delta' repeats within doc 2 at
    # (2,0),(2,1) -> keep (2,0) only
    assert out[0].text == "unique alpha\nshared banner\nunique beta"
    assert out[1].text == "unique gamma"
    assert out[2].text == "unique delta"
    assert (out[2].n_lines, out[2].n_kept, out[2].n_removed) == (3, 1, 2)


def test_all_lines_removed_yields_empty_text(spark):
    df = spark.createDataFrame(
        [(0, "same"), (1, "same")], "doc_id long, text string")
    out = {r.doc_id: r for r in
           dedup_lines_across_docs(df, min_docs=2).collect()}
    assert out[0].text == "" and out[1].text == ""
    assert out[0].n_kept == 0 and out[0].n_removed == 1


def test_min_docs_threshold(spark, docs):
    out = {r.doc_id: r for r in
           dedup_lines_across_docs(docs, min_docs=4).collect()}
    # threshold above any line's doc count: nothing removed
    assert all(r.n_removed == 0 for r in out.values())
    assert out[0].text == "unique alpha\nshared banner\nunique beta"


def test_unknown_policy_raises(spark, docs):
    with pytest.raises(ValueError):
        dedup_lines_across_docs(docs, policy="nope")
