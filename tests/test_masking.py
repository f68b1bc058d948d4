"""Deterministic span corruption (operators/masking.py)."""

from __future__ import annotations

import pytest

from openai_vector_search_demo_spark.operators.masking import mask_spans


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(20)],
        "doc_id long, text string")


def test_rate_zero_masks_nothing(docs):
    out = mask_spans(docs, start_rate=0.0).collect()
    assert all(r.n_masked == 0 for r in out)
    orig = {r.doc_id: r.text for r in docs.collect()}
    assert all(r.masked_text == orig[r.id].lower() for r in out)
    assert all(r.targets == "" for r in out)


def test_rate_one_masks_everything(docs):
    out = mask_spans(docs, start_rate=1.0).collect()
    assert all(r.n_masked == r.n_tokens for r in out)
    assert all(set(r.masked_text.split()) == {"<mask>"} for r in out)


def test_masked_plus_kept_reconstruct_document(docs):
    orig = {r.doc_id: r.text.lower().split() for r in docs.collect()}
    for r in mask_spans(docs, start_rate=0.15, span_len=3).collect():
        toks = orig[r.id]
        masked = r.masked_text.split()
        assert len(masked) == len(toks) == r.n_tokens
        targets = r.targets.split() if r.targets else []
        assert len(targets) == r.n_masked
        # splice the targets back into the mask slots → original document
        it = iter(targets)
        rebuilt = [next(it) if t == "<mask>" else t for t in masked]
        assert rebuilt == toks
        # unmasked positions untouched
        assert all(m == t for m, t in zip(masked, toks) if m != "<mask>")


def test_deterministic_and_seed_sensitive(docs):
    a = sorted(map(tuple, mask_spans(docs, start_rate=0.2).collect()))
    b = sorted(map(tuple, mask_spans(docs, start_rate=0.2).collect()))
    c = sorted(map(tuple, mask_spans(docs, start_rate=0.2,
                                     seed=99).collect()))
    assert a == b
    assert a != c


def test_span_clips_at_document_end(spark):
    # force a start at the LAST position via rate 1 on a 2-token doc with
    # span_len 5: coverage must not exceed n_tokens
    df = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    r = mask_spans(df, start_rate=1.0, span_len=5).first()
    assert r.n_masked == 2 == r.n_tokens


def test_validation(docs):
    with pytest.raises(ValueError, match="span_len"):
        mask_spans(docs, span_len=0)
    with pytest.raises(ValueError, match="start_rate"):
        mask_spans(docs, start_rate=1.5)


def test_empty_document_emits_zero_row(spark):
    """Zero-token docs must not vanish (ADVICE r7): the contract row is
    (id, 0, 0, '', '')."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "   ")],
        "doc_id long, text string")
    out = {r.id: r for r in mask_spans(df, start_rate=0.5).collect()}
    assert set(out) == {1, 2, 3}
    for i in (2, 3):
        r = out[i]
        assert (r.n_tokens, r.n_masked, r.masked_text, r.targets) == \
            (0, 0, "", "")
