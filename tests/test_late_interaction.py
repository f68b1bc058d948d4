"""Late-interaction (MaxSim) retrieval — semantics vs a dense brute-force
reference, edge cases, and the scale-shape plan pins."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM, W, MT = 64, 1, 64


def _dense_positions(text: str):
    """Dense twin of token_window_features: one normalized context vector
    per position, built with plain numpy from the same md5 feature map.
    Fully-sign-cancelled positions stay as ZERO vectors — true dense
    MaxSim semantics: they contribute cosine 0 to every query token, so
    the per-query-token max can never go below 0 while one exists."""
    tks = [t for t in text.lower().split() if t][:MT]
    n = len(tks)
    vecs = []
    for pos in range(n):
        v = np.zeros(DIM)
        for tpos in range(max(0, pos - W), min(n, pos + W + 1)):
            h = int(hashlib.md5(tks[tpos].encode()).hexdigest()[:15], 16)
            v[h % DIM] += 1.0 if (h >> 59) & 1 == 0 else -1.0
        nm = np.linalg.norm(v)
        vecs.append(v / nm if nm > 0 else v)
    return vecs


def _brute(docs, query, k=10):
    """Dense MaxSim with the operator's candidate-set semantics: only
    documents sharing at least one bucket with the query are retrieved."""
    qv = _dense_positions(query)
    out = []
    for did, text in docs:
        dv = _dense_positions(text)
        if not dv or not qv:
            continue
        D = np.array(dv)
        qbuckets = {b for q in qv for b in np.nonzero(q)[0]}
        dbuckets = {b for d in dv for b in np.nonzero(d)[0]}
        if not (qbuckets & dbuckets):
            continue
        s = sum(float((D @ q).max()) for q in qv)
        out.append((did, round(s, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "dogs chase cats around the garden"),
    (3, "completely unrelated words xylophone quark"),
    (4, "the cat sat"),
    (5, ""),
    (6, "cat cat cat cat"),
]


def test_matches_dense_brute_force(spark):
    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_topk,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for query in ("cat on a mat", "garden", "the"):
        got = [(r.doc_id, r.maxsim_score)
               for r in late_interaction_topk(df, query, k=10).collect()]
        assert got == _brute(DOCS, query), query


def test_repetition_does_not_outrank_coverage(spark):
    """MaxSim's defining property vs bag-of-words cosine: each query
    token takes its best match ONCE — a doc repeating one query token
    cannot outrank a doc covering more query tokens."""
    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_topk,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [r.doc_id for r in
           late_interaction_topk(df, "cat on a mat", k=3).collect()]
    assert got[0] == 1          # full coverage wins...
    assert 6 in got and got.index(6) > 0  # ...over the cat-cat-cat doc


def test_cancelled_position_floors_at_zero(spark):
    """A fully-sign-cancelled document position is the zero vector and
    must floor the per-query-token max at 0 (it is counted in n_dpos
    pre-cancellation).  'mat' and 'elk' hash to the same bucket with
    opposite signs, so doc positions covering exactly {mat, elk} cancel;
    'cow' shares moon's bucket with opposite sign, making every joined
    cosine negative — the floor is the only thing keeping the score at
    0 instead of -0.707107."""
    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_topk,
    )

    docs = [(1, "moon mat elk")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r.doc_id, r.maxsim_score)
           for r in late_interaction_topk(df, "cow", k=5).collect()]
    assert got == [(1, 0.0)]
    assert got == _brute(docs, "cow")


def test_query_tokenizer_matches_engine_ascii_contract(spark):
    """The query tokenizer must follow the engine tokens() contract
    (ASCII \\s+): U+00A0 is NOT a separator, so 'cat\\u00a0mat' is ONE
    token on both sides and query/document tokenizations agree."""
    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_topk,
        query_window_features,
    )

    weird = "cat mat"
    # one fused token -> exactly one query position
    assert {pos for pos, _, _ in query_window_features(weird)} == {0}
    df = spark.createDataFrame([(1, weird), (2, "cat mat")],
                               "doc_id long, text string")
    got = [(r.doc_id, r.maxsim_score)
           for r in late_interaction_topk(df, weird, k=5).collect()]
    # doc 1 tokenizes identically to the query (one token) -> exact
    # self-match score 1.0; doc 2 ('cat', 'mat') shares no bucket with
    # the single fused token unless md5 collides -> absent or lower
    assert got[0] == (1, 1.0)


def test_empty_query_and_empty_docs(spark):
    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_topk,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert late_interaction_topk(df, "   ", k=5).collect() == []
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert late_interaction_topk(empty, "cat", k=5).collect() == []


def test_truncation_at_max_tokens(spark):
    """Tokens past max_tokens must not influence the score (the ColBERT
    doc-truncation contract)."""
    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_topk,
    )

    base = "word " * 64
    rows = [(1, base.strip()), (2, (base + "cat").strip())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.maxsim_score
           for r in late_interaction_topk(df, "cat", k=5).collect()}
    # 'cat' is doc 2's 65th token — truncated away, so neither doc may
    # score a cat match; both score identically (or not at all)
    assert got.get(1) == got.get(2)


def test_plan_broadcasts_query_and_takeordered(spark):
    """Scale pins: the dots join must broadcast the (tiny) query-feature
    side — the corpus never shuffles for the pairwise dots — and top-k
    must compile to TakeOrderedAndProject, never a global sort."""
    import contextlib
    import io

    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_topk,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = late_interaction_topk(df, "cat on a mat", k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "Sort [maxsim_score" not in p


def test_stored_index_matches_inline_and_prunes(spark, tmp_path):
    """The stored multi-vector read path end-to-end: write the bucket-
    partitioned index + metadata, verify (a) the probed read prunes at
    the file listing and (b) scores equal the inline operator exactly
    (the two share the scoring tail, but the pruned scan + side
    metadata must reconstruct the same inputs)."""
    import contextlib
    import io

    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_stored_topk,
        late_interaction_topk,
        write_token_window_index,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    store = str(tmp_path / "li_index")
    write_token_window_index(df, store)
    for query in ("cat on a mat", "garden", "xylophone quark"):
        want = [(r.doc_id, r.maxsim_score) for r in
                late_interaction_topk(df, query, k=10,
                                      cache=False).collect()]
        got_df = late_interaction_stored_topk(spark, store, query, k=10)
        got = [(r.doc_id, r.maxsim_score) for r in got_df.collect()]
        assert got == want, query
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        late_interaction_stored_topk(spark, store,
                                     "cat on a mat").explain("formatted")
    assert "PartitionFilters" in buf.getvalue()


def test_stored_index_empty_probe_and_empty_query(spark, tmp_path):
    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_stored_topk,
        write_token_window_index,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    store = str(tmp_path / "li_index2")
    write_token_window_index(df, store)
    assert late_interaction_stored_topk(spark, store, "  ").collect() == []


def test_late_interaction_tenant_store_isolation(spark, tmp_path):
    """Tenant-scoped multi-vector store (VERDICT r14 #7): a tenant's
    MaxSim serve equals a dedicated single-tenant index, and its probe
    reads never leave the tenant subtree."""
    from pyspark.sql import functions as F

    from openai_vector_search_demo_spark.operators.late_interaction import (
        late_interaction_stored_topk,
        li_tenant_path,
        write_token_window_index,
    )

    rows = [(i, f"hash join table scan merge {'sort ' * (i % 3)}{i}",
             str(i % 2)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string,"
                                       " tenant string")
    store = str(tmp_path / "liten")
    write_token_window_index(docs, store, dim=16, tenant_col="tenant")
    solo = str(tmp_path / "lisolo")
    write_token_window_index(
        docs.filter(F.col("tenant") == "0").drop("tenant"), solo, dim=16)
    q = "hash join"
    got = [(r.doc_id, r.maxsim_score) for r in
           late_interaction_stored_topk(spark, store, q, k=5, dim=16,
                                        tenant="0").collect()]
    want = [(r.doc_id, r.maxsim_score) for r in
            late_interaction_stored_topk(spark, solo, q, k=5,
                                         dim=16).collect()]
    assert got == want and got
    files0 = spark.read.parquet(
        li_tenant_path(store, "0")).inputFiles()
    assert files0 and all("tenant=0" in f for f in files0)
