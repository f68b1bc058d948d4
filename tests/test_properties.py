"""Property-based tests (hypothesis) — SURVEY §5.3.

The heavyweight property is fast-vs-SQL shingle equivalence: the vectorized
hashlib path and the pure-SQL md5 HOF path MUST be bit-identical for any
input, because the DuckDB oracle mirrors the SQL form while pipelines run
the fast form.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# text with unicode letters, digits, punctuation and assorted whitespace —
# including U+00A0/U+2003 (Unicode spaces): Python str.split() would split
# them but Java/RE2 \s+ must not, which is exactly the parity trap the
# fast shingle path guards against with an ASCII-only regex
texts = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Zs"),
        whitelist_characters=" \t\n  "),
    max_size=120)


pytestmark = pytest.mark.slow  # hypothesis A/B property sweeps


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(texts, min_size=1, max_size=25))
def test_fast_shingles_bit_identical_to_sql(spark, batch):
    from openai_vector_search_demo_spark.functions.text_analysis import (
        shingle_hashes,
        shingle_hashes_fast,
    )
    df = spark.createDataFrame([(t,) for t in batch], ["text"])
    out = df.select(
        shingle_hashes("text", 3).alias("sql"),
        shingle_hashes_fast(3)("text").alias("fast")).collect()
    for r in out:
        assert sorted(r.sql) == sorted(r.fast)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.floats(min_value=-100, max_value=100,
                                   allow_nan=False, width=32),
                         min_size=4, max_size=4),
                min_size=1, max_size=20))
def test_cosine_self_similarity_and_symmetry(spark, vecs):
    from openai_vector_search_demo_spark.functions.vectors import (
        cosine_similarity,
    )
    rows = [(i, v) for i, v in enumerate(vecs) if any(x != 0 for x in v)]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["i", "v"])
    out = df.select(cosine_similarity("v", "v").alias("self")).collect()
    for r in out:
        assert math.isclose(r.self, 1.0, abs_tol=1e-9)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=2, max_value=12), st.integers(min_value=0, max_value=3),
       st.integers(min_value=0, max_value=10**9))
def test_query_buckets_within_hamming(nbits, h, seed):
    from openai_vector_search_demo_spark.operators.ann import (
        hyperplanes,
        query_buckets,
    )
    rng = np.random.RandomState(seed % 2**31)
    planes = hyperplanes(8, nbits, seed=7)
    q = rng.randn(8)
    probes = query_buckets(q, planes, probe_hamming=h)
    base = probes[0] if h == 0 else None
    # recompute base deterministically
    base = 0
    for b, p in enumerate(planes):
        if float(np.dot(q, p)) >= 0:
            base |= 1 << b
    assert base in probes
    assert len(probes) == len(set(probes))
    for x in probes:
        assert bin(x ^ base).count("1") <= h


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="ab ", max_size=200))
def test_embedder_unit_norm_and_determinism(text):
    import pandas as pd

    from openai_vector_search_demo_spark.embedding.embedder import (
        HashNgramEmbedder,
    )
    emb = HashNgramEmbedder(dim=16)
    v1 = emb.embed_batch(pd.Series([text])).iloc[0]
    v2 = emb.embed_batch(pd.Series([text])).iloc[0]
    assert v1 == v2
    # any emitted vector is unit-norm; empty/sign-cancelled inputs are None
    if v1 is not None:
        assert math.isclose(sum(x * x for x in v1), 1.0, rel_tol=1e-3)


@pytest.mark.parametrize("n_words", [0, 1, 299, 300, 301, 599, 600, 601])
def test_chunker_reconstruction_and_trailing_chunk(spark, n_words):
    """C3: chunks rejoined with ' ' reproduce the original single-spaced
    text, and an exact-300-multiple emits the reference's trailing empty
    chunk (modules/utilities.py:62 — SURVEY C3 edge semantics)."""
    from openai_vector_search_demo_spark.operators.chunking import (
        chunk_documents,
    )
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(chunk_documents(df, text_col="text").collect(),
                  key=lambda r: r.page_no)
    rejoined = " ".join(r.chunk for r in rows).rstrip(" ")
    assert rejoined == text
    expected_chunks = (n_words // 300) + 1 if n_words else 1
    assert len(rows) == expected_chunks
    if n_words > 0 and n_words % 300 == 0:
        assert rows[-1].chunk == ""  # the reference's off-by-one, preserved


# ---------------------------------------------------------------------------
# r7 operator invariants
# ---------------------------------------------------------------------------

@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 40)),
                min_size=1, max_size=25))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_substring_dedup_token_accounting(spark, docs):
    """kept tokens + removed tokens == n_tokens, and cleaned is always a
    subsequence of the original token stream."""
    from openai_vector_search_demo_spark.operators.substrings import (
        repeated_ngram_dedup,
    )
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    rows = [(i, " ".join(vocab[(w + j) % 7] for j in range(n)))
            for i, (w, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_ngram_dedup(df, n=3, min_df=2).collect()
    orig = dict(rows)
    assert len(out) == len(rows)
    for r in out:
        toks = orig[r.id].split()
        assert r.n_tokens == len(toks)
        kept = r.cleaned.split() if r.cleaned else []
        assert len(kept) + r.n_removed == r.n_tokens
        it = iter(toks)                       # subsequence check
        assert all(any(t == o for o in it) for t in kept)


@given(st.lists(st.tuples(st.integers(1, 5), st.sampled_from(
    ["view", "click", "purchase"]), st.integers(0, 100)),
    min_size=1, max_size=40))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_funnel_counts_monotonically_nonincreasing(spark, events):
    from openai_vector_search_demo_spark.operators.funnel import (
        funnel_counts,
    )
    df = spark.createDataFrame(events,
                               "user_id long, event_type string, ts_us long")
    out = sorted(funnel_counts(df, ["view", "click", "purchase"]).collect(),
                 key=lambda r: r.step)
    users = [r.users for r in out]
    assert users == sorted(users, reverse=True)
    assert all(0 <= r.conversion <= 1 for r in out)


@given(st.integers(2, 12), st.integers(1, 60))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_shard_assignment_partitions_the_corpus(spark, nshards, ndocs):
    from openai_vector_search_demo_spark.operators.sharding import (
        assign_shards,
    )
    df = spark.createDataFrame([(i,) for i in range(ndocs)], "doc_id long")
    rows = assign_shards(df, "doc_id", nshards).collect()
    assert len(rows) == ndocs
    assert all(0 <= r.shard < nshards for r in rows)
    assert all(r.shard == r.sort_key % nshards for r in rows)


@given(st.lists(st.tuples(st.integers(1, 5), st.sampled_from(
    ["view", "click", "purchase"]), st.integers(0, 100)),
    min_size=1, max_size=40))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_funnel_njoin_equals_fold_for_any_event_set(spark, events):
    """The two physical funnel forms are ONE operator: identical output
    on arbitrary event sets (ties, repeats, absent steps)."""
    from openai_vector_search_demo_spark.operators.funnel import (
        funnel_counts,
        funnel_counts_njoin,
    )
    df = spark.createDataFrame(events,
                               "user_id long, event_type string, ts_us long")
    steps = ["view", "click", "purchase"]
    a = sorted(map(tuple, funnel_counts(df, steps).collect()))
    b = sorted(map(tuple, funnel_counts_njoin(df, steps).collect()))
    assert a == b


@given(st.lists(texts, min_size=1, max_size=12),
       st.integers(1, 4), st.integers(1, 8))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cdc_chunks_partition_token_stream(spark, batch, k, divisor):
    """For ANY text/k/divisor: chunks rejoin to the exact token stream,
    token counts add up, chunk numbers are dense from 0."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        tokens,
    )
    from openai_vector_search_demo_spark.operators.chunking import cdc_chunks
    import pyspark.sql.functions as F
    df = spark.createDataFrame(list(enumerate(batch)),
                               "doc_id long, text string")
    toks = {r.doc_id: r.tks for r in
            df.select("doc_id", tokens("text").alias("tks")).collect()}
    out = cdc_chunks(df, k=k, divisor=divisor).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append(r)
    for doc, tk in toks.items():
        if not tk:
            assert doc not in by_doc
            continue
        chunks = sorted(by_doc[doc], key=lambda r: r.chunk_no)
        assert [c.chunk_no for c in chunks] == list(range(len(chunks)))
        rebuilt = [w for c in chunks for w in c.chunk_text.split(" ")]
        assert rebuilt == tk
        assert sum(c.n_tokens for c in chunks) == len(tk)


@given(st.lists(st.lists(st.floats(-1.0, 1.0, allow_nan=False,
                                   width=32), min_size=4, max_size=4),
                min_size=2, max_size=24),
       st.integers(1, 4))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_semdedup_salt_split_exact_for_any_vectors(spark, vecs, max_rows):
    """Salt-splitting is EXACT for any vector set and any shard bound:
    pair sets are identical to the unsalted single-gram plan."""
    from openai_vector_search_demo_spark.operators.semdedup import (
        _assigned_blocked,
        _pairs_blocked,
    )
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    df = spark.createDataFrame(list(enumerate(vecs)),
                               "vec_id long, embedding array<double>")
    cells = _assigned_blocked(df, cents, "vec_id", "embedding")
    ref = sorted((r.id_a, r.id_b) for r in
                 _pairs_blocked(cells, 0.9, max_cell_rows=10_000).collect())
    got = sorted((r.id_a, r.id_b) for r in
                 _pairs_blocked(cells, 0.9, max_cell_rows=max_rows).collect())
    assert got == ref


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(texts, min_size=1, max_size=8),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=2, max_value=10))
def test_cdc_normalized_invariants_hold_for_any_text(spark, docs, mn, span):
    """For arbitrary text and (min, max) bounds: chunks partition the
    token stream losslessly, every non-final chunk's size is in
    [min, max], and chunk numbering is dense from 0."""
    from openai_vector_search_demo_spark.operators.chunking import (
        cdc_chunks_normalized,
    )

    import re

    mx = mn + span
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks_normalized(df, min_tokens=mn, max_tokens=mx).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append(r)
    for i, t in rows:
        # engine tokenization is Java/RE2 ASCII \s+ — U+00A0 and other
        # Unicode spaces stay INSIDE tokens (the parity trap this file's
        # texts strategy exists to catch); Python str.split() would split
        # them and desynchronize the reference
        toks = [w for w in re.split(r"\s+", t.lower(), flags=re.ASCII)
                if w]
        rs = sorted(by_doc.get(i, []), key=lambda r: r.chunk_no)
        if not toks:
            assert rs == []
            continue
        assert [r.chunk_no for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert mn <= r.n_tokens <= mx
        assert 1 <= rs[-1].n_tokens <= mx
        assert " ".join(r.chunk_text for r in rs) == " ".join(toks)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(min_value=1, max_value=5),
                          st.sampled_from(["view", "click", "purchase",
                                           "other"]),
                          st.integers(min_value=0, max_value=50)),
                min_size=0, max_size=40))
def test_funnel_auto_equals_fold_for_any_events(spark, events):
    """funnel_counts_auto must equal funnel_counts on arbitrary event
    streams regardless of which branch the probe picks."""
    from openai_vector_search_demo_spark.operators.funnel import (
        funnel_counts,
        funnel_counts_auto,
    )

    schema = "user_id long, event_type string, ts_us long"
    df = spark.createDataFrame(events, schema) if events \
        else spark.createDataFrame([], schema)
    steps = ["view", "click", "purchase"]
    want = sorted(map(tuple, funnel_counts(df, steps).collect()))
    got = sorted(map(tuple, funnel_counts_auto(df, steps).collect()))
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.sampled_from(["a", "b", "c", "d"]),
                min_size=4, max_size=40),
       st.lists(st.sampled_from(["a", "b", "c", "d"]),
                min_size=4, max_size=40))
def test_drift_psi_jsd_symmetric_under_snapshot_swap(spark, xs, ys):
    """PSI and JSD are symmetric statistics: swapping which snapshot is
    'reference' must leave both unchanged (per-term (pa−pb)·ln(pa/pb)
    and the midpoint-KL are swap-invariant), and both are 0 iff the two
    empirical distributions coincide."""
    from pyspark.sql import functions as F

    from openai_vector_search_demo_spark.operators.drift import drift_report

    rows = [(0, v) for v in xs] + [(1, v) for v in ys]
    df = spark.createDataFrame(rows, "snap int, cat string")
    fwd = drift_report(df, F.col("snap"), {"cat": F.col("cat")}).collect()[0]
    rev = drift_report(df, 1 - F.col("snap"),
                       {"cat": F.col("cat")}).collect()[0]
    assert fwd.psi == rev.psi and fwd.jsd == rev.jsd
    assert fwd.psi >= 0.0 and 0.0 <= fwd.jsd <= math.log(2) + 1e-9


@settings(max_examples=10, deadline=None)
@given(st.integers(0, (1 << 62) - 1), st.integers(0, (1 << 62) - 1),
       st.integers(0, (1 << 62) - 1))
def test_hamming_distance_is_a_metric(a, b, c):
    """bit_count(xor) — identity, symmetry, triangle inequality (what
    justifies ranking by it): checked on the driver-side int form the
    engine's plan literals use."""
    def ham(x, y):
        return bin(x ^ y).count("1")
    assert ham(a, a) == 0
    assert ham(a, b) == ham(b, a)
    assert ham(a, c) <= ham(a, b) + ham(b, c)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(-3, 3, allow_nan=False, width=32),
                min_size=4, max_size=4))
def test_signature_bit_b_is_sign_of_plane_dot(vec):
    """signature_of sets bit b exactly when dot(vec, plane_b) >= 0 —
    the invariant both engines' packings mirror."""
    from openai_vector_search_demo_spark.operators.ann import hyperplanes
    from openai_vector_search_demo_spark.operators.hamming import (
        signature_of,
    )
    planes = hyperplanes(4, nbits=9, seed=13)
    sig = signature_of(vec, planes)
    for b, p in enumerate(planes):
        want = 1 if float(np.dot(vec, p)) >= 0.0 else 0
        assert (sig >> b) & 1 == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.sampled_from(["s0", "s1", "s2"]),
                          st.integers(1, 500)),
                min_size=2, max_size=30))
def test_mixture_allocation_arithmetic(spark, rows):
    """Shares always sum to 1 over observed sources, and epochs is the
    target/available ratio — checked against driver-side arithmetic for
    arbitrary source mixes (the engine form lives in the
    `mixture_allocation` slot; this pins the algebra it relies on)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, s, "w " * max(1, t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string")
    tk = (df.groupBy("source")
          .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+")))
               .alias("n_tokens")))
    raw = F.when(F.col("source") == "s0", 4.0).otherwise(1.0)
    rw = tk.withColumn("raw", raw)
    tot = rw.agg(F.sum("raw").alias("rt"),
                 F.sum("n_tokens").alias("tt")).first()
    out = (rw.crossJoin(spark.createDataFrame([tot], "rt double, tt long"))
           .select("source", "n_tokens",
                   (F.col("raw") / F.col("rt")).alias("share"),
                   (0.5 * F.col("tt") * F.col("raw") / F.col("rt")
                    / F.col("n_tokens")).alias("epochs"))).collect()
    assert abs(sum(r.share for r in out) - 1.0) < 1e-9
    for r in out:
        want = 0.5 * tot.tt * r.share / r.n_tokens
        assert abs(r.epochs - want) < 1e-9


def test_quota_cap_keeps_best_n_per_source(spark):
    """The quota window keeps exactly min(N, |source|) rows per source
    and they are the quality-maximal ones."""
    from pyspark.sql import Window, functions as F

    rows = [(i, f"s{i % 3}", float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    w = Window.partitionBy("source").orderBy(F.col("q").desc(),
                                             F.col("doc_id").asc())
    kept = (df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5))
    got = {(r.source, r.doc_id) for r in kept.collect()}
    for s in ("s0", "s1", "s2"):
        grp = sorted((r for r in rows if r[1] == s),
                     key=lambda r: (-r[2], r[0]))[:5]
        assert {(s, r[0]) for r in grp} == {g for g in got if g[0] == s}


# ---------------------------------------------------------------------------
# Label propagation vs a pure-Python reference (r12): clamped plurality
# voting with (count desc, label asc) ties on arbitrary small graphs.
# ---------------------------------------------------------------------------

def _lp_reference(edges, seeds, rounds):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: (l, 0) for n, l in seeds.items() if n in adj}
    for r in range(1, rounds + 1):
        newly = {}
        for n in adj:
            if n in lab:
                continue
            votes = {}
            for nb in adj[n]:
                if nb in lab:
                    votes[lab[nb][0]] = votes.get(lab[nb][0], 0) + 1
            if votes:
                best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                newly[n] = (best[0][0], r)
        lab.update(newly)
    return {n: lab.get(n, (None, None)) for n in adj}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(1, 12), st.integers(1, 12))
                .filter(lambda p: p[0] != p[1]),
                min_size=1, max_size=20),
       st.dictionaries(st.integers(1, 12),
                       st.sampled_from(["a", "b", "c"]),
                       min_size=1, max_size=4),
       st.integers(1, 3))
def test_label_propagation_matches_reference(spark, edges, seeds, rounds):
    from openai_vector_search_demo_spark.operators.labelprop import (
        label_propagation,
    )
    e = spark.createDataFrame([(a, b) for a, b in edges], "a long, b long")
    s = spark.createDataFrame(list(seeds.items()),
                              "node long, label string")
    got = {r.node: (r.label, r.round_labeled) for r in
           label_propagation(e, s, rounds=rounds).collect()}
    want = _lp_reference(edges, seeds, rounds)
    assert got == want
    spark.catalog.clearCache()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x"]),
    min_size=0, max_size=30), min_size=1, max_size=8))
def test_repetition_fractions_bounded_and_python_twin(spark, docs):
    """Repetition signals ∈ [0, 1], match a direct Python recount, and
    a doc of all-distinct tokens has dup_char_frac = 0."""
    import collections

    from openai_vector_search_demo_spark.operators.repetition import (
        ngram_repetition_signals,
    )
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["n"]): (r["top_char_frac"], r["dup_char_frac"])
           for r in ngram_repetition_signals(df, ns=(2,)).collect()}
    for i, toks in enumerate(docs):
        text = " ".join(toks)
        grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        if not grams:
            assert (i, 2) not in got
            continue
        c = collections.Counter(grams)
        cmax = max(c.values())
        top = max(cnt * len(g) for g, cnt in c.items() if cnt == cmax)
        dup = sum((cnt - 1) * len(g) for g, cnt in c.items() if cnt >= 2)

        # F.round is HALF_UP; python round() is banker's — emulate Spark
        def r6(x):
            from decimal import ROUND_HALF_UP, Decimal
            return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                                   rounding=ROUND_HALF_UP))
        et = r6(min(1.0, top / len(text)))
        ed = r6(min(1.0, dup / len(text)))
        gt, gd = got[(i, 2)]
        assert 0 <= gt <= 1 and 0 <= gd <= 1
        assert (gt, gd) == (et, ed), (i, text)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.floats(min_value=-10, max_value=10,
                                   allow_nan=False, width=32),
                         min_size=4, max_size=4),
                min_size=2, max_size=24),
       st.integers(min_value=0, max_value=23))
def test_router_exact_branch_equals_direct_knn(spark, vecs, qi):
    """For any small corpus the router picks exact and equals knn()."""
    from openai_vector_search_demo_spark.operators.knn import auto_knn, knn
    from pyspark.sql import functions as F
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)
            if any(x != 0 for x in v)]
    if len(rows) < 2:
        return
    qvec = rows[qi % len(rows)][1]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tier, top = auto_knn(df, qvec, k=5)
    assert tier == "exact"
    got = [(r["vec_id"], r["similarity"]) for r in top.collect()]
    # mirror the router's contract: round first, then (sim desc, id asc)
    full = [(r["vec_id"], r["s"])
            for r in knn(df, qvec, k=len(rows), sim_col="_r",
                         tie_break="vec_id")
            .select("vec_id", F.round("_r", 6).alias("s")).collect()]
    exp = sorted(full, key=lambda t: (-t[1], t[0]))[:5]
    assert got == exp


# ---- sampling family (r15 s4): fuzzed against Python twins ----------------

def _h60py(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 500), st.integers(0, 3)),
                min_size=1, max_size=60, unique_by=lambda t: t[0]),
       st.integers(0, 20))
def test_bottomk_always_matches_twin(spark, rows, k):
    from openai_vector_search_demo_spark.functions.hashing import (
        bottomk_sample,
    )
    df = spark.createDataFrame([(i, f"s{g}") for i, g in rows],
                               "doc_id long, source string")
    got = sorted(r.doc_id for r in bottomk_sample(df, "doc_id", k).collect())
    want = sorted(sorted((i for i, _ in rows),
                         key=lambda i: (_h60py(f"42:{i}"), i))[:k])
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 300), st.integers(0, 2),
                          st.integers(1, 40)),
                min_size=1, max_size=50, unique_by=lambda t: t[0]),
       st.integers(0, 300), st.integers(0, 120))
def test_token_budget_fill_always_matches_twin(spark, rows, b0, bdef):
    from openai_vector_search_demo_spark.functions.hashing import (
        token_budget_fill,
    )
    df = spark.createDataFrame(
        [(i, f"s{g}", w) for i, g, w in rows],
        "doc_id long, source string, toks long")
    budgets = {"s0": b0}
    kept = sorted(r.doc_id
                  for r in token_budget_fill(df, "source", "doc_id", "toks",
                                             budgets, default=bdef)
                  .collect())
    want = []
    for g in {f"s{t[1]}" for t in rows}:
        order = sorted((t for t in rows if f"s{t[1]}" == g),
                       key=lambda t: (_h60py(f"42:{t[0]}"), t[0]))
        budget = budgets.get(g, bdef)
        cum = 0
        for i, _, w in order:
            if cum < budget:
                want.append(i)
            cum += w
    assert kept == sorted(want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.floats(min_value=-1e6, max_value=1e6,
                                    allow_nan=False, width=64),
                          st.integers(1, 9)),
                min_size=1, max_size=80),
       st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_weighted_quantile_always_matches_twin(spark, pairs, q):
    import math as _m
    from openai_vector_search_demo_spark.operators.quantiles import (
        exact_quantiles,
    )
    df = spark.createDataFrame([("g", v, w) for v, w in pairs],
                               "g string, v double, w int")
    got = {r.q: r.value
           for r in exact_quantiles(df, "v", ["g"], [q], bins=4,
                                    final_threshold=2,
                                    weight_col="w").collect()}
    W = sum(w for _, w in pairs)
    k = max(1, _m.ceil(q * W))
    by_v: dict = {}
    for v, w in pairs:
        by_v[v] = by_v.get(v, 0) + w
    cum = 0
    for v in sorted(by_v):
        cum += by_v[v]
        if cum >= k:
            assert got == {q: v}
            break
