"""RemoteEmbedder / RemoteScorer production-slot logic against mock
transports: batching, retry-then-succeed, retry-exhausted → None rows
filtered exactly like E2's failed-embed skip (modules/utilities.py:107-115,
:207-208; app/app.py:79-92)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


class FlakyEmbedTransport:
    """Fails the first ``fail_times`` calls, then succeeds — picklable, so
    the per-task copy exercises the in-worker retry loop."""

    def __init__(self, dim: int, fail_times: int = 0):
        self.dim = dim
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self, texts):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("transient")
        return [[float(len(t))] * self.dim for t in texts]


def test_remote_embedder_batches_and_aligns():
    import pandas as pd

    from openai_vector_search_demo_spark.embedding.embedder import RemoteEmbedder
    tr = FlakyEmbedTransport(dim=2)
    emb = RemoteEmbedder(tr, dim=2, batch_size=3)
    out = emb.embed_batch(pd.Series(["a", "bb", None, "cccc", "d"]))
    assert out[0] == [1.0, 1.0] and out[1] == [2.0, 2.0]
    assert out[2] is None                     # null text never hits the API
    assert out[3] == [4.0, 4.0] and out[4] == [1.0, 1.0]
    assert tr.calls == 2                      # 5 rows / batch_size 3 → 2 calls


def test_remote_embedder_retries_with_exponential_backoff():
    import pandas as pd

    from openai_vector_search_demo_spark.embedding.embedder import RemoteEmbedder
    tr = FlakyEmbedTransport(dim=2, fail_times=2)
    naps: list[float] = []
    emb = RemoteEmbedder(tr, dim=2, max_retries=3, backoff_base=0.5,
                         sleep=naps.append)
    out = emb.embed_batch(pd.Series(["xyz"]))
    assert out[0] == [3.0, 3.0]
    assert tr.calls == 3                      # 2 failures + 1 success
    assert naps == [0.5, 1.0]                 # base·2^attempt between tries


def test_remote_embedder_exhausted_retries_yield_none():
    import pandas as pd

    from openai_vector_search_demo_spark.embedding.embedder import RemoteEmbedder
    tr = FlakyEmbedTransport(dim=2, fail_times=99)
    naps: list[float] = []
    emb = RemoteEmbedder(tr, dim=2, max_retries=3, sleep=naps.append)
    out = emb.embed_batch(pd.Series(["xyz", "ab"]))
    assert out[0] is None and out[1] is None
    assert tr.calls == 3                      # stopped at max_retries
    assert len(naps) == 2                     # no sleep after the final failure


def test_remote_embedder_wrong_width_response_is_none():
    """A response vector whose width != the registry dim is a malformed
    response — it must map to None (E1 failure), never land in the table
    where it would poison every cosine."""
    import pandas as pd

    from openai_vector_search_demo_spark.embedding.embedder import RemoteEmbedder

    def skewed(texts):
        # first vector correct, second too narrow, third too wide
        widths = [2, 1, 3]
        return [[1.0] * widths[i % 3] for i in range(len(texts))]

    emb = RemoteEmbedder(skewed, dim=2)
    out = emb.embed_batch(pd.Series(["a", "b", "c"]))
    assert out[0] == [1.0, 1.0]
    assert out[1] is None and out[2] is None


def test_remote_embedder_fp32_contract():
    import pandas as pd

    from openai_vector_search_demo_spark.embedding.embedder import RemoteEmbedder
    emb = RemoteEmbedder(lambda ts: [[0.1] for _ in ts], dim=1)
    v = emb.embed_batch(pd.Series(["x"]))[0]
    assert v == [float(np.float32(0.1))]      # P10: stored vectors are fp32


def test_remote_embedder_through_udf_pipeline(spark):
    """End-to-end through embed_udf + the E2 null-skip filter: failed rows
    drop out, successful rows carry vectors — one distributed plan."""
    from openai_vector_search_demo_spark.embedding.embedder import (
        RemoteEmbedder,
        embed_udf,
    )

    class FailOddLengths:
        def __call__(self, texts):
            # deterministic per-content failure (no cross-process state):
            # a sub-batch containing any odd-length text raises
            if any(len(t) % 2 == 1 for t in texts):
                raise ValueError("bad batch")
            return [[float(len(t))] for t in texts]

    df = spark.createDataFrame(
        [(1, "ab"), (2, "abc"), (3, "abcd")], ["id", "text"])
    emb = RemoteEmbedder(FailOddLengths(), dim=1, batch_size=1, max_retries=2)
    out = (df.withColumn("v", embed_udf(emb)(F.col("text")))
           .filter(F.col("v").isNotNull()))
    got = {r.id: list(r.v) for r in out.collect()}
    assert got == {1: [2.0], 3: [4.0]}        # odd-length row skipped (E2)


class FlakyScoreTransport:
    def __init__(self, fail_times: int = 0):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self, question, contents):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise TimeoutError("transient")
        return [(f"answer to {question[:10]} from {c[:10]}", len(c) * 10)
                for c in contents]


def test_remote_scorer_chunk_retry_and_clamp():
    from openai_vector_search_demo_spark.operators.rerank import RemoteScorer
    tr = FlakyScoreTransport(fail_times=2)
    naps: list[float] = []
    sc = RemoteScorer(tr, max_retries=3, backoff_base=0.25, sleep=naps.append)
    got = sc._score_chunk("q", ["aaa", "a" * 50])
    assert tr.calls == 3
    assert naps == [0.25, 0.5]                # exponential backoff between tries
    assert got[0] == ("answer to q from aaa", 30)
    assert got[1][1] == 100                   # 500 clamped to the 0..100 band
    tr2 = FlakyScoreTransport(fail_times=99)
    sc2 = RemoteScorer(tr2, max_retries=3, sleep=lambda s: None)
    assert sc2._score_chunk("q", ["x"]) == [None]


def test_remote_scorer_distributed_filters_failures(spark):
    """Full rerank-input path: candidates whose sub-batch exhausts retries
    score NULL and are dropped, like the reference's skipped pages."""
    from openai_vector_search_demo_spark.operators.rerank import RemoteScorer

    class FailOnMarker:
        def __call__(self, question, contents):
            if any("poison" in c for c in contents):
                raise ValueError("bad batch")
            return [(c.upper(), min(100, len(c))) for c in contents]

    hits = spark.createDataFrame(
        [(1, "good text", 0.9), (2, "poison pill", 0.8), (3, "also fine", 0.7)],
        ["id", "page_content", "similarity"])
    sc = RemoteScorer(FailOnMarker(), batch_size=1, max_retries=2)
    out = sc("why?", hits)
    got = {r.id: (r.answer, r.score) for r in out.collect()}
    assert got == {1: ("GOOD TEXT", 9), 3: ("ALSO FINE", 9)}
