"""E1 — text → embedding, as an Arrow-batched pandas UDF.

The reference calls Azure OpenAI one page at a time (``chunk_size=1``,
``max_retries=3``, returns None on failure — modules/utilities.py:107-115).
That contract survives here, but the *shape* is Spark-native: a scalar
``pandas_udf`` receives whole Arrow batches, so a remote embedder would issue
one batched API call per ~10k rows instead of one per row — same semantics,
orders-of-magnitude better constant factor (SURVEY.md §4.1).

Two implementations behind one interface:

- ``HashNgramEmbedder`` — deterministic, dependency-free local model used by
  tests/bench (SURVEY.md §5: "pluggable local model" solves oracle
  determinism).  Feature-hash unigram projection with sign hashing, L2
  normalized, float32.  Same algorithm as scikit-learn's HashingVectorizer
  family, reimplemented on md5 for cross-platform determinism.
- A remote (OpenAI-compatible) embedder would subclass ``Embedder`` and batch
  HTTP calls inside the same UDF body; it is intentionally NOT implemented —
  no network in this environment (stub raises, mirroring E1's None-on-failure
  reporting path).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


class Embedder:
    """E1 contract: texts in, fp32 vectors (or None on failure) out."""

    dim: int

    def embed_batch(self, texts: pd.Series) -> pd.Series:  # pragma: no cover
        raise NotImplementedError


class HashNgramEmbedder(Embedder):
    """Deterministic feature-hash embedder.

    token → first 15 hex of md5 as a 60-bit int h (the engine-wide
    `_hash60` convention — SQL-expressible in both Spark and DuckDB, which
    makes the *whole embedding* oracle-checkable);
    bucket = h mod dim; sign = bit 59 of h; accumulate sign into bucket;
    L2-normalize (float64, exact: ±1 integer sums); cast fp32 (P10).
    Deterministic across processes/partitions — no RNG, no state.
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    _WS = re.compile(r"\s+", re.ASCII)

    def _vec(self, text: str | None) -> list[float] | None:
        if text is None:
            return None
        v = np.zeros(self.dim, dtype=np.float64)
        # ASCII \s split (not str.split()): Java/RE2 \s is ASCII-only, and the
        # flagship oracle tokenizes with regexp \s+ — Unicode whitespace like
        # U+00A0 must stay inside tokens on both sides
        for tok in (t for t in self._WS.split(text.lower()) if t):
            h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
            bucket = h % self.dim
            sign = 1.0 if (h >> 59) & 1 == 0 else -1.0
            v[bucket] += sign
        n = float(np.sqrt((v * v).sum()))
        if n == 0:
            # no tokens, or sign-cancelled features: no meaningful direction.
            # Report as embedding failure (E1's None contract) — a zero
            # vector would make cosine NaN, and NaN sorts *above* every
            # similarity in a descending Spark sort.
            return None
        v /= n
        return [float(np.float32(x)) for x in v]

    def embed_batch(self, texts: pd.Series) -> pd.Series:
        return texts.map(self._vec)


class RemoteEmbedder(Embedder):
    """Shape of the production embedder (Azure/OpenAI API, E1).

    Would issue one batched HTTP call per Arrow batch with
    ``max_retries=3`` and emit None for rows that still fail
    (modules/utilities.py:107-115, :207-208).  Unimplemented here: this
    environment has no network and no openai package.
    """

    def __init__(self, model: str, dim: int):  # pragma: no cover
        self.model, self.dim = model, dim

    def embed_batch(self, texts: pd.Series) -> pd.Series:  # pragma: no cover
        raise NotImplementedError("remote embedding requires network access")


def embed_udf(embedder: Embedder | None = None):
    """Scalar pandas_udf computing array<float> embeddings.

    Rows that fail embed to null — callers filter with
    ``col(...).isNotNull()``, mirroring E2's skip-with-log
    (modules/utilities.py:207-208).
    """
    emb = embedder or HashNgramEmbedder()

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield emb.embed_batch(texts)

    return _embed


def embed_text(text: str, embedder: Embedder | None = None) -> list[float]:
    """Q1 — driver-side single-prompt embed (modules/utilities.py:376-377)."""
    emb = embedder or HashNgramEmbedder()
    return emb.embed_batch(pd.Series([text])).iloc[0]
