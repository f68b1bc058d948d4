"""Q7–Q9 — the map_rerank stage as a DataFrame plan.

Reference (app/app.py:79-110): one LLM call per KNN candidate produces
``{answer, score 0..100}``; candidates are sorted by the full tuple
``(score, retrieval_idx, answer)`` DESCENDING — ties on score break by *later*
retrieval index first, then answer text desc (app/app.py:88-92); then the
first ``top_n`` rows are kept and filtered to ``score >= 50``
(app/app.py:97-110 — implementing the *intended* semantics, not the
IndexError the reference swallows; SURVEY.md Q8).

The scorer is pluggable (E3): production would be an LLM pandas_udf
(temperature 0.2, max_tokens 500 — app/app.py:28-29); tests use the
deterministic local scorer below so results are oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.config import DEFAULT_TOP_K, SCORE_THRESHOLD


MAX_UNPARTITIONED_CANDIDATES = 10_000


def _static_max_rows(df: DataFrame) -> int | None:
    """Catalyst's static row bound for ``df``'s optimized logical plan
    (``LogicalPlan.maxRows``): a KNN candidate list arrives as
    ``orderBy(...).limit(k)`` → GlobalLimit, and Project/Filter stages the
    scorer adds on top propagate the bound — so boundedness is provable
    without running any job.  None = unbounded or unavailable (e.g. a
    non-JVM-backed session); callers fall back to a guarded probe."""
    try:
        mr = df._jdf.queryExecution().optimizedPlan().maxRows()
        return int(mr.get()) if mr.isDefined() else None
    except Exception:
        return None


def with_retrieval_idx(hits: DataFrame,
                       sim_col: str = "similarity",
                       tie_break: str = "id",
                       partition_col: str | None = None,
                       known_small: bool = False) -> DataFrame:
    """Candidate order as the KNN stage returned it (0-based), which is the
    reference's implicit list position (app/app.py:88-90).

    Without ``partition_col`` the ranking window is GLOBAL — Spark funnels
    every row through one task.  That is exactly right for a KNN candidate
    list (≤ tens of rows) and exactly wrong for anything large, so the
    unpartitioned path refuses inputs past ``MAX_UNPARTITIONED_CANDIDATES``
    rather than silently single-threading them; batch callers ranking many
    queries at once pass ``partition_col`` (e.g. the query id) and keep the
    window parallel per group.

    The size guard is FREE on the hot path: a statically bounded plan
    (``limit(k)`` anywhere below — which is how every ``knn()`` output
    arrives) is proven small from ``LogicalPlan.maxRows`` with zero jobs.
    Only a genuinely unbounded input pays a probe, and that probe runs over
    a ``localCheckpoint`` so the upstream plan (including any scorer/embed
    UDFs) executes exactly once, never twice.  ``known_small=True`` skips
    even the plan inspection (caller vouches for boundedness).
    """
    if partition_col is not None:
        w = Window.partitionBy(partition_col).orderBy(
            F.col(sim_col).desc(), F.col(tie_break).asc())
        return hits.withColumn("retrieval_idx", F.row_number().over(w) - 1)
    probe = MAX_UNPARTITIONED_CANDIDATES
    if not known_small:
        bound = _static_max_rows(hits)
        if bound is None or bound > probe:
            # unbounded plan: materialize AT MOST probe+1 rows — never the
            # whole input, so an oversized upstream fails cheaply instead of
            # being persisted first.  If the guard passes, the checkpoint
            # already holds EVERY row (n <= probe), so the downstream window
            # reads it and the upstream plan (scorer/embed UDFs) ran once.
            ck = hits.limit(probe + 1).localCheckpoint(eager=True)
            if ck.count() > probe:
                raise ValueError(
                    f"with_retrieval_idx without partition_col uses a global "
                    f"window (single partition); input exceeds {probe} rows — "
                    f"pass partition_col to rank per group")
            hits = ck
    w = Window.orderBy(F.col(sim_col).desc(), F.col(tie_break).asc())
    return hits.withColumn("retrieval_idx", F.row_number().over(w) - 1)


def deterministic_scorer(question: str, hits: DataFrame,
                         content_col: str = "page_content") -> DataFrame:
    """E3 stand-in: deterministic answer + 0..100 score.

    score = integer in 0..100 derived from the md5 of (question, content) —
    stable across runs/partitions; answer = first 160 chars of the chunk
    (extractive stand-in for the LLM's answer).
    """
    digest = F.md5(F.concat_ws(":", F.lit(question), F.col(content_col)))
    score = (F.conv(F.substring(digest, 1, 6), 16, 10).cast("long") % 101)
    return (hits
            .withColumn("answer", F.substring(F.col(content_col), 1, 160))
            .withColumn("score", score.cast("int")))


class RemoteScorer:
    """The production E3 scorer shape (LLM map_rerank — app/app.py:79-92)
    against an injectable transport: one completion per (question, candidate)
    pair at temperature 0.2, max_tokens 500, parsed to {answer, score 0..100}.

    ``transport``: ``(question, list[str]) -> list[(answer, score)]`` —
    one batched LLM call per Arrow sub-batch; raises on transient failure.
    Must be picklable (runs in the pandas UDF worker); a production
    transport lazily builds the LLM client and carries temperature /
    max_tokens.  A sub-batch failing ``max_retries`` times scores to NULL —
    those candidates are dropped like E2 drops failed embeds
    (modules/utilities.py:207-208), never a job abort.  Scores are clamped
    to the reference's 0..100 contract (app/app.py:90).  Retries back off
    exponentially (``backoff_base · 2^attempt`` s — LLM endpoints
    rate-limit; ``sleep`` injectable for tests).
    """

    def __init__(self, transport, batch_size: int = 64,
                 max_retries: int = 3,
                 temperature: float = 0.2, max_tokens: int = 500,
                 backoff_base: float = 0.5, sleep=None):
        if batch_size < 1 or max_retries < 1:
            raise ValueError("batch_size and max_retries must be >= 1")
        self.transport = transport
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.temperature, self.max_tokens = temperature, max_tokens
        self.backoff_base = backoff_base
        self.sleep = sleep

    def _score_chunk(self, question: str,
                     chunk: list[str]) -> list[tuple[str, int] | None]:
        import time
        do_sleep = self.sleep if self.sleep is not None else time.sleep
        for attempt in range(self.max_retries):
            try:
                res = self.transport(question, chunk)
                break
            except Exception:
                if attempt == self.max_retries - 1:
                    return [None] * len(chunk)
                do_sleep(self.backoff_base * (2 ** attempt))
        else:  # pragma: no cover
            return [None] * len(chunk)
        if len(res) != len(chunk):
            return [None] * len(chunk)
        return [None if r is None
                else (str(r[0]), max(0, min(100, int(r[1])))) for r in res]

    def __call__(self, question: str, hits: DataFrame,
                 content_col: str = "page_content") -> DataFrame:
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        scorer = self  # close over self, not the DataFrame
        out_t = StructType([StructField("answer", StringType()),
                            StructField("score", IntegerType())])

        @F.pandas_udf(out_t)
        def _score(contents: pd.Series) -> pd.DataFrame:
            vals = contents.tolist()
            answers: list[str | None] = []
            scores: list[int | None] = []
            for s in range(0, len(vals), scorer.batch_size):
                for r in scorer._score_chunk(question,
                                             vals[s:s + scorer.batch_size]):
                    answers.append(None if r is None else r[0])
                    scores.append(None if r is None else r[1])
            return pd.DataFrame({"answer": answers, "score": scores},
                                index=contents.index)

        scored = hits.withColumn("_as", _score(F.col(content_col)))
        return (scored
                .withColumn("answer", F.col("_as.answer"))
                .withColumn("score", F.col("_as.score"))
                .drop("_as")
                .filter(F.col("score").isNotNull()))


def rerank_order(df: DataFrame,
                 score_col: str = "score",
                 idx_col: str = "retrieval_idx",
                 answer_col: str = "answer") -> list:
    """Q7 — the exact 3-key descending sort of app/app.py:92."""
    return [F.col(score_col).desc(), F.col(idx_col).desc(), F.col(answer_col).desc()]


def rerank(scored: DataFrame,
           k: int = DEFAULT_TOP_K,
           threshold: int = SCORE_THRESHOLD,
           known_small: bool = False) -> DataFrame:
    """Q7 sort → Q8 limit+threshold → Q9 answer assembly."""
    if "retrieval_idx" not in scored.columns:
        scored = with_retrieval_idx(scored, known_small=known_small)
    ordered = scored.orderBy(*rerank_order(scored))
    return (ordered.limit(k)
            .filter(F.col("score") >= threshold)
            .select(
                F.col("answer").alias("Answer"),
                F.col("score").alias("Score"),
                F.col("page_content").alias("Content"),
                F.col("doc_path").alias("Source"),
                F.col("similarity").alias("Similarity"),
                (F.col("page_no") + 1).alias("Page"),  # P8, app/app.py:108
            ))


class ArithmeticScoreTransport:
    """Deterministic transport for the RemoteScorer slot: answer = first
    160 chars, score = (37·len(content)) mod 101 — pure arithmetic over
    the visible inputs, so a SQL oracle recomputes the 'LLM responses'
    exactly and the production scorer path is value-checked end-to-end.
    Picklable (stateless)."""

    def __call__(self, question: str,
                 contents: list[str]) -> list[tuple[str, int]]:
        return [(c[:160], (37 * len(c)) % 101) for c in contents]
