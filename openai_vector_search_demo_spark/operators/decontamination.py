"""Benchmark decontamination — n-gram overlap of the TRAINING corpus
against an EXTERNAL evaluation set.

The training-data gate the reference's pipeline would run before any
model sees the corpus (the GPT-3 appendix-C / PaLM practice, public
method descriptions: drop a training document if it shares any
13-gram with an eval example; n scales with document length).  This is
the sibling of ``split_leakage_audit`` (queries/batteries.py) — that
slot audits leakage across the pipeline's OWN splits, this one audits
against a benchmark the pipeline does not control.

Spark shape, 100 TB posture: the benchmark side is always SMALL (eval
sets are 10³–10⁶ rows), so its distinct n-gram relation BROADCASTS and
the corpus-side scan is embarrassingly parallel — one projection +
explode + broadcast-hash semi-join + per-doc agg; the corpus is never
shuffled by n-gram.  Never all-pairs, never a corpus self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.text_analysis import tokens

DECONTAM_NGRAM = 8
"""Default n for ~50-token documents — the scaled-down analogue of the
13-gram practice (n rises with document length so that an n-gram is
specific enough to indicate copying, not phrase reuse)."""


def _ngram_relation(df: DataFrame, id_col: str, text_col: str,
                    n: int, out_id: str) -> DataFrame:
    toks = tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n))))
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col).alias(out_id),
                     F.explode(grams).alias("g"))


def benchmark_contamination(train: DataFrame, bench: DataFrame,
                            n: int = DECONTAM_NGRAM,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            bench_id_col: str = "doc_id") -> DataFrame:
    """Training documents sharing at least one ``n``-gram with any
    benchmark document: (id_col, n_bench_docs, n_shared_ngrams), one
    row per CONTAMINATED training doc.  Decontaminate by anti-joining
    the training corpus against this relation; keep the relation as
    the audit artifact (what was dropped, and why, is part of any
    honest data card)."""
    tr = _ngram_relation(train, id_col, text_col, n, id_col)
    be = _ngram_relation(bench, bench_id_col, text_col, n, "_bid")
    hits = tr.join(F.broadcast(be), "g")
    return (hits.groupBy(id_col)
            .agg(F.countDistinct("_bid").alias("n_bench_docs"),
                 F.countDistinct("g").alias("n_shared_ngrams")))


def decontaminate(train: DataFrame, bench: DataFrame,
                  n: int = DECONTAM_NGRAM, id_col: str = "doc_id",
                  text_col: str = "text",
                  bench_id_col: str = "doc_id") -> DataFrame:
    """The corpus with contaminated documents REMOVED (left-anti join
    against the contamination relation)."""
    bad = benchmark_contamination(train, bench, n=n, id_col=id_col,
                                  text_col=text_col,
                                  bench_id_col=bench_id_col)
    return train.join(bad.select(id_col), id_col, "left_anti")
