"""Matryoshka (prefix-dimension) ANN: truncated-embedding shortlist + refine.

Matryoshka Representation Learning (Kusupati et al., NeurIPS 2022 —
public method description only) trains embeddings whose PREFIX is itself
a usable lower-dimensional embedding; serving stacks exploit it by
ranking with the first d' dims (d'/d of the scan bytes and FLOPs) and
refining the shortlist with the full vector — the "adaptive retrieval"
deployment.  This module is that serving rung for the engine's ladder:
unlike SQ8/PQ/binary it needs NO training and NO stored artifact beyond
the vectors themselves — the "index" is a column slice — which makes it
the cheapest rung to adopt and the natural first cut before quantizers.

The fixture embeddings are not MRL-trained, so the recall slot prices
exactly what an untrained prefix gives (the honest number — production
embeddings trained with MRL do better; the MECHANICS are identical).

Scale posture (100 TB): the shortlist scan reads d' of d dims per row —
with vectors stored chunked (prefix column + tail column) that is a
physical d'/d byte cut, the same ReadSchema pruning argument as the
stored-code tiers; both ranks are ``TakeOrderedAndProject``.  All
arithmetic is the ladder's sequential-fold cosine on 6-dp-rounded
ranks with id tie-breaks — bit-replayable in DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.vectors import (
    cosine_similarity,
    vector_lit,
)

MRL_PREFIX_DIM = 16


def matryoshka_knn(df: DataFrame, qvec: Sequence[float], k: int = 10,
                   prefix_dim: int = MRL_PREFIX_DIM, shortlist: int = 50,
                   vec_col: str = "embedding", sim_col: str = "similarity",
                   tie_break: str = "vec_id",
                   refine: bool = True) -> DataFrame:
    """Top-k by prefix-dim cosine shortlist (R=``shortlist``, ordered by
    the 6-dp-rounded prefix score, ties by ``tie_break`` asc) + exact
    full-dim cosine refine.  ``refine=False`` returns the prefix-only
    top-k (the recall-measurement path)."""
    qpref = list(qvec)[:prefix_dim]
    pref = F.slice(F.col(vec_col), 1, prefix_dim)
    scored = (df.filter(F.col(vec_col).isNotNull())
              .withColumn("_pref_sim", F.round(
                  cosine_similarity(pref, vector_lit(qpref)), 6)))
    short = (scored.orderBy(F.col("_pref_sim").desc(),
                            F.col(tie_break).asc())
             .limit(shortlist))
    if not refine:
        return (short.withColumnRenamed("_pref_sim", sim_col)
                .orderBy(F.col(sim_col).desc(), F.col(tie_break).asc())
                .limit(k))
    refined = short.withColumn(
        sim_col, cosine_similarity(F.col(vec_col), vector_lit(qvec)))
    return (refined.orderBy(F.col(sim_col).desc(), F.col(tie_break).asc())
            .limit(k).drop("_pref_sim"))
