"""SemDeDup — semantic deduplication by embedding clustering (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540 — public).

The 100 TB shape of embedding-space dedup: instead of all-pairs cosine
(quadratic in the corpus) or LSH buckets (recall limited by random
planes), cluster the embedding space and compare ONLY within clusters —
the cluster size bounds every quadratic.  Within each near-duplicate
group the kept representative is the member with the LOWEST cosine
similarity to its cluster centroid (the paper's keep rule: prefer the
outlier, it carries the most marginal information), ties to the smallest
id.

Plan (``method='blocked'``, the default): ONE Arrow ``mapInPandas`` pass
assigns cells and computes each row's centroid similarity (numpy — the
16-centroid × dim arithmetic would be interpreted HOF lambdas in
expression form, ~20× slower measured at sf0.1), then a per-cell
``applyInPandas`` BLAS gram matrix emits the over-threshold pairs — the
CLUSTER IS THE BLAS BLOCK, so per-task memory is |cell|·dim·8 bytes and
nothing quadratic ever shuffles.  Groups collapse via
``operators.dedup.duplicate_clusters`` (large-star/small-star) and one
window applies the keep rule.

``method='sql'`` is the expression-only form (zip_with/aggregate cosine
inside a cell self-join) — the DuckDB-mirrorable reference path, kept for
parity pinning; same results, interpreted-lambda speed.

Float caveat (same one ``dedup.embedding_near_dup``'s blocked method
documents): BLAS sums in a different order than the oracle's sequential
fold, so a cosine EXACTLY at ``threshold`` or two centroid distances
equal to the last ulp could decide differently — measure-zero on real
embeddings, and the fixture parity suite pins that it does not happen on
the test corpora.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.caching import scoped_persist
from openai_vector_search_demo_spark.functions.vectors import (
    cosine_similarity,
)
from openai_vector_search_demo_spark.operators.ann import ivf_cell
from openai_vector_search_demo_spark.operators.dedup import duplicate_clusters

__all__ = ["semdedup"]


def _centroid_sim_sql(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """Cosine of each row's vector to ITS OWN cell centroid — a when-chain
    over the centroid literals (expression form for the 'sql' method)."""
    expr = F.lit(None).cast("double")
    for cell, c in enumerate(centroids):
        lit_vec = F.array(*[F.lit(float(x)) for x in c])
        expr = F.when(F.col("cell") == cell,
                      cosine_similarity(vec_col, lit_vec)).otherwise(expr)
    return expr


def _assigned_blocked(df: DataFrame, centroids: list[list[float]],
                      id_col: str, vec_col: str) -> DataFrame:
    """(id, v, cell, sim_centroid) in one Arrow pass."""
    import numpy as np
    import pandas as pd

    cent = np.asarray(centroids, dtype=np.float64)          # k × d
    cnorm = np.linalg.norm(cent, axis=1)
    cnorm[cnorm == 0] = 1.0
    csq = (cent * cent).sum(axis=1)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖² — BLAS, no n×k×d temporary
            xc = mat @ cent.T
            d2 = (mat * mat).sum(axis=1)[:, None] - 2.0 * xc + csq[None, :]
            cell = d2.argmin(axis=1)                # ties → lowest index,
            xn = np.linalg.norm(mat, axis=1)        # like ivf_cell
            xn[xn == 0] = 1.0
            sim = xc[np.arange(len(mat)), cell] / (xn * cnorm[cell])
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(),
                "v": pdf[vec_col],
                "cell": cell.astype("int32"),
                "sim_centroid": sim,
            })

    src = df.select(F.col(id_col), F.col(vec_col))
    return src.mapInPandas(assign,
                           schema=f"id long, v {dict(src.dtypes)[vec_col]}, "
                                  "cell int, sim_centroid double")


DEFAULT_MAX_CELL_ROWS = 8192
"""Per-task gram-block bound.  The within-cell comparison materializes a
|block_i|×|block_j| float64 similarity matrix, so task memory is
max_cell_rows² · 8 bytes — 8192 → 512 MB, while an unguarded 200k-row
skewed cell would be a 320 GB task (VERDICT r7 wrong #2)."""


def _pairs_blocked(cells: DataFrame, threshold: float,
                   max_cell_rows: int = DEFAULT_MAX_CELL_ROWS,
                   sizes: DataFrame | None = None) -> DataFrame:
    """Within-cell over-threshold cosine pairs: per-cell BLAS gram matrix
    (the cluster bounds the quadratic AND the task memory).

    Cells larger than ``max_cell_rows`` are SALT-SPLIT — still exact, the
    paper's cell-bounds-the-quadratic assumption just stops being a memory
    assumption: rows hash into S = ⌈|cell|/max⌉ shards and every unordered
    shard pair (i ≤ j) is compared in its own task, so each pair of rows
    meets exactly once ((i,i) covers within-shard, (i,j) cross-shard) and
    no task ever holds a gram block larger than max².  Each row replicates
    to its S shard-pair groups — linear ×S cost, vs the quadratic ×|cell|
    blowup it prevents.  Cells at or under the bound keep S=1 and the
    single-group plan (and bit-identical output) of the unsalted form."""
    import numpy as np
    import pandas as pd

    def cell_pairs(key, pdf):
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        _, i, j = key
        if i == j:
            pdf = pdf[pdf["salt"] == i]
            if len(pdf) < 2:
                return empty
            pdf = pdf.sort_values("id")
            ids = pdf["id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            sims = unit @ unit.T
            li, ri = np.nonzero(np.triu(sims >= threshold, k=1))
            return pd.DataFrame({"id_a": ids[li], "id_b": ids[ri]})
        a, b = pdf[pdf["salt"] == i], pdf[pdf["salt"] == j]
        if len(a) == 0 or len(b) == 0:
            return empty
        ids_a = a["id"].to_numpy(dtype=np.int64)
        ids_b = b["id"].to_numpy(dtype=np.int64)
        mat_a = np.array(a["v"].tolist(), dtype=np.float64)
        mat_b = np.array(b["v"].tolist(), dtype=np.float64)
        na = np.linalg.norm(mat_a, axis=1)
        na[na == 0] = 1.0
        nb = np.linalg.norm(mat_b, axis=1)
        nb[nb == 0] = 1.0
        sims = (mat_a / na[:, None]) @ (mat_b / nb[:, None]).T
        li, ri = np.nonzero(sims >= threshold)
        ia, ib = ids_a[li], ids_b[ri]
        return pd.DataFrame({"id_a": np.minimum(ia, ib),
                             "id_b": np.maximum(ia, ib)})

    # cell sizes → shard count S: from the caller's tiny (cell, _n)
    # aggregate when provided (broadcast join — no extra shuffle of the
    # corpus-sized relation), else a per-cell count window (standalone
    # fallback; costs one shuffle on the cell key)
    base = cells.select("id", "v", "cell")
    if sizes is not None:
        base = base.join(F.broadcast(sizes), "cell")
    else:
        w = Window.partitionBy("cell")
        base = base.withColumn("_n", F.count(F.lit(1)).over(w))
    salted = (base
              .withColumn("_s", F.ceil(F.col("_n")
                                       / F.lit(max_cell_rows)).cast("int"))
              .withColumn("salt",
                          F.pmod(F.xxhash64("id"), F.col("_s")).cast("int"))
              .withColumn("grp", F.explode(F.transform(
                  F.sequence(F.lit(0), F.col("_s") - 1),
                  lambda k: F.struct(
                      F.least(k, F.col("salt")).alias("i"),
                      F.greatest(k, F.col("salt")).alias("j"))))))
    return (salted.select("id", "v", "cell", "salt",
                          F.col("grp.i").alias("i"), F.col("grp.j").alias("j"))
            .groupBy("cell", "i", "j")
            .applyInPandas(cell_pairs, schema="id_a long, id_b long"))


def semdedup(df: DataFrame, centroids: list[list[float]],
             id_col: str = "vec_id", vec_col: str = "embedding",
             threshold: float = 0.95,
             method: str = "blocked",
             max_cell_rows: int = DEFAULT_MAX_CELL_ROWS,
             cache: bool = True) -> DataFrame:
    """Cluster-prefiltered semantic dedup.  Returns one row per member of
    every near-duplicate group: ``(id, cell, cluster_id, sim_centroid,
    keep)`` — ``keep`` marks the group's one retained representative.
    Documents in no group are implicitly kept and emit no row (same
    contract as ``duplicate_clusters``).

    ``max_cell_rows`` (blocked method): per-task gram-block bound — skewed
    cells above it are salt-split into shard-pair tasks (exact, see
    ``_pairs_blocked``) instead of materializing a |cell|² matrix.

    ``cache=True`` persists the one-Arrow-pass assignment relation: it is
    consumed three times (cell-size sizing, pair generation, the member
    info join) and uncached each consumer repeats the corpus scan + BLAS
    assignment.  Same session-lifetime cache convention as
    ``operators.dedup`` — pass ``cache=False`` in long-lived sessions and
    evict with ``spark.catalog.clearCache()``."""
    if method not in ("blocked", "sql"):
        raise ValueError(f"unknown method {method!r}")

    if method == "blocked":
        cells = _assigned_blocked(df, centroids, id_col, vec_col)
        if cache:
            cells = scoped_persist(cells)
        sizes = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))
        pairs = _pairs_blocked(cells, threshold, max_cell_rows, sizes=sizes)
        info = cells.drop("v")
    else:
        base = (df.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("v"))
                  .withColumn("cell", ivf_cell("v", centroids)))
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                        "cell")
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                        "cell")
        pairs = (a.join(b, "cell")
                 .filter(F.col("id_a") < F.col("id_b"))
                 .withColumn("cos", cosine_similarity("v_a", "v_b"))
                 .filter(F.col("cos") >= threshold)
                 .select("id_a", "id_b"))
        info = base.withColumn("sim_centroid",
                               _centroid_sim_sql("v", centroids)).drop("v")

    clusters = duplicate_clusters(pairs)          # (id, cluster_id)
    members = clusters.join(info, "id")
    w = Window.partitionBy("cluster_id").orderBy(F.col("sim_centroid").asc(),
                                                 F.col("id").asc())
    return (members
            .withColumn("keep", F.row_number().over(w) == 1)
            .select("id", "cell", "cluster_id",
                    F.round("sim_centroid", 6).alias("sim_centroid"),
                    "keep"))
