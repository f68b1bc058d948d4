"""Distributed spherical k-means (Lloyd's algorithm) — the TRAINER the
ANN family's pinned artifacts come from, as a DataFrame-native iterative
job instead of a driver-side numpy pass.

The pinned-index modules (``ann_pretrained``, ``ann_clustered``,
``pq_pretrained``) are built offline by ``operators.ann.train_centroids``
on a capped sample (``IVF_TRAIN_CAP`` — right for index BUILD, where a
100k sample estimates centroids fine).  This module is the other
regime: clustering as a QUERY over the full corpus — corpus
organization, SemDeDup-style cell assignment, topic bucketing — where
the data cannot be sampled down and the iteration itself must be
distributed.

Spark-first shape (the same loop structure MLlib's KMeans runs):

- **Assignment is codegen**: current centroids inline as plan literals
  and each row's cell is ``argmax dot(e, c)`` (``ann.ivf_cell_dot`` —
  the spherical-quantizer contract, ties to the low cid).  No shuffle.
- **Update is one partial aggregation** per iteration:
  ``groupBy(cell).agg(count, avg(e[0]), …, avg(e[dim-1]))`` — map-side
  combine reduces every partition to ≤ k rows of dim+1 doubles, so the
  shuffle moves k·(dim+1) numbers per partition regardless of corpus
  size.  The k-row result is collected (bounded: k·dim doubles), the
  means are re-normalized to the unit sphere, and the next iteration's
  literals are born.
- **Determinism contract** (what makes the whole loop oracle-checkable
  in DuckDB, iteration by iteration): seeded DATA-DERIVED init (the
  first k corpus rows by id — the ``ann_ivf_knn`` convention), a FIXED
  iteration count, empty cells keep their centroid, and every centroid
  is rounded to 6 dp **inside the engine** (``F.round`` = HALF_UP =
  away-from-zero = DuckDB ``ROUND``) before it becomes a literal — so
  both engines feed bit-identical centroids into every assignment step,
  and cross-engine float drift cannot compound across iterations.

At 100 TB: ``iters`` full scans (each pruned to the id/vector columns),
``iters`` k-row shuffles, zero unbounded driver state.  Reference
parity note: the reference has no trainer at all (HNSW index build is
Redis-internal, modules/utilities.py); this is engine surface the
Spark-first design adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_lloyd_spherical", "kmeans_assign"]


def _normalized(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    from openai_vector_search_demo_spark.functions.vectors import (
        l2_normalize,
    )
    return (df.select(id_col, l2_normalize(vec_col, "double").alias("e"))
            .filter(F.col("e").isNotNull()))


KMEANS_AUTO_NUMPY_MIN_OPS = 512
"""``method='auto'`` crossover: assignment cost per row is k·dim
multiply-adds; as interpreted higher-order-function lambdas that is
~20× slower than one Arrow-batched BLAS pass once k·dim reaches a few
hundred — the same constant the IVF inline search measured
(``ann.IVF_AUTO_NUMPY_MIN_OPS``).  Measured at k·dim = 512 (SCALE.md
r10, same session): sql 7.08 s at sf0.1 / 22.93 s at sf1 vs numpy
0.82 / 0.76 s — the numpy path is scale-flat here because its
per-iteration cost is one Arrow scan plus bounded collects, while the
sql form pays the interpreted per-row term plus ~1.6 s/iteration of
Catalyst re-analysis of the dim-wide update expressions."""


def kmeans_lloyd_spherical(df: DataFrame, vec_col: str = "embedding",
                           id_col: str = "vec_id", k: int = 8,
                           iters: int = 3,
                           init_ids: list[int] | None = None,
                           method: str = "sql",
                           ) -> tuple[list[list[float]], list[int]]:
    """Run ``iters`` Lloyd rounds over the full frame; returns
    ``(centroids, counts)`` — k unit-norm 6-dp centroid vectors and the
    member count of each cell in the FINAL assignment (the one that
    produced the returned centroids).  ``init_ids`` defaults to the k
    smallest ids (deterministic, data-derived — no RNG to disagree
    about across engines).

    ``method``: ``'sql'`` (default — pure codegen/HOF expressions, the
    oracle-exact form the registered slot runs), ``'numpy'`` (one Arrow
    pass per iteration: BLAS argmax assignment + per-cell partial sums,
    the large-``k·dim`` fast path), or ``'auto'`` (numpy at/above the
    measured ``KMEANS_AUTO_NUMPY_MIN_OPS`` crossover).  Both paths
    round centroids to 6 dp in-engine each round, so they agree except
    on exact rounding-boundary means (the q2 sql/numpy contract;
    pinned by ``test_kmeans_numpy_path_matches_sql``)."""
    if method not in ("sql", "numpy", "auto"):
        raise ValueError(f"unknown method {method!r}")
    en = _normalized(df, vec_col, id_col)
    cent = None
    if method != "sql":
        # the engine init evaluates the interpreted-HOF normalize over
        # EVERY row twice (the id scan cannot prune past the e-notnull
        # filter) — 8 of the 27 measured seconds at sf1.  The fast
        # paths derive init from a codegen TakeOrdered of k+slack raw
        # rows, with the normalize/round arithmetic replayed driver-
        # side in the engine's exact association (sequential fold,
        # ``_round6``) — value-pinned against the engine init by
        # test_kmeans_numpy_path_matches_sql.
        cent = _driver_init(df, vec_col, id_col, k, init_ids)
    if cent is None:
        if init_ids is None:
            init_ids = [r[0] for r in
                        en.select(id_col).orderBy(id_col).limit(k)
                          .collect()]
        if len(init_ids) != k:
            raise ValueError(f"need {k} init ids, got {len(init_ids)}")
        init = {r[0]: r[1] for r in
                en.filter(F.col(id_col).isin(init_ids))
                  .select(id_col,
                          F.transform("e", lambda x: F.round(x, 6))
                          .alias("c"))
                  .collect()}
        cent = [[float(v) for v in init[i]] for i in sorted(init_ids)]
    dim = len(cent[0])
    if method == "auto":
        method = "numpy" if k * dim >= KMEANS_AUTO_NUMPY_MIN_OPS else "sql"
    counts = [0] * k

    from openai_vector_search_demo_spark.caching import scoped_persist
    from openai_vector_search_demo_spark.operators.ann import ivf_cell_dot

    # materialize the normalized relation ONCE for the SQL path:
    # without the persist barrier Catalyst inlines the (interpreted-HOF)
    # l2_normalize expression into every one of the dim avg() terms and
    # all k assignment dots — a dim+k-fold recompute per row per
    # iteration that dominated the measured sf1 profile
    src = scoped_persist(en) if method == "sql" else df
    try:
        for _ in range(iters):
            if method == "sql":
                a = src.withColumn("_cell", ivf_cell_dot("e", cent))
                agg = a.groupBy("_cell").agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.avg(F.col("e")[j]).alias(f"a{j}")
                      for j in range(dim)])
            else:
                # collect the ≤ partitions·k per-batch partials (tiny:
                # dim+1 numbers each — the map-side-combine bound) and
                # combine DRIVER-SIDE.  Running the dim-wide mean/
                # normalize/round as engine expressions cost ~1.6 s of
                # Catalyst re-ANALYSIS per iteration (the ~130-node
                # plan is re-planned each round because the centroid
                # literals change; analysis is not cached the way
                # codegen is — measured in the sf1 profile, it was 5×
                # the cost of the actual Arrow pass).  The driver
                # combine is O(partitions·k·dim) floats and mirrors
                # the engine arithmetic exactly: sequential left-assoc
                # sums, then shortest-repr HALF_UP 6-dp rounding
                # (``_round6``) — the ``F.round`` double contract.
                per: dict[int, tuple[int, list[float]]] = {}
                for r in _numpy_partials(src, cent, vec_col).collect():
                    c = int(r["_cell"])
                    if c in per:
                        n0, s0 = per[c]
                        per[c] = (n0 + int(r["n"]),
                                  [a + b for a, b in zip(s0, r["s"])])
                    else:
                        per[c] = (int(r["n"]), [float(v) for v in r["s"]])
                counts = [0] * k
                for c, (nc, s) in per.items():
                    counts[c] = nc
                    a = [v / nc for v in s]
                    nr = 0.0
                    for v in a:
                        nr += v * v
                    nr = nr ** 0.5
                    cent[c] = [_round6(v / nr) for v in a]
                continue
            # two-stage: name the norm once instead of inlining its
            # dim-term sum into every one of the dim round() columns
            # (a dim² expression tree whose codegen compile time was
            # visible in the per-iteration profile)
            nrm = F.sqrt(sum(F.col(f"a{j}") * F.col(f"a{j}")
                             for j in range(dim)))
            rows = (agg.withColumn("_nrm", nrm)
                    .select("_cell", "n",
                            *[F.round(F.col(f"a{j}") / F.col("_nrm"), 6)
                              .alias(f"c{j}") for j in range(dim)])
                    .collect())
            counts = [0] * k
            for r in rows:
                cell = int(r["_cell"])
                counts[cell] = int(r["n"])
                cent[cell] = [float(r[f"c{j}"]) for j in range(dim)]
    finally:
        if method == "sql":
            src.unpersist()
    return cent, counts


def _driver_init(df: DataFrame, vec_col: str, id_col: str, k: int,
                 init_ids: list[int] | None,
                 slack: int = 64) -> list[list[float]] | None:
    """Initial centroids without evaluating the engine-side normalize
    over the corpus: collect k+``slack`` raw candidate rows (codegen
    ``TakeOrderedAndProject`` on the id, NULL vectors filtered at the
    scan) and replay normalize→round driver-side in the engine's exact
    arithmetic (sequential sum-of-squares fold = ``l2_norm``'s
    association; ``_round6`` = ``F.round``'s double contract).  Returns
    None when the slack window is exhausted by zero-norm rows (the
    caller falls back to the engine init); raises like the engine path
    when explicit ``init_ids`` are missing or degenerate."""
    if init_ids is None:
        cand = (df.select(id_col, vec_col)
                .filter(F.col(vec_col).isNotNull())
                .orderBy(id_col).limit(k + slack).collect())
    else:
        if len(init_ids) != k:
            raise ValueError(f"need {k} init ids, got {len(init_ids)}")
        cand = sorted(df.select(id_col, vec_col)
                      .filter(F.col(vec_col).isNotNull()
                              & F.col(id_col).isin(init_ids)).collect(),
                      key=lambda r: r[id_col])
    out: list[list[float]] = []
    for r in cand:
        v = [float(x) for x in r[vec_col]]
        nr = 0.0
        for x in v:
            nr += x * x
        if nr == 0.0:
            continue
        nr = nr ** 0.5
        out.append([_round6(x / nr) for x in v])
        if len(out) == k:
            return out
    if init_ids is not None:
        raise KeyError(
            f"init_ids contain missing or zero-norm rows: got "
            f"{len(out)} valid of {k}")
    return None


def _round6(x: float) -> float:
    """``F.round(col, 6)`` for doubles, driver-side: HALF_UP on the
    shortest decimal representation — the ``BigDecimal.valueOf(double)``
    contract Spark's Round expression applies.  Python ``repr`` produces
    the same shortest round-trip decimal, and ``decimal.ROUND_HALF_UP``
    is Java's HALF_UP (ties away from zero)."""
    from decimal import ROUND_HALF_UP, Decimal
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def _numpy_partials(df: DataFrame, cent: list[list[float]],
                    vec_col: str) -> DataFrame:
    """One Arrow pass over the RAW vectors: BLAS normalize, BLAS argmax
    assignment (ties to the low cid — numpy's first-occurrence, the
    ``ivf_cell_dot`` contract), and per-cell per-batch partial sums —
    ≤ k rows of dim+1 numbers leave each batch, so the driver-side
    combine in ``kmeans_lloyd_spherical`` collects at most
    partitions·k tiny rows (the map-side-combine bound; at extreme
    partition counts, ``coalesce`` the input or use ``method='sql'``).
    NULL and zero-norm rows drop (the ``_normalized`` contract).  The
    numpy normalize differs from the SQL form only in summation
    association (pairwise vs sequential) — sub-ulp drift the per-round
    6-dp centroid rounding clips before it can feed back."""
    import numpy as np
    import pandas as pd

    cent_arr = np.asarray(cent, dtype=np.float64)

    def part(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            keep = norms > 0
            if not keep.any():
                continue
            mat = mat[keep] / norms[keep][:, None]
            cells = (mat @ cent_arr.T).argmax(axis=1)
            out_cells, out_n, out_s = [], [], []
            for c in np.unique(cells):
                sel = mat[cells == c]
                out_cells.append(int(c))
                out_n.append(len(sel))
                out_s.append([float(v) for v in sel.sum(axis=0)])
            yield pd.DataFrame({"_cell": out_cells, "n": out_n,
                                "s": out_s})

    return (df.select(vec_col)
            .mapInPandas(part, "_cell int, n bigint, s array<double>"))


def kmeans_assign(df: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding",
                  cell_col: str = "cell") -> DataFrame:
    """Attach each row's cell under trained centroids — pure codegen
    (``ivf_cell_dot`` over literal centroids), the serving half: feed
    it ``write_*_index``-style into a cell-partitioned store and every
    downstream read prunes by cell (the IVF stored-path pattern)."""
    from openai_vector_search_demo_spark.operators.ann import ivf_cell_dot
    return df.withColumn(cell_col, ivf_cell_dot(vec_col, centroids))
