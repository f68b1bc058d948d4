"""Approximate nearest-neighbor search — the 100 TB path for Q2.

The reference's HNSW index (modules/utilities.py:272-278) has no Spark
analog; the scalable substitutes here are the two standard shared-nothing
ANN layouts:

- **LSH (random hyperplanes)** — ``nbits`` sign bits of projections onto
  fixed random hyperplanes form a bucket id.  At write time the bucket is a
  stored column (cheap: nbits dot products per row, all codegen); at query
  time only rows whose bucket is within Hamming distance ``probe_hamming``
  of the query's bucket are scored exactly.  Pruning is data-independent,
  so the scan prunes to candidate buckets *before* any vector math.
- **IVF (inverted file)** — k-means centroids partition the corpus; each row
  stores its nearest-centroid id.  A query scores only the ``nprobe``
  nearest cells.  Centroids train offline (here: seeded numpy k-means on a
  driver-side sample — at corpus scale you train once on a sample and
  broadcast; the per-row assignment stays a distributed map).

Determinism contract: hyperplanes/centroids derive from a fixed seed and are
inlined as plan literals, so the full approximate search — bucket assignment,
probe set, final exact scoring — is bit-reproducible in DuckDB SQL for the
correctness gate (`queries.py` builds the mirrored oracle from the same
Python arrays).  Recall is a measured property (tests assert it on the
fixtures), never silently assumed.
"""

from __future__ import annotations

from collections.abc import Sequence
from itertools import combinations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.caching import scoped_persist
from openai_vector_search_demo_spark.functions.vectors import (
    cosine_similarity,
    vector_lit,
)


def _check_choice(param: str, value: str, allowed: tuple[str, ...]) -> None:
    """Raise on unknown enum-like arguments instead of silently falling
    back — metric='cosine' must not quietly run Euclidean assignment and
    degrade recall (the semdedup convention, applied family-wide)."""
    if value not in allowed:
        raise ValueError(
            f"{param}={value!r}: expected one of {list(allowed)}")


# ---------------------------------------------------------------------------
# LSH — random hyperplanes
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Fixed random hyperplanes (standard normal), bit-stable via seeded
    numpy; rounded to 6 dp so SQL literals round-trip exactly."""
    rng = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in rng.randn(dim)] for _ in range(nbits)]


def _dot_lit(vec_col: Column | str, plane: Sequence[float]) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.aggregate(
        F.zip_with(F.transform(c, lambda x: x.cast("double")),
                   vector_lit(plane), lambda x, y: x * y),
        F.lit(0.0), lambda s, x: s + x)


def lsh_bucket(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit b set iff dot(vec, plane_b) >= 0.

    NULL vectors get a NULL bucket (each sign term leaves NULL
    unmatched instead of defaulting to 0), so downstream probe filters
    drop them — the same contract as ``ivf_cell``; a plain
    ``otherwise(0)`` would silently file every NULL embedding under
    bucket 0."""
    out = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        d = _dot_lit(vec_col, plane)
        out = out + (F.when(d >= 0, F.lit(1 << b).cast("long"))
                     .when(d < 0, F.lit(0).cast("long")))
    return out


def query_buckets(qvec: Sequence[float], planes: list[list[float]],
                  probe_hamming: int = 1) -> list[int]:
    """The query's bucket plus all buckets within Hamming ≤ probe_hamming
    (multi-probe: recall against boundary effects without more tables)."""
    q = np.asarray(qvec, dtype=np.float64)
    base = 0
    for b, plane in enumerate(planes):
        if float(q @ np.asarray(plane)) >= 0:
            base |= 1 << b
    nbits = len(planes)
    out = [base]
    for d in range(1, probe_hamming + 1):
        for bits in combinations(range(nbits), d):
            flip = base
            for b in bits:
                flip ^= 1 << b
            out.append(flip)
    return sorted(out)


LSH_AUTO_NUMPY_MIN_OPS = 512
"""``method='auto'`` crossover for the inline LSH search, the
``IVF_AUTO_NUMPY_MIN_OPS`` twin: per-row bucket assignment costs
nbits·dim multiply-adds as interpreted HOF lambdas — once that product
reaches a few hundred the fused Arrow/BLAS pass wins (measured at sf0.1,
nbits=8 × dim 64: 1.07 s expression vs ~0.45 s numpy)."""


def lsh_knn(df: DataFrame, qvec: Sequence[float], k: int = 10,
            vec_col: str = "embedding", planes: list[list[float]] | None = None,
            nbits: int = 16, seed: int = 42, probe_hamming: int = 1,
            sim_col: str = "similarity", tie_break: str | None = None,
            method: str = "auto") -> DataFrame:
    """Approximate KNN: prune to probed buckets, then exact cosine top-k.

    At scale the bucket is precomputed at write time (``lsh_assign``) and
    this becomes a partition-pruned scan + small exact top-k; computed
    inline here so the operator also works on raw tables.

    ``method``: ``'sql'`` assigns buckets with expression arithmetic
    (DuckDB-mirrorable), ``'numpy'`` fuses sign-bit assignment + probe
    filter + query cosine into one Arrow/BLAS pass, ``'auto'`` picks by
    ``nbits·dim`` (``LSH_AUTO_NUMPY_MIN_OPS``).  Identical results — a
    physical choice only (a sign flip would need a hyperplane dot within
    float rounding of exactly 0; the oracled slot pins it never happens
    on the fixtures).
    """
    _check_choice("method", method, ("auto", "sql", "numpy"))
    dim = len(list(qvec))
    planes = planes or hyperplanes(dim, nbits, seed)
    probes = query_buckets(qvec, planes, probe_hamming)
    if method == "auto":
        method = ("numpy" if len(planes) * dim >= LSH_AUTO_NUMPY_MIN_OPS
                  else "sql")
    if method == "numpy":
        scored = _lsh_score_numpy(df, qvec, planes, set(probes),
                                  vec_col, sim_col)
    else:
        cand = df.withColumn("_bucket", lsh_bucket(vec_col, planes)) \
                 .filter(F.col("_bucket").isin(probes))
        scored = cand.withColumn(
            sim_col, cosine_similarity(F.col(vec_col), vector_lit(qvec))) \
            .drop("_bucket")
    order = [F.col(sim_col).desc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    return scored.orderBy(*order).limit(k)


def _lsh_score_numpy(df: DataFrame, qvec: Sequence[float],
                     planes: list[list[float]], probes: set[int],
                     vec_col: str, sim_col: str) -> DataFrame:
    """One Arrow pass: BLAS sign-bit bucket, probe filter, query cosine —
    rows outside the probed buckets never cross back into the JVM (the
    ``_ivf_score_numpy`` twin)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(list(df.schema.fields)
                            + [StructField(sim_col, DoubleType())])
    pl = np.asarray(planes, dtype=np.float64)          # nbits × dim
    weights = (1 << np.arange(len(planes))).astype(np.int64)
    q = np.asarray(list(qvec), dtype=np.float64)
    # zero-query guard: the sql path's cosine_similarity returns 0.0 for
    # zero vectors; an unguarded 0/0 here would NaN-rank rows FIRST and
    # break the 'identical results, physical choice only' contract
    qn = np.linalg.norm(q) or 1.0
    probe_arr = np.asarray(sorted(probes), dtype=np.int64)

    def score(batches):
        for pdf in batches:
            # NULL embeddings: drop, mirroring the sql path (lsh_bucket
            # yields NULL there and the probe isin filter removes the row)
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (mat @ pl.T) >= 0.0
            bucket = bits @ weights
            mask = np.isin(bucket, probe_arr)
            if not mask.any():
                continue
            kept = pdf.loc[mask].copy()
            sub = mat[mask]
            norms = np.linalg.norm(sub, axis=1)
            norms[norms == 0] = 1.0
            kept[sim_col] = (sub @ q) / (norms * qn)
            yield kept

    return df.mapInPandas(score, out_schema)


def lsh_assign(df: DataFrame, vec_col: str = "embedding",
               planes: list[list[float]] | None = None,
               nbits: int = 16, seed: int = 42,
               bucket_col: str = "bucket",
               dim: int | None = None) -> DataFrame:
    """Write-time bucket assignment — persist (and partition/bucket by) this
    column so query-time pruning is a metadata operation.

    Pass ``planes`` or ``dim`` and plan construction stays job-free; the
    write path always knows the embedding width (it is the model registry's
    ``dim`` — E4), so the ``first()`` probe is a last-resort fallback for
    ad-hoc tables, not something a pipeline should ever pay."""
    if planes is None:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        planes = hyperplanes(dim, nbits, seed)
    return df.withColumn(bucket_col, lsh_bucket(vec_col, planes))


LSH_TARGET_BUCKET_ROWS = 64   # adaptive-nbits sizing: expected rows/bucket
LSH_MIN_BITS, LSH_MAX_BITS = 8, 24


def adaptive_nbits(n_rows: int,
                   target_bucket_rows: int = LSH_TARGET_BUCKET_ROWS) -> int:
    """Bucket-count sizing: enough sign bits that the EXPECTED bucket
    occupancy is ~``target_bucket_rows``.  With nbits fixed (the r1 defect)
    bucket count is constant, so within-bucket pair counts — the join
    output — grow QUADRATICALLY with the corpus; scaling buckets with n
    keeps occupancy flat and candidate volume ~linear (n·target/2 pairs).
    Clamped to [8, 24] bits (256 … 16M buckets)."""
    import math
    need = max(1, -(-n_rows // max(target_bucket_rows, 1)))  # ceil division
    return min(LSH_MAX_BITS, max(LSH_MIN_BITS, math.ceil(math.log2(need))))


def lsh_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding", threshold: float = 0.9,
                       planes: list[list[float]] | None = None,
                       nbits: int | None = None, seed: int = 42,
                       max_bucket_rows: int | None = None,
                       cache: bool = True,
                       dim: int | None = None,
                       n_rows: int | None = None) -> DataFrame:
    """Embedding near-dup with an LSH-bucket prefilter: candidate pairs share
    a bucket (equi-join — replaces dedup.embedding_near_dup's all-pairs
    product), then exact cosine verification.  High-cosine pairs land in the
    same bucket with probability (1 - θ/π)^nbits; recall is tested, and the
    bucket join semantics are mirrored exactly in the oracle.

    Scale knobs:

    - ``nbits=None`` (default) sizes the bucket key from the corpus via
      ``adaptive_nbits(df.count())`` — more data, more buckets, flat
      occupancy.  Pass ``nbits``/``planes`` explicitly for pinned layouts
      (the oracled query does, for bit-reproducibility).
    - ``max_bucket_rows``: hard cap per bucket — hot buckets (skewed data
      direction, near-zero vectors) otherwise still go quadratic.  Keeps
      the ``max_bucket_rows`` lowest-id rows per bucket (deterministic) and
      drops the rest from candidate generation: an explicit recall trade,
      off by default.
    - ``dim`` / ``n_rows``: plan-build metadata.  Without them the operator
      probes the table (one ``first()`` for the width, one ``count()`` for
      adaptive sizing) — two extra jobs, and the count is a full scan at
      100 TB.  A write path knows both (model dim, table row count from the
      catalog/last maintenance pass); pass them and plan construction is
      job-free.  Probing remains the ad-hoc fallback only.
    """
    if planes is None:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        if nbits is None:
            nbits = adaptive_nbits(n_rows if n_rows is not None else df.count())
        planes = hyperplanes(dim, nbits, seed)
    # persist: both join branches reuse the bucket assignment (nbits dot
    # products per row) — uncached it is computed twice.  Same cache
    # lifecycle convention as operators.dedup: pass cache=False in
    # long-lived sessions and evict with spark.catalog.clearCache().
    with_b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")) \
               .withColumn("b", lsh_bucket("v", planes))
    if max_bucket_rows is not None:
        from pyspark.sql import Window
        w = Window.partitionBy("b").orderBy(F.col("id").asc())
        with_b = (with_b.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= max_bucket_rows).drop("_rn"))
    if cache:
        with_b = scoped_persist(with_b)
    a = with_b.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "b")
    b = with_b.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "b")
    cand = a.join(b, "b").filter(F.col("id_a") < F.col("id_b"))
    return (cand.withColumn("cos", cosine_similarity("v_a", "v_b"))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cosine")))


# ---------------------------------------------------------------------------
# IVF — inverted file over k-means centroids
# ---------------------------------------------------------------------------

def train_centroids(vectors: np.ndarray, nlist: int, seed: int = 42,
                    iters: int = 10) -> list[list[float]]:
    """Seeded Lloyd k-means (offline training step).  Deterministic:
    init = first-k of a seeded permutation; fixed iteration count; empty
    cells keep their previous centroid.  Rounded to 6 dp for SQL literal
    round-trip."""
    rng = np.random.RandomState(seed)
    x = np.asarray(vectors, dtype=np.float64)
    nlist = min(nlist, len(x))  # fewer vectors than cells: one cell per vector
    cent = x[rng.permutation(len(x))[:nlist]].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(nlist):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return [[round(float(v), 6) for v in row] for row in cent]


def train_centroids_spherical(vectors: np.ndarray, nlist: int,
                              seed: int = 42, iters: int = 25) -> list[list[float]]:
    """Seeded SPHERICAL k-means — the correct coarse quantizer for cosine
    search: vectors are unit-normalized, assignment is argmax dot (equal to
    argmax cosine), and cell means are re-projected onto the unit sphere.
    With unit centroids, per-row assignment needs no normalization at all
    (``argmax_c dot(x, c)`` is invariant to ``|x|``), so the write-time
    assignment column stays pure multiply-add arithmetic.

    Euclidean k-means (``train_centroids``) mixes direction with magnitude
    and measurably under-recalls on cosine workloads: at the final
    leakage-free nprobe=24/nlist=64 configuration the spherical quantizer
    reaches mean recall@10 = 0.845 at ~38% scan where Euclidean sits
    ~0.25 lower at the same scan fraction (QUERIES.md
    `ann_ivf_trained_recall_at_10`; full nprobe→recall curve in SCALE.md).  Deterministic like the Euclidean
    trainer: seeded-permutation init, fixed iteration count, empty cells
    keep their previous centroid; rounded to 6 dp for SQL literal
    round-trip."""
    x = np.asarray(vectors, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    xn = x / norms
    rng = np.random.RandomState(seed)
    nlist = min(nlist, len(xn))
    cent = xn[rng.permutation(len(xn))[:nlist]].copy()
    for _ in range(iters):
        assign = (xn @ cent.T).argmax(axis=1)
        for c in range(nlist):
            members = xn[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return [[round(float(v), 6) for v in row] for row in cent]


def _sq_dist_lit(vec_col: Column | str, center: Sequence[float]) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.aggregate(
        F.zip_with(F.transform(c, lambda x: x.cast("double")),
                   vector_lit(center), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda s, x: s + x)


def ivf_cell(vec_col: Column | str, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id (first index at the min — ties break low, same
    scan order as the SQL oracle's list_position-of-min)."""
    dists = F.array(*[_sq_dist_lit(vec_col, c) for c in centroids])
    return F.array_position(dists, F.array_min(dists)).cast("int") - 1


def _dot_cell_lit(vec_col: Column | str, center: Sequence[float]) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.aggregate(
        F.zip_with(F.transform(c, lambda x: x.cast("double")),
                   vector_lit(center), lambda x, y: x * y),
        F.lit(0.0), lambda s, x: s + x)


def ivf_cell_dot(vec_col: Column | str, centroids: list[list[float]]) -> Column:
    """Spherical-quantizer cell id: argmax of dot(vec, centroid) — with
    UNIT-NORM centroids (``train_centroids_spherical``) this equals the
    argmax-cosine cell without normalizing the row vector (|x| is constant
    across candidates).  Ties break low, mirroring the SQL oracle's
    min-cid-at-max scan."""
    dots = F.array(*[_dot_cell_lit(vec_col, c) for c in centroids])
    return F.array_position(dots, F.array_max(dots)).cast("int") - 1


def ivf_probe_cells(qvec: Sequence[float], centroids: list[list[float]],
                    nprobe: int) -> list[int]:
    q = np.asarray(qvec, dtype=np.float64)
    cent = np.asarray(centroids, dtype=np.float64)
    d = ((cent - q) ** 2).sum(axis=1)
    return sorted(int(i) for i in np.argsort(d, kind="stable")[:nprobe])


def ivf_probe_cells_dot(qvec: Sequence[float], centroids: list[list[float]],
                        nprobe: int) -> list[int]:
    """Probe set for the spherical quantizer: the ``nprobe`` cells with the
    LARGEST dot(q, centroid) (== largest cosine for unit centroids); ties
    break on low cid (stable argsort of -dot)."""
    q = np.asarray(qvec, dtype=np.float64)
    cent = np.asarray(centroids, dtype=np.float64)
    return sorted(int(i) for i in np.argsort(-(cent @ q), kind="stable")[:nprobe])


IVF_TRAIN_CAP = 100_000  # max vectors ever collected for centroid training


IVF_AUTO_NUMPY_MIN_OPS = 512
"""``method='auto'`` crossover for the inline IVF search: assignment cost
per row is nlist·dim multiply-adds — as interpreted higher-order-function
lambdas (Spark does not codegen lambda bodies) that is ~20× slower than
one Arrow-batched BLAS pass once nlist·dim reaches a few hundred
(measured at sf0.1: 16 cells × dim 64 → 2.34 s expression vs 0.5 s
numpy).  Below the threshold the expression form avoids the Python
boundary entirely."""


def ivf_knn(df: DataFrame, qvec: Sequence[float], k: int = 10,
            vec_col: str = "embedding",
            centroids: list[list[float]] | None = None,
            nlist: int = 16, nprobe: int = 4, seed: int = 42,
            train_fraction: float | None = None,
            n_rows: int | None = None,
            sim_col: str = "similarity", tie_break: str | None = None,
            method: str = "auto", metric: str = "l2") -> DataFrame:
    """IVF approximate KNN: score only rows in the nprobe nearest cells.

    ``metric``: ``'l2'`` — Euclidean nearest-centroid assignment/probing
    (``train_centroids``); ``'dot'`` — spherical quantizer (argmax dot
    against unit centroids from ``train_centroids_spherical``), the correct
    layout for cosine search and measurably higher recall on it.

    ``centroids=None`` trains on a bounded driver-side SAMPLE of ``vec_col``:
    ``sample(train_fraction).limit(IVF_TRAIN_CAP)`` — never an unbounded
    collect of the table.  ``train_fraction=None`` picks a fraction from a
    count (or ``n_rows`` when the caller already knows it — no job) so the
    expected sample is ~IVF_TRAIN_CAP rows.  k-means only needs a
    representative sample, not the corpus; production trains once offline
    and passes ``centroids``, keeping the operator a pure distributed
    map + top-k.

    ``method``: ``'sql'`` assigns cells with expression arithmetic
    (DuckDB-mirrorable, interpreted-lambda speed), ``'numpy'`` fuses
    assignment + query scoring into one Arrow/BLAS pass, ``'auto'`` picks
    by ``nlist·dim`` (``IVF_AUTO_NUMPY_MIN_OPS``).  Identical results —
    a physical choice only, like ``knn(method=...)``.
    """
    _check_choice("method", method, ("auto", "sql", "numpy"))
    _check_choice("metric", metric, ("l2", "dot"))
    if centroids is None:
        vecs = df.select(vec_col)
        if train_fraction is None:
            n = n_rows if n_rows is not None else vecs.count()
            train_fraction = min(1.0, IVF_TRAIN_CAP / max(n, 1))
        if train_fraction < 1.0:
            vecs = vecs.sample(fraction=train_fraction, seed=seed)
        sample = np.array(
            [r[0] for r in vecs.limit(IVF_TRAIN_CAP).collect()],
            dtype=np.float64)
        centroids = (train_centroids_spherical(sample, nlist, seed)
                     if metric == "dot" else
                     train_centroids(sample, nlist, seed))
    probe_fn = ivf_probe_cells_dot if metric == "dot" else ivf_probe_cells
    probes = probe_fn(qvec, centroids, nprobe)
    if method == "auto":
        method = ("numpy"
                  if len(centroids) * len(centroids[0])
                  >= IVF_AUTO_NUMPY_MIN_OPS else "sql")
    if method == "numpy":
        scored = _ivf_score_numpy(df, qvec, centroids, set(probes),
                                  vec_col, sim_col, metric=metric)
    else:
        cell_expr = (ivf_cell_dot(vec_col, centroids) if metric == "dot"
                     else ivf_cell(vec_col, centroids))
        cand = df.filter(F.col(vec_col).isNotNull()) \
                 .withColumn("_cell", cell_expr) \
                 .filter(F.col("_cell").isin(probes))
        scored = cand.withColumn(sim_col, cosine_similarity(
            F.col(vec_col), vector_lit(qvec))).drop("_cell")
    order = [F.col(sim_col).desc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    return scored.orderBy(*order).limit(k)


def _ivf_score_numpy(df: DataFrame, qvec: Sequence[float],
                     centroids: list[list[float]], probes: set[int],
                     vec_col: str, sim_col: str,
                     metric: str = "l2") -> DataFrame:
    """One Arrow pass: BLAS cell assignment, probe filter, query cosine —
    rows outside the probed cells never cross back into the JVM."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(list(df.schema.fields)
                            + [StructField(sim_col, DoubleType())])
    cent = np.asarray(centroids, dtype=np.float64)
    csq = (cent * cent).sum(axis=1)
    q = np.asarray(list(qvec), dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0  # zero-query guard, same as the LSH twin
    probe_arr = np.asarray(sorted(probes), dtype=np.int64)

    def score(batches):
        for pdf in batches:
            # NULL embeddings: drop, mirroring the 'sql' path where
            # ivf_cell yields NULL and the probe isin filter removes the
            # row — without this np.array() raises on ragged input and
            # method='auto' would change behavior, not just the plan
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            xc = mat @ cent.T
            if metric == "dot":
                cell = xc.argmax(axis=1)
            else:
                d2 = (mat * mat).sum(axis=1)[:, None] - 2.0 * xc + csq[None, :]
                cell = d2.argmin(axis=1)
            mask = np.isin(cell, probe_arr)
            if not mask.any():
                continue
            kept = pdf.loc[mask].copy()
            sub = mat[mask]
            norms = np.linalg.norm(sub, axis=1)
            norms[norms == 0] = 1.0
            kept[sim_col] = (sub @ q) / (norms * qn)
            yield kept

    return df.mapInPandas(score, out_schema)


def ivf_assign(df: DataFrame, vec_col: str = "embedding",
               centroids: list[list[float]] | None = None,
               nlist: int = 16, seed: int = 42,
               cell_col: str = "cell",
               n_rows: int | None = None,
               metric: str = "l2") -> DataFrame:
    """Write-time IVF cell assignment — the coarse-quantizer twin of
    ``lsh_assign``.  Persist partitioned/bucketed by this column and a
    query's ``nprobe`` cells become partition pruning: the scan reads
    ``nprobe/nlist`` of the corpus from the file listing down.
    ``centroids=None`` trains on a bounded sample exactly like ivf_knn;
    pass ``n_rows`` (the write path knows it) to skip the sizing count."""
    _check_choice("metric", metric, ("l2", "dot"))
    if centroids is None:
        vecs = df.select(vec_col)
        n = n_rows if n_rows is not None else vecs.count()
        fraction = min(1.0, IVF_TRAIN_CAP / max(n, 1))
        if fraction < 1.0:
            vecs = vecs.sample(fraction=fraction, seed=seed)
        sample = np.array([r[0] for r in vecs.limit(IVF_TRAIN_CAP).collect()],
                          dtype=np.float64)
        centroids = (train_centroids_spherical(sample, nlist, seed)
                     if metric == "dot" else
                     train_centroids(sample, nlist, seed))
    cell_expr = (ivf_cell_dot(vec_col, centroids) if metric == "dot"
                 else ivf_cell(vec_col, centroids))
    return df.withColumn(cell_col, cell_expr)
