"""Scalar quantization (SQ8): per-dimension uint8 codes + ADC + refine.

The middle rung of the engine's compression ladder — between the 8-byte
binary signature (``operators/hamming.py``, 62 bits/vector, needs a refine
to be useful) and trained PQ (``operators/pq.py``, 12 bytes + offline
codebooks): SQ8 stores ONE BYTE PER DIMENSION (dim-64 → 64 B/vector, 4×
smaller than fp32) with a training step that is just a per-dimension
min/max scan — no k-means, no codebooks, exact relational algebra, so the
DuckDB oracle retrains it and value-checks every code and every ADC score
(the property PQ cannot offer; its trainer is pinned literals instead).

Method (FAISS ``IndexScalarQuantizer`` QT_8bit, public docs):

- train:   per-dim ``mn_j = min(x_j)``, ``mx_j = max(x_j)`` over the corpus
- encode:  ``code_j = clamp(floor((x_j - mn_j) / (mx_j - mn_j) * 256), 0, 255)``
           (degenerate dims ``mx == mn`` encode 0)
- decode:  ``x̂_j = mn_j + (code_j + 0.5) * (mx_j - mn_j) / 256``
           (bucket midpoint — the standard reconstruction)
- search:  asymmetric distance (ADC): exact cosine between the fp32 QUERY
           and the DECODED corpus vector; top-R shortlist → exact-fp32
           cosine refine → top-k (the ``IndexRefine`` pattern the hamming
           and PQ families already use).

Scale posture (100 TB): training is one min/max aggregate (64 cells of
state per executor, one 64-row collect — the same bounded-collect class as
the k-means k-row partials); encoding is write-time codegen; the
query-time scan reads dim bytes/row and does one fused
decode-multiply-add chain per row — whole-stage codegen in the SQL path,
one Arrow/BLAS pass in the numpy path — and the corpus never shuffles:
both ranks are ``TakeOrderedAndProject`` (R rows, then k rows).  The
stored variant persists the code table and touches fp32 vectors only for
the R refine point-reads.

Determinism contract (the ANN-family rule, ``ann.py`` module docstring):
train/encode/decode are single IEEE-double operations in a fixed order —
no accumulation — so codes are bit-identical across engines; ADC sums
follow the ``vectors.dot_product`` sequential-fold order that
``list_aggregate(…, 'sum')`` mirrors, and every rank orders by the
6-dp-rounded score with an id tie-break, so shortlist and final top-k are
reproducible in DuckDB for the correctness gate.

Reference: the HNSW index at modules/utilities.py:272-278 in
MaheshSQL/openai-vector-search-demo is the role model (approximate vector
serving); SQ8 is its zero-training, byte-per-dim Spark-native substitute.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.vectors import (
    cosine_similarity,
    vector_lit,
)

SQ8_LEVELS = 256

SQ8_AUTO_NUMPY_MIN_OPS = 512
"""``method='auto'`` crossover, the ``HAMMING_AUTO_NUMPY_MIN_OPS`` twin:
the SQL path pays ~5 interpreted HOF ops per dimension per row (decode +
multiply-add for ADC), so dim-64 sits far past the few-hundred-op
crossover measured for the LSH/hamming families and auto routes to the
fused Arrow/BLAS pass everywhere except toy dims."""


def sq8_train(df: DataFrame, vec_col: str = "embedding",
              dim: int | None = None) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, maxs) over the corpus — the whole SQ8
    'training' step.  One posexplode + 64-group aggregate; the collect is
    dim rows (bounded by the embedding width, never by the corpus)."""
    if dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(row["d"])
    rows = (df.filter(F.col(vec_col).isNotNull())
            .select(F.posexplode(F.col(vec_col)).alias("j", "x"))
            .groupBy("j")
            .agg(F.min(F.col("x").cast("double")).alias("mn"),
                 F.max(F.col("x").cast("double")).alias("mx"))
            .orderBy("j").collect())
    if len(rows) != dim:
        raise ValueError(f"sq8_train: expected {dim} dims, got {len(rows)}")
    return ([float(r["mn"]) for r in rows], [float(r["mx"]) for r in rows])


def _code_expr(x, mn, mx):
    """One dimension's encoder — single IEEE ops, no accumulation, so the
    code is bit-identical in DuckDB's mirror expression."""
    span = mx - mn
    raw = F.floor((x.cast("double") - mn) / span * F.lit(float(SQ8_LEVELS)))
    return (F.when(span == 0, F.lit(0))
            .otherwise(F.least(F.lit(SQ8_LEVELS - 1),
                               F.greatest(F.lit(0), raw)))
            .cast("int"))


def sq8_encode(df: DataFrame, mins: Sequence[float], maxs: Sequence[float],
               vec_col: str = "embedding",
               code_col: str = "codes") -> DataFrame:
    """Write-time encoding: array<int> of per-dim uint8 codes (stored as
    int for parquet/oracle friendliness; the byte budget claim is about
    the serving scan, which reads the code column only).  NULL vectors
    drop (the LSH convention)."""
    mn = vector_lit(mins)
    mx = vector_lit(maxs)
    idx = F.transform(F.col(vec_col),
                      lambda x, i: _code_expr(
                          x, F.element_at(mn, i + 1),
                          F.element_at(mx, i + 1)))
    return (df.filter(F.col(vec_col).isNotNull())
            .withColumn(code_col, idx))


def _decoded_adc(code_col: str, qvec: Sequence[float],
                 mins: Sequence[float], maxs: Sequence[float]):
    """ADC column: cosine(q, decode(codes)) with the decode inlined —
    sequential fold over dims, the ``dot_product`` order the oracle's
    ``list_aggregate`` mirrors."""
    mn = vector_lit(mins)
    mx = vector_lit(maxs)
    q = vector_lit(qvec)
    dec = F.transform(
        F.col(code_col),
        lambda c, i: F.element_at(mn, i + 1)
        + (c.cast("double") + F.lit(0.5))
        * (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
        / F.lit(float(SQ8_LEVELS)))
    return cosine_similarity(dec, q)


def sq8_knn(df: DataFrame, qvec: Sequence[float],
            mins: Sequence[float] | None = None,
            maxs: Sequence[float] | None = None,
            k: int = 10, shortlist: int = 50,
            vec_col: str = "embedding", sim_col: str = "similarity",
            tie_break: str = "vec_id", method: str = "auto",
            refine: bool = True) -> DataFrame:
    """Top-k by SQ8-ADC shortlist (size R=``shortlist``, ordered by the
    6-dp-rounded ADC score, ties by ``tie_break`` asc) + exact fp32
    cosine refine.  ``refine=False`` returns the ADC-only top-k (the
    recall-measurement path — the honest quantization-error number).
    ``mins``/``maxs`` default to training on ``df`` itself."""
    if method not in ("auto", "sql", "numpy"):
        raise ValueError(f"method must be auto|sql|numpy, got {method!r}")
    dim = len(list(qvec))
    if mins is None or maxs is None:
        mins, maxs = sq8_train(df, vec_col=vec_col, dim=dim)
    if method == "auto":
        method = "numpy" if 5 * dim >= SQ8_AUTO_NUMPY_MIN_OPS else "sql"
    if method == "numpy":
        scored = _sq8_score_numpy(df, qvec, mins, maxs, vec_col)
    else:
        scored = (sq8_encode(df, mins, maxs, vec_col=vec_col,
                             code_col="_codes")
                  .withColumn("_adc", _decoded_adc("_codes", qvec,
                                                   mins, maxs))
                  .drop("_codes"))
    short = (scored
             .orderBy(F.round(F.col("_adc"), 6).desc(),
                      F.col(tie_break).asc())
             .limit(shortlist))
    if not refine:
        return (short.withColumn(sim_col, F.round(F.col("_adc"), 6))
                .orderBy(F.col(sim_col).desc(), F.col(tie_break).asc())
                .limit(k).drop("_adc"))
    refined = short.withColumn(
        sim_col, cosine_similarity(F.col(vec_col), vector_lit(qvec)))
    return (refined.orderBy(F.col(sim_col).desc(), F.col(tie_break).asc())
            .limit(k).drop("_adc"))


def _sq8_score_numpy(df: DataFrame, qvec: Sequence[float],
                     mins: Sequence[float], maxs: Sequence[float],
                     vec_col: str) -> DataFrame:
    """Fused encode+decode+ADC in one Arrow/BLAS pass — identical codes
    (integer arithmetic on the same doubles); the cosine accumulates in
    BLAS order, within float rounding of the SQL fold (the 6-dp rank
    rounding absorbs it, same contract as the LSH/hamming numpy paths)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.types import DoubleType, StructField, StructType

    mn = np.asarray(list(mins), dtype=np.float64)
    mx = np.asarray(list(maxs), dtype=np.float64)
    span = mx - mn
    safe = np.where(span == 0.0, 1.0, span)
    q = np.asarray(list(qvec), dtype=np.float64)
    qn = float(np.sqrt(q @ q))
    out_schema = StructType(list(df.schema.fields)
                            + [StructField("_adc", DoubleType())])

    def score(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.floor((mat - mn) / safe * SQ8_LEVELS)
            codes = np.clip(codes, 0, SQ8_LEVELS - 1)
            codes[:, span == 0.0] = 0
            dec = mn + (codes + 0.5) * span / SQ8_LEVELS
            nrm = np.sqrt((dec * dec).sum(axis=1)) * qn
            pdf = pdf.copy()
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = np.where(nrm == 0.0, 0.0, (dec @ q) / nrm)
            pdf["_adc"] = sim
            yield pdf

    return df.mapInPandas(score, out_schema)


def write_sq8_index(df: DataFrame, path: str,
                    mins: Sequence[float], maxs: Sequence[float],
                    vec_col: str = "embedding",
                    keep_cols: list[str] | None = None) -> None:
    """Persist the serving artifact: the code table (dim bytes of payload
    per row + ids).  The fp32 corpus is NOT stored here — the refine
    stage point-reads it from the source table, which is the byte-budget
    point of the tier."""
    keep = keep_cols if keep_cols is not None else ["vec_id", "label"]
    (sq8_encode(df, mins, maxs, vec_col=vec_col, code_col="codes")
     .select(*keep, "codes")
     .coalesce(1)
     .write.mode("overwrite").parquet(path))


def sq8_stored_knn(spark, path: str, source: DataFrame,
                   qvec: Sequence[float],
                   mins: Sequence[float], maxs: Sequence[float],
                   k: int = 10, shortlist: int = 50,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   sim_col: str = "similarity") -> DataFrame:
    """Serving read of a ``write_sq8_index`` store: scan CODES ONLY
    (dim bytes/row — the fp32 column never appears in the scan schema),
    rank by ADC, then join the R-row shortlist back to the fp32 source
    for the exact refine — R point-reads, broadcast by size."""
    codes = spark.read.parquet(path)
    scored = codes.withColumn("_adc",
                              _decoded_adc("codes", qvec, mins, maxs))
    short = (scored
             .orderBy(F.round(F.col("_adc"), 6).desc(),
                      F.col(id_col).asc())
             .limit(shortlist)
             .select(id_col))
    refined = (source.join(F.broadcast(short), id_col)
               .withColumn(sim_col,
                           cosine_similarity(F.col(vec_col),
                                             vector_lit(qvec))))
    return (refined.orderBy(F.col(sim_col).desc(), F.col(id_col).asc())
            .limit(k))
