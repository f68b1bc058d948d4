"""Distributed linear quality classifier: full-batch logistic-regression
training as a DataFrame-native iterative query, plus a pure-codegen
scoring path and a rank-sum (Mann-Whitney) AUC evaluator.

This is the "quality classifier" stage of a large-scale training-data
curation pipeline (the fastText/CCNet pattern: distill a teacher signal —
here the corpus' language labels — into a linear scorer cheap enough to
run over every document).  The reference's ingest pipeline
(`app/app.py:225`, `modules/utilities.py:132-141` in
MaheshSQL/openai-vector-search-demo) stops at rule-based cleansing with
no learned quality signal; this operator family is the trained
counterpart the 100 TB curation story needs.

Design mirrors ``operators.kmeans`` (the engine's other iterative
trainer):

- every GD iteration is ONE column-pruned scan + ONE map-side-combined
  aggregation producing d+1 numbers (d gradient sums + the row count);
  the model state (d weights) lives driver-side as plan literals;
- weights are rounded to 6 dp IN-ENGINE (HALF_UP, both engines) before
  becoming the next iteration's literals, which keeps the engines
  bit-aligned through the feedback loop and lets the DuckDB oracle
  replay training as unrolled CTE chains;
- features are exact-rational statistics (counts and count ratios —
  integer division is IEEE-identical across engines); the only libm
  call is ``exp`` inside the sigmoid, whose sub-ulp cross-engine drift
  is clipped by the 6-dp weight rounding (the measure-zero
  rounding-boundary caveat shared with every BLAS path in this repo).

Scale: training touches the corpus ``iters`` times with a k-bounded
(d+1 numbers per partition) shuffle — no driver-side data, no Python in
the plan; scoring is a single whole-stage-codegen projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.text_analysis import (
    LANG_MARKERS,
    _lang_hits_rx,
)

#: Feature vector (order is the weight order everywhere, including the
#: oracle's CTEs): bias, one whole-token stopword-hit ratio per marker
#: language (code order, ×10 so the separating dimensions are O(1) for
#: the fixed step size), mean word length / 10, token count saturating
#: at 100.  All exact-rational given the token multiset.
FEATURE_NAMES: list[str] = (
    ["bias"]
    + [f"sw_{c}" for c in sorted(LANG_MARKERS)]
    + ["mean_word_len", "len_sat"]
)

N_FEATURES = len(FEATURE_NAMES)

TRAIN_ITERS = 10
TRAIN_LR = 2.0
SPLIT_SEED = 7          # salt of the train/test hash split ('7:<doc_id>')
TRAIN_FRAC = 0.8
#: The distillation teacher: ``quality_score >= TEACHER_CUT`` (the corpus
#: median at the driver fixtures).  quality_score is exact-rational (no
#: libm), so the label is bit-deterministic across engines.
TEACHER_CUT = 0.77


def logreg_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``f0..f{d-1}`` feature columns (see ``FEATURE_NAMES``) and
    the teacher label ``y`` (``quality_score(text) >= TEACHER_CUT``) —
    all codegen'd regexp passes over one shared lowercased column, the
    ``with_text_scores`` discipline (no token arrays, no interpreted
    HOFs, no Python).  The teacher is the engine's own nonlinear quality
    heuristic (saturations + the word-shape band); the linear student
    can approximate but not express its kinks, which is what makes the
    held-out AUC an honest distillation measurement rather than a
    tautology."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        _quality_terms,
    )
    d = df.withColumn("_low", F.lower(F.col(text_col)))
    low = F.col("_low")
    n = F.regexp_count(low, F.lit(r"\S+"))
    total = F.length(F.regexp_replace(low, r"\s+", ""))
    feats: list[Column] = [F.lit(1.0)]
    for code in sorted(LANG_MARKERS):
        feats.append(F.when(n > 0, _lang_hits_rx(low, code) / n)
                     .otherwise(F.lit(0.0)) * F.lit(10.0))
    feats.append(F.when(n > 0, (total / n) / F.lit(10.0))
                 .otherwise(F.lit(0.0)))
    feats.append(F.least(n, F.lit(100)) / F.lit(100.0))
    _, quality = _quality_terms(low, text_col, "en")
    out = d.withColumn(
        "y", (quality >= F.lit(TEACHER_CUT)).cast("double"))
    for j, e in enumerate(feats):
        out = out.withColumn(f"f{j}", e.cast("double"))
    return out.drop("_low")


def _z(weights: list[float]) -> Column:
    """The linear term ``w·x`` as a left-associated chained sum — the
    association the oracle's SQL mirrors term by term, so both engines
    produce the bit-identical double."""
    z: Column = F.lit(float(weights[0])) * F.col("f0")
    for j in range(1, len(weights)):
        z = z + F.lit(float(weights[j])) * F.col(f"f{j}")
    return z


def logreg_prob(weights: list[float]) -> Column:
    """``sigmoid(w·x)`` over the ``f*`` columns, pure codegen."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights)))


def logreg_train_gd(df: DataFrame, label_col: str = "y",
                    iters: int = TRAIN_ITERS,
                    lr: float = TRAIN_LR,
                    d: int = N_FEATURES) -> list[float]:
    """Full-batch gradient descent from ``w = 0``: per iteration, ONE
    aggregation computes every new weight in-engine as
    ``round(w_j − lr · (Σ (σ(w·x) − y)·x_j / n), 6)`` — the rounding
    happens inside the engine (HALF_UP) before the weight becomes the
    next round's literal, the ``kmeans_lloyd_spherical`` determinism
    contract.  The input should be persisted by the caller if it is
    expensive to recompute (``iters`` scans)."""
    w = [0.0] * d
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        sig = logreg_prob(w)
        row = df.agg(
            *[F.round(F.lit(float(w[j]))
                      - F.lit(float(lr))
                      * (F.sum((sig - y) * F.col(f"f{j}"))
                         / F.count(F.lit(1))), 6).alias(f"w{j}")
              for j in range(d)]).collect()[0]
        w = [float(row[f"w{j}"]) for j in range(d)]
    return w


def with_split(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """The classifier's deterministic train/test hash split (salt
    ``SPLIT_SEED``, 80/20) — keyed, so corpus growth never reshuffles
    existing assignments (``functions.hashing.dataset_split``)."""
    from openai_vector_search_demo_spark.functions.hashing import (
        dataset_split,
    )
    return dataset_split(df, key, {"train": TRAIN_FRAC,
                                   "test": 1.0 - TRAIN_FRAC},
                         seed=SPLIT_SEED)


def auc_frame(scored: DataFrame, score_col: str = "prob",
              label_col: str = "y") -> DataFrame:
    """Rank-sum AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻) over the
    6-dp-rounded scores, computed from per-distinct-score counts:

        AUC = Σ_s  pos(s) · (neg_below(s) + ½·neg(s))  /  (P · N)

    The cumulative window runs over DISTINCT 6-dp scores — a relation
    bounded by 10⁶+1 rows whatever the corpus size, so the unpartitioned
    window is scale-safe by construction.  Every term is an integer or
    an exact binary half, so the sum is order-independent and the AUC is
    bit-identical across engines.  Returns one row:
    ``(n_test, n_pos, n_neg, auc)`` with auc 6-dp rounded (0.5 when the
    test split is single-class)."""
    y = F.col(label_col).cast("double")
    per = (scored
           .select(F.round(F.col(score_col), 6).alias("s"), y.alias("y"))
           .groupBy("s")
           .agg(F.sum("y").alias("pos"),
                (F.count(F.lit(1)) - F.sum("y")).alias("neg")))
    w = (Window.orderBy("s")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = per.withColumn("neg_below",
                         F.coalesce(F.sum("neg").over(w), F.lit(0.0)))
    return (cum.agg(
        (F.sum("pos") + F.sum("neg")).cast("long").alias("n_test"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.round(
            F.when((F.sum("pos") > 0) & (F.sum("neg") > 0),
                   F.sum(F.col("pos") * (F.col("neg_below")
                                         + F.lit(0.5) * F.col("neg")))
                   / (F.sum("pos") * F.sum("neg")))
            .otherwise(F.lit(0.5)), 6).alias("auc")))
