"""Hard-negative mining — contrastive-training data prep.

The step between retrieval serving and embedding-model TRAINING: a
bi-encoder fine-tune (DPR, Karpukhin et al. EMNLP 2020; Sentence-BERT,
Reimers & Gurevych EMNLP 2019) needs, per anchor, negatives that are
*similar under the current model but wrong* — random negatives are too
easy and the model stops learning; near-duplicates of the positive are
label noise.  This operator mines, for each anchor query, the top-k
most-cosine-similar corpus rows whose label differs from the anchor's
(optionally windowed to a similarity band to drop both trivially-easy
and suspiciously-identical candidates — the FaceNet "semi-hard" region,
Schroff et al. CVPR 2015).

Plan shape (the ``_mean_recall_harness`` pattern): anchors are FEW and
broadcast as plan literals — one Arrow/BLAS pass over the corpus emits
(qid, vec_id, label, sim) for every (anchor, candidate) pair that
survives the label/band filters, then one rank window per anchor keeps
the top-k.  Nothing is collected but the anchor vectors; the corpus
never shuffles (the window's exchange moves candidate rows already cut
to the filter's survivors — at a selective band this is a small
fraction of the scan).

100 TB posture: brute-force scoring per anchor batch is the exact,
restartable default (one scan per batch of ~thousands of anchors, all
scored in one pass); when the anchor set is huge, route candidate
generation through a stored ANN shortlist first (``hamming_stored_knn``
/ ``ivfpq_stored_knn``) and exact-rerank only survivors — same output
contract, scan ∝ index bytes.

Reference: MaheshSQL/openai-vector-search-demo has no training loop at
all (serving only, app/app.py); this is part of the engine's
training-data north star (SURVEY §2 extensions).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hard_negatives(corpus: DataFrame,
                   qids: Sequence[int],
                   qvecs: Sequence[Sequence[float]],
                   qlabels: Sequence[int],
                   k: int = 5,
                   band: tuple[float, float] | None = None,
                   id_col: str = "vec_id", label_col: str = "label",
                   vec_col: str = "embedding") -> DataFrame:
    """Top-k hardest negatives per anchor: candidates with
    ``label != anchor label``, ranked by cosine to the anchor
    descending (ties by ``id_col`` asc), optionally restricted to
    ``band = (lo, hi]`` similarity.  Returns
    ``(qid, vec_id, label, sim)`` — NULL vectors drop."""
    import pandas as pd

    qid_arr = np.asarray(list(qids), dtype=np.int64)
    qmat = np.asarray([list(v) for v in qvecs], dtype=np.float64)
    qlab = np.asarray(list(qlabels), dtype=np.int64)
    qnorms = np.linalg.norm(qmat, axis=1)
    qnorms[qnorms == 0] = 1.0

    def score(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sim = (mat @ qmat.T) / np.outer(norms, qnorms)   # n × nq
            lab = pdf[label_col].to_numpy(dtype=np.int64)
            keep = lab[:, None] != qlab[None, :]             # label filter
            if band is not None:
                lo, hi = band
                keep &= (sim > lo) & (sim <= hi)
            rows, cols = np.nonzero(keep)
            if len(rows) == 0:
                continue
            yield pd.DataFrame({
                "qid": qid_arr[cols],
                id_col: pdf[id_col].to_numpy()[rows],
                label_col: lab[rows],
                "sim": sim[rows, cols],
            })

    pairs = corpus.select(id_col, label_col, vec_col).mapInPandas(
        score, f"qid bigint, {id_col} bigint, {label_col} bigint, "
               f"sim double")
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(),
                                          F.col(id_col).asc())
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("qid", id_col, label_col, "sim"))
