"""Unigram-LM tokenizer scoring — the SentencePiece/unigram family
(Kudo, ACL 2018: "Subword Regularization", public method description
only), as the engine's second tokenizer next to ``operators.bpe``.

Why this lives in a training-data engine: token budgets, packing
layouts, and per-document token counts all depend on the tokenizer;
the two production families are merge-based (BPE — ``operators.bpe``)
and likelihood-based (unigram LM — this module).  The unigram side
scores a word as the BEST segmentation into vocabulary pieces,
``max Σ ln p(piece)`` (Viterbi over piece boundaries), which is also
the standard "how well does this tokenizer fit this corpus" diagnostic
(bits per word) when choosing or validating a vocabulary.

Spark-first shape:

- **Vocabulary training** is pure DataFrame aggregation: explode words
  to all substrings of length ≤ ``max_piece`` (a JVM ``sequence`` +
  ``substring`` projection — no Python), count with word-frequency
  multiplicity, keep every single character plus the top-K longer
  pieces (rank window, ties by piece string).  Piece scores are
  micro-nat INTEGERS: ``round(ln(cnt/total)·10⁶)`` — ln is the ONLY
  float op in the whole operator, rounded once at train time (the
  engine's in-engine-rounding contract; everything downstream is exact
  integer arithmetic).
- **Viterbi** runs over DISTINCT words (a relation bounded by the
  vocabulary of the corpus, not its size — the same collapse
  ``bpe.segment`` exploits), one Arrow batch through a pandas UDF
  doing the O(len·max_piece) DP in Python integers.  The DP key packs
  (total score, piece count) into ONE BIGINT —
  ``key = 1024·Σscore − #pieces`` — so "max score, ties → fewest
  pieces" is a single integer ``max()``, bit-identical in any engine;
  the DuckDB oracle replays the DP as unrolled per-position CTEs over
  the same integer keys.
- **OOV contract**: single characters absent from the vocabulary score
  ``OOV_SCORE_MICRO`` (so every word ≤ ``MAX_WORD_LEN`` chars is
  segmentable — the oracle unrolls exactly MAX_WORD_LEN DP levels);
  longer words pass through unsegmented with the same penalty — both rules replayed by the oracle.

At 100 TB: training is two map-side-combined aggregations over the
(word, freq) relation — which is itself the collapsed output of one
corpus scan; scoring touches only distinct words and the per-doc join
back is a broadcast (vocabulary-sized).  No stage scales with corpus
bytes except the initial token count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequencies", "train_unigram_vocab",
           "viterbi_word_scores", "OOV_SCORE_MICRO", "KEY_BASE",
           "MAX_WORD_LEN"]

OOV_SCORE_MICRO = -30_000_000  # ln-prob of an out-of-vocab char, micro-nats
KEY_BASE = 1024                # key = KEY_BASE·Σscore − #pieces
MAX_WORD_LEN = 16              # longer words pass through unsegmented


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` over the corpus — lowered, \\s+-split, empties
    dropped (the engine's shared tokenization)."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        tokens,
    )
    return (df.select(F.explode(tokens(text_col)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def train_unigram_vocab(words: DataFrame, max_piece: int = 4,
                        top_k: int = 24) -> DataFrame:
    """``(piece, score_micro)`` — every single char seen, plus the
    ``top_k`` pieces of length 2..``max_piece`` by frequency-weighted
    substring count (ties by piece string).  ``score_micro =
    round(ln(cnt/total)·10⁶)`` with ``total`` = Σcnt over the KEPT
    pieces, collected as one driver scalar (bounded-collect)."""
    from pyspark.sql.window import Window

    sub = (words
           .select("word", "freq",
                   F.explode(F.sequence(F.lit(1),
                                        F.lit(max_piece))).alias("plen"))
           .filter(F.length("word") >= F.col("plen"))
           .select("word", "freq", "plen",
                   F.explode(F.sequence(
                       F.lit(1),
                       F.length("word") - F.col("plen") + 1)).alias("pos"))
           .select(F.expr("substring(word, pos, plen)").alias("piece"),
                   "freq")
           .groupBy("piece").agg(F.sum("freq").alias("cnt")))
    chars = sub.filter(F.length("piece") == 1)
    w = Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
    longer = (sub.filter(F.length("piece") >= 2)
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= top_k).drop("_rn"))
    # localCheckpoint the vocabulary-sized result (chars + top_k rows)
    # BEFORE the total scalar: the substring-explode aggregation above
    # is the operator's whole cost, and without this it executed TWICE
    # per training — once for ``total`` here and once more when the
    # caller's first action re-evaluated the returned plan (r16,
    # guide §5; profiled as the dominant stages of the token-budget
    # slot).  Within-call reuse only — recomputed from the corpus on
    # every invocation.
    kept = chars.unionByName(longer).localCheckpoint()
    total = kept.agg(F.sum("cnt")).first()[0]
    return kept.select(
        "piece",
        F.round(F.log(F.col("cnt") / F.lit(float(total))) * 1e6)
        .cast("long").alias("score_micro"))


def viterbi_word_scores(words: DataFrame, vocab: DataFrame,
                        max_piece: int = 4) -> DataFrame:
    """Per-word best-segmentation key: ``(word, key)`` with
    ``key = KEY_BASE·(best Σ score_micro) − (#pieces of that best)``,
    ties resolved toward fewer pieces by the packing itself.  Words
    longer than ``MAX_WORD_LEN`` score one ``OOV_SCORE_MICRO`` piece.
    The vocab is driver-collected (bounded: chars + top_k) into the
    Arrow UDF's closure; the DP is exact Python-integer arithmetic."""
    from pyspark.sql.types import LongType

    vmap = {r["piece"]: int(r["score_micro"]) for r in vocab.collect()}
    oov, base, cap = OOV_SCORE_MICRO, KEY_BASE, MAX_WORD_LEN

    @F.pandas_udf(LongType())
    def _key(col: pd.Series) -> pd.Series:

        def dp(word: str) -> int:
            n = len(word)
            if n == 0 or n > cap:
                return base * oov - 1
            best = [None] * (n + 1)
            best[0] = 0
            for i in range(1, n + 1):
                b = None
                for j in range(max(0, i - max_piece), i):
                    if best[j] is None:
                        continue
                    piece = word[j:i]
                    sc = vmap.get(piece)
                    if sc is None:
                        if i - j > 1:
                            continue
                        sc = oov
                    cand = best[j] + base * sc - 1
                    if b is None or cand > b:
                        b = cand
                best[i] = b
            return best[n]

        return col.map(dp)

    return words.select("word", _key(F.col("word")).alias("key"))
