"""C3 — fixed-size word chunking (modules/utilities.py:59-73).

The reference splits a whole DOCX into synthetic 300-word "pages":

    words = text.split(' ')
    for i in range(len(words) // 300 + 1):
        emit ' '.join(words[i*300 : (i+1)*300]), page = i

Edge semantics preserved *exactly* (SURVEY.md §7 hard-part 5):

- split on a single space (empty tokens survive double spaces);
- ``len // size + 1`` iterations, so a text whose word count is an exact
  multiple of 300 emits one trailing **empty** chunk (dropped later only by
  the P2 filter);
- an empty text still emits one empty chunk (page 0).

Implemented as pure array functions + ``posexplode`` — a generator expression
Catalyst codegens; the explode multiplies rows without any shuffle, so at
100 TB chunking is a map-only stage that pipelines straight into the
embedding stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.config import CHUNK_WORDS


def word_chunks(text: Column | str, size: int = CHUNK_WORDS) -> Column:
    """array<string> of ``floor(n_words/size)+1`` space-rejoined slices."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(c, " ")  # single space, exactly like str.split(' ')
    n_chunks = (F.size(words) / F.lit(size)).cast("int")  # floor for non-neg
    return F.transform(
        F.sequence(F.lit(0), n_chunks),
        lambda i: F.array_join(F.slice(words, i * size + 1, size), " "),
    )


def chunk_documents(df: DataFrame, text_col: str = "text",
                    size: int = CHUNK_WORDS,
                    page_col: str = "page_no",
                    chunk_col: str = "chunk") -> DataFrame:
    """Explode a document table into (…, page_no, chunk) rows — the engine's
    UDTF-shaped operator (one row in, many out), matching S2+C3."""
    other = [c for c in df.columns if c not in (page_col, chunk_col)]
    return df.select(
        *other,
        F.posexplode(word_chunks(text_col, size)).alias(page_col, chunk_col),
    )


def sliding_word_chunks(text: Column | str, size: int,
                        stride: int) -> Column:
    """array<string> of overlapping ``size``-word windows advancing by
    ``stride`` words (stride < size ⇒ size − stride words of overlap) —
    the RAG-ingestion variant of C3 (the reference chunker is the
    stride == size special case, minus its trailing-empty-chunk quirk).

    Windows start at 0, stride, 2·stride, … while the start is inside the
    text, so the final window may be shorter than ``size``; whitespace
    tokens (empties removed) rather than C3's raw single-space split,
    since overlap chunking is an engine extension with no reference edge
    semantics to preserve.  Pure codegen'd array functions — like C3 this
    is a map-only stage, no shuffle, no Python.
    """
    if not 0 < stride <= size:
        raise ValueError(f"need 0 < stride <= size, got {stride=} {size=}")
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    n_wins = F.greatest(
        F.lit(1),
        F.ceil((F.size(words) - F.lit(size)) / F.lit(stride) + 1)
        .cast("int"))
    return F.transform(
        F.sequence(F.lit(0), n_wins - 1),
        lambda i: F.array_join(F.slice(words, i * stride + 1, size), " "),
    )


def chunk_documents_sliding(df: DataFrame, text_col: str = "text",
                            size: int = CHUNK_WORDS, stride: int | None = None,
                            page_col: str = "page_no",
                            chunk_col: str = "chunk") -> DataFrame:
    """Overlapping-window variant of ``chunk_documents`` (default stride =
    size/2, i.e. 50 % overlap)."""
    stride = size // 2 if stride is None else stride
    other = [c for c in df.columns if c not in (page_col, chunk_col)]
    return df.select(
        *other,
        F.posexplode(sliding_word_chunks(text_col, size, stride))
        .alias(page_col, chunk_col),
    )


def sentence_chunks(text: Column | str,
                    sentences_per_chunk: int = 3) -> Column:
    """Sentence-grouped chunking — the semantic-boundary RAG variant of
    C3: sentences never split mid-thought, chunks are ``k`` consecutive
    sentences.  A "sentence" is a maximal run of non-terminator
    characters plus its trailing ``.!?`` run (``[^.!?]+[.!?]*`` — the
    Java∩RE2 common subset, so the oracle applies the identical
    pattern); inter-sentence whitespace rides the next sentence's head,
    which makes the sentence list a lossless partition of the text
    (chunks rejoin with '' and trim) — with one documented exception: a
    LEADING terminator run (text starting with ``.``, ``!`` or ``?``)
    matches no sentence, so those characters are dropped; they carry no
    sentence content, and keeping the pattern in the Java∩RE2 common
    subset (no alternation-order guarantees needed) is worth the edge
    case.  Pure codegen array functions — map-only, no shuffle, no
    Python."""
    if sentences_per_chunk < 1:
        raise ValueError("sentences_per_chunk must be >= 1")
    c = F.col(text) if isinstance(text, str) else text
    sents = F.regexp_extract_all(c, F.lit(r"[^.!?]+[.!?]*"), 0)
    k = sentences_per_chunk
    n_chunks = F.greatest(
        F.lit(1), F.ceil(F.size(sents) / F.lit(k)).cast("int"))
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.trim(F.array_join(F.slice(sents, i * k + 1, k), "")),
    )


def cdc_chunks(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 4,
               divisor: int = 16) -> DataFrame:
    """CONTENT-DEFINED CHUNKING — variable-size chunks whose boundaries
    depend on local content, not position (the rsync/LBFS/FastCDC idea
    at token granularity): a boundary falls AFTER token *i* iff the
    60-bit hash of the ``k``-token window ending at *i* is ≡ 0 mod
    ``divisor``.  Insert or delete a sentence and every boundary outside
    the edited window stays put — so chunk fingerprints survive shifts
    that break fixed-width chunking (C3's word offsets all move), which
    is what makes CDC the storage/dedup-friendly chunking: near-dup
    documents share most chunk fingerprints verbatim.

    Expected chunk length ≈ ``divisor`` tokens (geometric); no min/max
    clamp — ``cdc_chunks_normalized`` below adds FastCDC's normalized
    cut bounds for workloads that need them.  Deterministic: the
    boundary hash is the unsalted md5-60bit of the raw k-token window
    (``_hash60``), so the same text chunks identically on any engine
    (the DuckDB oracle re-derives every boundary).

    Output: one row per chunk — ``(id, chunk_no, n_tokens, chunk_text,
    fingerprint)``; ``chunk_no`` is 0-based in token order,
    ``fingerprint`` the 60-bit hash of the chunk text.  Zero-token
    documents emit no row (the tokenless contract shared with the LM
    scorers).

    Plan: tokenize → posexplode (map-only) → ONE per-doc window
    (running boundary count = chunk id; bounded by document length, the
    ``session_window`` contract) → per-(doc, chunk) rebuild aggregate.
    Shuffles only on the doc id.
    """
    from openai_vector_search_demo_spark.functions.text_analysis import (
        _hash60,
        tokens,
    )
    from pyspark.sql import Window

    if k < 1 or divisor < 1:
        raise ValueError("k and divisor must be >= 1")
    tokpos = (df.select(F.col(id_col).alias("id"),
                        F.posexplode(tokens(text_col)).alias("pos0", "tk"))
              .select("id", (F.col("pos0") + 1).alias("pos"), "tk"))
    w = Window.partitionBy("id").orderBy("pos")
    # k-token window ending at pos: collect via lag chain is k-1 extra
    # window exprs; a rolling string of the last k tokens does it in one
    ctx = F.concat_ws(
        " ", F.collect_list("tk").over(
            w.rowsBetween(-(k - 1), Window.currentRow)))
    is_boundary = (F.col("pos") >= k) & \
        (F.pmod(_hash60(ctx), F.lit(divisor)) == 0)
    marked = tokpos.withColumn(
        "chunk_no",
        F.sum(F.when(is_boundary, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)).cast("long"))
    marked = marked.withColumn("chunk_no",
                               F.coalesce("chunk_no", F.lit(0)))
    rebuilt = (marked.groupBy("id", "chunk_no")
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "tk"))),
                            lambda x: x["tk"]), " ").alias("chunk_text")))
    return rebuilt.select(
        "id", "chunk_no", "n_tokens", "chunk_text",
        _hash60(F.col("chunk_text")).alias("fingerprint"))


def cdc_chunks_normalized(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 4,
                          divisor: int = 16, min_tokens: int = 8,
                          max_tokens: int = 32) -> DataFrame:
    """``cdc_chunks`` with FastCDC's NORMALIZED CUT BOUNDS — the
    production contract the plain form's docstring used to defer: a
    boundary falls after token *i* iff the chunk has at least
    ``min_tokens`` tokens AND the content condition holds (same k-window
    md5-60bit ≡ 0 mod ``divisor``), and is FORCED once the chunk reaches
    ``max_tokens`` — so chunk sizes live in [min, max] (the final chunk
    of a document may be shorter) instead of the clampless geometric
    tail, while boundaries remain content-defined and shift-resistant
    between the bounds.

    Size bounds make the placement SEQUENTIAL per document (whether a
    position cuts depends on where the previous cut landed — the known
    price of min/max CDC; there is no exact parallel-prefix form), so
    the per-document work is one ``aggregate`` fold over the time-sorted
    token array: the same bounded-by-document-length task contract as
    ``funnel_counts`` and ``session_window``.  Whale documents should be
    pre-split (C3) before CDC, as with every per-doc fold here.  The
    content flags themselves still come from ONE per-doc window pass,
    and only (id, pos, tk, flag) rows ever shuffle.

    Output contract identical to ``cdc_chunks``: one row per chunk,
    ``(id, chunk_no, n_tokens, chunk_text, fingerprint)``, zero-token
    documents emit nothing.  The DuckDB oracle replays the fold as a
    recursive CTE — every boundary value-checked."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        _hash60,
        tokens,
    )
    from pyspark.sql import Window

    if k < 1 or divisor < 1:
        raise ValueError("k and divisor must be >= 1")
    if min_tokens < 1 or max_tokens < min_tokens:
        raise ValueError("need 1 <= min_tokens <= max_tokens")
    tokpos = (df.select(F.col(id_col).alias("id"),
                        F.posexplode(tokens(text_col)).alias("pos0", "tk"))
              .select("id", (F.col("pos0") + 1).alias("pos"), "tk"))
    w = Window.partitionBy("id").orderBy("pos")
    ctx = F.concat_ws(
        " ", F.collect_list("tk").over(
            w.rowsBetween(-(k - 1), Window.currentRow)))
    flagged = tokpos.withColumn(
        "hb", (F.col("pos") >= k)
        & (F.pmod(_hash60(ctx), F.lit(divisor)) == 0))

    ents = F.array_sort(F.collect_list(F.struct("pos", "tk", "hb")))
    empty_cur = F.array().cast("array<string>")
    empty_done = F.array().cast("array<array<string>>")
    init = F.struct(empty_cur.alias("cur"), empty_done.alias("done"),
                    F.lit(0).alias("d"))

    def step(acc, e):
        cur2 = F.concat(acc["cur"], F.array(e["tk"]))
        d2 = acc["d"] + 1
        cut = ((d2 >= min_tokens) & e["hb"]) | (d2 >= max_tokens)
        return F.struct(
            F.when(cut, empty_cur).otherwise(cur2).alias("cur"),
            F.when(cut, F.concat(acc["done"], F.array(cur2)))
             .otherwise(acc["done"]).alias("done"),
            F.when(cut, F.lit(0)).otherwise(d2).alias("d"))

    def finish(acc):
        return F.when(F.size(acc["cur"]) > 0,
                      F.concat(acc["done"], F.array(acc["cur"]))) \
                .otherwise(acc["done"])

    per_doc = (flagged.groupBy("id")
               .agg(F.aggregate(ents, init, step, finish).alias("chunks")))
    out = (per_doc.select(
        "id", F.posexplode("chunks").alias("chunk_no", "toks"))
        .select("id", F.col("chunk_no").cast("long").alias("chunk_no"),
                F.size("toks").alias("n_tokens"),
                F.array_join("toks", " ").alias("chunk_text")))
    return out.select("id", "chunk_no", "n_tokens", "chunk_text",
                      _hash60(F.col("chunk_text")).alias("fingerprint"))
