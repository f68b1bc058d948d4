"""Text scalar functions (SURVEY.md §2.2).

Each function mirrors an exact reference behavior (cited file:line into
/root/reference) as a Catalyst Column expression — no UDFs, so every one of
these stays inside whole-stage codegen and is trivially pushed through by the
optimizer.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.config import (
    HIGHLIGHT_PREFIX,
    HIGHLIGHT_SUFFIX,
    KEYWORD_PUNCT,
    KEYWORD_STOPWORDS,
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def cleanse_text(text: Column | str) -> Column:
    """P1 — cleanseText (modules/utilities.py:132-141).

    Single pass: ``'\\n' -> ' '`` then one non-recursive left-to-right
    replacement of double space by single space.  Both Python ``str.replace``
    and Spark ``regexp_replace`` substitute non-overlapping matches
    left-to-right, so semantics match exactly (``'a   b'`` → ``'a  b'``).
    """
    c = _col(text)
    return F.regexp_replace(F.regexp_replace(c, "\n", " "), "  ", " ")


def non_empty(text: Column | str) -> Column:
    """P2 — empty-chunk predicate (modules/utilities.py:198).

    The reference's ``.strip != ''`` is a method-reference bug (always truthy);
    the *effective* predicate is not-null and non-empty — implemented as such.
    """
    c = _col(text)
    return c.isNotNull() & (F.length(c) > 0)


def document_extension(path: Column | str) -> Column:
    """P4 — getDocumentExtension (modules/utilities.py:121-126) + ``.lower()``
    at :157: last dot-separated token of the basename, lowercased."""
    base = basename(path)
    return F.lower(F.element_at(F.split(base, "\\."), -1))


def basename(path: Column | str) -> Column:
    """P9 — os.path.basename (app/app.py:281,329)."""
    return F.element_at(F.split(_col(path), "/"), -1)


def whitespace_tokens(text: Column | str) -> Column:
    """Python ``str.split()`` semantics: split on whitespace runs, no empty
    tokens (used by keyword extraction, app/app.py:55)."""
    toks = F.split(F.trim(_col(text)), "\\s+")
    # trim handles leading/trailing; a fully-empty input still yields ['']
    return F.filter(toks, lambda t: t != F.lit(""))


def keyword_list(text: Column | str) -> Column:
    """P5 — getKeywordList (app/app.py:49-56).

    Replace ``.-=?!`` with spaces, whitespace-split, lowercase, drop the
    31-token stopword list.  Uses ``filter`` (not ``array_except``) to keep
    duplicates, matching the reference's list comprehension.
    """
    spaces = " " * len(KEYWORD_PUNCT)
    cleaned = F.translate(_col(text), KEYWORD_PUNCT, spaces)
    toks = F.transform(whitespace_tokens(cleaned), lambda t: F.lower(t))
    stop = F.array(*[F.lit(w) for w in KEYWORD_STOPWORDS])
    return F.filter(toks, lambda t: ~F.array_contains(stop, t))


def highlight_keywords(keywords: Column | str, text: Column | str) -> Column:
    """P6 — highlightKeywords (app/app.py:58-62).

    Reference splits on a *single space* (not whitespace runs) and wraps tokens
    whose lowercase form is in the keyword list.
    """
    kw = _col(keywords)
    toks = F.split(_col(text), " ")
    marked = F.transform(
        toks,
        lambda t: F.when(
            F.array_contains(kw, F.lower(t)),
            F.concat(F.lit(HIGHLIGHT_PREFIX), t, F.lit(HIGHLIGHT_SUFFIX)),
        ).otherwise(t),
    )
    return F.array_join(marked, " ")


# Token counting lives in functions/text_analysis.py: `token_count`
# (whitespace tokens) and `bpe_token_estimate` (word/number/punct pieces).
# A regex-piece counter previously duplicated here under the name
# `token_count` — removed: two same-named functions with different semantics
# in sibling modules is how silent wrong statistics happen.


def unicode_normalize(text: Column | str, form: str = "NFC") -> Column:
    """UAX#15 Unicode normalization — the ENCODING-REPAIR stage every
    multilingual web pipeline runs before hashing (C4/mC4, CCNet):
    byte-different spellings of the same grapheme ('e'+U+0301 vs 'é',
    U+212B vs 'Å') otherwise defeat every exact-dup, line-dedup, and
    fingerprint pass downstream.

    Spark ships no built-in normalizer, so this is one of the engine's
    few sanctioned Python hot-path UDFs: ``unicodedata.normalize`` over
    Arrow batches (the E1 embedder's contract class — batched, never
    row-at-a-time py4j).  The standard is what makes it oracle-able:
    DuckDB's utf8proc ``nfc_normalize`` implements the same UAX#15 NFC
    bit-for-bit (pinned by tests/test_unicode.py).
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        # pandas' C string loop; nulls propagate natively
        return s.str.normalize(form)

    return _norm(_col(text))
