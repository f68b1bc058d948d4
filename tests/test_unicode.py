"""Unicode normalization (functions/text.unicode_normalize): the
encoding-repair UDF and the cross-engine foundation of its oracle —
Spark-side unicodedata and DuckDB's utf8proc implement the same
UAX#15 forms byte-for-byte."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest

from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.text import unicode_normalize

# decomposed accents, compatibility singletons (U+212B), ligatures,
# halfwidth katakana, circled digits, astral (non-BMP) emoji + combining
TORTURE = [
    "caf\u00e9 meets cafe\u0301",
    "Ångström and Å",
    "ﬁne ﬀ ligatures",
    "ｶﾀｶﾅ halfwidth",
    "①②③ circled",
    "astral \U0001f600 é",
    "",
]


def test_forms_match_python_twin(spark):
    df = spark.createDataFrame([(s,) for s in TORTURE], "s string")
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = [r.n for r in
               df.select(unicode_normalize("s", form).alias("n")).collect()]
        want = [unicodedata.normalize(form, s) for s in TORTURE]
        assert got == want, form


def test_nfc_agrees_with_duckdb_utf8proc():
    """The oracle foundation: DuckDB nfc_normalize == Python NFC on the
    torture set.  If utf8proc and unicodedata ever diverge (Unicode
    version skew), unicode_nfc_repair's digest catches it at the gate —
    this test names the cause."""
    con = duckdb.connect()
    for s in TORTURE:
        d = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert d == unicodedata.normalize("NFC", s), repr(s)


def test_null_passthrough_and_validation(spark):
    df = spark.createDataFrame([("á",), (None,)], "s string")
    got = [r.n for r in
           df.select(unicode_normalize("s").alias("n")).collect()]
    assert got == ["á", None]
    with pytest.raises(ValueError):
        unicode_normalize("s", form="NFX")


def test_repair_shrinks_decomposed_text(spark):
    # composition folds combining marks into precomposed codepoints:
    # the chars_repaired < chars_corrupt receipt the slot relies on
    s = "e\u0301" * 10
    df = spark.createDataFrame([(s,)], "s string")
    row = df.select(F.length("s").alias("a"),
                    F.length(unicode_normalize("s")).alias("b")).first()
    assert row.a == 20 and row.b == 10
