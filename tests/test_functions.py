"""Unit/property tests for the scalar surface (SURVEY.md §5.3)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.hashing import record_key
from openai_vector_search_demo_spark.functions.text import (
    cleanse_text,
    highlight_keywords,
    keyword_list,
)
from openai_vector_search_demo_spark.functions.vectors import (
    cosine_similarity,
    vector_lit,
)


def one(spark, expr, **cols):
    df = spark.createDataFrame([Row(**cols)]) if cols else spark.range(1)
    return df.select(expr.alias("v")).first()["v"]


def ref_cleanse(s: str) -> str:
    return s.replace("\n", " ").replace("  ", " ")


def test_cleanse_matches_python_single_pass(spark):
    cases = ["a\nb", "a   b", "a  b  c", "", "x\n\ny", " \n ", "a    b"]
    for s in cases:
        assert one(spark, cleanse_text(F.lit(s))) == ref_cleanse(s), repr(s)


def test_sha1_record_key_matches_hashlib(spark):
    got = one(spark, record_key(F.lit("/docs/a.pdf"), F.lit(3)))
    assert got == hashlib.sha1("/docs/a.pdf_3".encode()).hexdigest()


def ref_keywords(text: str) -> list[str]:
    for ch in ".-=?!":
        text = text.replace(ch, " ")
    stop = ['?', 'a', 'an', 'and', 'or', 'do', 'of', 'if', 'not', 'for', 'are',
            'was', 'were', 'is', 'can', 'have', 'has', 'there', 'their', 'the',
            'how', 'why', 'when', 'what', "what's", 'in', 'to', 'i', 'we', 'you']
    return [w.lower() for w in text.split() if w.lower() not in stop]


def test_keyword_list_matches_reference_semantics(spark):
    cases = [
        "How does the fast hash-join work? SPARK table!",
        "a an and the THE The",
        "x.y-z=q?w!e",
        "  leading and trailing  ",
        "dup dup DUP the dup",
    ]
    for s in cases:
        assert one(spark, keyword_list(F.lit(s))) == ref_keywords(s), repr(s)


def ref_highlight(kws, text):
    pre = '<span style="background-color: #ffff99">'
    return " ".join(f"{pre}{t}</span>" if t.lower() in kws else t
                    for t in text.split(" "))


def test_highlight_matches_reference(spark):
    q = "fast hash join"
    kws = ref_keywords(q)
    text = "the FAST hash  join is fast"
    got = one(spark, highlight_keywords(keyword_list(F.lit(q)), F.lit(text)))
    assert got == ref_highlight(kws, text)


def test_cosine_self_is_one(spark):
    v = [1.0, 2.0, -3.0, 0.5]
    got = one(spark, cosine_similarity(vector_lit(v), vector_lit(v)))
    assert abs(got - 1.0) < 1e-12


def test_cosine_orthogonal_is_zero(spark):
    got = one(spark, cosine_similarity(vector_lit([1.0, 0.0]), vector_lit([0.0, 2.0])))
    assert abs(got) < 1e-12
