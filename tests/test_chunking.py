"""C3 edge-case property tests (SURVEY.md §5.3, §7 hard-part 5)."""

from __future__ import annotations

from pyspark.sql import Row

from openai_vector_search_demo_spark.operators.chunking import chunk_documents


def ref_chunks(text: str, size: int = 300) -> list[str]:
    words = text.split(" ")
    return [" ".join(words[i * size:(i + 1) * size])
            for i in range(len(words) // size + 1)]


def run(spark, text, size=300):
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    rows = (chunk_documents(df, text_col="text", size=size)
            .orderBy("page_no").collect())
    return [r["chunk"] for r in rows]


def test_empty_doc_emits_one_empty_chunk(spark):
    assert run(spark, "") == ref_chunks("")


def test_single_word(spark):
    assert run(spark, "hello") == ref_chunks("hello")


def test_exact_multiple_emits_trailing_empty_chunk(spark):
    text = " ".join(["w"] * 600)
    got = run(spark, text)
    assert got == ref_chunks(text)
    assert got[-1] == ""  # the reference's len//300+1 trailing chunk
    assert len(got) == 3


def test_multiple_plus_one(spark):
    text = " ".join([f"w{i}" for i in range(601)])
    assert run(spark, text) == ref_chunks(text)


def test_double_space_preserves_empty_words(spark):
    text = "a  b " + " ".join(["c"] * 297)  # 301 tokens incl. the empty one
    assert run(spark, text, size=300) == ref_chunks(text, 300)


def test_small_size_many_chunks(spark):
    text = " ".join([f"t{i}" for i in range(10)])
    assert run(spark, text, size=3) == ref_chunks(text, 3)
