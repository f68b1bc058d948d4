"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end search pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (+ M6 extensions), checked against DuckDB at sf0.01.

Conventions (FIXTURES.md): every computed column is aliased identically in
the Spark plan and the oracle SQL; float results are rounded to 6 decimals on
both sides; deterministic tie-breaks are included wherever the operator under
test is a sort/top-k.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openai_vector_search_demo_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → chunk → cleanse → embed (deterministic local
    model) → exact cosine KNN top-10 → rerank → answer shape (SURVEY §3.2)."""
    from openai_vector_search_demo_spark.plans.pipeline import (
        ingest_documents,
        search,
    )

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    chunks = ingest_documents(docs, text_col="text", path_col="source")
    return search(chunks, "how does a hash join work on a spark table", k=10,
                  score_threshold=0)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE_SQL)
