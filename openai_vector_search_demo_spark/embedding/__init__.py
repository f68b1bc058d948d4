"""Pluggable model-inference UDFs (SURVEY.md §2.4 E1/E3)."""

from openai_vector_search_demo_spark.embedding.embedder import (  # noqa: F401
    HashNgramEmbedder,
    embed_udf,
    embed_text,
)
