"""openai_vector_search_demo_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of MaheshSQL/openai-vector-search-demo.

The reference (/root/reference) is a Streamlit + Redis/RediSearch vector-search
demo: ingest PDF/DOCX → chunk → embed → HNSW cosine KNN → LLM rerank.  This
package re-expresses those semantics Spark-first: declarative DataFrame plans,
Catalyst-optimized scans (column pruning / predicate pushdown / partition
pruning), `TakeOrderedAndProject` top-k instead of an ANN server, and
Arrow-batched pandas UDFs only where the built-ins genuinely can't express the
semantics (model inference, binary decode).

Layout
------
- ``session``     SparkSession conventions (UTC, AQE, Arrow, shuffle sizing)
- ``config``      reference constants (chunk size, score threshold, stopwords,
                  model registry — SURVEY.md §2.4 E4)
- ``functions``   scalar/array column functions (P1–P12 of SURVEY.md §2.2)
- ``operators``   relational operators: chunking (C3), KNN (Q2–Q5), rerank
                  (Q7–Q9), history (Q11), dedup suite, text analysis, ANN
- ``embedding``   pluggable embedder/scorer UDFs (E1/E3) with deterministic
                  local implementations for tests
- ``sources``     doc cracking (S1–S3), catalog DDL (S5–S7), upsert sink (S8/S9)
- ``plans``       composed end-to-end pipelines (ingest → index → search)
- ``streaming``   Structured Streaming ingestion + windowed aggregation (M6)
"""

__version__ = "0.1.0"
