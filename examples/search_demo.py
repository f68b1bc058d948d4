#!/usr/bin/env python
"""End-to-end demo — what the reference app does, as a Spark pipeline.

Mirrors the reference's two flows (ingest: app/app.py:130-190; search:
app/app.py:249-334) against a directory of real documents:

1. crack PDFs/DOCX into page rows (the engine's own dependency-free PDF
   extractor — no pypdf needed),
2. cleanse → chunk → embed (deterministic local model; swap in
   RemoteEmbedder with an API transport for production),
3. create the tenant-partitioned index and upsert the chunks (HSET
   semantics: re-running this script does not duplicate rows),
4. run a question through KNN top-k + rerank and print scored answers.

Run:  python examples/search_demo.py [docs_dir] [question]
Defaults to the reference's sample PDF and a recipe question.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openai_vector_search_demo_spark import catalog  # noqa: E402
from openai_vector_search_demo_spark.plans.pipeline import (  # noqa: E402
    crack_and_ingest,
    search,
)
from openai_vector_search_demo_spark.session import get_spark  # noqa: E402
from openai_vector_search_demo_spark.sources.doc_crack import read_raw  # noqa: E402

SAMPLE = "/root/reference/sample_docs"


def main() -> None:
    docs_dir = sys.argv[1] if len(sys.argv) > 1 else SAMPLE
    question = (sys.argv[2] if len(sys.argv) > 2
                else "how do I cook chilli con carne with minced beef")

    spark = get_spark("search-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # -- ingest (S1-S3, P1-P3, C3, E1-E2, S5, S8-S9) ----------------------
    chunks = crack_and_ingest(read_raw(spark, docs_dir), tenant="demo")
    index_loc = str(Path(tempfile.mkdtemp(prefix="search_demo_")) / "idx")
    catalog.create_index(spark, "demo_index", index_loc)
    catalog.upsert_chunks(spark, chunks, "demo_index")
    table = spark.table("demo_index")
    print(f"indexed {table.count()} chunks from {docs_dir}")

    # -- search (Q1-Q9) ---------------------------------------------------
    answers = search(table, question, k=5, tenant="demo", score_threshold=0)
    for row in answers.collect():
        print(f"  [score {row.Score:3d}  sim {row.Similarity:.3f}  "
              f"page {row.Page}] {row.Content[:90]}...")

    catalog.drop_index(spark, "demo_index")


if __name__ == "__main__":
    main()
