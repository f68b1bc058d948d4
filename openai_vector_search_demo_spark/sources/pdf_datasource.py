"""S1 as a Spark 4 Python DataSource: ``spark.read.format("pdfpages")``.

SURVEY §2.1 S1 names two Spark-native shapes for the PDF scan; the engine
ships both:

- ``binaryFile`` + ``crack_documents`` (mapInPandas) — `doc_crack.py`,
  used by the ingest pipeline;
- THIS module — the Spark 4 ``pyspark.sql.datasource`` API, which makes
  PDF a first-class readable format with its own schema and per-file input
  partitions (one task per document, scheduled by Spark like any other
  scan, usable from pure SQL via ``CREATE TEMPORARY VIEW ... USING``).

Parallelism: ``partitions()`` returns one ``InputPartition`` per file, so
a directory of N PDFs fans out to N tasks with no driver-side parsing; the
driver only lists the directory.  Extraction uses the engine's
dependency-free ``pdf_text`` parser; a corrupt file yields zero rows, like
the reference's try/except→None (modules/utilities.py:43-45).

Register once per session::

    from openai_vector_search_demo_spark.sources.pdf_datasource import (
        PdfPagesDataSource,
    )
    spark.dataSource.register(PdfPagesDataSource)
    df = spark.read.format("pdfpages").load("/data/docs")
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PDF_PAGES_SCHEMA = StructType([
    StructField("doc_path", StringType()),
    StructField("page_no", IntegerType()),
    StructField("text", StringType()),
])


class _PdfFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PdfPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("pdfpages requires a path: .load('/dir/or/file')")
        self.path = path

    def partitions(self):
        import os
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f) for f in os.listdir(self.path)
                if f.lower().endswith(".pdf"))
        else:
            files = [self.path]
        # one partition per document: the unit of parallelism AND of
        # failure isolation (a corrupt file affects only its own task)
        return [_PdfFilePartition(f) for f in files]

    def read(self, partition: _PdfFilePartition):
        from openai_vector_search_demo_spark.sources.pdf_text import (
            extract_pdf_pages,
        )
        try:
            with open(partition.path, "rb") as f:
                pages = extract_pdf_pages(f.read())
        except Exception:
            return  # corrupt document → zero rows, job survives
        for i, text in enumerate(pages):
            yield (partition.path, i, text)


class PdfPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pdfpages"

    def schema(self) -> StructType:
        return PDF_PAGES_SCHEMA

    def reader(self, schema: StructType) -> PdfPagesReader:
        return PdfPagesReader(self.options)
