"""S1/S2/S3 — raw document sources: crack PDF/DOCX bytes into page rows.

Reference behavior (SURVEY §2.1): `readPDF` (modules/utilities.py:31-45)
emits one record per physical PDF page; `readMSWord` (:49-78) reads the DOCX
as one text blob and repaginates into 300-word synthetic pages; extension
dispatch at :157-165.

Spark-first shape: ``spark.read.format("binaryFile")`` scans the files
(distributed, no driver staging — S4's temp-file dance disappears), then an
Arrow-batched ``mapInPandas`` extractor emits ``(doc_path, page_no, text)``
rows.  Extraction is a *pluggable callable* ``bytes -> list[str]`` (one
string per page), so the Spark plumbing — schema, batching, explode — is
identical for every format and independently testable:

- DOCX: real, dependency-free (a .docx is a zip; text lives in
  ``word/document.xml`` — stdlib zipfile + XML parse), repaginated by the
  chunking operator exactly like the reference.
- PDF: real, dependency-free — the engine's own extractor
  (``sources/pdf_text.py``: object scan → page tree → content-stream
  interpreter → ToUnicode/encoding decode), proven against the reference's
  own sample document; ``pypdf`` is used instead when installed.
- ``fake``: a deterministic test format (form-feed separated UTF-8 pages) so
  the distributed path is exercised end-to-end without binary parsers.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

Extractor = Callable[[bytes], list[str]]

PAGES_SCHEMA = StructType([
    StructField("doc_path", StringType()),
    StructField("page_no", IntegerType()),
    StructField("text", StringType()),
    StructField("error", StringType()),   # NULL on good pages; one row/bad doc
])


def read_raw(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Binary-file scan of a document tree (replaces S4 upload staging —
    Spark reads in place, in parallel)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


# ---------------------------------------------------------------------------
# Extractors (bytes -> list of page texts)
# ---------------------------------------------------------------------------

def docx_extract(data: bytes) -> list[str]:
    """Whole-DOCX text as ONE page (reference: single blob, repaginated
    downstream by the 300-word chunker — modules/utilities.py:55-73).

    Real parser, stdlib-only: DOCX is a zip; paragraphs are ``<w:p>`` and
    text runs ``<w:t>`` in ``word/document.xml`` (ECMA-376).
    """
    import xml.etree.ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    paras = []
    for p in root.iter(f"{ns}p"):
        paras.append("".join(t.text or "" for t in p.iter(f"{ns}t")))
    return ["\n".join(paras)]


def pdf_extract(data: bytes) -> list[str]:
    """One string per physical page (reference: PyPDFLoader page granularity,
    modules/utilities.py:34).

    Backed by the engine's own dependency-free extractor
    (``sources/pdf_text.py`` — stdlib re+zlib only), so PDF ingestion works
    in any environment.  When ``pypdf`` happens to be installed it is
    preferred for maximal format coverage (encrypted files, exotic
    filters); the built-in covers the mainstream Flate/TrueType/Type0
    corpus, including the reference's own sample document."""
    try:
        from pypdf import PdfReader  # noqa: PLC0415
    except ImportError:
        from openai_vector_search_demo_spark.sources.pdf_text import (  # noqa: PLC0415
            extract_pdf_pages,
        )
        return extract_pdf_pages(data)
    reader = PdfReader(io.BytesIO(data))  # pragma: no cover
    return [page.extract_text() or "" for page in reader.pages]  # pragma: no cover


FAKE_PAGE_SEP = b"\x0c"  # form feed


def fake_extract(data: bytes) -> list[str]:
    """Deterministic test format: UTF-8 text, pages split on form-feed."""
    return [p.decode("utf-8") for p in data.split(FAKE_PAGE_SEP)]


EXTRACTORS: dict[str, Extractor] = {
    "docx": docx_extract,
    "doc": docx_extract,   # reference routes .doc to the Word reader too
    "pdf": pdf_extract,
    "fake": fake_extract,
}


def _ext_of(path: str) -> str:
    return path.rsplit("/", 1)[-1].rsplit(".", 1)[-1].lower()


def crack_documents(raw: DataFrame,
                    extractors: dict[str, Extractor] | None = None) -> DataFrame:
    """binaryFile rows → one row per page:
    ``(doc_path, page_no, text, error)``.

    Extension dispatch (S3) happens per row inside the Arrow batch; unknown
    extensions are skipped (reference behavior: unsupported uploads are
    filtered by the UI widget — app/app.py:225).  Everything downstream
    (cleanse → chunk → embed → index) is the ordinary ingest pipeline.

    A document that fails to parse (password-protected or AES-encrypted
    PDF — RC4 owner-locked ones decrypt transparently — truncated zip, …) emits
    ONE ``(doc_path, NULL, NULL, error)`` row instead of raising or
    vanishing — the multimodal corrupt-row convention: at 100 TB a bad file
    is DATA to count and report (``filter(error.isNotNull())``), never a
    job abort, and never a silent gap in the corpus.  (The reference's
    try/except→None at modules/utilities.py:43-45 swallows the failure
    entirely; we keep the never-crash property but not the silence.)
    Good-page consumers filter ``error IS NULL`` — ``crack_and_ingest``
    does this for the ingest path.
    """
    import pandas as pd

    table = extractors or EXTRACTORS

    def crack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_path": [], "page_no": [],
                                    "text": [], "error": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                fn = table.get(_ext_of(path))
                if fn is None:
                    continue
                try:
                    pages = fn(bytes(content))
                except Exception as e:
                    out["doc_path"].append(path)
                    out["page_no"].append(None)
                    out["text"].append(None)
                    out["error"].append(f"{type(e).__name__}: {e}")
                    continue
                for i, text in enumerate(pages):
                    out["doc_path"].append(path)
                    out["page_no"].append(i)
                    out["text"].append(text)
                    out["error"].append(None)
            # object dtype: empty batches must not infer float64 columns
            yield pd.DataFrame({k: pd.Series(v, dtype="object")
                                for k, v in out.items()})

    return (raw.select("path", "content")
            .mapInPandas(crack, PAGES_SCHEMA))


_WORDS_RE = re.compile(r"\S+")


def make_docx(paragraphs: list[str]) -> bytes:
    """Build a minimal valid DOCX in memory (test fixture builder — also
    documents the format assumptions docx_extract relies on)."""
    doc_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs)
        + "</w:body></w:document>")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        "</Types>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("word/document.xml", doc_xml)
    return buf.getvalue()
