"""Scalar/array column functions — the reference's projection surface
(SURVEY.md §2.2 P1–P12).  Everything here is pure `pyspark.sql.functions`
composition: JVM-side, whole-stage-codegen, no Python boundary.
"""

from openai_vector_search_demo_spark.functions.text import (  # noqa: F401
    cleanse_text,
    non_empty,
    document_extension,
    basename,
    keyword_list,
    highlight_keywords,
    whitespace_tokens,
)
from openai_vector_search_demo_spark.functions.text_analysis import (  # noqa: F401
    bpe_token_estimate,
    token_count,
)
from openai_vector_search_demo_spark.functions.hashing import (  # noqa: F401
    record_key,
    md5_key,
)
from openai_vector_search_demo_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    to_float32,
    l2_normalize,
)
