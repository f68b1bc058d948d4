"""The engine's query registry — split into per-family modules
(r14).  Import order preserves the original single-file
registration order (battery oracles are built at decoration
time from already-registered members); the namespace merge
below keeps every name — public or helper — resolvable as
``queries.<name>`` exactly as in the single-file module."""

import sys as _sys

from openai_vector_search_demo_spark.queries import _shared
from openai_vector_search_demo_spark.queries import pipeline
from openai_vector_search_demo_spark.queries import text_analysis
from openai_vector_search_demo_spark.queries import ann_quant
from openai_vector_search_demo_spark.queries import dedup
from openai_vector_search_demo_spark.queries import events_windows
from openai_vector_search_demo_spark.queries import relational
from openai_vector_search_demo_spark.queries import scale_serving
from openai_vector_search_demo_spark.queries import hamming_tier
from openai_vector_search_demo_spark.queries import monitoring
from openai_vector_search_demo_spark.queries import window_breadth
from openai_vector_search_demo_spark.queries import batteries
from openai_vector_search_demo_spark.queries import graph_ann
from openai_vector_search_demo_spark.queries import window

_self = _sys.modules[__name__]
for _m in (_shared, pipeline, text_analysis, ann_quant, dedup, events_windows, relational, scale_serving, hamming_tier, monitoring, window_breadth, batteries, graph_ann, window):
    for _k in vars(_m):
        if not _k.startswith('__'):
            setattr(_self, _k, getattr(_m, _k))
