"""Cross-document line deduplication — the CCNet / RefinedWeb
boilerplate-stripping pass (public method descriptions: CCNet,
Wenzek et al. 2020 §4.1 "deduplicating paragraphs across shards";
RefinedWeb, Penedo et al. 2023 §3 line-level corrections; MassiveText's
repetition filters are the INTRA-doc cousin in
``operators/repetition.py``).

Web corpora share navigation chrome, cookie banners, and license
footers across millions of pages.  This operator splits documents
into lines, finds line CONTENT that appears in multiple documents,
removes it under one of two public policies, and reconstructs the
cleansed documents in original line order:

- ``policy="boilerplate"`` (RefinedWeb-style): drop EVERY occurrence of
  a line that appears in ≥ ``min_docs`` distinct documents — chrome is
  noise in all of its hosts.
- ``policy="keep_first"`` (CCNet-style hash-set dedup, made
  deterministic for a distributed engine): keep only the globally
  first occurrence — smallest ``(doc_id, pos)`` — of each line
  content; later occurrences drop.

Scale posture (100 TB): lines are grouped by ``md5(line)`` — a
fixed-width key (the shuffle carries 32-byte keys, not line bytes)
that both engines compute bit-identically, so the correctness gate
replays it.  Hot boilerplate lines are single keys, i.e. join/agg
skew by construction; every aggregate here is chosen so map-side
partials collapse the hot key BEFORE the wire:

- the distinct-doc count is two phases — ``groupBy(hash, doc)``
  (keys unique ⇒ uniform) then ``groupBy(hash).count()`` (partial
  counts: each reducer receives ≤ #map-partitions rows per key);
- ``keep_first`` is one ``min(struct(doc_id, pos))`` per hash —
  partial-agg min, same property;
- the verdict joins back to occurrences on the hash — a hot key is
  one build-side row, and AQE's skew-join split handles the probe
  side (`spark.sql.adaptive.enabled`).

Reconstruction is ``groupBy(doc)`` over KEPT lines only (bounded by
document size, the same key class every per-doc agg in the repo
uses).  No UDF anywhere; ANSI-SQL-replayable.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dedup_lines_across_docs"]


def dedup_lines_across_docs(df: DataFrame,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            line_sep: str = "\n",
                            min_docs: int = 2,
                            policy: str = "boilerplate") -> DataFrame:
    """Remove duplicated lines ACROSS documents and rebuild the text.

    Returns one row per input document that has at least one non-empty
    line: ``(doc_id, text, n_lines, n_kept, n_removed)`` where ``text``
    is the kept lines re-joined with ``line_sep`` in original order
    (empty string when everything was removed).  ``line_sep`` is a
    literal separator.  See the module docstring for the two policies.
    """
    if policy not in ("boilerplate", "keep_first"):
        raise ValueError(f"unknown policy {policy!r}")
    lines = F.filter(F.split(F.col(text_col), re.escape(line_sep)),
                     lambda x: x != "")
    base = (df.select(F.col(id_col).alias("doc_id"),
                      lines.alias("lines"))
            .filter(F.size("lines") > 0))
    occ = (base.select("doc_id", F.posexplode("lines")
                       .alias("pos", "line"))
           .withColumn("lh", F.md5("line")))
    if policy == "boilerplate":
        # distinct (hash, doc) first — unique keys, uniform shuffle —
        # then a partial-agg count per hash: skew-safe both phases
        bad = (occ.select("lh", "doc_id").distinct()
               .groupBy("lh").agg(F.count(F.lit(1)).alias("nd"))
               .filter(F.col("nd") >= min_docs)
               .select("lh"))
        kept = occ.join(bad, "lh", "left_anti")
    else:
        first = (occ.groupBy("lh")
                 .agg(F.min(F.struct("doc_id", "pos")).alias("m")))
        kept = (occ.join(first, "lh")
                .filter((F.col("doc_id") == F.col("m.doc_id"))
                        & (F.col("pos") == F.col("m.pos")))
                .drop("m"))
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"]),
                        line_sep).alias("text"),
                    F.count(F.lit(1)).alias("n_kept")))
    n_all = base.select("doc_id", F.size("lines").alias("n_lines"))
    return (n_all.join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("text"), F.lit("")).alias("text"),
                    "n_lines",
                    F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
                    .alias("n_kept"),
                    (F.col("n_lines")
                     - F.coalesce(F.col("n_kept"), F.lit(0).cast("long")))
                    .alias("n_removed")))
