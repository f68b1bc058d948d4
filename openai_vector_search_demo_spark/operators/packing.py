"""Sequence packing — laying documents end-to-end into token-budget bins.

Training pipelines feed fixed-size context windows; the standard batch
layout is *concat-and-chunk*: concatenate documents in a deterministic
order and cut the stream every ``budget`` tokens, so bin occupancy is ~100%
and the mapping is a pure function of (order, token counts) — no stateful
first-fit scan, which a shared-nothing engine cannot express without a
sequential pass.

Spark shape: documents are split into ``num_groups`` deterministic groups
(modulo on the id — mirrored exactly by the SQL oracle) and the running
token total inside each group is one window ``sum`` — a single shuffle on
the group key, window state bounded by group size.  At 100 TB, groups are
the packing parallelism: each produces an independent stream of bins
(``grp``, ``bin_in_grp``), globally unique as a pair.

No reference analog (the reference packs nothing); this is part of the
training-data surface SURVEY §6 scopes in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, budget: int,
                   id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   num_groups: int = 16,
                   order_col: str | None = None) -> DataFrame:
    """Assign each doc a packing bin: ``(id, grp, bin_in_grp, start_offset,
    n_tokens)`` where ``start_offset`` is the doc's position in its group's
    concatenated token stream and ``bin_in_grp = start_offset div budget``.

    A doc longer than ``budget`` starts in its bin and spills into the
    next — exactly what concat-and-chunk training does (documents cross
    chunk boundaries; the attention mask, not the layout, separates them).

    ``order_col`` (default: the id) must be a deterministic total order
    within each group — packing is only reproducible if the stream is.

    Any id dtype works: numeric ids group by ``pmod(id, num_groups)``
    directly; everything else (string doc keys, the common case in real
    corpora) is md5-hashed to a 60-bit int first — same deterministic,
    engine-portable arithmetic as ``functions.hashing`` (oracle mirror:
    ``CAST(('0x' || substr(md5(id), 1, 15)) AS BIGINT) % num_groups``).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    order = order_col or id_col
    dt = dict(df.dtypes).get(id_col, "")
    if dt in ("tinyint", "smallint", "int", "bigint"):
        grp_key = F.col(id_col)
    else:
        from openai_vector_search_demo_spark.functions.text_analysis import (
            _hash60,
        )
        grp_key = _hash60(F.col(id_col).cast("string"))
    grp = F.pmod(grp_key, F.lit(num_groups)).cast("int")
    w = (Window.partitionBy("grp").orderBy(F.col(order).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = df.withColumn("grp", grp)
    cum = F.sum(F.col(tokens_col)).over(w)
    start = (cum - F.col(tokens_col)).cast("long")
    return (d.withColumn("start_offset", start)
            .withColumn("bin_in_grp",
                        F.expr(f"start_offset div {int(budget)}").cast("int"))
            .select(F.col(id_col), "grp", "bin_in_grp", "start_offset",
                    F.col(tokens_col)))


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin occupancy accounting over :func:`pack_sequences` output:
    docs per bin and tokens STARTING in the bin (the concat-and-chunk
    stream fills every non-final bin to exactly ``budget`` tokens; this
    reports layout stats, not fill — fill is 100% by construction)."""
    return (packed.groupBy("grp", "bin_in_grp")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("tokens_starting"))
            .orderBy("grp", "bin_in_grp"))
