"""Deterministic training-shard export — the last stage of a data
pipeline: lay a curated corpus out as N pseudorandomly-ordered shards a
trainer can stream.

Why hash-ordering instead of ``orderBy(rand())``: a training shuffle must
be *reproducible* (re-runs bit-identical, resumable mid-epoch) and must
not cost a global sort.  Hashing the document key gives both — the order
is fixed by the data, each shard is an independent hash bucket, and the
layout is one hash repartition + per-partition sort (no range exchange,
no sampling pass, no driver involvement).  At 100 TB the repartition is
the only wide shuffle and each output task writes exactly one shard.

The same md5-60bit hash the engine uses everywhere (``functions.
text_analysis._hash60``) keys the layout, so a DuckDB oracle reproduces
shard assignment AND order bit-for-bit (``queries._SQL_H60``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.hashing import sample_priority
from openai_vector_search_demo_spark.functions.text_analysis import _hash60

__all__ = ["assign_shards", "write_shards", "shard_manifest",
           "rendezvous_shard"]


def _shard_key(id_col: str, salt: str) -> Column:
    # one definition of the '<salt>:<key>' 60-bit layout engine-wide
    return sample_priority(id_col, seed=salt)


def assign_shards(df: DataFrame, id_col: str, num_shards: int,
                  salt: str = "0") -> DataFrame:
    """Add ``sort_key`` (the 60-bit salted document hash — nonnegative, so
    ``%`` and ``pmod`` agree cross-engine) and ``shard`` (= sort_key mod
    ``num_shards``).  ``salt`` varies the permutation: one corpus, many
    independent epoch orders."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    key = _shard_key(id_col, salt)
    return (df.withColumn("sort_key", key)
              .withColumn("shard",
                          F.pmod(F.col("sort_key"),
                                 F.lit(num_shards)).cast("int")))


def write_shards(df: DataFrame, path: str, id_col: str, num_shards: int,
                 salt: str = "0") -> None:
    """Materialize the sharded layout: ``path/shard=K/`` directories, rows
    inside each shard in ``sort_key`` order.

    ``repartition(num_shards, shard)`` hash-partitions on the shard value,
    so each shard lands WHOLE in some task (two shards may share a task
    and some tasks may be empty — hash collisions don't break the layout,
    they only skew task sizes), and ``sortWithinPartitions("shard",
    "sort_key")`` orders rows before the writer sees them — so each shard
    directory still gets exactly one sorted parquet file per writing task
    that holds it, not ``partitionBy``'s usual task×key fan-out of small
    files.  If a strict one-task-per-shard layout is ever required (e.g.
    fixed file counts for a reader contract), route by partition id with
    ``repartitionByRange(num_shards, "shard")`` instead and accept the
    range-exchange cost."""
    out = assign_shards(df, id_col, num_shards, salt)
    (out.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "sort_key")
        .write.mode("overwrite").partitionBy("shard").parquet(path))


def shard_manifest(df: DataFrame, id_col: str, num_shards: int,
                   salt: str = "0",
                   token_count: Column | None = None) -> DataFrame:
    """The layout's accounting view — per shard: document count, token
    count (if ``token_count`` given), and the key range.  One hash
    aggregate over the assignment; the trainer reads this to size epochs
    and the oracle value-checks the whole layout through it."""
    a = assign_shards(df, id_col, num_shards, salt)
    aggs = [F.count("*").alias("n_docs"),
            F.min("sort_key").alias("min_key"),
            F.max("sort_key").alias("max_key")]
    if token_count is not None:
        aggs.insert(1, F.sum(token_count).alias("n_tokens"))
    return a.groupBy("shard").agg(*aggs)


def rendezvous_shard(df: DataFrame, id_col: str, shards: list[str],
                     salt: str = "0", out: str = "shard") -> DataFrame:
    """Highest-random-weight (rendezvous / HRW) shard assignment — the
    ELASTIC counterpart of ``assign_shards``'s ``hash % N``: each key
    goes to the shard maximizing ``h(key, shard)``, so adding a shard
    moves only the keys whose new per-shard hash wins — an expected
    1/(N+1) of the corpus — and removing one moves only ITS keys.
    ``pmod`` remaps nearly everything on any N change (a key stays put
    only when ``h % N == h % N'``), which at 100 TB is the difference
    between rebalancing one shard's worth of bytes and rewriting the
    corpus (the Thaler/HRW + consistent-hashing argument; same law
    memcached/Dynamo rings rely on).

    Shape: the shard list is tiny and rides the plan as an array
    literal — per row, |shards| hash evaluations and one ``array_max``
    over (hash, name) structs (struct comparison is lexicographic, so
    the name breaks 60-bit hash ties deterministically).  MAP-ONLY: no
    join, no shuffle, no driver state; the oracle replays it with an
    unnest + argmax window.
    """
    if not shards or len(set(shards)) != len(shards):
        raise ValueError("shards must be a non-empty list of unique names")
    key = F.col(id_col).cast("string")
    scored = F.array(*[
        F.struct(
            _hash60(F.concat_ws(":", F.lit(salt), key, F.lit(s))).alias("h"),
            F.lit(s).alias("s"))
        for s in shards])
    return df.withColumn(out, F.array_max(scored).getField("s"))
