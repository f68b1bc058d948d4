"""S5–S7 — index lifecycle as Spark catalog operations.

Reference semantics (SURVEY §2.1, §3.3):
- create is idempotent (`createRedisIndex` checks existence first,
  modules/utilities.py:266, "Index already exists" :289);
- the index name and key prefix are the same string — the tenant alias —
  optionally SHA-1-"encrypted" (modules/utilities.py:234-235,263-264);
- drop keeps the documents (`delete_documents=False`, :247) — i.e. the
  catalog entry is metadata over externally-owned storage.

Spark mapping: an **external parquet table partitioned by tenant**.  CREATE
TABLE registers metadata over a LOCATION; DROP TABLE removes only metadata;
per-tenant scoping is partition pruning instead of a key prefix.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

# the chunks-table schema (SURVEY §1.1 row #2; FIXTURES.md `chunks`)
CHUNKS_DDL = (
    "id STRING, doc_path STRING, page_no INT, "
    "page_content STRING, embedding ARRAY<FLOAT>"
)
PARTITION_COL = "tenant"


def encode_name(name: str) -> str:
    """The reference's optional index-name 'encryption' — hex SHA-1
    (modules/utilities.py:98-99 via encode())."""
    return hashlib.sha1(name.encode("utf-8")).hexdigest()


import re

_IDENT = re.compile(r"[A-Za-z0-9_]+")


def _safe_identifier(name: str) -> str:
    """Reject identifiers the metastore will refuse (it allows only
    alphanumerics and underscore — a hyphenated alias fails CREATE with
    INVALID_SCHEMA_OR_RELATION_NAME even backtick-quoted) and anything that
    would escape backtick quoting in interpolated DDL.  Arbitrary tenant
    aliases go through ``encrypt_name=True``: the reference's own SHA-1
    name 'encryption' (modules/utilities.py:234-235) always yields a legal
    hex identifier."""
    if not _IDENT.fullmatch(name):
        raise ValueError(
            f"illegal table identifier {name!r} (metastore allows only "
            f"[A-Za-z0-9_]); pass encrypt_name=True to hash arbitrary aliases")
    return name


def _safe_location(location: str) -> str:
    """Escape single quotes for the LOCATION string literal."""
    if "\x00" in location:
        raise ValueError(f"illegal location: {location!r}")
    return location.replace("'", "''")


def create_index(spark: SparkSession, name: str, location: str,
                 encrypt_name: bool = False) -> bool:
    """Idempotent CREATE (S5).  Returns True if created, False if it already
    existed (the reference logs "Index already exists").

    If the LOCATION already holds partitioned data (the S7-drop-keeps-data →
    S5-recreate round trip), the partitions are recovered into the catalog
    (MSCK REPAIR) — without this, the recreated table silently reads empty
    because CREATE registers no partitions for pre-existing directories.
    Repair runs through SQL with the identifier backticked, gated only on
    the LOCATION existing — checked via the Hadoop FS API, so s3://,
    hdfs:// and every other scheme recover the same as local paths (an
    os.scandir pre-check would only ever see local directories, silently
    reading empty after recreate on object stores).  MSCK itself raises on
    a missing path, hence the existence gate; an existing-but-empty
    LOCATION repairs to zero partitions at the cost of one listing.
    """
    table = _safe_identifier(encode_name(name) if encrypt_name else name)
    if index_exists(spark, table):
        return False
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{table}` ({CHUNKS_DDL}, "
        f"{PARTITION_COL} STRING) USING parquet "
        f"PARTITIONED BY ({PARTITION_COL}) LOCATION '{_safe_location(location)}'")
    try:
        # classic-session path: one FS existence probe gates the repair
        # (MSCK raises on a missing LOCATION)
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(location)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        location_exists = bool(fs.exists(hpath))
    except Exception:
        # Spark Connect: no _jvm gateway — attempt the repair and treat a
        # missing-LOCATION failure as "nothing to recover" (the table was
        # just created, so no partitions can be lost by skipping)
        try:
            spark.sql(f"MSCK REPAIR TABLE `{table}`")
        except Exception:
            pass
        return True
    if location_exists:
        spark.sql(f"MSCK REPAIR TABLE `{table}`")
    return True


def index_exists(spark: SparkSession, name: str,
                 encrypt_name: bool = False) -> bool:
    """S6 — FT.INFO probe → catalog lookup.  A name the metastore would
    refuse (anything outside [A-Za-z0-9_] — see ``_safe_identifier``) can
    never have been created, so the existence probe answers False for it
    instead of raising: create/exists/drop stay consistent about the same
    string, and probing an arbitrary un-encrypted alias is harmless."""
    raw = encode_name(name) if encrypt_name else name
    if not _IDENT.fullmatch(raw):
        return False
    return spark.catalog.tableExists(f"`{raw}`")


def drop_index(spark: SparkSession, name: str, delete_documents: bool = False,
               encrypt_name: bool = False) -> None:
    """S7 — drop metadata; external LOCATION means the parquet files stay
    unless delete_documents=True (then callers clean the path themselves —
    kept explicit, mirroring dropindex(delete_documents) signature)."""
    if delete_documents:
        # refuse BEFORE any side effect — dropping first and then raising
        # would leave the catalog mutated behind a failed call
        raise NotImplementedError(
            "storage deletion is owner-managed for external tables; "
            "remove the LOCATION path explicitly")
    table = _safe_identifier(encode_name(name) if encrypt_name else name)
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")


COLUMNS = ["id", "doc_path", "page_no", "page_content", "embedding", "tenant"]


def write_bucketed(df: DataFrame, name: str, bucket_col: str,
                   num_buckets: int = 32,
                   sort_col: str | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) by a join key.

    Two tables bucketed by the same key into the same bucket count join
    WITHOUT a shuffle — the rows are already co-located per bucket.  At
    100 TB this turns every recurring fact-to-fact join on that key from a
    full-network shuffle into a local zip (see tests/test_plans.py for the
    pinned no-Exchange plan).  Spark bucketing requires saveAsTable
    (metastore-managed); bucket pruning applies to equality filters on the
    bucket column.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(name)


def _quote_qualified(name: str) -> str:
    """Backtick-quote a possibly db-qualified table name (``db.chunks``):
    each dot-separated part is validated separately, so qualified names that
    ``spark.table``/``insertInto`` accept resolve here too instead of being
    rejected for the dot."""
    return ".".join(f"`{_safe_identifier(p)}`" for p in name.split("."))


def table_location(spark: SparkSession, name: str) -> str | None:
    """The table's storage LOCATION from the catalog (None if unavailable)."""
    from pyspark.sql import functions as F
    row = (spark.sql(f"DESCRIBE FORMATTED {_quote_qualified(name)}")
           .filter(F.col("col_name") == "Location").first())
    return row.data_type if row else None


def _stage_write(resolved: DataFrame, staging: str) -> None:
    """Seam for the staging write (tests inject racing writers here)."""
    resolved.write.mode("overwrite").parquet(staging)


def upsert_chunks(spark: SparkSession, chunks: DataFrame, name: str,
                  staging_dir: str | None = None) -> None:
    """S8/S9 — batch put with HSET per-key upsert semantics.

    Merge-then-swap: union the incoming batch with the existing rows of the
    affected tenants, keep the incoming row per (tenant, doc_path, page_no),
    stage to a scratch path (Spark refuses to overwrite a location it is
    reading), then dynamic-partition-overwrite ONLY those tenants.  Other
    tenants' partitions are never rewritten — per-batch cost scales with the
    touched tenants, not the table.

    SINGLE-WRITER per tenant partition, with BEST-EFFORT detection of
    violations: rows appended to an affected tenant between the merge read
    and the partition overwrite would be silently deleted by the swap, so
    the touched partitions' file listings are snapshotted before staging
    and re-checked after — a concurrent change seen by the re-check aborts
    the upsert with the table untouched (same guard
    ``maintenance.compact_parquet`` applies to whole tables).  The window
    between the second snapshot and insertInto completing is NOT covered —
    a writer landing there is still clobbered — and the listing check only
    sees local filesystems; the production substitute is a transactional
    table format's commit-time conflict detection (SCALE.md).
    """
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from openai_vector_search_demo_spark.operators.maintenance import _listing

    incoming = chunks.dropDuplicates(["tenant", "doc_path", "page_no"])
    tenants = [r[0] for r in incoming.select("tenant").distinct().collect()]
    existing = spark.table(name).filter(F.col("tenant").isin(tenants))
    merged = (existing.withColumn("_pri", F.lit(0))
              .unionByName(incoming.select(*COLUMNS).withColumn("_pri", F.lit(1))))
    from openai_vector_search_demo_spark.operators.dedup import latest_wins
    resolved = latest_wins(merged, keys=["tenant", "doc_path", "page_no"],
                           order_col="_pri").drop("_pri").select(*COLUMNS)

    loc = table_location(spark, name)
    guard_dirs: list[str] = []
    if loc and loc.startswith("file:"):
        base = loc[len("file:"):]
        guard_dirs = [os.path.join(base, f"{PARTITION_COL}={t}")
                      for t in tenants]

    def _snapshot():
        return {d: (_listing(d) if os.path.isdir(d) else None)
                for d in guard_dirs}

    own_staging = staging_dir is None
    staging = staging_dir or tempfile.mkdtemp(prefix="chunks_upsert_")
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        before = _snapshot()
        _stage_write(resolved, staging)   # reads the table, writes staging
        if _snapshot() != before:
            raise RuntimeError(
                f"tenant partition(s) of `{name}` changed during upsert "
                f"(concurrent writer?); staging discarded, table untouched "
                f"— serialize writers per tenant and re-run")
        spark.read.parquet(staging).select(*COLUMNS) \
            .write.mode("overwrite").insertInto(name)
    finally:
        # session conf is shared state — restore what the caller had
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        if own_staging:
            shutil.rmtree(staging, ignore_errors=True)
