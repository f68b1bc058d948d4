# Split from the single-file registry (r14); see _shared for the
# registry, decorator, and parity conventions.
from __future__ import annotations

from openai_vector_search_demo_spark.queries._shared import *  # noqa: F401,F403
from openai_vector_search_demo_spark.queries.events_windows import _STREAM_SEQ  # noqa: F401
from openai_vector_search_demo_spark.queries.dedup import _MINHASH_ORACLE  # noqa: F401

# Standard relational surface (joins/aggs/windows Spark provides natively;
# included because a reference user switching engines runs these too, and the
# bench exercises them at sf0.1)
# ---------------------------------------------------------------------------

@query("tpch_q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-scan aggregate with 8 simultaneous aggregates per group — partial aggregation map-side, one shuffle of pre-combined groups."""
    li = t(spark, sf_dir, "lineitem")
    # timestamp_ntz: the parquet column is NTZ; a plain "timestamp" cast
    # would interpret the literal in the driver's session timezone
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


@query("tpch_q6_revenue_forecast", oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan+filter+agg — the pushdown showcase: every predicate reaches
    the parquet reader (PushedFilters), only 4 columns are read."""
    li = t(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue")))


@query("semi_anti_customers", oracle="""
SELECT c.c_custkey, c.c_name,
       CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            THEN 'active' ELSE 'inactive' END AS status
FROM customer c
""")
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins (SURVEY §2.6: the engine inherits the full
    join family from Spark; this query pins both null-safe forms)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    active = (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
              .select("c_custkey", "c_name", F.lit("active").alias("status")))
    inactive = (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
                .select("c_custkey", "c_name", F.lit("inactive").alias("status")))
    return active.unionByName(inactive)


@query("setops_segments", oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
UNION
SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""")
def setops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT with SQL's left-to-right same-precedence
    chaining ((A ∩ B) ∪ C) \\ D — distinct set semantics throughout."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    a = (c.filter(F.col("c_mktsegment") == "BUILDING")
         .select(F.col("c_custkey")))
    b = (o.filter(F.col("o_totalprice") > 100000)
         .select(F.col("o_custkey").alias("c_custkey")))
    d = (c.filter(F.col("c_mktsegment") == "MACHINERY")
         .select(F.col("c_custkey")))
    e = (o.filter(F.col("o_orderstatus") == "F")
         .select(F.col("o_custkey").alias("c_custkey")))
    return a.intersect(b).union(d).distinct().exceptAll(e.distinct()) \
            .distinct()


@query("window_customer_order_rank", oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rnk, ROUND(running_total, 2) AS running_total
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk,
         SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey ASC
                                 ROWS UNBOUNDED PRECEDING) AS running_total
  FROM orders)
WHERE rnk <= 3
""")
def window_customer_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + running-sum window frames per customer (top-3 orders)."""
    from pyspark.sql import Window
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (o.select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.row_number().over(w).alias("rnk"),
        F.round(F.sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
        .alias("running_total"))
        .filter(F.col("rnk") <= 3))


@query("corpus_distinct_stats", oracle="""
SELECT COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT event_type) AS n_event_types,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id || '|' || event_type) AS n_user_type_pairs
FROM events
""")
def corpus_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-distinct aggregation (the oracle-checkable form;
    `approx_count_distinct` is benchmarked rows-only below as the 100 TB
    path — HLL sketches don't hash-match across engines by design)."""
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.concat_ws("|", "user_id", "event_type"))
        .alias("n_user_type_pairs"))


@query("corpus_approx_stats")  # HLL sketches are engine-specific → rows-only
def corpus_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — sketch-based distincts whose
    merge is associative, i.e. one pass, no distinct-shuffle: the form that
    survives 100 TB.  rsd pinned for determinism."""
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.approx_count_distinct("event_type", rsd=0.02).alias("approx_event_types"),
        F.count(F.lit(1)).alias("n_events"))


@query("join_top_customers", oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""")
def join_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join + agg + top-k.  Dimension sides (customer, nation) are
    broadcast — no shuffle of lineitem beyond the final group-by."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    n = t(spark, sf_dir, "nation")
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return (joined.groupBy("c_custkey", "c_name", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
            .limit(20))


# ---------------------------------------------------------------------------
# OLAP grouping surface: ROLLUP / CUBE / GROUPING SETS (engine extension —
# the reference has no group-by at all, SURVEY §2.6; these are table stakes
# for a warehouse-scale engine and plan as ONE shuffle with the grouping-id
# expand, not one job per level)
# ---------------------------------------------------------------------------

@query("rollup_revenue_region_nation", oracle="""
SELECT r.r_name, n.n_name,
       GROUPING(r.r_name) AS g_region, GROUPING(n.n_name) AS g_nation,
       ROUND(SUM(o.o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""")
def rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (region → nation → grand total) in one pass:
    Spark's Expand operator duplicates each row once per grouping level
    before a single hash aggregate — no per-level re-scan.  Dimensions are
    broadcast; only the expanded fact shuffles, partially pre-aggregated
    map-side.  GROUPING() flags disambiguate rolled-up NULLs from data
    NULLs (emitted identically by DuckDB)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (joined.rollup("r_name", "n_name")
            .agg(F.grouping("r_name").cast("int").alias("g_region"),
                 F.grouping("n_name").cast("int").alias("g_nation"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders"))
            .select("r_name", "n_name", "g_region", "g_nation",
                    "revenue", "n_orders"))


@query("cube_orders_status_priority", oracle="""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations in one shuffle (Expand factor 4)."""
    o = t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.grouping("o_orderstatus").cast("int").alias("g_status"),
                 F.grouping("o_orderpriority").cast("int").alias("g_priority"),
                 F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .select("o_orderstatus", "o_orderpriority", "g_status",
                    "g_priority", "n_orders", "revenue"))


@query("grouping_sets_customer", oracle="""
SELECT c_mktsegment, c_nationkey,
       GROUPING(c_mktsegment) AS g_seg, GROUPING(c_nationkey) AS g_nat,
       COUNT(*) AS n_customers, ROUND(AVG(c_acctbal), 4) AS avg_acctbal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
""")
def grouping_sets_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping-set selection — segment totals, nation totals, and
    the grand total, one aggregate, no union of three jobs."""
    c = t(spark, sf_dir, "customer")
    return (c.groupingSets([["c_mktsegment"], ["c_nationkey"], []],
                           "c_mktsegment", "c_nationkey")
            .agg(F.grouping("c_mktsegment").cast("int").alias("g_seg"),
                 F.grouping("c_nationkey").cast("int").alias("g_nat"),
                 F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"))
            .select("c_mktsegment", "c_nationkey", "g_seg", "g_nat",
                    "n_customers", "avg_acctbal"))


# ---------------------------------------------------------------------------
# TPC-H breadth: Q3 / Q5 / Q18 shapes (join-reorder + broadcast showcases)
# ---------------------------------------------------------------------------

@query("tpch_q3_shipping_priority", oracle="""
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""")
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into the fact scan,
    group + distributed top-10 (TakeOrderedAndProject, no global sort)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate")
                 < F.lit("1998-03-15").cast("timestamp_ntz")))
    li = (t(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate")
                  > F.lit("1998-03-15").cast("timestamp_ntz")))
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey))
    return (joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
            .limit(10))


@query("tpch_q5_local_supplier_volume", oracle="""
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC
""")
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join where the only big-big join is
    lineitem⋈orders; customer/supplier/nation/region all broadcast, and the
    c_nationkey = s_nationkey 'local supplier' predicate rides the supplier
    broadcast instead of forcing an extra shuffle."""
    c = t(spark, sf_dir, "customer")
    o = (t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate")
                  >= F.lit("1997-01-01").cast("timestamp_ntz"))
                 & (F.col("o_orderdate")
                    < F.lit("1998-01-01").cast("timestamp_ntz"))))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
                    & (c.c_nationkey == s.s_nationkey))
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (joined.groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.col("revenue").desc()))


@query("tpch_q18_large_volume_customer", oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       ROUND(o.o_totalprice, 2) AS o_totalprice,
       SUM(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o.o_orderkey ASC
LIMIT 100
""")
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the HAVING subquery becomes a pre-aggregated
    key-set LEFT SEMI join — the fact table is filtered before the wide
    join, not after."""
    li = t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
           .filter(F.col("qty") > 250).select("l_orderkey"))
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    filtered = o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
    joined = (li.join(filtered, li.l_orderkey == filtered.o_orderkey)
              .join(F.broadcast(c), filtered.o_custkey == c.c_custkey))
    return (joined.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                           "o_totalprice")
            .agg(F.sum("l_quantity").alias("total_qty"))
            .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    "total_qty")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(100))


# ---------------------------------------------------------------------------
# Banded range join (point-in-interval without a cross product)
# ---------------------------------------------------------------------------

_PRICE_BAND_WIDTH = 5_000


@query("range_join_price_bands", oracle=f"""
WITH bands AS (
  SELECT CAST(i AS INTEGER) AS band_id,
         CAST(i * {_PRICE_BAND_WIDTH} AS DOUBLE) AS lo,
         CAST((i + 1) * {_PRICE_BAND_WIDTH} AS DOUBLE) AS hi
  FROM UNNEST(range(21)) AS u(i))
SELECT b.band_id, b.lo, b.hi, COUNT(*) AS n_items,
       ROUND(SUM(l.l_extendedprice), 2) AS total_price
FROM lineitem l JOIN bands b
  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band_id, b.lo, b.hi
""")
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price histogram via the banded range-join operator: each lineitem
    lands in exactly one bucket, bands explode to their covered buckets,
    and the match is a shuffle equi-join — the oracle's non-equi join is
    the semantics, never the plan (that would be a nested loop)."""
    from openai_vector_search_demo_spark.operators.ranges import band_join
    li = t(spark, sf_dir, "lineitem").select("l_extendedprice")
    bands = (spark.range(21)
             .select(F.col("id").cast("int").alias("band_id"),
                     (F.col("id") * _PRICE_BAND_WIDTH).cast("double")
                     .alias("lo"),
                     ((F.col("id") + 1) * _PRICE_BAND_WIDTH).cast("double")
                     .alias("hi")))
    joined = band_join(li, bands, "l_extendedprice",
                       bucket_width=_PRICE_BAND_WIDTH)
    return (joined.groupBy("band_id", "lo", "hi")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum("l_extendedprice"), 2).alias("total_price")))


# ---------------------------------------------------------------------------
# Structured Streaming: stream-static join
# ---------------------------------------------------------------------------

_TIER_NAMES = ["bronze", "silver", "gold", "platinum", "diamond"]

_STREAM_STATIC_ORACLE = f"""
WITH tiers AS (
  SELECT CAST(i AS BIGINT) AS tier_id, ['{"','".join(_TIER_NAMES)}'][i + 1] AS tier
  FROM UNNEST(range({len(_TIER_NAMES)})) AS u(i))
SELECT t.tier, COUNT(*) AS n_events, ROUND(SUM(e.value), 2) AS total_value
FROM events e JOIN tiers t ON e.user_id % {len(_TIER_NAMES)} = t.tier_id
GROUP BY t.tier
"""


@query("streaming_stream_static_join", oracle=_STREAM_STATIC_ORACLE)
def streaming_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: each micro-batch of the event stream joins the
    static tier dimension (broadcast — re-resolved per batch, the Spark
    pattern for slowly-changing dims), then a running aggregate.  Executed
    as a real availableNow streaming job and hash-checked against the batch
    oracle."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    name = f"stream_static_{next(_STREAM_SEQ)}"
    try:
        # schema from a batch read of the same path (see tumbling counts)
        stream = (spark.readStream
                  .schema(_read_events_raw(spark, sf_dir).schema)
                  .format("parquet").option("pathGlobFilter", "events.parquet")
                  .load(sf_dir))
        tiers = spark.createDataFrame(
            list(enumerate(_TIER_NAMES)), "tier_id long, tier string")
        agg = (stream
               .join(F.broadcast(tiers),
                     stream.user_id % len(_TIER_NAMES) == tiers.tier_id)
               .groupBy("tier")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.round(F.sum("value"), 2).alias("total_value")))
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(300)
        out = spark.table(name).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
        spark.catalog.dropTempView(name)
    return out


# ---------------------------------------------------------------------------
# JSON + pivot/unpivot surface (§2.6 noted "no JSON/map functions" in the
# reference; standard warehouse surface, so pinned here)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query("json_extract_props", oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 10
GROUP BY event_type
""")
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over a JSON payload column: ``from_json`` with an
    explicit schema (vectorized JVM parse inside codegen — never a Python
    UDF), filter on the extracted field, aggregate.  At scale the parse
    happens once in the scan stage; only (event_type, k) survive pruning."""
    ev = load_events(spark, sf_dir)
    k = F.from_json("props", "k bigint").getField("k")
    return (ev.select("event_type", k.alias("k"))
            .filter(F.col("k") >= 10)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("k").alias("sum_k"),
                 F.max("k").alias("max_k")))


_PIVOT_ORACLE = """
SELECT user_id % 10 AS user_bucket,
       {cols}
FROM events
GROUP BY user_id % 10
""".format(cols=",\n       ".join(
    f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}"
    for t in _EVENT_TYPES))


@query("pivot_event_type_counts", oracle=_PIVOT_ORACLE)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide: ``pivot`` with an EXPLICIT value list — without it Spark
    runs an extra distinct job to discover columns and the output schema
    becomes data-dependent (nondeterministic at 100 TB).  Plans as one
    hash aggregate with per-value count expressions."""
    ev = load_events(spark, sf_dir)
    return (ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
            .pivot("event_type", _EVENT_TYPES)
            .count()
            .na.fill(0, _EVENT_TYPES))


@query("unpivot_event_type_counts", oracle="""
SELECT user_id % 10 AS user_bucket, event_type, COUNT(*) AS n
FROM events
GROUP BY user_id % 10, event_type
""")
def unpivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long (melt): unpivot the pivoted matrix back to tidy rows —
    round-trips to exactly the plain GROUP BY the oracle runs.  Zero-count
    cells (absent combinations) are dropped to match the long form."""
    wide = pivot_event_type_counts(spark, sf_dir)
    return (wide.unpivot("user_bucket", _EVENT_TYPES, "event_type", "n")
            .filter(F.col("n") > 0))


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS ({_MINHASH_ORACLE}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
)
SELECT u AS id, LEAST(MIN(v), u) AS cluster_id FROM reach GROUP BY u
"""


@query("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup pairs collapsed to duplicate clusters via
    large-star/small-star connected components (O(log²) shuffle rounds —
    transitive chains A~B~C land in one cluster, which no pairwise join can
    express).  The oracle computes the same components with a recursive
    transitive closure — fine at sf, quadratic per component at scale,
    which is exactly why the engine runs star-contraction instead."""
    from openai_vector_search_demo_spark.operators.dedup import (
        duplicate_clusters,
        minhash_lsh_pairs,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4, threshold=0.5)
    return duplicate_clusters(pairs)


# ---------------------------------------------------------------------------
