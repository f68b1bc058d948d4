# Split from the single-file registry (r14); see _shared for the
# registry, decorator, and parity conventions.
from __future__ import annotations

from openai_vector_search_demo_spark.queries._shared import *  # noqa: F401,F403
from openai_vector_search_demo_spark.queries.events_windows import _FLAGSHIP_Q  # noqa: F401
from openai_vector_search_demo_spark.queries.text_analysis import _SQL_TOKS  # noqa: F401
from openai_vector_search_demo_spark.queries.dedup import _MINHASH_ORACLE  # noqa: F401

# Window-function breadth: lead/lag + running frames
# ---------------------------------------------------------------------------

@query("window_lead_lag_running", oracle="""
SELECT o_custkey, o_orderkey,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_total,
       ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg3
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""")
def window_lead_lag_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag + running-total + bounded moving-average frames over one
    window spec — one hash partition by customer, one sort within, all four
    window functions evaluated in a single Window physical operator."""
    from pyspark.sql import Window
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(),
                                                F.col("o_orderkey").asc())
    return o.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.round(F.sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
        .alias("running_total"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4)
        .alias("moving_avg3"))


@query("string_function_surface", oracle="""
SELECT p_partkey,
       levenshtein(p_name, p_brand) AS lev,
       reverse(p_name) AS rev,
       repeat(substr(p_name, 1, 3), 2) AS rep3x2,
       lpad(p_brand, 10, '*') AS padded,
       split_part(p_name, ' ', 1) AS first_word,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       instr(p_name, 'a') AS pos_a,
       replace(p_name, ' ', '_') AS snake,
       concat_ws('|', p_brand, p_type, CAST(p_size AS VARCHAR)) AS packed
FROM part
""")
def string_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string scalar surface in one pass — edit distance, reverse /
    repeat / pad, delimiter split, character translate, substring search,
    replace, and null-skipping concat — all JVM codegen'd builtins (no
    Python), value-pinned cross-engine against DuckDB's identically-named
    functions."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_brand").alias("lev"),
        F.reverse("p_name").alias("rev"),
        F.repeat(F.substring("p_name", 1, 3), 2).alias("rep3x2"),
        F.lpad("p_brand", 10, "*").alias("padded"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
        .alias("first_word"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.instr("p_name", "a").alias("pos_a"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.concat_ws("|", "p_brand", "p_type",
                    F.col("p_size").cast("string")).alias("packed"))


@query("window_distribution_ranks", oracle="""
SELECT c_custkey, c_mktsegment,
       ntile(4) OVER w AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal ASC, c_custkey ASC)
""")
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile / percent_rank / cume_dist —
    over one window spec (single Window physical operator).  The ordering
    key includes the unique c_custkey tiebreak so peer groups are
    singletons and both engines agree exactly."""
    from pyspark.sql import Window
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey", "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"))


# ---------------------------------------------------------------------------
# TPC-H Q4 (EXISTS) and Q17 (correlated scalar subquery) shapes
# ---------------------------------------------------------------------------

@query("tpch_q4_order_priority", oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: the EXISTS decorrelates to a LEFT SEMI join — the
    lineitem side is pre-filtered by the correlated predicate and never
    materializes a row per match."""
    o = (t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate")
                  >= F.lit("1997-01-01").cast("timestamp_ntz"))
                 & (F.col("o_orderdate")
                    < F.lit("1997-04-01").cast("timestamp_ntz"))))
    li = t(spark, sf_dir, "lineitem")
    matched = o.join(
        li, (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate), "left_semi")
    return (matched.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@query("tpch_q17_small_quantity_revenue", oracle="""
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""")
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated scalar AVG decorrelates into one
    groupBy(partkey) aggregate joined back to the fact — the subquery runs
    ONCE over the table, not once per row."""
    li = t(spark, sf_dir, "lineitem")
    p = (t(spark, sf_dir, "part")
         .filter(F.col("p_brand") == "Brand#1").select("p_partkey"))
    avg_qty = (li.groupBy("l_partkey")
               .agg((0.2 * F.avg("l_quantity")).alias("qty_cap"))
               .withColumnRenamed("l_partkey", "cap_partkey"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(avg_qty, li.l_partkey == F.col("cap_partkey"))
            .filter(F.col("l_quantity") < F.col("qty_cap"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
                 .alias("avg_yearly")))


@query("events_gap_filled_hourly", oracle="""
WITH hourly AS (
  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h,
         COUNT(*) AS n, SUM(value) AS sv
  FROM events WHERE user_id < 8 GROUP BY 1, 2),
bounds AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx
           FROM hourly GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 hour)) AS h
         FROM bounds)
SELECT g.user_id, epoch_us(g.h) AS hour_us,
       COALESCE(n, 0) AS n_events,
       ROUND(COALESCE(sv, 0.0), 6) AS sum_value
FROM grid g LEFT JOIN hourly USING (user_id, h)
""")
def events_gap_filled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: hours with no events appear as explicit
    zero rows (resampling/gap-fill — a training-feature staple).  The hour
    grid is generated DISTRIBUTED — sequence() per user between that user's
    own bounds, exploded — never a driver-side date loop; the left join
    back is a plain shuffle equi-join on (user, hour)."""
    ev = load_events(spark, sf_dir).filter(F.col("user_id") < 8)
    hourly = (ev.groupBy("user_id",
                         F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("value").alias("sv")))
    grid = (hourly.groupBy("user_id")
            .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
            .select("user_id",
                    F.explode(F.expr(
                        "sequence(mn, mx, interval 1 hour)")).alias("h")))
    return (grid.join(hourly, ["user_id", "h"], "left")
            .select("user_id",
                    F.unix_micros("h").alias("hour_us"),
                    F.coalesce("n", F.lit(0)).alias("n_events"),
                    F.round(F.coalesce("sv", F.lit(0.0)), 6)
                    .alias("sum_value")))


@query("dedup_keep_best_per_cluster", oracle=f"""
WITH RECURSIVE pairs AS ({_MINHASH_ORACLE}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
),
clusters AS (SELECT u AS id, LEAST(MIN(v), u) AS cluster_id
             FROM reach GROUP BY u),
ranked AS (
  SELECT c.cluster_id, c.id, length(d.text) AS text_len,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY length(d.text) DESC, c.id ASC) AS rn
  FROM clusters c JOIN documents d ON d.doc_id = c.id)
SELECT cluster_id, id AS kept_doc_id, text_len AS kept_text_len,
       (SELECT COUNT(*) FROM clusters c2
        WHERE c2.cluster_id = ranked.cluster_id) AS n_members
FROM ranked WHERE rn = 1
""")
def dedup_keep_best_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END GAME: near-dup pairs → connected clusters → ONE kept
    representative per cluster (longest text, ties to the smallest id —
    the usual keep-the-most-complete-copy policy).  Everything after pair
    generation is one components run + one window over clusters."""
    from pyspark.sql import Window
    from openai_vector_search_demo_spark.operators.dedup import (
        duplicate_clusters,
        minhash_lsh_pairs,
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=4, threshold=0.5)
    clusters = duplicate_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"))
    scored = (clusters.join(docs, clusters.id == docs.doc_id)
              .select("cluster_id", "id", F.length("text").alias("text_len")))
    w = Window.partitionBy("cluster_id").orderBy(F.col("text_len").desc(),
                                                 F.col("id").asc())
    best = (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    return (best.join(sizes, "cluster_id")
            .select("cluster_id", F.col("id").alias("kept_doc_id"),
                    F.col("text_len").alias("kept_text_len"), "n_members"))


def _curation_oracle() -> str:
    """Compose the full curation pipeline from the already-verified oracle
    fragments: quality + language-ID + minhash-cluster + representative
    selection — one source of truth per stage, reused verbatim."""
    return f"""
WITH RECURSIVE ql AS ({ORACLE_SQL['ta_quality_score']}),
lg AS ({ORACLE_SQL['ta_language_id']}),
pairs AS ({_MINHASH_ORACLE}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
),
clusters AS (SELECT u AS id, LEAST(MIN(v), u) AS cluster_id
             FROM reach GROUP BY u),
ranked AS (
  SELECT c.id, ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY length(d.text) DESC, c.id ASC) AS rn
  FROM clusters c JOIN documents d ON d.doc_id = c.id),
dup_drop AS (SELECT id FROM ranked WHERE rn > 1),
tok AS (SELECT doc_id, len({_SQL_TOKS}) AS n_tokens FROM documents)
SELECT d.doc_id, ql.quality, lg.lang_detected AS lang, tok.n_tokens
FROM documents d
JOIN ql USING (doc_id) JOIN lg USING (doc_id) JOIN tok USING (doc_id)
WHERE ql.quality >= 0.7 AND lg.lang_detected = 'en'
  AND d.doc_id NOT IN (SELECT id FROM dup_drop)
"""


@query("curation_pipeline", oracle=_curation_oracle())
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data CURATION CAPSTONE, one oracled query: quality
    scoring → language filter → near-dup clustering → drop every
    non-representative duplicate → token accounting for what survives.
    Each stage is the same operator its standalone query verifies; the
    oracle is composed from those stages' own SQL fragments, so the
    end-to-end dataflow is value-checked, not just its pieces.

    Shape at scale: ONE corpus scan total — the per-doc scores (codegen'd
    regexp, see ``with_text_scores``) and the text length ride the same
    persisted scan that shingles the text for MinHash
    (``minhash_lsh_pairs_with_side``); everything downstream — band join,
    Jaccard verify, components, the keep-best window, and a broadcast
    anti-join of the (small) drop list — works off that buffer or the
    (tiny) pair set.  No stage materializes the corpus to the driver.

    Runs under ``cache_scope()`` (r10, judge #7) with the result
    eagerly ``localCheckpoint``-ed inside the scope: the shared scan
    buffer and pair-set persists release when the slot returns, the
    deferred collect reads the truncated lineage, and the driver gate
    exercises the release path every round.  CALLER CONTRACT (ADVICE
    r10): the returned frame's checkpoint blocks live until session
    end — long-lived drivers invoking this slot repeatedly should
    ``df.unpersist()`` each result after consuming it."""
    from pyspark.sql import Window
    from openai_vector_search_demo_spark.caching import cache_scope
    from openai_vector_search_demo_spark.functions import text_analysis as ta
    from openai_vector_search_demo_spark.operators.dedup import (
        duplicate_clusters,
        minhash_lsh_pairs_with_side,
    )
    from openai_vector_search_demo_spark.plans.pipeline import spread_for_python
    with cache_scope():
        docs = t(spark, sf_dir, "documents")
        # scoring columns attach BEFORE the dedup call so the one fused
        # scan evaluates them; with_text_scores keeps `text` for the
        # shingle UDF.  SPREAD FIRST: a round-robin exchange does not
        # sink below projections, so scoring after the operator's own
        # spread would run serially on the raw scan split (measured
        # 1.26 s -> 0.47 s for the scoring stage)
        enriched = ta.with_text_scores(spread_for_python(docs))
        pairs, side = minhash_lsh_pairs_with_side(
            enriched,
            keep_cols=["quality", "lang_detected", "n_tokens",
                       F.length("text").alias("text_len")],
            k=3, num_hashes=16, bands=4, threshold=0.5, spread=False)

        clusters = duplicate_clusters(pairs)
        members = clusters.join(side.select("id", "text_len"), "id")
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("text_len").desc(), F.col("id").asc())
        dup_drop = (members.withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") > 1).select("id"))

        kept = (side.filter((F.col("quality") >= 0.7)
                            & (F.col("lang_detected") == "en"))
                .join(dup_drop, "id", "left_anti"))
        out = kept.select(F.col("id").alias("doc_id"),
                          F.round("quality", 6).alias("quality"),
                          F.col("lang_detected").alias("lang"), "n_tokens")
        return out.localCheckpoint(eager=True)


@query("multimodal_image_features")  # binary decode → not SQL-expressible →
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only driver check (the real-codec slots are import-gated; this
    # exercises the full distributed plumbing: binary column → Arrow
    # mapInPandas decode → metadata + histogram features, corrupt rows
    # surfacing as error rows, never task failures)
    """Multimodal columns through the driver gate: 40 deterministic
    synthetic images (+1 corrupt blob) as a binary column, decoded and
    featurized distributed.  Output: media_id, ok, width, height, and the
    16-bin intensity histogram's first moment — stable schema, seeded
    bytes."""
    import numpy as np
    from openai_vector_search_demo_spark.operators.multimodal import (
        encode_synthetic_image,
        image_features,
        image_metadata,
    )
    rng = np.random.RandomState(7)
    rows = [(f"img{i:02d}",
             bytearray(encode_synthetic_image(
                 8 + i % 5, 6 + i % 3,
                 rng.randint(0, 256, (6 + i % 3, 8 + i % 5)))))
            for i in range(40)]
    rows.append(("corrupt", bytearray(b"\x00\x01 not an image")))
    media = spark.createDataFrame(rows, "media_id string, data binary") \
                 .repartition(8)
    meta = image_metadata(media).select("media_id", "ok", "width", "height")
    feats = (image_features(media)
             .select("media_id",
                     F.round(F.aggregate(
                         "features", F.lit(0.0), lambda a, x: a + x), 6)
                     .alias("feat_mass")))
    return (meta.join(feats, "media_id", "left")
            .orderBy("media_id"))


@query("multimodal_audio_features")  # binary decode → rows-only driver check
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio through the driver gate — and unlike the image stages this
    decode is REAL (stdlib `wave` PCM parsing, numpy energy features), not
    a synthetic stand-in: 20 seeded noise/tone clips at mixed sample rates
    plus one corrupt blob, distributed metadata + windowed-RMS extraction,
    corrupt rows surfacing as data."""
    import numpy as np
    from openai_vector_search_demo_spark.operators.multimodal import (
        audio_features,
        audio_metadata,
        encode_wav,
    )
    rng = np.random.RandomState(11)
    rows = []
    for i in range(20):
        sr = (8000, 16000, 22050, 44100)[i % 4]
        n = sr // (2 + i % 3)
        if i % 2:
            t = np.arange(n) / sr
            x = np.sin(2 * np.pi * (220 + 20 * i) * t) * 12000
        else:
            x = rng.randn(n) * 6000
        rows.append((f"clip{i:02d}", bytearray(encode_wav(sr, x))))
    rows.append(("corrupt", bytearray(b"RIFF but not really")))
    clips = spark.createDataFrame(rows, "media_id string, data binary") \
                 .repartition(8)
    meta = audio_metadata(clips).select(
        "media_id", "ok", "sample_rate",
        F.round("duration_s", 3).alias("duration_s"))
    feats = (audio_features(clips, window_ms=100)
             .select("media_id", F.size("rms_windows").alias("n_windows"),
                     F.round("peak", 6).alias("peak")))
    return meta.join(feats, "media_id", "left").orderBy("media_id")


@query("tpch_q7_volume_shipping", oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
    OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY cn.n_name, sn.n_name, CAST(year(l.l_shipdate) AS INTEGER)
ORDER BY cust_nation, supp_nation, l_year
""")
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dimension joins TWICE under different
    roles (customer's vs supplier's) with an OR-of-pairs predicate — both
    sides broadcast, the disjunction evaluated post-join where Catalyst
    can't push it into either scan."""
    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1996-01-01").cast("timestamp_ntz"))
                  & (F.col("l_shipdate")
                     < F.lit("1998-01-01").cast("timestamp_ntz"))))
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    pair = (((F.col("cust_nation") == "NATION_1")
             & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2")
               & (F.col("supp_nation") == "NATION_1")))
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
              .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
              .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
              .filter(pair))
    return (joined
            .groupBy("cust_nation", "supp_nation",
                     F.year("l_shipdate").cast("int").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy("cust_nation", "supp_nation", "l_year"))


@query("tpch_q20_excess_stock_suppliers", oracle="""
WITH part_keys AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
half_qty AS (
  SELECT l_partkey, l_suppkey, 0.5 * SUM(l_quantity) AS half
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey),
big_suppliers AS (
  SELECT DISTINCT h.l_suppkey
  FROM half_qty h
  JOIN part_keys pk ON pk.p_partkey = h.l_partkey
  WHERE h.half > 20)
SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM big_suppliers)
ORDER BY s.s_name
""")
def tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a two-level nested subquery chain (parts by name →
    per-(part,supplier) shipped volume → supplier key set) collapsing into
    pre-aggregated joins + a final LEFT SEMI — each nesting level is one
    aggregate, nothing re-executes per outer row."""
    part_keys = (t(spark, sf_dir, "part")
                 .filter(F.col("p_name").like("red%"))
                 .select("p_partkey"))
    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1997-01-01").cast("timestamp_ntz"))
                  & (F.col("l_shipdate")
                     < F.lit("1998-01-01").cast("timestamp_ntz"))))
    half = (li.groupBy("l_partkey", "l_suppkey")
            .agg((0.5 * F.sum("l_quantity")).alias("half")))
    big = (half.join(F.broadcast(part_keys),
                     half.l_partkey == part_keys.p_partkey)
           .filter(F.col("half") > 20)
           .select("l_suppkey").distinct())
    s = t(spark, sf_dir, "supplier")
    return (s.join(big, s.s_suppkey == big.l_suppkey, "left_semi")
            .select("s_name", "s_acctbal")
            .orderBy("s_name"))


_CMS_D, _CMS_W = 4, 1024  # depth (hash rows) × width (buckets per row)
_CMS_PROBE_TERMS = ["scan", "join", "spark", "window", "the", "zebra"]


def _cms_bucket_sql(expr: str, row: int) -> str:
    return (f"CAST(('0x' || substr(md5('cms{row}:' || {expr}), 1, 15)) "
            f"AS BIGINT) % {_CMS_W}")


@query("cms_heavy_hitters", oracle=f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
ex AS (SELECT unnest(toks) AS token FROM tok),
cells AS (
  SELECT r.r AS row_id,
         CASE r.r
           WHEN 0 THEN {_cms_bucket_sql('ex.token', 0)}
           WHEN 1 THEN {_cms_bucket_sql('ex.token', 1)}
           WHEN 2 THEN {_cms_bucket_sql('ex.token', 2)}
           ELSE {_cms_bucket_sql('ex.token', 3)} END AS bucket
  FROM ex, UNNEST(range({_CMS_D})) AS r(r)),
sketch AS (SELECT row_id, bucket, COUNT(*) AS c
           FROM cells GROUP BY row_id, bucket),
probes AS (SELECT unnest(['{"','".join(_CMS_PROBE_TERMS)}']) AS token),
lookups AS (
  SELECT p.token, r.r AS row_id,
         CASE r.r
           WHEN 0 THEN {_cms_bucket_sql('p.token', 0)}
           WHEN 1 THEN {_cms_bucket_sql('p.token', 1)}
           WHEN 2 THEN {_cms_bucket_sql('p.token', 2)}
           ELSE {_cms_bucket_sql('p.token', 3)} END AS bucket
  FROM probes p, UNNEST(range({_CMS_D})) AS r(r)),
est AS (SELECT l.token, MIN(COALESCE(s.c, 0)) AS cms_estimate
        FROM lookups l LEFT JOIN sketch s USING (row_id, bucket)
        GROUP BY l.token),
exact AS (SELECT token, COUNT(*) AS exact_count FROM ex GROUP BY token)
SELECT e.token, e.cms_estimate, COALESCE(x.exact_count, 0) AS exact_count,
       e.cms_estimate - COALESCE(x.exact_count, 0) AS overestimate
FROM est e LEFT JOIN exact x USING (token)
ORDER BY e.token
""")
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, value-checked cell by cell:
    token counts approximated in d×w = 4×1024 counters REGARDLESS of
    vocabulary size (the bounded-state alternative to an exact vocabulary
    groupBy at 100 TB), probed for a fixed term list next to the exact
    counts — CMS guarantees estimate ≥ exact, pinned by the
    `overestimate` column.  md5 bucket hashing makes the whole sketch
    bit-reproducible in the oracle.  The sketch aggregation is one
    groupBy(row, bucket) with map-side combine: partial sketches merge by
    addition, the property that makes CMS distributed-friendly."""
    from openai_vector_search_demo_spark.functions.text_analysis import (
        _hash60,
        tokens,
    )

    def bucket(col: Column | str, row: int) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return F.pmod(_hash60(F.concat(F.lit(f"cms{row}:"), c)),
                      F.lit(_CMS_W))

    docs = t(spark, sf_dir, "documents")
    ex = docs.select(F.explode(tokens("text")).alias("token"))
    cells = ex.select(F.explode(F.array(*[
        F.struct(F.lit(r).alias("row_id"),
                 bucket("token", r).alias("bucket"))
        for r in range(_CMS_D)])).alias("cell")) \
        .select("cell.row_id", "cell.bucket")
    sketch = cells.groupBy("row_id", "bucket").agg(F.count(F.lit(1)).alias("c"))

    probes = spark.createDataFrame([(tk,) for tk in _CMS_PROBE_TERMS],
                                   ["token"])
    lookups = probes.select("token", F.explode(F.array(*[
        F.struct(F.lit(r).alias("row_id"),
                 bucket("token", r).alias("bucket"))
        for r in range(_CMS_D)])).alias("cell")) \
        .select("token", "cell.row_id", "cell.bucket")
    est = (lookups.join(sketch, ["row_id", "bucket"], "left")
           .groupBy("token")
           .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_estimate")))
    exact = ex.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    return (est.join(exact, "token", "left")
            .select("token", "cms_estimate",
                    F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
                    (F.col("cms_estimate")
                     - F.coalesce("exact_count", F.lit(0)))
                    .alias("overestimate"))
            .orderBy("token"))


@query("nested_array_functions", oracle="""
WITH base AS (
  SELECT o_custkey,
         list(o_totalprice ORDER BY o_orderdate ASC, o_orderkey ASC) AS prices
  FROM orders GROUP BY o_custkey),
x AS (
  SELECT o_custkey,
         len(prices) AS n_orders,
         ROUND(list_aggregate(list_transform(prices, p -> p * 0.9), 'sum'), 2)
           AS discounted_total,
         len(list_filter(prices, p -> p > 100000)) AS n_big,
         ROUND(list_sort(prices)[len(prices)], 2) AS max_price,
         ROUND(list_sort(prices)[1], 2) AS min_price
  FROM base)
SELECT * FROM x WHERE o_custkey < 200
""")
def nested_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function surface pinned explicitly: collect_list →
    transform / filter / aggregate / array_sort, all inside whole-stage
    codegen (no UDF, no explode-regroup round trip) — how nested columns
    are processed in place at scale."""
    o = t(spark, sf_dir, "orders")
    base = (o.groupBy("o_custkey")
            .agg(F.array_sort(F.collect_list(
                F.struct("o_orderdate", "o_orderkey", "o_totalprice")))
                .alias("ordered")))
    prices = F.transform("ordered", lambda s: s.getField("o_totalprice"))
    return (base
            .withColumn("prices", prices).drop("ordered")
            .filter(F.col("o_custkey") < 200)
            .select(
                "o_custkey",
                F.size("prices").alias("n_orders"),
                F.round(F.aggregate(F.transform("prices", lambda p: p * 0.9),
                                    F.lit(0.0), lambda a, x: a + x), 2)
                .alias("discounted_total"),
                F.size(F.filter("prices", lambda p: p > 100000))
                .alias("n_big"),
                F.round(F.array_max("prices"), 2).alias("max_price"),
                F.round(F.array_min("prices"), 2).alias("min_price")))


@query("q2_knn_filtered", oracle="""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id, e.label,
    list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
                   'sum')
    / (sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS sim
  FROM embeddings e, q
  WHERE e.vec_id <> 0 AND e.label IN (1, 2) AND e.vec_id % 3 = 0
)
SELECT vec_id, label, ROUND(sim, 6) AS similarity
FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10
""")
def q2_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search — metadata predicates AND the KNN in one
    plan (the reference's FT.SEARCH uses `*`, i.e. no prefilter; real
    deployments always filter by tenant/category/recency).  The predicate
    sits UNDER the scoring projection, so Catalyst pushes it into the scan
    and only surviving rows pay the cosine — the pre-filter strategy, which
    keeps recall exact (post-filtering an ANN top-k can return < k)."""
    from openai_vector_search_demo_spark.operators.knn import knn
    emb = t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    base = emb.filter((F.col("vec_id") != 0)
                      & F.col("label").isin(1, 2)
                      & (F.col("vec_id") % 3 == 0))
    top = knn(base, qvec, k=10, sim_col="sim", tie_break="vec_id")
    return top.select("vec_id", "label", F.round("sim", 6).alias("similarity"))


@query("tpch_q14_promo_revenue_ratio", oracle="""
SELECT ROUND(100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
         AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
""")
def tpch_q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation — a ratio of two aggregates
    over one pass (CASE inside SUM), never two scans with a driver-side
    divide."""
    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1997-06-01").cast("timestamp_ntz"))
                  & (F.col("l_shipdate")
                     < F.lit("1997-07-01").cast("timestamp_ntz"))))
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4)
                 .alias("promo_revenue_pct")))


@query("tpch_q12_priority_shipping", oracle="""
SELECT CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY CAST(year(l.l_shipdate) AS INTEGER)
ORDER BY ship_year
""")
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → ship-year adapted to the fixture):
    two complementary CASE counts per group in one aggregate pass."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1996-01-01").cast("timestamp_ntz"))
                  & (F.col("l_shipdate")
                     < F.lit("1999-01-01").cast("timestamp_ntz"))))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("ship_year"))


@query("tpch_q13_customer_distribution", oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join keeping zero-order customers
    (COUNT of a nullable column counts only matches) followed by a
    count-of-counts histogram — two aggregations, one outer join."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") != "5-LOW")
         .select("o_custkey", "o_orderkey"))
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@query("tpch_q11_important_stock", oracle="""
WITH vals AS (
  SELECT s.s_nationkey, l.l_partkey,
         SUM(l.l_extendedprice * l.l_quantity) AS value
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_partkey),
tot AS (SELECT SUM(value) AS total FROM vals WHERE s_nationkey = 1)
SELECT l_partkey, ROUND(value, 2) AS value
FROM vals, tot
WHERE s_nationkey = 1 AND value > 0.001 * tot.total
ORDER BY value DESC, l_partkey ASC
""")
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a GLOBAL aggregate fraction — the
    scalar subquery becomes a 1-row cross join (broadcast literal at
    runtime), so the group values are scanned once, not once per group."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    vals = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .filter(F.col("s_nationkey") == 1)
            .groupBy("l_partkey")
            .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                 .alias("value")))
    tot = vals.agg(F.sum("value").alias("total"))
    return (vals.crossJoin(F.broadcast(tot))
            .filter(F.col("value") > 0.001 * F.col("total"))
            .select("l_partkey", F.round("value", 2).alias("value"))
            .orderBy(F.col("value").desc(), F.col("l_partkey").asc()))


@query("tpch_q15_top_supplier", oracle="""
WITH revenue AS (
  SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, ROUND(r.total_rev, 2) AS total_rev
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s.s_suppkey
""")
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: argmax over an aggregated view — the MAX scalar
    joins back against the same aggregate (computed once, reused via
    cross-join literal), keeping ties like the spec requires."""
    li = (t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1997-01-01").cast("timestamp_ntz"))
                  & (F.col("l_shipdate")
                     < F.lit("1997-04-01").cast("timestamp_ntz"))))
    revenue = (li.groupBy("l_suppkey")
               .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .alias("total_rev")))
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    s = t(spark, sf_dir, "supplier")
    return (revenue.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev") == F.col("mx"))
            .join(F.broadcast(s), revenue.l_suppkey == s.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.round("total_rev", 2).alias("total_rev"))
            .orderBy("s_suppkey"))


@query("tpch_q22_global_sales_opportunity", oracle="""
WITH rich AS (
  SELECT c_custkey, c_acctbal, c_nationkey % 7 AS cc
  FROM customer
  WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                     WHERE c_acctbal > 0.0)),
no_orders AS (
  SELECT r.* FROM rich r
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey))
SELECT cc AS cntrycode, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM no_orders
GROUP BY cc
ORDER BY cc
""")
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average filter (1-row broadcast, computed
    once) + NOT EXISTS as a LEFT ANTI join + grouped totals."""
    c = t(spark, sf_dir, "customer")
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("ab")))
    rich = (c.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("ab"))
            .select("c_custkey", "c_acctbal",
                    (F.col("c_nationkey") % 7).alias("cc")))
    o = t(spark, sf_dir, "orders").select("o_custkey")
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (no_orders.groupBy(F.col("cc").alias("cntrycode"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("cntrycode"))


@query("tpch_q2_min_cost_supplier", oracle="""
WITH offer AS (
  SELECT l_partkey, l_suppkey,
         ROUND(SUM(l_extendedprice) / SUM(l_quantity), 6) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eligible AS (
  SELECT o.l_partkey, o.unit_cost, s.s_acctbal, s.s_name, n.n_name
  FROM offer o
  JOIN supplier s ON s.s_suppkey = o.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'),
best AS (SELECT l_partkey, MIN(unit_cost) AS min_cost
         FROM eligible GROUP BY l_partkey)
SELECT ROUND(e.s_acctbal, 2) AS s_acctbal, e.s_name, e.n_name,
       e.l_partkey AS p_partkey, e.unit_cost
FROM eligible e
JOIN best b ON b.l_partkey = e.l_partkey AND e.unit_cost = b.min_cost
JOIN part p ON p.p_partkey = e.l_partkey
WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
""")
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-MIN subquery (cheapest supplier per
    part in a region) decorrelated into one groupBy + equi-join back.  The
    fixture has no partsupp table, so the supplier/part "offer" relation is
    derived from lineitem (unit_cost = sum(price)/sum(qty), rounded to 6 dp
    BEFORE the min-equality so both engines compare identical values).
    Scale: offer agg is one map-side-combinable shuffle on (part, supp);
    supplier/nation/region and the filtered part list are broadcast."""
    li = t(spark, sf_dir, "lineitem")
    offer = (li.groupBy("l_partkey", "l_suppkey")
             .agg(F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 6)
                  .alias("unit_cost")))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = (t(spark, sf_dir, "region")
         .filter(F.col("r_name") == "EUROPE").select("r_regionkey"))
    eligible = (offer
                .join(F.broadcast(s), offer.l_suppkey == s.s_suppkey)
                .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                .join(F.broadcast(r), n.n_regionkey == F.col("r_regionkey"))
                .select("l_partkey", "unit_cost", "s_acctbal",
                        "s_name", "n_name"))
    best = (eligible.groupBy(F.col("l_partkey").alias("b_partkey"))
            .agg(F.min("unit_cost").alias("min_cost")))
    p = (t(spark, sf_dir, "part")
         .filter((F.col("p_type") == "STANDARD")
                 & F.col("p_size").between(10, 20))
         .select("p_partkey"))
    return (eligible
            .join(best, (eligible.l_partkey == F.col("b_partkey"))
                  & (eligible.unit_cost == F.col("min_cost")))
            .join(F.broadcast(p), eligible.l_partkey == p.p_partkey)
            .select(F.round("s_acctbal", 2).alias("s_acctbal"), "s_name",
                    "n_name", F.col("l_partkey").alias("p_partkey"),
                    "unit_cost")
            .orderBy(F.col("s_acctbal").desc(), F.col("n_name").asc(),
                     F.col("s_name").asc(), F.col("p_partkey").asc())
            .limit(100))


@query("tpch_q8_market_share", oracle="""
WITH base AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00')
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                      ELSE 0 END) / SUM(volume), 6) AS mkt_share
FROM base GROUP BY o_year ORDER BY o_year
""")
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — an 8-table star join where
    nation joins TWICE (customer side scopes the market region, supplier
    side labels the volume), then a conditional-fraction aggregate.
    Scale: every dimension (part/supplier/customer/nation×2/region) is
    broadcast; the only shuffle joins are fact-to-fact lineitem ⋈ orders."""
    li = t(spark, sf_dir, "lineitem")
    p = (t(spark, sf_dir, "part")
         .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = (t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate")
                  >= F.lit("1997-01-01").cast("timestamp_ntz"))
                 & (F.col("o_orderdate")
                    < F.lit("1999-01-01").cast("timestamp_ntz")))
         .select("o_orderkey", "o_custkey", "o_orderdate"))
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = (t(spark, sf_dir, "region")
         .filter(F.col("r_name") == "AMERICA").select("r_regionkey"))
    n2 = (t(spark, sf_dir, "nation")
          .select(F.col("n_nationkey").alias("n2_nationkey"),
                  F.col("n_name").alias("supp_nation")))
    base = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
            .join(F.broadcast(r), n1.n_regionkey == F.col("r_regionkey"))
            .join(F.broadcast(n2),
                  F.col("s_nationkey") == F.col("n2_nationkey"))
            .select(F.year("o_orderdate").cast("int").alias("o_year"),
                    (F.col("l_extendedprice")
                     * (1 - F.col("l_discount"))).alias("volume"),
                    "supp_nation"))
    return (base.groupBy("o_year")
            .agg(F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3",
                             F.col("volume")).otherwise(0.0))
                / F.sum("volume"), 6).alias("mkt_share"))
            .orderBy("o_year"))


@query("tpch_q9_product_type_profit", oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - 0.55 * p.p_retailprice * l.l_quantity), 2) AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
""")
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier-nation × order-year for parts
    matching a name substring.  The fixture has no partsupp, so
    ps_supplycost is replaced by the deterministic stand-in
    0.55 · p_retailprice · l_quantity — identical expression both engines.
    Scale: the '%red%' part list and supplier/nation broadcast; lineitem ⋈
    orders is the one shuffle join, then a low-cardinality (nation, year)
    agg with map-side combine."""
    li = t(spark, sf_dir, "lineitem")
    p = (t(spark, sf_dir, "part")
         .filter(F.col("p_name").like("%red%"))
         .select("p_partkey", "p_retailprice"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.round(F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.55 * F.col("p_retailprice") * F.col("l_quantity")), 2)
                .alias("sum_profit"))
            .orderBy(F.col("nation").asc(), F.col("o_year").desc()))


@query("tpch_q10_returned_items", oracle="""
SELECT c.c_custkey, c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""")
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top returned-revenue customers in a quarter.
    Scale: the quarter filter cuts orders ~25× before anything joins, so
    the filtered orders side broadcasts into lineitem — no fact-to-fact
    shuffle at all; customer and nation broadcast too.  Top-20 is
    TakeOrderedAndProject (per-partition heap), not a global sort."""
    o = (t(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate")
                  >= F.lit("1997-01-01").cast("timestamp_ntz"))
                 & (F.col("o_orderdate")
                    < F.lit("1997-04-01").cast("timestamp_ntz")))
         .select("o_orderkey", "o_custkey"))
    li = (t(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("c_custkey", "c_name", "revenue",
                    F.round("c_acctbal", 2).alias("c_acctbal"), "n_name")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
            .limit(20))


@query("tpch_q16_supplier_count", oracle="""
WITH offer AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT o.l_suppkey) AS supplier_cnt
FROM offer o
JOIN part p ON p.p_partkey = o.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND o.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_type ASC, p.p_size ASC
""")
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute with a
    NOT IN exclusion subquery (→ LEFT ANTI join).  The partsupp "offer"
    relation is DISTINCT (l_partkey, l_suppkey) from lineitem; the
    complaints exclusion is stood in by negative-balance suppliers.
    Scale: one distinct shuffle on the pair, anti join against a tiny
    broadcast exclusion list, countDistinct over broadcast-part groups."""
    li = t(spark, sf_dir, "lineitem")
    offer = li.select("l_partkey", "l_suppkey").distinct()
    bad = (t(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0.0).select("s_suppkey"))
    p = (t(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    return (offer
            .join(F.broadcast(bad),
                  offer.l_suppkey == bad.s_suppkey, "left_anti")
            .join(F.broadcast(p), offer.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
                     F.col("p_type").asc(), F.col("p_size").asc()))


@query("tpch_q19_discounted_revenue", oracle="""
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""")
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of three brand/size/quantity
    conjunctions across the join (the classic OR-predicate-pushdown test;
    p_container/l_shipinstruct are absent from the fixture, so the branch
    predicates use size and quantity bands).  The part-only implication of
    the disjunction (brand ∈ {1,2,3} ∧ size ≤ 15) is applied to the part
    scan explicitly — the derived filter Catalyst cannot infer — so the
    broadcast side carries 3 brands instead of all 25."""
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    p = (t(spark, sf_dir, "part")
         .filter(brand.isin("Brand#1", "Brand#2", "Brand#3")
                 & (size <= 15))
         .select("p_partkey", "p_brand", "p_size"))
    li = t(spark, sf_dir, "lineitem")
    branches = (
        ((brand == "Brand#1") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#2") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#3") & size.between(1, 15) & qty.between(20, 30)))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(branches)
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


@query("tpch_q21_suppliers_kept_waiting", oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 100
""")
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS + NOT-EXISTS pair — suppliers who were
    the SOLE late supplier on a multi-supplier finished order.  The fixture
    lacks commit/receipt dates, so "late" is l_shipdate > o_orderdate +
    120 days.  Both subqueries carry a non-equi term (suppkey <>) on top of
    the orderkey equi-join: Spark plans them as LEFT SEMI / LEFT ANTI with
    the inequality as join residual — no row explosion, no driver loop.
    Scale: the supplier-region filter is applied FIRST (broadcast semi),
    so the semi/anti joins run on the eligible ~1/5 of late lines only."""
    li = t(spark, sf_dir, "lineitem")
    o = (t(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    late = (li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 120 DAY"))
            .select("l_orderkey", "l_suppkey"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name",
                                            "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = (t(spark, sf_dir, "region")
         .filter(F.col("r_name") == "EUROPE").select("r_regionkey"))
    eligible_s = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                  .join(F.broadcast(r), n.n_regionkey == F.col("r_regionkey"))
                  .select("s_suppkey", "s_name"))
    l1 = (late.join(F.broadcast(eligible_s),
                    late.l_suppkey == F.col("s_suppkey"))
          .select(F.col("l_orderkey").alias("k"),
                  F.col("l_suppkey").alias("sk"), "s_name"))
    l2 = li.select(F.col("l_orderkey").alias("k2"),
                   F.col("l_suppkey").alias("sk2"))
    l3 = late.select(F.col("l_orderkey").alias("k3"),
                     F.col("l_suppkey").alias("sk3"))
    sole_late = (l1
                 .join(l2, (F.col("k") == F.col("k2"))
                       & (F.col("sk") != F.col("sk2")), "left_semi")
                 .join(l3, (F.col("k") == F.col("k3"))
                       & (F.col("sk") != F.col("sk3")), "left_anti"))
    return (sole_late.groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
            .limit(100))


@query("datetime_function_surface", oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
       epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
       epoch_us(o_orderdate + INTERVAL 3 MONTH) AS plus3m_us,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
            AS BIGINT) AS days_since_epoch_start,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2, 3, 4, 5, 6, 7
""")
def datetime_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal scalar surface pinned cross-engine: extract fields,
    truncation, interval arithmetic, and day difference — exported as ints
    / epoch-us so the comparison is timezone-proof (the engines agree on
    arithmetic, not on timestamp rendering).  Convention gap made explicit:
    DuckDB's dayofweek is 0=Sunday, Spark's is 1=Sunday, so the Spark side
    emits ``dayofweek() - 1``."""
    o = t(spark, sf_dir, "orders")
    return (o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.month("o_orderdate").cast("int").alias("m"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        F.unix_micros(F.date_trunc("month", "o_orderdate")
                      .cast("timestamp")).alias("month_start_us"),
        F.unix_micros((F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH"))
                      .cast("timestamp")).alias("plus3m_us"),
        F.datediff(F.col("o_orderdate"),
                   F.lit("1995-01-01").cast("timestamp_ntz"))
        .cast("long").alias("days_since_epoch_start"))
        .agg(F.count(F.lit(1)).alias("n")))


@query("q7_q9_rerank_remote_slot", oracle="""
WITH cand AS (
  SELECT doc_id, text, source,
         ((doc_id * 7919) % 1000) / 1000.0 AS similarity
  FROM documents
),
knn AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY similarity DESC, doc_id ASC) AS INTEGER) - 1
            AS retrieval_idx
  FROM cand
  ORDER BY similarity DESC, doc_id ASC LIMIT 10
),
scored AS (
  SELECT *,
         substr(text, 1, 160) AS answer,
         CAST((37 * length(text)) % 101 AS INTEGER) AS score
  FROM knn
)
SELECT answer AS "Answer", score AS "Score", text AS "Content",
       source AS "Source", ROUND(similarity, 6) AS "Similarity",
       CAST(retrieval_idx AS INTEGER) + 1 AS "Page"
FROM (SELECT * FROM scored ORDER BY score DESC, retrieval_idx DESC, answer DESC LIMIT 10)
WHERE score >= 50
""")
def q7_q9_rerank_remote_slot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7–Q9 through the PRODUCTION E3 slot: RemoteScorer's batched
    transport calls, retry machinery, 0..100 clamp and NULL-drop run for
    real inside the pandas UDF workers against a deterministic transport —
    and the whole path hash-matches a SQL oracle that recomputes the
    'LLM responses' arithmetically."""
    from pyspark.sql import Window
    from openai_vector_search_demo_spark.operators.rerank import (
        ArithmeticScoreTransport,
        RemoteScorer,
        rerank_order,
    )
    docs = t(spark, sf_dir, "documents")
    cand = docs.select(
        "doc_id", "text", "source",
        (((F.col("doc_id") * 7919) % 1000) / 1000.0).alias("similarity"))
    w = Window.orderBy(F.col("similarity").desc(), F.col("doc_id").asc())
    hits = (cand.withColumn("retrieval_idx",
                            (F.row_number().over(w) - 1).cast("int"))
            .orderBy(F.col("similarity").desc(), F.col("doc_id").asc())
            .limit(10))
    scorer = RemoteScorer(ArithmeticScoreTransport(), batch_size=4)
    scored = scorer(_FLAGSHIP_Q, hits, content_col="text")
    out = (scored.orderBy(*rerank_order(scored)).limit(10)
           .filter(F.col("score") >= 50)
           .select(F.col("answer").alias("Answer"),
                   F.col("score").alias("Score"),
                   F.col("text").alias("Content"),
                   F.col("source").alias("Source"),
                   F.round("similarity", 6).alias("Similarity"),
                   (F.col("retrieval_idx") + 1).alias("Page")))
    return out


# ===========================================================================
