"""Graph ANN: NSW-style kNN-graph build + deterministic beam search.

The reference's actual index is HNSW (modules/utilities.py:272-278 —
Redis `HNSW` vector index); this module is the closest Spark-native
analogue in the engine's ANN ladder: a stored NEIGHBOR GRAPH (top-M
cosine neighbors per vector — the single-layer Navigable-Small-World
form, Malkov et al. 2014, public method description only) searched by
multi-seed best-first BEAM expansion, exactly the serving pattern HNSW
uses below its hierarchy.  Unlike the hash/quantizer tiers (LSH, IVF,
PQ, SQ8, binary), candidates come from GRAPH LOCALITY: each round
expands the current frontier's adjacency lists and keeps the best
``ef`` newcomers, so the scan cost is rounds·ef·M score evaluations —
independent of corpus size — instead of any corpus-wide pass.

Build (offline, one-time — the standard graph-index trade):
``build_knn_graph`` computes the EXACT top-M neighbor list per vector
with the semdedup salt-split block pattern (``operators/semdedup.py``):
rows hash into S = ⌈n/max_block_rows⌉ shards, every unordered shard
pair meets in its own BLAS task (per-task memory bounded by
max_block_rows²), each task emits its LEFT rows' per-block top-M, and a
global per-src window reduces the ≤ S·M candidates per row to the final
top-M — exact, because the true top-M is a subset of the union of
per-block top-Ms.  At 100 TB the same build runs per IVF cell first
(cell-bounds the quadratic, the semdedup posture); the graph THIS
module stores and serves is format-identical either way.

Search (``beam_search_knn``, v4 semantic since r15): entry is ITSELF
HIERARCHICAL AND RECURSIVE — ``nsw_hier_plan`` graph-indexes every
level of the stride stack (⌈√n⌉-node L1, n^(1/4)-node L2, … stored
under ``_L1``/``_L2``/…) down to the first level smaller than
``NSW_HIER_FLOOR``, and a query enters by scoring that tiny top
subset exactly, then DESCENDING: per level, two beam rounds at
constant width ``NSW_HIER_W``, re-seeded from the running pool's top;
the base beam starts from the pool's top-16 (all hierarchy-visited
stay candidates — their exact scores are paid).  This is the
reference's actual HNSW multi-layer structure
(modules/utilities.py:272-278): entry work is
depth·2·{NSW_HIER_W}·2M evaluations with depth = Θ(log log n) — flat
in n for any real corpus.  Each of T base rounds joins the frontier's
adjacency rows (a broadcast of ≤ ef ids against the src-bucketed edge
store — partition-pruned point lookups), traverses them SYMMETRICALLY
(out-edges ∪ reversed in-edges — the reverse-link practice; hubs
become entryways, not one-way sinks), scores the unvisited newcomers
by exact cosine against the query, keeps the top-ef as the next
frontier (ef = {NSW_EF_SERVE} CONSTANT — v4's one-line scale law:
per-query work is BOUNDED by rounds·ef·2M evaluations independent of
corpus size, where v3's ⌈1.5·√n⌉ autoscale made it Θ(√n·M) and its
recall still decayed 0.97 → 0.77 → 0.62 across 2k/20k/100k), and
accumulates every scored node.  The answer is the top-k of all
visited nodes — i.e. the refine is built in: scores are exact cosines
throughout, the graph only decides WHICH nodes get scored.  Recall is
measured, never assumed — the v4 point (with M = 16, the degree that
keeps an exact-kNN graph navigable at 100k; M = 6 needed 2× the beam
for less recall) serves mean/min recall@10 = 1.00/1.00 @ 2k,
1.00/1.00 @ 20k, 0.98/0.90 @ 100k at the SAME ef
(``ann_nsw_mean_recall_at_10``, ``ann_nsw_fixed_ef_scaling``,
``scripts/ab_nsw_v4_deep.py``).

Determinism contract (the ANN-family rule, ``ann.py`` module
docstring): every selection — per-block top-M, global top-M, per-round
top-ef, final top-k — orders by the 6-dp-rounded cosine with an id
tie-break, so graph, beam trajectory, and answer replay bit-for-bit in
DuckDB for the correctness gate (the BLAS-vs-fold float caveat is the
same pinned-never-happens contract every numpy ANN path carries).

PIPELINE-ORDER REQUIREMENT (measured, SCALE.md r12): when duplicate
multiplicity exceeds M, the exact kNN graph shatters into
per-duplicate-group cliques and NO beam setting can navigate across
them (sf1 replica fixture: 2,000 ten-node components, recall 0.0).
Run the engine's near-dup/semantic dedup BEFORE ``build_knn_graph`` —
measured to restore a single navigable component and the expected
recall, while shrinking the index by the duplicate factor.
``tests/test_nsw.py::test_duplicate_multiplicity_disconnects_graph``
pins the pathology and the fix.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openai_vector_search_demo_spark.functions.vectors import (
    cosine_similarity,
    vector_lit,
)

NSW_M = 16         # out-neighbors kept per node (traversal is SYMMETRIC)
NSW_EF = 12        # beam-width floor (tests' explicit-knob mode)
NSW_EF_SERVE = 160  # CONSTANT serving beam width — independent of n (v4)
NSW_ROUNDS = 8     # frontier expansions (pinned; the oracle unrolls them)
NSW_ENTRY_COUNT = 16  # base-beam entry points taken from the level stack
NSW_HIER_W = 16    # per-level beam width AND seed count (constant in n)
NSW_SEED_COUNT = NSW_HIER_W  # back-compat alias (pre-v4 name)
NSW_L1_ROUNDS = 2     # beam rounds per graph-indexed hierarchy level
NSW_HIER_FLOOR = 16   # level size below this -> score the level flat
NSW_STOP_K = 32
"""Early-termination window (r15 — HNSW's efSearch convergence rule,
public method description): a base-beam round that produces NO
newcomer scoring above the {NSW_STOP_K}-th best visited node cannot
change the answer's neighborhood — stop instead of spending the
remaining rounds.  Twin-measured FREE at the recall envelope
(stop_k=32: identical 0.98/0.90 at 100k, 1.00/1.00 at 2k) while toy
corpora converge in ~4 rounds instead of 8 — the saturation rounds
were pure cost.  stop_k=10/16 DO cost tail recall at 100k (min 0.90 →
0.70) — the margin between k and the stop window is what absorbs
late-round improvements.  Deterministic from 6-dp-rounded values, so
every oracle replays the same stop decision."""
NSW_SEEDS = (1, 101, 201, 301)
"""Legacy fixed, id-spread entry points — kept for explicit-seed callers
and tests.  SERVING default is the HIERARCHICAL entry instead (v4,
r15): flat scan of the top (< {NSW_HIER_FLOOR}-node) subset, then a
constant-width beam down every graph-indexed level — see the module
docstring and ``nsw_serving_params``/``nsw_hier_plan``.  Fixed seeds at
sf0.1 served mean recall@10 = 0.155; the r13 flat coarse entry 0.76
(min 0.50); v3 (√n-autoscaled ef) 0.97 at sf0.1 but DECAYING with n
(0.77 @ 20k, 0.62 @ 100k); v4's constant-ef point holds ≥0.9 across
the same curve — see ``ann_nsw_mean_recall_at_10`` /
``ann_nsw_fixed_ef_scaling``."""

DEFAULT_MAX_BLOCK_ROWS = 8192


def nsw_serving_params(n: int) -> tuple[int, int, int]:
    """(stride, ef, rounds) for a corpus of ``n`` vectors — the
    registered serving policy (v4, r15): coarse stride ⌈√n⌉ (the
    HIERARCHY's geometry — its depth adapts to n), beam width
    ef = {NSW_EF_SERVE} CONSTANT, rounds = {NSW_ROUNDS} constant.
    Per-query work is therefore BOUNDED by rounds·ef·2M score
    evaluations — independent of corpus size — where v3's
    ef = ⌈1.5·√n⌉ made it Θ(√n·M) and its recall at the autoscale
    point still decayed 0.97 → 0.77 → 0.62 across 2k/20k/100k
    (VERDICT r14 #1).  The constant point (with the deeper hierarchy
    and the M = {NSW_M} degree that makes a kNN graph navigable at
    100k) was picked by the numpy-twin A/B
    (``scripts/ab_nsw_v4_deep.py``) and holds mean recall ≥ 0.9 on the
    same 3-point curve with a visited count that SATURATES instead of
    growing — receipted by ``ann_nsw_fixed_ef_scaling``."""
    import math
    root = max(2, math.ceil(math.sqrt(max(1, n))))
    return root, NSW_EF_SERVE, NSW_ROUNDS


def nsw_l1_params(n1: int) -> tuple[int, bool]:
    """(stride2, hierarchical) for an L1 coarse layer of ``n1`` nodes —
    one recursion step of the hierarchy's geometry: the next level's
    subset is ``id % (stride·stride2) == 0`` with stride2 = ⌈√n1⌉.
    Below ``NSW_HIER_FLOOR`` nodes the layer is scored flat — the
    small-corpus degeneration the oracle mirrors with an OR predicate
    (a 6-node layer has nothing to index).  ``nsw_hier_plan`` applies
    this step recursively (v4)."""
    import math
    return max(2, math.ceil(math.sqrt(max(1, n1)))), n1 >= NSW_HIER_FLOOR


def nsw_hier_plan(df: DataFrame, n: int,
                  id_col: str = "vec_id",
                  n1: int | None = None) -> tuple[list[int], list[int]]:
    """(strides, counts) of the full level stack for corpus ``df`` of
    size ``n`` — the v4 RECURSION the v3 design only named: level ℓ is
    the subset ``id % (s1·…·sℓ) == 0`` with s_{ℓ+1} = ⌈√n_ℓ⌉; every
    level with ≥ {NSW_HIER_FLOOR} nodes gets its own exact top-M graph,
    and the FIRST smaller level is the flat-scanned entry top.  Level
    sizes fall as n^(1/2), n^(1/4), n^(1/8)… so depth is Θ(log log n)
    (2 at 2k, 3 at 100k, ~4 at 10⁹) and per-query entry work is
    depth·{NSW_L1_ROUNDS}·{NSW_HIER_W}·2M evaluations — flat in n.
    This is the reference HNSW's actual multi-layer structure
    (modules/utilities.py:272-278).  ``df`` must already be filtered to
    non-null vectors; counts come from the DATA (one count job per
    level, ≤ ~4), so a replay is deterministic.  ``n1`` short-circuits
    the first count when the caller already knows it (the memoized
    slots)."""
    import math
    strides: list[int] = []
    counts: list[int] = []
    prod = 1
    cur = max(1, n)
    while True:
        s = max(2, math.ceil(math.sqrt(cur)))
        prod *= s
        if not strides and n1 is not None:
            cnt = int(n1)
        else:
            cnt = df.filter(
                F.pmod(F.col(id_col), F.lit(int(prod))) == 0).count()
        strides.append(int(s))
        counts.append(int(cnt))
        if cnt < NSW_HIER_FLOOR:
            return strides, counts
        cur = cnt


def nsw_filtered_ef(ef: int, n_match: int, n_total: int,
                    k: int = 10, cap: int = 4) -> int:
    """PREDICATE-AWARE beam widening for post-filter serving (the
    filtered-DiskANN / ACORN practice, public method descriptions):
    a beam of width ef carries ~ef·selectivity predicate matches per
    round, so at low selectivity the visited set can hold fewer than
    ``k`` matches and the post-filter answer starves.  Widen by
    w = ⌈k / (ef·sel)⌉ = ⌈k·n_total / (ef·n_match)⌉ — the factor that
    makes the EXPECTED per-round match count k — clamped to [1, cap]
    (cap bounds worst-case cost at cap·ef·M evaluations per round; an
    empty predicate keeps w = cap rather than diverging).  Measured at
    sf0.1 (BASELINE.md r14): 1% selectivity recall 0.9 → 1.0 at w = 4;
    ≥10% selectivity stays w ≤ 2.  Deterministic from counts, so the
    DuckDB oracle computes the identical width."""
    import math
    if n_match <= 0:
        return ef * cap
    w = math.ceil(k * n_total / (ef * n_match))
    return ef * max(1, min(cap, w))


def symmetrize_edges(edges: DataFrame) -> DataFrame:
    """Undirected traversal relation from a directed top-M adjacency:
    out-edges ∪ reversed in-edges (the HNSW reverse-link practice —
    hub nodes become ENTRYWAYS to their spokes, not one-way sinks;
    measured +0.1–0.2 mean recall at every scale)."""
    fwd = edges.select("src", "dst")
    return fwd.union(fwd.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst"))).distinct()


def build_knn_graph(df: DataFrame, m: int = NSW_M,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    max_block_rows: int = DEFAULT_MAX_BLOCK_ROWS
                    ) -> DataFrame:
    """Exact top-``m`` cosine neighbor list per node as (src, dst, sim)
    rows, sim 6-dp-rounded (the determinism boundary).  Salt-split
    blocked BLAS: every shard pair meets once, per-task memory ≤
    max_block_rows²·8 B, and each task emits only its left rows'
    per-block top-m — the global window then sees ≤ S·m rows per src,
    never the n² pair relation."""
    import pandas as pd

    base = (df.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
    n = base.count()
    s = max(1, -(-n // max_block_rows))

    def block_topm(key, pdf):
        empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                              "dst": pd.Series([], dtype="int64"),
                              "sim": pd.Series([], dtype="float64")})
        i, j = key
        a = pdf[pdf["salt"] == i]
        b = pdf[pdf["salt"] == j] if i != j else a
        if len(a) == 0 or len(b) == 0:
            return empty
        ids_a = a["id"].to_numpy(dtype=np.int64)
        ids_b = b["id"].to_numpy(dtype=np.int64)
        mat_a = np.array(a["v"].tolist(), dtype=np.float64)
        mat_b = np.array(b["v"].tolist(), dtype=np.float64)
        na = np.linalg.norm(mat_a, axis=1)
        na[na == 0] = 1.0
        nb = np.linalg.norm(mat_b, axis=1)
        nb[nb == 0] = 1.0
        sims = np.round((mat_a / na[:, None]) @ (mat_b / nb[:, None]).T, 6)
        out = []
        for side, (rids, cids, sm) in enumerate(
                [(ids_a, ids_b, sims)] if i == j
                else [(ids_a, ids_b, sims), (ids_b, ids_a, sims.T)]):
            # threshold-prefilter before the (sim desc, dst asc) sort:
            # keep every candidate >= the (m+8)-th largest sim (ties at
            # the boundary INCLUDED, so the exact top-m — at most one
            # self among them — is provably inside), then order just
            # that slice.  Same selection as a full-row lexsort, ~10×
            # less Python per row — the lever that cut the 100k exact
            # build from ~9 min to ~2 (r15).
            slack = min(m + 8, sm.shape[1])
            for r in range(len(rids)):
                row = sm[r]
                if len(row) > slack:
                    thresh = np.partition(row, len(row) - slack)[
                        len(row) - slack]
                    cand = np.nonzero(row >= thresh)[0]
                else:
                    cand = np.arange(len(row))
                order = np.lexsort((cids[cand], -row[cand]))
                picked = [c for c in cand[order]
                          if cids[c] != rids[r]][:m]
                for c in picked:
                    out.append((rids[r], cids[c], row[c]))
        if not out:
            return empty
        return pd.DataFrame(out, columns=["src", "dst", "sim"])

    salted = base.withColumn(
        "salt", F.pmod(F.xxhash64("id"), F.lit(s)).cast("int"))
    expanded = salted.withColumn("grp", F.explode(F.transform(
        F.sequence(F.lit(0), F.lit(s - 1)),
        lambda k: F.struct(F.least(k, F.col("salt")).alias("i"),
                           F.greatest(k, F.col("salt")).alias("j")))))
    cands = (expanded
             .select("id", "v", "salt",
                     F.col("grp.i").alias("i"), F.col("grp.j").alias("j"))
             .groupBy("i", "j")
             .applyInPandas(block_topm,
                            schema="src long, dst long, sim double"))
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(),
                                          F.col("dst").asc())
    return (cands.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= m).drop("_rn"))


def build_knn_graph_sharded(df: DataFrame, centroids,
                            m: int = NSW_M, n_cells: int = 8,
                            n_assign: int = 2,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """CELL-BOUNDED graph build with boundary MULTI-ASSIGNMENT — the
    100 TB build path the module docstring promises, as a first-class
    operator (the SPANN / sharded-DiskANN practice, public method
    descriptions): nodes are assigned to their top-``n_assign``
    super-cells (super-cell score = max spherical dot over the trained
    quantizer's centroids folded by ``cid % n_cells``; ties → smaller
    super-cell id), every super-cell computes its members' within-cell
    exact top-``m`` in ONE bounded task, and a global per-src window
    reduces the ≤ n_assign·m candidates per node to the final list.
    Per-task work is |cell|² — never n² — and the multi-assignment
    replicates BOUNDARY nodes into every cell they are near, which is
    what keeps cross-cell true neighbors discoverable:
    ``ann_nsw_cellbuild_mean_recall_at_10`` measures n_assign=1 vs 2 at
    0.495 → 0.92 (sf0.01) and 0.545 → 0.76 (sf0.1) — the replicated
    build matches the GLOBAL build's recall (0.93 / 0.76) with the
    same edge budget."""
    import pandas as pd

    cent = np.asarray(centroids, dtype=np.float64)
    base = (df.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))

    def assign(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            nm = np.linalg.norm(mat, axis=1)
            nm[nm == 0] = 1.0
            dots = (mat / nm[:, None]) @ cent.T
            sup = np.full((len(ids), n_cells), -np.inf)
            for j in range(cent.shape[0]):
                s = j % n_cells
                sup[:, s] = np.maximum(sup[:, s], dots[:, j])
            rows = []
            for r in range(len(ids)):
                order = np.lexsort((np.arange(n_cells), -sup[r]))
                for s in order[:n_assign]:
                    rows.append((int(ids[r]), list(pdf["v"].iloc[r]),
                                 int(s)))
            yield pd.DataFrame(rows, columns=["id", "v", "sup"])

    exploded = base.mapInPandas(
        assign, schema="id long, v array<double>, sup int")

    def cell_topm(key, pdf):
        import pandas as pd
        empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                              "dst": pd.Series([], dtype="int64"),
                              "sim": pd.Series([], dtype="float64")})
        if len(pdf) < 2:
            return empty
        ids = pdf["id"].to_numpy(dtype=np.int64)
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        nm = np.linalg.norm(mat, axis=1)
        nm[nm == 0] = 1.0
        u = mat / nm[:, None]
        sims = np.round(u @ u.T, 6)
        out = []
        for r in range(len(ids)):
            row = sims[r]
            order = np.lexsort((ids, -row))
            picked = [c for c in order if ids[c] != ids[r]][:m]
            for c in picked:
                out.append((int(ids[r]), int(ids[c]), float(row[c])))
        return pd.DataFrame(out, columns=["src", "dst", "sim"]) \
            if out else empty

    cands = (exploded.groupBy("sup")
             .applyInPandas(cell_topm,
                            schema="src long, dst long, sim double")
             .dropDuplicates(["src", "dst"]))
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(),
                                          F.col("dst").asc())
    return (cands.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= m).drop("_rn"))


def write_nsw_index(df: DataFrame, path: str, m: int = NSW_M,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_buckets: int = 16) -> None:
    """Persist the serving artifact: the adjacency table, BUCKETED BY
    SRC (one directory per ``pmod(src, n_buckets)``) so each beam
    round's frontier lookup is a partition-pruned point read of ≤ ef
    buckets — the vectors themselves are NOT stored here (the refine
    point-reads them from the source table).

    v2 (r13): each directed top-M edge is written in BOTH directions —
    the out-edge with ``fwd = true`` (the canonical list the
    merge-on-read top-M window resolves) and its mirror under the
    OTHER endpoint's bucket with ``fwd = false`` — so symmetric
    traversal stays a single src-pruned point read per round instead
    of an unprunable dst-side scan.  Mirror rows are traversal HINTS:
    the stored lookup validates each against the mirror source's
    current resolved top-M (one extra pruned point read), which makes
    them exact under upserts too.

    v4 (r15): the store carries the WHOLE hierarchy — every level of
    ``nsw_hier_plan`` with ≥ {NSW_HIER_FLOOR} nodes gets its own exact
    top-M graph under ``_L1``, ``_L2``, … (each in the SAME dual
    fwd/mirror bucketed format as the base layer, so the incremental
    upsert machinery applies to levels too — VERDICT r14 #2), and the
    write-time geometry lands in ``_L1_META`` (strides + counts +
    legacy v3 keys).  Level ℓ is n^(1/2^ℓ)-sized: its build is at most
    n work (amortized next to the base n²-bounded build), depth is
    Θ(log log n), and serving entry costs depth·{NSW_L1_ROUNDS}·
    {NSW_HIER_W}·2M evaluations — flat in n."""
    base = df.filter(F.col(vec_col).isNotNull())
    n = base.count()
    strides, counts = nsw_hier_plan(base, n, id_col=id_col)
    edges = build_knn_graph(df, m=m, vec_col=vec_col, id_col=id_col)
    _write_graph_dual(edges, path, n_buckets)
    prod = 1
    for lvl, (s, cnt) in enumerate(zip(strides, counts), start=1):
        prod *= s
        if cnt < NSW_HIER_FLOOR:
            break       # this subset is the flat-scanned entry top
        sub = base.filter(F.pmod(F.col(id_col), F.lit(int(prod))) == 0)
        ledges = build_knn_graph(sub, m=m, vec_col=vec_col,
                                 id_col=id_col)
        _write_graph_dual(ledges, f"{path.rstrip('/')}/_L{lvl}",
                          n_buckets)
    _write_hier_meta(df.sparkSession, path, strides, counts, m)


def _write_graph_dual(edges: DataFrame, path: str,
                      n_buckets: int) -> None:
    """Persist a directed top-M adjacency in the store's DUAL format:
    every edge under its src bucket with ``fwd = true`` (the canonical
    list merge-on-read resolves) plus a ``fwd = false`` mirror under
    the dst's bucket (symmetric traversal stays a src-pruned point
    read) — see the v2 notes above."""
    both = (edges.withColumn("fwd", F.lit(True))
            .unionByName(edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst"), "sim")
                         .withColumn("fwd", F.lit(False))))
    (both.withColumn("bucket", F.pmod(F.col("src"), F.lit(n_buckets))
                     .cast("int"))
     .repartition(F.col("bucket"))
     .write.mode("overwrite").partitionBy("bucket").parquet(path))


def _write_hier_meta(spark, path: str, strides: list[int],
                     counts: list[int], m: int) -> None:
    """``_L1_META``: the frozen write-time geometry (v4 adds the full
    ``strides``/``counts`` stack; the v3 scalar keys stay for
    compatibility with pre-v4 readers and tests)."""
    import json

    from openai_vector_search_demo_spark.stores import fs_write_text
    legacy_stride2 = strides[1] if len(strides) > 1 else \
        nsw_l1_params(counts[0])[0]
    fs_write_text(spark, path.rstrip("/") + "/_L1_META",
                  json.dumps({"stride": int(strides[0]),
                              "n1": int(counts[0]),
                              "stride2": int(legacy_stride2),
                              "m": int(m),
                              "strides": [int(s) for s in strides],
                              "counts": [int(c) for c in counts]}))


def build_l1_graph(df: DataFrame, stride: int, m: int = NSW_M,
                   vec_col: str = "embedding", id_col: str = "vec_id"
                   ) -> DataFrame:
    """One hierarchy level, inline form: the exact top-``m`` graph over
    the subset ``id % stride == 0`` (pass the stride PRODUCT for deeper
    levels), already SYMMETRIZED — the shape the in-memory beam and the
    oracle consume directly (the stored path uses the dual fwd/mirror
    format instead so levels stay incrementally maintainable)."""
    coarse = df.filter(F.pmod(F.col(id_col), F.lit(int(stride))) == 0)
    return symmetrize_edges(
        build_knn_graph(coarse, m=m, vec_col=vec_col, id_col=id_col))


def write_nsw_index_tenants(df: DataFrame, path: str,
                            tenant_col: str = "tenant",
                            m: int = NSW_M,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            n_buckets: int = 16) -> list:
    """TENANT-SCOPED graph stores — the reference's per-alias physical
    isolation (modules/utilities.py:282-287: each index alias is both
    a NAME and a separate physical index) applied to the graph tier:
    one logical store, laid out ``path/tenant=T/bucket=B`` with each
    tenant's graph, L1 layer, and metadata built from ITS OWN vectors
    only.  A tenant's serve (``nsw_tenant_path`` + ``nsw_stored_knn``)
    opens only its subtree — other tenants' buckets are never listed,
    let alone read (stronger than a partition filter: the prune is
    structural).  Cross-tenant edges cannot exist by construction,
    which is the isolation a filter-on-one-graph cannot give.  The
    per-tenant loop is |tenants| driver iterations around fully
    distributed builds — the Hive-partitioned-table write pattern.
    Returns the tenant values written."""
    from openai_vector_search_demo_spark.stores import tenant_values
    tenants = tenant_values(df, tenant_col)
    for tv in tenants:
        sub = df.filter(F.col(tenant_col) == tv).drop(tenant_col)
        write_nsw_index(sub, nsw_tenant_path(path, tv), m=m,
                        vec_col=vec_col, id_col=id_col,
                        n_buckets=n_buckets)
    return tenants


def nsw_tenant_path(path: str, tenant) -> str:
    """The tenant's physical subtree inside a ``write_nsw_index_tenants``
    store (Hive-style partition naming, so the whole store also reads
    as one partitioned table for offline jobs).  The value is
    Hive-escaped (``escape_partition_value``): the composed path always
    names the directory ``partitionBy`` would write, and a
    traversal-shaped tenant value ('/', '..') cannot escape the
    subtree."""
    from openai_vector_search_demo_spark.stores import (
        escape_partition_value,
    )
    return f"{path.rstrip('/')}/tenant={escape_partition_value(tenant)}"


def beam_search_knn(edges, source: DataFrame,
                    qvec: Sequence[float], k: int = 10,
                    ef: int = NSW_EF, rounds: int = NSW_ROUNDS,
                    seeds: Sequence[int] = NSW_SEEDS,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sim_col: str = "similarity",
                    exclude_ids: Sequence[int] | None = None,
                    stride: int | None = None,
                    n_entry: int = NSW_ENTRY_COUNT,
                    l1_edges=None, n1: int | None = None,
                    hier_levels: Sequence | None = None,
                    flat_mod: int | None = None,
                    stop_k: int | None = NSW_STOP_K) -> DataFrame:
    """Multi-seed beam search over an adjacency relation — the
    SINGLE-QUERY serving form: ONE Spark job per round (the frontier's
    pruned edge lookup broadcast-joined against ``source`` and scored
    in the same plan), with the ≤ ef·2M scored rows accumulated
    driver-side — visited-set dedup, per-round top-ef, and the final
    top-k are Python sorts over KB-class state, costing zero extra
    jobs (at real-cluster scheduler latency the job count IS the query
    latency — the local-cluster smoke measured ~0.5 s per round-trip;
    query THROUGHPUT belongs to ``beam_search_knn_batch``, which keeps
    all per-query state in-plan).  Scores stay exact 6-dp-rounded
    cosines computed in the plan; every selection orders by
    (score desc, id asc) — the same total order Spark's orderBy gives,
    so the trajectory is oracle-replayable bit-for-bit.

    Entry points (v4, HIERARCHICAL): with ``hier_levels``/``flat_mod``
    set — or the legacy depth-1 shape ``stride``+``l1_edges``+``n1``
    (upgraded internally) — entry DESCENDS the level stack: the flat
    top subset ``id % flat_mod == 0`` (< {NSW_HIER_FLOOR} nodes) is
    scored exactly, then each graph level from the top down runs
    {NSW_L1_ROUNDS} beam rounds at CONSTANT width {NSW_HIER_W}
    (seeded by the running pool's top-{NSW_HIER_W}), and the
    top-``n_entry`` of everything visited seeds the base beam — all
    hierarchy-visited stay candidates (their exact scores are paid).
    Entry work is depth·{NSW_L1_ROUNDS}·{NSW_HIER_W}·2M evaluations —
    flat in n (depth is log log n).  With only ``stride`` set, the
    whole coarse layer is scored flat (the registered degeneration
    when ``n1 < NSW_HIER_FLOOR``).  Without ``stride``, ``seeds`` are
    used verbatim (legacy fixed-entry mode).

    ``edges`` / level entries are DataFrames or ``ids -> DataFrame``
    lookup callables (the stored path passes ones that also filter the
    store's bucket partition column, so the IN-list prunes
    DIRECTORIES, not just row groups); ``hier_levels`` is ordered
    L1 → Ld (the descent runs it reversed)."""
    q = vector_lit(qvec)
    lookup = edges if callable(edges) else (
        lambda ids: edges.filter(F.col("src").isin(ids)))

    def skey(r):
        s = r["_s"]
        # Spark orderBy(desc) puts NULLs last; -inf reproduces that
        return (-(s if s is not None else float("-inf")), r[id_col])

    def score_ids(pred) -> DataFrame:
        return (source.filter(F.col(vec_col).isNotNull() & pred)
                .withColumn("_s", F.round(
                    cosine_similarity(F.col(vec_col), q), 6))
                .select(id_col, "label", "_s"))

    def expand_round(lk, ids, seen) -> dict:
        """One beam round's newcomer scoring, shaped by what the lookup
        returns (r15):

        - a DataFrame (fresh stores, in-memory graphs): ONE action —
          the pruned candidate relation broadcast-probes ``source`` and
          the driver set-dedups (the historical shape; collapsing it to
          a collect + IN-scan was MEASURED SLOWER here — it doubles the
          scheduler round-trips per round);
        - an id LIST (delta stores — their merge-on-read resolution is
          already a driver-side selection over stored 6-dp sims): the
          already-deduped unseen ids are pushed into the scan as an IN
          filter — no broadcast exchange, no join, and every scored row
          is a newcomer.

        A lookup may also return ``(certain_ids, maybe_ids, resolve)``
        — candidates whose membership needs one more read (delta-store
        mirror validation): the resolve() read and the scoring read are
        INDEPENDENT Spark jobs, so they run on two driver threads
        (guide §2.6) and the round costs max(validate, score) instead
        of their sum; scored rows whose id fails validation are
        discarded before entering the visited set — identical
        trajectory, one fewer sequential round-trip per round.

        Either way the score is the same in-plan rounded cosine, so the
        visited set and trajectory are bit-identical across shapes."""
        res = lk(ids)
        if isinstance(res, DataFrame):
            cand = res.select(F.col("dst").alias(id_col))
            rows = (source.join(F.broadcast(cand), id_col)
                    .withColumn("_s", F.round(
                        cosine_similarity(F.col(vec_col), q), 6))
                    .select(id_col, "label", "_s").collect())
        else:
            def score(todo):
                return [] if not todo else (
                    source.filter(F.col(id_col).isin(todo))
                    .withColumn("_s", F.round(
                        cosine_similarity(F.col(vec_col), q), 6))
                    .select(id_col, "label", "_s").collect())

            if isinstance(res, tuple):
                certain, maybe, resolve = res
                todo = sorted((set(certain) | set(maybe)) - seen)
                import threading
                out = [None, None]

                def _run(i, fn):
                    try:
                        out[i] = ("ok", fn())
                    except BaseException as exc:  # noqa: BLE001
                        out[i] = ("err", exc)
                th = threading.Thread(target=_run, args=(1, resolve))
                th.start()
                _run(0, lambda: score(todo))
                th.join()
                for tag, val in out:
                    if tag == "err":
                        raise val
                rows, valid = out[0][1], out[1][1]
                keep = set(certain) | set(valid)
                rows = [r for r in rows if r[id_col] in keep]
            else:
                rows = score(sorted(set(res) - seen))
        new = {}
        for r in rows:
            i = r[id_col]
            if i not in seen and i not in new:
                new[i] = r
        return new

    if (hier_levels is None and stride is not None
            and l1_edges is not None and n1 is not None
            and n1 >= NSW_HIER_FLOOR):
        # legacy depth-1 call shape -> the v4 descent with one level
        hier_levels = [l1_edges]
        flat_mod = int(stride) * nsw_l1_params(n1)[0]
    if hier_levels:
        lookups = [lv if callable(lv) else
                   (lambda ids, _e=lv: _e.filter(F.col("src").isin(ids)))
                   for lv in hier_levels]
        scored0 = score_ids(
            F.pmod(F.col(id_col), F.lit(int(flat_mod))) == 0)
        schema = scored0.schema
        rows = scored0.collect()
        visited = {r[id_col]: r for r in rows}
        seen = set(visited)
        for lk in reversed(lookups):
            hf = [r[id_col] for r in
                  sorted(visited.values(), key=skey)[:NSW_HIER_W]]
            for _ in range(NSW_L1_ROUNDS):
                if not hf:
                    break
                new = expand_round(lk, hf, seen)
                if not new:
                    break
                seen.update(new)
                visited.update(new)
                hf = [r[id_col] for r in
                      sorted(new.values(), key=skey)[:NSW_HIER_W]]
        frontier = [r[id_col] for r in
                    sorted(visited.values(), key=skey)[:n_entry]]
    elif stride is not None:
        scored0 = score_ids(
            F.pmod(F.col(id_col), F.lit(int(stride))) == 0)
        schema = scored0.schema
        rows = scored0.collect()
        visited = {r[id_col]: r for r in rows}
        frontier = [r[id_col] for r in sorted(rows, key=skey)[:n_entry]]
        seen = set(visited)
    else:
        seed_df = (source.sparkSession
                   .createDataFrame([(int(x),) for x in seeds],
                                    f"{id_col} long"))
        scored0 = (source.join(F.broadcast(seed_df), id_col)
                   .withColumn("_s", F.round(
                       cosine_similarity(F.col(vec_col), q), 6))
                   .select(id_col, "label", "_s"))
        schema = scored0.schema
        visited = {r[id_col]: r for r in scored0.collect()}
        frontier = [int(x) for x in seeds]
        seen = set(visited) | set(frontier)
    for _ in range(rounds):
        if not frontier:
            break
        new = expand_round(lookup, frontier, seen)
        if not new:
            break
        seen.update(new)
        visited.update(new)
        if stop_k is not None:
            # convergence (NSW_STOP_K): the round's best newcomer
            # scores below the stop_k-th best visited value — further
            # expansion cannot reach the answer's neighborhood
            vals = sorted((r["_s"] for r in visited.values()
                           if r["_s"] is not None), reverse=True)
            if len(vals) > stop_k:
                best_new = max((r["_s"] for r in new.values()
                                if r["_s"] is not None),
                               default=float("-inf"))
                if best_new < vals[stop_k - 1]:
                    break
        frontier = [r[id_col] for r in
                    sorted(new.values(), key=skey)[:ef]]
    out_rows = sorted(visited.values(), key=skey)
    if exclude_ids:
        # SOFT DELETE (the FAISS IDSelector pattern): tombstoned nodes
        # remain traversable GHOSTS — they keep the graph connected and
        # may carry the beam — but can never be returned.  Hard removal
        # is the documented recompaction case (rebuild without them).
        dead = set(exclude_ids)
        out_rows = [r for r in out_rows if r[id_col] not in dead]
    top = source.sparkSession.createDataFrame(out_rows[:k], schema)
    return top.withColumnRenamed("_s", sim_col)


def beam_search_knn_batch(edges: DataFrame, source: DataFrame,
                          queries: DataFrame, k: int = 10,
                          ef: int = NSW_EF, rounds: int = NSW_ROUNDS,
                          seeds: Sequence[int] = NSW_SEEDS,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          qid_col: str = "qid", qvec_col: str = "qv",
                          sim_col: str = "similarity",
                          stride: int | None = None,
                          n_entry: int = NSW_ENTRY_COUNT,
                          l1_edges: DataFrame | None = None,
                          n1: int | None = None,
                          hier_levels: Sequence[DataFrame] | None = None,
                          flat_mod: int | None = None,
                          stop_k: int | None = NSW_STOP_K) -> DataFrame:
    """BATCHED multi-query beam search — the serving form for query
    THROUGHPUT: the frontier is a (qid, node) RELATION, every round is
    one edge join + one anti join + one broadcast-scored point-read +
    one per-qid top-ef window, and NOTHING is collected to the driver —
    the single-query ``beam_search_knn``'s bounded collects disappear
    because the qid key carries all per-query state in-plan.  At 100 TB
    this is how an offline evaluation or a batch re-ranking job runs
    thousands of queries in one pass over the (bucketed) edge store.
    Returns the per-qid top-k of all visited nodes, exact cosines,
    6-dp-rounded with (qid, sim desc, id asc) determinism."""

    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col(qvec_col).alias("_qv"))
    vecs = source.filter(F.col(vec_col).isNotNull()) \
        .select(id_col, vec_col)

    def score(ids_df: DataFrame) -> DataFrame:
        return (ids_df.join(vecs, id_col)
                .join(F.broadcast(q), "qid")
                .withColumn("_s", F.round(
                    cosine_similarity(F.col(vec_col), F.col("_qv")), 6))
                .select("qid", id_col, "_s"))

    sess = source.sparkSession
    wf = Window.partitionBy("qid").orderBy(F.col("_s").desc(),
                                           F.col(id_col).asc())
    if (hier_levels is None and stride is not None
            and l1_edges is not None and n1 is not None
            and n1 >= NSW_HIER_FLOOR):
        # legacy depth-1 call shape -> the v4 descent with one level
        hier_levels = [l1_edges]
        flat_mod = int(stride) * nsw_l1_params(n1)[0]
    if hier_levels:
        # HIERARCHICAL entry (v4): every qid scores the shared flat top
        # subset (< NSW_HIER_FLOOR rows), then DESCENDS the level stack
        # — per level, NSW_L1_ROUNDS qid-keyed beam rounds at constant
        # width NSW_HIER_W over that level's edge relation (re-seeded
        # from the running pool's per-qid top) — and enters the base
        # graph at its per-qid top-n_entry of everything visited: the
        # same relational round shape as the base beam, on
        # progressively larger but still tiny edge relations.
        seed_df = (q.select("qid").crossJoin(
            vecs.filter(F.pmod(F.col(id_col),
                               F.lit(int(flat_mod))) == 0)
            .select(id_col)))
        visited = score(seed_df).localCheckpoint()
        for ledges in reversed(list(hier_levels)):
            hf = (visited.withColumn("_rn", F.row_number().over(wf))
                  .filter(F.col("_rn") <= NSW_HIER_W)
                  .select("qid", F.col(id_col).alias("src")))
            for _ in range(NSW_L1_ROUNDS):
                cand = (ledges.join(hf, "src")
                        .select("qid", F.col("dst").alias(id_col))
                        .distinct())
                new = cand.join(visited.select("qid", id_col),
                                ["qid", id_col], "left_anti")
                scored = score(new).localCheckpoint()
                visited = visited.unionByName(scored).localCheckpoint()
                hf = (scored.withColumn("_rn", F.row_number().over(wf))
                      .filter(F.col("_rn") <= NSW_HIER_W)
                      .select("qid", F.col(id_col).alias("src")))
        frontier = (visited.withColumn("_rn", F.row_number().over(wf))
                    .filter(F.col("_rn") <= n_entry)
                    .select("qid", F.col(id_col).alias("src")))
    elif stride is not None:
        # flat coarse entry (the r13 semantic, kept as the registered
        # degeneration for n1 < NSW_HIER_FLOOR): every qid scores the
        # whole ⌈n/stride⌉-row coarse layer, keeps all of it as
        # visited, and enters the graph at its per-qid top-n_entry.
        seed_df = (q.select("qid").crossJoin(
            vecs.filter(F.pmod(F.col(id_col), F.lit(int(stride))) == 0)
            .select(id_col)))
        visited = score(seed_df).localCheckpoint()
        frontier = (visited.withColumn("_rn", F.row_number().over(wf))
                    .filter(F.col("_rn") <= n_entry)
                    .select("qid", F.col(id_col).alias("src")))
    else:
        seed_df = (q.select("qid").crossJoin(
            sess.createDataFrame([(int(x),) for x in seeds],
                                 f"{id_col} long")))
        visited = score(seed_df).localCheckpoint()
        frontier = visited.select("qid", F.col(id_col).alias("src"))
    for _ in range(rounds):
        cand = (edges.join(frontier, "src")
                .select("qid", F.col("dst").alias(id_col)).distinct())
        new = cand.join(visited.select("qid", id_col),
                        ["qid", id_col], "left_anti")
        # localCheckpoint, not persist: the checkpoint CUTS the logical
        # lineage each round, so the plan the driver analyzes stays
        # round-sized instead of growing 4 unrolled rounds deep — the
        # deep tree (TreeNode string rendering during analysis) is what
        # OOM'd a default-1g gate session late in a 50-slot run (r13).
        # State is ef·M rows/qid — KB-class blocks (the mmr pattern).
        scored = score(new).localCheckpoint()
        visited = visited.unionByName(scored).localCheckpoint()
        frontier = (scored.withColumn("_rn", F.row_number().over(wf))
                    .filter(F.col("_rn") <= ef)
                    .select("qid", F.col(id_col).alias("src")))
        if stop_k is not None:
            # per-qid convergence (NSW_STOP_K, relational form): a qid
            # whose round produced no newcomer above its stop_k-th best
            # visited value drops out of the frontier — its remaining
            # rounds become empty joins.  kth is the stop_k-th largest
            # VALUE (rank without tie-break is value-deterministic);
            # the count guard keeps a qid alive until it has visited
            # MORE than stop_k nodes (the twin/oracle contract).
            kagg = (visited
                    .withColumn("_kn", F.row_number().over(
                        Window.partitionBy("qid")
                        .orderBy(F.col("_s").desc())))
                    .groupBy("qid")
                    .agg(F.count(F.lit(1)).alias("_nv"),
                         F.max(F.when(F.col("_kn") == stop_k,
                                      F.col("_s"))).alias("_kth")))
            mx = scored.groupBy("qid").agg(F.max("_s").alias("_mx"))
            alive = (mx.join(kagg, "qid", "left")
                     .filter((F.col("_nv") <= stop_k)
                             | (F.col("_mx") >= F.col("_kth")))
                     .select("qid"))
            frontier = frontier.join(alive, "qid", "left_semi") \
                .localCheckpoint()
            if frontier.isEmpty():
                # every qid converged — the remaining rounds would be
                # empty joins and their checkpoint jobs pure overhead
                break
    return (visited.withColumn("_rn", F.row_number().over(wf))
            .filter(F.col("_rn") <= k)
            .select("qid", id_col,
                    F.col("_s").alias(sim_col), F.col("_rn").alias("rank")))


def nsw_knn(df: DataFrame, qvec: Sequence[float], k: int = 10,
            m: int = NSW_M, ef: int = NSW_EF, rounds: int = NSW_ROUNDS,
            seeds: Sequence[int] = NSW_SEEDS,
            vec_col: str = "embedding", id_col: str = "vec_id",
            sim_col: str = "similarity",
            stride: int | None = None,
            n_entry: int = NSW_ENTRY_COUNT,
            n1: int | None = None,
            stop_k: int | None = NSW_STOP_K) -> DataFrame:
    """Inline build+search (the oracled form; production stores the
    graph once via ``write_nsw_index`` and serves many queries).
    Traversal is SYMMETRIC over the directed top-m build; with
    ``stride`` set the whole level stack is graph-indexed inline too
    and entry is the v4 HIERARCHICAL descent (``n1`` skips the first
    coarse count job when the caller already knows it)."""
    edges = symmetrize_edges(
        build_knn_graph(df, m=m, vec_col=vec_col, id_col=id_col))
    levels, flat_mod = None, None
    if stride is not None:
        import math
        base = df.filter(F.col(vec_col).isNotNull())
        n = base.count()
        if int(stride) != max(2, math.ceil(math.sqrt(max(1, n)))):
            # Non-√n coarse geometry: the hierarchy recursion is defined
            # on the √-stack only, and the caller's n1 counts the
            # caller-stride subset, not the √-subset — building levels
            # here would index geometry the caller never asked for.
            # Serve the flat coarse entry at the caller's stride instead
            # (the same fallback nsw_stored_knn takes on a stored-meta
            # stride mismatch, keeping the two paths equal).
            return beam_search_knn(edges, df, qvec, k=k, ef=ef,
                                   rounds=rounds, seeds=seeds,
                                   vec_col=vec_col, id_col=id_col,
                                   sim_col=sim_col, stride=stride,
                                   n_entry=n_entry, stop_k=stop_k)
        strides, counts = nsw_hier_plan(base, n, id_col=id_col, n1=n1)
        levels, prod = [], 1
        for s, cnt in zip(strides, counts):
            prod *= s
            if cnt < NSW_HIER_FLOOR:
                break
            levels.append(build_l1_graph(base, prod, m=m,
                                         vec_col=vec_col,
                                         id_col=id_col))
        flat_mod = prod
        if not levels:
            # degenerate corpus: flat coarse entry at the caller stride
            levels, flat_mod = None, None
    return beam_search_knn(edges, df, qvec, k=k, ef=ef, rounds=rounds,
                           seeds=seeds, vec_col=vec_col, id_col=id_col,
                           sim_col=sim_col, stride=stride,
                           n_entry=n_entry, hier_levels=levels,
                           flat_mod=flat_mod, stop_k=stop_k)


def upsert_nsw_index(spark, path: str, batch: DataFrame,
                     existing: DataFrame, m: int = NSW_M,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     n_buckets: int = 16) -> None:
    """INSERT a vector batch into a stored neighbor graph WITHOUT a
    rebuild — and, for pure inserts, EXACTLY (the property quantizer
    tiers cannot offer): node j's true top-m over C∪B is a subset of
    (its stored top-m over C) ∪ B, so appending

    - each new node's top-m edge list over C∪B (one blocked
      batch×corpus BLAS pass — |B|·|C| work, never |C|²), and
    - each EXISTING node's candidate edges to batch nodes that beat
      its current m-th edge under the (sim desc, dst asc) order
      (filtered against the per-src worst row, so the append is
      |improvements|, not |C|·|B|),

    and resolving per-src top-m AT READ TIME (the merge-on-read window
    ``beam_search_knn``'s stored lookup applies) serves the identical
    graph a full rebuild would produce — the oracle for the upsert slot
    IS the full-rebuild oracle.  Deletes are out of scope here (a
    removed node invalidates neighbors' lists non-locally; the
    documented production answer is periodic recompaction, the IVFADC
    pattern).

    v4 (r15, VERDICT r14 #2): the HIERARCHY is maintained incrementally
    too — each stored level is just another NSW graph in the same dual
    format, so the level's batch members (|B|/s1·…·sℓ of the batch) get
    the SAME exact append (new-node lists + beats-the-m-th-edge
    improvements, merge-on-read resolved).  A level is rebuilt whole
    ONLY when its geometry moves: the post-upsert ``nsw_hier_plan`` is
    compared stride-product by stride-product against the stored meta,
    and ⌈√n⌉ changes once per ~2√n inserts, so the rebuild (≤ n work,
    on an n^(1/2^ℓ)-sized layer) amortizes to O(√n) per insert — the
    upsert path's steady-state work term is |batch|-proportional, not
    the Θ(n) whole-L1 rebuild v3 paid per batch."""
    ex = (existing.filter(F.col(vec_col).isNotNull())
          .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
    brows = (batch.filter(F.col(vec_col).isNotNull())
             .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
             .collect())
    if not brows:
        return
    sess = existing.sparkSession
    bdf = sess.createDataFrame(
        [(int(r.id), list(r.v)) for r in brows],
        "id long, v array<double>")
    _append_graph_delta(spark, path, brows, ex, m, n_buckets,
                        batch_df=bdf)
    # store-format contract: the marker tells readers that merge-on-read
    # resolution AND mirror validation are now REQUIRED (a fresh store
    # needs neither — every src has exactly m fwd rows and every mirror
    # is valid); recompaction (rebuild) clears it with the store.
    # Written via the Hadoop FileSystem API so the marker exists — and is
    # visible to readers — on ANY store URI, not just the local posix FS.
    from openai_vector_search_demo_spark.stores import fs_touch
    fs_touch(spark, path.rstrip("/") + "/_DELTAS")

    # hierarchy maintenance: recompute the plan from the post-upsert
    # corpus (deterministic — an at-least-once replay sees the same
    # corpus and produces the same bytes), append incrementally where
    # the frozen geometry still matches, rebuild a level only where its
    # stride product moved (or it newly crossed the floor)
    allnodes = ex.unionByName(bdf)
    n = allnodes.count()
    meta = read_l1_meta(spark, path) or {}
    old_strides = meta.get("strides", [])
    old_counts = meta.get("counts", [])
    strides, counts = nsw_hier_plan(allnodes, n, id_col="id")
    prod, old_prod = 1, 1
    geom_ok = True
    for lvl, (s, cnt) in enumerate(zip(strides, counts), start=1):
        prod *= s
        if lvl <= len(old_strides):
            old_prod *= old_strides[lvl - 1]
        geom_ok = (geom_ok and lvl <= len(old_strides)
                   and old_prod == prod
                   and lvl <= len(old_counts)
                   and old_counts[lvl - 1] >= NSW_HIER_FLOOR)
        if cnt < NSW_HIER_FLOOR:
            break       # flat top — no graph at this level
        lpath = f"{path.rstrip('/')}/_L{lvl}"
        if geom_ok:
            bsub = [r for r in brows if int(r.id) % prod == 0]
            if bsub:
                _append_graph_delta(
                    spark, lpath, bsub,
                    ex.filter(F.pmod(F.col("id"), F.lit(int(prod)))
                              == 0),
                    m, n_buckets)
        else:
            sub = allnodes.filter(
                F.pmod(F.col("id"), F.lit(int(prod))) == 0)
            _write_graph_dual(
                build_knn_graph(sub, m=m, vec_col="v", id_col="id"),
                lpath, n_buckets)
    _write_hier_meta(spark, path, strides, counts, m)


def _append_graph_delta(spark, path: str, brows, existing: DataFrame,
                        m: int, n_buckets: int,
                        batch_df: DataFrame | None = None) -> None:
    """The exact-insert append for ONE stored graph (base layer or a
    hierarchy level): ``brows`` are collected (id, v) batch rows (KB —
    they ride the closure as a broadcast-by-value), ``existing`` the
    (id, v) relation of the layer's current members.  Appends the new
    nodes' top-m lists over existing∪batch plus every existing node's
    candidates that beat its current m-th stored edge, in the dual
    fwd/mirror format; merge-on-read resolution makes the result equal
    a full rebuild of the layer (the ``upsert_nsw_index`` proof)."""
    import pandas as pd

    bids = np.array([r.id for r in brows], dtype=np.int64)
    bmat = np.array([list(r.v) for r in brows], dtype=np.float64)
    bn = np.linalg.norm(bmat, axis=1)
    bn[bn == 0] = 1.0
    bunit = bmat / bn[:, None]
    sess = existing.sparkSession

    slack = m + 8

    def cross_sims(pdf_iter):
        """TWO pruned candidate streams per Arrow block, both exact by
        the blocked-top-M threshold argument (ties at the boundary
        included):

        - kind=0, (existing src → batch dst): each NON-batch row's
          top-(m+8) batch candidates — a superset of every batch edge
          that can enter the row's resolved top-m (anything below its
          own top-m among batch can never displace a stored edge into
          the final list).
        - kind=1, (batch src → block dst): each batch node's
          top-(m+8) candidates among THIS block's rows; the union over
          blocks contains the node's true global top-m over C∪B, and
          the per-src window below reduces it exactly.

        Emission is |block|·(m+8) + |B|·(m+8) rows instead of the
        |block|·|B| full cross relation — the r15 fix that cut the
        500-into-100k upsert's base append from ~7 min of per-tuple
        Python to one vectorized pass."""
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            nm = np.linalg.norm(mat, axis=1)
            nm[nm == 0] = 1.0
            sims = np.round((mat / nm[:, None]) @ bunit.T, 6)
            self_mask = ids[:, None] == bids[None, :]
            sims_masked = np.where(self_mask, -np.inf, sims)
            out_src, out_dst, out_sim = [], [], []
            # kind=0: per existing row, top-(m+8) batch candidates
            ex_rows = np.nonzero(~np.isin(ids, bids))[0]
            if len(ex_rows) and len(bids):
                sm = sims_masked[ex_rows]
                if sm.shape[1] > slack:
                    th = np.partition(sm, sm.shape[1] - slack, axis=1)[
                        :, sm.shape[1] - slack][:, None]
                    keep = sm >= th
                else:
                    keep = np.isfinite(sm)
                ri, ci = np.nonzero(keep)
                out_src.append(ids[ex_rows][ri])
                out_dst.append(bids[ci])
                out_sim.append(sims[ex_rows][ri, ci])
            # kind=1: per batch column, top-(m+8) rows of this block
            if len(ids) and len(bids):
                sm = sims_masked
                if sm.shape[0] > slack:
                    th = np.partition(sm, sm.shape[0] - slack, axis=0)[
                        sm.shape[0] - slack][None, :]
                    keep = sm >= th
                else:
                    keep = np.isfinite(sm)
                ri, ci = np.nonzero(keep)
                out_src.append(bids[ci])
                out_dst.append(ids[ri])
                out_sim.append(sims[ri, ci])
            if out_src:
                yield pd.DataFrame({
                    "src": np.concatenate(out_src).astype(np.int64),
                    "dst": np.concatenate(out_dst).astype(np.int64),
                    "sim": np.concatenate(out_sim).astype(np.float64)})

    # (existing∪batch) × batch sims — batch rides the closure (broadcast
    # by value); one Arrow pass over the layer, pruned emission
    # (batch_df lets the base-layer caller reuse its already-built
    # batch DataFrame instead of re-serializing brows)
    if batch_df is None:
        batch_df = sess.createDataFrame(
            [(int(r.id), list(r.v)) for r in brows],
            "id long, v array<double>")
    allnodes = existing.unionByName(batch_df)
    cross = allnodes.mapInPandas(cross_sims, "src long, dst long, sim double")

    # new nodes' top-m over C∪B: the kind=1 stream (batch src) unioned
    # over blocks, reduced by the global per-src window
    new_side = cross.filter(F.col("src").isin([int(x) for x in bids]))
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(),
                                          F.col("dst").asc())
    new_edges = (new_side.dropDuplicates(["src", "dst"])
                 .withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") <= m).drop("_rn"))

    # existing nodes' improvements: candidates beating the current m-th
    # edge under (sim desc, dst asc)
    # (src, dst) dedup first: a replayed micro-batch's byte-identical
    # appended rows must not shift the m-th-edge threshold (offline
    # path — the dedup shuffle is fine here, unlike the serving lookup)
    stored = (spark.read.parquet(path).filter(F.col("fwd"))
              .select("src", "dst", "sim").dropDuplicates(["src", "dst"]))
    worst = (stored.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == m)
             .select("src", F.col("sim").alias("wsim"),
                     F.col("dst").alias("wdst")))
    improvements = (cross.filter(~F.col("src").isin([int(x) for x in bids]))
                    .join(worst, "src", "left")
                    .filter(F.col("wsim").isNull()
                            | (F.col("sim") > F.col("wsim"))
                            | ((F.col("sim") == F.col("wsim"))
                               & (F.col("dst") < F.col("wdst"))))
                    .select("src", "dst", "sim"))

    out = new_edges.unionByName(improvements)
    # v2: every appended out-edge also lands as a fwd=false mirror under
    # the other endpoint's bucket (see write_nsw_index) — mirrors whose
    # canonical edge is later displaced become stale HINTS, which the
    # stored lookup's validation pass filters against the live top-m.
    both = (out.withColumn("fwd", F.lit(True))
            .unionByName(out.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst"), "sim")
                         .withColumn("fwd", F.lit(False))))
    (both.withColumn("bucket", F.pmod(F.col("src"), F.lit(n_buckets))
                     .cast("int"))
     .repartition(F.col("bucket"))
     .write.mode("append").partitionBy("bucket").parquet(path))


def delete_from_nsw_index(spark, path: str, ids: Sequence[int]) -> None:
    """SOFT-DELETE ids from a stored graph: append them to the store's
    tombstone table.  Ghost semantics (see ``beam_search_knn``): the
    nodes stay traversable so connectivity survives, they just cannot
    be returned.  The tombstone set is read whole at query time — it is
    the store's pending-delete backlog, bounded by recompaction cadence
    (rebuild without the tombstoned rows folds it back to zero, the
    IVFADC ``compact`` pattern)."""
    (spark.createDataFrame([(int(x),) for x in ids], "vec_id long")
     .coalesce(1).write.mode("append").parquet(f"{path}/_tombstones"))


def read_nsw_tombstones(spark, path: str) -> list[int]:
    import os
    tpath = f"{path}/_tombstones"
    if not os.path.isdir(tpath):
        return []
    return sorted(r.vec_id for r in spark.read.parquet(tpath)
                  .distinct().collect())


def compact_nsw_index(spark, path: str, source: DataFrame, dest: str,
                      m: int = NSW_M, vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      n_buckets: int = 16) -> int:
    """Periodic maintenance fold — the graph tier's
    ``compact_ivfpq_index``: REBUILD graph + L1 from ``source`` minus
    the store's tombstones, written marker-free to ``dest`` (a NEW
    location; the caller swaps paths).  Serving returns to the
    fresh-store fast path (no ``_DELTAS`` → one pruned read per round,
    no merge-on-read window, no mirror validation) and soft-deleted
    GHOSTS are hard-removed (their edges cannot be dropped in place —
    a removed node invalidates its neighbors' top-m lists non-locally,
    which is exactly why deletes are soft until compaction).  Returns
    the number of tombstoned ids folded away."""
    dead = read_nsw_tombstones(spark, path)
    live = source
    if dead:
        live = source.filter(~F.col(id_col).isin([int(x) for x in dead]))
    write_nsw_index(live, dest, m=m, vec_col=vec_col, id_col=id_col,
                    n_buckets=n_buckets)
    return len(dead)


def resolve_stored_edges(spark, path: str, m: int = NSW_M) -> DataFrame:
    """The store's CURRENT undirected traversal relation, resolved
    globally: merge-on-read top-``m`` window over the fwd rows (exact
    adjacency after any ``upsert_nsw_index`` appends), then
    symmetrized.  The BATCH serving form uses this — one resolve
    amortized over thousands of queries per job; the single-query path
    (``nsw_stored_knn``) instead resolves frontier-locally per round
    and never touches the whole store."""
    wm = Window.partitionBy("src").orderBy(F.col("sim").desc(),
                                           F.col("dst").asc())
    # dense_rank for the same replay-duplicate collapse as the stored
    # lookup's resolved_fwd; symmetrize_edges' distinct removes the
    # repeated (src, dst) rows duplicates leave behind
    fwd = (spark.read.parquet(path).filter(F.col("fwd"))
           .withColumn("_rn", F.dense_rank().over(wm))
           .filter(F.col("_rn") <= m).select("src", "dst"))
    return symmetrize_edges(fwd)


def read_l1_meta(spark, path: str) -> dict | None:
    """The store's L1-layer metadata (write-time stride/stride2/n1) or
    None for a pre-v3 store — read through the Hadoop FS API so it is
    visible on any store URI."""
    import json

    from openai_vector_search_demo_spark.stores import fs_read_text
    txt = fs_read_text(spark, path.rstrip("/") + "/_L1_META")
    return json.loads(txt) if txt else None


def resolve_stored_l1(spark, path: str):
    """(l1_edges, meta) — the legacy depth-1 view of
    ``resolve_stored_levels`` (kept for pre-v4 call sites/tests)."""
    levels, meta = resolve_stored_levels(spark, path)
    if meta is None:
        return None, None
    return (levels[0] if levels else None), meta


def resolve_stored_levels(spark, path: str, m: int = NSW_M):
    """(levels, meta) for the BATCH serving form: every stored
    hierarchy level's undirected traversal relation L1 → Ld, each
    resolved with the merge-on-read top-``m`` window over its fwd rows
    (exact after ``upsert_nsw_index`` level appends) and symmetrized —
    one read per level, n^(1/2^ℓ)-sized, amortized over every query in
    the batch.  ([], meta-or-None) when the store has no graph levels
    (flat-entry corpora / pre-v3 stores)."""
    meta = read_l1_meta(spark, path)
    if meta is None:
        return [], None
    counts = meta.get("counts", [meta["n1"]])
    levels = []
    wm = Window.partitionBy("src").orderBy(F.col("sim").desc(),
                                           F.col("dst").asc())
    mm = int(meta.get("m", m))
    for lvl, cnt in enumerate(counts, start=1):
        if cnt < NSW_HIER_FLOOR:
            break
        raw = spark.read.parquet(f"{path.rstrip('/')}/_L{lvl}")
        if "fwd" not in raw.columns:
            # pre-v4 store: _L1 was written as an already-symmetrized
            # (src, dst, sim, bucket) relation with no fwd/mirror split
            # — its rows ARE the traversal relation (no merge-on-read
            # window applies: v3 rebuilt the layer whole on upsert)
            levels.append(raw.select("src", "dst").distinct())
            continue
        fwd = (raw.filter(F.col("fwd"))
               .withColumn("_rn", F.dense_rank().over(wm))
               .filter(F.col("_rn") <= mm).select("src", "dst"))
        levels.append(symmetrize_edges(fwd))
    return levels, meta


def nsw_stored_knn(spark, path: str, source: DataFrame,
                   qvec: Sequence[float], k: int = 10,
                   ef: int = NSW_EF, rounds: int = NSW_ROUNDS,
                   seeds: Sequence[int] = NSW_SEEDS,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   sim_col: str = "similarity",
                   n_buckets: int = 16, m: int = NSW_M,
                   stride: int | None = None,
                   n_entry: int = NSW_ENTRY_COUNT,
                   stop_k: int | None = NSW_STOP_K) -> DataFrame:
    """Serving read of a ``write_nsw_index`` store: each round touches
    only the frontier's src BUCKET DIRECTORIES (the lookup filters the
    partition column derived from the frontier ids — partition pruning
    at discovery time, the stored-LSH pattern) and the scored ids'
    vectors (broadcast point-reads).  ``n_buckets`` must match the
    write.

    MERGE-ON-READ: the per-src top-``m`` window resolves the current
    OUT-list from (original ∪ ``upsert_nsw_index``-appended) fwd rows —
    a no-op on a never-upserted store and the exact full-rebuild list
    after inserts; it runs on the frontier-sized lookup, never the
    store.  Traversal is SYMMETRIC (v2): the frontier's fwd=false
    mirror rows contribute reversed edges after VALIDATION — each
    mirror (w←x) is kept only if (x→w) survives x's own resolved
    top-m, one extra bucket-pruned point read per round — so stale
    mirrors left behind by upsert displacement can never steer the
    beam off the oracle's graph."""
    from openai_vector_search_demo_spark.stores import fs_exists

    edges = spark.read.parquet(path)
    # Hadoop-FS stat, not os.path: the marker must be visible on ANY
    # store URI (s3a://, hdfs://) or an upserted remote store would
    # silently take the fresh-store fast path and serve a stale graph.
    has_deltas = fs_exists(spark, path.rstrip("/") + "/_DELTAS")

    def _dsc(s):
        """Spark's (sim DESC NULLS LAST, NaN largest) as an ascending
        key — the stored sims are 6-dp-rounded doubles written by the
        build/upsert, so sorting THEM driver-side replays the
        merge-on-read window's order bit-for-bit (no recomputation)."""
        if s is None:
            return (2, 0.0)
        if s != s:          # NaN sorts above every number under DESC
            return (0, 0.0)
        return (1, -s)

    def _topm_dsts(rows, mm: int) -> dict:
        """Driver replay of the merge-on-read DENSE_RANK window over
        (sim DESC, dst ASC) per src, rank ≤ mm: distinct (sim, dst)
        pairs — an at-least-once replay's byte-identical appended rows
        collapse, exactly like dense_rank (r15: the window ran as a
        per-round SHUFFLE inside the lookup plan before; the lookup is
        a ≤ ef·M-row pruned point read, so the selection is KB-class
        driver work)."""
        bysrc: dict = {}
        for src, dst, sim in rows:
            bysrc.setdefault(src, set()).add((sim, dst))
        return {src: [d for _, d in
                      sorted(pairs, key=lambda p: (_dsc(p[0]), p[1]))[:mm]]
                for src, pairs in bysrc.items()}

    def lookup(ids: list[int]):
        buckets = sorted({i % n_buckets for i in ids})
        if not has_deltas:
            # never-upserted store (the common serving case): every src
            # has exactly m fwd rows and every mirror is valid — one
            # pruned read, no window, no validation round-trip
            return (edges.filter(F.col("bucket").isin(buckets)
                                 & F.col("src").isin(ids))
                    .select("src", "dst"))
        # delta store: ONE pruned point read returns the frontier's fwd
        # AND mirror rows; the top-m resolution and mirror validation
        # are driver-side selections over the stored 6-dp sims (r15 —
        # this was 1 extra collect + 2 window shuffles + a broadcast
        # semi-join per round)
        rows = (edges.filter(F.col("bucket").isin(buckets)
                             & F.col("src").isin(ids))
                .select("src", "dst", "sim", "fwd").collect())
        fwd_top = _topm_dsts([(r.src, r.dst, r.sim)
                              for r in rows if r.fwd], m)
        cands = {d for ds in fwd_top.values() for d in ds}
        mirrors = {(r.src, r.dst) for r in rows if not r.fwd}
        xs = sorted({x for _, x in mirrors})
        if not xs:
            return sorted(cands)

        def resolve() -> set:
            # validation: mirror (w ← x) is kept only if (x → w)
            # survives x's own resolved top-m — one more pruned read,
            # run CONCURRENTLY with the round's scoring read (§2.6)
            xb = sorted({i % n_buckets for i in xs})
            vrows = (edges.filter(F.col("bucket").isin(xb)
                                  & F.col("src").isin(xs) & F.col("fwd"))
                     .select("src", "dst", "sim").collect())
            x_top = _topm_dsts([(r.src, r.dst, r.sim) for r in vrows], m)
            return {x for (w, x) in mirrors if w in x_top.get(x, ())}

        return (cands, {x for _, x in mirrors}, resolve)

    # v4 hierarchical entry off the store's own level stack: each
    # level's lookup prunes its _L{l} bucket directories by the
    # frontier ids exactly like the base lookup, with the SAME
    # merge-on-read resolution + mirror validation when the store
    # carries upsert deltas (levels are stored in the base dual format
    # since v4, so they are incrementally maintainable too).  The
    # stored stack is used only when the caller's stride MATCHES the
    # write-time geometry (they agree whenever both derive from the
    # same corpus — the serving slots' case); an explicit non-matching
    # stride keeps the flat coarse scan, since the stored levels index
    # different layers than the one the caller asked to enter through.
    levels = None
    flat_mod = None
    if stride is not None:
        meta = read_l1_meta(spark, path)
        if meta is not None and int(meta["stride"]) == int(stride):
            strides = meta.get("strides", [meta["stride"],
                                           meta["stride2"]])
            # legacy v3 metas carry only n1: pad with a below-floor
            # count so the loop terminates at flat_mod = stride·stride2
            # (exactly the v3 flat-top geometry)
            counts = meta.get("counts", [meta["n1"], 0])
            mm = int(meta.get("m", m))

            def level_cb(lvl: int):
                le = spark.read.parquet(f"{path.rstrip('/')}/_L{lvl}")

                def cb(ids: list[int]):
                    buckets = sorted({i % n_buckets for i in ids})
                    sel = (le.filter(F.col("bucket").isin(buckets)
                                     & F.col("src").isin(ids)))
                    if not has_deltas or "fwd" not in le.columns:
                        # no deltas — or a pre-v4 layer written whole
                        # (symmetric, no fwd/mirror split): rows ARE
                        # the traversal relation
                        return sel.select("src", "dst")
                    # delta store: same one-read + driver-side
                    # resolution/validation as the base lookup (r15)
                    rows = (sel.select("src", "dst", "sim", "fwd")
                            .collect())
                    fwd_top = _topm_dsts([(r.src, r.dst, r.sim)
                                          for r in rows if r.fwd], mm)
                    cands = {d for ds in fwd_top.values() for d in ds}
                    mirrors = {(r.src, r.dst)
                               for r in rows if not r.fwd}
                    xs = sorted({x for _, x in mirrors})
                    if not xs:
                        return sorted(cands)

                    def resolve() -> set:
                        xb = sorted({i % n_buckets for i in xs})
                        vrows = (le.filter(F.col("bucket").isin(xb)
                                           & F.col("src").isin(xs)
                                           & F.col("fwd"))
                                 .select("src", "dst", "sim").collect())
                        x_top = _topm_dsts([(r.src, r.dst, r.sim)
                                            for r in vrows], mm)
                        return {x for (w, x) in mirrors
                                if w in x_top.get(x, ())}

                    return (cands, {x for _, x in mirrors}, resolve)
                return cb

            levels = []
            prod = 1
            for lvl, (s, cnt) in enumerate(zip(strides, counts),
                                           start=1):
                prod *= s
                if cnt < NSW_HIER_FLOOR:
                    break
                levels.append(level_cb(lvl))
            flat_mod = prod
            if not levels:
                levels, flat_mod = None, None

    return beam_search_knn(lookup, source, qvec, k=k, ef=ef,
                           rounds=rounds, seeds=seeds, vec_col=vec_col,
                           id_col=id_col, sim_col=sim_col,
                           exclude_ids=read_nsw_tombstones(spark, path),
                           stride=stride, n_entry=n_entry,
                           hier_levels=levels, flat_mod=flat_mod,
                           stop_k=stop_k)
