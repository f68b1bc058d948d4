#!/usr/bin/env python
"""A/B harness for NSW serving v4 (r15) — pure-numpy twin of
``operators/nsw.py``'s beam (same 6-dp rounding, same (sim desc, id asc)
selection), swept at n = 2k / 20k / 100k (sf0.1 + the fitted-mixture
/tmp/sf1_ann + /tmp/sf5_ann fixtures from ``gen_sf1_ann.py``).

Question (VERDICT r14 #1): can a DEEP hierarchy (recurse the coarse
graph-indexing while the level holds >= NSW_HIER_FLOOR nodes) plus a
CONSTANT base ef hold recall@10 >= 0.9 at 100k with per-query work flat
in n?  Today ef = ceil(1.5*sqrt(n)) gives mean 0.97/0.77/0.62 across the
curve — per-query work Theta(sqrt(n)*M) and recall still decaying.

Levers swept: base ef (fixed literals), base rounds, per-level beam
width W and rounds, graph degree M, and newcomers-only vs best-first
frontier selection.  Usage: ab_nsw_v4_deep.py [n2k|n20k|n100k|all]
"""
from __future__ import annotations

import math
import sys

import duckdb
import numpy as np

M_MAX = 16          # candidate lists kept per node; sliced per-M below
NQ, K = 20, 10
FLOOR = 16

FIXTURES = {
    "n2k": "/root/testdata/sf0.1/embeddings.parquet",
    "n20k": "/tmp/sf1_ann/embeddings.parquet",
    # the SLOT-owned deterministic 100k fixture (regenerated on demand —
    # queries.graph_ann._ensure_ann_scale_fixture; seed 1404, 50x)
    "n100k": "/tmp/spark_graft_ann100k_fixture/embeddings.parquet",
}


def _ensure_fixtures():
    from openai_vector_search_demo_spark.queries.graph_ann import (
        _ensure_ann_scale_fixture,
    )
    _ensure_ann_scale_fixture()


def load(path):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, label, embedding FROM '{path}' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[2] for r in rows], dtype=np.float64)
    nm = np.linalg.norm(mat, axis=1)
    nm[nm == 0] = 1.0
    unit = (mat / nm[:, None]).astype(np.float32)
    qmask = ids < NQ
    return ids[qmask], unit[qmask], ids[~qmask], unit[~qmask]


def topm_lists(cids, cmat, block=8192):
    """Per-row top-M_MAX neighbor ids by (sim desc, dst asc), blocked."""
    n = len(cids)
    out = np.empty((n, M_MAX), dtype=np.int64)
    for lo in range(0, n, block):
        hi = min(n, lo + block)
        sims = np.round(cmat[lo:hi] @ cmat.T, 6)
        for r in range(hi - lo):
            sims[r, lo + r] = -np.inf
        # top-(M_MAX) with (sim desc, id asc) ties
        part = np.argpartition(-sims, M_MAX + 8, axis=1)[:, :M_MAX + 8]
        for r in range(hi - lo):
            cand = part[r]
            order = np.lexsort((cids[cand], -sims[r, cand]))
            out[lo + r] = cids[cand[order][:M_MAX]]
    return out


def sym_adj(cids, lists, m):
    adj = {int(c): set() for c in cids}
    for i, c in enumerate(cids):
        for d in lists[i][:m]:
            adj[int(c)].add(int(d))
            adj[int(d)].add(int(c))
    return adj


def subset_graph(cids, cmat, pos, sub_ids, m):
    """Exact symmetric top-m graph over a subset (small: direct BLAS)."""
    sp = np.array([pos[int(x)] for x in sub_ids])
    sims = np.round(cmat[sp] @ cmat[sp].T, 6)
    np.fill_diagonal(sims, -np.inf)
    adj = {int(c): set() for c in sub_ids}
    for i in range(len(sub_ids)):
        order = np.lexsort((sub_ids, -sims[i]))[:m]
        for j in order:
            adj[int(sub_ids[i])].add(int(sub_ids[j]))
            adj[int(sub_ids[j])].add(int(sub_ids[i]))
    return adj


class Twin:
    def __init__(self, name, path):
        self.name = name
        self.qids, self.qmat, self.cids, self.cmat = load(path)
        self.n = len(self.cids)
        self.pos = {int(v): i for i, v in enumerate(self.cids)}
        print(f"[{name}] n={self.n}  building top-{M_MAX} lists...",
              flush=True)
        self.lists = topm_lists(self.cids, self.cmat)
        self.qs = np.round(self.qmat @ self.cmat.T, 6)
        self.exact = [set(self.cids[np.lexsort(
            (self.cids, -self.qs[q]))[:K]].tolist()) for q in range(NQ)]
        self._adj = {}
        self._levels = {}

    def adj(self, m):
        if m not in self._adj:
            self._adj[m] = sym_adj(self.cids, self.lists, m)
        return self._adj[m]

    def levels(self, m):
        """[(subset_ids, adj_or_None)] from L1 upward; the last entry is
        the flat-scanned top subset (no graph)."""
        if m in self._levels:
            return self._levels[m]
        out = []
        prod = 1
        sub = self.cids
        while True:
            stride = max(2, math.ceil(math.sqrt(len(sub))))
            prod *= stride
            sub = self.cids[self.cids % prod == 0]
            if len(sub) < FLOOR:
                out.append((sub, None))   # flat top
                break
            out.append((sub, subset_graph(self.cids, self.cmat, self.pos,
                                          sub, m)))
        self._levels[m] = out
        return out

    def beam(self, q, adj, entry_ids, entry_visited, ef, rounds,
             best_first=False):
        s = self.qs[q]
        visited = set(entry_visited)
        frontier = list(entry_ids)
        expanded = set()
        for _ in range(rounds):
            if not frontier:
                break
            new = set()
            for f in frontier:
                new |= adj.get(f, set())
            expanded.update(frontier)
            new -= visited
            if new:
                visited |= new
            if best_first:
                pool = np.array(sorted(visited - expanded), dtype=np.int64)
                if len(pool) == 0:
                    break
                order = np.lexsort(
                    (pool, -s[[self.pos[int(x)] for x in pool]]))
                frontier = pool[order][:ef].tolist()
            else:
                if not new:
                    break
                na = np.array(sorted(new), dtype=np.int64)
                order = np.lexsort((na, -s[[self.pos[x] for x in na]]))
                frontier = na[order][:ef].tolist()
        va = np.array(sorted(visited), dtype=np.int64)
        order = np.lexsort((va, -s[[self.pos[int(x)] for x in va]]))
        return set(va[order][:K].tolist()), visited

    def hier_entry(self, q, m, W, lrounds, n_entry, best_first=False):
        """Descend the level stack: flat-scan the top subset, beam each
        graph level with width W, seed each next level with the running
        pool's top; return (entry ids, visited pool)."""
        s = self.qs[q]
        lv = self.levels(m)
        top_ids = lv[-1][0]
        visited = set(int(x) for x in top_ids)
        for sub, adj in reversed(lv[:-1]):
            pool = np.array(sorted(visited), dtype=np.int64)
            order = np.lexsort((pool, -s[[self.pos[int(x)] for x in pool]]))
            seeds = pool[order][:W].tolist()
            _, visited = self.beam(q, adj, seeds, visited, W, lrounds,
                                   best_first)
        pool = np.array(sorted(visited), dtype=np.int64)
        order = np.lexsort((pool, -s[[self.pos[int(x)] for x in pool]]))
        return pool[order][:n_entry].tolist(), visited

    def v3_entry(self, q, m, n_entry=16):
        """Reproduce the registered v3 semantic: L2 flat, 2 rounds over
        L1 with width stride2, top-16 entry."""
        s = self.qs[q]
        stride = max(2, math.ceil(math.sqrt(self.n)))
        l1 = self.cids[self.cids % stride == 0]
        n1 = len(l1)
        if n1 < FLOOR:
            visited = set(int(x) for x in l1)
            pool = np.array(sorted(visited), dtype=np.int64)
            order = np.lexsort((pool, -s[[self.pos[int(x)] for x in pool]]))
            return pool[order][:n_entry].tolist(), visited
        stride2 = max(2, math.ceil(math.sqrt(n1)))
        adj1 = subset_graph(self.cids, self.cmat, self.pos, l1, m)
        l2 = l1[l1 % (stride * stride2) == 0]
        visited = set(int(x) for x in l2)
        pool = np.array(sorted(visited), dtype=np.int64)
        order = np.lexsort((pool, -s[[self.pos[int(x)] for x in pool]]))
        seeds = pool[order][:8].tolist()
        _, visited = self.beam(q, adj1, seeds, visited, stride2, 2)
        pool = np.array(sorted(visited), dtype=np.int64)
        order = np.lexsort((pool, -s[[self.pos[int(x)] for x in pool]]))
        return pool[order][:n_entry].tolist(), visited

    def run(self, label, m, entry_fn, ef, rounds, best_first=False):
        recs, vis = [], []
        adj = self.adj(m)
        for q in range(NQ):
            entries, seen0 = entry_fn(q)
            top, visited = self.beam(q, adj, entries, seen0, ef, rounds,
                                     best_first)
            recs.append(len(top & self.exact[q]) / K)
            vis.append(len(visited))
        print(f"[{self.name}] {label:52s} mean={np.mean(recs):.3f} "
              f"min={np.min(recs):.2f} visited={np.mean(vis):.0f} "
              f"({np.mean(vis) / self.n:.4f})", flush=True)
        return float(np.mean(recs)), float(np.min(recs))


def sweep(tw: Twin):
    n = tw.n
    ef_auto = max(12, math.ceil(1.5 * math.sqrt(n)))
    # --- reproduce the v3 receipt ---
    tw.run(f"v3: auto ef={ef_auto} r=5 (registered)", 6,
           lambda q: tw.v3_entry(q, 6), ef_auto, 5)
    # --- deep hierarchy + fixed ef, newcomers-only (current semantics) ---
    for ef in (64, 128, 192, 256):
        for rounds in (5, 8, 12):
            tw.run(f"v4 deep W=16 lr=2 ne=16, ef={ef} r={rounds}", 6,
                   lambda q: tw.hier_entry(q, 6, 16, 2, 16), ef, rounds)
    # --- best-first frontier (HNSW efSearch semantics) ---
    for ef in (64, 128):
        for rounds in (8, 12):
            tw.run(f"v4 BF   W=16 lr=2 ne=16, ef={ef} r={rounds}", 6,
                   lambda q: tw.hier_entry(q, 6, 16, 2, 16, True),
                   ef, rounds, True)
    # --- degree lever ---
    for m in (10, 16):
        tw.run(f"v4 deep m={m} W=16 lr=2, ef=128 r=8", m,
               lambda q, m=m: tw.hier_entry(q, m, 16, 2, 16), 128, 8)
        tw.run(f"v4 BF   m={m} W=16 lr=2, ef=64 r=12", m,
               lambda q, m=m: tw.hier_entry(q, m, 16, 2, 16, True),
               64, 12, True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = [which] if which != "all" else list(FIXTURES)
    for name in names:
        tw = Twin(name, FIXTURES[name])
        sweep(tw)


if __name__ == "__main__":
    main()


def refine(tw: Twin):
    """Second-stage sweep around the m=16 fixed-ef point (r15)."""
    for m in (12, 16):
        for ef in (128, 160, 192):
            for rounds in (8, 10):
                tw.run(f"v4 m={m} W=16 lr=2 ne=16, ef={ef} r={rounds}", m,
                       lambda q, m=m: tw.hier_entry(q, m, 16, 2, 16),
                       ef, rounds)
        tw.run(f"v4 m={m} W=32 lr=3 ne=32, ef=128 r=8", m,
               lambda q, m=m: tw.hier_entry(q, m, 32, 3, 32), 128, 8)
        tw.run(f"v4 m={m} W=16 lr=2 ne=32, ef=128 r=10", m,
               lambda q, m=m: tw.hier_entry(q, m, 16, 2, 32), 128, 10)


def final(tw: Twin):
    """The registered v4 operating point (r15): m=16, ef=160, r=8,
    W=16, lr=2, ne=16 — one row per fixture for SCALE.md."""
    tw.run("v4 FINAL m=16 W=16 lr=2 ne=16, ef=160 r=8", 16,
           lambda q: tw.hier_entry(q, 16, 16, 2, 16), 160, 8)
    lv = tw.levels(16)
    print(f"[{tw.name}] levels: " +
          " ".join(f"L{i+1}={len(s[0])}" for i, s in enumerate(lv[:-1]))
          + f" flat_top={len(lv[-1][0])}")
