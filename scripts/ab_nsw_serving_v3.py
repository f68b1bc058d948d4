"""A/B harness for the NSW serving config at sf0.1 — pure-numpy twin of
``operators/nsw.py``'s beam (same 6-dp rounding, same (sim desc, id asc)
selection order), so the (ef, n_entry, rounds, hierarchy) space can be
swept in seconds instead of Spark-minutes.  Verdict r13 #1/#2: find the
operating point with min recall@10 >= 0.7 on the 20 held-out queries AND
a hierarchical entry whose coarse term shrinks below the flat sqrt(n)
scan.  Results land in BASELINE.md as the receipt for whatever config
the serving default moves to."""
import math
import sys

import duckdb
import numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NQ, M, K = 20, 6, 10

con = duckdb.connect()
rows = con.sql(
    f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' "
    "WHERE embedding IS NOT NULL ORDER BY vec_id").fetchall()
ids = np.array([r[0] for r in rows], dtype=np.int64)
mat = np.array([r[1] for r in rows], dtype=np.float64)
nm = np.linalg.norm(mat, axis=1)
nm[nm == 0] = 1.0
unit = mat / nm[:, None]

qmask = ids < NQ
qids, qmat = ids[qmask], unit[qmask]
cids, cmat = ids[~qmask], unit[~qmask]
n = len(cids)
pos = {int(v): i for i, v in enumerate(cids)}

# exact top-M graph over the corpus (sim desc, dst asc), symmetrized
sims = np.round(cmat @ cmat.T, 6)
np.fill_diagonal(sims, -np.inf)
adj = {int(c): set() for c in cids}
for i in range(n):
    order = np.lexsort((cids, -sims[i]))[:M]
    for j in order:
        adj[int(cids[i])].add(int(cids[j]))
        adj[int(cids[j])].add(int(cids[i]))

qs = np.round(qmat @ cmat.T, 6)  # (NQ, n) query-corpus sims
exact = [set(cids[np.lexsort((cids, -qs[q]))[:K]].tolist())
         for q in range(NQ)]


def beam(q, entry_ids, entry_visited, ef, rounds):
    """entry_visited: ids already scored (coarse layer); entry_ids seed
    the frontier.  Returns (top-10 ids, n_visited)."""
    s = qs[q]
    visited = set(entry_visited)
    frontier = list(entry_ids)
    for _ in range(rounds):
        if not frontier:
            break
        new = set()
        for f in frontier:
            new |= adj[f]
        new -= visited
        if not new:
            break
        visited |= new
        na = np.array(sorted(new), dtype=np.int64)
        order = np.lexsort((na, -s[[pos[x] for x in na]]))
        frontier = na[order][:ef].tolist()
    va = np.array(sorted(visited), dtype=np.int64)
    order = np.lexsort((va, -s[[pos[x] for x in va]]))
    return set(va[order][:K].tolist()), len(visited)


def flat_entry(q, stride, n_entry):
    coarse = cids[cids % stride == 0]
    s = qs[q][[pos[int(x)] for x in coarse]]
    order = np.lexsort((coarse, -s))
    return coarse[order][:n_entry].tolist(), set(coarse.tolist())


def run(name, entry_fn, ef, rounds, coarse_cost):
    recs, vis = [], []
    for q in range(NQ):
        entries, seen0 = entry_fn(q)
        top, nv = beam(q, entries, seen0, ef, rounds)
        recs.append(len(top & exact[q]) / K)
        vis.append(nv)
    print(f"{name:58s} mean={np.mean(recs):.3f} min={np.min(recs):.2f} "
          f"visited={np.mean(vis):.0f} ({np.mean(vis)/n:.3f}) "
          f"coarse_evals={coarse_cost}")
    return np.mean(recs), np.min(recs)


stride = max(2, math.ceil(math.sqrt(n)))
ef0 = max(12, stride)
n_coarse = int((cids % stride == 0).sum())

print(f"n={n} stride={stride} ef0={ef0} n_coarse={n_coarse}")
# --- current serving (r13) baseline ---
run("r13: flat sqrt(n) coarse, ef=sqrt(n), ne=8, r=4",
    lambda q: flat_entry(q, stride, 8), ef0, 4, n_coarse)

# --- single-lever sweeps ---
for ne in (16, 24, 32):
    run(f"flat, ne={ne}", lambda q, ne=ne: flat_entry(q, stride, ne),
        ef0, 4, n_coarse)
for ef in (int(1.5 * ef0), 2 * ef0):
    run(f"flat, ef={ef}", lambda q: flat_entry(q, stride, 8), ef, 4,
        n_coarse)
for r in (5, 6):
    run(f"flat, rounds={r}", lambda q: flat_entry(q, stride, 8), ef0, r,
        n_coarse)
run("flat, ne=16 ef=1.5x", lambda q: flat_entry(q, stride, 16),
    int(1.5 * ef0), 4, n_coarse)
run("flat, ne=16 r=5", lambda q: flat_entry(q, stride, 16), ef0, 5,
    n_coarse)

# --- hierarchical entry: beam over the graph-indexed coarse layer ---
coarse = cids[cids % stride == 0]
n1 = len(coarse)
cpos = [pos[int(x)] for x in coarse]
csims = np.round(cmat[cpos] @ cmat[cpos].T, 6)
np.fill_diagonal(csims, -np.inf)
hadj = {int(c): set() for c in coarse}
for i in range(n1):
    order = np.lexsort((coarse, -csims[i]))[:M]
    for j in order:
        hadj[int(coarse[i])].add(int(coarse[j]))
        hadj[int(coarse[j])].add(int(coarse[i]))

stride2 = max(2, math.ceil(math.sqrt(n1)))
l2 = coarse[coarse % (stride * stride2) == 0]
print(f"L1={n1} stride2={stride2} L2={len(l2)}")


def hier_entry(q, ef1, rounds1, n_entry):
    s = qs[q]
    visited = set(l2.tolist())
    sa = s[[pos[int(x)] for x in l2]]
    order = np.lexsort((l2, -sa))
    frontier = l2[order][:n_entry].tolist()
    for _ in range(rounds1):
        new = set()
        for f in frontier:
            new |= hadj[f]
        new -= visited
        if not new:
            break
        visited |= new
        na = np.array(sorted(new), dtype=np.int64)
        order = np.lexsort((na, -s[[pos[x] for x in na]]))
        frontier = na[order][:ef1].tolist()
    va = np.array(sorted(visited), dtype=np.int64)
    order = np.lexsort((va, -s[[pos[x] for x in va]]))
    return va[order][:n_entry].tolist(), set(va.tolist())


for ef1, r1 in ((stride2, 2), (stride2, 3), (2 * stride2, 2),
                (2 * stride2, 3)):
    cost = len(l2) + r1 * ef1 * M
    run(f"hier ef1={ef1} r1={r1}, base ef={ef0} ne=8",
        lambda q, e=ef1, r=r1: hier_entry(q, e, r, 8), ef0, 4, cost)
for ne in (16, 24):
    cost = len(l2) + 3 * 2 * stride2 * M
    run(f"hier ef1={2*stride2} r1=3, ne={ne}",
        lambda q, ne=ne: hier_entry(q, 2 * stride2, 3, ne), ef0, 4, cost)
    run(f"hier ef1={2*stride2} r1=3, ne={ne} ef=1.5x",
        lambda q, ne=ne: hier_entry(q, 2 * stride2, 3, ne),
        int(1.5 * ef0), 4, cost)
