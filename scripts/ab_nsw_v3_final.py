"""Validation of the exact NSW serving-v3 candidate before it becomes
the registered default (verdict r13 #1/#2):

  stride = ceil(sqrt(n)); ef = max(12, ceil(1.5*sqrt(n))); rounds = 4
  n_entry = 16; HIERARCHICAL entry: L1 = coarse graph (top-M over the
  stride subset), L2 = vec_id % (stride*stride2) == 0 with stride2 =
  ceil(sqrt(n1)); ef1 = stride2, r1 = 2, 8 seeds; n1 < 16 -> flat
  (score all of L1 — the small-corpus degeneration the SQL mirrors
  with an OR predicate).

Receipts printed per sf: mean/min recall@10 on the 20 held-out
queries, mean visited, mean ACTUAL coarse evaluations (|L1 visited|)
vs the flat scan's n1 — the 'coarse term shrunk' number."""
import math

import duckdb
import numpy as np

NQ, M, K = 20, 6, 10
HIER_FLOOR = 16


def run_sf(sf_dir):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    nm = np.linalg.norm(mat, axis=1)
    nm[nm == 0] = 1.0
    unit = mat / nm[:, None]
    qmask = ids < NQ
    cids, cmat = ids[~qmask], unit[~qmask]
    qmat = unit[qmask]
    n = len(cids)
    pos = {int(v): i for i, v in enumerate(cids)}

    sims = np.round(cmat @ cmat.T, 6)
    np.fill_diagonal(sims, -np.inf)
    adj = {int(c): set() for c in cids}
    for i in range(n):
        for j in np.lexsort((cids, -sims[i]))[:M]:
            adj[int(cids[i])].add(int(cids[j]))
            adj[int(cids[j])].add(int(cids[i]))

    qs = np.round(qmat @ cmat.T, 6)
    exact = [set(cids[np.lexsort((cids, -qs[q]))[:K]].tolist())
             for q in range(NQ)]

    stride = max(2, math.ceil(math.sqrt(n)))
    ef = max(12, math.ceil(1.5 * math.sqrt(n)))
    coarse = cids[cids % stride == 0]
    n1 = len(coarse)
    stride2 = max(2, math.ceil(math.sqrt(n1)))
    cposl = [pos[int(x)] for x in coarse]
    csims = np.round(cmat[cposl] @ cmat[cposl].T, 6)
    np.fill_diagonal(csims, -np.inf)
    hadj = {int(c): set() for c in coarse}
    for i in range(n1):
        for j in np.lexsort((coarse, -csims[i]))[:M]:
            hadj[int(coarse[i])].add(int(coarse[j]))
            hadj[int(coarse[j])].add(int(coarse[i]))
    l2 = (coarse if n1 < HIER_FLOOR
          else coarse[coarse % (stride * stride2) == 0])

    def topk(s, idset, k):
        a = np.array(sorted(idset), dtype=np.int64)
        return a[np.lexsort((a, -s[[pos[x] for x in a]]))][:k].tolist()

    recs, vis, cevals = [], [], []
    for q in range(NQ):
        s = qs[q]
        hv = set(l2.tolist())
        hf = topk(s, hv, 8)
        for _ in range(2):
            new = set()
            for f in hf:
                new |= hadj[f]
            new -= hv
            if not new:
                break
            hv |= new
            hf = topk(s, new, stride2)
        cevals.append(len(hv))
        visited = set(hv)
        frontier = topk(s, hv, 16)
        for _ in range(4):
            new = set()
            for f in frontier:
                new |= adj[f]
            new -= visited
            if not new:
                break
            visited |= new
            frontier = topk(s, new, ef)
        top = set(topk(s, visited, K))
        recs.append(len(top & exact[q]) / K)
        vis.append(len(visited))
    print(f"{sf_dir}: n={n} stride={stride} ef={ef} n1={n1} "
          f"stride2={stride2} |L2|={len(l2)}")
    print(f"  mean={np.mean(recs):.3f} min={np.min(recs):.2f} "
          f"visited={np.mean(vis):.0f} ({np.mean(vis)/n:.3f}) "
          f"coarse_evals={np.mean(cevals):.1f} vs flat {n1}")


for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"):
    run_sf(sf)
