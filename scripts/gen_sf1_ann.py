#!/usr/bin/env python
"""Independent-vector sf1 ANN fixture (r14).

`gen_sf1_scaled.py` replicates sf0.1 vectors 10x with ~6% perturbation —
right for the DEDUP families (near-dup structure preserved), but it
plants duplicate multiplicity 10 > M into the kNN graph, which shatters
it into per-replica cliques (the documented SCALE.md r12 pathology and
the reason `dedup_graph_index_capstone` exists).  An NSW scaling point
on that fixture measures the pathology, not the serving tier.

This script instead RESAMPLES: per label, fit (mean, per-dim std) to
the sf0.1 vectors and draw 10x as many INDEPENDENT Gaussians from that
fitted mixture (seeded, deterministic) — same geometry family as the
driver's data, no duplicate structure.  Output:
``/tmp/sf1_ann/embeddings.parquet`` (vec_id 0.., label, fp32 list),
scratch — regenerate on demand, never committed.  The NSW slots read
only the embeddings table, so this directory serves directly as their
``sf_dir``.
"""
from __future__ import annotations

import collections

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT_DIR = "/tmp/sf1_ann"
SCALE = 10

con = duckdb.connect()
rows = con.sql(f"SELECT label, embedding FROM '{SRC}' "
               "WHERE embedding IS NOT NULL ORDER BY vec_id").fetchall()
by = collections.defaultdict(list)
for lab, emb in rows:
    by[lab].append(emb)

rng = np.random.RandomState(1404)
recs = []
for lab in sorted(by):
    m = np.array(by[lab], dtype=np.float64)
    mu, sd = m.mean(0), m.std(0)
    n = len(m) * SCALE
    recs.append((np.full(n, lab, dtype=np.int32),
                 rng.randn(n, m.shape[1]) * sd + mu))
labels = np.concatenate([r[0] for r in recs])
mat = np.vstack([r[1] for r in recs]).astype(np.float32)
order = rng.permutation(len(labels))  # interleave labels across ids
labels, mat = labels[order], mat[order]

import os
os.makedirs(OUT_DIR, exist_ok=True)
con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], "
            "label INTEGER)")
con.executemany(
    "INSERT INTO emb VALUES (?, ?, ?)",
    [(int(i), [float(x) for x in mat[i]], int(labels[i]))
     for i in range(len(labels))])
con.execute(f"COPY emb TO '{OUT_DIR}/embeddings.parquet' (FORMAT parquet)")
print(f"wrote {len(labels)} vectors x {mat.shape[1]} dims -> {OUT_DIR}")
