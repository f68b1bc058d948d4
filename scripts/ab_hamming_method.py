#!/usr/bin/env python
"""Paired same-session A/B: hamming_knn method='sql' (expression sign
bits + XOR/POPCNT) vs method='numpy' (fused Arrow/BLAS pass) at the
registered configuration (nbits=62, dim=64, shortlist=100), alternating
order, cold cache per trial.  Backs HAMMING_AUTO_NUMPY_MIN_OPS with a
measurement of THIS family rather than inheriting the LSH crossover
(same protocol as scripts/ab_bigram_ids.py / ab_pagerank_persist.py).

    python scripts/ab_hamming_method.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from openai_vector_search_demo_spark.session import get_spark  # noqa: E402
from openai_vector_search_demo_spark.operators.ann import hyperplanes  # noqa: E402
from openai_vector_search_demo_spark.operators.hamming import (  # noqa: E402
    HAMMING_NBITS,
    hamming_knn,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-hamming")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).first().embedding
    planes = hyperplanes(len(qvec), HAMMING_NBITS, 42)
    corpus = emb.filter(F.col("vec_id") != 0)

    results = {"sql": [], "numpy": []}
    vals = {}
    for trial in range(3):
        order = ["sql", "numpy"] if trial % 2 == 0 else ["numpy", "sql"]
        for method in order:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = hamming_knn(corpus, qvec, k=10, shortlist=100,
                               planes=planes, method=method).collect()
            results[method].append(time.perf_counter() - t0)
            vals.setdefault(method, [(r.vec_id, round(r.similarity, 9))
                                     for r in rows])
    assert vals["sql"] == vals["numpy"], "physical paths diverged!"
    for m, runs in results.items():
        runs.sort()
        print(f"{m:6s} min={runs[0]:.3f} med={runs[len(runs)//2]:.3f} "
              f"max={runs[-1]:.3f}")


if __name__ == "__main__":
    main()
