#!/usr/bin/env python
"""Synthesize an sf1-equivalent fixture from the driver's sf0.1 tables —
the third point of the scaling curve (SCALE.md; r8 judge #6: "sf0.1 is
still overhead-floored for most queries, so the linearity claim rests on
two points").

The driver ships sf{0.001,0.01,0.1} only, so sf1 is built here as 10
key-shifted copies of sf0.1, per table:

- ``customer`` / ``orders`` / ``lineitem``: copy k shifts custkey by
  k·10^7 and orderkey by k·10^9 — 10× rows, joins fan out 10×, and no
  cross-copy key ever collides.  ``nation`` (25 rows) is copied as-is.
- ``events``: copy k shifts user_id by k·10^7 with timestamps unchanged
  — 10× users, identical per-user session structure (the right scaling
  for session windows: more users, not longer sessions).
- ``documents``: copy k shifts doc_id by k·10^6 AND deterministically
  rewrites tokens at positions where ``(pos + k) % 5 == 0`` to
  ``token#k`` (copy 0 = verbatim).  Naive duplication would make every
  doc a 10-way exact/near duplicate — near-dup density 10× any real
  corpus, inflating the band-join stage superlinearly for reasons that
  are the DATA'S, not the engine's.  With ~20% of positions rewritten
  per copy, two copies differ at ~40% of positions, so a 5-token
  shingle survives across copies with probability ~0.6^5 ≈ 8% —
  cross-copy pairs drop below every operator threshold while each
  copy's INTERNAL near-dup structure (what sf0.1 actually measures)
  is preserved verbatim in copy 0 and near-verbatim in the rest.

Pure DuckDB (no Spark) so generation doesn't perturb the measured JVM.
Output: ``/tmp/sf1_scaled/*.parquet`` (scratch — regenerate on demand,
never committed).  Usage::

    python scripts/gen_sf1_scaled.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_scaled")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS k")

    def scale(table: str, select_k: str) -> None:
        con.execute(f"""
            COPY (SELECT {select_k}
                  FROM '{SRC}/{table}.parquet', copies)
            TO '{out}/{table}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)
        """)
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    scale("customer", "* REPLACE (c_custkey + k * 10000000 AS c_custkey)")
    scale("supplier", "* REPLACE (s_suppkey + k * 1000000 AS s_suppkey)")
    scale("part", "* REPLACE (p_partkey + k * 10000000 AS p_partkey)")
    scale("orders", "* REPLACE (o_orderkey + k * 1000000000 AS o_orderkey, "
                    "o_custkey + k * 10000000 AS o_custkey)")
    scale("lineitem",
          "* REPLACE (l_orderkey + k * 1000000000 AS l_orderkey, "
          "l_suppkey + k * 1000000 AS l_suppkey, "
          "l_partkey + k * 10000000 AS l_partkey)")
    scale("events", "* REPLACE (user_id + k * 10000000 AS user_id)")
    # embeddings: copy k shifts vec_id by k·10^6 and perturbs ~6% of the
    # dimensions by a copy-dependent epsilon — enough that copies are
    # not exact vector duplicates (which would make every KNN result a
    # degenerate 10-way tie), while keeping the corpus geometry (and so
    # the per-query work profile) that sf0.1 measures.
    scale("embeddings", """
        * REPLACE (vec_id + k * 1000000 AS vec_id,
                   CASE WHEN k = 0 THEN embedding ELSE
                     list_transform(embedding,
                       (x, i) -> CASE WHEN (i + k) % 17 = 0
                                 THEN CAST(x + 0.001 * k AS FLOAT)
                                 ELSE x END) END AS embedding)""")
    scale("documents", """
        * REPLACE (doc_id + k * 1000000 AS doc_id,
                   CASE WHEN k = 0 THEN text ELSE array_to_string(
                     list_transform(string_split(text, ' '),
                       (tok, pos) -> CASE WHEN (pos + k) % 5 = 0
                                     THEN tok || '#' || k ELSE tok END),
                     ' ') END AS text)""")
    for small in ("nation", "region"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{small}.parquet') "
                    f"TO '{out}/{small}.parquet' (FORMAT PARQUET)")
        print(f"{small}: copied as-is")


if __name__ == "__main__":
    main()
