#!/usr/bin/env python
"""Oracle-parity check for a SUBSET of registered queries — the verify
skill's driver-sim loop, parameterized (r15 optimization round: every
touched query re-proves oracle equality before its change lands).

Usage: python scripts/parity_subset.py [--sf /root/testdata/sf0.01] q1 q2 ...
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .appName("driver-sim").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb
    import pandas as pd

    import __spark_entry__ as m

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    def canon(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.9g}"
        if isinstance(v, (list, tuple, dict, set)):
            raise TypeError(f"non-atomic cell ({type(v).__name__})")
        return v

    INTEGRAL = {"ByteType", "ShortType", "IntegerType", "LongType"}
    Q, O = m.queries(), m.oracle_sql()
    bad = 0
    for name in names:
        if name not in Q:
            print(name, "UNKNOWN")
            bad += 1
            continue
        sdf = Q[name](spark, sf)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in O:
            print(name, "rows-only", len(srows))
            continue
        res = con.execute(O[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        cs = sorted(tuple(canon(r[i]) for i in
                          sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows)
        co = sorted(tuple(canon(r[i]) for i in
                          sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows)
        odf = con.execute(O[name]).df()
        kind = {f.name: type(f.dataType).__name__ for f in sdf.schema.fields}
        dt_bad = [c for j, c in enumerate(scols)
                  if kind[c] in INTEGRAL
                  and not any(r[j] is None for r in srows)
                  and c in odf.columns
                  and pd.api.types.is_float_dtype(odf[c].dtype)]
        ok = cs == co and not dt_bad
        print(name, len(srows), "vs", len(orows),
              "MATCH" if ok else "MISMATCH",
              f"DTYPE-FLOAT:{dt_bad}" if dt_bad else "")
        if not ok:
            bad += 1
            for i, (x, y) in enumerate(zip(cs, co)):
                if x != y:
                    print("  first diff @", i)
                    print("   spark :", x)
                    print("   oracle:", y)
                    break
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
