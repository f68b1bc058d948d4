#!/usr/bin/env python
"""Regenerate QUERIES.md from the queries() registry (kept in sync by CI
habit: run after adding a query)."""
import inspect
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as m  # noqa: E402


def main() -> None:
    lines = [
        "# QUERIES — the engine's oracled query inventory",
        "",
        "Auto-generated from the `queries()` registry (this file: "
        "`python scripts/gen_queries_md.py`).",
        "Every entry runs against the DuckDB oracle at sf0.01 unless marked "
        "*rows-only*",
        "(non-SQL-expressible by nature: model UDFs, binary cracking, "
        "sketches).",
        "",
        f"**{len(m.queries())} queries, {len(m.oracle_sql())} oracled.**",
        "",
        "| # | Query | Check | What it pins |",
        "|---|-------|-------|--------------|",
    ]
    for i, (name, fn) in enumerate(m.queries().items(), 1):
        doc = inspect.getdoc(fn) or ""
        first = doc.split("\n\n")[0].replace("\n", " ").replace("|", "\\|")
        first = textwrap.shorten(first, 220, placeholder="…")
        check = "oracled" if name in m.oracle_sql() else "rows-only"
        lines.append(f"| {i} | `{name}` | {check} | {first} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
