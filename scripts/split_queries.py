"""One-shot mechanical split of the 14.4k-line queries.py into the
queries/ package (VERDICT r13 #8).  Boundaries follow the file's own
section headers; _shared exports every top-level name via __all__ so
family modules star-import the common surface, and __init__ merges all
submodule namespaces so `queries.<anything>` keeps resolving exactly as
it did in the single-file module (tests import private helpers)."""
import ast
import os

SRC = "openai_vector_search_demo_spark/queries.py"
PKG = "openai_vector_search_demo_spark/queries"

# (module_name, start_line_1idx_inclusive, end_line_1idx_exclusive)
BOUNDS = [
    ("_shared", 1, 240),
    ("pipeline", 240, 694),
    ("text_analysis", 694, 829),
    ("ann_quant", 829, 3337),
    ("dedup", 3337, 3854),
    ("events_windows", 3854, 4289),
    ("relational", 4289, 4872),
    ("scale_serving", 4872, 6285),
    ("hamming_tier", 6285, 6889),
    ("monitoring", 6889, 8429),
    ("window_breadth", 8429, 9725),
    ("batteries", 9725, 11334),
    ("graph_ann", 11334, 14316),
    ("window", 14316, None),
]

lines = open(SRC).read().splitlines(keepends=True)
os.makedirs(PKG, exist_ok=True)

HEADER = (
    "# Split from the single-file registry (r14); see _shared for the\n"
    "# registry, decorator, and parity conventions.\n"
    "from openai_vector_search_demo_spark.queries._shared import *  "
    "# noqa: F401,F403\n\n"
)

for name, a, b in BOUNDS:
    body = "".join(lines[a - 1:(b - 1 if b else len(lines))])
    if name == "_shared":
        # append an explicit __all__ with EVERY top-level binding and
        # import so family modules' star-import sees the full surface
        tree = ast.parse(body)
        names = []
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
                names.append(node.name)
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        names.append(t.id)
            elif isinstance(node, ast.AnnAssign) and isinstance(
                    node.target, ast.Name):
                names.append(node.target.id)
            elif isinstance(node, ast.Import):
                names.extend(al.asname or al.name.split(".")[0]
                             for al in node.names)
            elif isinstance(node, ast.ImportFrom) and node.module and \
                    "__future__" not in node.module:
                names.extend(al.asname or al.name for al in node.names)
        seen = []
        for n in names:
            if n not in seen:
                seen.append(n)
        body += ("\n\n__all__ = [\n" + "".join(f'    "{n}",\n'
                                               for n in seen) + "]\n")
        out = body
    else:
        out = HEADER + body
    with open(f"{PKG}/{name}.py", "w") as fh:
        fh.write(out)

init = '"""The engine\'s query registry — split into per-family modules\n'
init += "(r14).  Import order preserves the original single-file\n"
init += "registration order (battery oracles are built at decoration\n"
init += "time from already-registered members); the namespace merge\n"
init += "below keeps every name — public or helper — resolvable as\n"
init += "``queries.<name>`` exactly as in the single-file module.\"\"\"\n\n"
init += "import sys as _sys\n\n"
mods = [n for n, _, _ in BOUNDS]
for m in mods:
    init += f"from openai_vector_search_demo_spark.queries import {m}\n"
init += "\n_self = _sys.modules[__name__]\n"
init += f"for _m in ({', '.join(mods)}):\n"
init += "    for _k in vars(_m):\n"
init += "        if not _k.startswith('__'):\n"
init += "            setattr(_self, _k, getattr(_m, _k))\n"
with open(f"{PKG}/__init__.py", "w") as fh:
    fh.write(init)
os.remove(SRC)
print("split done:", mods)
