"""bench.py driver-contract invariants (r16, VERDICT r15 #2a): the
FINAL stdout line must be a self-contained contract JSON that fits the
driver's 2000-char stdout tail WHOLE, with a per-query map keyed by
REAL names.  The 95 headline names alone total ~2000 chars, so the
line carries the largest-runtime queries by name and defers only the
smallest to BENCH_FULL.json — these tests pin the sizing logic without
running Spark."""

from __future__ import annotations

import json
import random

import bench


def _final_line(timings: dict[str, float], errors=None) -> str:
    """Replicates bench.main's final-line construction (kept in sync —
    the logic is 20 lines and pure)."""
    errors = errors or {}
    _TAIL_BUDGET = 1900
    ran = sorted(timings, key=lambda n: (-timings[n], n))
    compact = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(ran),
        "queries_file": "BENCH_FULL.json",
        "queries": {},
        "skipped": [],
    }
    if errors:
        compact["errors"] = {k: v[:80] for k, v in errors.items()}

    def _fits(d):
        return len(json.dumps(d, separators=(",", ":"))) <= _TAIL_BUDGET

    if not _fits(compact):
        compact.pop("skipped", None)
        compact.pop("errors", None)
    for name in ran:
        compact["queries"][name] = round(timings[name], 2)
        if not _fits(compact):
            del compact["queries"][name]
            break
    compact["n_queries_named"] = len(compact["queries"])
    if not _fits(compact):
        del compact["queries"][next(reversed(compact["queries"]))]
        compact["n_queries_named"] = len(compact["queries"])
    return json.dumps(compact, separators=(",", ":"))


def test_final_line_fits_tail_at_full_basis():
    random.seed(7)
    timings = {n: round(random.uniform(0.03, 9.0), 3)
               for n in bench.HEADLINE}
    line = _final_line(timings)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_total"
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert parsed["queries"], "per-query names must be present"
    # names are REAL headline names and values are seconds
    for name, sec in parsed["queries"].items():
        assert name in bench.HEADLINE
        assert abs(sec - timings[name]) < 0.005 + 1e-9
    # the named subset is the LARGEST-runtime queries: every named
    # query's min time >= every omitted query's max time
    named = set(parsed["queries"])
    omitted = set(bench.HEADLINE) - named
    if omitted:
        assert min(timings[n] for n in named) >= \
            max(timings[o] for o in omitted) - 1e-9


def test_final_line_parses_from_tail_window():
    random.seed(11)
    timings = {n: round(random.uniform(0.03, 9.0), 3)
               for n in bench.HEADLINE}
    stdout = "x" * 5000 + "\n" + json.dumps({"noise": 1}) + "\n" \
        + _final_line(timings) + "\n"
    tail = stdout[-2000:]
    last = [ln for ln in tail.splitlines() if ln.strip()][-1]
    parsed = json.loads(last)
    assert parsed["n_queries_named"] == len(parsed["queries"]) > 0


def test_small_basis_names_every_query():
    timings = {n: 1.0 for n in bench.HEADLINE[:40]}
    parsed = json.loads(_final_line(timings))
    assert parsed["n_queries_named"] == 40
    assert set(parsed["queries"]) == set(bench.HEADLINE[:40])
