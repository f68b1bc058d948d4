#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "headline_total", "value": <sum sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <float>}

Headline set: bounded-output queries that exercise the engine's core physical
paths — scan+filter+agg, multi-way broadcast join, exact KNN both scoring
paths, the full ingest→search pipeline, windowing, and the dedup/text-analysis
extensions.  Each is timed to full materialization (``collect``); results are
small (top-k / grouped), so collect cost is the query, not the transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from openai_vector_search_demo_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    registry = entry_mod.queries()
    headline = [name for name in HEADLINE if name in registry]

    # one tiny warmup to pay JVM/codegen startup outside the timings
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # min of 3 runs per query: single-shot timings on local[32] carry
    # 0.5-1 s of GC/scheduler noise (occasional multi-second full-GC
    # spikes), enough to flip close comparisons (e.g. the dim-1024
    # SQL-vs-BLAS crossover); min is the standard noise-floor estimator
    # for microbenchmarks
    # Failure-isolated: one broken query must not zero out the round's whole
    # perf signal (round 5 lost its entire bench to a single analysis error).
    # Errors are reported per-query in "errors" and excluded from the total.
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in headline:
        runs: list[float] = []
        for _ in range(3):
            # cold caches each run: several operators persist() reused
            # subtrees; without this the second run times the cache, not
            # the query
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                registry[name](spark, sf_dir).collect()
            except Exception as exc:  # noqa: BLE001 — isolate, report, go on
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                runs = []
                break
            runs.append(time.perf_counter() - t0)
        if runs:
            runs.sort()
            timings[name] = round(runs[0], 3)
            # median + spread expose environment noise per query (VERDICT r6:
            # a broad +0.1 s drift on untouched queries was indistinguishable
            # from a plan regression with only the min recorded)
            medians[name] = round(runs[len(runs) // 2], 3)
            spreads[name] = round(runs[-1] - runs[0], 3)

    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "queries_spread": spreads,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    # The AUTHORITATIVE record: the driver archives only the LAST 2000
    # chars of stdout, and at 95 headline queries the full names+secs
    # dict is ~2.8k chars — the 95 names ALONE are 2000 chars, so no
    # encoding of the complete map can ever fit that window (VERDICT
    # r12 wrong #2 lost the FRONT of the dict and parsed to None; the
    # r15 compact q_cs array fit but carried no names, so the driver's
    # per-query comparison arrived empty — VERDICT r15 wrong #2).  The
    # full result — min/median/spread per query, by name — is written
    # to BENCH_FULL.json next to this script AND printed as the first
    # JSON line below, where full-stdout readers get the whole map.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    with open(full_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out))
    # FINAL stdout line: the contract JSON, shaped to parse whole from
    # the tail window.  "queries" carries real names -> seconds (2 dp)
    # for as many queries as fit, LARGEST runtime first, so every slot
    # that matters to the perf comparison is present by name; only the
    # smallest slots overflow to BENCH_FULL.json ("n_queries" counts
    # the full basis, "n_queries_named" what this line carries).  When
    # the whole basis fits (smaller registries), this line is simply
    # the complete contract.
    _TAIL_BUDGET = 1900  # driver tail is 2000 chars; leave margin
    ran = sorted(timings, key=lambda n: (-timings[n], n))
    compact = {
        "metric": "headline_total",
        "value": out["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(ran),
        "queries_file": "BENCH_FULL.json",
        "queries": {},
        "skipped": [n for n in headline if n not in timings],
    }
    if errors:
        compact["errors"] = {k: v[:80] for k, v in errors.items()}

    def _fits(d: dict) -> bool:
        return len(json.dumps(d, separators=(",", ":"))) <= _TAIL_BUDGET

    if not _fits(compact):  # belt-and-braces: optional fields first
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
    print(json.dumps(compact, separators=(",", ":")))


# Ordered headline list — extended as operators land.  Names must exist in
# queries(); unknown names are skipped so bench never breaks on a rename.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q6_revenue_forecast",
    "join_top_customers",
    "q2_knn_exact",
    "q2_knn_numpy",
    "q2_knn_sql_wide1024",
    "q2_knn_numpy_wide1024",
    "q7_q9_rerank",
    "q11_history_top1",
    "flagship_search_oracled",
    "ta_quality_score",
    "tpch_q5_local_supplier_volume",
    "rollup_revenue_region_nation",
    "range_join_price_bands",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_lsh_knn",
    "ann_lsh_stored_knn",   # stored-index read path: pruning gets a number
    "ann_ivf_knn",
    "ann_ivf_stored_knn",   # the IVF twin: cell-partition pruning measured
    "ann_ivf_trained_knn",  # trained spherical quantizer — the credible ANN
    "ann_ivf_trained_stored_knn",  # its partition-pruned stored read path
    "semdedup_prune",       # cluster-prefiltered semantic dedup
    "q2_knn_auto_wide1024",  # auto path picks BLAS at production dims
    "events_session_window",
    "corpus_distinct_stats",
    "events_funnel",        # one-shuffle sequential-pattern fold
    "ta_unigram_lm_score",  # corpus-trained LM scoring, counts-only shuffles
    "ta_bigram_lm_score",   # interpolated bigram LM — one order up
    "late_interaction_topk",  # ColBERT MaxSim, single-exchange plan (r9)
    "ann_ivfpq_residual_knn",  # IVFADC proper: pruning x residual ADC (r10)
    "ann_pq_refine_stored_knn",  # codegen ADC shortlist + exact refine (r10)
    "ann_ivfpq_stored_refine_knn",  # flagship: pruned stored IVFADC + refine
    "kmeans_cluster_profile",  # distributed Lloyd trainer, auto/BLAS (r10)
    "supplier_part_pagerank_dangling",  # sink-graph PR w/ mass term (r11)
    "ann_ivfpq_upsert_knn",  # merge-on-read upserted index serving (r11)
    "ann_hamming_refine_knn",  # 8-byte binary tier: XOR/POPCNT + refine (r11)
    "ann_hamming_stored_knn",  # its stored read path: sig-table scan (r11)
    "ann_ivfhamming_refine_knn",  # composed: cell-prune x POPCNT x refine (r11)
    "ann_ivfhamming_stored_knn",  # its pruned-partition stored read path (r11)
    "corpus_snapshot_drift",  # PSI/JSD snapshot gate, scan-bound (r11)
    "hard_negative_mining",  # contrastive-training negatives, 20 anchors (r11)
    "source_quota_cap",     # per-source best-N cap, quality-ranked (r11)
    "ta_blocklist_gate",    # C4 wordlist gate + removal-rate audit (r11)
    "mixture_allocation",   # mixture planning: shares/targets/epochs (r11)
    "split_leakage_audit",  # near-dup pairs straddling train/val/test (r11)
    "dsir_resample_topk",   # DSIR selection: hashed n-grams + Gumbel (r11)
    "neardup_triangle_counts",  # triangle density over the dup graph (r11)
    "zorder_curve_sample",  # Morton layout key, pure codegen (r11)
    "curation_pipeline",
    "ann_ivfpq_compacted_knn",  # compacted store serving: zero-marker read (r12)
    "quality_classifier_calibration",  # reliability bins over held-out scores (r12)
    "streaming_neardup_gate",  # live LSH admission gate vs stored band index (r12)
    "dedup_ingest_loop",  # 2-batch admit/append loop on a fresh band store (r12)
    "classifier_weighted_resample",  # GD-scores -> hash-Gumbel top-k (r12)
    "unigram_lm_word_scores",  # SentencePiece-family Viterbi scoring (r12)
    "unigram_lm_token_budget",  # per-lang subword budget + fertility (r12)
    "ann_sq8_refine_knn",    # byte-per-dim SQ8: oracle-retrainable ADC (r12)
    "ann_sq8_stored_knn",    # its code-table read path, codes-only scan (r12)
    "ann_nsw_stored_knn",    # graph ANN: bucket-pruned beam serving (r12)
    "ann_nsw_ranking_metrics",  # nDCG/MRR eval incl. inline graph build (r12)
    "ann_matryoshka_refine_knn",  # prefix-dim shortlist + full refine (r12)
    "scd2_customer_priority",  # type-2 dimension history build (r12)
    "neardup_label_propagation",  # semi-supervised label spread (r12)
    "streaming_session_windows",  # stateful session merge, real run (r12)
    "jsonl_export_roundtrip",  # JSON sink+source fidelity digest (r12)
    "csv_export_roundtrip",   # CSV sink+source fidelity digest (r12)
    "bm25_stored_topk",       # inverted index: bucket-pruned postings (r12)
    "ann_nsw_upsert_knn",     # graph insert-only upsert == full rebuild (r12)
    "ccnet_perplexity_buckets",  # head/middle/tail LM bucketing (r12)
    "gopher_quality_rules",   # rule-filter pass/fail audit (r12)
    "rag_serving_pipeline",   # hybrid RRF -> MMR -> budget pack (r13)
    "scd2_incremental_splice",  # delta-batch dimension merge (r13; r14
    # emits a count+hash digest so this prices the MERGE, not an export)
    "ann_nsw_filtered_knn",   # predicate-filtered graph serving (r13)
    # labelprop/triangles stay benched under their original names above;
    # r13 pointed them at the persisted pair store (BASELINE.md A/B:
    # 7.11 -> 3.64 s and 2.74 -> 1.39 s same-session)
    "ann_nsw_filtered_recall_curve",  # 1/10/50% selectivity ladder with
    # predicate-aware beam widening (r14)
    "ann_nsw_tenant_knn",     # tenant-isolated graph serving (r14)
    "ann_hamming_tenant_knn",  # tenant-isolated signature serving (r14)
    "benchmark_decontamination",  # external-eval n-gram leakage gate (r14)
    "streaming_decontamination_gate",  # its live streaming twin (r14)
    "ann_nsw_compacted_knn",  # compacted graph serving: marker-free read (r15)
    "ann_auto_knn",  # tier router: exact-vs-graph by corpus size (r15)
    "gopher_repetition_rules",  # intra-doc n-gram repetition gates (r15)
    "gopher_line_repetition_rules",  # duplicate-line gates (r15)
    "ccnet_line_dedup",  # cross-doc boilerplate line dedup, 2 policies (r15)
    "ccnet_line_dedup_incremental",  # shard-vs-stored-history line dedup (r15)
    "streaming_line_dedup_ingest",  # live line-dedup ingest, pinned order (r15)
    "bloom_line_dedup",  # bounded-state Bloom line dedup, map-only admission (r15)
    "bottomk_uniform_sample",  # exact-k sampling: TakeOrderedAndProject (r15)
    "stratified_quota_sample_docs",  # two-phase exact quotas, skew-proof (r15)
    "exact_quantiles_binned",  # bounded-memory exact quantiles, 2-pass (r15)
    "unicode_nfc_repair",  # UAX#15 repair: Arrow-batched UDF hot path (r15)
    "weighted_bottomk_sample_docs",  # integer-exact ES weighted sample (r15)
    "rendezvous_shard_rebalance",  # HRW vs pmod remap fractions (r15)
    "token_budget_fill_docs",  # mixture materialization to token budgets (r15)
    "weighted_quantiles_tokens",  # token-weighted exact quantiles (r15)
    # ann_nsw_fixed_ef_scaling is deliberately NOT benched: it ignores
    # sf_dir (its corpus IS the 100k scale point) and costs ~2 min warm —
    # it is a driver-gated correctness/scale receipt, not an sf-scaled
    # perf query; its timings live in SCALE.md.
]


if __name__ == "__main__":
    sys.exit(main())
