# Split from the single-file registry (r14); see _shared for the
# registry, decorator, and parity conventions.
from __future__ import annotations

from openai_vector_search_demo_spark.queries._shared import *  # noqa: F401,F403

# The proof window — the driver's correctness gate records the FIRST 50
# registrations, so their order IS the per-round proof set.  Every operator
# family from SURVEY.md §2 + the M6 extensions must have a green row inside
# it; redundant variants (the five non-auto q2_knn_* forms, the subsumed
# rows-only flagship_search, capped-jaccard, …) live below the window,
# covered by pytest + the sf0.001 parity suite instead.
# tests/test_parity.py pins: window == first 50 registrations, every window
# entry oracled except the two by-nature rows-only ones, and every family
# represented.
# ===========================================================================

# r9 rotation (judge #5 / ADVICE): ten long-stable slots (each green in
# the archived driver window for 2+ consecutive rounds AND still pinned
# every CI run by tests/test_parity.py's full-registry replica) rotated
# OUT in favor of the r8/r9 slots that had never had an independent
# driver receipt.  Every operator family keeps at least one
# representative inside the window.
# Out: p2_filter_non_empty, p4_p9_path_parts, p6_highlight (pipeline
#   scalars — p1/p5/p3/c3 remain), q2_knn_auto (wide1024 remains),
#   q7_q9_rerank_remote_slot / flagship_search_remote_slot (their
#   deterministic twins remain), ta_redact_pii, ann_lsh_stored_knn,
#   dedup_simhash, snapshot_diff_documents (upsert_latest_wins remains);
#   second pass for the four new r9 slots: s9_record_key (p3_md5_key
#   remains for keys), q11_history_top1, ta_token_stats,
#   skew_salted_agg (skew_salted_join remains).
# r10 rotation (judge #1): six 8-9-round-stable slots out, in come the
# three new receipt-gap batteries (curation / dedup / profile-events)
# and the three residual-IVFADC slots.
# Out: p5_keywords (p1/p3/c3 remain for pipeline scalars), dedup_exact
#   + dedup_embedding_cosine (minhash/jaccard/clusters/keep-best and
#   the new dedup_battery remain), events_value_percentiles +
#   asof_join_last_purchase (events family keeps the funnel pair and
#   the new profile_events_battery; both stay parity-pinned),
#   tfidf_top_terms (tfidf_cosine_pairs_capped remains).
# r11 rotation (judge #3 — zero the receipt ledger): six 7-10-round
# stable slots out, in come the five never-receipted queries (after
# which ever-receipted = all registered) and the new dangling-PageRank
# slot.  Out: dedup_clusters + dedup_keep_best_per_cluster (7x
# receipted; minhash/jaccard + dedup_battery remain), range_join_
# price_bands + cms_heavy_hitters + skew_salted_join (7x; analytics/
# tpch batteries remain), similarity_join_topk (10x; retrieval_battery
# remains), events_funnel_njoin (r9-r10; events_funnel_auto stays for
# the family) -> in comes supplier_part_hits, receipted from birth.
# All seven stay parity-pinned in tests/test_parity.py.
PROOF_WINDOW: list[str] = [
    # ------------------------------------------------------------------
    # r15 rotation (VERDICT r14 #4): IN come the four new r15 slots,
    # receipted from birth (ann_nsw_compacted_knn — the maintenance
    # triangle's compaction leg; ann_nsw_fixed_ef_scaling — the
    # constant-ef law at n = 10⁵, deliberately battery-exempt so this
    # IS its receipt; bm25_tenant_topk + late_interaction_tenant_topk
    # — tenant isolation for the last two stored tiers) plus the two
    # never-windowed streaming forms (streaming_decontamination_gate,
    # streaming_nsw_ingest — battery digests stood in before; direct
    # rows now).  Rotated OUT, each green in BOTH r13 and r14 (the
    # 2-receipt rule), every family keeping a representative:
    # ann_sq8_refine_knn + ann_sq8_recall_at_10 (ann_sq8_stored_knn +
    # ann_sq8_mean_recall_at_10 stay), ann_matryoshka_refine_knn +
    # ann_matryoshka_recall_at_10 (ann_matryoshka_mean_recall_at_10
    # stays), bm25_stored_topk (bm25_tenant_topk exercises the same
    # serve machinery + isolation; battery digest continues),
    # rag_context_budget_pack (rag_serving_pipeline composes it).  The
    # whole NSW family stays again: every slot's serving semantic
    # changed this round (v4 — recursive hierarchy, constant ef=160,
    # 8 rounds, M=16) and must re-receipt.
    # ------------------------------------------------------------------
    # r14 rotation (VERDICT r13 #5): IN come the three r13 slots that
    # were never windowed (ann_nsw_filtered_knn,
    # ann_nsw_filtered_recall_at_10, ann_nsw_cellbuild_mean_recall_at_10
    # — battery digests stood in r13; direct receipts now) plus the
    # three new r14 slots, receipted from birth
    # (ann_nsw_filtered_recall_curve — the selectivity ladder with
    # predicate-aware widening; ann_nsw_tenant_knn +
    # ann_hamming_tenant_knn — per-alias tenant isolation;
    # benchmark_decontamination — the external-eval leakage gate).
    # Rotated OUT: seven slots green in BOTH r12 and r13 (the
    # 2-receipt rule; source_quota_cap makes seven — curation keeps
    # ta_blocklist_gate + curation_battery),
    # every family keeping a representative: unigram_lm_token_budget
    # (unigram_lm_word_scores stays), scd2_customer_priority
    # (scd2_incremental_splice stays, re-receipting its new digest
    # form), jsonl_export_roundtrip (csv_export_roundtrip stays),
    # classifier_weighted_resample (quality_classifier_calibration
    # stays), dedup_ingest_loop (dedup_battery + streaming_neardup_gate
    # stay), streaming_session_windows (events_windows_battery +
    # streaming_dedup_within_watermark stay).  The whole NSW family
    # stays despite rotation-eligible age: every slot's implementation
    # changed this round (serving v3 — hierarchical entry, ef/rounds
    # autoscale, 16 entries) and must re-receipt.
    # ------------------------------------------------------------------
    # r13 rotation (VERDICT r12 #3): the 17 r12 slots that carried only
    # battery-digest receipts take DIRECT window rows (the whole SQ8 /
    # NSW / Matryoshka recall families, the two named curation stages,
    # bm25_stored_topk, rag_context_budget_pack,
    # streaming_dedup_within_watermark), plus the three new r13 slots
    # (dedup_graph_index_capstone, rag_serving_pipeline,
    # scd2_incremental_splice — receipted from birth).  Rotated OUT: 20
    # slots, every one green in BOTH r11 and r12 (the repo rule: no
    # slot leaves the window on a single receipt): kmeans_cluster_
    # profile, ann_ivfhamming_refine_knn, hard_negative_mining,
    # q7_q9_rerank (family stays pinned by flagship_search_oracled),
    # ann_ivfpq_residual_knn, ann_pq_refine_stored_knn,
    # ann_ivfpq_stored_refine_knn, ann_ivfpq_upsert_knn (family keeps
    # ann_ivfpq_compacted_knn in-window), late_interaction_topk,
    # ann_hamming_recall_curve, ann_ivfhamming_stored_knn,
    # supplier_part_pagerank_dangling, supplier_part_hits,
    # dsir_resample_topk, zorder_curve_sample, corpus_snapshot_drift,
    # streaming_stream_static_join, streaming_drift_gate,
    # curation_pipeline (9 straight green rounds; its composition is
    # re-receipted by the two new capstones), split_leakage_audit.
    # DEFERRED one round: ivm_source_stats_delta (analytics_battery
    # digest receipt stands) — the window is driver-capped at 50 and
    # outs were limited by the 2-receipt rule.  KEPT despite being
    # rotation-eligible by age: source_quota_cap + ta_blocklist_gate
    # (their r11 rows were the red oracles — r12 is their only green)
    # and ann_hamming_stored_knn (first windowed r12).
    # ------------------------------------------------------------------
    "flagship_search_oracled",
    "unigram_lm_word_scores",
    "ann_sq8_stored_knn",
    # the NSW family re-receipts the r14 serving semantic (v3:
    # hierarchical L1 entry, ef = ceil(1.5*sqrt(n)), 5 rounds, 16
    # entries) — every slot's oracle replays the new beam:
    "ann_nsw_stored_knn", "ann_nsw_beam_knn", "ann_nsw_recall_at_10",
    "ann_nsw_recall_curve", "ann_nsw_mean_recall_at_10",
    "ann_nsw_upsert_knn", "ann_nsw_delete_knn",
    "ann_nsw_ranking_metrics",
    # r13 slots never windowed before (battery digests stood in; direct
    # rows now, under the v3 semantic):
    "ann_nsw_filtered_knn", "ann_nsw_filtered_recall_at_10",
    "ann_nsw_cellbuild_mean_recall_at_10",
    # new r14 slots, receipted from birth:
    "ann_nsw_filtered_recall_curve",
    "ann_nsw_tenant_knn", "ann_hamming_tenant_knn",
    # new r15 slots, receipted from birth (see r15 rotation header):
    "ann_nsw_compacted_knn", "ann_nsw_fixed_ef_scaling",
    "bm25_tenant_topk", "late_interaction_tenant_topk",
    # never-windowed streaming forms take direct rows:
    "streaming_decontamination_gate", "streaming_nsw_ingest",
    # r13 capstones taking their second receipt (scd2 re-receipts its
    # new MERGE-pricing digest form):
    "dedup_graph_index_capstone", "rag_serving_pipeline",
    "scd2_incremental_splice",
    # SQ8 + Matryoshka distribution receipts (refine/single-recall
    # twins rotated out r15 — see header):
    "ann_sq8_mean_recall_at_10",
    "ann_matryoshka_mean_recall_at_10",
    # named curation stages + serving/context slots (battery-only r12;
    # rag_context_budget_pack + bm25_stored_topk rotated out r15):
    "ccnet_perplexity_buckets", "gopher_quality_rules",
    "streaming_dedup_within_watermark",
    "neardup_label_propagation", "neardup_triangle_counts",
    # r14 addition, receipted from birth (the external-benchmark
    # leakage gate — sibling of split_leakage_audit):
    "benchmark_decontamination",
    # single-green keeps (see header):
    "ta_blocklist_gate", "ann_hamming_stored_knn",
    "ann_hamming_refine_knn",
    "csv_export_roundtrip",
    "variants_battery", "quality_classifier_calibration",
    "streaming_neardup_gate", "ann_ivfpq_compacted_knn",
    # family-digest batteries (the receipts for every non-windowed
    # member — 111 slots ride these digests):
    "tpch_battery", "analytics_battery", "retrieval_battery",
    "events_windows_battery", "multimodal_battery",
    "curation_battery", "dedup_battery", "profile_events_battery",
]


# Window members with NO oracle by nature (the driver records its weaker
# rows-only check for these).  Empty since r12: the two such slots
# (flagship_search, corpus_approx_stats) took their one-round ledger
# receipts in the r11 window and rotated out; their oracled twins
# (flagship_search_oracled, corpus_distinct_stats) remain receipted.
PROOF_WINDOW_ROWS_ONLY: frozenset[str] = frozenset()


def _apply_proof_window() -> None:
    missing = [n for n in PROOF_WINDOW if n not in SPARK_QUERIES]
    if missing:
        raise RuntimeError(f"PROOF_WINDOW names not registered: {missing}")
    if len(PROOF_WINDOW) != len(set(PROOF_WINDOW)):
        raise RuntimeError("PROOF_WINDOW contains duplicates")
    ordered = {n: SPARK_QUERIES[n] for n in PROOF_WINDOW}
    for n, fn in SPARK_QUERIES.items():
        if n not in ordered:
            ordered[n] = fn
    SPARK_QUERIES.clear()
    SPARK_QUERIES.update(ordered)


_apply_proof_window()
