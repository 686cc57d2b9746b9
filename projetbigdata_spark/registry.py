"""Aggregates every operator module's QUERIES / ORACLE_SQL into the
single dict pair the driver contract (__spark_entry__.py) exposes.

Modules are imported lazily so a failure in one operator family (e.g.
an optional ML dep) can't take down the whole surface.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver checks the first ~50 queries per round in dict order, so
# _PRIORITY pins the names that most need a green CORRECTNESS row this
# round (r11, VERDICT r10 item 1: the three rule-c compositions MUST
# re-enter, plus the whole r6-latest tail and the oldest r7 rows).
# Freshness derives from merging CORRECTNESS_r01-r10 — now executable:
# tools/freshness_report.py + tests/test_freshness_floor.py assert
# every registered query's latest green driver row is <= 5 rounds old,
# so a rotation slip fails the build instead of surviving as comments.
#   tier B (28, leading) = EVERY r6-latest row — the complete named
#     next-in-line set from the r10 ledger (5 rounds old at r11, the
#     freshness floor's boundary);
#   rule c (3) = the shielded compositions (corpus_curate,
#     corpus_curate_calibrated, sim_ivf_incremental — latest green
#     r8, 3 rounds old): mandated re-entry, scheduled twice;
#   tier A (4) = corpus_ccnet_select_guessed (NEW r11: the CCNet
#     composition keyed on the per-doc GUESSED language — VERDICT r10
#     item 3) + the two surfaces whose cores were factored for it
#     (corpus_perplexity_buckets -> _tercile_buckets, text_lang_guess
#     -> lang_guess_frame — plan-identical delegations, re-checked
#     out of caution, both locally dtype-strict green post-refactor)
#     + sim_ivf_posting_stats (NEW, third wave: the faiss
#     imbalance_factor audit over the persisted-index tier);
#   tier C (15) = the oldest r7-latest rows: the 7-row rows-only ml
#     family + ml_chisq_tokens (their only independent check IS the
#     driver row), the two-stage retrieval compositions
#     (search_hybrid_rrf/_ivf, sim_mmr_rerank/_ivf/_pq), the heavy
#     cross-tier audit (dedup_tier_overlap_report), the Arrow packing
#     fold (docs_pack_nextfit), and the hashed-DSIR pair.
# 28 + 3 + 4 + 15 = 50. The remaining 35 r7-latest rows park past
# slot 50 as next-in-line and MUST lead the r12 block (they hit the
# 5-round floor there; the floor test will enforce it).
# collect() raises if a priority name is not registered.
_PRIORITY = (
    # --- tier B (28): every r6-latest row, oldest in the ledger ---
    "dedup_jaccard_pairs",
    "dedup_minhash_buckets",
    "agg_geomean_expr",
    "agg_geomean_udaf",
    "ann_recall_report",
    "ann_recall_report_ivfpq",
    "corpus_dsir_sample",
    "corpus_dsir_weights",
    "corpus_dsir_weights_smoothed",
    "corpus_mix_plan",
    "corpus_sample_assign",
    "corpus_source_divergence",
    "corpus_temperature_mix",
    "dedup_semantic",
    "dedup_span_removal",
    "docs_pack_greedy",
    "embed_quantize_int8",
    "merge_cdc_snapshot",
    "sample_hash_documents",
    "sample_stratified_by_lang",
    "sim_ivf_topk",
    "sim_lsh_buckets",
    "sim_topk_bruteforce",
    "split_assign_documents",
    "text_fingerprints",
    "text_repetition_scores",
    "text_search_bm25",
    "text_winnow_fingerprints",
    # --- rule c (3): the shielded compositions, latest green r8 ---
    "corpus_curate",
    "corpus_curate_calibrated",
    "sim_ivf_incremental",
    # --- tier A (4): new or core-factored in r11 ---
    "corpus_ccnet_select_guessed",  # NEW: guessed-lang cap + terciles
    "sim_ivf_posting_stats",  # NEW (3rd wave): index imbalance audit
    "corpus_perplexity_buckets",  # core factored (_tercile_buckets)
    "text_lang_guess",  # core factored (lang_guess_frame)
    # --- tier C (15): the oldest r7-latest rows ---
    "ml_chisq_tokens",
    "ml_chisq_select_vectors",
    "ml_crossval_metrics",
    "ml_crossval_dt_metrics",
    "ml_kmeans_clusters",
    "ml_minhash_pairs",
    "ml_sentiment_predictions",
    "search_hybrid_rrf",
    "search_hybrid_rrf_ivf",
    "sim_mmr_rerank",
    "sim_mmr_rerank_ivf",
    "sim_mmr_rerank_pq",
    "dedup_tier_overlap_report",
    "docs_pack_nextfit",
    "corpus_dsir_weights_hashed",
    # --- next-in-line past slot 50: corpus_dsir_weights_hashed_
    # incremental yielded its tier-C slot to the rule-a entry of
    # sim_ivf_posting_stats (its profile core is pinned equal to the
    # r11 dsir_hashed_profile build+apply path, and its hashed sibling
    # stays in-block); it leads the 35 r7-latest rows that MUST lead
    # the r12 block (5-round floor) ---
    "corpus_dsir_weights_hashed_incremental",
    "agg_distinct",
    "agg_pivot",
    "corpus_health_report",
    "corpus_token_budget_sample",
    "corpus_vocab_growth",
    "dedup_span_decontaminate",
    "dedup_span_removal_incremental",
    "events_click_attribution",
    "events_dedup_keyed",
    "events_multi_rollup",
    "events_session_30m",
    "events_sliding_15m_5m",
    "events_tumbling_1h",
    "join_key_skew_report",
    "json_extract",
    "map_functions",
    "multimodal_content_dedup",
    "multimodal_fake_decode",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_meta",
    "multimodal_resize",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q15_top_supplier",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q2_min_cost_supplier",
    "quality_constraints",
    "scd2_history",
    "sim_neardup_allpairs_exact",
    "table_stats",
    "text_feature_hashing",
    "text_search_phrase",
)

# Ordered so the driver's correctness budget reaches every family:
# round 1 verified the relational/vocabulary/features modules but ran
# out of budget before windows..multimodal, so those run first now.
_MODULES = (
    "projetbigdata_spark.functions.nltk_tier",
    "projetbigdata_spark.operators.repetition",
    "projetbigdata_spark.operators.packing",
    "projetbigdata_spark.operators.quantize",
    "projetbigdata_spark.functions.udafs",
    "projetbigdata_spark.operators.windows",
    "projetbigdata_spark.operators.tfidf",
    "projetbigdata_spark.operators.textstats",
    "projetbigdata_spark.operators.sampling",
    "projetbigdata_spark.operators.sessionize",
    "projetbigdata_spark.operators.upsert",
    "projetbigdata_spark.operators.dedup",
    "projetbigdata_spark.operators.curation",
    "projetbigdata_spark.operators.selection",
    "projetbigdata_spark.operators.similarity",
    "projetbigdata_spark.streaming.events_batch",
    "projetbigdata_spark.ml.queries",
    "projetbigdata_spark.multimodal.binaryops",
    "projetbigdata_spark.operators.vocabulary",
    "projetbigdata_spark.functions.udtfs",
    "projetbigdata_spark.operators.relational",
    "projetbigdata_spark.operators.relational2",
    "projetbigdata_spark.operators.relational3",
    "projetbigdata_spark.operators.relational4",
    "projetbigdata_spark.operators.relational5",
    "projetbigdata_spark.operators.quality",
    "projetbigdata_spark.operators.classifier",
    "projetbigdata_spark.operators.features",
)


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLE_SQL", {}))
    missing = set(oracles) - set(queries)
    if missing:
        raise ValueError(f"oracle without query: {sorted(missing)}")
    unknown = [n for n in _PRIORITY if n not in queries]
    if unknown:
        raise ValueError(f"priority name not registered: {unknown}")
    ordered = list(_PRIORITY) + [n for n in queries if n not in set(_PRIORITY)]
    queries = {n: queries[n] for n in ordered}
    oracles = {n: oracles[n] for n in ordered if n in oracles}
    return queries, oracles
