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
# round (r7). Tier A (15): corpus_dsir_weights_hashed (NEW — the
# hashed-bigram DSIR recipe, VERDICT r6 item 4),
# corpus_token_budget_sample (NEW — per-lang token-budget fill via the
# bucket-histogram threshold, no global cumsum),
# dedup_span_decontaminate (NEW — eval-span removal from train text),
# text_search_phrase (NEW — exact-phrase retrieval, in-row adjacency),
# sim_mmr_rerank (NEW — MMR diversified top-k over the brute tier)
# + its IVF- and PQ-shortlist variants sim_mmr_rerank_ivf/_pq,
# join_key_skew_report (NEW — count-of-counts key-skew telemetry),
# docs_pack_nextfit (NEW — applyInPandas next-fit packing, recursive-
# CTE oracle), dedup_tier_overlap_report (NEW — cross-tier drop-set
# audit composition; its ~12s sf0.01 wall is the block's one
# composition, inside the 25% cap),
# corpus_dsir_weights_hashed_incremental (NEW — frozen-profile ingest),
# search_hybrid_rrf (NEW — keyword+vector reciprocal rank fusion)
# + its IVF-tier variant search_hybrid_rrf_ivf,
# dedup_span_removal_incremental (registered in r6 after the block
# froze — never driver-checked; local checks green at both SFs), and
# text_feature_hashing (plan modified r7: hash-once projection,
# values unchanged). Tier C: ALL 36 queries whose latest green row is
# r3 (VERDICT r6 item 2 — the events batch twins, ml rows-only,
# multimodal family, json/pivot/map/distinct, quality_constraints,
# scd2_history, table_stats, TPC-H q2/q11/q12/q15/q20/q21/q22).
# 15 + 36 = 51 — one over, so the LAST tier-C row
# (q22_sales_opportunity, the lowest-risk single-scan shape of the 36)
# sits at slot 51 with the r4-era fills at 52-62, next-in-line if the
# driver budget stretches — rotate them in r8. No composition
# re-enters (corpus_curate*/sim_ivf_incremental latest green is r5 —
# slot policy rules b/c say r8). collect() raises if a priority name
# is not registered.
_PRIORITY = (
    # --- tier A: new in r7 / never driver-checked / plan-modified ---
    "corpus_dsir_weights_hashed",
    "corpus_token_budget_sample",
    "dedup_span_decontaminate",
    "text_search_phrase",
    "sim_mmr_rerank",
    "corpus_dsir_weights_hashed_incremental",
    "search_hybrid_rrf",
    "search_hybrid_rrf_ivf",
    "sim_mmr_rerank_ivf",
    "sim_mmr_rerank_pq",
    "join_key_skew_report",
    "docs_pack_nextfit",
    "dedup_tier_overlap_report",
    "dedup_span_removal_incremental",
    "text_feature_hashing",
    # --- tier C: the 36 r3-era rows, riskiest shapes first ---
    "sim_neardup_allpairs_exact",
    "ml_minhash_pairs",
    "multimodal_content_dedup",
    "events_multi_rollup",
    "events_tumbling_1h",
    "events_sliding_15m_5m",
    "events_session_30m",
    "events_dedup_keyed",
    "events_click_attribution",
    "scd2_history",
    "corpus_vocab_growth",
    "corpus_health_report",
    "quality_constraints",
    "table_stats",
    "json_extract",
    "agg_pivot",
    "agg_distinct",
    "map_functions",
    "ml_chisq_tokens",
    "ml_kmeans_clusters",
    "ml_sentiment_predictions",
    "ml_crossval_metrics",
    "ml_crossval_dt_metrics",
    "ml_chisq_select_vectors",
    "multimodal_feature_extract",
    "multimodal_meta",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_fake_decode",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q15_top_supplier",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_sales_opportunity",
    # --- 11 fills: riskiest r4-era rows ---
    "q9_product_profit",
    "q8_market_share",
    "join_asof_purchase_click",
    "join_bucketed_priority_counts",
    "agg_grouping_sets",
    "dedup_components_verified_prefiltered",
    "dedup_keep_canonical",
    "dedup_embedding_cosine",
    "text_search_topk",
    "corpus_bpe_pair_counts",
    "corpus_quality_quantiles",
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
