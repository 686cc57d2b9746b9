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
# round (r8). Slot 1: q22_sales_opportunity — the one row the r7
# rotation missed (it sat at slot 51; its latest green row is r3, four
# rounds old — VERDICT r7 item 1 says lead with it). Tier A (12): the
# r8 additions — corpus_quality_classifier_scores (NEW — frozen-
# coefficient quality-classifier scoring, full oracle),
# corpus_softdedup_weights / corpus_softdedup_sample (NEW —
# duplication-aware sampling weights + the executable verdict),
# text_search_phrase3 / text_search_phrase_slop (NEW — k-term and
# proximity phrase search), ml_quality_classifier_fit (NEW — rows-only
# like every mllib fit), corpus_quality_classifier_report (NEW — the
# per-lang classifier audit), dedup_keep_best_quality (NEW —
# quality-aware canonical selection), and
# corpus_cluster_balance_sample (NEW — topic-diversity cluster-
# balanced sampling over the shared integer-Lloyd tier), and
# search_hybrid_rrf_pq (NEW — the PQ-tier fusion swap, completing the
# brute/IVF/PQ family for RRF as MMR already has), and
# corpus_quality_select (NEW — top-ρ-by-quality selection via the
# logit-histogram threshold, no corpus-wide sort), and
# text_search_phrase_kslop (NEW — the k-term + slop composition,
# closing the phrase family). Compositions
# (3, rule c — latest green r5, three rounds old): corpus_curate,
# corpus_curate_calibrated, sim_ivf_incremental (~24s of sf0.01 wall
# together, within the ~25% composition cap). Tier C (34): the r4-era
# tail, led by the six slot-51+ next-in-line rows VERDICT r7 named,
# then every other query whose latest green row is r4 EXCEPT the ten
# lowest-risk surfaces (vocab_topk — re-proven every round as the
# entry() flagship and the bench headline; label_index; embed_l2norm;
# agg_cube; agg_percentiles; agg_stats_exact; agg_rollup; set_ops; join_left_outer; join_full_outer — zero-or-one-join
# projection / single-table-agg / static-set shapes), which sit past
# slot 50 as next-in-line if the driver budget stretches.
# 1 + 12 + 3 + 34 = 50; after this block every registered query's
# latest green row is r5+ except those ten. collect() raises if a
# priority name is not registered.
_PRIORITY = (
    # --- slot 1: the missed r3-era straggler ---
    "q22_sales_opportunity",
    # --- tier A: new in r8 ---
    "corpus_quality_classifier_scores",
    "corpus_softdedup_weights",
    "text_search_phrase3",
    "text_search_phrase_slop",
    "ml_quality_classifier_fit",
    "corpus_softdedup_sample",
    "corpus_quality_classifier_report",
    "dedup_keep_best_quality",
    "corpus_cluster_balance_sample",
    "search_hybrid_rrf_pq",
    "corpus_quality_select",
    "text_search_phrase_kslop",
    # --- compositions re-entering under rule c (latest green r5) ---
    "corpus_curate",
    "corpus_curate_calibrated",
    "sim_ivf_incremental",
    # --- tier C: the r4-era tail, slot-51+ six first ---
    "dedup_components_verified_prefiltered",
    "dedup_keep_canonical",
    "dedup_embedding_cosine",
    "text_search_topk",
    "corpus_bpe_pair_counts",
    "corpus_quality_quantiles",
    "agg_grouping_sets",
    "agg_salted_user_totals",
    "bow_vectorize",
    "chunk_documents_udtf",
    "dedup_component_sizes",
    "join_asof_purchase_click",
    "join_bucketed_priority_counts",
    "join_interval_binned",
    "join_range_late",
    "pos_trigrams",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_share",
    "q16_supplier_breadth",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "sql_frontend_yearly_revenue",
    "subquery_above_nation_avg",
    "text_unigram_freq_score",
    "unpivot_nation_metrics",
    # --- next-in-line past slot 50: lowest-risk r4-era rows ---
    "join_full_outer",
    "join_left_outer",
    "agg_cube",
    "agg_percentiles",
    "agg_stats_exact",
    "agg_rollup",
    "set_ops",
    "vocab_topk",
    "label_index",
    "embed_l2norm",
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
