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
# round (r10, VERDICT r9 item 1: rotate onto the parked r5-era rows +
# the r6-era tail). Freshness derives from merging CORRECTNESS_r01-r09
# (latest green round per query):
#   tier B (22, leading) = EVERY r5-latest row — the whole parked set
#     (the verdict's named 16 plus the six low-risk single-table
#     shapes that had waited with them);
#   tier A (5) = the r10 additions (corpus_ccnet_select — the
#     composed CCNet keep verdict; corpus_perplexity_buckets_approx /
#     corpus_quality_quantiles_approx — the sketch-calibrator relief
#     tiers) + the two r10-MODIFIED surfaces (text_normalize /
#     dedup_exact_normalized: the fold map grew to the full Zs
#     category + ZWSP/BOM stripping — fixture values are unchanged on
#     the ASCII corpora, but the semantics changed, so they re-check);
#   tier C (21) = the oldest r6-latest rows: the full windows family
#     (8), the text tf/idf/tokenize family (8), the r6 events rows
#     (3), and dedup_exact + dedup_components. The second r10 wave
#     (text_trigram_backoff_score_pruned, corpus_ccnet_select_
#     incremental) forced two more tier-A slots under rule a;
#     dedup_jaccard_pairs and dedup_minhash_buckets yielded — both
#     are bench-headline queries measured every round with CI-gated
#     exchange/byte budgets, and their shingle/minhash kernels have
#     r9-green in-block siblings.
# 22 + 7 + 21 = 50. The remaining 28 r6-latest rows park past slot 50
# as next-in-line (named below). Rule c: the three shielded
# compositions (corpus_curate, corpus_curate_calibrated,
# sim_ivf_incremental — latest green r8) become 3 rounds old at r11
# and MUST re-enter the r11 block with the r6/r7 remainder (VERDICT
# r9 schedules them explicitly so they are not squeezed out again).
# collect() raises if a priority name is not registered.
_PRIORITY = (
    # --- tier B (22): the r5-latest rows, oldest in the ledger ---
    "q6_forecast_revenue",
    "dedup_simhash",
    "corpus_shingle_stats",
    "dedup_contamination",
    "corpus_bpe_merges_batched",
    "sim_ivf_sampled_topk",
    "dedup_levenshtein_candidates",
    "dedup_containment_pairs",
    "corpus_domain_stats",
    "corpus_ngram_diversity",
    "text_lang_guess",
    "text_redact_pii",
    "join_anti_no_urgent",
    "join_semi_urgent",
    "events_funnel_conversion",
    "chunk_documents_expr",
    "scalar_functions",
    "datetime_functions",
    "array_functions",
    "agg_maxby",
    "agg_histogram_bins",
    "topk_customers",
    # --- tier A (5): new or behaviorally modified in r10 ---
    "corpus_ccnet_select",  # NEW: lang-gate -> lang cap -> LM head cut
    "corpus_perplexity_buckets_approx",  # NEW: sketch terciles
    "corpus_quality_quantiles_approx",  # NEW: sketch p10/p50/p90
    "text_normalize",  # MODIFIED: full-Zs fold map + ZWSP/BOM strip
    "dedup_exact_normalized",  # MODIFIED: keys on the new fold map
    # --- tier A, second r10 wave (2) ---
    "text_trigram_backoff_score_pruned",  # NEW: the KenLM-prune tier
    "corpus_ccnet_select_incremental",  # NEW: the frozen-policy twin
    # --- tier C (21): the oldest r6-latest rows ---
    "window_rank_orders",
    "window_running_sum",
    "window_moving_avg",
    "window_lag_lead",
    "window_first_last",
    "window_ntile",
    "window_distribution",
    "window_range_time",
    "text_tf",
    "text_idf",
    "text_tfidf_top",
    "text_ngram_counts",
    "text_token_counts",
    "text_clean_lower",
    "text_wordpunct_tokens",
    "text_pos_universal",
    "events_gaps_islands",
    "events_retention_cohorts",
    "events_spine_fill",
    "dedup_exact",
    "dedup_components",
    # --- next-in-line past slot 50: the 28 remaining r6-latest rows,
    # for the r11 block alongside the rule-c compositions ---
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
