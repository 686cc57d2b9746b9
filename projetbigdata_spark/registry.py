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
# round (r5). Tier A (24 = 17 NEW + 7 MODIFIED): every query added
# across the r5 waves (calibrated curate, semantic dedup, BPE
# encode/batched/fertility, temperature mix, BM25, containment, DSIR
# weights+sample, bigram fluency, MAD anomaly, diversity, TV
# divergence, PQ, IVF-PQ, recall telemetry) plus the behaviorally modified ones (BPE
# pair-exhaustion/\x01 fixes; int32->BIGINT gate widenings touching
# the text_quality_scores subtree and therefore corpus_curate; the
# incremental-IVF oracle's zero-norm filter). Tier B: the 10 queries
# whose latest green row is still r1 (VERDICT r4 item 2 — after this
# round every query's latest green row is r2+). Tier C: the oldest
# remaining rows (latest green r3), riskiest shapes first — iterative
# dedup/similarity, streaming batch twins, CDC/SCD2. Tier C holds 16
# of the first 50 this round — under the NEXT.md ~30 floor because 17
# genuinely-NEW queries force in under rule (a); the six tier-C names
# past slot 50 are next-in-line if the driver's budget stretches, and
# tier C recovers in r6 once the new rows are green. collect() raises
# if a priority name is not registered.
_PRIORITY = (
    # --- tier A: new in r5 ---
    "corpus_curate_calibrated",
    "dedup_semantic",
    "corpus_bpe_encode",
    "corpus_temperature_mix",
    "corpus_bpe_merges_batched",
    "text_search_bm25",
    "dedup_containment_pairs",
    "corpus_dsir_weights",
    "corpus_dsir_sample",
    "text_bigram_prob_score",
    "corpus_bpe_fertility",
    "events_anomaly_mad",
    "corpus_ngram_diversity",
    "corpus_source_divergence",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "ann_recall_report",
    # --- tier A: behaviorally modified in r5 ---
    "corpus_bpe_merges",
    "corpus_bpe_vocab",
    "corpus_domain_stats",
    "text_quality_scores",
    "text_lang_guess",
    "sim_ivf_incremental",
    "corpus_curate",
    # --- tier B: the 10 r1-era rows ---
    "scalar_functions",
    "array_functions",
    "datetime_functions",
    "agg_maxby",
    "agg_histogram_bins",
    "chunk_documents_expr",
    "join_semi_urgent",
    "join_anti_no_urgent",
    "topk_customers",
    "q6_forecast_revenue",
    # --- tier C: oldest remaining rows (latest green r3), riskiest
    # shapes first ---
    "dedup_components_minhash",
    "dedup_components_prefiltered",
    "dedup_incremental",
    "dedup_contamination",
    "dedup_jaccard_verified",
    "dedup_simhash",
    "dedup_minhash_estimate",
    "dedup_levenshtein_candidates",
    "corpus_shingle_stats",
    "contamination_ngram_overlap",
    "dedup_span_profile",
    "text_redact_pii",
    "sim_ivf_sampled_topk",
    "sim_neardup_pairs",
    "sim_ann_lsh_topk",
    "events_funnel_conversion",
    "events_spine_fill",
    "events_retention_cohorts",
    "events_click_attribution",
    "events_dedup_keyed",
    "merge_cdc_snapshot",
    "scd2_history",
    # (json_extract / agg_pivot / map_functions /
    # sample_stratified_by_lang / window_distribution /
    # window_range_time / text_tfidf_top / text_ngram_counts /
    # corpus_vocab_growth / corpus_health_report yielded their tier-C
    # slots to the r5 additions — all zero-join projection /
    # single-agg / window shapes, the lowest-risk r3-green rows left;
    # their rows stand and they follow in module order. See the header
    # comment for the final 24/10/16 tier accounting.)
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
