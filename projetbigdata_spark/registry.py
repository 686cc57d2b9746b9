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
# round (r6). Tier A (10 = 4 NEW + 6 MODIFIED): dedup_span_removal
# (exact-substring removal), text_feature_hashing (hashing-trick
# vectorizer), ann_recall_report_ivfpq, corpus_dsir_weights_smoothed;
# plus the behaviorally modified ones — text_search_bm25 (denominator
# widening), corpus_dsir_weights/_sample (doc-sum widening),
# corpus_source_divergence (TV ½ factor — VALUES changed),
# dedup_semantic (registered pin unchanged but the callable moved to
# the k=16 wrapper) and ann_recall_report (tier parameterization).
# Tier C: ALL 34 queries whose latest green row is r2 (VERDICT r5
# item 2 — the windows family, text tf/idf, repetition/winnowing,
# packing, set-op-era splits, r2 sim/dedup bases). 10 + 34 = 44 ≤ 50,
# so tier C is complete this round (≥30 floor met) and the remaining
# ~6 driver slots fall to the oldest r3-era rows in module order. No
# composition re-enters (corpus_curate* subtrees unchanged — slot
# policy rule b). collect() raises if a priority name is not
# registered.
_PRIORITY = (
    # --- tier A: new in r6 ---
    "dedup_span_removal",
    "text_feature_hashing",
    "ann_recall_report_ivfpq",
    "corpus_dsir_weights_smoothed",
    # --- tier A: behaviorally modified in r6 ---
    "text_search_bm25",
    "corpus_dsir_weights",
    "corpus_dsir_sample",
    "corpus_source_divergence",
    "dedup_semantic",
    "ann_recall_report",
    # --- tier C: the 34 r2-era rows, riskiest shapes first ---
    "dedup_components",
    "dedup_jaccard_pairs",
    "dedup_minhash_buckets",
    "dedup_exact",
    "sim_ivf_topk",
    "sim_lsh_buckets",
    "sim_topk_bruteforce",
    "merge_cdc_snapshot",
    "events_retention_cohorts",
    "events_spine_fill",
    "events_gaps_islands",
    "corpus_mix_plan",
    "docs_pack_greedy",
    "embed_quantize_int8",
    "sample_hash_documents",
    "sample_stratified_by_lang",
    "split_assign_documents",
    "text_winnow_fingerprints",
    "text_repetition_scores",
    "text_fingerprints",
    "text_tfidf_top",
    "text_idf",
    "text_tf",
    "text_ngram_counts",
    "text_token_counts",
    "text_clean_lower",
    "text_wordpunct_tokens",
    "window_range_time",
    "window_moving_avg",
    "window_first_last",
    "window_lag_lead",
    "window_ntile",
    "window_rank_orders",
    "window_running_sum",
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
