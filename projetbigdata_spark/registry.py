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
# round (r12, VERDICT r11 item 1: ALL 35 r7-latest rows MUST lead —
# they hit the 5-round freshness floor at r12; the floor is machine-
# enforced by tools/freshness_report.py + tests/test_freshness_floor.py,
# and the rotation below was pre-flighted with --simulate-next).
#   tier B (35, leading) = EVERY r7-latest row from the merged ledger
#     (tools/freshness_report.py counts 35, the authoritative number —
#     the r11 NEXT.md hand-count of 34 was off by one);
#   tier A = new r12 queries (rule a) — inserted here as they land,
#     displacing tier-C fills to keep the block at 50;
#   tier C (fills to 50) = the oldest r8-latest rows, alphabetical
#     head of the 45-row r8 set (all tie on age; the deterministic
#     prefix keeps the remaining 30-odd nameable as next-in-line for
#     r13, where the whole r8 set hits the floor).
# Rule b/c compositions (corpus_curate, corpus_curate_calibrated,
# sim_ivf_incremental) are r11-green — shielded, no re-entry due.
# collect() raises if a priority name is not registered.
_PRIORITY = (
    # --- tier B (35): every r7-latest row — the 5-round floor hits
    # them this round; freshness_report --simulate-next verified ---
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
    # --- tier A: new r12 rows (rule a) + factoring-touched re-checks ---
    "sim_ivf_incremental_deleted",  # NEW: tombstoned-index probe
    "sim_ivf_posting_stats_base",  # NEW: persisted-artifact audit
    "text_lang_guess_multi",  # NEW: multi-class profile-argmax langid
    "corpus_ccnet_select_guessed_multi",  # NEW: CCNet on the 5-class key
    "corpus_ccnet_select_guessed",  # core factored (_ccnet_guessed_
    # verdicts / parameterized oracle — byte-identical, re-checked out
    # of caution, the r11 convention for factoring-touched rows)
    # --- tier C (10): oldest r8-latest rows, alpha prefix of 45 ---
    "agg_grouping_sets",
    "agg_salted_user_totals",
    "bow_vectorize",
    "chunk_documents_udtf",
    "corpus_bpe_pair_counts",
    "corpus_cluster_balance_sample",
    "corpus_quality_classifier_report",
    "corpus_quality_classifier_scores",
    "corpus_quality_quantiles",
    "corpus_softdedup_sample",
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
