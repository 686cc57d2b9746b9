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
# round (r3): the 17 queries never driver-checked across r1/r2 (ml,
# multimodal, the 5 events window twins, sim_ivf_sampled_topk), then
# the 5 r1 hash-fails that were fixed in r2 but never driver
# re-verified, then the queries most recently modified (r2 perf
# rewrites + r3 ADVICE fixes). Everything else follows in module
# order. collect() raises if a priority name is not registered.
_PRIORITY = (
    # --- never driver-checked (r1∪r2) ---
    "ml_kmeans_clusters",
    "ml_chisq_tokens",
    "ml_sentiment_predictions",
    "ml_crossval_metrics",
    "ml_crossval_dt_metrics",
    "ml_chisq_select_vectors",
    "multimodal_feature_extract",
    "multimodal_meta",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_fake_decode",
    "events_multi_rollup",
    "events_tumbling_1h",
    "events_sliding_15m_5m",
    "events_session_30m",
    "events_dedup_keyed",
    "sim_ivf_sampled_topk",
    # --- r1 fails fixed in r2, never driver re-checked ---
    "json_extract",
    "agg_distinct",
    "agg_pivot",
    "table_stats",
    "quality_constraints",
    # --- r3 ADVICE fixes: their r2 rows predate the fix, need fresh ---
    "window_distribution",
    "dedup_incremental",
    "dedup_contamination",
    "agg_geomean_udaf",
    "agg_geomean_expr",
    # (dedup_embedding_cosine also dropped late-r3: its green r2 row
    # postdates the r2 LSH rewire and r3 never touched it)
    # (sim_topk_bruteforce / sim_lsh_buckets / sim_neardup_pairs /
    # text_tfidf_top / sim_ann_lsh_topk / dedup_simhash /
    # dedup_minhash_buckets / dedup_components_minhash dropped from the
    # priority block late in r3: their green r2 rows POSTDATE the r2
    # rewrites and nothing touched them since (the r3 dial params
    # default to the registered behavior, equality pytest-pinned) —
    # those slots go to the late-r3 queries below so the whole
    # registered surface has a driver row after this round)
    # --- late-r3 additions (curation tier, SCD2, stream-stream twin,
    # map functions) — never driver-checked ---
    "contamination_ngram_overlap",
    "text_unigram_freq_score",
    "dedup_span_profile",
    "dedup_keep_canonical",
    "scd2_history",
    "events_click_attribution",
    "map_functions",
    # new in r3: exact all-pairs neardup baseline registered by name
    "sim_neardup_allpairs_exact",
    # new in r3: universal-tagset rule tier (NLTK divergence audit)
    "text_pos_universal",
    # new in r3: exact-collapse prefilter tier for components
    "dedup_components_prefiltered",
    # new in r3: Heaps-law vocabulary growth curve
    "corpus_vocab_growth",
    # new in r3: shingle-df histogram (df-cap telemetry)
    "corpus_shingle_stats",
    # new in r3: built-in MinHashLSH estimator tier (rows-only)
    "ml_minhash_pairs",
    # new in r3: corpus telemetry report
    "corpus_health_report",
    # new in r3: media content-hash dedup through the Arrow binary path
    "multimodal_content_dedup",
    # new in r3: TPC-H suite completion (relational5)
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q15_top_supplier",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_sales_opportunity",
    # new in r3 (slot 50 of the driver's check budget): regex-dialect
    # parity is the riskiest new surface, so the PII redaction query
    # takes the last checked slot; the other curation queries
    # (contamination_ngram_overlap, text_unigram_freq_score,
    # dedup_keep_canonical) queue for the r4 budget and are local-
    # harness-verified meanwhile.
    "text_redact_pii",
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
