"""Degenerate-input robustness: a 100 TB pipeline meets empty
partitions, empty days, and brand-new tables constantly — every
operator family must plan and execute over 0-row tables without
crashing (0 rows out, never an exception).

The empty fixture mirrors the real schemas exactly (read from the
sf0.001 parquet, filtered to 0 rows, rewritten), so schema inference
and column pruning behave as in production.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE, TABLES

# one representative query per family; streaming/ML fits excluded
# (estimator fits on 0 rows are a legitimate error, not a crash bug)
REPRESENTATIVES = [
    "q1_pricing_summary",        # relational agg
    "q5_local_supplier",         # multi-join star
    "vocab_topk",                # tokenize + agg + top-k
    "window_rank_orders",        # window functions
    "topk_customers",            # sort/limit
    "set_ops",                   # union/intersect/except
    "dedup_exact",               # hash dedup
    "dedup_minhash_buckets",     # shingle -> signature agg
    "sim_lsh_buckets",           # LSH signatures
    "text_repetition_scores",    # repetition profile
    "text_winnow_fingerprints",  # winnowing window
    "docs_pack_greedy",          # packing window
    "corpus_mix_plan",           # mixture agg
    "embed_quantize_int8",       # in-row array folds
    "events_tumbling_1h",        # time windows
    "merge_cdc_snapshot",        # upsert
    "sample_hash_documents",     # sampling
    "quality_constraints",       # constraint report (5 rows of zeros)
    "multimodal_meta",           # mapInPandas binary plumbing
    # r3 additions
    "q2_min_cost_supplier",      # correlated min over derived partsupp
    "q11_important_stock",       # HAVING over 1-row total (null on empty)
    "q15_top_supplier",          # equality with max over empty rev
    "q21_waiting_supplier",      # multi-agg self composition
    "q22_sales_opportunity",     # anti-join + scalar avg (null threshold)
    "corpus_vocab_growth",       # decile charge vs null max_doc
    "corpus_shingle_stats",      # df histogram
    "dedup_components_prefiltered",  # exact-collapse + propagation loop
    "dedup_components_verified_prefiltered",  # collapse + verified ladder
    "text_pos_universal",        # universal-tag CASE chain
    "corpus_health_report",      # telemetry report (7 rows, zero/null)
    # r3 curation tier + stream-stream batch twin
    "contamination_ngram_overlap",  # anchored eval overlap
    "text_unigram_freq_score",   # corpus-frequency score (1-row total)
    "dedup_keep_canonical",      # components left-join overlay
    "dedup_span_profile",        # span keys + keep-first stats
    "text_redact_pii",           # regex projection over events
    "events_click_attribution",  # interval self-join on events
    # r4 additions
    "text_search_topk",          # inverted-index conjunctive retrieval
    "corpus_bpe_pair_counts",    # BPE pair counting over distinct words
    "corpus_bpe_merges",         # iterative BPE training (empty -> 0 merges)
    "corpus_bpe_vocab",          # post-merge symbol inventory
    "corpus_curate",             # five-subtree composed audit
    "corpus_domain_stats",       # domain-key hash-agg telemetry
    "corpus_quality_quantiles",  # explicit percentile_disc windows
    "dedup_component_sizes",     # cluster-size histogram
    "sim_ivf_incremental",       # frozen-codebook new x old probe
    "sim_ivf_posting_stats",     # r11: k-row stats over 0 vectors
    "sim_ivf_incremental_deleted",  # r12: remove_ids over 0 vectors
    "sim_ivf_posting_stats_base",   # r12: artifact audit on 0 vectors
    "corpus_sample_assign",      # mixture-realizing repeat counts
    # r5 additions
    "corpus_curate_calibrated",  # audit + per-lang quantile thresholds
    "dedup_semantic",            # Lloyd + within-cluster pairs
    "corpus_bpe_encode",         # lexicon join over 0 trainable words
    "corpus_bpe_fertility",      # encode rolled up by (absent) langs
    "corpus_temperature_mix",    # sqrt-weighted mixture (0 langs)
    "text_search_bm25",          # dl/tf/idf over 0 postings
    "dedup_containment_pairs",   # capped index on 0 shingles
    "corpus_dsir_weights",       # ratio table over 0 tokens
    "corpus_dsir_sample",        # acceptance over Σw = 0 degenerate
    "corpus_dsir_weights_smoothed",  # add-one over V = 0 vocabulary
    "dedup_span_removal",            # span index over 0 windows
    "dedup_span_removal_incremental",  # frozen-index probe over 0 docs
    "text_feature_hashing",          # hash-agg over 0 tokens
    "text_bigram_prob_score",    # bigram counts over 0 grams
    "events_anomaly_mad",        # medians over 0 hourly groups
    "corpus_ngram_diversity",    # in-row ratios (0 docs -> 0 rows)
    "corpus_source_divergence",  # TV terms + Σp constant on 0 tokens
    "sim_pq_topk",               # PQ train/encode/ADC on 0 vectors
    "sim_ivfpq_topk",            # composed index on 0 vectors
    "ann_recall_report",         # recall over 0 queries
    "ann_recall_report_ivfpq",   # same frame over the PQ tier
    # r8 additions
    "corpus_quality_classifier_scores",  # frozen-coef dot over 0 docs
    "text_search_phrase3",               # k-term fold over 0 docs
    "text_search_phrase_slop",           # gap-OR fold over 0 docs
    "text_search_phrase_kslop",          # composed fold over 0 docs
    "corpus_softdedup_weights",          # anchor over 0 docs
    # r9 additions
    "dedup_bucket_cap_report",           # cap telemetry over 0 buckets
    "corpus_source_cap",                 # share cap over 0 docs
    "corpus_lang_cap",                   # lang-keyed twin
    "dedup_lines",                       # line units over 0 docs
    "dedup_lines_incremental",           # ingest twin over 0 docs
    "corpus_softdedup_sample",           # verdict frame over 0 docs
    "dedup_keep_best_quality",           # argmax over 0 clusters
    "corpus_cluster_balance_sample",     # k-means over 0 vectors
    "corpus_quality_select",             # histogram over 0 docs
    # r9 second wave
    "text_trigram_backoff_score",        # LM model/scoring over 0 docs
    "text_trigram_backoff_score_pruned",  # pruned model over 0 docs
    "text_trigram_backoff_score_incremental",  # frozen model, 0 batch
    "corpus_perplexity_buckets",         # terciles over 0 scored docs
    "corpus_cluster_top_terms",          # lift/top-k over 0 vectors
    "dedup_incremental_bloom",           # filter/probe over 0 keys
    "dedup_bloom_fp_report",             # 1 accounting row of zeros
    "corpus_c4_clean",                   # in-row rules over 0 docs
    "corpus_quality_calibration_report",  # bins over 0 docs
    "text_lang_lines",                   # per-line langid over 0 docs
    # r9 third wave
    "corpus_gopher_clean",               # in-row rules over 0 docs
    "text_gopher_repetition",            # 9-size profile over 0 docs
    "corpus_gopher_repetition_clean",    # ceiling verdict over 0 docs
    "dedup_lines_within",                # in-row keep-first over 0 docs
    "text_normalize",                    # in-row folding over 0 docs
    "dedup_exact_normalized",            # hash-agg over 0 docs
    # r10
    "corpus_ccnet_select",               # 3-stage funnel over 0 docs
    "corpus_ccnet_select_guessed",       # r11: guessed-key funnel, 0 docs
    "corpus_ccnet_select_guessed_multi",  # r12: multi-class key, 0 docs
    "text_lang_guess_multi",             # r12: profile argmax over 0 docs
    "corpus_perplexity_buckets_approx",  # sketch terciles over 0 docs
    "corpus_quality_quantiles_approx",   # sketch p10/50/90 over 0 docs
    "corpus_ccnet_select_incremental",   # frozen policy over 0 docs
]

# these legitimately return constant-row reports even on empty input
NONZERO_ON_EMPTY = {
    "quality_constraints",
    "corpus_mix_plan",
    "corpus_health_report",
    "dedup_bloom_fp_report",  # r9: a global agg is 1 row on 0 docs
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        df.where("1 = 0").coalesce(1).write.mode("overwrite").parquet(
            f"{d}/{t}.parquet"
        )
    return str(d)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    from projetbigdata_spark import registry

    queries, _ = registry.collect()
    out = queries[name](spark, empty_sf_dir)
    n = out.count()  # must execute, not throw
    if name not in NONZERO_ON_EMPTY:
        assert n == 0, f"{name}: expected 0 rows on empty input, got {n}"
