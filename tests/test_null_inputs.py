"""Null/empty-value robustness: real crawl corpora carry NULL text,
empty strings, and NULL metadata. Fixture tables have none, so this
stages a documents table with nulls injected and asserts the text /
dedup / stats operators neither crash nor silently multiply rows.

Accounting contract per family:
  - tokenize-based per-doc ops keep the row (null -> empty tokens);
  - explode-based ops drop null-token docs (no shingles to emit);
  - hash dedup groups all-null texts together (md5(NULL) IS NULL).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE, TABLES

N_NULL = 5
N_EMPTY = 5


@pytest.fixture(scope="module")
def nulled_sf_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("nulled_sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") < N_NULL, F.lit(None).cast("string"))
                .when(F.col("doc_id") < N_NULL + N_EMPTY, F.lit(""))
                .otherwise(F.col("text")),
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    return str(d)


PER_DOC_KEEPERS = [
    # every input doc must still be present (null text -> degenerate row)
    "text_quality_scores",
    "text_token_counts",
    "text_pos_universal",
    "text_wordpunct_tokens",
    "corpus_health_report",  # report rows, not per-doc — just no crash
    "dedup_tier_overlap_report",  # r7: 7 report rows — just no crash
    # r3 curation tier: all anchor on the full document set, so null/
    # empty texts must surface as degenerate rows, never vanish
    "text_unigram_freq_score",
    "dedup_keep_canonical",
    "dedup_span_profile",
    # null text -> EMPTY payload (with_payload guard): the row keeps
    # n_bytes=0 / first_byte=-1 instead of crashing the pandas kernel
    "multimodal_meta",
    # r4: the composed audit is full-corpus BY CONTRACT — null-text
    # docs form the '<NULL>' exact group instead of vanishing through
    # a NULL-key inner join (fixed r4 on inspection; this row is the
    # regression gate), and the sampler assigns every doc a repeat
    # count (0 tokens -> epochs of its language, n_tokens=0)
    "corpus_curate",
    "corpus_sample_assign",
    # r5 second wave: all anchor on the full document set
    "corpus_dsir_weights",
    "corpus_dsir_sample",
    "corpus_dsir_weights_smoothed",  # r6: add-one keeps every doc
    "dedup_span_removal",  # r6: null text coalesced to '' (0 tokens)
    "dedup_lines",  # r9: null text -> one kept empty line, 0 cut
    "text_bigram_prob_score",
    # r7: hashed-bucket DSIR anchors the full doc set (null/short text
    # -> n_bigrams=0, NULL weight)
    "corpus_dsir_weights_hashed",
    # r7: budget fill anchors the full doc set (null text -> 0 tokens,
    # still bucketed and verdict-ed)
    "corpus_token_budget_sample",
    "corpus_ngram_diversity",  # in-row: null text -> zero-count row
    # r8: the frozen-coefficient scorer anchors the full doc set
    # (null text -> no features -> intercept-only logit)
    "corpus_quality_classifier_scores",
    # r8: soft-dedup anchors the full doc set (null-text docs form one
    # exact-clone cluster -> size>1 -> down-weighted, never dropped)
    "corpus_softdedup_weights",
    "corpus_softdedup_sample",  # r8: same anchor, verdict projection
    # r8: top-rho selection anchors the full doc set (null text ->
    # intercept logit, binned and verdict-ed like any other doc)
    "corpus_quality_select",
    # r8: quality-aware canonical selection anchors the full doc set
    # (null-text docs score the intercept and keep their cluster row)
    "dedup_keep_best_quality",
    # r9: share caps read only metadata keys — null text is irrelevant
    # and every doc gets a verdict (NULL keys pinned separately in
    # test_curation_ops.py via eqNullSafe constructed rows)
    "corpus_source_cap",
    "corpus_lang_cap",
    # r9 second wave: both anchor the full doc set (null/short text ->
    # n_trigrams=0 with a NULL score / the 'unscored' bucket)
    "text_trigram_backoff_score",
    "text_trigram_backoff_score_pruned",  # r10: same anchor contract
    "corpus_perplexity_buckets",
    # r9 second wave: zero-join per-doc projection — null text is one
    # empty line, all rules fail, row kept with kept=FALSE
    "corpus_c4_clean",
    # r9 second wave: same in-row class — null text is one empty
    # line, (1, 0, 0, 1, FALSE)
    "text_lang_lines",
    # r9 third wave: zero-join per-doc projection — null text -> 0
    # words, ratio columns NULL, kept=FALSE via the word-count rule
    "corpus_gopher_clean",
    # r9 third wave: anchors the full doc set (null text -> n_tokens=0
    # with a NULL repetition profile)
    "text_gopher_repetition",
    # r9 third wave: NULL profile signals pass vacuously -> null-text
    # docs keep their row with kept=TRUE, n_rules_failed=0
    "corpus_gopher_repetition_clean",
    # r9 fourth wave: null text -> one kept empty line / empty
    # text_norm — both anchor every doc
    "dedup_lines_within",
    "text_normalize",
    # r10: the composed CCNet verdict anchors every doc — null text
    # fails the lang gate (no identified lines) but keeps its row
    # (lang_ok=FALSE, NULL accept_ppm, kept=FALSE)
    "corpus_ccnet_select",
    # r11: the guessed-key variant anchors identically (null text ->
    # NULL marker ratio -> lang_guess 'other'; gate still fails)
    "corpus_ccnet_select_guessed",
    # r12: multi-class key — null text has no scorable token, so the
    # doc keys 'und' (NULL guess_score) and still anchors its row
    "corpus_ccnet_select_guessed_multi",
    "text_lang_guess_multi",
    # r10: sketch-tercile twin anchors like the exact tier (null text
    # -> 'unscored')
    "corpus_perplexity_buckets_approx",
]

EXPLODE_DROPPERS = [
    # null/empty docs legitimately vanish (nothing to explode)
    "text_tf",
    "dedup_minhash_buckets",
    "corpus_vocab_growth",
    "corpus_shingle_stats",
    # anchored on EVAL docs (not the full corpus): null-text eval docs
    # surface with n_grams=0; the anchor invariant itself is pinned in
    # test_curation_ops.py — here we assert it survives null text
    "contamination_ngram_overlap",
    # empty text -> 0 tokens: dup_word_frac must go NULL, not
    # DIVIDE_BY_ZERO under ANSI (review finding r3)
    "text_repetition_scores",
    # r6: hashed features — null/empty docs emit no (bucket, n) rows
    "text_feature_hashing",
]

DEDUP_FAMILY = [
    "dedup_exact",
    # r9 fourth wave: null text normalizes to '' -> the empty-string
    # group (unlike raw dedup_exact, where md5(NULL) is NULL)
    "dedup_exact_normalized",
    "dedup_incremental",
    "dedup_components_prefiltered",
    "dedup_components_verified_prefiltered",
    "dedup_component_sizes",
    "multimodal_content_dedup",
]

MISC_R4 = [
    "text_search_topk",          # null tokens never match the terms
    "corpus_domain_stats",       # per-source agg over null-text rows
    "corpus_quality_quantiles",  # 0-token docs excluded by definition
    # r10: the sketch twin shares the exact tier's null posture
    "corpus_quality_quantiles_approx",
]

MISC_R5 = [
    "text_search_bm25",          # null tokens never match the terms
    "text_search_phrase",        # r7: null text holds no bigrams
    "text_search_phrase3",       # r8: k-term fold, same null posture
    "text_search_phrase_slop",   # r8: gap-OR fold, same null posture
    "text_search_phrase_kslop",  # r8: composed fold, same null posture
    "dedup_containment_pairs",   # null-text docs emit no shingles
    "corpus_bpe_fertility",      # null-text docs count 0 words per lang
    "corpus_source_divergence",  # null-text docs add no token mass
    # r6: anchors on the src0 slice only (null src0 text -> 0 tokens)
    "dedup_span_removal_incremental",
    # r9: anchors on the src0 slice only (null text -> one empty line)
    "dedup_lines_incremental",
    # r7: anchors on the train slice only (null train text -> 0 tokens)
    "dedup_span_decontaminate",
    # r7: anchors on the src0 slice only (null text -> 0 bigrams)
    "corpus_dsir_weights_hashed_incremental",
    # r7: next-fit packing anchors every doc (null text -> 0 tokens,
    # still packed)
    "docs_pack_nextfit",
    # r9 second wave: cluster-labeling report — null-text docs simply
    # contribute no tokens to their cluster; just must not crash
    "corpus_cluster_top_terms",
    # r9 second wave: anchors on the src0 slice only (null batch text
    # -> 0 trigrams, unscored)
    "text_trigram_backoff_score_incremental",
    # r10 second wave: the frozen-policy CCNet twin anchors the src0
    # slice (null text fails the lang gate but keeps its row)
    "corpus_ccnet_select_incremental",
    # r9 second wave: Bloom verdicts anchor the src0 slice (NULL text
    # is unhashable -> possibly_dup FALSE, the exact tier's NULL
    # grouping owns those); the report is one accounting row
    "dedup_incremental_bloom",
    "dedup_bloom_fp_report",
    # r9 second wave: per-bin rollup — null-text docs score the
    # intercept and land in its bin like any other doc
    "corpus_quality_calibration_report",
]


@pytest.mark.parametrize(
    "name",
    PER_DOC_KEEPERS + EXPLODE_DROPPERS + DEDUP_FAMILY + MISC_R4 + MISC_R5,
)
def test_runs_with_null_and_empty_text(spark, nulled_sf_dir, name):
    from projetbigdata_spark import registry

    queries, _ = registry.collect()
    out = queries[name](spark, nulled_sf_dir)
    rows = out.count()  # executes; must not raise
    if name in PER_DOC_KEEPERS and name not in (
        "corpus_health_report",
        "dedup_tier_overlap_report",
    ):
        total_docs = spark.read.parquet(
            f"{nulled_sf_dir}/documents.parquet"
        ).count()
        assert rows == total_docs, (
            f"{name}: per-doc op dropped rows on null text "
            f"({rows} != {total_docs})"
        )


def test_exact_dedup_groups_null_and_empty(spark, nulled_sf_dir):
    """md5(lower(NULL)) is NULL -> all null-text docs form ONE group
    (groupBy treats NULL as a key); empty strings form another."""
    from projetbigdata_spark import registry

    queries, _ = registry.collect()
    out = queries["dedup_exact"](spark, nulled_sf_dir).collect()
    by_hash = {r.content_md5: r for r in out}
    assert None in by_hash and by_hash[None].n_copies == N_NULL
    import hashlib

    empty_md5 = hashlib.md5(b"").hexdigest()
    assert by_hash[empty_md5].n_copies == N_EMPTY


def test_tier_overlap_exact_diagonal_counts_null_texts(
    spark, nulled_sf_dir
):
    """ADVICE r7 (medium): the overlap report's exact tier must count
    NULL-text drops. An equi-join on content_md5 silently excluded
    them (md5(NULL) IS NULL never matches) while the DuckDB oracle's
    window PARTITION BY groups NULLs into one dup group — on any
    corpus with >=2 NULL texts the exact diagonal, both exact
    overlaps, and the 'any' union diverged between engines. The fix
    derives keep_id with a window min (NULL-grouping, like groupBy);
    this pins the diagonal to dedup_exact's own null-inclusive
    accounting: drops == sum(n_copies - 1) over the group frame."""
    from projetbigdata_spark import registry

    queries, _ = registry.collect()
    groups = queries["dedup_exact"](spark, nulled_sf_dir).collect()
    expect_drops = sum(r.n_copies - 1 for r in groups)
    # the fixture's N_NULL nulls alone guarantee a nonzero diagonal
    assert expect_drops >= N_NULL - 1 + N_EMPTY - 1
    report = {
        (r.tier_a, r.tier_b): r.n_docs
        for r in queries["dedup_tier_overlap_report"](
            spark, nulled_sf_dir
        ).collect()
    }
    assert report[("exact", "exact")] == expect_drops


@pytest.fixture(scope="module")
def nulled_events_emb_dir(spark, tmp_path_factory):
    """events with NULL event_type/value/props rows; embeddings with
    NULL vectors — the failed-ingest shapes a real pipeline sees."""
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("nulled_ev_emb")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        if t == "events":
            df = (
                df.withColumn(
                    "event_type",
                    F.when(F.col("event_id") % 97 == 0, F.lit(None).cast("string"))
                    .otherwise(F.col("event_type")),
                )
                .withColumn(
                    "value",
                    F.when(F.col("event_id") % 89 == 0, F.lit(None).cast("double"))
                    .otherwise(F.col("value")),
                )
                .withColumn(
                    "props",
                    F.when(F.col("event_id") % 83 == 0, F.lit(None).cast("string"))
                    .otherwise(F.col("props")),
                )
            )
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 101 == 0,
                    F.lit(None).cast("array<float>"),
                ).otherwise(F.col("embedding")),
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "events_gaps_islands",
        "events_funnel_conversion",
        "events_tumbling_1h",
        "events_session_30m",
        "events_multi_rollup",
        "json_extract",
        "embed_l2norm",
        "embed_quantize_int8",
        "sim_lsh_buckets",
        "sim_topk_bruteforce",
        "dedup_embedding_cosine",
        "text_redact_pii",
        "events_click_attribution",
        "map_functions",   # null event_type must coalesce, not crash
        "scd2_history",    # pinned NULLS LAST ordering
        "sim_ivf_incremental",  # null embeddings: no signature, no row
        "sim_ivf_incremental_deleted",  # r12: same drop law post-delete
        "events_anomaly_mad",   # null event_type is its own group key
        "sim_pq_topk",          # null embeddings: no subvectors, no codes
        "sim_ivfpq_topk",
        "ann_recall_report",    # null-norm queries drop from both tiers
        "ann_recall_report_ivfpq",  # r6: same frame over the PQ tier
    ],
)
def test_runs_with_null_events_and_embeddings(
    spark, nulled_events_emb_dir, name
):
    from projetbigdata_spark import registry

    queries, _ = registry.collect()
    queries[name](spark, nulled_events_emb_dir).count()  # must not raise
