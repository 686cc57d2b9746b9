"""Integration test for examples/data_selection.py — the composed
selection dataflow: verdict accounting, determinism, and consistency
with the registered operators it composes."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_selection_pipeline_accounting_and_consistency(spark):
    from examples.data_selection import (
        MIN_BIGRAM_PPM,
        select_corpus,
        selection_report,
    )
    from projetbigdata_spark.operators.selection import corpus_dsir_sample
    from projetbigdata_spark.sources.catalog import load_table

    total = load_table(spark, SF_SMOKE, "documents").count()
    v = select_corpus(spark, SF_SMOKE)
    rows = v.collect()
    # composition is anchor-joined: one row per document, never fewer
    assert len(rows) == total
    # the composed flag is exactly fluent AND dsir_accept
    for r in rows:
        fluent = (
            r.mean_bigram_ppm is not None
            and r.mean_bigram_ppm >= MIN_BIGRAM_PPM
        )
        assert r.fluent == fluent
        assert r.selected == (r.fluent and r.dsir_accept)
    # consistent with the registered operator's verdicts
    dsir = {
        r.doc_id: r.selected
        for r in corpus_dsir_sample(spark, SF_SMOKE).collect()
    }
    for r in rows:
        assert r.dsir_accept == dsir[r.doc_id]
    # deterministic: a second run yields identical verdicts
    again = {r.doc_id: r.selected for r in select_corpus(spark, SF_SMOKE).collect()}
    assert again == {r.doc_id: r.selected for r in rows}
    # something is selected, something is dropped (gates are live)
    n_sel = sum(r.selected for r in rows)
    assert 0 < n_sel < total

    rep = selection_report(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rep) == total
    assert sum(r.n_selected for r in rep) == n_sel


def test_ccnet_report_partitions_corpus_and_agrees(spark):
    """The CCNet-cut audit: the (lang, ppl_bucket) report partitions
    the full corpus; its agreement column matches the composed
    verdicts; every lang with scored docs surfaces a head bucket."""
    from examples.data_selection import ccnet_report, select_corpus
    from projetbigdata_spark.operators.selection import corpus_ccnet_select
    from projetbigdata_spark.sources.catalog import load_table

    total = load_table(spark, SF_SMOKE, "documents").count()
    rep = ccnet_report(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rep) == total
    n_sel = sum(
        r.selected for r in select_corpus(spark, SF_SMOKE).collect()
    )
    assert sum(r.n_also_selected for r in rep) == n_sel
    # delegation: the report's kept column IS the registered verdict
    n_kept = (
        corpus_ccnet_select(spark, SF_SMOKE).where("kept").count()
    )
    assert sum(r.n_ccnet_kept for r in rep) == n_kept
    langs_with_buckets = {r.lang for r in rep if r.ppl_bucket == "head"}
    all_langs = {r.lang for r in rep}
    assert langs_with_buckets == all_langs  # every lang has a head


def test_ccnet_key_diff_report_partitions_and_ties_out(spark):
    """r11: the guessed-vs-metadata key audit partitions the corpus,
    its kept totals tie out to both registered variants, and the flip
    count is live at the fixture (the two keys genuinely partition
    differently, which is why the variant exists)."""
    from examples.data_selection import ccnet_key_diff_report
    from projetbigdata_spark.operators.selection import (
        corpus_ccnet_select,
        corpus_ccnet_select_guessed,
    )
    from projetbigdata_spark.sources.catalog import load_table

    total = load_table(spark, SF_SMOKE, "documents").count()
    rep = ccnet_key_diff_report(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rep) == total
    assert sum(r.n_kept_meta for r in rep) == (
        corpus_ccnet_select(spark, SF_SMOKE).where("kept").count()
    )
    assert sum(r.n_kept_guessed for r in rep) == (
        corpus_ccnet_select_guessed(spark, SF_SMOKE).where("kept").count()
    )
    assert sum(r.n_flipped for r in rep) > 0
