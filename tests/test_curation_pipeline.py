"""Integration test for the corpus-curation composition
(examples/corpus_curation.py): quality gate -> exact dedup -> near-dup
components -> deterministic splits. Each stage is individually
oracle-checked; this asserts the COMPOSITION'S row accounting and
determinism."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

from tests.conftest import SF_CHECK

_spec = importlib.util.spec_from_file_location(
    "corpus_curation",
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 "examples", "corpus_curation.py"),
)
curation = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(curation)


def test_curation_accounting_and_determinism(spark):
    from projetbigdata_spark.operators.dedup import (
        dedup_components_minhash,
        dedup_exact,
    )
    from projetbigdata_spark.sources.catalog import load_table

    out = curation.curate(spark, SF_CHECK).cache()
    total = load_table(spark, SF_CHECK, "documents").count()
    kept = out.count()
    assert 0 < kept < total  # every stage dropped something real

    # no exact duplicates survive
    assert (
        out.groupBy(F.md5(F.lower("text"))).count().where("count > 1").count()
        == 0
    )
    # no near-dup component contributes more than its representative
    comp = dedup_components_minhash(spark, SF_CHECK)
    survivors_in_comp = out.join(
        comp.where(F.col("doc_id") != F.col("component_id")), "doc_id"
    )
    assert survivors_in_comp.count() == 0
    # exact-dup losers are gone too
    losers = (
        load_table(spark, SF_CHECK, "documents")
        .withColumn("content_md5", F.md5(F.lower("text")))
        .join(dedup_exact(spark, SF_CHECK), "content_md5")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    assert out.join(losers, "doc_id").count() == 0

    # split partition: complete, disjoint, deterministic
    splits = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    assert set(splits) <= {"train", "val", "test"}
    assert sum(splits.values()) == kept
    assert splits["train"] > splits.get("val", 0)

    # repetition gate: no survivor exceeds either ceiling
    from projetbigdata_spark.operators.repetition import (
        text_repetition_scores,
    )

    rep = text_repetition_scores(spark, SF_CHECK)
    violators = out.join(
        rep.where(
            (F.col("dup_word_frac") > curation.MAX_DUP_WORD_FRAC)
            | (F.col("top_bigram_share") > curation.MAX_TOP_BIGRAM_SHARE)
        ),
        "doc_id",
    )
    assert violators.count() == 0

    # decontamination: no surviving eval doc exceeds the overlap
    # ceiling (train docs are exempt — the gate only drops eval rows)
    from projetbigdata_spark.operators.curation import (
        contamination_ngram_overlap,
    )

    hot = contamination_ngram_overlap(spark, SF_CHECK).where(
        F.col("overlap_ppm") > curation.MAX_EVAL_OVERLAP_PPM
    )
    assert out.join(hot, "doc_id").count() == 0

    # packing: every survivor has a pack slot; offsets stay in budget
    from projetbigdata_spark.operators.packing import PACK_BUDGET

    assert out.where(F.col("pack_id").isNull()).count() == 0
    assert out.where(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= PACK_BUDGET)
    ).count() == 0

    # determinism: a second full evaluation yields identical assignments
    again = curation.curate(spark, SF_CHECK)
    assert out.select("doc_id", "split", "pack_id").subtract(
        again.select("doc_id", "split", "pack_id")
    ).count() == 0
    out.unpersist()


def test_registered_audit_matches_example_survivors(spark):
    """The registered corpus_curate audit query (operators/curation.py)
    and the example pipeline are the SAME composition: where(kept) must
    reproduce the example's survivor doc set exactly, and the audit's
    per-stage flags must be consistent with the final verdict."""
    from projetbigdata_spark.operators.curation import corpus_curate

    audit = corpus_curate(spark, SF_CHECK).cache()
    example_docs = {
        r.doc_id
        for r in curation.curate(spark, SF_CHECK).select("doc_id").collect()
    }
    audit_docs = {
        r.doc_id for r in audit.where("kept").select("doc_id").collect()
    }
    assert audit_docs == example_docs

    # kept implies every stage flag; any failed stage implies not kept
    assert (
        audit.where(
            F.col("kept")
            & ~(
                F.col("pass_quality")
                & F.col("pass_repetition")
                & F.col("is_exact_keeper")
                & F.col("is_neardup_keeper")
                & ~F.col("is_contaminated")
            )
        ).count()
        == 0
    )
    # audit is full-corpus: one row per document
    from projetbigdata_spark.sources.catalog import load_table

    assert audit.count() == load_table(spark, SF_CHECK, "documents").count()
    assert audit.select("doc_id").distinct().count() == audit.count()
    audit.unpersist()


def test_span_clean_loop_and_optin_stage(spark):
    """The profile → removal → re-profile loop (VERDICT r6 item 3):
    removal must actually eliminate the duplication the profile
    reported — the re-profile's corpus-wide n_dup_spans falls to ~0
    (exactly 0 on the fixture; reassembly can in general mint new
    windows) — with exact row/token accounting, and the opt-in
    curate(span_removal=True) stage must rewrite text without
    changing the survivor doc set."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.text import tokenize
    from projetbigdata_spark.sources.catalog import load_table

    before, rewritten, after = curation.span_clean(spark, SF_CHECK)
    total = load_table(spark, SF_CHECK, "documents").count()

    # row accounting: both profiles and the rewrite anchor every doc
    assert before.count() == total
    assert rewritten.count() == total
    assert after.count() == total

    # the pass was worth running, and it worked
    b = before.agg(F.sum("n_dup_spans").alias("d")).first().d
    a = after.agg(F.sum("n_dup_spans").alias("d")).first().d
    assert b > 0, "fixture should contain cross-doc duplicated spans"
    assert a == 0, f"re-profile still sees {a} duplicated spans"

    # token accounting: n_cut == original tokens - rewritten tokens,
    # per document (not just in aggregate)
    bad = rewritten.where(
        F.col("n_tokens") - F.col("n_cut")
        != F.size(tokenize(F.col("text_deduped")))
        + F.when(F.col("text_deduped") == "", 0).otherwise(0)
    )
    assert bad.count() == 0
    c = rewritten.agg(F.sum("n_cut").alias("c")).first().c
    assert 0 < c  # something was cut
    # cut tokens are exactly the span-covered positions: every doc
    # with n_dup_spans=0 in the BEFORE profile is byte-unchanged
    # modulo tokenization (n_cut = 0)
    untouched = before.where(F.col("n_dup_spans") == 0).select("doc_id")
    assert (
        rewritten.join(untouched, "doc_id").where(F.col("n_cut") > 0).count()
        == 0
    )

    # opt-in stage: same survivor doc set, rewritten text
    base = curation.curate(spark, SF_CHECK)
    cleaned = curation.curate(spark, SF_CHECK, span_removal=True)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    cleaned_ids = {r.doc_id for r in cleaned.select("doc_id").collect()}
    assert cleaned_ids == base_ids
    # every cleaned survivor carries EXACTLY the rewritten text (the
    # stage is the registered dedup_span_removal, not a re-derivation)
    mismatched = cleaned.select("doc_id", "text").join(
        rewritten.select(
            "doc_id", F.col("text_deduped").alias("expected")
        ),
        "doc_id",
    ).where(F.col("text") != F.col("expected"))
    assert mismatched.count() == 0
    # survivors whose text changed == survivors the removal cut. At
    # this fixture that set is EMPTY — every doc with cross-doc
    # duplicated spans is a near/exact-dup the earlier stages already
    # dropped, which is itself the expected interaction: span removal
    # only edits PARTIAL overlaps that survive doc-level dedup.
    changed = (
        base.select("doc_id", F.lower("text").alias("t0"))
        .join(cleaned.select("doc_id", "text"), "doc_id")
        .where(
            F.array_join(tokenize("t0"), " ")
            != F.array_join(tokenize("text"), " ")
        )
    )
    cut_survivors = cleaned.select("doc_id").join(
        rewritten.where(F.col("n_cut") > 0), "doc_id"
    )
    assert changed.count() == cut_survivors.count()


def test_softdedup_weights_compose_and_sample(spark):
    """corpus_softdedup_weights == the declared composition of its two
    independently-green subtrees (component sizes x span-duplication
    discount on the exact ppm grid), full-corpus anchored; and the
    example's softdedup_sample realizes the weights as deterministic
    salted-bucket acceptance (selected iff bucket < weight)."""
    from projetbigdata_spark.operators.curation import (
        corpus_softdedup_weights,
        dedup_span_profile,
    )
    from projetbigdata_spark.operators.dedup import (
        dedup_components_prefiltered,
    )
    from projetbigdata_spark.sources.catalog import load_table

    comp = {
        r.doc_id: r.component_id
        for r in dedup_components_prefiltered(spark, SF_CHECK).collect()
    }
    from collections import Counter

    csize = Counter(comp.values())
    dup = {
        r.doc_id: r.dup_span_ppm or 0
        for r in dedup_span_profile(spark, SF_CHECK).collect()
    }
    total = load_table(spark, SF_CHECK, "documents").count()

    got = corpus_softdedup_weights(spark, SF_CHECK).collect()
    assert len(got) == total  # full-corpus anchor
    saw_cluster = saw_discount = False
    for r in got:
        size = csize[comp[r.doc_id]] if r.doc_id in comp else 1
        assert r.component_size == size, r.doc_id
        assert r.dup_span_ppm == dup[r.doc_id], r.doc_id
        expect = ((1_000_000 // size) * (1_000_000 - dup[r.doc_id])) \
            // 1_000_000
        assert r.softdedup_weight_ppm == expect, r.doc_id
        assert 0 <= r.softdedup_weight_ppm <= 1_000_000
        saw_cluster |= size > 1
        saw_discount |= dup[r.doc_id] > 0
    assert saw_cluster and saw_discount  # fixture exercises both dials

    sampled = {
        r.doc_id: r for r in curation.softdedup_sample(spark, SF_CHECK).collect()
    }
    assert len(sampled) == total
    n_sel = sum(1 for r in sampled.values() if r.selected)
    assert 0 < n_sel < total
    for r in sampled.values():
        assert r.selected == (r.bucket < r.softdedup_weight_ppm)
    # expected mass: realized count within 10% of sum(weight)/1e6
    mass = sum(r.softdedup_weight_ppm for r in sampled.values()) / 1e6
    assert abs(n_sel - mass) <= 0.1 * total


def test_line_clean_idempotent(spark, tmp_path):
    """examples/corpus_curation.line_clean: the second line-dedup pass
    over the rewritten corpus cuts NOTHING (removal deletes whole
    lines and can never mint new ones — unlike span reassembly), and
    line accounting balances: surviving lines = n_lines - n_lines_cut
    everywhere. Run on a constructed multi-line corpus because the
    parquet fixtures are single-line."""
    from pyspark.sql import functions as F

    from examples.corpus_curation import line_clean

    rows = [
        (i, "\n".join(f"line {j % 6} of group {i % 4}" for j in range(5)))
        for i in range(24)
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id bigint, text string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )

    rewritten, recheck = line_clean(spark, d)
    rw = rewritten.collect()
    assert sum(r.n_lines_cut for r in rw) > 0  # first pass cuts
    for r in rw:  # accounting: kept lines == n_lines - cut
        kept = len(r.text_deduped.split("\n")) if r.text_deduped else 0
        # a fully-cut doc rebuilds to '' (one empty line on re-split
        # only when the doc had surviving empties — here none)
        expect = r.n_lines - r.n_lines_cut
        assert kept == expect or (expect == 0 and r.text_deduped == "")
    assert recheck.agg(F.sum("n_lines_cut")).first()[0] == 0  # idempotent


def test_c4_gate_report_accounting(spark):
    """examples/corpus_curation.c4_gate_report: the per-lang rollup
    ties out against corpus_c4_clean (doc totals partition the corpus;
    kept lines never exceed lines), and on THESE punctuation-free
    fixtures the report shows the all-dropped verdict the operator's
    fixture-honesty note documents."""
    from tests.conftest import SF_SMOKE

    from examples.corpus_curation import c4_gate_report
    from projetbigdata_spark.sources.catalog import load_table

    rep = c4_gate_report(spark, SF_SMOKE).collect()
    total = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rep) == total
    for r in rep:
        assert 0 <= r.n_kept_lines <= r.n_lines
        assert r.n_kept_docs == 0  # punctuation-free fixture: all drop


def test_gopher_gate_report_accounting(spark):
    """examples/corpus_curation.gopher_gate_report: the per-lang
    rollup ties out against corpus_gopher_clean (doc totals partition
    the corpus; rule-pass counts bound kept counts), and on THESE
    fixtures the required-stop-word rule drops everything while the
    word-count rule splits the corpus — the report shows WHICH rule
    binds, which is its entire job."""
    from tests.conftest import SF_SMOKE

    from examples.corpus_curation import gopher_gate_report
    from projetbigdata_spark.sources.catalog import load_table

    rep = gopher_gate_report(spark, SF_SMOKE).collect()
    total = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rep) == total
    for r in rep:
        assert r.n_kept_docs <= min(r.n_wordcount_ok, r.n_required_ok)
        assert r.n_kept_docs == 0  # <2 required stop words: all drop
        assert 0 < r.mean_alpha_word_ppm <= 1_000_000
    # the word-count rule is the one the fixtures actually exercise
    assert 0 < sum(r.n_wordcount_ok for r in rep) < total


def test_gopher_full_filter_composition(spark, tmp_path):
    """examples/corpus_curation.gopher_full_filter: the joined verdict
    is exactly the AND of its two oracle-green inputs, doc totals
    partition the corpus, and on a constructed corpus both branches
    actually bind (a doc that passes quality but fails repetition,
    and one that fails quality but passes repetition)."""
    from pyspark.sql import functions as F

    from examples.corpus_curation import gopher_full_filter

    good = " ".join(["the", "with"] + [f"word{i:02d}" for i in range(78)])
    rows = [
        (0, good),                                # passes both
        (1, ("the with " * 40).strip()),          # quality ok, repetition NO
        (2, " ".join(f"t{i:03d}" for i in range(80))),  # repetition ok, quality NO (no required words)
        (3, None),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id bigint, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    got = {r.doc_id: r for r in gopher_full_filter(spark, d).collect()}
    assert len(got) == len(rows)
    for r in got.values():
        assert r.kept == (r.kept_quality and r.kept_repetition)
    assert got[0].kept
    assert got[1].kept_quality and not got[1].kept_repetition
    assert got[2].kept_repetition and not got[2].kept_quality
    assert not got[3].kept  # null text fails the word-count floor
