"""End-to-end LLM training-corpus curation — the north-star extension
families composed into ONE distributed dataflow:

    documents
      -> quality gate      (text_quality_scores: length / punctuation /
                            stopword-ratio thresholds)
      -> repetition gate   (text_repetition_scores: Gopher-rule
                            dup-word fraction + top-bigram share)
      -> exact dedup       (md5 content hash, keep lowest doc_id)
      -> near-dup dedup    (MinHash-estimate edges -> connected
                            components, keep component representative)
      -> split assignment  (deterministic md5-bucket train/val/test —
                            re-runs and engine changes never move a doc)
      -> eval decontamination (contamination_ngram_overlap: val/test
                            docs with >50% train 5-gram overlap dropped)
      -> sequence packing  (pack_assign: per-shard 2048-token packs)
      -> partitioned parquet sink (write.partitionBy("split"))
      + corpus mixture plan printed for the survivors (mix_plan_of)

    python examples/corpus_curation.py [sf_dir] [out_dir]

Every stage is one of the registered, oracle-checked operators; this
script only composes them. The whole flow is shuffle-bounded (hash agg
for exact dedup, banded LSH joins for near-dup, label propagation for
components, one window per packing shard), no driver collect anywhere
except the final summary counts. Integration-tested in
tests/test_curation_pipeline.py.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from projetbigdata_spark.operators.classifier import (  # noqa: E402
    corpus_quality_classifier_scores,
)
from projetbigdata_spark.operators.curation import (  # noqa: E402
    CURATE_MAX_DUP_WORD_FRAC,
    corpus_softdedup_sample,
    corpus_source_cap,
    dedup_lines,
    CURATE_MAX_EVAL_OVERLAP_PPM,
    CURATE_MAX_STOPWORD_RATIO,
    CURATE_MAX_TOP_BIGRAM_SHARE,
    CURATE_MIN_TOKENS,
    contamination_ngram_overlap,
    dedup_span_profile,
    dedup_span_removal,
    span_profile_of,
)
from projetbigdata_spark.operators.dedup import (  # noqa: E402
    dedup_components_minhash,
    dedup_exact,
)
from projetbigdata_spark.operators.packing import (  # noqa: E402
    mix_plan_of,
    pack_assign,
)
from projetbigdata_spark.operators.repetition import (  # noqa: E402
    text_repetition_scores,
)
from projetbigdata_spark.operators.sampling import split_col  # noqa: E402
from projetbigdata_spark.operators.textstats import (  # noqa: E402
    text_quality_scores,
)
from projetbigdata_spark.session import get_spark  # noqa: E402
from projetbigdata_spark.sources.catalog import load_table  # noqa: E402

# Gate ceilings are the SHARED definitions from operators/curation.py —
# the registered corpus_curate audit query uses the same constants, so
# `corpus_curate(...).where("kept")` always reproduces this pipeline's
# survivor set.
MIN_WORDS = CURATE_MIN_TOKENS
MAX_STOPWORD_RATIO = CURATE_MAX_STOPWORD_RATIO
MAX_DUP_WORD_FRAC = CURATE_MAX_DUP_WORD_FRAC  # Gopher-style ceilings
MAX_TOP_BIGRAM_SHARE = CURATE_MAX_TOP_BIGRAM_SHARE
MAX_EVAL_OVERLAP_PPM = CURATE_MAX_EVAL_OVERLAP_PPM  # eval doc dropped
# if >50% of its 5-grams appear in train (GPT-3-style ceiling)


def span_clean(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The profile → removal → re-profile loop dedup_span_removal's
    docstring promises (exact-substring dedup, Lee et al. 2021, run as
    an auditable pass): PROFILE the corpus's duplicated-span rate
    (is the pass worth running?), REMOVE every token covered by a
    10-token window already seen in an earlier document, then
    RE-PROFILE the rewritten corpus to verify the duplication is gone
    (n_dup_spans falls to ~0 — not exactly 0 in general, because
    reassembly makes previously-distant tokens adjacent and can mint
    new windows; the fixture measures 0). Returns (before_profile,
    rewritten, after_profile); token accounting is pinned in
    tests/test_curation_pipeline.py."""
    before = dedup_span_profile(spark, sf_dir)
    rewritten = dedup_span_removal(spark, sf_dir).localCheckpoint(
        eager=False
    )  # consumed by the re-profile AND the caller's accounting
    after = span_profile_of(
        rewritten.select("doc_id", F.col("text_deduped").alias("text"))
    )
    return before, rewritten, after


def line_clean(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The line-granularity cut → re-cut loop (r9, the CCNet unit):
    REWRITE every doc by dropping lines already seen in an earlier
    document (dedup_lines), then run the SAME pass over the rewritten
    corpus — the second pass cuts nothing (line dedup is idempotent:
    removal can only delete whole lines, never mint new ones, unlike
    span reassembly which can make distant tokens adjacent). Returns
    (rewritten, recheck); idempotence is pinned in
    tests/test_curation_pipeline.py."""
    from projetbigdata_spark.operators.curation import line_dedup_frame

    rewritten = dedup_lines(spark, sf_dir).localCheckpoint(eager=False)
    recheck = line_dedup_frame(
        rewritten.select("doc_id", F.col("text_deduped").alias("text"))
    )
    return rewritten, recheck


def c4_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 rule pass as a pre-gate audit (r9 second wave): per-lang
    doc and kept-line accounting of corpus_c4_clean — the report a
    data team reads to decide whether the rule recipe even applies to
    their corpus BEFORE wiring it in front of the shuffling stages (on
    these synthetic punctuation-free fixtures it would drop everything,
    which is exactly what this report makes visible — the operator's
    fixture-honesty note made executable)."""
    from projetbigdata_spark.operators.curation import corpus_c4_clean
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        corpus_c4_clean(spark, sf_dir)
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("int")).alias("n_kept_docs"),
            F.sum("n_lines").alias("n_lines"),
            F.sum("n_kept_lines").alias("n_kept_lines"),
        )
        .orderBy("lang")
    )


def gopher_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher A1.1 rule pass as the same pre-gate audit shape as
    c4_gate_report (r9 third wave): per-lang doc accounting plus the
    mean of each exact ppm ratio, so a data team sees WHICH rule
    binds on their corpus (on these fixtures the required-stop-word
    rule drops everything — the operator's fixture-honesty note made
    executable; word count splits roughly in half at the 50 floor)."""
    from projetbigdata_spark.operators.repetition import corpus_gopher_clean
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        corpus_gopher_clean(spark, sf_dir)
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("int")).alias("n_kept_docs"),
            F.sum(
                (F.col("n_words") >= 50).cast("int")
            ).alias("n_wordcount_ok"),
            F.sum(
                (F.col("n_required") >= 2).cast("int")
            ).alias("n_required_ok"),
            F.avg("alpha_word_ppm").alias("mean_alpha_word_ppm"),
        )
        .orderBy("lang")
    )


def gopher_full_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE published Gopher document filter (r9 third wave):
    quality rules (corpus_gopher_clean) AND repetition ceilings
    (corpus_gopher_repetition_clean) joined into one per-doc verdict —
    both inputs are independently oracle-green registered queries, so
    this composition can never drift from the driver-checked surface
    (the softdedup_sample delegation principle). A doc survives only
    if BOTH rule families pass; the two kept flags are kept separate
    so the gate report can say which family binds."""
    from projetbigdata_spark.operators.repetition import (
        corpus_gopher_clean,
        corpus_gopher_repetition_clean,
    )

    q = corpus_gopher_clean(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("kept_quality")
    )
    r = corpus_gopher_repetition_clean(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        F.col("kept").alias("kept_repetition"),
    )
    return r.join(q, "doc_id").select(
        "doc_id",
        "n_tokens",
        "kept_quality",
        "kept_repetition",
        (F.col("kept_quality") & F.col("kept_repetition")).alias("kept"),
    )


def softdedup_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup→sampling loop closed (r8): corpus_softdedup_weights'
    per-doc ppm weights become acceptance probabilities through the
    SAME salted-bucket idiom corpus_dsir_sample uses. Delegates to
    the registered corpus_softdedup_sample (full-oracle surface) so
    the example and the driver row can never drift."""
    return corpus_softdedup_sample(spark, sf_dir)


def curate(
    spark: SparkSession, sf_dir: str, span_removal: bool = False
) -> DataFrame:
    """The curated corpus: (doc_id, text, lang, split). Deterministic —
    same input always yields byte-identical output.

    span_removal=True inserts the exact-substring pass between the
    dedup and split stages: surviving documents get their text
    REWRITTEN (duplicated 10-token windows cut, keep-first at doc
    granularity) instead of being dropped — the stage that edits
    documents rather than selecting them. The cut is computed on the
    FULL corpus (the decontamination superset convention: keep-first
    against all earlier docs, not just survivors — retuning an
    upstream gate can never resurrect a duplicated span), and the doc
    set is unchanged by construction."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gate — keep docs long enough and not stopword soup
    quality = text_quality_scores(spark, sf_dir).select(
        "doc_id", "n_tokens", "stop_ratio"
    )
    kept = (
        docs.join(quality, "doc_id")
        .where(
            (F.col("n_tokens") >= MIN_WORDS)
            & (F.col("stop_ratio") <= MAX_STOPWORD_RATIO)
        )
        .select("doc_id", "text", "lang")
    )

    # 1b. repetition gate — drop template/boilerplate docs (Gopher rules)
    repetition = text_repetition_scores(spark, sf_dir).select(
        "doc_id", "dup_word_frac", "top_bigram_share"
    )
    kept = (
        kept.join(repetition, "doc_id")
        .where(
            (F.col("dup_word_frac") <= MAX_DUP_WORD_FRAC)
            & (F.col("top_bigram_share") <= MAX_TOP_BIGRAM_SHARE)
        )
        .select("doc_id", "text", "lang")
    )

    # 2. exact dedup — dedup_exact yields (content_md5, keep_id);
    # keep each hash group's keeper
    exact = dedup_exact(spark, sf_dir).select("content_md5", "keep_id")
    kept = (
        kept.withColumn("content_md5", F.md5(F.lower("text")))
        .join(exact, "content_md5")
        .where(F.col("doc_id") == F.col("keep_id"))
        .drop("content_md5", "keep_id")
    )

    # 3. near-dup dedup — minhash-estimate components; keep each
    # component's representative (min doc_id = component_id). Docs in
    # no component have no near-dups and survive (left_anti on losers).
    comp = dedup_components_minhash(spark, sf_dir)
    losers = comp.where(F.col("doc_id") != F.col("component_id")).select(
        "doc_id"
    )
    kept = kept.join(losers, "doc_id", "left_anti")

    # 3b. (opt-in) exact-substring span removal — rewrite survivor
    # text with cross-doc duplicated windows cut; drops no documents
    if span_removal:
        rewritten = dedup_span_removal(spark, sf_dir).select(
            "doc_id", F.col("text_deduped").alias("text")
        )
        kept = (
            kept.drop("text")
            .join(rewritten, "doc_id")
            .select("doc_id", "text", "lang")
        )

    # 4. deterministic split assignment (80/10/10 by md5 bucket —
    # the shared split_col definition, so step 4b can never drift)
    kept = kept.withColumn("split", split_col())

    # 4b. eval decontamination — drop val/test survivors whose n-gram
    # overlap with train exceeds the ceiling (a contaminated eval doc
    # inflates held-out metrics; train rows are never dropped here).
    # The train-gram universe is deliberately computed on the RAW
    # corpus, not the step-1..3 survivors: a conservative SUPERSET.
    # An eval doc overlapping a train doc that dedup later dropped
    # still overlaps that doc's kept near-duplicate in practice, and
    # raw-side grams make the check independent of upstream gate
    # tuning (retuning a quality threshold can never silently
    # re-contaminate eval). Cost: a few over-dropped eval docs whose
    # only overlap was with quality-rejected train text (ADVICE r3).
    contaminated = (
        contamination_ngram_overlap(spark, sf_dir)
        .where(F.col("overlap_ppm") > MAX_EVAL_OVERLAP_PPM)
        .select("doc_id")
    )
    kept = kept.join(contaminated, "doc_id", "left_anti")

    # 5. sequence packing over the survivors — every doc gets its
    # training-sequence slot (per-shard, no global cumsum)
    packs = pack_assign(kept.select("doc_id", "text")).select(
        "doc_id", "pack_id", "pack_offset"
    )
    return kept.join(packs, "doc_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark("corpus-curation")
    spark.sparkContext.setLogLevel("ERROR")

    curated = curate(spark, sf_dir)
    curated.write.mode("overwrite").partitionBy("split").parquet(out)

    total = load_table(spark, sf_dir, "documents").count()
    written = spark.read.parquet(out)
    summary = written.groupBy("split").agg(
        F.count("*").alias("n"), F.countDistinct("pack_id").alias("n_packs")
    )
    print(f"input docs: {total}")
    for r in summary.orderBy("split").collect():
        print(f"  {r.split}: {r.n} docs in {r.n_packs} packs")
    before, rewritten, after = span_clean(spark, sf_dir)
    b = before.agg(F.sum("n_dup_spans").alias("d")).first().d
    c = rewritten.agg(F.sum("n_cut").alias("c")).first().c
    a = after.agg(F.sum("n_dup_spans").alias("d")).first().d
    print(
        f"span clean: {b} duplicated spans profiled -> {c} tokens cut"
        f" -> {a} duplicated spans remain"
    )
    lc, lc_re = line_clean(spark, sf_dir)
    lc1 = lc.agg(F.sum("n_lines_cut").alias("c")).first().c
    lc2 = lc_re.agg(F.sum("n_lines_cut").alias("c")).first().c
    print(f"line clean: {lc1} duplicated lines cut -> recheck cuts {lc2}")
    c4_gate_report(spark, sf_dir).show(truncate=False)
    gopher_gate_report(spark, sf_dir).show(truncate=False)
    soft = softdedup_sample(spark, sf_dir)
    s = soft.agg(
        F.count("*").alias("n"),
        F.sum(F.col("selected").cast("int")).alias("sel"),
        F.sum("softdedup_weight_ppm").alias("mass"),
    ).first()
    print(
        f"softdedup: {s.sel}/{s.n} docs sampled "
        f"(expected mass {s.mass / 1_000_000:.1f} docs)"
    )
    caps = corpus_source_cap(spark, sf_dir)
    cp = caps.agg(
        F.count("*").alias("n"),
        F.sum(F.col("selected").cast("int")).alias("sel"),
        F.countDistinct(
            F.when(F.col("accept_ppm") < 1_000_000, F.col("source"))
        ).alias("n_capped_sources"),
    ).first()
    print(
        f"source cap: {cp.sel}/{cp.n} docs pass "
        f"({cp.n_capped_sources} sources thinned toward the share cap)"
    )
    qc = corpus_quality_classifier_scores(spark, sf_dir)
    k = qc.agg(
        F.count("*").alias("n"),
        F.sum(F.col("keep").cast("int")).alias("keep"),
    ).first()
    print(f"quality classifier: {k.keep}/{k.n} docs keep (logit >= 0)")
    print("mixture plan over survivors:")
    for r in mix_plan_of(written).orderBy("lang").collect():
        print(
            f"  {r.lang}: {r.tokens} tokens, natural {r.natural_share:.3f} "
            f"-> target {r.target_share:.2f} ({r.epochs:.2f} epochs, {r.mode})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
