"""End-to-end training-data SELECTION — the r5 selection tier composed
into ONE distributed dataflow, downstream of curation (which decides
what is CLEAN; this decides what the model should SEE MORE OF):

    documents
      -> fluency gate      (text_bigram_prob_score: corpus bigram-LM
                            continuation probability above a floor)
      -> target affinity   (corpus_dsir_weights: DSIR importance ratio
                            vs the lang='en' target slice)
      -> importance sample (corpus_dsir_sample: capped scaled
                            acceptance, salted md5 buckets — the
                            deterministic resampling verdict)
      -> mixture realization (corpus_temperature_mix: T=2 temperature
                            epochs over the SELECTED docs' languages)
      -> selection report  (per-lang kept/dropped, token mass, mean
                            weight — the audit a data team reviews
                            before training)

    python examples/data_selection.py [sf_dir] [out_dir]

Every stage is a registered, oracle-checked operator; this script only
composes them (joins on doc_id — all gates anchor on the full document
set, so composition is never row-multiplying). No driver collect
except the final summary. Integration-tested in
tests/test_selection_pipeline.py.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from projetbigdata_spark.operators.selection import (  # noqa: E402
    corpus_dsir_sample,
    text_bigram_prob_score,
)

# fluency floor: ~the fixture corpus's median continuation probability
# (its near-i.i.d. synthetic tokens sit around 1/|vocab| ≈ 3.4%) so the
# gate is demonstrably live. A deployment calibrates this off the
# corpus quantiles exactly like corpus_curate's calibrated thresholds —
# real text lands much higher than an i.i.d. stream.
MIN_BIGRAM_PPM = 34_000


def select_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per document: fluency score, DSIR verdict columns, and
    the composed `selected` flag (fluent AND importance-accepted)."""
    flu = text_bigram_prob_score(spark, sf_dir)
    dsir = corpus_dsir_sample(spark, sf_dir).withColumnRenamed(
        "selected", "dsir_accept"
    )
    return (
        flu.join(dsir, "doc_id")
        .withColumn(
            "fluent",
            F.coalesce(
                F.col("mean_bigram_ppm") >= MIN_BIGRAM_PPM, F.lit(False)
            ),
        )
        .withColumn("selected", F.col("fluent") & F.col("dsir_accept"))
    )


def selection_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language selection audit over the composed verdicts."""
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        select_corpus(spark, sf_dir)
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("selected").cast("int")).alias("n_selected"),
            F.sum(F.when(F.col("selected"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("tokens_selected"),
            F.avg("dsir_weight_ppm").alias("mean_weight_ppm"),
        )
        .orderBy("lang")
    )


def ccnet_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet cut crossed with the selection verdicts: per (lang,
    ppl_bucket), how many docs the head/middle/tail terciles hold, how
    many the composed CCNet verdict keeps, and how many of them the
    DSIR+fluency composition would ALSO keep — the two-filter
    agreement audit a data team reads before choosing which gate (or
    intersection) feeds training. DELEGATES to the registered
    corpus_ccnet_select (r10 — the end-to-end keep verdict is engine
    surface now, not example plumbing); both inputs anchor the full
    doc set, so the join is 1:1 and the report partitions the
    corpus."""
    from projetbigdata_spark.operators.selection import corpus_ccnet_select

    ccnet = corpus_ccnet_select(spark, sf_dir)
    return (
        ccnet.join(
            select_corpus(spark, sf_dir).select("doc_id", "selected"),
            "doc_id",
        )
        .groupBy("lang", "ppl_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("int")).alias("n_ccnet_kept"),
            F.sum(F.col("selected").cast("int")).alias("n_also_selected"),
        )
        .orderBy("lang", "ppl_bucket")
    )


def ccnet_key_diff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-key vs guessed-key CCNet verdicts side by side (r11,
    VERDICT r10 item 3's audit hook): per (lang, lang_guess) cell, how
    many docs each variant keeps and how many verdicts flip — the
    audit a data team reads BEFORE switching the pipeline to the
    deployment key (a crawl with no metadata lang), because every flip
    is a doc whose cap or tercile verdict depends on which key
    partitioned it. Both variants anchor the full doc set, so the
    join is 1:1 and the cells partition the corpus."""
    from projetbigdata_spark.operators.selection import (
        corpus_ccnet_select,
        corpus_ccnet_select_guessed,
    )

    meta = corpus_ccnet_select(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("kept_meta")
    )
    guessed = corpus_ccnet_select_guessed(spark, sf_dir)
    return (
        guessed.join(meta, "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept_meta").cast("int")).alias("n_kept_meta"),
            F.sum(F.col("kept").cast("int")).alias("n_kept_guessed"),
            F.sum(
                (F.col("kept") != F.col("kept_meta")).cast("int")
            ).alias("n_flipped"),
        )
        .orderBy("lang", "lang_guess")
    )


def ccnet_key_diff_report_multi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The flip audit at FULL key granularity (r12, VERDICT r11
    item 2): metadata-key vs MULTI-CLASS guessed-key verdicts per
    (lang, lang_guess) cell — with a 5-class guesser the cell grid is
    the actual confusion matrix, so the audit shows not just HOW MANY
    verdicts flip but along which misclassification edges (e.g. docs
    whose metadata says 'fr' but score 'de' sit in the fr→de cell
    with their flip count). Same 1:1 anchored join, same salt, so
    every flip is attributable to the key."""
    from projetbigdata_spark.operators.selection import (
        corpus_ccnet_select,
        corpus_ccnet_select_guessed_multi,
    )

    meta = corpus_ccnet_select(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("kept_meta")
    )
    guessed = corpus_ccnet_select_guessed_multi(spark, sf_dir)
    return (
        guessed.join(meta, "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept_meta").cast("int")).alias("n_kept_meta"),
            F.sum(F.col("kept").cast("int")).alias("n_kept_guessed"),
            F.sum(
                (F.col("kept") != F.col("kept_meta")).cast("int")
            ).alias("n_flipped"),
        )
        .orderBy("lang", "lang_guess")
    )


def main() -> int:
    from projetbigdata_spark.operators.packing import corpus_temperature_mix
    from projetbigdata_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/data_selection_out"
    spark = get_spark("data-selection")

    verdicts = select_corpus(spark, sf_dir)
    verdicts.write.mode("overwrite").parquet(f"{out_dir}/verdicts.parquet")

    report = selection_report(spark, sf_dir)
    report.show(truncate=False)
    ccnet_report(spark, sf_dir).show(truncate=False)
    ccnet_key_diff_report(spark, sf_dir).show(truncate=False)
    ccnet_key_diff_report_multi(spark, sf_dir).show(30, truncate=False)
    mix = corpus_temperature_mix(spark, sf_dir)
    mix.show(truncate=False)

    kept = verdicts.where("selected").count()
    total = verdicts.count()
    print(f"selected {kept}/{total} docs -> {out_dir}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
