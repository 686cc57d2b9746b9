"""Quality-CLASSIFIER scoring over `documents` — the GPT-3/CCNet-style
learned quality filter as a first-class relational operator
(VERDICT r7 item 2).

The reference's own LR flow (main_reglogit.py:90-99: per-doc term
features -> pyspark.ml LogisticRegression -> per-doc scores) re-aimed
at curation, split the way this repo splits every estimator surface:

  - the FIT (ml/pipeline.quality_classifier_fit, registered as the
    rows-only ml_quality_classifier_fit) trains LR on the hashing-
    trick signed counts with the DSIR target convention as the label
    (lang == 'en' target slice vs raw — Brown et al. 2020 §A /
    Wenzek et al. 2019 CCNet: discriminate target-like from raw, keep
    or weight by the score);
  - the SCORING (this module) applies a FROZEN coefficient vector —
    pure integer arithmetic both engines recompute exactly, the same
    way the k-means oracles unroll frozen Lloyd iterations. The
    constants below are the committed output of
    `python tools/fit_quality_classifier.py` (sf0.01, seedless LBFGS
    — deterministic given the fixed fixture; provenance in that
    script's docstring).

Scale posture: scoring a 100 TB corpus with a linear model over
hashed features is ONE corpus pass — tokenize -> hash -> per-(doc,
bucket) hash-agg (text_feature_hashing's plan, shuffle ≤
|docs|·HASH_BUCKETS skinny rows) -> broadcast join against the
≤HASH_BUCKETS-row coefficient table -> per-doc sum. No vocabulary, no
model server, no Python in the hot path; the fitted model ships as a
64-row table. The verdict frame (doc_id, lang, logit_micros, keep)
anchors the FULL corpus (left join — a doc with no tokens scores the
intercept alone) and composes with corpus_curate /
corpus_sample_assign exactly like the dedup keep frames.

Arithmetic: logit_micros = intercept_micros + Σ_b signed_sum(b) ·
coef_micros(b), all integers. Products reach ~1e12 at fixture doc
lengths and ~|doc_tokens|·1e6 in general, so the per-doc sum is
widened through DECIMAL(38,0) / HUGEINT like every ppm accumulator in
this repo; keep = logit_micros >= 0 (p >= 0.5 under the logistic
link, spelled on the exact-integer logit so no exp()/libm enters the
hash-checked surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.operators.features import FEATURE_HASHING_SQL
from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_table

# Frozen output of `python tools/fit_quality_classifier.py` on
# /root/testdata/sf0.01 (500 docs, 146 predicted target-like).
# Buckets absent from the dict carry a zero coefficient (L2-shrunk
# below 1 micro).
QC_INTERCEPT_MICROS = -208583
QC_COEF_MICROS = {
    0: 53083,
    4: -142297,
    7: -132234,
    9: -9275,
    10: 52088,
    17: -31589,
    18: 78531,
    23: 105310,
    24: 180232,
    25: 58730,
    29: -1997,
    30: -374904,
    33: -70992,
    34: -10527,
    36: 25270,
    41: -32927,
    42: -74445,
    44: 36375,
    45: 84652,
    46: -125472,
    51: 41192,
    52: 91984,
    58: -67537,
    63: 131008,
}


def quality_scores_of(
    spark: SparkSession,
    docs: DataFrame,
    coef_micros: dict[int, int] | None = None,
    intercept_micros: int | None = None,
) -> DataFrame:
    """Frame-level scoring core — any (doc_id, lang, text) frame in,
    the verdict frame out — shared by the registered corpus query and
    the streaming ingest twin (quality_scores_stream), so batch and
    per-micro-batch verdicts can never drift. The model is stateless
    (a frozen 64-row coefficient table), which is why the streaming
    twin needs no state store: scoring a batch IS the batch query.

    The width repartition rides ONLY the tokenize/hash branch (the
    compute-heavy explode, load_documents_parallel's rationale); the
    anchor branch reads the frame as-is — a round-robin exchange buys
    the skinny (doc_id, lang) projection nothing.

    coef_micros/intercept_micros default to the frozen registered
    model; the quality-lane artifacts (tests/golden/quality_lane —
    r10, VERDICT r9 item 4) pass their own committed fit so the lane
    test exercises the IDENTICAL scoring expressions."""
    from projetbigdata_spark.operators.features import hashed_features_of

    if coef_micros is None:
        coef_micros = QC_COEF_MICROS
    if intercept_micros is None:
        intercept_micros = QC_INTERCEPT_MICROS
    coef = F.broadcast(
        spark.createDataFrame(
            sorted(coef_micros.items()),
            "bucket int, coef_micros bigint",
        )
    )
    dot = (
        hashed_features_of(
            docs.repartition(spark.sparkContext.defaultParallelism)
        )
        .join(coef, "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(
                (F.col("signed_sum") * F.col("coef_micros")).cast(
                    "decimal(38,0)"
                )
            ).alias("dot")
        )
    )
    return docs.select("doc_id", "lang").join(dot, "doc_id", "left").select(
        "doc_id",
        "lang",
        (
            F.lit(intercept_micros)
            + F.coalesce(F.col("dot"), F.lit(0).cast("decimal(38,0)"))
        )
        .cast("bigint")
        .alias("logit_micros"),
        (
            F.lit(intercept_micros)
            + F.coalesce(F.col("dot"), F.lit(0).cast("decimal(38,0)"))
            >= 0
        ).alias("keep"),
    )


def corpus_quality_classifier_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Score every document with the frozen quality classifier:
    (doc_id, lang, logit_micros, keep) — the keep/weight verdict
    frame a curation pipeline thresholds or resamples on. One corpus
    pass + a broadcast join against the ≤HASH_BUCKETS-row coefficient
    table; full-corpus anchor (no-token docs score the intercept)."""
    tune(spark)
    # bare scan: quality_scores_of repartitions its hash branch itself
    return quality_scores_of(spark, load_table(spark, sf_dir, "documents"))


def _coef_values_sql() -> str:
    return ", ".join(
        f"({b}, {c})" for b, c in sorted(QC_COEF_MICROS.items())
    )


QUALITY_CLASSIFIER_SQL = f"""
WITH fh AS ({FEATURE_HASHING_SQL}),
coef(bucket, coef_micros) AS (VALUES {_coef_values_sql()}),
dot AS (
    SELECT fh.doc_id,
           sum(CAST(fh.signed_sum AS HUGEINT) * coef.coef_micros) AS dot
    FROM fh JOIN coef USING (bucket)
    GROUP BY 1
)
SELECT d.doc_id,
       d.lang,
       CAST({QC_INTERCEPT_MICROS} + coalesce(dot.dot, 0) AS BIGINT)
           AS logit_micros,
       ({QC_INTERCEPT_MICROS} + coalesce(dot.dot, 0)) >= 0 AS keep
FROM documents d
LEFT JOIN dot ON d.doc_id = dot.doc_id
"""


def corpus_quality_classifier_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EVALUATE the frozen quality classifier against its own training
    convention — the audit a curation team reads before trusting a
    learned filter's keep verdicts: per-language rows of
    (lang, is_target, n_docs, n_keep, keep_rate_ppm) where is_target
    is the DSIR target-vs-raw label (lang == DSIR_TARGET_LANG). The target
    row's keep_rate is the classifier's recall on target-like docs;
    any other row's keep_rate is its per-language false-positive rate
    — the full confusion matrix is a trivial rollup of this frame.
    Exact integers throughout (keep_rate_ppm = 1e6·n_keep div n_docs),
    and the scoring subtree is the one-pass frozen-coefficient plan,
    so the whole audit costs one corpus pass + a |langs|-row agg.
    Closes the fit → freeze → score → AUDIT loop the way
    ann_recall_report closes index-build → search."""
    tune(spark)
    from projetbigdata_spark.operators.selection import DSIR_TARGET_LANG

    scores = corpus_quality_classifier_scores(spark, sf_dir)
    return (
        scores.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("keep").cast("bigint")).alias("n_keep"),
        )
        .select(
            "lang",
            (F.col("lang") == DSIR_TARGET_LANG).alias("is_target"),
            "n_docs",
            "n_keep",
            F.expr("(1000000 * n_keep) div n_docs")
            .cast("bigint")
            .alias("keep_rate_ppm"),
        )
    )


def _classifier_report_sql() -> str:
    from projetbigdata_spark.operators.selection import DSIR_TARGET_LANG

    return f"""
WITH s AS ({QUALITY_CLASSIFIER_SQL})
SELECT lang,
       lang = '{DSIR_TARGET_LANG}' AS is_target,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST((1000000 * sum(CASE WHEN keep THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS keep_rate_ppm
FROM s
GROUP BY lang
"""


QS_RATE_PPM = 250_000  # keep the top ~25% of the corpus by quality
QS_BIN = 65_536  # logit-histogram bin width in micros (~0.066 logits)
QS_BIAS = 1 << 60  # shift logits non-negative so div == floor-div on
# BOTH engines (Spark `div` truncates toward zero on negatives while
# DuckDB `//` floors — the bias sidesteps the divergence entirely).
# Bound: |logit_micros| ≤ |doc_tokens| · max|coef_micros| ≈ 1e6·|doc_tokens|
# for the frozen table's ≤1.0-logit coefficients, so 2^60 (~1.15e18)
# keeps the operand non-negative up to ~1.15e12 tokens per doc — far
# beyond any real document (a 2^40 bias flipped sign at ~1.1M tokens,
# reachable at 100 TB; ADVICE r8). The shifted operand still fits the
# scorer's DECIMAL(38,0) / DuckDB HUGEINT widening with ~19 digits of
# headroom, and int64 bins stay ~2^44.


def corpus_quality_calibration_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The frozen classifier's CALIBRATION CURVE — the reliability
    audit behind per-lang recall/FP (corpus_quality_classifier_report
    tells you HOW MUCH the filter keeps; this tells you whether the
    SCORE AXIS means anything): per logit-histogram bin (the
    corpus_quality_select binning — QS_BIN-micro bins, QS_BIAS-shifted
    so div == floor-div on both engines), how many docs land there and
    what fraction carries the DSIR target label. A well-calibrated
    quality score shows target_ppm rising with the bin; a flat curve
    means the classifier is majority-class guessing (exactly what the
    HASH_BUCKETS dial study documents at fixture scale — this report
    is that finding as a standing, oracle-checked surface a deployment
    re-reads after every re-fit). The fixture-honesty note is
    FALSIFIED, not just stated, since r10: the committed quality lane
    (tests/golden/quality_lane + tools/gen_quality_lane.py) plants a
    graded signal, fits on it, and pins a sloped monotone curve
    through this exact binning (calibration_curve_of) — so a flat
    fixture curve and a broken binning are now distinguishable.

    Columns: (bin, bin_lo_micros, n_docs, n_target, target_ppm) —
    bin_lo_micros = bin·QS_BIN − QS_BIAS is the bin's inclusive lower
    logit edge, so the frame plots directly. Cost: the one-pass scorer
    plan + a ≤|bins|-row rollup (bins are occupied-only)."""
    tune(spark)
    from projetbigdata_spark.operators.selection import DSIR_TARGET_LANG

    return calibration_curve_of(
        corpus_quality_classifier_scores(spark, sf_dir), DSIR_TARGET_LANG
    )


def calibration_curve_of(scores: DataFrame, target_lang: str) -> DataFrame:
    """Frame-level calibration binning — any (lang, logit_micros)
    verdict frame in, the (bin, bin_lo_micros, n_docs, n_target,
    target_ppm) curve out — factored (the quality_scores_of
    convention) so the registered report and the committed
    quality-lane test share one binning implementation."""
    return (
        scores.select(
            F.expr(f"(logit_micros + {QS_BIAS}) div {QS_BIN}").alias("bin"),
            (F.col("lang") == target_lang)
            .cast("int")
            .alias("is_target"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("is_target").cast("bigint").alias("n_target"),
        )
        .select(
            "bin",
            F.expr(f"bin * {QS_BIN} - CAST({QS_BIAS} AS BIGINT)")
            .cast("bigint")
            .alias("bin_lo_micros"),
            "n_docs",
            "n_target",
            F.expr("(1000000 * n_target) div n_docs")
            .cast("bigint")
            .alias("target_ppm"),
        )
    )


def _calibration_report_sql() -> str:
    from projetbigdata_spark.operators.selection import DSIR_TARGET_LANG

    return f"""
WITH s AS ({QUALITY_CLASSIFIER_SQL}),
b AS (
    SELECT (logit_micros + {QS_BIAS}) // {QS_BIN} AS bin,
           CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END
               AS is_target
    FROM s
)
SELECT bin,
       CAST(bin * {QS_BIN} - {QS_BIAS} AS BIGINT) AS bin_lo_micros,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_target) AS BIGINT) AS n_target,
       CAST((1000000 * sum(is_target)) // count(*) AS BIGINT)
           AS target_ppm
FROM b
GROUP BY bin
"""


def corpus_quality_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the TOP ~QS_RATE_PPM of the corpus by learned quality —
    the GPT-3-style "train on the best-scoring slice" selection made
    executable: every doc's frozen-classifier logit falls into a
    QS_BIN-micro histogram bin, and the corpus keeps all docs at or
    above the LARGEST bin where the top-down cumulative count first
    reaches budget = ceil(rate·n). Overshoot is bounded by one bin's
    population and auditable from the output (the threshold bin is a
    column); re-runs and engine changes never flip a verdict because
    the rule is pure arithmetic on the logit.

    This is top-ρ selection WITHOUT a corpus-wide sort (the naive
    recipe — rank all docs by score, cut at ρ·n — is a corpus-sized
    skewed sort at 100 TB): the cumulative scan runs over the logit
    HISTOGRAM, ≤ |bins| rows at any corpus size, so beyond the scorer
    the added cost is one |bins|-row window and a broadcast 1-row
    threshold. The same histogram-threshold trick
    corpus_token_budget_sample uses for budget fill and
    corpus_quality_quantiles uses for percentiles, pointed at
    quality selection. Output: (doc_id, lang, logit_micros, bin,
    threshold_bin, selected) — the verdict frame that composes with
    corpus_curate / corpus_sample_assign like every keep frame."""
    tune(spark)
    from pyspark.sql.window import Window

    scores = quality_scores_of(  # bare scan: see scores note above
        spark, load_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=False)  # consumed by the histogram AND
    # the verdict projection — one scoring pass, not two
    binned = scores.select(
        "doc_id",
        "lang",
        "logit_micros",
        F.expr(f"(logit_micros + {QS_BIAS}) div {QS_BIN}").alias("bin"),
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    tot = hist.agg(F.sum("c").cast("bigint").alias("n"))
    thresh = (
        cum.crossJoin(F.broadcast(tot))
        .where(
            F.col("cum")
            >= F.expr(f"(n * {QS_RATE_PPM} + 999999) div 1000000")
        )
        .agg(F.max("bin").alias("t_bin"))
    )
    return binned.crossJoin(F.broadcast(thresh)).select(
        "doc_id",
        "lang",
        "logit_micros",
        F.col("bin").cast("bigint").alias("bin"),
        F.col("t_bin").cast("bigint").alias("threshold_bin"),
        F.coalesce(F.col("bin") >= F.col("t_bin"), F.lit(False)).alias(
            "selected"
        ),
    )


QUALITY_SELECT_SQL = f"""
WITH s AS ({QUALITY_CLASSIFIER_SQL}),
b AS (
    SELECT doc_id, lang, logit_micros,
           (logit_micros + {QS_BIAS}) // {QS_BIN} AS bin
    FROM s
),
hist AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
cum AS (
    SELECT bin,
           sum(c) OVER (ORDER BY bin DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum
    FROM hist
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
th AS (
    SELECT max(bin) AS t_bin
    FROM cum, tot
    WHERE cum >= (n * {QS_RATE_PPM} + 999999) // 1000000
)
SELECT b.doc_id, b.lang, b.logit_micros,
       CAST(b.bin AS BIGINT) AS bin,
       CAST(th.t_bin AS BIGINT) AS threshold_bin,
       coalesce(b.bin >= th.t_bin, FALSE) AS selected
FROM b, th
"""


def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE canonical selection — dedup_keep_canonical with
    the classifier in the loop: instead of keeping the min-id member
    of each near-dup component (an arbitrary tie-break), keep the
    member the frozen quality classifier scores HIGHEST (doc_id
    ascending as the deterministic tie-break) — what production
    pipelines actually do when collapsing near-dup clusters (CCNet
    keeps the best-perplexity member, not the first-crawled one).
    Output is the same full-corpus verdict frame as
    dedup_keep_canonical: (doc_id, canonical_id, keep, logit_micros),
    one row per document, keep iff the doc IS its cluster's best (or
    is unclustered).

    Plan: the component labels (verified-Jaccard via the exact-clone
    collapse tier) equi-join the scores on doc_id; the per-cluster
    argmax is a window over component_id — near-dup clusters are
    bounded cliques after the collapse, so the window partitions are
    small at any corpus size and the shuffle key is the cluster id,
    never the corpus text. The scores frame is plan-barriered: it
    feeds both the argmax and each doc's own logit column."""
    from projetbigdata_spark.operators.dedup import (
        dedup_components_verified_prefiltered,
    )

    tune(spark)
    # doc_id-only anchor scan: no per-row compute, so the bare scan
    # (no width repartition) is right
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    scores = (
        corpus_quality_classifier_scores(spark, sf_dir)
        .select("doc_id", "logit_micros")
        .localCheckpoint(eager=False)
    )
    # the component labels feed two consumers (the argmax join and the
    # full-corpus anchor) but are NOT barriered: the two subplans are
    # identical, so ReuseExchange canonicalizes them inside the one
    # query — measured, a localCheckpoint here is a net LOSS (sf0.01
    # 4.0s -> 14.1s; sf5 20.0s -> 22.8s) because the materialization
    # costs more than the reuse saves. The barrier rule applies when
    # consumers diverge BEFORE a shuffle; here they don't.
    comp = dedup_components_verified_prefiltered(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("component_id").orderBy(
        F.col("logit_micros").desc(), F.col("doc_id")
    )
    best = (
        comp.join(scores, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("component_id", F.col("doc_id").alias("best_id"))
    )
    return (
        docs.join(comp, "doc_id", "left")
        .join(best, "component_id", "left")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("best_id", "doc_id").alias("canonical_id"),
            (
                F.col("component_id").isNull()
                | (F.col("best_id") == F.col("doc_id"))
            ).alias("keep"),
            "logit_micros",
        )
    )


def _keep_best_quality_sql() -> str:
    from projetbigdata_spark.operators.dedup import COMPONENTS_SQL

    return f"""
WITH s AS ({QUALITY_CLASSIFIER_SQL}),
comp AS (SELECT * FROM ({COMPONENTS_SQL})),
ranked AS (
    SELECT comp.doc_id, comp.component_id,
           row_number() OVER (PARTITION BY comp.component_id
                              ORDER BY s.logit_micros DESC,
                                       comp.doc_id) AS rn
    FROM comp JOIN s USING (doc_id)
),
best AS (
    SELECT component_id, doc_id AS best_id FROM ranked WHERE rn = 1
)
SELECT d.doc_id,
       coalesce(b.best_id, d.doc_id) AS canonical_id,
       (c.component_id IS NULL OR b.best_id = d.doc_id) AS keep,
       s2.logit_micros
FROM documents d
LEFT JOIN comp c ON d.doc_id = c.doc_id
LEFT JOIN best b ON c.component_id = b.component_id
LEFT JOIN s s2 ON d.doc_id = s2.doc_id
"""


QUERIES = {
    "corpus_quality_classifier_scores": corpus_quality_classifier_scores,
    "corpus_quality_classifier_report": corpus_quality_classifier_report,
    "corpus_quality_calibration_report": corpus_quality_calibration_report,
    "corpus_quality_select": corpus_quality_select,
    "dedup_keep_best_quality": dedup_keep_best_quality,
}

ORACLE_SQL = {
    "corpus_quality_classifier_scores": QUALITY_CLASSIFIER_SQL,
    "corpus_quality_classifier_report": _classifier_report_sql(),
    "corpus_quality_calibration_report": _calibration_report_sql(),
    "corpus_quality_select": QUALITY_SELECT_SQL,
    "dedup_keep_best_quality": _keep_best_quality_sql(),
}
