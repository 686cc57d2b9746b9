"""Deterministic hash-based sampling & split assignment over the
corpus — the training-data-pipeline replacement for rand()/randomSplit
when reproducibility must survive re-runs, engine changes, and
repartitioning.

The reference splits with unseeded randomSplit([0.8, 0.2])
(script1.py:45 — non-reproducible, SURVEY.md §2.10 M8). Seeding fixes
repeatability within Spark, but the assignment still depends on
partitioning. Hashing the record KEY fixes it absolutely: bucket =
md5(doc_id) mod 100 is a pure per-row expression — the same document
lands in the same split on any engine, any cluster size, any day. This
is how production corpus pipelines pin their held-out sets.

Scale shape: all three queries are single-scan, shuffle only |groups|
(or nothing); the sample predicate is a cheap projection-side filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_documents_parallel


def _hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 4 hex digits of
    md5(key as string) -> int, mod buckets. Engine-portable (md5 and
    base-16 conv exist in both Spark and DuckDB)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast(
        "bigint"
    )
    return h % buckets


SAMPLE_PCT = 10


def sample_hash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample: keep doc iff md5-bucket < 10. No
    shuffle, no RNG state — re-running (anywhere) returns the exact
    same rows, so downstream eval sets are stable."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    return (
        docs.withColumn("bucket", _hash_bucket(F.col("doc_id")).cast("int"))
        .where(F.col("bucket") < SAMPLE_PCT)
        .select("doc_id", "lang", "n_chars", "bucket")
    )


SAMPLE_SQL = f"""
SELECT doc_id, lang, n_chars,
       CAST(CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4) AS BIGINT) % 100
            AS INT) AS bucket
FROM documents
WHERE CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4) AS BIGINT) % 100
      < {SAMPLE_PCT}
"""


def split_col(key: Column | None = None) -> Column:
    """The canonical 80/10/10 train/val/test expression over the md5
    buckets — THE single definition every consumer must share
    (split_assign_documents, dedup_contamination, the curation tier,
    examples/corpus_curation.py): a drifted copy silently
    decontaminates against the wrong split."""
    b = _hash_bucket(key if key is not None else F.col("doc_id"))
    return F.when(b < 80, "train").when(b < 90, "val").otherwise("test")


def split_assign_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment from the same hash buckets
    (80/10/10) + per-split profile. The split column is a pure
    expression — no shuffle to assign; the profile agg shuffles 3
    groups. Buckets, not rand(): adding documents later never moves an
    existing document between splits."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    split = split_col()
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SPLIT_SQL = """
WITH b AS (
    SELECT doc_id, n_chars,
           CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4) AS BIGINT) % 100
               AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM b
GROUP BY 1
"""


STRATA_PCT = {"en": 20, "fr": 10}  # per-language keep rates; default 5
DEFAULT_PCT = 5


def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified reproducible sampling: per-language keep rates
    (the sampleBy(fractions) idiom, hash-deterministic instead of
    Bernoulli). One conditional-aggregation pass reports population vs
    kept per stratum — no join, no second scan."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    bucket = _hash_bucket(F.col("doc_id"))
    threshold = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(pct))
            for lang, pct in sorted(STRATA_PCT.items())
        ],
        F.lit(DEFAULT_PCT),
    )
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(bucket < threshold, 1).otherwise(0)).alias("n_kept"),
    )


_strata_cases = " ".join(
    f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in sorted(STRATA_PCT.items())
)

STRATIFIED_SQL = f"""
SELECT lang,
       count(*) AS n_total,
       sum(CASE WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 4) AS BIGINT)
                     % 100
                < (CASE {_strata_cases} ELSE {DEFAULT_PCT} END)
                THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM documents
GROUP BY lang
"""


QUERIES = {
    "sample_hash_documents": sample_hash_documents,
    "split_assign_documents": split_assign_documents,
    "sample_stratified_by_lang": sample_stratified_by_lang,
}

ORACLE_SQL = {
    "sample_hash_documents": SAMPLE_SQL,
    "split_assign_documents": SPLIT_SQL,
    "sample_stratified_by_lang": STRATIFIED_SQL,
}


TOKEN_BUDGET = 2000  # per-language token budget (fixture dial: the
# sf0.01 languages hold ~2.9k-10.2k tokens each, so the fill selects a
# strict subset per lang AND exercises the under-budget edge at other
# scales); a deployment passes its real budget (e.g. 1e9 tokens/lang)
BUDGET_BUCKETS = 1_000_000  # the selection grid: overshoot is bounded
# by one bucket's token mass, and the per-lang threshold scan is
# bounded by this many rows REGARDLESS of corpus size


def corpus_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language TOKEN-BUDGET fill — "give me
    TOKEN_BUDGET tokens of each language, reproducibly": every doc
    hashes to a salted md5 bucket on the 1e6 grid, and a language
    selects all docs whose bucket is at or below the smallest
    threshold bucket T_lang where the cumulative bucket token mass
    first reaches the budget (whole threshold bucket included —
    overshoot is bounded by one bucket's mass and auditable from the
    output). A language whose total mass is under budget keeps
    everything. Output is the full-corpus audit frame (doc_id, lang,
    n_tokens, bucket, selected).

    This is the budget-fill problem solved WITHOUT a global per-doc
    sort/cumsum (the naive recipe: rank docs per lang, running-sum
    n_tokens, cut at the budget — a corpus-sized skewed sort at
    100 TB): the cumulative sum runs over the per-(lang, bucket)
    HISTOGRAM, ≤ BUDGET_BUCKETS rows per language at ANY corpus size,
    so the window stage is O(langs · grid) while the corpus passes
    are one tokenize projection and one hash-agg. The same
    histogram-threshold trick corpus_quality_quantiles uses for
    percentiles, pointed at budget fill. Hash buckets, not rand():
    re-runs and engine changes never flip a verdict; appends shift
    T_lang only downward (more mass per bucket), which is the
    documented budget-fill semantic (the budget stays filled; the
    selection is a prefix of the hash order, so a frozen snapshot's
    selection is reproducible from its own data alone).

    Null/absent lang is normalized to '' on both engines (partition
    keys must never silently drop rows); null text scores 0 tokens
    and still receives a verdict."""
    tune(spark)
    from pyspark.sql.window import Window

    from projetbigdata_spark.functions.text import tokenize

    docs = load_documents_parallel(spark, sf_dir)
    per_doc = docs.select(
        "doc_id",
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
        F.size(tokenize(F.coalesce(F.col("text"), F.lit(""))))
        .cast("bigint")
        .alias("n_tokens"),
        F.expr(
            "CAST(conv(substring(md5(concat('budget',"
            " CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            f" % {BUDGET_BUCKETS}"
        ).alias("bucket"),
    ).localCheckpoint(eager=False)  # consumed by the histogram AND
    # the verdict projection — one tokenize pass, not two
    per_lb = per_doc.groupBy("lang", "bucket").agg(
        F.sum("n_tokens").alias("t")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    thresh = (
        per_lb.withColumn("cum", F.sum("t").over(w))
        .groupBy("lang")
        .agg(
            F.min(
                F.when(F.col("cum") >= TOKEN_BUDGET, F.col("bucket"))
            ).alias("t_bucket")
        )
    )
    return per_doc.join(F.broadcast(thresh), "lang").select(
        "doc_id",
        "lang",
        "n_tokens",
        "bucket",
        (
            F.col("bucket")
            <= F.coalesce(F.col("t_bucket"), F.lit(BUDGET_BUCKETS))
        ).alias("selected"),
    )


TOKEN_BUDGET_SQL = f"""
WITH per_doc AS (
    SELECT doc_id,
           coalesce(lang, '') AS lang,
           CAST(len(list_filter(
                string_split_regex(lower(coalesce(text, '')), '\\s+'),
                t -> t <> '')) AS BIGINT) AS n_tokens,
           CAST('0x' || substr(md5('budget' || CAST(doc_id AS VARCHAR)),
                               1, 8) AS BIGINT)
               % {BUDGET_BUCKETS} AS bucket
    FROM documents
),
per_lb AS (
    SELECT lang, bucket, sum(n_tokens) AS t
    FROM per_doc GROUP BY lang, bucket
),
cum AS (
    SELECT lang, bucket,
           sum(t) OVER (PARTITION BY lang ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum
    FROM per_lb
),
thresh AS (
    SELECT lang,
           min(CASE WHEN cum >= {TOKEN_BUDGET} THEN bucket END) AS t_bucket
    FROM cum GROUP BY lang
)
SELECT p.doc_id, p.lang, p.n_tokens,
       CAST(p.bucket AS BIGINT) AS bucket,
       p.bucket <= coalesce(t.t_bucket, {BUDGET_BUCKETS}) AS selected
FROM per_doc p JOIN thresh t USING (lang)
"""


QUERIES["corpus_token_budget_sample"] = corpus_token_budget_sample
ORACLE_SQL["corpus_token_budget_sample"] = TOKEN_BUDGET_SQL
