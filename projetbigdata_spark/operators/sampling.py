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
from projetbigdata_spark.sources.catalog import load_table


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
    docs = load_table(spark, sf_dir, "documents")
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
    docs = load_table(spark, sf_dir, "documents")
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
    docs = load_table(spark, sf_dir, "documents")
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
