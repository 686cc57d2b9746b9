"""Repetition-based quality signals + winnowing fingerprints — the
filter family LLM curation pipelines run corpus-wide (Gopher/C4-style
repetition rules; MOSS-style winnowing for robust local fingerprinting).

Both are single-scan shapes:

  text_repetition_scores — per-doc token-repetition statistics. The
      scalar stats (n_tokens, distinct share) are IN-ROW array
      expressions (no shuffle at all); only the top-bigram share needs
      a (doc, bigram) hash-agg — one shuffle, partial-agg friendly.
  text_winnow_fingerprints — winnowing (Schleimer et al., SIGMOD'03):
      k-gram rolling hashes -> min hash per sliding window of w hashes
      -> distinct selected (doc, hash) fingerprints. Guarantees any
      shared run >= w+k-1 tokens shares a fingerprint — the property
      plain rolling-hash sampling (text_fingerprints) lacks. All
      hashing is exact integer md5-derived, so the oracle mirrors it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.functions.text import ngrams, tokenize
from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_documents_parallel


def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition profile per document:
    - dup_word_frac: 1 - |distinct tokens| / |tokens| (in-row, no shuffle)
    - top_bigram_share: occurrences of the most frequent bigram over
      total bigrams (one (doc, bigram) hash-agg)
    High values on either axis mark template/boilerplate docs that
    repetition filters drop before training."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select("doc_id", tokenize("text").alias("w"))
    scalar = toks.select(
        "doc_id",
        F.size("w").alias("n_tokens"),
        # empty/whitespace-only doc: 0 tokens -> NULL fraction (the
        # oracle's 0/0.0 is NULL too); an unguarded divide crashes
        # under Spark 4's default ANSI mode (review finding r3)
        F.round(
            F.when(
                F.size("w") > 0,
                1 - F.size(F.array_distinct("w")) / F.size("w"),
            ),
            6,
        ).alias("dup_word_frac"),
    )
    bi = toks.select("doc_id", F.explode(ngrams(F.col("w"), 2)).alias("bigram"))
    bigram_counts = bi.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    bigram_share = bigram_counts.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_share")
    )
    return scalar.join(bigram_share, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_word_frac",
        F.coalesce("top_bigram_share", F.lit(0.0)).alias("top_bigram_share"),
    )


REPETITION_SQL = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
),
scalar AS (
    SELECT doc_id, len(w) AS n_tokens,
           round(1 - len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 6)
               AS dup_word_frac
    FROM toks
),
bi AS (
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
),
bc AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY 1, 2),
share AS (
    SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6)
               AS top_bigram_share
    FROM bc GROUP BY doc_id
)
SELECT s.doc_id, CAST(n_tokens AS INT) AS n_tokens, dup_word_frac,
       coalesce(top_bigram_share, 0.0) AS top_bigram_share
FROM scalar s LEFT JOIN share USING (doc_id)
"""


WINNOW_K = 4  # k-gram length (tokens)
WINNOW_W = 5  # window of consecutive k-gram hashes to min over


def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection: token k-gram hashes (first 8
    md5 hex digits — exact bigint), then per sliding window of W
    consecutive hashes keep the minimum (ties -> leftmost is implied by
    min over the same value), dedup per doc. Shared token runs of
    length >= W+K-1 between two docs are GUARANTEED to share a selected
    fingerprint — the detection floor plain stride sampling lacks.

    Plan: one generator for k-grams (in-row), hash in codegen, ONE
    window (partitionBy doc ordered by position, W-1 preceding frame)
    for the min, then distinct. Single shuffle on doc_id."""
    from pyspark.sql.window import Window

    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select("doc_id", tokenize("text").alias("w"))
    kg = toks.select(
        "doc_id",
        F.posexplode(ngrams(F.col("w"), WINNOW_K)).alias("pos", "kgram"),
    )
    h = F.expr("CAST(conv(substring(md5(kgram), 1, 8), 16, 10) AS BIGINT)")
    hashed = kg.select("doc_id", "pos", h.alias("h"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    selected = (
        hashed.withColumn("wmin", F.min("h").over(win))
        # the first W-1 positions have incomplete windows; winnowing
        # starts selecting once a full window exists
        .where(F.col("pos") >= WINNOW_W - 1)
        .select("doc_id", F.col("wmin").alias("fingerprint"))
        .distinct()
    )
    return selected


WINNOW_SQL = f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
),
kg AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(w[i:i+{WINNOW_K - 1}], ' ') AS kgram
    FROM toks,
         LATERAL (SELECT unnest(generate_series(1, len(w) - {WINNOW_K - 1}))
                  AS i)
    WHERE len(w) >= {WINNOW_K}
),
hashed AS (
    SELECT doc_id, pos,
           CAST('0x' || substr(md5(kgram), 1, 8) AS BIGINT) AS h
    FROM kg
),
winmin AS (
    SELECT doc_id, pos,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                        AND CURRENT ROW) AS fingerprint
    FROM hashed
)
SELECT DISTINCT doc_id, fingerprint
FROM winmin
WHERE pos >= {WINNOW_W - 1}
"""


QUERIES = {
    "text_repetition_scores": text_repetition_scores,
    "text_winnow_fingerprints": text_winnow_fingerprints,
}

ORACLE_SQL = {
    "text_repetition_scores": REPETITION_SQL,
    "text_winnow_fingerprints": WINNOW_SQL,
}
