"""Vocabulary build — the reference's A1 distinct-aggregation
(main_reglogit.py:58-71: per-doc set(words) -> collect() -> driver
union -> enumerate) rebuilt as a fully distributed plan.

The reference ships EVERY distinct token to the driver and enumerates a
Python dict — the #1 anti-pattern at 100 TB (SURVEY.md §4.1). Here:

    scan documents (column-pruned to `text`)
      -> tokenize (codegen, functions/text.py)
      -> explode -> stopword filter
      -> hash-agg count per token  (partial map-side combine, 1 shuffle)
      -> row_number over (freq desc, token)  [deterministic ids,
         fixing the reference's set()-order nondeterminism by decree —
         SURVEY.md §4.3]

Scale note: the global row_number needs a single-partition sort, but it
runs AFTER aggregation, on |vocab| rows (≈10^5..10^7), not on corpus
rows (10^11) — the same shape CountVectorizer.fit uses internally. The
unbounded variant `vocabulary()` keeps ids rank-stable; `vocab_topk`
caps to top-k for the flagship query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projetbigdata_spark.functions.text import (
    filter_stopwords,
    sql_stopword_list,
    tokenize,
)
from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_documents_parallel


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token -> corpus frequency. One shuffle (the groupBy); everything
    else is embarrassingly parallel codegen."""
    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select(
        F.explode(filter_stopwords(tokenize("text"))).alias("token")
    )
    return toks.groupBy("token").agg(F.count("*").alias("freq"))


def vocab_topk(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """Flagship query (SURVEY.md §7 phase 0): top-k vocabulary with
    deterministic dense ids. Exercises scan→project→explode→filter→
    agg→window→sort→limit in one plan."""
    tune(spark)
    counts = token_counts(spark, sf_dir)
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    return (
        counts.withColumn("vocab_id", F.row_number().over(w))
        .where(F.col("vocab_id") <= k)
        .orderBy("vocab_id")
    )


def vocab_topk_oracle(k: int = 100) -> str:
    return f"""
WITH toks AS (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
    FROM documents
),
freqs AS (
    SELECT token, count(*) AS freq
    FROM toks
    WHERE token <> '' AND token NOT IN ({sql_stopword_list()})
    GROUP BY token
)
SELECT token, freq,
       CAST(row_number() OVER (ORDER BY freq DESC, token) AS INT) AS vocab_id
FROM freqs
QUALIFY vocab_id <= {k}
ORDER BY vocab_id
"""


QUERIES = {
    "vocab_topk": vocab_topk,
}

ORACLE_SQL = {
    "vocab_topk": vocab_topk_oracle(),
}
