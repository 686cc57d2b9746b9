"""Python UDTF surface (SURVEY.md §2.11) — the reference's de-facto
UDTFs are whole-row `df.map` lambdas with a different output schema
(script3.py:87, script5.py:55); Spark 4's first-class Python UDTF is
the modern packaging: declared schema, lateral-join call sites.

The example op is document CHUNKING — split a document into fixed-size
token windows — the canonical training-data prep expansion (1 doc ->
N chunk rows). The UDTF form is the API demo; `chunk_documents_expr`
below is the same operator as a pure Catalyst expression (the shape
you run at 100 TB — no Python in the loop), and the oracle + tests
hold both to the same output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_documents_parallel

CHUNK_TOKENS = 20


def chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF call path: register + LATERAL join in SQL.

    The UDTF class is defined INSIDE this function so cloudpickle
    serializes it by value — a module-level class pickles by reference
    and breaks on any driver whose Python workers can't import this
    package (e.g. a harness launched outside the repo root)."""
    from pyspark.sql.functions import udtf

    tune(spark)
    chunk_tokens = CHUNK_TOKENS

    class ChunkTokens:
        """UDTF: (doc_id, text) -> rows (doc_id, chunk_idx, chunk,
        n_tokens). Whitespace tokenization identical to
        functions.text.tokenize: ASCII \\s+ (re.ASCII pins Python's \\s
        to Java/RE2's default — bare str.split() would also break on
        U+00A0/U+2028 and fork from the expression twin), NULL text
        yields no chunks like the twin's empty token array."""

        def eval(self, doc_id: int, text: str):
            import re

            toks = [
                t
                for t in re.split(r"\s+", (text or "").lower(), flags=re.ASCII)
                if t
            ]
            for i in range(0, len(toks), chunk_tokens):
                window = toks[i : i + chunk_tokens]
                yield doc_id, i // chunk_tokens, " ".join(window), len(window)

    chunker = udtf(
        ChunkTokens,
        returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int",
    )
    spark.udtf.register("chunk_tokens", chunker)
    load_documents_parallel(spark, sf_dir).createOrReplaceTempView("v_docs_chunk")
    return spark.sql(
        """
        SELECT t.doc_id, t.chunk_idx, t.chunk, t.n_tokens
        FROM v_docs_chunk, LATERAL chunk_tokens(doc_id, text) t
        """
    )


def chunk_documents_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same operator, pure Catalyst: one generator expression over the
    token array (single-reference rule — see dedup._shingles)."""
    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    gen = F.expr(
        f"""
        explode(
            transform(
                CASE WHEN size(w) > 0
                     THEN sequence(0, CAST((size(w) - 1) / {CHUNK_TOKENS} AS INT))
                     ELSE CAST(array() AS array<int>) END,
                i -> struct(
                    i AS chunk_idx,
                    concat_ws(' ', slice(w, i * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS}))
                        AS chunk,
                    CAST(least(size(w) - i * {CHUNK_TOKENS}, {CHUNK_TOKENS}) AS INT)
                        AS n_tokens)
            )
        )
        """
    )
    from projetbigdata_spark.functions.text import tokenize

    toks = docs.select("doc_id", tokenize("text").alias("w"))
    return toks.select("doc_id", gen.alias("c")).select(
        "doc_id", "c.chunk_idx", "c.chunk", "c.n_tokens"
    )


CHUNK_SQL = f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       array_to_string(w[i * {CHUNK_TOKENS} + 1 : (i + 1) * {CHUNK_TOKENS}], ' ')
           AS chunk,
       CAST(least(len(w) - i * {CHUNK_TOKENS}, {CHUNK_TOKENS}) AS INT)
           AS n_tokens
FROM toks,
     LATERAL (SELECT unnest(generate_series(0, (len(w) - 1) // {CHUNK_TOKENS}))
              AS i)
WHERE len(w) > 0
"""


QUERIES = {
    "chunk_documents_udtf": chunk_documents_udtf,
    "chunk_documents_expr": chunk_documents_expr,
}

ORACLE_SQL = {
    "chunk_documents_udtf": CHUNK_SQL,
    "chunk_documents_expr": CHUNK_SQL,
}
