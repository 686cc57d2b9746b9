"""Embedding quantization — the storage/serving tier of a vector
pipeline at 100 TB: fp32 vectors cost 4B/dim; symmetric int8 absmax
quantization (the scheme faiss SQ8 / LLM.int8-style stores use) cuts
that 4x with bounded recall loss.

Everything is expressed as in-row Catalyst array expressions (transform
/ aggregate folds) — no shuffle at all until the tiny summary agg, no
UDF. Rounding is floor(x + 0.5) (explicit, engine-portable) rather than
round() (Spark HALF_UP vs DuckDB HALF_EVEN would diverge at exact .5
points); the scale uses the exact max|x| so the check is value-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_embeddings_parallel

QBITS_MAX = 127  # symmetric int8 range


def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, scale, q_checksum, max_abs_err, mse): per-vector absmax
    int8 quantization with its own reconstruction-error report.

    q = floor(x / scale * 127 + 0.5) clamped to [-127, 127], where
    scale = max|x| / 1 (absmax). The checksum is a positional fold of
    the quantized codes (sum of q_i * (i+1)), so the oracle verifies
    every code without shipping arrays through the hash."""
    tune(spark)
    emb = load_embeddings_parallel(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    absmax = F.array_max(F.transform("e", F.abs))
    withs = emb.select(
        "vec_id", "e", F.when(absmax > 0, absmax).otherwise(F.lit(1.0)).alias("s")
    )
    q = F.transform(
        "e",
        lambda x: F.greatest(
            F.lit(-QBITS_MAX),
            F.least(
                F.lit(QBITS_MAX),
                F.floor(x / F.col("s") * QBITS_MAX + 0.5).cast("int"),
            ),
        ),
    )
    quant = withs.select("vec_id", F.col("s"), q.alias("q"), F.col("e"))
    # positional checksum: sum q_i * (i+1) — exact bigint
    chk = F.aggregate(
        F.zip_with(
            "q",
            F.sequence(F.lit(1), F.size("q")),
            lambda qi, i: qi.cast("bigint") * i.cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # reconstruction x_hat = q * s / 127; errors folded in-row
    err = F.zip_with(
        "q", "e", lambda qi, xi: F.abs(qi * F.col("s") / QBITS_MAX - xi)
    )
    sqerr = F.zip_with(
        "q",
        "e",
        lambda qi, xi: (qi * F.col("s") / QBITS_MAX - xi)
        * (qi * F.col("s") / QBITS_MAX - xi),
    )
    return quant.select(
        "vec_id",
        F.round("s", 6).alias("scale"),
        chk.alias("q_checksum"),
        F.round(F.array_max(err), 6).alias("max_abs_err"),
        F.round(
            F.aggregate(sqerr, F.lit(0.0), lambda a, x: a + x) / F.size("e"), 6
        ).alias("mse"),
    )


QUANTIZE_SQL = f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
scaled AS (
    SELECT vec_id, e,
           CASE WHEN list_max(list_transform(e, x -> abs(x))) > 0
                THEN list_max(list_transform(e, x -> abs(x)))
                ELSE 1.0 END AS s
    FROM v
),
quant AS (
    SELECT vec_id, e, s,
           list_transform(e, x -> CAST(greatest(-{QBITS_MAX},
               least({QBITS_MAX},
                     floor(x / s * {QBITS_MAX} + 0.5))) AS INT)) AS q
    FROM scaled
)
SELECT vec_id,
       round(s, 6) AS scale,
       CAST(list_sum(list_transform(range(1, len(q) + 1),
                                    i -> CAST(q[i] AS BIGINT) * i))
            AS BIGINT) AS q_checksum,
       round(list_max(list_transform(range(1, len(q) + 1),
                      i -> abs(q[i] * s / {QBITS_MAX} - e[i]))), 6)
           AS max_abs_err,
       round(list_sum(list_transform(range(1, len(q) + 1),
                      i -> (q[i] * s / {QBITS_MAX} - e[i])
                           * (q[i] * s / {QBITS_MAX} - e[i]))) / len(e), 6)
           AS mse
FROM quant
"""


QUERIES = {"embed_quantize_int8": embed_quantize_int8}
ORACLE_SQL = {"embed_quantize_int8": QUANTIZE_SQL}
