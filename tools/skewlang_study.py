"""Skew study for the per-language tercile calibrators (r10, VERDICT
r9 item 3): the exact tier ranks scored docs inside a per-lang
`row_number` window — with one dominant language that window sorts
~the whole corpus's skinny rows in ONE partition (the documented skew
point at selection.py's exact tier and curation.py's quantile
calibrator). corpus_perplexity_buckets_approx removes the sort
structurally (grouped Greenwald-Khanna sketch, map-side combined).
This script prices both claims for SCALE.md:

  A) END-TO-END: /tmp/soak/skewlang = the sf5 soak documents with
     lang reassigned 90% 'en' / 10% spread (deterministic md5
     buckets), then warm best-of-2 noop-write walls of the exact vs
     sketch registered queries. Both share the SB scorer subtree, so
     the delta reads against that common cost.

  B) ISOLATED: a generated (lang, sb_score_ppm, doc_id) frame at
     N_ISO rows, 90% one lang, comparing just the tercile-threshold
     machinery — exact window-rank vs grouped percentile_approx —
     where the skew point is the whole plan.

Usage: python tools/skewlang_study.py [n_iso_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/tmp/soak/sf5"
DST = "/tmp/soak/skewlang"
N_ISO = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000


def build_skew_corpus(spark) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    bucket = F.expr(
        "CAST(conv(substring(md5(concat('skew', CAST(doc_id AS STRING))),"
        " 1, 8), 16, 10) AS BIGINT) % 1000"
    )
    lang = (
        F.when(bucket < 900, F.lit("en"))
        .when(bucket < 925, F.lit("fr"))
        .when(bucket < 950, F.lit("de"))
        .when(bucket < 975, F.lit("es"))
        .otherwise(F.lit("pt"))
    )
    docs.withColumn("lang", lang).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )


def wall(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return best


def main() -> None:
    from projetbigdata_spark.operators.selection import (
        PPL_APPROX_ACCURACY,
        corpus_perplexity_buckets,
        corpus_perplexity_buckets_approx,
    )
    from projetbigdata_spark.session import get_spark

    spark = get_spark("skewlang-study")

    # --- A: end-to-end registered queries on the skewed corpus ---
    if not os.path.isdir(f"{DST}/documents.parquet"):
        build_skew_corpus(spark)
    n = spark.read.parquet(f"{DST}/documents.parquet").count()
    shares = (
        spark.read.parquet(f"{DST}/documents.parquet")
        .groupBy("lang").count().orderBy(F.desc("count")).collect()
    )
    print(f"skewlang corpus: {n} docs, shares "
          f"{[(r.lang, r['count']) for r in shares]}")
    for name, fn in (
        ("exact  (window)", corpus_perplexity_buckets),
        ("approx (sketch)", corpus_perplexity_buckets_approx),
    ):
        w = wall(lambda: fn(spark, DST).write.format("noop")
                 .mode("overwrite").save())
        print(f"A end-to-end {name}: {w:.1f}s  (loadavg "
              f"{os.getloadavg()[0]:.1f})")

    # --- B: isolated tercile machinery at N_ISO rows, 90/10 skew ---
    scored = (
        spark.range(N_ISO)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 9, F.lit("en"))
            .otherwise(F.concat(F.lit("l"), (F.col("id") % 10).cast("string")))
            .alias("lang"),
            ((F.col("id") * 2654435761) % 1000000).alias("sb_score_ppm"),
        )
        .repartition(32)
        .localCheckpoint()  # materialize: time only the calibrators
    )

    def exact_iso():
        from pyspark.sql.window import Window

        ranked = scored.select(
            "lang",
            "sb_score_ppm",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    F.desc("sb_score_ppm"), "doc_id"
                )
            ).alias("rn"),
            F.count("*").over(Window.partitionBy("lang")).alias("n"),
        )
        th = ranked.groupBy("lang").agg(
            F.max(F.when(F.col("rn") == F.expr("(n + 2) div 3"),
                         F.col("sb_score_ppm"))).alias("t_head"),
            F.max(F.when(F.col("rn") == F.expr("(2 * n + 2) div 3"),
                         F.col("sb_score_ppm"))).alias("t_mid"),
        )
        th.write.format("noop").mode("overwrite").save()

    def approx_iso():
        th = scored.groupBy("lang").agg(
            F.percentile_approx(
                "sb_score_ppm",
                F.array(F.lit(1.0 / 3), F.lit(2.0 / 3)),
                F.lit(PPL_APPROX_ACCURACY),
            ).alias("q")
        )
        th.write.format("noop").mode("overwrite").save()

    for name, fn in (("exact  (window)", exact_iso),
                     ("approx (sketch)", approx_iso)):
        w = wall(fn)
        print(f"B isolated {N_ISO // 1_000_000}M rows {name}: {w:.1f}s  "
              f"(loadavg {os.getloadavg()[0]:.1f})")
    spark.stop()


if __name__ == "__main__":
    main()
