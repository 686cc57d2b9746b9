"""Quality-classifier HASH_BUCKETS dial study (NEXT r8 → r9 item 3).

The registered surface pins HASH_BUCKETS=64 by design — at fixture
vocabulary (~5k distinct tokens) collisions are guaranteed, so the
signed-hash cancellation mechanism is actually exercised by the
oracle rows. Deployments use 2^18..2^20 buckets. This study measures
what the dial buys: fit the same LR recipe (maxIter=30,
regParam=0.01, DSIR target-vs-raw labels) at several bucket counts on
the same corpus and report train-set agreement with the labels
(accuracy / target-recall / off-target FP rate from model.transform)
plus the fit wall. Findings land in SCALE.md.

Usage:
    python tools/qc_dial_study.py [sf_dir] [buckets ...]
    # default: /root/testdata/sf0.1  64 256 1024 4096
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projetbigdata_spark.session import get_spark  # noqa: E402


def fit_at(spark, sf_dir: str, n_buckets: int):
    """quality_classifier_fit with the bucket dial exposed (the
    registered fit pins the fixture dial; this is the study twin)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from projetbigdata_spark.operators.features import hashed_features_of
    from projetbigdata_spark.operators.selection import DSIR_TARGET_LANG
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    feats = hashed_features_of(
        load_table(spark, sf_dir, "documents"), n_buckets=n_buckets
    )
    fm = feats.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("bucket"),
                    F.col("signed_sum").cast("double").alias("v"),
                )
            )
        ).alias("fm")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda b: F.coalesce(F.col("fm")[b], F.lit(0.0)),
    )
    train = docs.join(fm, "doc_id", "left").select(
        "doc_id",
        # NULL lang = raw/non-target, matching the scorer (ADVICE r8)
        F.when(F.col("lang") == DSIR_TARGET_LANG, 1.0)
        .otherwise(0.0)
        .alias("label"),
        array_to_vector(dense).alias("features"),
    )
    lr = LogisticRegression(
        maxIter=30, regParam=0.01, featuresCol="features", labelCol="label"
    )
    return lr.fit(train), train


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dials = [int(b) for b in sys.argv[2:]] or [64, 256, 1024, 4096]
    spark = get_spark("qc-dial-study")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# corpus: {sf_dir}")
    print("| buckets | fit wall | accuracy | target recall | off-target FP |")
    print("|---|---|---|---|---|")
    for b in dials:
        t0 = time.time()
        model, train = fit_at(spark, sf_dir, b)
        wall = time.time() - t0
        scored = model.transform(train).select("label", "prediction")
        agg = scored.agg(
            F.count("*").alias("n"),
            F.sum((F.col("label") == F.col("prediction")).cast("int")).alias(
                "ok"
            ),
            F.sum(F.col("label").cast("int")).alias("pos"),
            F.sum(
                ((F.col("label") == 1.0) & (F.col("prediction") == 1.0)).cast(
                    "int"
                )
            ).alias("tp"),
            F.sum(
                ((F.col("label") == 0.0) & (F.col("prediction") == 1.0)).cast(
                    "int"
                )
            ).alias("fp"),
        ).first()
        acc = agg.ok / agg.n
        rec = agg.tp / agg.pos if agg.pos else float("nan")
        fpr = agg.fp / (agg.n - agg.pos) if agg.n > agg.pos else float("nan")
        print(
            f"| {b} | {wall:.1f}s | {acc:.3f} | {rec:.3f} | {fpr:.3f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
