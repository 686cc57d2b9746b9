"""End-to-end reproduction of the reference's flagship workflow
(script1.py + script1_generate_txt.py): load labeled corpus -> clean/
tokenize -> TF-IDF -> classifier -> cross-validate -> score the
held-out set -> write `classifications.txt` — as ONE distributed
Spark job with zero driver round-trips.

    python examples/sentiment_pipeline.py [sf_dir] [out_dir]

What changed vs the reference (SURVEY.md §3.1 "rebuild shape"):
  - ingestion: parquet scan (or sources/textdir.py for raw pos/neg
    dirs) instead of driver-side os.walk + parallelize;
  - the split and every estimator are seeded -> reproducible golden
    outputs (tests/golden/);
  - the sink is a distributed tab-separated write, not collect()+loop.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from projetbigdata_spark.ml.pipeline import crossval_fit, fit_and_score  # noqa: E402
from projetbigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/classifications_out"
    spark = get_spark("sentiment-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    model, scored, acc = fit_and_score(spark, sf_dir, kind="lr")
    print(f"held-out accuracy: {acc:.4f}")

    _, metrics = crossval_fit(spark, sf_dir)
    print("cross-validation grid (regParam, maxIter -> AUC):")
    for r in metrics.orderBy("reg_param", "max_iter").collect():
        print(f"  {r.reg_param:>5} {r.max_iter:>3} -> {r.avg_auc:.4f}")

    (
        scored.select(
            F.format_string("%05d", F.col("doc_id")).alias("docid"),
            F.col("prediction").cast("string").alias("label"),
        )
        .write.option("sep", "\t")
        .mode("overwrite")
        .csv(out)
    )
    print(f"classifications written to {out}/ (tab-separated, distributed)")
    spark.stop()


if __name__ == "__main__":
    main()
