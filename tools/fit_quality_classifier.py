"""One-shot fitter for the frozen quality-classifier coefficients.

The registered scorer (operators/classifier.py
corpus_quality_classifier_scores) applies a FIXED coefficient vector —
pure integer arithmetic both engines recompute exactly, the same way
the k-means oracles unroll frozen Lloyd iterations. This script is the
provenance of those constants: it fits the reference's LR recipe
(main_reglogit.py:90-99 — LogisticRegression via pyspark.ml; the repo's
reference-exact config maxIter=30, regParam=0.01 from
chargement_modele_prediction.py) on the sf0.01 fixture's hashed signed
counts (operators/features.text_feature_hashing, HASH_BUCKETS dims)
with the DSIR target convention as the label (lang == 'en' — the
"target-vs-raw" quality-classifier setup of GPT-3/CCNet-style
filtering), then prints the coefficient dict in integer micros ready
to paste into operators/classifier.py.

Usage:
    python tools/fit_quality_classifier.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projetbigdata_spark.ml.pipeline import quality_classifier_fit  # noqa: E402
from projetbigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("fit-quality-classifier")
    model, train = quality_classifier_fit(spark, sf_dir)
    coefs = model.coefficients.toArray()
    micros = {
        b: int(round(float(c) * 1_000_000))
        for b, c in enumerate(coefs)
        if int(round(float(c) * 1_000_000)) != 0
    }
    icpt = int(round(float(model.intercept) * 1_000_000))
    scored = model.transform(train)
    pos = scored.where(F.col("prediction") == 1.0).count()
    n = train.count()
    print(f"# fit on {sf_dir}: {n} docs, {pos} predicted target-like")
    print(f"QC_INTERCEPT_MICROS = {icpt}")
    print("QC_COEF_MICROS = {")
    for b in sorted(micros):
        print(f"    {b}: {micros[b]},")
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
