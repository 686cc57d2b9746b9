"""The committed quality-signal lane (r10, VERDICT r9 item 4).

The sf fixtures cannot falsify the classifier tier's score axis (the
r8 HASH_BUCKETS study: fixture LR is majority-class, so the
calibration curve is flat and a broken binning would look identical).
This lane can: tests/golden/quality_lane holds a committed corpus
with a PLANTED graded quality signal (junk-token fraction f ∈
{0..1}, target label = a step in f) and a committed LR fit on it
(tools/gen_quality_lane.py — which refuses to write artifacts that
fail these same gates). Scoring the committed corpus with the
committed coefficients through the REGISTERED cores must produce a
sloped, monotone reliability curve — pinned here so a regression in
the scoring expressions, the binning arithmetic, or the bias/bin
constants shows up as a bent curve, not a silent flat line."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

LANE = os.path.join(os.path.dirname(__file__), "golden", "quality_lane")


def _lane_model() -> tuple[dict[int, int], int]:
    with open(f"{LANE}/coef_micros.json") as fh:
        d = json.load(fh)
    return (
        {int(k): v for k, v in d["coef_micros"].items()},
        d["intercept_micros"],
    )


def test_lane_curve_is_sloped_and_monotone(spark):
    from projetbigdata_spark.operators.classifier import (
        calibration_curve_of,
        quality_scores_of,
    )

    coef, icpt = _lane_model()
    docs = spark.read.parquet(f"{LANE}/documents.parquet")
    scores = quality_scores_of(
        spark, docs, coef_micros=coef, intercept_micros=icpt
    ).cache()

    # (c) the committed fit separates the planted step
    acc = (
        scores.select(
            (F.col("keep") == (F.col("lang") == "en")).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert acc >= 0.9, f"lane accuracy {acc}"

    curve = sorted(
        calibration_curve_of(scores, "en").collect(), key=lambda r: r.bin
    )
    ppms = [r.target_ppm for r in curve]
    # (a) sloped: the score axis carries the signal end to end
    assert len(curve) >= 4
    assert ppms[0] <= 100_000 and ppms[-1] >= 900_000, ppms
    # (b) monotone nondecreasing across EVERY occupied bin — the
    # reliability property a calibrated score must show when the
    # underlying signal is genuinely graded
    assert ppms == sorted(ppms), ppms
    # accounting: curve partitions the lane
    assert sum(r.n_docs for r in curve) == docs.count()
    scores.unpersist()


def test_lane_refit_reproduces_committed_model(spark):
    """The committed coefficients are the deterministic output of the
    registered fit on the committed corpus (seedless LBFGS on a fixed
    frame) — a drift in quality_classifier_fit's features, labels, or
    config shows up here as a coefficient mismatch."""
    from projetbigdata_spark.ml.pipeline import quality_classifier_fit

    coef, icpt = _lane_model()
    model, _ = quality_classifier_fit(spark, LANE)
    got = {
        b: int(round(float(c) * 1_000_000))
        for b, c in enumerate(model.coefficients.toArray())
        if int(round(float(c) * 1_000_000)) != 0
    }
    # LBFGS is deterministic given the frame, but allow ±1 micro of
    # float-print jitter per coefficient rather than pinning exact
    # bit patterns across JVM/BLAS updates
    assert set(got) == set(coef)
    assert all(abs(got[b] - coef[b]) <= 1 for b in coef), (got, coef)
    assert abs(int(round(float(model.intercept) * 1_000_000)) - icpt) <= 1
