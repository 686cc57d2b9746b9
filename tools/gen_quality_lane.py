"""Generate the committed QUALITY-SIGNAL lane (r10, VERDICT r9 item 4).

The standing honesty note on the classifier tier (r8 HASH_BUCKETS dial
study; surfaced by corpus_quality_calibration_report) says the sf
fixtures' LR is majority-class — its calibration curve is flat, so the
tier's verified value was mechanism, not model: a flat curve was
indistinguishable from a broken one. This lane FALSIFIES that: a
committed corpus with a PLANTED, graded quality signal, a committed
fit on it, and a pinned sloped+monotone calibration curve — the
multiline-golden-lane pattern applied to the classifier.

Lane design: 240 docs at six junk fractions f ∈ {0, .2, .4, .6, .8,
1.0} (40 docs each; 30 tokens per doc, round(30·(1−f)) drawn from a
stopword-rich GOOD vocabulary, the rest from a symbol/gibberish JUNK
vocabulary; seeded shuffle). Label convention matches the tier's DSIR
target rule: lang = 'en' iff f ≤ 0.4, else a rotating non-target
lang — so the target label is a STEP in f while the LR logit is
~linear in f, which is exactly the shape whose binned curve must come
out monotone if the score axis means anything.

Like tools/gen_multiline_golden.py, this script REFUSES to write the
artifacts unless the fitted model's calibration curve on the lane is
(a) sloped — bottom-bin target_ppm ≤ 100000, top-bin ≥ 900000 — and
(b) monotone nondecreasing across every occupied bin, and (c) the fit
separates the step: lane accuracy ≥ 0.9. The committed outputs:

    tests/golden/quality_lane/documents.parquet   (Spark directory)
    tests/golden/quality_lane/coef_micros.json    (integer micros)

tests/test_quality_lane.py re-scores the committed corpus with the
committed coefficients through the REGISTERED scoring + binning cores
(quality_scores_of / calibration_curve_of) and re-pins (a)+(b)+(c).

Usage: python tools/gen_quality_lane.py [out_dir]
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

GOOD = (
    "the of and to in that it is was for on are as with his they at be "
    "this have from or had by word but what some we can out other were "
    "all there when up use your how said an each she which do their "
    "time if will way about many then them write would like so these "
    "her long make thing see him two has look more day could go come"
).split()
JUNK = (
    "@@@ ### $$$ %%% ^^^ &&& ||| ~~~ ``` zzqj xkwv qqpz wvvx jjqk "
    "0x1f 0xff 9943 7781 11218 443210 zz01 qq99 xx33 kk77 vv55 "
    ">>>> <<<< ==== ++++ ---- ____ :::: ;;;; !!!! ???? #a#b %c%d "
    "nullnull voidvoid nanNaN 0000000 1111111 lorem1psum d3adb33f"
).split()

N_PER_FRAC = 40
TOKENS_PER_DOC = 30
FRACS = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
NON_TARGET_LANGS = ("fr", "de", "es", "pt")


def build_rows() -> list[tuple[int, str, str, str, int]]:
    rng = random.Random(20260816)
    rows = []
    doc_id = 0
    for fi, f in enumerate(FRACS):
        n_junk = round(TOKENS_PER_DOC * f)
        for _ in range(N_PER_FRAC):
            toks = rng.choices(GOOD, k=TOKENS_PER_DOC - n_junk) + rng.choices(
                JUNK, k=n_junk
            )
            rng.shuffle(toks)
            text = " ".join(toks)
            lang = (
                "en"
                if f <= 0.4
                else NON_TARGET_LANGS[doc_id % len(NON_TARGET_LANGS)]
            )
            rows.append((doc_id, text, lang, "lane", len(text)))
            doc_id += 1
    return rows


def main() -> int:
    out_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
            "golden",
            "quality_lane",
        )
    )
    from projetbigdata_spark.ml.pipeline import quality_classifier_fit
    from projetbigdata_spark.operators.classifier import (
        calibration_curve_of,
        quality_scores_of,
    )
    from projetbigdata_spark.session import get_spark

    spark = get_spark("gen-quality-lane")
    rows = build_rows()
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    model, train = quality_classifier_fit(spark, out_dir)
    coefs = model.coefficients.toArray()
    micros = {
        b: int(round(float(c) * 1_000_000))
        for b, c in enumerate(coefs)
        if int(round(float(c) * 1_000_000)) != 0
    }
    icpt = int(round(float(model.intercept) * 1_000_000))

    # verify through the REGISTERED cores before committing anything
    lane_docs = spark.read.parquet(f"{out_dir}/documents.parquet")
    scores = quality_scores_of(
        spark, lane_docs, coef_micros=micros, intercept_micros=icpt
    )
    acc = (
        scores.join(lane_docs.select("doc_id"), "doc_id")
        .select(
            (
                F.col("keep") == (F.col("lang") == "en")
            ).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    curve = sorted(
        calibration_curve_of(scores, "en").collect(), key=lambda r: r.bin
    )
    ppms = [r.target_ppm for r in curve]
    print(f"lane fit: accuracy={acc:.3f}, {len(curve)} occupied bins")
    for r in curve:
        print(f"  bin {r.bin} lo={r.bin_lo_micros:>12} n={r.n_docs:>3} "
              f"target_ppm={r.target_ppm}")
    problems = []
    if acc < 0.9:
        problems.append(f"accuracy {acc:.3f} < 0.9")
    if len(curve) < 4:
        problems.append(f"only {len(curve)} occupied bins")
    if ppms != sorted(ppms):
        problems.append("curve not monotone nondecreasing")
    if not (ppms and ppms[0] <= 100_000 and ppms[-1] >= 900_000):
        problems.append("curve not sloped (ends not near 0 / 1e6)")
    if problems:
        print("REFUSING to write artifacts:", "; ".join(problems))
        spark.stop()
        return 1

    with open(f"{out_dir}/coef_micros.json", "w") as fh:
        json.dump(
            {"intercept_micros": icpt,
             "coef_micros": {str(k): v for k, v in sorted(micros.items())}},
            fh,
            indent=1,
        )
    print(f"wrote {out_dir}/documents.parquet + coef_micros.json")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
