"""Golden-file regression — the reference's own QA strategy (SURVEY.md
§5.1: committed `classifications_*.txt` artifacts) reproduced with a
determinism guarantee the reference lacked: seeded split + seeded
estimator means the committed golden file must match BYTE-EXACTLY on
every run, on every machine."""

from __future__ import annotations

import os

from tests.conftest import SF_SMOKE

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "classifications_sf0001_lr.txt")


def test_lr_predictions_match_golden_file(spark):
    from projetbigdata_spark.ml.pipeline import fit_and_score

    _, scored, _ = fit_and_score(spark, SF_SMOKE, kind="lr")
    rows = sorted(
        (r.doc_id, r.prediction)
        for r in scored.select("doc_id", "prediction").collect()
    )
    produced = [f"{d:05d}\t{p}" for d, p in rows]
    with open(GOLDEN) as f:
        golden = f.read().splitlines()
    assert produced == golden
