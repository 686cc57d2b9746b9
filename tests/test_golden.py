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


SPLITS_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "splits_sf0001.txt"
)
CURATION_GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "curation_survivors_sf0001.txt"
)


def test_split_assignment_matches_golden_file(spark):
    """Per-document split assignment is pinned byte-exactly: the
    md5-bucket splits promise that adding documents or changing engines
    never moves an existing doc between train/val/test — this file IS
    that promise."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.sampling import _hash_bucket
    from projetbigdata_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    bucket = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    rows = sorted(
        (r.doc_id, r.split)
        for r in docs.select("doc_id", split.alias("split")).collect()
    )
    produced = [f"{d:05d}\t{s}" for d, s in rows]
    with open(SPLITS_GOLDEN) as f:
        assert produced == f.read().splitlines()


def test_curation_survivors_match_golden_file(spark):
    """The curation pipeline's surviving doc_id set is pinned: quality
    gate + exact dedup + near-dup components are all deterministic, so
    any drift here is a semantic change, not noise."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "corpus_curation_golden",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "examples",
            "corpus_curation.py",
        ),
    )
    curation = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(curation)

    out = curation.curate(spark, SF_SMOKE)
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    produced = [f"{d:05d}" for d in ids]
    with open(CURATION_GOLDEN) as f:
        assert produced == f.read().splitlines()


def test_multiline_lane_matches_golden(spark):
    """The committed multi-line lane (tools/gen_multiline_golden.py):
    a frozen 15-doc multi-line parquet plus the expected outputs of
    every line/paragraph-granularity operator. The per-test
    constructed-frame parity tests prove Spark == DuckDB; this lane
    additionally pins the VALUES, so a semantics drift that moves both
    engines together (the failure parity can't see) still fails — and
    it survives any driver-side fixture regeneration."""
    import json

    from projetbigdata_spark import registry

    lane_dir = os.path.join(os.path.dirname(__file__), "golden", "multiline")
    with open(
        os.path.join(os.path.dirname(__file__), "golden",
                     "multiline_expected.json")
    ) as f:
        expected = json.load(f)
    queries, _ = registry.collect()
    for name, want in expected.items():
        got = {
            str(r["doc_id"]): {
                c: v for c, v in r.asDict().items() if c != "doc_id"
            }
            for r in queries[name](spark, lane_dir).collect()
        }
        assert got == want, f"{name}: drift vs committed multiline golden"
    # the lane actually exercises the live paths the fixtures can't
    assert expected["dedup_lines"]["1"]["n_lines_cut"] > 0
    assert expected["corpus_gopher_clean"]["4"]["kept"] is True
    assert expected["text_lang_lines"]["9"]["mixed"] is True
    assert expected["text_gopher_repetition"]["7"]["dup_8gram_char_ppm"] > 0
