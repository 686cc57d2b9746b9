"""Regenerate the golden regression files (NEXT r3 item: golden
refresh automation) — the same deterministic recipes the tests in
tests/test_golden.py assert against, so an INTENDED semantic change is
a one-command refresh with a reviewable diff instead of hand-editing.

Prints a unified diff per golden and rewrites the file; exits 0 if
nothing changed, 1 if any golden was rewritten (so CI can assert
goldens are current by running with --check).

Usage:
    python tools/regen_goldens.py [--check]
"""

from __future__ import annotations

import difflib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def _lr_classifications(spark) -> list[str]:
    from projetbigdata_spark.ml.pipeline import fit_and_score

    _, scored, _ = fit_and_score(spark, SF_SMOKE, kind="lr")
    rows = sorted(
        (r.doc_id, r.prediction)
        for r in scored.select("doc_id", "prediction").collect()
    )
    return [f"{d:05d}\t{p}" for d, p in rows]


def _splits(spark) -> list[str]:
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
    return [f"{d:05d}\t{s}" for d, s in rows]


def _curation_survivors(spark) -> list[str]:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "corpus_curation_regen",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
            "corpus_curation.py",
        ),
    )
    curation = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(curation)
    out = curation.curate(spark, SF_SMOKE)
    return [f"{r.doc_id:05d}" for r in sorted(out.select("doc_id").collect())]


RECIPES = {
    "classifications_sf0001_lr.txt": _lr_classifications,
    "splits_sf0001.txt": _splits,
    "curation_survivors_sf0001.txt": _curation_survivors,
}


def main() -> int:
    check_only = "--check" in sys.argv
    from projetbigdata_spark.session import get_spark

    spark = get_spark("regen-goldens")
    spark.sparkContext.setLogLevel("ERROR")
    changed = 0
    for fname, recipe in RECIPES.items():
        path = os.path.join(GOLDEN_DIR, fname)
        produced = recipe(spark)
        old = open(path).read().splitlines() if os.path.exists(path) else []
        if produced == old:
            print(f"unchanged {fname} ({len(produced)} lines)")
            continue
        changed += 1
        diff = list(
            difflib.unified_diff(old, produced, f"a/{fname}", f"b/{fname}", lineterm="")
        )
        print("\n".join(diff[:40]))
        if len(diff) > 40:
            print(f"... {len(diff) - 40} more diff lines")
        if check_only:
            print(f"STALE {fname}")
        else:
            with open(path, "w") as f:
                f.write("\n".join(produced) + "\n")
            print(f"rewrote {fname} ({len(old)} -> {len(produced)} lines)")
    spark.stop()
    return 1 if changed else 0


if __name__ == "__main__":
    sys.exit(main())
