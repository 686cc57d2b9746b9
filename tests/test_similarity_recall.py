"""ANN quality gate: the banded-LSH top-k must recover most of the
exact top-k. The fixture embeddings are uniform-random — LSH's
worst case (true neighbors sit near 90 deg, where hyperplane collision
probability is lowest) — so the floor here is conservative; clustered
real-world embeddings recall far higher at the same band layout."""

from __future__ import annotations

from tests.conftest import SF_CHECK

RECALL_FLOOR = 0.5


def test_ann_recall_vs_bruteforce(spark):
    from projetbigdata_spark.operators.similarity import (
        sim_ann_lsh_topk,
        sim_topk_bruteforce,
    )

    brute = {
        (r.query_id, r.neighbor_id)
        for r in sim_topk_bruteforce(spark, SF_CHECK).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in sim_ann_lsh_topk(spark, SF_CHECK).collect()
    }
    assert brute, "bruteforce produced no neighbors"
    recall = len(brute & ann) / len(brute)
    assert recall >= RECALL_FLOOR, f"ANN recall {recall:.2f} < {RECALL_FLOOR}"


def test_ann_candidates_prune(spark):
    """The candidate set must be a strict subset of all pairs —
    otherwise the 'ANN' is a disguised brute force."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        N_QUERIES,
        _banded_buckets,
    )

    bb = _banded_buckets(spark, SF_CHECK)
    n = bb.select("vec_id").distinct().count()
    qb = bb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    ncand = (
        bb.join(qb, ["band", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )
    assert ncand < 0.9 * N_QUERIES * (n - 1)
