"""Integration test for the embedding-pipeline composition
(examples/embedding_pipeline.py): hygiene -> frozen index ->
incremental ingest -> near-dup verdicts. Each stage is individually
oracle-checked; this asserts the COMPOSITION's accounting, its
consistency with the registered sim_ivf_incremental query, and
determinism."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

from tests.conftest import SF_CHECK

_spec = importlib.util.spec_from_file_location(
    "embedding_pipeline",
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 "examples", "embedding_pipeline.py"),
)
pipeline = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pipeline)


def test_embedding_ingest_accounting_and_consistency(spark):
    from projetbigdata_spark.operators.similarity import (
        COSINE_THRESHOLD,
        TOP_K,
        _is_new_col,
        sim_ivf_incremental,
    )
    from projetbigdata_spark.sources.catalog import load_table

    out = pipeline.ingest(spark, SF_CHECK).cache()

    # every arrival with a usable vector gets at most TOP_K rows,
    # ranks dense from 1
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r.query_id, []).append(r)
    n_new = (
        load_table(spark, SF_CHECK, "embeddings")
        .where(_is_new_col())
        .count()
    )
    assert 0 < len(per_q) <= n_new
    for q, rows in per_q.items():
        rnks = sorted(r.rnk for r in rows)
        assert rnks == list(range(1, len(rnks) + 1))
        assert len(rows) <= TOP_K
        # verdict columns are constant per arrival and derived from
        # its rank-1 row
        best = [r for r in rows if r.rnk == 1][0]
        for r in rows:
            assert r.best_match == best.neighbor_id
            assert r.best_cosine == best.cosine
            assert r.is_neardup == (best.cosine >= COSINE_THRESHOLD)

    # neighbor sets agree with the registered incremental query
    # (the pipeline only adds the verdict overlay)
    reg = sim_ivf_incremental(spark, SF_CHECK)
    cols = ["query_id", "neighbor_id", "cosine", "rnk"]
    assert out.select(*cols).subtract(reg.select(*cols)).count() == 0
    assert reg.select(*cols).subtract(out.select(*cols)).count() == 0

    # determinism
    again = pipeline.ingest(spark, SF_CHECK)
    assert out.select(*cols).subtract(again.select(*cols)).count() == 0
    out.unpersist()


def test_embedding_pipeline_sink_roundtrip(spark, tmp_path):
    """The sink stage main() runs: verdict frame -> parquet -> read
    back intact. (main() itself is not invoked here — it stops the
    session, which would kill the shared test fixture.)"""
    out = str(tmp_path / "ingest")
    pipeline.ingest(spark, SF_CHECK).write.mode("overwrite").parquet(out)
    written = spark.read.parquet(out)
    assert written.count() > 0
    assert {"query_id", "neighbor_id", "cosine", "rnk", "best_match",
            "best_cosine", "is_neardup"} <= set(written.columns)
