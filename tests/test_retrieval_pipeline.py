"""Integration test for the retrieval composition
(examples/retrieval_pipeline.py): hybrid fusion annotated with phrase
hits and MMR membership. Each tier is individually oracle-checked;
this asserts the COMPOSITION's row accounting and cross-tier
consistency."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

from tests.conftest import SF_CHECK

_spec = importlib.util.spec_from_file_location(
    "retrieval_pipeline",
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 "examples", "retrieval_pipeline.py"),
)
retrieval = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(retrieval)


def test_retrieval_report_consistency(spark):
    from projetbigdata_spark.operators.similarity import (
        HYBRID_QUERY_VEC,
        HYBRID_TOP_N,
        search_hybrid_rrf,
        sim_mmr_rerank,
    )
    from projetbigdata_spark.operators.tfidf import text_search_phrase

    report = retrieval.retrieve(spark, SF_CHECK).cache()
    rows = report.collect()

    # exactly the hybrid top-10, annotation joins never multiply rows
    hybrid = {
        r.doc_id: r.rrf_micros
        for r in search_hybrid_rrf(spark, SF_CHECK).collect()
    }
    assert len(rows) == len(hybrid) <= HYBRID_TOP_N
    assert {r.doc_id for r in rows} == set(hybrid)
    for r in rows:
        assert r.rrf_micros == hybrid[r.doc_id]
        # every reported doc appeared in at least one tier
        assert r.r_text is not None or r.r_vec is not None

    # phrase annotation agrees with the registered query
    phrase = {
        r.doc_id: r.n_matches
        for r in text_search_phrase(spark, SF_CHECK).collect()
    }
    for r in rows:
        assert r.n_phrase_matches == phrase.get(r.doc_id, 0)

    # MMR membership agrees with the registered query for the query vec
    mmr_ids = {
        r.neighbor_id
        for r in sim_mmr_rerank(spark, SF_CHECK).collect()
        if r.query_id == HYBRID_QUERY_VEC
    }
    for r in rows:
        assert r.mmr_pick == (r.doc_id in mmr_ids)
    # every MMR pick came from the vector tier, so any MMR pick inside
    # the hybrid list must carry a vector rank
    for r in rows:
        if r.mmr_pick:
            assert r.r_vec is not None

    # determinism
    again = retrieval.retrieve(spark, SF_CHECK).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]
    report.unpersist()
