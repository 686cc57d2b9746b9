"""End-to-end RETRIEVAL over the curated corpus — the search tier
composed into ONE dataflow (the inspection/search UI a data team runs
against its corpus, and the retrieval half of a RAG stack):

    documents + embeddings
      -> keyword recall    (text_search_bm25: disjunctive integer-exact
                            BM25 top-20 for the query terms)
      -> vector recall     (exact cosine top-20 for the query
                            embedding — swap in sim_ivf_topk/PQ tiers
                            at deployment scale)
      -> hybrid fusion     (search_hybrid_rrf: reciprocal rank fusion,
                            no cross-tier score calibration)
      -> diversification   (sim_mmr_rerank: maximal marginal relevance
                            over the vector shortlist — near-dup hits
                            cannibalize each other's marginal score)
      -> retrieval report  (per-doc: fused rank, each tier's rank,
                            phrase-match count, MMR membership)

    python examples/retrieval_pipeline.py [sf_dir]

Every stage is a registered, oracle-checked operator; this script only
composes them. The report is one frame: the hybrid top-10 LEFT-joined
to phrase-match counts and MMR picks — joins on doc_id against 10-20
row frames, so composition adds nothing to any tier's plan.
Integration-tested in tests/test_retrieval_pipeline.py.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from projetbigdata_spark.operators.similarity import (  # noqa: E402
    HYBRID_QUERY_VEC,
    search_hybrid_rrf,
    sim_mmr_rerank,
)
from projetbigdata_spark.operators.tfidf import (  # noqa: E402
    text_search_phrase,
    text_search_bm25,
)
from projetbigdata_spark.session import get_spark  # noqa: E402


def retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval report: the hybrid top-10 annotated with every
    tier's signal. Columns: doc_id, rrf_micros, r_text, r_vec,
    n_phrase_matches (0 if the phrase is absent), mmr_pick (True if
    the doc is in the query's MMR-diversified vector selection)."""
    hybrid = search_hybrid_rrf(spark, sf_dir)
    phrase = text_search_phrase(spark, sf_dir).select(
        "doc_id", F.col("n_matches").alias("n_phrase_matches")
    )
    mmr = (
        sim_mmr_rerank(spark, sf_dir)
        .where(F.col("query_id") == HYBRID_QUERY_VEC)
        .select(F.col("neighbor_id").alias("doc_id"))
        .withColumn("mmr_pick", F.lit(True))
    )
    return (
        hybrid.join(phrase, "doc_id", "left")
        .join(mmr, "doc_id", "left")
        .select(
            "doc_id",
            "rrf_micros",
            "r_text",
            "r_vec",
            F.coalesce("n_phrase_matches", F.lit(0))
            .cast("bigint")
            .alias("n_phrase_matches"),
            F.coalesce("mmr_pick", F.lit(False)).alias("mmr_pick"),
        )
        .orderBy(F.col("rrf_micros").desc(), "doc_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("retrieval-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    bm_n = text_search_bm25(spark, sf_dir).count()
    report = retrieve(spark, sf_dir)
    print(f"keyword tier returned {bm_n} docs; hybrid top-10:")
    for r in report.collect():
        print(
            f"  doc {r.doc_id}: rrf={r.rrf_micros} "
            f"text_rank={r.r_text} vec_rank={r.r_vec} "
            f"phrase_hits={r.n_phrase_matches} mmr={r.mmr_pick}"
        )

    # r8: the index-tier menu at fusion level — diffing the brute
    # fused set against the PQ-tier swap is ANN-recall telemetry
    # expressed as ranks (search_hybrid_rrf_ivf is the third column)
    from projetbigdata_spark.operators.similarity import (
        search_hybrid_rrf_pq,
    )
    from projetbigdata_spark.operators.tfidf import (
        text_search_phrase_kslop,
    )

    brute_ids = {r.doc_id for r in report.collect()}
    pq_ids = {r.doc_id for r in search_hybrid_rrf_pq(spark, sf_dir).collect()}
    print(
        f"fusion-tier agreement: |brute ∩ pq| = "
        f"{len(brute_ids & pq_ids)}/{len(brute_ids)}"
    )
    ks = text_search_phrase_kslop(spark, sf_dir).count()
    print(f"k-term proximity tier: {ks} docs match the sloppy phrase")
    spark.stop()


if __name__ == "__main__":
    main()
