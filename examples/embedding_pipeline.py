"""End-to-end embedding-corpus pipeline — the similarity-side
extension families composed into ONE distributed dataflow, the way
the curation example (examples/corpus_curation.py) composes the text
side:

    embeddings
      -> hygiene audit     (embed_l2norm: zero/degenerate vectors
                            surface as NULL norms and are excluded)
      -> storage audit     (embed_quantize_int8: reconstruction error
                            of the int8 tier — decides whether cold
                            shards can store 4x smaller vectors)
      -> frozen IVF index  (build_ivf_base_index: sampled-trained
                            quantizer + base posting lists, built ONCE)
      -> incremental ingest (incremental_ann_match: the deterministic
                            new-arrivals slice probed against the base
                            index — new x old, never a rescan)
      -> near-dup verdicts (arrivals whose best base cosine exceeds
                            the near-dup threshold are flagged, the
                            embedding-side analog of dedup_incremental)
      -> parquet sink      (top-k neighbors + verdict per arrival)

    python examples/embedding_pipeline.py [sf_dir] [out_dir]

Every stage is a registered, oracle-checked operator or its shared
core; this script only composes them. Integration-tested in
tests/test_embedding_pipeline.py. The streaming spelling of the
ingest stage is streaming/jobs.ann_ingest_stream (same match core,
equality pinned in tests/test_streaming.py).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from projetbigdata_spark.operators.quantize import (  # noqa: E402
    embed_quantize_int8,
)
from projetbigdata_spark.operators.similarity import (  # noqa: E402
    COSINE_THRESHOLD,
    _cached_micro_arr,
    _is_new_col,
    _with_norm,
    build_ivf_base_index,
    incremental_ann_match,
)
from projetbigdata_spark.session import get_spark  # noqa: E402
from projetbigdata_spark.sources.catalog import load_table  # noqa: E402

K_INDEX = 16  # fixture-scale codebook; deployments pass k ~ sqrt(n)
N_PROBE = 4


def ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arrival verdict frame: top-k base neighbors + is_neardup.
    Deterministic — same input always yields byte-identical output."""
    # 1. index the BASE corpus once (sampled-trained, frozen codebook)
    cents, posting, base_norm = build_ivf_base_index(
        spark, sf_dir, k=K_INDEX
    )

    # 2. the arriving slice, hygiene-filtered: vectors with NULL norm
    # (zero/empty) can't participate in cosine and are dropped here
    # rather than crashing a divide downstream
    new_micro = _cached_micro_arr(spark, sf_dir).where(_is_new_col())
    new_norm = _with_norm(
        load_table(spark, sf_dir, "embeddings").where(_is_new_col())
    ).where(F.col("norm").isNotNull())

    # 3. probe the frozen index: new x old only
    matches = incremental_ann_match(
        new_micro, new_norm, cents, posting, base_norm, nprobe=N_PROBE
    )

    # 4. near-dup verdict per arrival from its best base neighbor
    best = matches.where(F.col("rnk") == 1).select(
        F.col("query_id"),
        F.col("neighbor_id").alias("best_match"),
        F.col("cosine").alias("best_cosine"),
        (F.col("cosine") >= COSINE_THRESHOLD).alias("is_neardup"),
    )
    return matches.join(best, "query_id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/embedding_ingest"
    spark = get_spark("embedding-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # storage audit: worst int8 reconstruction error over the corpus
    worst = (
        embed_quantize_int8(spark, sf_dir)
        .agg(F.max("max_abs_err").alias("worst"))
        .collect()[0]["worst"]
    )
    print(f"int8 worst reconstruction error: {worst}")

    # diversity audit: cluster-balanced sampling over the same space
    # (r8) — how much mass the balanced corpus would keep per cluster
    from projetbigdata_spark.operators.similarity import (
        corpus_cluster_balance_sample,
    )

    bal = corpus_cluster_balance_sample(spark, sf_dir)
    b = bal.agg(
        F.count("*").alias("n"),
        F.sum(F.col("selected").cast("int")).alias("sel"),
        F.countDistinct("cid").alias("k"),
    ).first()
    print(
        f"cluster balance: {b.sel}/{b.n} vectors kept across {b.k} clusters"
    )

    verdicts = ingest(spark, sf_dir)
    verdicts.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    n_arrivals = back.select("query_id").distinct().count()
    n_neardup = (
        back.where("is_neardup").select("query_id").distinct().count()
    )
    print(f"arrivals: {n_arrivals}, flagged near-dup: {n_neardup}")
    spark.stop()


if __name__ == "__main__":
    main()
