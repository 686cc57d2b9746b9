"""Generate a soak-scale embeddings corpus for the ANN recall study
(VERDICT r2 item 5 / NEXT item 3): the sf0.1 fixture has only 2,000
vectors, too small to exercise LSH band selectivity or IVF posting-list
skew honestly. This replicates it `factor` times with deterministic
per-replica hash-noise perturbation — replicas are NEAR-duplicates, not
exact copies, so cosine top-k ground truth has no ties and the
neighbor structure is realistic (each original gains factor-1 close
neighbors plus the usual random background).

Replica 0 keeps the original vectors (so vec_id < 10 stay the
designated query set — see operators/similarity.py:N_QUERIES); replica
r >= 1 shifts vec_id by r*(max_id+1) and adds componentwise noise
eps * U[-1, 1] derived from xxhash64(vec_id, component index) — fully
deterministic, no RNG state.

Usage:
    python examples/gen_ann_soak.py [factor=10] [eps=0.05] \
        [src=/root/testdata/sf0.1] [out=/tmp/soak/ann]
Then:   pytest tests/test_similarity_recall.py -k soak
"""

from __future__ import annotations

import os
import sys
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projetbigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    eps = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/soak/ann"
    spark = get_spark("gen-ann-soak")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    off = emb.agg(F.max("vec_id")).first()[0] + 1

    def replica(r: int):
        if r == 0:
            return emb
        shifted = emb.select(
            (F.col("vec_id") + F.lit(r * off)).alias("vec_id"),
            F.col("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        # componentwise deterministic noise in [-eps, eps]:
        # xxhash64 of (new vec_id, component index) -> uniform grid
        noise = F.expr(
            f"""
            transform(embedding, (x, i) ->
                CAST(x + {eps} *
                     ((pmod(xxhash64(vec_id, i), 2001) - 1000) / 1000.0)
                 AS FLOAT))
            """
        )
        return shifted.withColumn("embedding", noise)

    full = reduce(lambda a, b: a.unionByName(b), [replica(r) for r in range(factor)])
    full.repartition(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    n = spark.read.parquet(f"{out}/embeddings.parquet").count()
    print(f"wrote {n} vectors ({factor}x{off}) to {out}/embeddings.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
