"""N_SHARDS study for docs_pack_nextfit (NEXT r7 candidate 7): the
waste-vs-parallelism trade the operator docstring documents, measured.

Next-fit packs per shard, so shard count buys task parallelism but
pays one partially-filled FINAL pack per shard (plus next-fit's usual
fragmentation) — waste_ppm should grow roughly linearly in shards
while wall-clock falls until tasks outnumber cores.

    python tools/nextfit_shard_study.py [sf_dir ...]

Prints one line per (sf_dir, n_shards): docs, packs, tokens,
waste_ppm = (packs·BUDGET − tokens) · 1e6 / (packs·BUDGET) over packs
holding no oversized doc, and wall seconds (best of 2 warm).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/soak/sf1"]
    from projetbigdata_spark.operators import packing
    from projetbigdata_spark.session import get_spark

    spark = get_spark("nextfit-shard-study")
    spark.sparkContext.setLogLevel("ERROR")

    budget = packing.PACK_BUDGET
    original = packing.N_SHARDS
    try:
        for sf in sf_dirs:
            for n_shards in (8, 32, 64):
                packing.N_SHARDS = n_shards
                walls = []
                for _ in range(3):
                    t0 = time.time()
                    packing.docs_pack_nextfit(spark, sf).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    walls.append(time.time() - t0)
                df = packing.docs_pack_nextfit(spark, sf)
                packs = (
                    df.groupBy("pack_id")
                    .agg(
                        F.sum("n_tokens").alias("fill"),
                        F.count("*").alias("n_docs"),
                    )
                )
                s = packs.where(
                    ~((F.col("n_docs") == 1) & (F.col("fill") > budget))
                ).agg(
                    F.count("*").alias("n_packs"),
                    F.sum("fill").alias("tokens"),
                ).first()
                waste_ppm = (
                    (s.n_packs * budget - s.tokens)
                    * 1_000_000
                    // (s.n_packs * budget)
                )
                print(
                    f"{sf} shards={n_shards}: packs={s.n_packs} "
                    f"tokens={s.tokens} waste_ppm={waste_ppm} "
                    f"wall={min(walls[1:]):.2f}s"
                )
    finally:
        packing.N_SHARDS = original


if __name__ == "__main__":
    main()
