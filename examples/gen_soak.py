"""Generate a soak-scale copy of the driver fixtures by replicating the
big tables `factor` times with consistently shifted keys (FK integrity
preserved: orders and lineitem shift by the SAME orderkey offset), so
the headline queries can be profiled at ~10x the per-round bench scale
for spill / shuffle-partition sizing (SCALE.md).

Dimensions (region/nation/customer/supplier/part) are copied unscaled —
each customer simply owns factor-times more orders, which is the
realistic direction of fact/dim skew. Query vectors (vec_id < 10) stay
the designated query set; their replicas become exact-copy neighbors.

Usage:
    python examples/gen_soak.py [factor=10] [src=/root/testdata/sf0.1] \
        [out=/tmp/soak/sf1]
    SPARK_GRAFT_SF_DIR=/tmp/soak/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from projetbigdata_spark.session import get_spark  # noqa: E402

COPY_TABLES = ("region", "nation", "customer", "supplier", "part")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/soak/sf1"
    spark = get_spark("gen-soak")
    spark.sparkContext.setLogLevel("ERROR")
    # events ts is TIMESTAMP(NANOS); read as raw long and write the long
    # through — load_events handles either layout via `ts div 1000`
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for t in COPY_TABLES:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    def key_offset(table: str, key: str) -> int:
        return (
            spark.read.parquet(f"{src}/{table}.parquet").agg(F.max(key)).first()[0]
            + 1
        )

    orderkey_off = key_offset("orders", "o_orderkey")
    shift_plan = [
        ("orders", {"o_orderkey": orderkey_off}),
        ("lineitem", {"l_orderkey": orderkey_off}),
        ("events", {"event_id": key_offset("events", "event_id")}),
        ("documents", {"doc_id": key_offset("documents", "doc_id")}),
        ("embeddings", {"vec_id": key_offset("embeddings", "vec_id")}),
    ]
    for table, offsets in shift_plan:
        base = spark.read.parquet(f"{src}/{table}.parquet")
        replicas = []
        for i in range(factor):
            r = base
            for key, off in offsets.items():
                r = r.withColumn(key, F.col(key) + F.lit(i * off))
            replicas.append(r)
        reduce(lambda a, b: a.union(b), replicas).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        print(f"{table}: x{factor} written", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
