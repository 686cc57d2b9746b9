"""Benchmark runner (driver contract): times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced with a noop-format write — full distributed
execution, zero driver collect — so timings measure the plans, not
row shipping to Python.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "vocab_topk",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q9_product_profit",
    "q18_large_orders",
    "join_asof_purchase_click",
    "window_rank_orders",
    "text_tfidf_top",
    "bow_vectorize",
    "dedup_jaccard_pairs",
    "dedup_minhash_buckets",
    "sim_topk_bruteforce",
    "sim_ann_lsh_topk",
    "sim_ivf_topk",
    "events_session_30m",
    "events_multi_rollup",
    "events_gaps_islands",
    "dedup_components_minhash",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from projetbigdata_spark import registry
    from projetbigdata_spark.session import get_spark

    spark = get_spark("projetbigdata-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry.collect()

    # warm the JVM/parquet footers so no timed query pays one-time costs:
    # one cheap query per table family (lineitem+orders, documents, events,
    # embeddings)
    for warm in (
        "q1_pricing_summary",
        "dedup_exact",
        "events_tumbling_1h",
        "sim_lsh_buckets",
    ):
        queries[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
