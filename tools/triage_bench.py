"""n>=5 warm re-timing of queries the r3 driver bench flagged as
regressed (VERDICT r3 item 2): sim_ivf_topk 3.03->3.84s and
dedup_components_minhash 2.60->3.34s, neither with a plan change.
Replicates the driver config (sf0.1, local[32], noop-format force),
runs each query N warm iterations after the standard bench warmup,
prints per-iteration times + min/median so noise vs drift is
decidable at n>=5 rather than best-of-3.

    python tools/triage_bench.py [n_iters] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = ["sim_ivf_topk", "dedup_components_minhash"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from projetbigdata_spark import registry
    from projetbigdata_spark.session import get_spark

    spark = get_spark("projetbigdata-triage")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry.collect()

    for warm in ("q1_pricing_summary", "dedup_exact", "sim_lsh_buckets"):
        queries[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "iters": times,
            "min": min(times),
            "median": round(statistics.median(times), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print("TRIAGE_RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
