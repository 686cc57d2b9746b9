"""IVF k/nprobe sweep at the 100k-vector ANN soak corpus (VERDICT r3
item 4): deployment-realistic k in {64, 128, 256} for the SAMPLED
trainer (the 100 TB shape), recall vs brute-force top-5 + wall time.
Results land in SCALE.md; the k=128 recall floor is pinned in
tests/test_similarity_recall.py::test_soak_ivf_k128_recall.

    python examples/gen_ann_soak.py 50 0.05 /root/testdata/sf0.1 \
        /tmp/soak/ann100k
    python tools/ivf_k_sweep.py [corpus_dir=/tmp/soak/ann100k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEP = [(64, 8), (128, 8), (128, 16), (256, 16)]


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak/ann100k"
    from projetbigdata_spark.operators.similarity import (
        sim_ivf_sampled_topk,
        sim_topk_bruteforce,
    )
    from projetbigdata_spark.session import get_spark

    spark = get_spark("ivf-k-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    truth = {
        (r.query_id, r.neighbor_id)
        for r in sim_topk_bruteforce(spark, corpus).collect()
    }
    print(f"corpus={corpus} truth pairs={len(truth)}")
    for k, nprobe in SWEEP:
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.neighbor_id)
            for r in sim_ivf_sampled_topk(
                spark, corpus, k=k, nprobe=nprobe
            ).collect()
        }
        wall = time.perf_counter() - t0
        recall = len(truth & got) / len(truth)
        print(
            f"k={k:4d} nprobe={nprobe:3d} recall@5={recall:.3f} "
            f"scanned~{nprobe / k:.3f} wall={wall:.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
