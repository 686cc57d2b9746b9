"""Benchmark runner (driver contract): times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced with a noop-format write — full distributed
execution, zero driver collect — so timings measure the plans, not
row shipping to Python.

Per-query numbers are BEST-OF-N (default 3, $SPARK_GRAFT_BENCH_ITERS)
warm repeats: two rounds of n>=7 triage (SCALE.md, r4/r5) showed
single-shot timings swing up to 1.8x under transient machine load
while steady-state minima are stable to a few percent — best-of-3 is
what a capacity decision would actually be based on. First-call
timings (persist population + codegen) are kept in "first_call" so
the cold-path cost stays visible instead of silently dropped.
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

# r6 (VERDICT r5 item 5): the r5 surface's heavy hitters get driver-
# bench tracking in their own group — the original 21-query HEADLINE
# list and its "value" metric stay untouched for series continuity
# (r1..r5 totals remain comparable); the extended group reports
# separately as "extended" / "extended_total".
EXTENDED = [
    "corpus_curate_calibrated",
    "text_search_bm25",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "dedup_semantic",
    # r7 heavy hitter (bigram-family floor, ~5s at sf0.1)
    "corpus_dsir_weights_hashed",
    # r8: the learned quality filter — cheap (~1.3s at sf0.1) but
    # bench-tracked because it is the one-pass scoring plan a 100 TB
    # curation run pays per corpus sweep
    "corpus_quality_classifier_scores",
    # r9: line-granularity dedup — same rationale: the per-sweep
    # rewrite pass a CCNet-style curation run pays per corpus
    "dedup_lines",
    # r9 second wave: the CCNet LM cut (trigram Stupid-Backoff scorer
    # + per-lang terciles) — the heaviest new corpus-sweep plan
    # (~7.5s at sf0.1), bench-tracked like the classifier scorer
    "corpus_perplexity_buckets",
    # r9 third wave: the full Gopher repetition profile — the widest
    # per-sweep gram fan-out in the repo (9 n-gram sizes, two skinny
    # streams; ~2s at sf0.1), the rule-filter cost a Gopher-style
    # curation run pays before anything learned
    "text_gopher_repetition",
    # r11 (VERDICT r10 item 8): the two r10 compositions are stable
    # registered surfaces with soak rows — give them a round-over-round
    # bench series (headline stays the r1 21-query list, r6 convention)
    "corpus_ccnet_select",
    "text_trigram_backoff_score_pruned",
    # r12 (VERDICT r11 item 7): the guessed-key variants next to their
    # metadata twin — the guessed-vs-metadata wall delta gets a
    # tracked trend, and the multi-class row starts its series
    "corpus_ccnet_select_guessed",
    "corpus_ccnet_select_guessed_multi",
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

    n_iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))

    def run_group(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        timings: dict[str, float] = {}
        first: dict[str, float] = {}
        for name in names:
            runs = []
            for _ in range(n_iters):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 3))
            first[name] = runs[0]
            timings[name] = min(runs)
        return timings, first

    load_before = os.getloadavg()
    timings, first_call = run_group(HEADLINE)
    extended, extended_first = run_group(EXTENDED)
    load_after = os.getloadavg()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # r11 fix (VERDICT r10 item 2): the driver tail-captures stdout and
    # the single all-detail JSON line outgrew its window at r9/r10
    # (BENCH_r09/10.json carry "parsed": null with the tail starting
    # mid-line). Emit the FULL detail record FIRST (plus a copy on
    # disk), then the compact machine-readable summary as the LAST
    # line, so the tail window always holds one complete JSON object.
    detail = {
        "metric": "headline_queries_total_detail",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "first_call": first_call,
        "extended": extended,
        "extended_total": round(sum(extended.values()), 3),
        "extended_first_call": extended_first,
        "iters": n_iters,
        # load evidence (VERDICT r8 item 6): three rounds of
        # driver-shot jitter (r4 +24%, r7 phantom ×4, r8 +19%)
        # were machine load, not code — loadavg_before above
        # ~a few on this 32-thread box means the shot ran
        # contended and the totals should be read against the
        # same-round n=7 steady-state reference in SCALE.md.
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
        "cpu_count": len(os.sched_getaffinity(0)),
        "sf": sf_val,
    }
    print(json.dumps(detail))
    try:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
        )
        with open(detail_path, "w") as fh:
            json.dump(detail, fh)
    except OSError:
        pass  # detail file is a convenience; stdout already has it
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended_total": round(sum(extended.values()), 3),
                "loadavg_before": round(load_before[0], 2),
                "iters": n_iters,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
