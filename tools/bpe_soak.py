"""BPE training at deployment-ish merge counts (VERDICT r4 item 4).

The registered corpus_bpe_merges query is pinned at 3 merges because
its oracle unrolls one CTE pair per step; a real tokenizer trains
30k+. This soak runs the SAME training loop (_bpe_initial_state /
_bpe_top_pair / _bpe_apply_merge) for ~100 merges and answers the two
questions the registered query can't:

  1. wall-per-merge trajectory — does the per-step localCheckpoint
     chain keep step cost flat, or does lineage/caching overhead grow
     with step count? (the thing that decides whether 30k merges is
     30k * step_cost or superlinear);
  2. checkpoint accumulation — getPersistentRDDs() count per step:
     localCheckpoint pins each step's state in executor storage, and
     if the old states are never evicted a 30k-merge run holds 30k
     vocab-sized RDDs.

Two corpora:
  - sf1: the /tmp/soak/sf1 documents (50k docs, ~31-word vocabulary)
    — isolates ITERATION overhead, since the data per step is tiny;
  - synth: a seeded 30k-distinct-word Zipfian vocabulary — exercises
    the VOCABULARY dimension (trainer cost is ∝ |vocab|, the
    distinct-word trick's whole point).

Parity: the learned merge table is checked against the pure-Python
reference trainer from tests/test_text_properties.py at the full
merge count (word counts are collected ONCE for the model — soak
telemetry, not a query path).

    python tools/bpe_soak.py [n_merges] [sf1|synth|both] [--unpersist]

--unpersist enables the explicit old-state eviction fix (see
_run_soak) so its effect is measurable A/B.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = "/tmp/soak/sf1"
SYNTH_VOCAB = 30_000
SEED = 20260814


def _python_bpe(word_counts, n_merges):
    """Reference trainer (same as tests/test_text_properties.py)."""
    from collections import Counter

    state = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best_n = max(pc.values())
        p1, p2 = min(p for p, c in pc.items() if c == best_n)
        merges.append((step, p1, p2, best_n))
        new = {}
        for syms, c in state.items():
            out = []
            for x in syms:
                if out and out[-1] == p1 and x == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + c
        state = new
    return merges


def _synth_words(spark):
    """Seeded Zipfian (w, wc) vocabulary: SYNTH_VOCAB distinct words,
    3-10 lowercase chars, count ∝ 1/rank."""
    rng = random.Random(SEED)
    seen = set()
    rows = []
    while len(rows) < SYNTH_VOCAB:
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(3, 10))
        )
        if w in seen:
            continue
        seen.add(w)
        rows.append((w, max(1, SYNTH_VOCAB // (len(rows) + 1))))
    return spark.createDataFrame(rows, "w string, wc long").repartition(32)


def _run_soak(spark, name, words_df, n_merges, unpersist):
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.textstats import (
        _bpe_apply_merge,
        _bpe_top_pair,
    )

    sc = spark.sparkContext
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    # collect word counts ONCE for the Python reference model
    wc = {r["w"]: r["wc"] for r in words_df.collect()}
    state = words_df.select("wc", chars.alias("syms")).localCheckpoint(
        eager=False
    )
    walls, rdd_counts, learned = [], [], []
    prev_states = []
    for step in range(1, n_merges + 1):
        t0 = time.perf_counter()
        top = _bpe_top_pair(state, step).localCheckpoint(eager=False)
        rows = top.collect()  # 1-row-or-empty; forces the top checkpoint
        new_state = _bpe_apply_merge(state, top)
        new_state.count()  # force this step's state checkpoint
        walls.append(round(time.perf_counter() - t0, 3))
        if unpersist:
            # the eviction fix under test: localCheckpoint pins are
            # NOT evictable via DataFrame.unpersist (that only talks
            # to the CacheManager) — the working mechanism is dropping
            # every reference and letting ContextCleaner reap the
            # checkpoint RDD via its weak-ref queue after a driver GC
            del state, top
            if step % 10 == 0:
                import gc

                gc.collect()
                spark._jvm.System.gc()
        else:
            prev_states.append(state)  # keep the chain referenced
        state = new_state
        rdd_counts.append(sc._jsc.getPersistentRDDs().size())
        if rows:
            r = rows[0]
            learned.append((r["step"], r["p1"], r["p2"], r["n"]))

    expect = _python_bpe(wc, n_merges)
    parity = learned == expect
    deciles = [walls[i] for i in range(0, len(walls), max(1, len(walls) // 10))]
    out = {
        "corpus": name,
        "n_merges": n_merges,
        "learned": len(learned),
        "parity_vs_python_model": parity,
        "unpersist_fix": unpersist,
        "wall_total_s": round(sum(walls), 2),
        "wall_first": walls[0],
        "wall_last": walls[-1],
        "wall_decile_samples": deciles,
        "persistent_rdds_first": rdd_counts[0],
        "persistent_rdds_last": rdd_counts[-1],
    }
    print(json.dumps(out), flush=True)
    if not parity:
        print(
            json.dumps(
                {
                    "corpus": name,
                    "first_divergence": next(
                        (
                            {"got": g, "want": w}
                            for g, w in zip(learned, expect)
                            if g != w
                        ),
                        {"len_got": len(learned), "len_want": len(expect)},
                    ),
                }
            ),
            flush=True,
        )
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    unpersist = "--unpersist" in sys.argv

    from pyspark.sql import functions as F

    from projetbigdata_spark.functions.text import tokenize
    from projetbigdata_spark.session import get_spark
    from projetbigdata_spark.sources.catalog import load_table

    spark = get_spark("projetbigdata-bpe-soak")
    spark.sparkContext.setLogLevel("ERROR")

    if which in ("sf1", "both"):
        docs = load_table(spark, SF1_DIR, "documents")
        words = (
            docs.select(F.explode(tokenize("text")).alias("w"))
            .where(~F.col("w").contains("\x01"))
            .groupBy("w")
            .agg(F.count("*").alias("wc"))
        )
        _run_soak(spark, "sf1", words, n, unpersist)
    if which in ("synth", "both"):
        _run_soak(spark, "synth", _synth_words(spark), n, unpersist)
    spark.stop()


if __name__ == "__main__":
    main()
