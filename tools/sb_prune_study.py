"""Stupid-Backoff model PRUNING study — makes the trigram scorer's
deployment claim ("the frozen model is pruned to fit — the KenLM
move") executable and measured instead of narrated.

The scorer's cost posture says the five model joins are
trigram-VOCABULARY-sized and a deployment prunes the frozen model.
This study quantifies that dial: prune every trigram/bigram count
entry below a min-count threshold T (contexts and totals re-derived
from the PRUNED tables, so the surviving probabilities stay
normalized — the same vocabulary-not-corpus derivation the scorer
documents), re-score the corpus, and report

  - model size (surviving trigram + bigram rows, % of unpruned),
  - score drift: mean / p99 absolute delta vs the unpruned score
    (ppm grid),
  - decision drift: how many docs FLIP their CCNet tercile bucket
    (per-lang head/middle/tail recomputed on the pruned scores) —
    the metric that actually matters, since the bucket is what a
    pipeline acts on.

Pruning pushes more positions onto the backoff path (a pruned
trigram backs off to its bigram, a pruned bigram to the unigram
level), so drift grows smoothly with T rather than cliffing — that
smoothness is what makes min-count pruning the standard size dial.

Usage:
    python tools/sb_prune_study.py [sf_dir=/root/testdata/sf0.1] \
        [thresholds=2,4,8]

Driver-side collects are study-tool reporting on ~|docs|-row frames,
not operator code (the registered queries stay collect-free).
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def tercile_buckets(rows, langs):
    """Per-lang head/middle/tail assignment on (doc_id, lang, score)
    tuples — the corpus_perplexity_buckets rule in Python."""
    by_lang = defaultdict(list)
    for doc_id, lang, s in rows:
        if s is not None:
            by_lang[lang].append(s)
    th = {}
    for lang, scores in by_lang.items():
        srt = sorted(scores, reverse=True)
        n = len(srt)
        th[lang] = (srt[(n + 2) // 3 - 1], srt[(2 * n + 2) // 3 - 1])
    out = {}
    for doc_id, lang, s in rows:
        if s is None:
            out[doc_id] = "unscored"
        else:
            t_head, t_mid = th[lang]
            out[doc_id] = (
                "head" if s >= t_head else ("middle" if s >= t_mid else "tail")
            )
    return out


def main() -> int:
    from projetbigdata_spark.operators.selection import (
        DSIR_TARGET_LANG,
        _sb_model,
        _sb_score_with_model,
    )
    from projetbigdata_spark.session import get_spark
    from projetbigdata_spark.sources.catalog import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    thresholds = (
        [int(t) for t in sys.argv[2].split(",")] if len(sys.argv) > 2 else [2, 4, 8]
    )
    spark = get_spark("sb-prune-study")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == DSIR_TARGET_LANG)
    cnt2, ctx2, tot2, cnt3, ctx3 = _sb_model(target)
    n3_full = cnt3.count()
    n2_full = cnt2.count()

    def scores_of(model):
        return {
            r.doc_id: (r.sb_score_ppm, r.lang)
            for r in _sb_score_with_model(docs, model)
            .join(docs.select("doc_id", "lang"), "doc_id")
            .collect()
        }

    full = scores_of((cnt2, ctx2, tot2, cnt3, ctx3))
    full_rows = [(d, lang, s) for d, (s, lang) in full.items()]
    full_buckets = tercile_buckets(full_rows, None)
    print(
        f"unpruned model: {n3_full} trigrams + {n2_full} bigrams; "
        f"{len(full)} docs scored"
    )
    print(
        "T | trigram rows | bigram rows | model size | mean|Δ| ppm |"
        " p99|Δ| ppm | bucket flips"
    )
    for t in thresholds:
        p3 = cnt3.where(F.col("c3") >= t).localCheckpoint(eager=False)
        p2 = cnt2.where(F.col("c2") >= t).localCheckpoint(eager=False)
        # contexts/totals re-derived from the PRUNED tables (the
        # scorer's own derivation trick) so probabilities stay
        # normalized over survivors
        pctx3 = p3.groupBy(
            F.concat_ws(
                " ",
                F.split("tg", " ").getItem(0),
                F.split("tg", " ").getItem(1),
            ).alias("bg12")
        ).agg(F.sum("c3").alias("cbg12"))
        pctx2 = p2.groupBy(F.split("bg", " ").getItem(0).alias("w")).agg(
            F.sum("c2").alias("cw")
        )
        ptot2 = p2.agg(F.sum("c2").alias("b_total"))
        pruned = scores_of((p2, pctx2, ptot2, p3, pctx3))
        deltas = sorted(
            abs((pruned[d][0] or 0) - (full[d][0] or 0))
            for d in full
            if full[d][0] is not None
        )
        mean_d = sum(deltas) // max(1, len(deltas))
        p99 = deltas[int(0.99 * (len(deltas) - 1))]
        pruned_rows = [(d, lang, s) for d, (s, lang) in pruned.items()]
        pb = tercile_buckets(pruned_rows, None)
        flips = sum(1 for d in full_buckets if pb[d] != full_buckets[d])
        n3 = p3.count()
        n2 = p2.count()
        size_pct = 100.0 * (n3 + n2) / (n3_full + n2_full)
        print(
            f"{t} | {n3} | {n2} | {size_pct:.1f}% | {mean_d} | {p99} |"
            f" {flips}/{len(full)}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
