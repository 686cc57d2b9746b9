"""join_key_skew_report: the count-of-counts quantile recipe must
match a naive Python model of per-key frequency percentiles, and the
summary invariants must hold."""

from __future__ import annotations

import math

from tests.conftest import SF_CHECK


def test_skew_report_matches_python_model(spark):
    from projetbigdata_spark.operators.quality import (
        SKEW_QUANTILES,
        join_key_skew_report,
    )
    from projetbigdata_spark.sources.catalog import load_events, load_table

    expected = {}
    for label, frame, key in (
        ("lineitem.l_orderkey",
         load_table(spark, SF_CHECK, "lineitem"), "l_orderkey"),
        ("events.user_id", load_events(spark, SF_CHECK), "user_id"),
    ):
        counts = {}
        for r in frame.select(key).collect():
            counts[r[0]] = counts.get(r[0], 0) + 1
        ns = sorted(counts.values())
        n_keys, total = len(ns), sum(ns)
        # integer-rank ceiling: smallest count with cumulative key
        # mass >= ceil(q% of n_keys)
        qs = {}
        for q in SKEW_QUANTILES:
            rank = math.ceil(n_keys * q / 100)
            qs[q] = ns[rank - 1]
        expected[label] = (
            n_keys,
            total,
            ns[-1],
            *[qs[q] for q in SKEW_QUANTILES],
            (ns[-1] * n_keys * 1_000_000) // total,
        )

    got = {
        r.join_key: (
            r.n_keys, r.total_rows, r.max_rows, r.p50_rows, r.p99_rows,
            r.skew_ratio_ppm,
        )
        for r in join_key_skew_report(spark, SF_CHECK).collect()
    }
    assert got == expected

    for label, (nk, tot, mx, p50, p99, ratio) in got.items():
        assert 0 < p50 <= p99 <= mx, label
        assert ratio >= 1_000_000, label  # max >= mean always
