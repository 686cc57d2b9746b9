"""Freshness-floor invariant (VERDICT r10 item 5): every registered
query's latest green driver CORRECTNESS row is at most
MAX_STALE_ROUNDS old, per the merged committed ledgers.

This is a pure ledger/registry check — no SparkSession — so rotation
slips fail the build the moment the next ledger is committed, instead
of surviving as stale registry comments.
"""

from __future__ import annotations

from tools.freshness_report import (
    MAX_STALE_ROUNDS,
    current_round,
    merged_freshness,
    violations,
)


def test_ledgers_present_and_parse() -> None:
    latest = merged_freshness()
    assert latest, "no CORRECTNESS_r*.json ledgers found"
    assert current_round() >= 10


def test_every_registered_query_within_freshness_floor() -> None:
    bad = violations(MAX_STALE_ROUNDS)
    assert not bad, (
        f"rotation slipped: {len(bad)} registered queries have no green "
        f"driver check within {MAX_STALE_ROUNDS} rounds: {bad}. "
        "Fix: move them into registry._PRIORITY's leading 50 slots."
    )
