"""Freshness-floor audit over the committed driver CORRECTNESS ledgers.

The driver checks only the first ~50 registered queries per round, so
the registry's _PRIORITY rotation is what keeps all 200+ queries
re-verified. Until r11 the rotation policy (registry.py comments +
NEXT.md) was enforced only by reading the ledger comments; VERDICT r10
item 5 asks for an executable invariant: merge every committed
CORRECTNESS_r*.json and assert that each registered query's latest
green driver check is at most MAX_STALE_ROUNDS old.

"Green" per ledger entry:
  - full-oracle rows: err is null AND rows_match AND schema_match AND
    hash_match;
  - declared rows-only rows (the mllib fits — no DuckDB oracle by
    design): err == 'no_oracle' AND spark_rows is a non-negative int
    (the driver ran the query and it produced a stable frame).

Usage:
  python tools/freshness_report.py                  # table + histogram
  python tools/freshness_report.py --check          # exit 1 on violation
  python tools/freshness_report.py --simulate-next  # pretend the
      current _PRIORITY block goes green in the NEXT round's ledger
      and report which queries would then violate the floor — run
      this BEFORE committing a rotation (the r11 workflow, made a
      flag)

The pytest wrapper (tests/test_freshness_floor.py) imports
merged_freshness()/current_round() so the invariant runs in CI.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Worst-case allowed staleness, in rounds, for a registered query's
# latest green driver check. With ~224 queries and a 50-slot block the
# steady-state rotation refreshes everything every ~4-5 rounds; 5 is
# the floor VERDICT r10 named. Queries first registered AFTER the
# latest committed ledger (this round's additions) are exempt — their
# first driver row lands next round by rule a.
MAX_STALE_ROUNDS = 5


def _entry_green(v: dict) -> bool:
    if v.get("err") == "no_oracle":
        return isinstance(v.get("spark_rows"), int) and v["spark_rows"] >= 0
    return (
        v.get("err") is None
        and v.get("rows_match") is True
        and v.get("schema_match") is True
        and v.get("hash_match") is True
    )


def ledger_paths() -> list[str]:
    return sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))


def current_round() -> int:
    """Round number of the latest committed ledger."""
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in ledger_paths()
    ]
    return max(rounds) if rounds else 0


def merged_freshness() -> dict[str, int]:
    """query -> latest round with a green driver check (absent if never)."""
    latest: dict[str, int] = {}
    for path in ledger_paths():
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            ledger = json.load(fh)
        for name, entry in ledger.items():
            if _entry_green(entry):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def violations(max_stale: int = MAX_STALE_ROUNDS) -> list[tuple[str, int | None]]:
    """Registered queries whose latest green check is too old (or absent).

    Returns (name, latest_green_round_or_None) pairs. Queries never seen
    in ANY ledger are treated as this-round additions (exempt — the
    driver hasn't had a chance yet); queries seen but never green are
    violations outright.
    """
    sys.path.insert(0, REPO)
    from projetbigdata_spark import registry

    queries, _ = registry.collect()
    latest = merged_freshness()
    ever_seen: set[str] = set()
    for path in ledger_paths():
        with open(path) as fh:
            ever_seen.update(json.load(fh))
    cur = current_round()
    bad: list[tuple[str, int | None]] = []
    for name in queries:
        if name not in ever_seen:
            continue  # registered this round; first driver row pending
        green = latest.get(name)
        if green is None or cur - green > max_stale:
            bad.append((name, green))
    return bad


def simulate_next_violations(
    max_stale: int = MAX_STALE_ROUNDS,
) -> list[tuple[str, int | None]]:
    """Pretend the next round's ledger lands with the current
    _PRIORITY block's first 50 queries green, and return the queries
    that would THEN violate the floor — the pre-commit check for a
    registry rotation (empty result = the rotation holds the floor
    through the next round)."""
    sys.path.insert(0, REPO)
    from projetbigdata_spark import registry

    queries, _ = registry.collect()
    nxt = current_round() + 1
    latest = merged_freshness()
    for name in list(queries)[:50]:
        latest[name] = nxt
    ever_seen: set[str] = set()
    for path in ledger_paths():
        with open(path) as fh:
            ever_seen.update(json.load(fh))
    bad: list[tuple[str, int | None]] = []
    for name in queries:
        if name not in ever_seen and name not in list(queries)[:50]:
            continue  # brand-new and unchecked either way
        green = latest.get(name)
        if green is None or nxt - green > max_stale:
            bad.append((name, green))
    return bad


def main() -> None:
    check = "--check" in sys.argv
    if "--simulate-next" in sys.argv:
        bad = simulate_next_violations()
        if bad:
            print(f"rotation would leave {len(bad)} floor violations "
                  f"after the next ledger:")
            for name, green in bad:
                print(f"  {name}: latest green "
                      f"{'never' if green is None else f'r{green}'}")
            sys.exit(1)
        print("rotation OK: zero floor violations after the next ledger")
        return
    latest = merged_freshness()
    cur = current_round()
    hist: dict[int, int] = {}
    for rnd in latest.values():
        hist[rnd] = hist.get(rnd, 0) + 1
    print(f"latest committed ledger: r{cur}")
    print("freshness histogram (latest green round -> #queries):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")
    bad = violations()
    if bad:
        print(f"VIOLATIONS (> {MAX_STALE_ROUNDS} rounds stale): {len(bad)}")
        for name, green in bad:
            print(f"  {name}: latest green {'never' if green is None else f'r{green}'}")
    else:
        print(f"floor OK: every registered query green within {MAX_STALE_ROUNDS} rounds")
    if check and bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
