"""Per-query shuffle-write BYTE budgets (VERDICT r3 item 8).

tests/test_plans.py pins exchange COUNTS — a new shuffle fails there.
This gate pins shuffle-write VOLUME: the same exchange silently getting
fatter (lost column pruning, lost map-side partial agg, a raw ~100-byte
string shuffling where an 8-byte hashed key used to) passes the count
budget but regresses real-cluster cost linearly, and at 100 TB a 2x
wider shuffle IS the bottleneck.

Measurement needs per-stage shuffleWriteBytes from the status REST API,
which needs spark.ui.enabled — a SparkContext-creation-time conf the
shared conftest session doesn't carry — so the gate shells out to
`tools/shuffle_report.py --check` (its own JVM, ~1 min). Budgets are
2x the SHUFFLE.md r4 measurement with a 1 MB floor, pinned in
tools/shuffle_report.py BYTE_BUDGET_MB next to the measurement code.

Demonstrated failing on an injected regression via
`--budget-scale 0.1` (r4: all 14 gated queries breach, exit 1).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

# r13: the gate runs at sf0.01 (budgets re-pinned in
# tools/shuffle_report.py BYTE_BUDGET_MB_SF001) — a shuffle that gets
# fatter breaches proportionally at any SF, and the dedicated-JVM
# subprocess drops from 200+s to ~60s, which is what let the r12
# driver battery run out of its wall-clock window mid-suite. The
# sf0.1 table stays in the tool for manual full-scale checks.
SF_GATE = "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_GATE)
    or os.environ.get("SPARK_GRAFT_SKIP_BENCH_BUDGET") == "1",
    reason="sf0.01 fixtures absent or budget gates disabled",
)


def test_shuffle_byte_budgets():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "shuffle_report.py"),
         "--check", "--sf", SF_GATE],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        "shuffle-byte budget breach:\n"
        + "\n".join(
            line
            for line in (proc.stdout + proc.stderr).splitlines()
            if "BREACH" in line or "Error" in line
        )
    )
