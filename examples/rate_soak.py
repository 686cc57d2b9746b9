"""Rate-source streaming soak (NEXT r2 item 4): drive the watermarked
session-window and tumbling jobs from Spark's built-in rate source for
a sustained period and watch the state store — the property under test
is that WATERMARKS BOUND STATE: the rate source emits one event per
user (value % 100) every ~second forever, so an unbounded-state bug
shows up as monotonically growing `numRowsTotal` while a healthy job
plateaus (≤ ~|users| open sessions + a few open tumbling windows).

Prints one JSON line per sampled progress and a final summary:
    {"job": ..., "samples": N, "rows_per_sec": ..., "max_state_rows":
     ..., "last_state_rows": ..., "state_bounded": true, ...}

Usage:
    python examples/rate_soak.py [seconds=120] [rows_per_second=500] [users=100]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projetbigdata_spark.session import get_spark  # noqa: E402
from projetbigdata_spark.streaming.jobs import (  # noqa: E402
    open_events_stream,
    session_windows_stream,
    tumbling_counts_stream,
)

N_USERS = 100  # default; overridden by argv[3]


def soak(spark, job_fn, name: str, seconds: int, rps: int, users: int = N_USERS) -> dict:
    events = open_events_stream(
        spark, {"kind": "rate", "rows_per_second": rps, "users": users}
    )
    q = (
        job_fn(events)
        .writeStream.format("memory")
        .queryName(f"{name}_soak")
        .outputMode("append" if name == "session" else "complete")
        .start()
    )
    state_rows, processed = [], []
    deadline = time.time() + seconds
    try:
        while time.time() < deadline:
            time.sleep(5)
            p = q.lastProgress
            if not p:
                continue
            ops = p.get("stateOperators") or []
            rows = sum(op.get("numRowsTotal", 0) for op in ops)
            state_rows.append(rows)
            processed.append(p.get("processedRowsPerSecond") or 0.0)
            print(
                json.dumps(
                    {
                        "job": name,
                        "batch": p.get("batchId"),
                        "state_rows": rows,
                        "rows_per_sec": round(processed[-1], 1),
                        "state_mem_bytes": sum(
                            op.get("memoryUsedBytes", 0) for op in ops
                        ),
                    }
                )
            )
    finally:
        q.stop()
    # bounded = the tail stopped growing: last sample within a small
    # slack of the max, and max under the structural ceiling
    ceiling = users + users // 2 + 50 if name == "session" else 200
    summary = {
        "job": name,
        "samples": len(state_rows),
        "rows_per_sec": round(sum(processed) / max(len(processed), 1), 1),
        "max_state_rows": max(state_rows, default=0),
        "last_state_rows": state_rows[-1] if state_rows else 0,
        "state_ceiling": ceiling,
        "state_bounded": bool(state_rows)
        and max(state_rows) <= ceiling,
    }
    print(json.dumps(summary))
    return summary


def main() -> int:
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    rps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    users = int(sys.argv[3]) if len(sys.argv) > 3 else N_USERS
    spark = get_spark("rate-soak")
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for name, fn in (
        ("session", session_windows_stream),
        ("tumbling", tumbling_counts_stream),
    ):
        s = soak(spark, fn, name, seconds, rps, users)
        ok = ok and s["state_bounded"] and s["rows_per_sec"] > 0
    spark.stop()
    print(json.dumps({"rate_soak_ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
