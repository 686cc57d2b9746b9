"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 next to its ``oracle_sql()``
DuckDB twin and compares row count, column names, pandas dtypes, and a
dtype-strict value hash (columns sorted by name, rows sorted) — the
same failure surface the driver's CORRECTNESS_r{N}.json records.

Also records per-query wall time so the slow families (which burn the
driver's fixed check budget) are visible.

Usage:
    python tools/local_correctness.py [--sf /root/testdata/sf0.01]
        [--only prefix1,prefix2] [--json out.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _value_hash(df: pd.DataFrame) -> str:
    """Dtype-strict, order-insensitive hash: sort columns by name, sort
    rows by their string form, hash the repr of every cell *including*
    its Python/numpy type so int64 5 != float64 5.0."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple((type(v).__name__, str(v)) for v in row))
    rows.sort(key=lambda r: tuple(x[1] for x in r))
    h = hashlib.sha256()
    for r in rows:
        for tname, s in r:
            h.update(tname.encode())
            h.update(b"\x00")
            h.update(s.encode())
            h.update(b"\x01")
        h.update(b"\x02")
    return h.hexdigest()


def _check_one(spark, con, fn, oracle: str | None, sf: str) -> dict:
    """One full query-vs-oracle comparison; raises on any failure to
    produce the Spark frame so the caller can retry."""
    rec: dict = {}
    t0 = time.time()
    sdf = fn(spark, sf).toPandas()
    rec["spark_sec"] = round(time.time() - t0, 2)
    rec["spark_rows"] = len(sdf)
    if oracle is None:
        rec["status"] = "rows_only"
        return rec
    t1 = time.time()
    odf = con.execute(oracle).df()
    rec["oracle_sec"] = round(time.time() - t1, 2)
    rec["oracle_rows"] = len(odf)
    rec["rows_match"] = len(sdf) == len(odf)
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    rec["schema_match"] = s_cols == o_cols
    if rec["schema_match"]:
        s_dtypes = [str(sdf[c].dtype) for c in s_cols]
        o_dtypes = [str(odf[c].dtype) for c in o_cols]
        rec["dtype_match"] = s_dtypes == o_dtypes
        if not rec["dtype_match"]:
            rec["dtypes"] = {
                c: [sd, od]
                for c, sd, od in zip(s_cols, s_dtypes, o_dtypes)
                if sd != od
            }
        rec["hash_match"] = _value_hash(sdf) == _value_hash(odf)
    else:
        rec["dtype_match"] = False
        rec["hash_match"] = False
        rec["cols"] = {"spark": s_cols, "oracle": o_cols}
    ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
    rec["status"] = "pass" if ok else "FAIL"
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default="")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from projetbigdata_spark.session import get_spark
    from projetbigdata_spark import registry

    spark = get_spark("local-correctness")
    queries, oracles = registry.collect()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    prefixes = [p for p in args.only.split(",") if p]
    results: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = n_err = 0
    for name, fn in queries.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        rec: dict = {}
        try:
            rec = _check_one(spark, con, fn, oracles.get(name), args.sf)
        except Exception as e:  # noqa: BLE001
            # retry once: one of seven full r3 driver-sim runs reported
            # a single unreproducible failure right after a heavy pytest
            # run (NEXT.md watch item) — absorb load transients, but
            # record the first error so a genuinely flaky query stays
            # visible in the JSON.
            first_err = f"{type(e).__name__}: {e}"
            try:
                rec = _check_one(
                    spark, con, fn, oracles.get(name), args.sf)
                rec["first_attempt_err"] = first_err
                print(f"{name:40s} RETRY (first attempt: {first_err[:80]})")
            except Exception as e2:  # noqa: BLE001
                rec = {"status": "err",
                       "err": f"{type(e2).__name__}: {e2}",
                       "first_attempt_err": first_err}
                n_err += 1
                print(f"{name:40s} ERR  {rec['err'][:120]}")
                traceback.print_exc(limit=3)
                results[name] = rec
                continue
        status = rec["status"]
        if status == "rows_only":
            n_rows_only += 1
            print(f"{name:40s} ROWS_ONLY {rec['spark_rows']:>8} rows "
                  f"{rec['spark_sec']:>6.2f}s")
        else:
            ok = status == "pass"
            n_pass += ok
            n_fail += not ok
            extra = ""
            if not ok:
                extra = " " + json.dumps({
                    k: rec[k] for k in
                    ("rows_match", "schema_match", "dtype_match", "hash_match",
                     "dtypes", "cols") if k in rec})
            print(f"{name:40s} {status:4s} {rec['spark_rows']:>8} rows "
                  f"{rec['spark_sec']:>6.2f}s spark "
                  f"{rec['oracle_sec']:>5.2f}s duck{extra}")
        results[name] = rec

    total_sec = sum(r.get("spark_sec", 0) + r.get("oracle_sec", 0)
                    for r in results.values())
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only, "
          f"{n_err} err / {len(results)} checked; "
          f"total {total_sec:.0f}s")
    slow = sorted(results.items(),
                  key=lambda kv: -kv[1].get("spark_sec", 0))[:10]
    print("slowest:", ", ".join(
        f"{k}={v.get('spark_sec', 0):.1f}s" for k, v in slow))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
