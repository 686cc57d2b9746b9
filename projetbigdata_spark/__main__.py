"""Command-line query runner — the switch-over entry point for a
reference user: every registered operator is runnable by name against
any fixture directory, with the physical plan on demand.

Usage:
    python -m projetbigdata_spark list [prefix]
    python -m projetbigdata_spark run <query> [--sf DIR] [--limit N]
    python -m projetbigdata_spark explain <query> [--sf DIR]
    python -m projetbigdata_spark oracle <query>      # print the SQL twin

Examples:
    python -m projetbigdata_spark run q1_pricing_summary
    python -m projetbigdata_spark explain dedup_minhash_buckets \
        --sf /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="projetbigdata_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("prefix", nargs="?", default="")
    for name in ("run", "explain", "oracle"):
        p = sub.add_parser(name)
        p.add_argument("query")
        if name != "oracle":
            p.add_argument(
                "--sf",
                default=os.environ.get(
                    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
                ),
            )
        if name == "run":
            p.add_argument("--limit", type=int, default=20)
    args = ap.parse_args(argv)

    from projetbigdata_spark import registry

    queries, oracles = registry.collect()

    if args.cmd == "list":
        for n in sorted(queries):
            if n.startswith(args.prefix):
                print(f"{n}  [{'SQL' if n in oracles else 'rows'}]")
        return 0

    if args.query not in queries:
        close = [n for n in queries if args.query in n]
        print(f"unknown query {args.query!r}", file=sys.stderr)
        if close:
            print(f"did you mean: {', '.join(sorted(close)[:5])}", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        sql = oracles.get(args.query)
        print(sql if sql else f"-- {args.query} is rows-only (no SQL oracle)")
        return 0

    from projetbigdata_spark.session import get_spark

    spark = get_spark(f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[args.query](spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        # cache so show + count execute the pipeline once, not twice
        # (minutes apart for the iterative dedup queries at soak)
        df = df.cache()
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
        df.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
