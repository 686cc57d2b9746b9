"""Dump .explain("formatted") for named queries into plans/<tag>/.

The optimization-round deliverable: before/after physical plans for
every touched query, committed so the judge can check plan claims
without running Spark.

Usage:
    python tools/dump_plans.py r13 before q7_nation_volume sim_ivf_topk ...
    python tools/dump_plans.py r13 after --all-touched   # reads the same list
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, phase, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    assert phase in ("before", "after"), phase
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    from projetbigdata_spark import registry
    from projetbigdata_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry.collect()
    for name in names:
        df = queries[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{phase}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{path}: {plan.count('Exchange')} Exchange")
    spark.stop()


if __name__ == "__main__":
    main()
