"""Physical-plan introspection — the ".explain and iterate" loop
(SURVEY.md §4.2) turned into assertable properties so plan quality is
regression-tested, not just eyeballed once.

Used by tests/test_plans.py to pin the plan shapes we designed for:
filters reaching the parquet scan (PushedFilters), dims broadcast,
no accidental cartesian products, window counts, exchange reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The final (AQE-initial) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True iff some scan's PushedFilters mentions `fragment`."""
    plan = physical_plan(df)
    return any(
        "PushedFilters" in line and fragment in line
        for line in plan.splitlines()
    )


def count_op(df: DataFrame, op: str) -> int:
    return physical_plan(df).count(op)


def assert_no_cartesian(df: DataFrame, name: str = "") -> None:
    plan = physical_plan(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"{name}: unexpected {bad} in plan"


def assert_broadcast_join(df: DataFrame, name: str = "", at_least: int = 1) -> None:
    n = count_op(df, "BroadcastHashJoin")
    assert n >= at_least, f"{name}: expected >= {at_least} broadcast joins, got {n}"
