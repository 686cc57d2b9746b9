"""SparkSession factory + per-query runtime tuning.

The driver may hand us its own SparkSession, so anything correctness-
critical (session timezone) is (re)applied per query via ``tune``, which
only touches *runtime-settable* SQL confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "projetbigdata-spark") -> SparkSession:
    """Build a local session shaped like the cluster deployment.

    local[$SPARK_GRAFT_CPUS] mirrors a multi-executor cluster closely
    enough for plan-shape work: shuffles, AQE re-planning, broadcast
    thresholds all behave as they would on 1000 executors.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic join-strategy switches — the 100 TB safety net.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 32)))
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas-UDF boundary (SURVEY.md §4.2).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs we rely on for oracle parity.

    Called at the top of every registered query so results are stable
    even when the caller (the verify driver) built its own session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
