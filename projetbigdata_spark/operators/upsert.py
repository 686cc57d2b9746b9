"""Keyed upsert / MERGE INTO semantics on plain parquet.

The reference never updates data in place (its sinks are write-once
text dumps, `script3.py:206-210`); a modern lakehouse pipeline needs
MERGE. Real MERGE INTO requires a transactional table format
(Delta/Iceberg — external jars, absent here), but the SEMANTICS are a
pure relational composition, demonstrated end-to-end on the static
`events` table by treating it as snapshot + CDC changelog:

  base    — latest row per (user_id, event_type) before the split ts
            (the current table snapshot);
  cdc     — rows at/after the split, op = 'D' (delete) when value is
            below the delete threshold else 'U' (upsert); only the
            LATEST change per key applies (standard CDC compaction);
  merged  — full-outer join of the two on the key: latest 'U' wins
            over base, 'D' removes the key, untouched base rows and
            brand-new keys pass through.

This is exactly how Delta executes MERGE under the hood (dedup the
source on the merge key, join against the target, rewrite matched
files), minus the transaction log. Scale: both dedups are one window
shuffle on the merge key, and the join arrives already partitioned by
that key, so AQE plans it shuffle-free; no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_events

SPLIT_TS = "2024-01-25 00:00:00"  # events span Jan 1-30 (TESTDATA.md)
DELETE_BELOW = 25.0  # cdc rows with value < this are deletes


def merge_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (latest-wins upsert + delete) as window dedup + one
    full-outer join; see module docstring. Output is the post-merge
    snapshot keyed by (user_id, event_type)."""
    tune(spark)
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    base = (
        e.where(F.col("ts") < F.lit(SPLIT_TS).cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("b_event_id"),
            F.col("ts").alias("b_ts"),
            F.col("value").alias("b_value"),
        )
    )
    cdc = (
        e.where(F.col("ts") >= F.lit(SPLIT_TS).cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.when(F.col("value") < DELETE_BELOW, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("event_id").alias("c_event_id"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
        )
    )
    merged = base.join(cdc, ["user_id", "event_type"], "full_outer")
    return (
        merged.where(F.col("op").isNull() | (F.col("op") == "U"))
        .select(
            "user_id",
            "event_type",
            F.coalesce("c_event_id", "b_event_id").alias("event_id"),
            F.coalesce("c_ts", "b_ts").alias("ts"),
            F.coalesce("c_value", "b_value").alias("value"),
            F.when(F.col("op").isNull(), F.lit("base"))
            .when(F.col("b_event_id").isNull(), F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("merge_action"),
        )
    )


MERGE_SQL = f"""
WITH base AS (
    SELECT user_id, event_type, event_id AS b_event_id, ts AS b_ts,
           value AS b_value
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{SPLIT_TS}'
    ) WHERE rn = 1
),
cdc AS (
    SELECT user_id, event_type,
           CASE WHEN value < {DELETE_BELOW} THEN 'D' ELSE 'U' END AS op,
           event_id AS c_event_id, ts AS c_ts, value AS c_value
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{SPLIT_TS}'
    ) WHERE rn = 1
)
SELECT user_id, event_type,
       coalesce(c_event_id, b_event_id) AS event_id,
       coalesce(c_ts, b_ts) AS ts,
       coalesce(c_value, b_value) AS value,
       CASE WHEN op IS NULL THEN 'base'
            WHEN b_event_id IS NULL THEN 'insert'
            ELSE 'update' END AS merge_action
FROM base FULL OUTER JOIN cdc USING (user_id, event_type)
WHERE op IS NULL OR op = 'U'
"""


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history: every change to a
    (user_id, event_type) key becomes a validity interval
    [valid_from, valid_to) with a version number and an is_current
    flag — the other half of the lakehouse pair (merge_cdc_snapshot is
    "latest state"; this is "full history", what dimension tables keep
    so facts can join AS OF any date).

    One window shuffle on the dimension key (lead + row_number share
    the frame, so Catalyst plans a single Window over a single
    Exchange); no self-join — the naive spelling joins each version to
    the next and doubles the shuffle."""
    tune(spark)
    e = load_events(spark, sf_dir)
    # asc_nulls_last explicitly: Spark defaults ASC NULLS FIRST while
    # DuckDB defaults NULLS LAST — a null ts would silently reorder
    # every version of its key between the engines
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc_nulls_last("ts"), "event_id"
    )
    return e.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("version_event_id"),
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version_n"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


SCD2_SQL = """
SELECT user_id, event_type,
       event_id AS version_event_id,
       value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(row_number() OVER w AS INT) AS version_n,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id, event_type
             ORDER BY ts NULLS LAST, event_id)
"""


QUERIES = {
    "merge_cdc_snapshot": merge_cdc_snapshot,
    "scd2_history": scd2_history,
}
ORACLE_SQL = {
    "merge_cdc_snapshot": MERGE_SQL,
    "scd2_history": SCD2_SQL,
}
