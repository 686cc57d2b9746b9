"""Batch-equivalent streaming semantics over `events` (SURVEY.md §2.12).

The reference has no streaming at all; this is the north-star extension:
every Structured Streaming construct we support (tumbling / sliding /
session windows, keyed dedup) expressed over the static `events` table
with IDENTICAL semantics — `window(ts, ...)` and `session_window(...)`
are the same Catalyst expressions batch and streaming share, so these
oracle-checked batch plans are exact specs for the streaming jobs in
streaming/jobs.py (which get rows-only / pytest checks).

Scale: windowed aggs group by (window, key) — partial agg applies, so
shuffle volume is |windows × keys|. Session windows need a per-key sort,
which streaming does in state-store order and batch does via the
groupBy(session_window) shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_events


def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: per-window, per-type event stats."""
    tune(spark)
    e = load_events(spark, sf_dir)
    w = F.window("ts", "1 hour")
    return (
        e.groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def events_sliding_15m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 15-minute width, 5-minute slide — each event
    lands in exactly 3 windows."""
    tune(spark)
    e = load_events(spark, sf_dir)
    w = F.window("ts", "15 minutes", "5 minutes")
    # avg computed in exact integer micro-units: `value` is 2-decimal,
    # so sum(cents) is exact; integer div by count is exact; the final
    # /1e6 is the same IEEE op in both engines. A plain round(avg(),4)
    # is NOT portable here — windows often hold 2/4/8 events, whose
    # averages land exactly on half-way 5th decimals, where Spark
    # (HALF_UP on decimal repr) and DuckDB (binary round) disagree.
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        e.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            (F.expr("(sum_cents * 10000) div n_events") / F.lit(1000000.0)).alias(
                "avg_value"
            ),
        )
    )


# Oracle: enumerate the 3 windows containing each event. Spark aligns
# window starts to the epoch, i.e. start = floor(epoch/300)*300 - j*300.
SLIDING_SQL = """
WITH exploded AS (
    -- epoch + interval arithmetic, NOT to_timestamp: to_timestamp
    -- returns TIMESTAMPTZ, and casting that to TIMESTAMP goes through
    -- DuckDB's SESSION TimeZone — the oracle would shift by the host
    -- machine's UTC offset (review finding r3)
    SELECT TIMESTAMP '1970-01-01'
               + to_seconds(CAST(floor(epoch(ts) / 300) * 300 - j * 300
                                 AS BIGINT)) AS window_start,
           value
    FROM events
    CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j)
),
agg AS (
    SELECT window_start,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents
    FROM exploded
    GROUP BY window_start
)
SELECT window_start, n_events,
       ((sum_cents * 10000) // n_events) / 1000000.0 AS avg_value
FROM agg
"""


def events_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap.
    session_window end = last event + gap (Spark semantics; the oracle
    reproduces it with gaps-and-islands SQL)."""
    tune(spark)
    e = load_events(spark, sf_dir)
    sw = F.session_window("ts", "30 minutes")
    return (
        e.groupBy(sw.alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


# Break a session when the gap is STRICTLY > 30min: Spark's
# session_window still merges an event exactly gap minutes after the
# last one (a 00:00/00:30 pair is ONE session — verified empirically),
# the same boundary sessionize.py uses. ORDER BYs carry event_id so
# duplicate timestamps at a boundary can't land in different sessions
# between the two independent sorts (review findings r3).
# session_end = last ts + 30min.
SESSION_SQL = """
WITH marked AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
),
numbered AS (
    SELECT user_id, ts, value,
           sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM numbered
GROUP BY user_id, sid
"""


def events_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup: first event per (user_id, event_type) in event-time
    order — the deterministic spelling of streaming
    `dropDuplicates(["user_id","event_type"])` (which keeps an
    arbitrary row in batch; we pin first-by-ts so it's oracle-checkable
    and matches what a watermarked streaming dedup emits)."""
    tune(spark)
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


DEDUP_SQL = """
SELECT user_id, event_type, event_id, ts, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
"""


def events_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hour AND day
    aggregates of the same stream in ONE pass — GROUPING SETS over two
    date_truncs (Expand + a single shuffle), instead of two scans or a
    re-aggregation cascade. `gran` disambiguates the level."""
    tune(spark)
    e = load_events(spark, sf_dir)
    e.createOrReplaceTempView("v_events_rollup")
    return spark.sql(
        """
        SELECT CASE WHEN grouping(hh) = 0 THEN 'hour' ELSE 'day' END AS gran,
               coalesce(hh, dd) AS bucket_start,
               event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS total_value
        FROM (SELECT date_trunc('hour', ts) AS hh,
                     date_trunc('day', ts) AS dd,
                     event_type, value
              FROM v_events_rollup)
        GROUP BY GROUPING SETS ((hh, event_type), (dd, event_type))
        """
    )


MULTI_ROLLUP_SQL = """
WITH base AS (
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hh,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS dd,
           event_type, value
    FROM events
)
SELECT CASE WHEN grouping(hh) = 0 THEN 'hour' ELSE 'day' END AS gran,
       coalesce(hh, dd) AS bucket_start,
       event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS total_value
FROM base
GROUP BY GROUPING SETS ((hh, event_type), (dd, event_type))
"""


def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAM-STREAM interval join
    (streaming/jobs.py:click_attribution_stream): every purchase
    paired with every click by the same user in the preceding 30
    minutes — the classic ad-attribution shape. Unlike the as-of join
    (join_asof_purchase_click: last click only, single window pass)
    this emits ALL qualifying pairs, which is exactly what a
    watermarked stream-stream inner join produces, so this plan is the
    spec the streaming job is asserted equal to.

    Scale: equi-join on user_id with the time predicate as a post-join
    filter; streaming bounds the state instead (clicks retained
    watermark + 30 min). delta_s is exact integer seconds (µs div),
    no float time arithmetic."""
    tune(spark)
    e = load_events(spark, sf_dir)
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
            ),
        )
        .select(
            "purchase_id",
            F.col("p_user").alias("user_id"),
            "purchase_ts",
            "click_id",
            "click_ts",
            F.expr(
                "(unix_micros(purchase_ts) - unix_micros(click_ts)) "
                "div 1000000"
            ).alias("delta_s"),
        )
    )


ATTRIBUTION_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.event_id AS click_id,
       c.ts AS click_ts,
       (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS delta_s
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly detection on the event stream: per
    (event_type, hour), flag hours whose event count deviates from the
    type's median by more than 3× the median absolute deviation — the
    median/MAD rule monitoring pipelines prefer over mean/stddev
    because one traffic spike corrupts a mean but not a median. The
    full (type, hour) frame is returned with the flag (an audit, not
    just the alarms), so the anomaly rate itself is queryable.

    Exactness: the hourly metric is an integer COUNT (a double
    sum(value) is order-dependent across engines — kept out of the
    hash-checked path); exact `median` over integers yields k or
    k+0.5, both exactly representable, so |n−med|, 3·mad, and the
    comparison are all bit-deterministic. At unbounded-hours scale the
    exact median's per-type sort switches to approx_percentile, same
    relief valve as agg_percentiles (operators/relational3.py).

    Plan: one (type, hour) hash-agg over the scan; medians are two
    skinny per-type sort-aggs over |types × hours| rows (tiny — the
    HOURLY frame, not events); the stats join back is broadcast. In
    streaming this is the batch spec for a foreachBatch detector over
    the tumbling-window counts (streaming/jobs.py pattern)."""
    tune(spark)
    e = load_events(spark, sf_dir)
    hourly = e.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n_events"))
    return mad_flags(hourly)


def mad_flags(hourly: DataFrame) -> DataFrame:
    """The median/3·MAD rule over an (event_type, hour, n_events)
    frame — shared by the batch query above and the foreachBatch
    streaming detector (streaming/jobs.py anomaly_stream), so batch ==
    streaming flags is a structural identity, not a re-implementation.

    The input frame feeds three consumers (median, deviations, the
    output join) — the plan barrier keeps its upstream to exactly one
    execution."""
    hourly = hourly.localCheckpoint(eager=False)
    med = hourly.groupBy("event_type").agg(
        F.expr("median(CAST(n_events AS DOUBLE))").alias("med")
    )
    dev = hourly.join(med, "event_type").withColumn(
        "abs_dev", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("median(abs_dev)").alias("mad")
    )
    return (
        dev.join(mad, "event_type")
        .select(
            "event_type",
            "hour",
            "n_events",
            "med",
            "mad",
            (F.col("abs_dev") > 3 * F.col("mad")).alias("is_anomaly"),
        )
    )


ANOMALY_MAD_SQL = """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS hour,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
),
med AS (
    SELECT event_type, median(CAST(n_events AS DOUBLE)) AS med
    FROM hourly GROUP BY event_type
),
dev AS (
    SELECT h.*, m.med, abs(h.n_events - m.med) AS abs_dev
    FROM hourly h JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, median(abs_dev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type, d.hour, d.n_events, d.med, ma.mad,
       d.abs_dev > 3 * ma.mad AS is_anomaly
FROM dev d JOIN mad ma USING (event_type)
"""


QUERIES = {
    "events_multi_rollup": events_multi_rollup,
    "events_anomaly_mad": events_anomaly_mad,
    "events_tumbling_1h": events_tumbling_1h,
    "events_sliding_15m_5m": events_sliding_15m_5m,
    "events_session_30m": events_session_30m,
    "events_dedup_keyed": events_dedup_keyed,
    "events_click_attribution": events_click_attribution,
}

ORACLE_SQL = {
    "events_click_attribution": ATTRIBUTION_SQL,
    "events_anomaly_mad": ANOMALY_MAD_SQL,
    "events_multi_rollup": MULTI_ROLLUP_SQL,
    "events_tumbling_1h": TUMBLING_SQL,
    "events_sliding_15m_5m": SLIDING_SQL,
    "events_session_30m": SESSION_SQL,
    "events_dedup_keyed": DEDUP_SQL,
}
