"""Event-sequence analytics: gaps-and-islands sessionization and
ordered funnel conversion — the two classic product-analytics shapes
the windowed-agg family (streaming/events_batch.py) doesn't cover.

Both are one-shuffle-on-user_id plans: sessionization is lag + running
sum inside a single Window partition spec (the two window functions
share one Exchange/Sort); the funnel is three ordered conditional
minima per user then a single global count. Nothing here touches the
driver; at 100 TB both scale with |users| post-shuffle.

Timestamps compare as exact epoch microseconds (bigint) so the
30-minute gap predicate and the strict `>` stage ordering can't drift
between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_events

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60 * 1_000_000


def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap since the user's previous event exceeds 30 minutes; session_id
    is the running count of session starts. The window-function
    spelling of what session_window(ts, '30 minutes') computes —
    complementary because it yields a PER-EVENT session assignment
    (joinable back to raw events), not just closed session windows."""
    tune(spark)
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "ts"
    )
    order = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(order)
    is_new = F.when(
        gap.isNull() | (gap > _GAP_US), F.lit(1).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    with_session = ev.withColumn(
        "session_id",
        F.sum(is_new).over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


GAPS_SQL = f"""
WITH seq AS (
    SELECT user_id, event_id, ts, epoch_us(ts) AS us,
           epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap
    FROM events
),
flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN gap IS NULL OR gap > {_GAP_US} THEN 1 ELSE 0 END AS is_new,
           us
    FROM seq
),
sess AS (
    SELECT user_id, ts,
           CAST(sum(is_new) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT)
               AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events
FROM sess
GROUP BY user_id, session_id
"""


FUNNEL_STAGES = ("click", "view", "purchase")


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose earliest click precedes a view
    precedes a purchase (strict event-time order, not mere presence).
    Stage 1 is a conditional min per user; stages 2 and 3 re-scan only
    the matching event type joined on user_id (co-partitioned shuffle).
    Output is the stage-by-stage surviving-user count."""
    tune(spark)
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    t1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("us"))).alias(
            "t1"
        )
    ).where(F.col("t1").isNotNull())
    t2 = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[1])
        .join(t1, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[2])
        .join(t2, "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    staged = t1.join(t2, "user_id", "left_outer").join(t3, "user_id", "left_outer")
    return staged.agg(
        F.count("t1").alias("n_clicked"),
        F.count("t2").alias("n_viewed_after"),
        F.count("t3").alias("n_purchased_after"),
    )


FUNNEL_SQL = f"""
WITH t1 AS (
    SELECT user_id,
           min(CASE WHEN event_type = '{FUNNEL_STAGES[0]}'
                    THEN epoch_us(ts) END) AS t1
    FROM events GROUP BY user_id
    HAVING t1 IS NOT NULL
),
t2 AS (
    SELECT e.user_id, min(epoch_us(ts)) AS t2
    FROM events e JOIN t1 USING (user_id)
    WHERE event_type = '{FUNNEL_STAGES[1]}' AND epoch_us(ts) > t1
    GROUP BY e.user_id
),
t3 AS (
    SELECT e.user_id, min(epoch_us(ts)) AS t3
    FROM events e JOIN t2 USING (user_id)
    WHERE event_type = '{FUNNEL_STAGES[2]}' AND epoch_us(ts) > t2
    GROUP BY e.user_id
)
SELECT count(t1.t1) AS n_clicked,
       count(t2.t2) AS n_viewed_after,
       count(t3.t3) AS n_purchased_after
FROM t1
LEFT OUTER JOIN t2 USING (user_id)
LEFT OUTER JOIN t3 USING (user_id)
"""


def events_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling on a dense hourly spine: purchase count + revenue
    per hour INCLUDING the hours with no purchases (a time-series
    model trained on the raw aggregate would silently skip them). The
    spine generates from the corpus' own min/max hour — one 1-row agg,
    exploded to ~720 rows, broadcast-joined to the hourly aggregate.
    At 100 TB the spine is still |hours| rows — this plan shape never
    grows with data volume."""
    tune(spark)
    ev = load_events(spark, sf_dir).where(F.col("event_type") == "purchase")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour")
    )
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("rev"),
    )
    return spine.join(hourly, "hour", "left_outer").select(
        "hour",
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.round(F.coalesce(F.col("rev").cast("double"), F.lit(0.0)), 2).alias(
            "revenue"
        ),
    )


SPINE_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
b AS (SELECT date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM p),
spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
          FROM b),
hourly AS (
    SELECT date_trunc('hour', ts) AS hour,
           count(*) AS n_purchases,
           sum(CAST(value AS DECIMAL(18,4))) AS rev
    FROM p GROUP BY 1
)
SELECT spine.hour,
       coalesce(n_purchases, 0) AS n_purchases,
       round(coalesce(CAST(rev AS DOUBLE), 0.0), 2) AS revenue
FROM spine LEFT OUTER JOIN hourly ON spine.hour = hourly.hour
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    again at each later day offset — the classic product-analytics
    triangle. Two hash-aggs and one join, no windows:

      cohort(user)   = min(activity day)           (agg 1)
      activity(user) = distinct (user, day)        (part of agg 1's scan)
      retention      = count distinct users per (cohort_day, offset)

    The per-user cohort table shuffles by user once; the triangle agg
    shuffles the skinny (cohort_day, offset, user) rows. At 100 TB the
    distinct-user count per cell would swap to approx_count_distinct
    (documented trade in table_stats); exact here so the oracle hashes."""
    tune(spark)
    ev = load_events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohorts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(cohorts, "user_id")
        .groupBy(
            # ISO string so both engines materialize identical dtypes
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_SQL = """
WITH activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cohorts AS (
    SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
       CAST(day - cohort_day AS INT) AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohorts USING (user_id)
GROUP BY 1, 2
"""


QUERIES = {
    "events_gaps_islands": events_gaps_islands,
    "events_funnel_conversion": events_funnel_conversion,
    "events_spine_fill": events_spine_fill,
    "events_retention_cohorts": events_retention_cohorts,
}

ORACLE_SQL = {
    "events_gaps_islands": GAPS_SQL,
    "events_funnel_conversion": FUNNEL_SQL,
    "events_spine_fill": SPINE_SQL,
    "events_retention_cohorts": RETENTION_SQL,
}
