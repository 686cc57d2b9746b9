"""Window-function surface (SURVEY.md §2.6).

The reference has zero window functions; its closest analogs are the
frequency-ordered StringIndexer (A4) and vocab enumeration (A1), both
`row_number() over (order by ...)` in disguise. The new engine ships
the full surface — ranking, analytic (lag/lead), frame aggregates,
ntile — over `orders` and `events`.

Scale notes: every query partitions by a high-cardinality key
(customer, user) so window state stays per-group and shuffles are the
single exchange on the partition key. The only global-order windows
(ntile/percent_rank over customers) run on dimension-sized inputs —
global windows over fact tables serialize to one partition and are
deliberately absent (the flagship vocab_topk accepts a global window
only because it runs post-aggregation on |vocab| rows).

Determinism: every ORDER BY carries a unique tiebreak column so Spark
and DuckDB agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_events, load_table


def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio per customer; keep top-3 orders by price."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER w AS INT) AS rn,
       CAST(rank()       OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
QUALIFY rn <= 3
"""


def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead per user + inter-event gap in exact µs
    (integer epoch math on both engines — no float time arithmetic)."""
    tune(spark)
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        gap.alias("gap_us"),
    )


LAG_SQL = """
SELECT user_id, event_id, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def window_running_sum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame aggregate: cumulative customer spend in order-date order.
    Both engines add in the same sorted order, so prefix sums agree
    bit-for-bit before the defensive rounding."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"),
    )


RUNSUM_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
FROM orders
"""


def window_moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding row-frame average of event value per user."""
    tune(spark)
    e = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg"),
    )


MOVAVG_SQL = """
SELECT user_id, event_id,
       round(avg(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
FROM events
"""


def window_range_time_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour sum per user over EVENT TIME — a RANGE frame
    keyed on epoch seconds, not a row-count frame: the frame holds
    whatever number of events fell in the hour (rows frames can't
    express this). Peers (equal timestamps) enter the frame together
    in both engines; the sum is decimal, so peer order can't matter."""
    tune(spark)
    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("v").over(w).cast("double"), 2).alias("trailing_1h"),
    )


RANGE_TIME_SQL = """
SELECT user_id, event_id,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 2) AS trailing_1h
FROM events
"""


def window_ntile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing of customers by account balance."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
    )


NTILE_SQL = """
SELECT c_custkey, c_acctbal,
       CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT)
           AS balance_quartile
FROM customer
"""


def window_distribution_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions: percent_rank + cume_dist of customers by
    balance within their nation (per-nation windows — distributed).

    Re-derived INTEGER-EXACTLY from row_number + partition count
    (the window order is total, so rank == row_number): rank/n ratios
    like 41/640 = .0640625 sit exactly on the 6dp half-point, where
    Spark's HALF_UP round and DuckDB's half-even round disagree —
    found by the sf0.1 harness sweep (3 rows diverged; sf0.01 happened
    to dodge every half-point). Truncating integer division on the 1e6
    grid is engine-exact at every sf.

    rn/n are promoted to BIGINT before the 1e6 multiply: row_number is
    IntegerType, and (rn - 1) * 1000000 overflows 32-bit for any
    partition with >= 2148 rows (ANSI mode would raise
    ARITHMETIC_OVERFLOW; the DuckDB oracle's row_number is already
    BIGINT). Regression-tested on a 3000-row partition."""
    tune(spark)
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wn = Window.partitionBy("c_nationkey")
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
        .select(
            "c_custkey",
            "c_nationkey",
            F.when(
                F.col("n") > 1,
                F.expr(
                    "((CAST(rn AS BIGINT) - 1) * 1000000)"
                    " div (CAST(n AS BIGINT) - 1)"
                )
                / 1_000_000.0,
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
            (
                F.expr("(CAST(rn AS BIGINT) * 1000000) div CAST(n AS BIGINT)")
                / 1_000_000.0
            ).alias("cume"),
        )
    )


DISTRIBUTION_SQL = """
WITH t AS (
    SELECT c_custkey, c_nationkey,
           row_number() OVER w AS rn,
           count(*) OVER (PARTITION BY c_nationkey) AS n
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
)
SELECT c_custkey, c_nationkey,
       CASE WHEN n > 1
            THEN (((rn - 1) * 1000000) // (n - 1)) / 1000000.0
            ELSE 0.0 END AS pct_rank,
       ((rn * 1000000) // n) / 1000000.0 AS cume
FROM t
"""


def window_first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full frame per customer:
    each order annotated with the customer's first and latest order
    dates (the frame spec matters — default frames stop at CURRENT ROW
    for last_value, a classic gotcha both engines share)."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order"),
        F.last("o_orderdate").over(w).alias("latest_order"),
        F.count("*").over(w).alias("n_orders"),
    )


FIRST_LAST_SQL = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderdate) OVER w AS first_order,
       last_value(o_orderdate)  OVER w AS latest_order,
       count(*) OVER w AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


QUERIES = {
    "window_distribution": window_distribution_customers,
    "window_first_last": window_first_last_orders,
    "window_rank_orders": window_rank_orders,
    "window_lag_lead": window_lag_lead_events,
    "window_running_sum": window_running_sum_orders,
    "window_moving_avg": window_moving_avg_events,
    "window_ntile": window_ntile_customers,
    "window_range_time": window_range_time_events,
}

ORACLE_SQL = {
    "window_distribution": DISTRIBUTION_SQL,
    "window_first_last": FIRST_LAST_SQL,
    "window_rank_orders": RANK_SQL,
    "window_lag_lead": LAG_SQL,
    "window_running_sum": RUNSUM_SQL,
    "window_moving_avg": MOVAVG_SQL,
    "window_ntile": NTILE_SQL,
    "window_range_time": RANGE_TIME_SQL,
}
