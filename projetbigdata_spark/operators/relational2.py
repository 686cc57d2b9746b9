"""Relational operator surface, part 2 — wider TPC-H-shape coverage
plus the join family the reference never spells out (SURVEY.md §2.4):
outer joins, nation-pair multi-dim joins, disjunctive join predicates,
HAVING-gated aggregation, and a scalable as-of join.

Same ground rules as relational.py: dims broadcast, facts pre-filtered
before any shuffle, aggregates partial+final hash-agg, floats rounded
identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_events, load_table


# --------------------------------------------------------------------------
# q6_forecast_revenue — TPC-H Q6 shape: pure scan-filter-agg, the
# canonical predicate-pushdown probe. All three predicates reach the
# parquet scan (PushedFilters); the agg returns ONE row, so the shuffle
# carries one partial per task.
# --------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q7_nation_volume — TPC-H Q7 shape: supplier nation vs customer nation
# trade volume by year. Both nation lookups broadcast (25 rows); the
# only shuffles are lineitem⋈orders and the final small-group agg.
# --------------------------------------------------------------------------
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))  # fact-scale: no hint
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    # exact decimal summation: per-row double products are IEEE-identical
    # across engines, and decimal addition is order-independent — immune
    # to the half-way rounding flips double summation can hit
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("o_orderdate").alias("l_year")
        )
        .agg(F.round(F.sum(disc), 2).cast("double").alias("volume"))
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(o_orderdate) AS INT) AS l_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))), 2) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q4_order_priority — TPC-H Q4 shape: EXISTS-correlated subquery
# counted by priority. Catalyst rewrites the EXISTS into a left-semi
# join on the fly — declared as a subquery, executed as the join the
# hand-written version would be.
# --------------------------------------------------------------------------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_q4")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM v_orders_q4
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM v_lineitem_q4
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY o_orderpriority
        """
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10 shape: revenue lost to returns per
# customer, top 20. The returnflag filter lands on the lineitem scan;
# TakeOrderedAndProject keeps the global top-k off the driver.
# --------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))  # fact-scale: no hint
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# q14_promo_share — TPC-H Q14 shape: conditional aggregation over a
# fact⋈dim join. part broadcasts; the promo share is one ratio of two
# sums computed in the same agg pass.
# --------------------------------------------------------------------------
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)))
    total = F.sum(disc)
    return joined.agg(
        F.round(promo, 2).alias("promo_revenue"),
        F.round(total, 2).alias("total_revenue"),
        F.round(promo * 100 / total, 4).alias("promo_share_pct"),
    )


Q14_SQL = """
SELECT round(sum(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
           AS promo_revenue,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
       round(sum(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 100
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
"""


# --------------------------------------------------------------------------
# q18_large_orders — TPC-H Q18 shape: HAVING-gated aggregate used as a
# semi-filter on a second aggregate. The first groupBy reduces lineitem
# to per-order sums BEFORE any join — at 100 TB this is the difference
# between joining 10^11 rows and joining |orders over threshold|.
# --------------------------------------------------------------------------
Q18_QTY_THRESHOLD = 300


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))  # fact-scale: no hint
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(total_qty, 2) AS total_qty
FROM (
    SELECT l_orderkey, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > {Q18_QTY_THRESHOLD}
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# q19_disjunctive — TPC-H Q19 shape: OR-of-ANDs join predicate. The
# equi key (partkey) carries the join; the disjunction evaluates as a
# residual filter, never a cartesian. Catalyst also pushes the
# brand IN (...) superset predicate down to the part scan.
# --------------------------------------------------------------------------
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 20)
        & (F.col("p_size") <= 10)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 30)
        & (F.col("p_size") <= 15)
    )
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).where(cond)
    return joined.agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20 AND p_size <= 10)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30 AND p_size <= 15)
"""


# --------------------------------------------------------------------------
# join_left_outer — customers with their order counts, INCLUDING
# customers that never ordered (the null-extension the reference's
# inner-only broadcast-dict probes can't express). Aggregate-then-join:
# orders reduce to per-customer counts before the join, so the outer
# join is dim-sized on both sides.
# --------------------------------------------------------------------------
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("o_totalprice").alias("spend"),
        )
    )
    return cust.join(
        per_cust, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
    ).select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
        F.round(F.coalesce(F.col("spend"), F.lit(0.0)), 2).alias("total_spend"),
    )


LEFT_OUTER_SQL = """
SELECT c_custkey, c_name,
       coalesce(cnt, 0) AS n_orders,
       round(coalesce(spend, 0.0), 2) AS total_spend
FROM customer
LEFT JOIN (
    SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS spend
    FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
"""


# --------------------------------------------------------------------------
# join_full_outer — per-nation customer balance vs supplier balance,
# full outer on the nation key: nations with only customers, only
# suppliers, or both all survive. Aggregates first, so the full outer
# join runs on |nations| rows.
# --------------------------------------------------------------------------
def join_full_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_bal"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_bal"))
    )
    return c.join(s, F.col("cnk") == F.col("snk"), "full_outer").select(
        F.coalesce(F.col("cnk"), F.col("snk")).alias("nationkey"),
        "cust_bal",
        "supp_bal",
    )


FULL_OUTER_SQL = """
SELECT coalesce(cnk, snk) AS nationkey, cust_bal, supp_bal
FROM (SELECT c_nationkey AS cnk, round(sum(c_acctbal), 2) AS cust_bal
      FROM customer GROUP BY 1) c
FULL JOIN (SELECT s_nationkey AS snk, round(sum(s_acctbal), 2) AS supp_bal
           FROM supplier GROUP BY 1) s
ON cnk = snk
"""


# --------------------------------------------------------------------------
# join_asof_purchase_click — as-of join (the classic operator Spark has
# no built-in for): for each purchase event, the latest click by the
# same user at-or-before the purchase time.
#
# NOT implemented as join + groupBy-max (quadratic per key) but as the
# scalable union-and-window plan: tag both sides, union, single window
# partitioned by user ordered by time, last(click, ignoreNulls) over
# rows unbounded-preceding..current. ONE shuffle on user_id regardless
# of how many rows match per key — this is the 100 TB as-of idiom.
# Clicks sort before purchases at equal ts (type_rank), matching the
# oracle's `<=` ASOF semantics.
# --------------------------------------------------------------------------
def join_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    e = load_events(spark, sf_dir)
    # no `value` column: it was carried through the union/shuffle/sort
    # but never consumed — dead shuffle width at 10^11 rows.
    tagged = e.where(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("type_rank"),
    )
    # event_id tiebreak: two clicks at one (user_id, ts) made the
    # matched click partition-order-dependent. The DuckDB ASOF oracle
    # is itself ambiguous on such ties (no tiebreak syntax); fixtures
    # are tie-free at every sf, and the Spark side is now deterministic
    # by decree.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "type_rank", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_info = F.when(
        F.col("type_rank") == 0,
        F.struct(F.col("ts").alias("cts"), F.col("event_id").alias("cid")),
    )
    enriched = tagged.withColumn(
        "last_click", F.last(click_info, ignorenulls=True).over(w)
    )
    return enriched.where(F.col("type_rank") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("last_click.cid").alias("click_id"),
        F.col("last_click.cts").alias("click_ts"),
    )


ASOF_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.event_id AS click_id,
       c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
ON p.user_id = c.user_id AND c.ts <= p.ts
"""


# --------------------------------------------------------------------------
# sql_frontend — the same engine through the SQL front-end: temp views +
# spark.sql. Identical Catalyst plan as the DataFrame spelling; proves
# the full surface is reachable from pure SQL (the API the reference
# never had).
# --------------------------------------------------------------------------
def sql_frontend_yearly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               o_orderpriority,
               count(DISTINCT o_orderkey) AS n_orders,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM v_lineitem
        JOIN v_orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
        """
    )


SQL_FRONTEND_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       o_orderpriority,
       count(DISTINCT o_orderkey) AS n_orders,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


QUERIES = {
    "sql_frontend_yearly_revenue": sql_frontend_yearly_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_nation_volume": q7_nation_volume,
    "q4_order_priority": q4_order_priority,
    "q10_returned_items": q10_returned_items,
    "q14_promo_share": q14_promo_share,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "join_left_outer": join_left_outer_order_counts,
    "join_full_outer": join_full_outer_nation_balance,
    "join_asof_purchase_click": join_asof_purchase_click,
}

ORACLE_SQL = {
    "sql_frontend_yearly_revenue": SQL_FRONTEND_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_nation_volume": Q7_SQL,
    "q4_order_priority": Q4_SQL,
    "q10_returned_items": Q10_SQL,
    "q14_promo_share": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive": Q19_SQL,
    "join_left_outer": LEFT_OUTER_SQL,
    "join_full_outer": FULL_OUTER_SQL,
    "join_asof_purchase_click": ASOF_SQL,
}
