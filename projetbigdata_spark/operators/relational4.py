"""Wider TPC-H shape coverage: the three classic plan shapes the
earlier q-set didn't exercise —

  q13: outer join + TWO-LEVEL aggregation (per-entity count, then a
       histogram of the counts);
  q9:  deep star join (4 dims) with an expression aggregate grouped by
       dim attribute × derived year;
  q8:  conditional-ratio aggregate (market share) on top of a
       two-branch dim join (customer nation filters the region, the
       SUPPLIER nation is the measured dimension).

The reference (pifouuu/ProjetBigData) has no joins at all — its only
join idiom is the broadcast-dict probe (main_reglogit.py:72-77,
SURVEY.md §2.4); these queries are the relational family those
semantics generalize to at warehouse scale.

Scale notes inline; all dims broadcast (≤ GBs at 100 TB, AQE demotes
if not), the lineitem/orders shuffle is the one real exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_table


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders, including
    k=0 — which is exactly why the join must be LEFT OUTER (an inner
    join silently drops the zero-order customers; the fixture has
    them). First agg shuffles on c_custkey, second on the tiny c_count
    domain. The non-urgent filter stands in for Q13's o_comment NOT
    LIKE (fixtures carry no comment column)."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count() skips nulls
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year for a
    part-name pattern. part and supplier/nation broadcast into
    lineitem (filter first — the p_name LIKE prunes the build side
    before broadcast); lineitem⋈orders is the one shuffle. Profit
    omits ps_supplycost (fixtures carry no partsupp table)."""
    tune(spark)
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    # decimal sum: order-independent, so the result is identical under
    # any partitioning (the double sum landed on a 0.005 rounding edge)
    profit = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(profit.cast("double"), 2).alias("profit"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE), 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


MKT_NATION = "NATION_3"
MKT_REGION = "ASIA"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of revenue among
    orders whose CUSTOMER sits in a region, per year — a conditional
    ratio over a join where nation participates twice (customer side
    filters, supplier side is measured). Both nation branches and
    region broadcast; the ratio divides two same-group sums so the
    division happens once per group, after aggregation."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat_c = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == MKT_REGION
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_natkey"),
        F.col("n_name").alias("supp_nation"),
    )
    cust_in_region = cust.join(
        F.broadcast(
            nat_c.join(
                F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
            )
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"))  # fact-scale: no hint
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat_s), F.col("s_nationkey") == F.col("s_natkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("supp_nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == MKT_NATION, F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN n2.n_name = '{MKT_NATION}'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = '{MKT_REGION}'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY o_year
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems below 20% of their
    part's average quantity. Written in the decorrelated form Catalyst
    would rewrite the correlated subquery into anyway — per-part avg as
    a pre-aggregation (shuffle carries |parts| rows), broadcast back
    into the fact scan. Quantities are integral doubles, so the avg is
    exact under any summation order and the `<` threshold can't flip
    between engines; the revenue sum uses decimal (order-independent).
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    revenue = F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(per_part_avg),
            F.col("l_partkey") == F.col("avg_partkey"),
        )
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round((revenue / F.lit(7.0)).cast("double"), 2).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) / 7.0 AS DOUBLE),
             2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


def q16_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier breadth per part attribute,
    EXCLUDING suppliers matched by a subquery (NOT IN -> left_anti
    join). The anti join runs on the small supplier dim (broadcast);
    count(DISTINCT) shuffles (brand, type, suppkey) then re-aggregates
    — Catalyst's two-phase distinct-agg expansion."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 25)
    bad_sup = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_size <= 25
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type
"""


BIN_WIDTH = 5000


def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of lineitem prices — the data-profiling
    primitive behind distribution drift checks. bin = floor(x / width)
    (identical IEEE division + floor in both engines); one hash-agg,
    shuffle carries |bins| rows. Per-bin bounds use exact min/max, the
    sum is decimal."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.floor(F.col("l_extendedprice") / BIN_WIDTH).cast("int")
    return (
        li.groupBy(bin_col.alias("price_bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("bin_min"),
            F.round(F.max("l_extendedprice"), 2).alias("bin_max"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast(
                    "double"
                ),
                2,
            ).alias("bin_total"),
        )
    )


HISTOGRAM_SQL = f"""
SELECT CAST(floor(l_extendedprice / {BIN_WIDTH}) AS INT) AS price_bin,
       count(*) AS n,
       round(min(l_extendedprice), 2) AS bin_min,
       round(max(l_extendedprice), 2) AS bin_max,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2)
           AS bin_total
FROM lineitem
GROUP BY 1
"""


def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the inverse of agg_pivot and the last
    relational verb the surface was missing: a wide per-nation metrics
    row (order count, revenue cents, max single order) melted to long
    (nation, metric, value) form, the shape metric stores and plotting
    layers want. Values stay exact BIGINTs (revenue in cents via the
    decimal fixture column — no float paths), so the long frame
    hash-matches DuckDB's UNPIVOT exactly. Plan: one broadcast dim
    join + one hash agg, then Expand (3 rows per nation) — no extra
    shuffle for the unpivot itself."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    wide = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)  # fact-scale: no hint
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            # floor(x*100 + 0.5): double->bigint casts TRUNCATE in
            # Spark but ROUND in DuckDB — the explicit-floor spelling
            # (same as embed_quantize_int8) is identical in both
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            ).alias("revenue_cents"),
            F.max(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            ).alias("max_order_cents"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["n_orders", "revenue_cents", "max_order_cents"],
        variableColumnName="metric",
        valueColumnName="value",
    )


UNPIVOT_SQL = """
WITH wide AS (
    SELECT n_name,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS max_order_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
)
SELECT n_name, metric, value
FROM wide
UNPIVOT (value FOR metric IN (n_orders, revenue_cents, max_order_cents))
"""


QUERIES = {
    "unpivot_nation_metrics": unpivot_nation_metrics,
    "agg_histogram_bins": agg_histogram_bins,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_supplier_breadth": q16_supplier_breadth,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q9_product_profit": q9_product_profit,
    "q8_market_share": q8_market_share,
}

ORACLE_SQL = {
    "unpivot_nation_metrics": UNPIVOT_SQL,
    "agg_histogram_bins": HISTOGRAM_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q16_supplier_breadth": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q9_product_profit": Q9_SQL,
    "q8_market_share": Q8_SQL,
}
