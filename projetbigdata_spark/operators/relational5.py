"""TPC-H suite completion (r3): the seven shapes q2/q11/q12/q15/q20/
q21/q22 the earlier relational modules didn't cover — correlated
min-subquery, HAVING-over-global-scalar, conditional class aggregate,
view + equality-with-max, nested IN with correlated aggregate,
multi-EXISTS self-join, and anti-join + scalar-avg subquery.

The reference (pifouuu/ProjetBigData) has no relational queries at all
(SURVEY.md §2.4: its only join idiom is a broadcast-dict probe); this
module is the standard-warehouse surface those semantics generalize
to. Fixture adaptations, documented per query: there is no partsupp
table, so q2/q11/q20 derive one from lineitem (`_partsupp`: one row
per distinct (l_partkey, l_suppkey) with min unit price as supplycost
and total shipped quantity as availqty); lineitem carries no
commitdate/receiptdate/shipmode, so q12/q21 express the same plan
shapes over shipdate lag vs o_orderdate; customer carries no phone,
so q22's country-code prefix becomes the nation key.

Float-determinism policy (the lesson of the r1 HUGEINT/rounding
fixes): any value compared for EQUALITY or against a THRESHOLD after
an aggregation is computed in exact integer units (micro-units via
floor, or cent×basis-point products), so partition summation order
can never flip a comparison — q15's revenue == max(revenue) and
q11's HAVING > fraction-of-total are exact-integer comparisons in
both engines. Values only *reported* stay double (the driver rounds
to 6dp).

Scale notes: `_partsupp` is one hash-agg over lineitem (shuffle on
(partkey, suppkey) — at 100 TB this is the natural bucketing key for
a materialized view). Dims broadcast everywhere; each query has
exactly the fact-side shuffles its shape demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_table


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emulated partsupp: ps_supplycost = min observed unit price (an
    exact IEEE division of identical doubles in both engines, so the
    min is bit-identical), ps_availqty = total quantity shipped
    (quantities are small integers stored as double — sums are exact).
    One hash-agg, shuffle = |distinct (part, supp)|."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        F.sum("l_quantity").alias("ps_availqty"),
    )


_PARTSUPP_CTE = """
partsupp AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost,
           sum(l_quantity) AS ps_availqty
    FROM lineitem
    GROUP BY 1, 2
)
"""


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated min subquery)
# --------------------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every LARGE part of size >= 40, the
    EUROPE supplier(s) offering the minimum supplycost. The correlated
    `= (SELECT min ...)` becomes a min-window over ps_partkey on the
    region-filtered partsupp — one shuffle on partkey; part/supplier/
    nation/region all broadcast. Equality with min is set-membership
    on identical doubles, not arithmetic — exact in both engines."""
    tune(spark)
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") >= 40) & (F.col("p_type") == "LARGE")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_sup = (
        sup.join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg),
                    nat.n_regionkey == reg.r_regionkey,
                )
            ),
            sup.s_nationkey == nat.n_nationkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    priced = ps.join(
        F.broadcast(part), ps.ps_partkey == part.p_partkey
    ).join(eu_sup, ps.ps_suppkey == eu_sup.s_suppkey)
    w = Window.partitionBy("ps_partkey")
    return (
        priced.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            F.round("ps_supplycost", 4).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH {_PARTSUPP_CTE.strip()},
eu_sup AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
),
priced AS (
    SELECT ps.*, e.s_name, e.s_acctbal, e.n_name
    FROM partsupp ps
    JOIN part p ON ps.ps_partkey = p.p_partkey
    JOIN eu_sup e ON ps.ps_suppkey = e.s_suppkey
    WHERE p.p_size >= 40 AND p.p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
       round(ps_supplycost, 4) AS supplycost
FROM (
    SELECT *, min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
    FROM priced
)
WHERE ps_supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q11 — important stock identification (HAVING over a global scalar)
# --------------------------------------------------------------------------
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value of the suppliers of ONE
    nation, keeping parts whose value exceeds a fixed fraction (0.02%) of
    the total (chosen to select a tail at every fixture scale). Value is computed in exact integer micro-units
    (floor(supplycost*1e6) × integer availqty) so both the per-part
    sums and the global threshold are order-independent BIGINTs —
    partition order can't flip the HAVING. The scalar total is a
    1-row aggregate cross-joined (broadcast) into the filter."""
    tune(spark)
    ps = _partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier").where(
        F.col("s_nationkey") == 3
    )
    val = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .select(
            "ps_partkey",
            (
                F.floor(F.col("ps_supplycost") * 1_000_000).cast("bigint")
                * F.col("ps_availqty").cast("bigint")
            ).alias("v_micro"),
        )
        .groupBy("ps_partkey")
        .agg(F.sum("v_micro").alias("value_micro"))
    )
    total = val.agg(
        F.sum("value_micro").alias("total_micro")
    )  # 1 row -> broadcast cross join
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("value_micro") * 5000 > F.col("total_micro"))  # > 0.02%
        .select(
            "ps_partkey",
            F.round(F.col("value_micro") / 1e6, 2).alias("stock_value"),
        )
        .orderBy(F.col("stock_value").desc(), "ps_partkey")
    )


Q11_SQL = f"""
WITH {_PARTSUPP_CTE.strip()},
val AS (
    SELECT ps_partkey,
           CAST(sum(CAST(floor(ps_supplycost * 1000000) AS BIGINT)
                    * CAST(ps_availqty AS BIGINT)) AS BIGINT) AS value_micro
    FROM partsupp
    JOIN supplier ON ps_suppkey = s_suppkey
    WHERE s_nationkey = 3
    GROUP BY ps_partkey
)
SELECT ps_partkey, round(value_micro / 1e6, 2) AS stock_value
FROM val
WHERE value_micro * 5000 > (SELECT CAST(sum(value_micro) AS BIGINT) FROM val)
ORDER BY stock_value DESC, ps_partkey
"""


# --------------------------------------------------------------------------
# Q12 — shipping-priority classes (conditional aggregate)
# --------------------------------------------------------------------------
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE-sums of order-priority
    classes, grouped by ship year, over LATE lineitems (shipped more
    than 30 days after the order date — the fixtures carry no
    commit/receipt dates or shipmode, so shipdate lag expresses the
    same orders⋈lineitem + two-branch conditional aggregate plan).
    One fact⋈fact shuffle; counts are exact longs."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


Q12_SQL = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY 1
ORDER BY ship_year
"""


# --------------------------------------------------------------------------
# Q15 — top supplier (view + equality with max)
# --------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, return the
    supplier(s) achieving the maximum. revenue == max(revenue) is THE
    classic float-equality trap, so revenue is accumulated as exact
    integer cent×basis-point products (price has 2 decimals, discount
    2 — round(*100) is >1e-10 away from any half-point, identical in
    both engines), making the max comparison exact BIGINT. The
    reported revenue divides once at the end."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = (
        li.select(
            "l_suppkey",
            (
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
            ).alias("rev_cbp"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("rev_cbp").alias("total_cbp"))
    )
    best = rev.agg(F.max("total_cbp").alias("max_cbp"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(best))
        .where(F.col("total_cbp") == F.col("max_cbp"))
        .join(sup, rev.l_suppkey == sup.s_suppkey)
        .select(
            F.col("s_suppkey"),
            "s_name",
            F.round(F.col("total_cbp") / 10000.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS total_cbp
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(total_cbp / 10000.0, 2) AS total_revenue
FROM rev
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_cbp = (SELECT max(total_cbp) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN + correlated aggregate)
# --------------------------------------------------------------------------
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of PROMO parts whose availqty
    exceeds half of what they shipped of that part during 1997 —
    nested IN subqueries with a correlated aggregate. The correlated
    `(SELECT sum(l_quantity) WHERE part=, supp=, year)` becomes a
    filtered pre-aggregation joined on the same keys; the final
    supplier filter is a LEFT SEMI join (the relational form of the
    reference's broadcast-dict membership probe, SURVEY.md J1).
    Quantity sums are exact (integer-valued doubles)."""
    tune(spark)
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "PROMO"
    )
    li = load_table(spark, sf_dir, "lineitem")
    shipped_97 = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_97"))
    )
    qualifying = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            shipped_97,
            (ps.ps_partkey == shipped_97.l_partkey)
            & (ps.ps_suppkey == shipped_97.l_suppkey),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty_97"))
        .select("ps_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(
            qualifying, sup.s_suppkey == qualifying.ps_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
WITH {_PARTSUPP_CTE.strip()},
shipped_97 AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty_97
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
)
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
    SELECT ps_suppkey
    FROM partsupp
    JOIN shipped_97 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      AND ps_availqty > 0.5 * qty_97
)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (multi-EXISTS self-join)
# --------------------------------------------------------------------------
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: in multi-supplier orders, count per supplier
    the orders where THAT supplier alone shipped last (EXISTS another
    supplier's line + NOT EXISTS another supplier also at the max
    shipdate). Both EXISTS collapse into one per-order aggregation
    (max shipdate, distinct suppliers, distinct suppliers at max) —
    hash-aggs on l_orderkey instead of two correlated self-joins; the
    sole-latest supplier qualifies iff ns >= 2 and n_at_max == 1.
    Timestamp equality is exact. Shuffles are all on l_orderkey(+
    suppkey) — countDistinct's two-phase expansion included; the
    per-order aggregate broadcasts at fixture scale and degrades to a
    co-partitioned SMJ at 100 TB (both sides keyed on l_orderkey)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # pair-level pre-aggregation: per (order, supplier) latest shipdate.
    # "supplier has a line at the order's max shipdate" is equivalent to
    # "their pair_max == the order max", so the at-max probe runs on the
    # pair aggregate (|distinct pairs| rows) instead of re-joining the
    # raw fact — at 30M lineitem rows this removed a fact-wide join +
    # distinct (sf5 soak: 16.7s -> 14.8s, SCALE.md). ns (distinct
    # suppliers) falls out of the same pair frame as a plain count.
    pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("pair_max")
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.max("pair_max").alias("max_ship"),
        F.count("*").alias("ns"),
    )
    at_max = (
        pair.join(per_order, "l_orderkey")
        .where(F.col("pair_max") == F.col("max_ship"))
        .where(F.col("ns") >= 2)
        .select("l_orderkey", "l_suppkey")
    )
    sole = (
        at_max.withColumn(
            "n_at_max",
            F.count("*").over(Window.partitionBy("l_orderkey")),
        )
        .where(F.col("n_at_max") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(sup), sole.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH per_order AS (
    SELECT l_orderkey, max(l_shipdate) AS max_ship,
           count(DISTINCT l_suppkey) AS ns
    FROM lineitem
    GROUP BY l_orderkey
),
at_max AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineitem l
    JOIN per_order o ON l.l_orderkey = o.l_orderkey
    WHERE l.l_shipdate = o.max_ship AND o.ns >= 2
),
sole AS (
    SELECT l_orderkey, l_suppkey
    FROM (
        SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS n_at_max
        FROM at_max
    )
    WHERE n_at_max = 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM sole
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (anti-join + scalar avg subquery)
# --------------------------------------------------------------------------
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per country, the count and balance-sum of
    rich-but-inactive customers — acctbal above the positive-balance
    average (scalar subquery, broadcast 1-row cross join) and no
    RECENT orders (LEFT ANTI join against the filtered order set;
    every fixture customer has some historic order, so Q22's "no
    orders at all" is expressed as none since 2000-01-01 — same anti
    -join plan shape, non-empty result). The fixtures carry no phone
    column, so the country-code prefix becomes c_nationkey
    (restricted to < 10, preserving Q22's IN-list country filter).
    Counts are exact longs;
    the avg threshold is one double identical in both engines applied
    to 2-decimal balances — no boundary ambiguity at fixture scale."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey") < 10
    )
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    rich_inactive = (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        rich_inactive.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
SELECT c_nationkey AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_nationkey < 10
  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0 AND c_nationkey < 10)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
ORDER BY cntrycode
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q12_late_shipment_priority": q12_late_shipment_priority,
    "q15_top_supplier": q15_top_supplier,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q22_sales_opportunity": q22_sales_opportunity,
}

ORACLE_SQL = {
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_stock": Q11_SQL,
    "q12_late_shipment_priority": Q12_SQL,
    "q15_top_supplier": Q15_SQL,
    "q20_potential_promotion": Q20_SQL,
    "q21_waiting_supplier": Q21_SQL,
    "q22_sales_opportunity": Q22_SQL,
}
