"""Relational operator surface, part 3 — pivot, grouping sets, exact
percentiles, datetime scalar breadth, and an explicit salted two-phase
aggregation (the skew-mitigation pattern spelled out as a plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_documents_parallel, load_events, load_table

ORDER_STATUSES = ("F", "O", "P")


# --------------------------------------------------------------------------
# agg_pivot — groupBy().pivot(): one hash-agg producing a column per
# pivoted value (Catalyst rewrites to conditional aggregation — exactly
# what the oracle spells out). Pivot values pinned, so the schema is
# static and 100 TB-safe (no driver-side distinct scan).
# --------------------------------------------------------------------------
def agg_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(ORDER_STATUSES))
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[
                F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}")
                for s in ORDER_STATUSES
            ],
        )
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# agg_grouping_sets — explicit GROUPING SETS (beyond rollup/cube):
# per-(status,priority), per-status, and grand total in ONE pass
# (Expand + single shuffle), with grouping_id to disambiguate.
# --------------------------------------------------------------------------
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT)
                   AS gid,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS total_price
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT)
           AS gid,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
"""


# --------------------------------------------------------------------------
# agg_percentiles — EXACT percentile (Spark `percentile`, DuckDB
# quantile_cont: both linear-interpolation on the sorted set). The
# exact variant needs a per-group sort — fine for bounded groups; at
# unbounded cardinality switch to percentile_approx (t-digest), which
# trades the sort for a mergeable sketch (not oracle-comparable, so
# the exact form is the checked one).
# --------------------------------------------------------------------------
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


PERCENTILES_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# datetime_functions — temporal scalar breadth over events (P1/P5-class
# single-pass codegen): truncation, extraction, arithmetic, epoch.
# --------------------------------------------------------------------------
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    e = load_events(spark, sf_dir)
    return e.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day"),
        F.hour("ts").alias("hh"),
        F.minute("ts").alias("mm"),
        F.dayofweek("ts").alias("dow"),
        F.unix_timestamp("ts").alias("epoch_s"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")).alias(
            "days_since_start"
        ),
    )


DATETIME_SQL = """
SELECT event_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(hour(ts) AS INT) AS hh,
       CAST(minute(ts) AS INT) AS mm,
       CAST(CASE WHEN dayofweek(ts) = 0 THEN 1 ELSE dayofweek(ts) + 1 END
            AS INT) AS dow,
       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
       ts + INTERVAL 90 MINUTE AS ts_plus_90m,
       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT)
           AS days_since_start
FROM events
"""


# --------------------------------------------------------------------------
# agg_salted_user_totals — two-phase salted aggregation, the manual
# skew fix: phase 1 aggregates on (key, salt) spreading one hot key
# over SALT_BUCKETS reducers; phase 2 merges the partials. Result is
# identical to a direct groupBy (the oracle IS the direct groupBy);
# the plan carries two shuffles by design — the price of taming a key
# whose row count dwarfs a single executor. (AQE's skew-join handling
# covers joins; aggregation skew still wants salting.)
# --------------------------------------------------------------------------
SALT_BUCKETS = 8


def agg_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    e = load_events(spark, sf_dir)
    salted = e.withColumn(
        "salt", (F.col("event_id") % SALT_BUCKETS).cast("int")
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("pcents"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        (F.sum("pcents") / F.lit(100.0)).alias("total_value"),
    )


SALTED_SQL = """
SELECT event_type,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# array_functions — array/higher-order-function breadth (the Catalyst
# surface that replaces the reference's per-row Python list handling):
# slice, sort, distinct, contains, filter+transform composition —
# all codegen, zero shuffle.
# --------------------------------------------------------------------------
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projetbigdata_spark.functions.text import tokenize

    tune(spark)
    docs = load_documents_parallel(spark, sf_dir)
    toks = docs.select("doc_id", tokenize("text").alias("w"))
    return toks.select(
        "doc_id",
        F.concat_ws(" ", F.slice("w", 1, 3)).alias("first3"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.array_contains("w", "spark").cast("int").alias("has_spark"),
        F.concat_ws("|", F.slice(F.array_sort(F.array_distinct("w")), 1, 5)).alias(
            "first5_sorted"
        ),
        F.size(F.filter("w", lambda t: F.length(t) > 4)).alias("n_long_tokens"),
        F.concat_ws(
            " ", F.transform(F.slice("w", 1, 3), lambda t: F.upper(t))
        ).alias("first3_upper"),
    )


ARRAY_FUNCS_SQL = """
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS w
    FROM documents
)
SELECT doc_id,
       array_to_string(w[1:3], ' ') AS first3,
       CAST(len(list_distinct(w)) AS INT) AS n_distinct,
       CAST(list_contains(w, 'spark') AS INT) AS has_spark,
       array_to_string(list_sort(list_distinct(w))[1:5], '|') AS first5_sorted,
       CAST(len(list_filter(w, t -> length(t) > 4)) AS INT) AS n_long_tokens,
       array_to_string(list_transform(w[1:3], t -> upper(t)), ' ')
           AS first3_upper
FROM toks
"""


# --------------------------------------------------------------------------
# table_stats — ANALYZE-shape column profiling of lineitem in ONE scan:
# count / nulls / min / max / exact NDV per column, unpivoted to
# (column, metric rows). At 100 TB you'd swap exact NDV for
# approx_count_distinct (HLL sketch, mergeable) — kept exact here so
# the oracle can hash it; the approx twin is asserted within 5% in
# tests/test_approx.py.
# --------------------------------------------------------------------------
def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    l = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"),
            F.round(F.min(c), 4).alias(f"{c}_min"),
            F.round(F.max(c), 4).alias(f"{c}_max"),
            F.countDistinct(c).alias(f"{c}_ndv"),
        ]
    wide = l.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}_nulls, {c}_min, {c}_max, {c}_ndv" for c in cols
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stacked}) AS (column_name, n_nulls, min_val, max_val, ndv)",
    ).select("column_name", "n_rows", "n_nulls", "min_val", "max_val", "ndv")


_stats_union = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       round(min({c}), 4) AS min_val, round(max({c}), 4) AS max_val,
       count(DISTINCT {c}) AS ndv
FROM lineitem"""
    for c in ("l_quantity", "l_extendedprice", "l_discount")
)

TABLE_STATS_SQL = _stats_union


# --------------------------------------------------------------------------
# subquery_correlated — correlated scalar subquery (customers above
# their nation's average balance). Catalyst decorrelates this into an
# aggregate + join (DecorrelateInnerQuery) — the declarative spelling
# costs nothing vs. writing the join by hand, and stays readable.
# --------------------------------------------------------------------------
def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_cust_sq")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey,
               round(c_acctbal, 2) AS acctbal
        FROM v_cust_sq o
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM v_cust_sq i
                           WHERE i.c_nationkey = o.c_nationkey)
        """
    )


SUBQUERY_SQL = """
SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
FROM customer o
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                   WHERE i.c_nationkey = o.c_nationkey)
"""


# --------------------------------------------------------------------------
# join_interval_binned — time-range self-join with NO equi key ("error
# events within 60s of each other"), the shape that's quadratic if
# written naively. The scalable plan: bin each event into its 60s
# bucket AND the next bucket (every qualifying pair shares at least one
# bin), equi-join on the bin, filter the exact |Δt| predicate, dedup.
# Shuffle volume is 2x|rows|, pair work is per-bin — never all-pairs.
# The oracle IS the naive quadratic join (affordable at sf0.01).
# --------------------------------------------------------------------------
INTERVAL_US = 60_000_000


def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    e = load_events(spark, sf_dir).where(F.col("event_type") == "error")
    us = F.unix_micros(F.col("ts"))
    binned = e.select(
        "event_id",
        us.alias("t_us"),
        F.explode(
            F.array(
                (us - us % INTERVAL_US).alias("b0"),
                (us - us % INTERVAL_US + INTERVAL_US),
            )
        ).alias("bin"),
    )
    a = binned.alias("a")
    b = binned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bin") == F.col("b.bin"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .where(
            F.abs(F.col("a.t_us") - F.col("b.t_us")) <= INTERVAL_US
        )
        .select(
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
            (F.col("b.t_us") - F.col("a.t_us")).alias("delta_us"),
        )
        .distinct()
    )
    return pairs


INTERVAL_SQL = f"""
WITH e AS (
    SELECT event_id, epoch_us(ts) AS t_us FROM events
    WHERE event_type = 'error'
)
SELECT a.event_id AS id_a, b.event_id AS id_b,
       b.t_us - a.t_us AS delta_us
FROM e a JOIN e b
  ON a.event_id < b.event_id
 AND abs(a.t_us - b.t_us) <= {INTERVAL_US}
"""


# --------------------------------------------------------------------------
# agg_maxby — max_by/min_by/any-style selection aggregates: "the
# orderkey of the priciest order per status" without a window pass —
# one hash-agg instead of a sort+filter, the cheaper top-1-per-group.
# --------------------------------------------------------------------------
def agg_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    # composite ordering encoded as one sortable integer (price cents *
    # 1e9 + orderkey): ties on price break deterministically by orderkey
    # — DuckDB's arg_max/min accept only scalar ordering keys
    key = "CAST(round(o_totalprice * 100) AS BIGINT) * 1000000000 + o_orderkey"
    return o.groupBy("o_orderstatus").agg(
        F.expr(f"max_by(o_orderkey, {key})").alias("priciest_order"),
        F.expr(f"min_by(o_orderkey, {key})").alias("cheapest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


MAXBY_SQL = """
SELECT o_orderstatus,
       arg_max(o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) * 1000000000
                   + o_orderkey) AS priciest_order,
       arg_min(o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) * 1000000000
                   + o_orderkey) AS cheapest_order,
       round(max(o_totalprice), 2) AS max_price,
       round(min(o_totalprice), 2) AS min_price
FROM orders
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# agg_stats_exact — statistical aggregates (variance, stddev,
# correlation) computed from EXACT decimal component sums (n, Σx, Σx²,
# Σxy) instead of the built-in single-pass estimators: the built-ins
# accumulate doubles in partition order, which diverges between engines
# at the ulp level and can flip a rounding boundary. Component sums in
# decimal are order-independent -> bit-identical derived stats. Still
# ONE hash-agg pass; the algebra happens on the aggregated row.
# --------------------------------------------------------------------------
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    l = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,4)")
    y = F.col("l_extendedprice").cast("decimal(18,4)")
    comp = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * x).cast("decimal(28,8)")).alias("sxx"),
        F.sum((y * y).cast("decimal(28,8)")).alias("syy"),
        F.sum((x * y).cast("decimal(28,8)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    var_x = (sxx - sx * sx / n) / (n - 1)
    cov = (sxy - sx * sy / n) / (n - 1)
    var_y = (syy - sy * sy / n) / (n - 1)
    corr = cov / (F.sqrt(var_x) * F.sqrt(var_y))
    return comp.select(
        "l_returnflag",
        "n",
        F.round(var_x, 4).alias("var_qty"),
        F.round(F.sqrt(var_x), 4).alias("stddev_qty"),
        F.round(cov, 4).alias("covar_qty_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


STATS_SQL = """
WITH comp AS (
    SELECT l_returnflag,
           count(*) AS n,
           sum(CAST(l_quantity AS DECIMAL(19,4))) AS sx,
           sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
           sum(CAST(CAST(l_quantity AS DECIMAL(19,4))
                    * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8)))
               AS sxx,
           sum(CAST(CAST(l_extendedprice AS DECIMAL(19,4))
                    * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8)))
               AS syy,
           sum(CAST(CAST(l_quantity AS DECIMAL(19,4))
                    * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8)))
               AS sxy
    FROM lineitem
    GROUP BY l_returnflag
),
d AS (
    SELECT l_returnflag, n,
           CAST(n AS DOUBLE) AS nd,
           CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
           CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
           CAST(sxy AS DOUBLE) AS sxy
    FROM comp
)
SELECT l_returnflag, n,
       round((sxx - sx * sx / nd) / (nd - 1), 4) AS var_qty,
       round(sqrt((sxx - sx * sx / nd) / (nd - 1)), 4) AS stddev_qty,
       round((sxy - sx * sy / nd) / (nd - 1), 4) AS covar_qty_price,
       round(((sxy - sx * sy / nd) / (nd - 1))
             / (sqrt((sxx - sx * sx / nd) / (nd - 1))
                * sqrt((syy - sy * sy / nd) / (nd - 1))), 6) AS corr_qty_price
FROM d
"""


def join_bucketed_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join through the opt-in bucketed catalog layout
    (sources/catalog.py:ensure_bucketed): both sides persisted
    bucketBy(orderkey), so a repeated orders⋈lineitem join reads the
    layout back with zero Exchange when neither side broadcasts —
    pinned in tests/test_bucketing.py. At this sf Catalyst rightly
    broadcasts the orders side instead (bucketing is a no-op, not a
    pessimization); results are layout-independent, which is exactly
    what this oracle checks.

    Replaces the reference's only join idiom — driver-side broadcast
    dict probes (main_reglogit.py:72-77) — with the at-scale shape it
    cannot express: a co-located fact-to-fact equi join.
    """
    tune(spark)
    import os

    from projetbigdata_spark.sources.catalog import ensure_bucketed

    # pin the layout under the repo regardless of the driver's cwd
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
    )
    o = ensure_bucketed(spark, sf_dir, "orders", path_root=root)
    li = ensure_bucketed(spark, sf_dir, "lineitem", path_root=root)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


BUCKETED_JOIN_SQL = """
SELECT o_orderpriority,
       count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed scalar surface (the sibling of array_functions /
    json_extract): build a per-user map event_type → count with
    map_from_entries over a SORTED entry list (collect_list order is
    nondeterministic; the sort pins both map iteration order and the
    oracle), then exercise element_at / map_filter / transform_values /
    map_values / map_keys, flattening back to plain columns so the
    DuckDB oracle can state the same result without MAP support.
    All whole-stage codegen; two hash aggs = two exchanges."""
    tune(spark)
    e = load_events(spark, sf_dir)
    # a null event_type would be a legal group key but an ILLEGAL map
    # key (Spark NULL_MAP_KEY throws); coalesce to a sentinel in BOTH
    # engines so failed-ingest rows survive instead of crashing
    evt = F.coalesce(F.col("event_type"), F.lit("(null)"))
    per = e.groupBy("user_id", evt.alias("event_type")).agg(
        F.count("*").alias("n")
    )
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.element_at("m", "click").alias("click_n"),
        F.size(F.map_filter("m", lambda k, v: v >= 5)).alias("n_busy_types"),
        F.aggregate(
            F.map_values(F.transform_values("m", lambda k, v: v * 2)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("doubled_total"),
        F.concat_ws(",", F.map_keys("m")).alias("keys_csv"),
    )


MAP_FUNCS_SQL = """
WITH per AS (
    SELECT user_id, coalesce(event_type, '(null)') AS event_type,
           count(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS INT) AS n_types,
       CAST(max(CASE WHEN event_type = 'click' THEN n END) AS BIGINT)
           AS click_n,
       CAST(sum(CASE WHEN n >= 5 THEN 1 ELSE 0 END) AS INT)
           AS n_busy_types,
       CAST(sum(n * 2) AS BIGINT) AS doubled_total,
       string_agg(event_type, ',' ORDER BY event_type) AS keys_csv
FROM per GROUP BY user_id
"""


QUERIES = {
    "map_functions": map_functions,
    "agg_stats_exact": agg_stats_exact,
    "join_bucketed_priority_counts": join_bucketed_priority_counts,
    "join_interval_binned": join_interval_binned,
    "agg_maxby": agg_maxby,
    "subquery_above_nation_avg": subquery_above_nation_avg,
    "table_stats": table_stats,
    "array_functions": array_functions,
    "agg_pivot": agg_pivot_status_by_priority,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_percentiles": agg_percentiles,
    "datetime_functions": datetime_functions,
    "agg_salted_user_totals": agg_salted_user_totals,
}

ORACLE_SQL = {
    "map_functions": MAP_FUNCS_SQL,
    "agg_stats_exact": STATS_SQL,
    "join_bucketed_priority_counts": BUCKETED_JOIN_SQL,
    "join_interval_binned": INTERVAL_SQL,
    "agg_maxby": MAXBY_SQL,
    "subquery_above_nation_avg": SUBQUERY_SQL,
    "table_stats": TABLE_STATS_SQL,
    "array_functions": ARRAY_FUNCS_SQL,
    "agg_pivot": PIVOT_SQL,
    "agg_grouping_sets": GROUPING_SETS_SQL,
    "agg_percentiles": PERCENTILES_SQL,
    "datetime_functions": DATETIME_SQL,
    "agg_salted_user_totals": SALTED_SQL,
}
