"""Data-quality constraint checking (Deequ-style) — the validation
pass a 100 TB ingest runs before anything downstream trusts the data.

One scan per table + one anti-join for referential integrity; each
constraint emits (constraint, observed, violations) so the output is a
small report table, not a boolean — failures stay diagnosable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_table


def quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over `orders` (+ referential check against
    `customer`): key uniqueness, null rates, value ranges, domain
    membership, and orphaned foreign keys."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey")

    base = o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_cust"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpos_price"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("bad_status"),
    )
    orphans = (
        o.join(cust_keys, o.o_custkey == cust_keys.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_orphans"))
    )
    r = base.crossJoin(F.broadcast(orphans))
    rows = [
        ("orderkey_unique", F.col("n_keys"), F.col("n_rows") - F.col("n_keys")),
        ("custkey_not_null", F.col("n_rows"), F.col("null_cust")),
        ("totalprice_positive", F.col("n_rows"), F.col("nonpos_price")),
        ("status_in_domain", F.col("n_rows"), F.col("bad_status")),
        ("custkey_references_customer", F.col("n_rows"), F.col("n_orphans")),
    ]
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("constraint"),
                    obs.cast("bigint").alias("observed"),
                    viol.cast("bigint").alias("violations"),
                )
                for name, obs, viol in rows
            ]
        )
    ).alias("c")
    return r.select(report).select(
        "c.constraint", "c.observed", "c.violations"
    )


QUALITY_SQL = """
WITH base AS (
    SELECT count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_keys,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_cust,
           CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS nonpos_price,
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
    FROM orders
),
orphans AS (
    -- NOT EXISTS, not NOT IN: NULL keys must count as orphans (the
    -- left_anti semantics the Spark side uses), and a NULL c_custkey
    -- must not blank the whole check
    SELECT count(*) AS n_orphans FROM orders o
    WHERE NOT EXISTS
          (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)
)
SELECT 'orderkey_unique' AS constraint, n_keys AS observed,
       n_rows - n_keys AS violations FROM base
UNION ALL
SELECT 'custkey_not_null', n_rows, null_cust FROM base
UNION ALL
SELECT 'totalprice_positive', n_rows, nonpos_price FROM base
UNION ALL
SELECT 'status_in_domain', n_rows, bad_status FROM base
UNION ALL
SELECT 'custkey_references_customer', n_rows, n_orphans FROM base, orphans
"""


QUERIES = {"quality_constraints": quality_constraints}
ORACLE_SQL = {"quality_constraints": QUALITY_SQL}


SKEW_QUANTILES = (50, 99)  # percentiles of the per-key row-count
# distribution reported by join_key_skew_report


def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW telemetry — the diagnostic that decides whether a
    key needs salting / AQE skew-join before a 100 TB run: for the two
    join keys that matter in this schema (lineitem.l_orderkey, the
    fact⋈fact sort-merge key; events.user_id, the hot-key aggregation
    case agg_salted_user_totals exists for), the per-key row-count
    distribution summarized as one row each — key cardinality, total
    rows, max rows on one key, p50/p99 per-key counts, and
    skew_ratio_ppm = (max · n_keys · 1e6) div total (max over mean on
    the 1e6 grid, exact integers: a ratio near 1e6 is uniform; ≫1e6
    says one reducer will eat a multiple of the average).

    Scale recipe: percentiles of per-key counts WITHOUT sorting |keys|
    rows — the COUNT-OF-COUNTS histogram: groupBy(key) (the only
    corpus-sized shuffle, map-side combined), then groupBy(count)
    (rows = |distinct count values|, a few hundred at any corpus
    size), cumsum over that tiny frame, pick the smallest count whose
    cumulative key mass reaches ceil(q·n_keys) — the
    corpus_quality_quantiles integer-rank idiom pointed at key
    frequencies. An un-partitioned window over |keys| rows would be a
    single-task sort at scale; over |distinct counts| rows it is
    free."""
    from pyspark.sql.window import Window

    from projetbigdata_spark.sources.catalog import load_events

    tune(spark)
    outs = []
    for label, frame, key in (
        ("lineitem.l_orderkey", load_table(spark, sf_dir, "lineitem"),
         "l_orderkey"),
        ("events.user_id", load_events(spark, sf_dir), "user_id"),
    ):
        per_key = frame.groupBy(key).agg(F.count("*").alias("n"))
        hist = per_key.groupBy("n").agg(F.count("*").alias("k"))
        w = (
            Window.orderBy("n")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = hist.withColumn("ck", F.sum("k").over(w)).localCheckpoint(
            eager=False
        )  # |distinct counts| rows; consumed per quantile + totals
        tot = cum.agg(
            F.sum("k").cast("bigint").alias("n_keys"),
            F.sum(F.col("n") * F.col("k")).cast("bigint").alias("total_rows"),
            F.max("n").cast("bigint").alias("max_rows"),
        )
        qcols = []
        for q in SKEW_QUANTILES:
            qcols.append(
                F.min(
                    F.when(
                        F.col("ck") * 100 >= F.col("n_keys") * q,
                        F.col("n"),
                    )
                )
                .cast("bigint")
                .alias(f"p{q}_rows")
            )
        stats = (
            cum.crossJoin(F.broadcast(tot))
            .groupBy("n_keys", "total_rows", "max_rows")
            .agg(*qcols)
        )
        outs.append(
            stats.select(
                F.lit(label).alias("join_key"),
                "n_keys",
                "total_rows",
                "max_rows",
                *[F.col(f"p{q}_rows") for q in SKEW_QUANTILES],
                F.expr(
                    "CAST((CAST(max_rows AS DECIMAL(38,0)) * n_keys"
                    " * 1000000) div total_rows AS BIGINT)"
                ).alias("skew_ratio_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _skew_sql_for(table_expr: str, key: str, label: str) -> str:
    qsel = ",\n       ".join(
        f"""CAST((SELECT min(n) FROM cum_{key}
             WHERE ck * 100 >= (SELECT n_keys FROM tot_{key}) * {q})
            AS BIGINT) AS p{q}_rows"""
        for q in SKEW_QUANTILES
    )
    return f"""
per_key_{key} AS (
    SELECT {key} AS kk, count(*) AS n FROM {table_expr} GROUP BY {key}
),
hist_{key} AS (SELECT n, count(*) AS k FROM per_key_{key} GROUP BY n),
cum_{key} AS (
    SELECT n, k,
           sum(k) OVER (ORDER BY n ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS ck
    FROM hist_{key}
),
tot_{key} AS (
    SELECT CAST(sum(k) AS BIGINT) AS n_keys,
           CAST(sum(n * k) AS BIGINT) AS total_rows,
           CAST(max(n) AS BIGINT) AS max_rows
    FROM hist_{key}
),
row_{key} AS (
    SELECT '{label}' AS join_key, n_keys, total_rows, max_rows,
       {qsel},
       CAST((max_rows::HUGEINT * n_keys * 1000000) // total_rows
           AS BIGINT) AS skew_ratio_ppm
    FROM tot_{key}
)"""


JOIN_KEY_SKEW_SQL = (
    "WITH "
    + _skew_sql_for("lineitem", "l_orderkey", "lineitem.l_orderkey").lstrip()
    + ","
    + _skew_sql_for("events", "user_id", "events.user_id")
    + """
SELECT * FROM row_l_orderkey
UNION ALL
SELECT * FROM row_user_id
"""
)


QUERIES["join_key_skew_report"] = join_key_skew_report
ORACLE_SQL["join_key_skew_report"] = JOIN_KEY_SKEW_SQL
