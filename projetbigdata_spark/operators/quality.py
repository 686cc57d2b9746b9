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
