"""Wide-partition regression for window_distribution_customers.

row_number() is IntegerType, so the 1e6-grid rewrite must promote to
BIGINT before multiplying: ``(rn - 1) * 1000000`` overflows 32-bit once
a nation partition reaches ~2148 customers (sf1 has ~6000/nation).
Under ANSI mode the overflow raises ARITHMETIC_OVERFLOW; with ANSI off
it silently wraps and diverges from the DuckDB oracle's BIGINT math.
This test pins the fixed behavior on a 3000-row partition, both with
the session default and with ANSI forced on.
"""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def wide_customer_dir(spark, tmp_path_factory):
    """A customer table with one 3000-row nation partition."""
    d = tmp_path_factory.mktemp("wide_customer")
    rows = spark.range(3000).selectExpr(
        "CAST(id AS INT) AS c_custkey",
        "CAST(7 AS INT) AS c_nationkey",
        "CAST(100000 - id AS DOUBLE) AS c_acctbal",
    )
    rows.coalesce(1).write.mode("overwrite").parquet(str(d / "customer.parquet"))
    return str(d)


def _run(spark, sf_dir):
    from projetbigdata_spark.operators.windows import (
        DISTRIBUTION_SQL,
        window_distribution_customers,
    )

    got = {
        r["c_custkey"]: (r["pct_rank"], r["cume"])
        for r in window_distribution_customers(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet/*.parquet')"
    )
    want = {
        k: (p, c) for k, _, p, c in con.execute(DISTRIBUTION_SQL).fetchall()
    }
    con.close()
    assert len(got) == 3000
    assert got == want


def test_wide_partition_matches_oracle(spark, wide_customer_dir):
    _run(spark, wide_customer_dir)


def test_wide_partition_ansi_on(spark, wide_customer_dir):
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        _run(spark, wide_customer_dir)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)
