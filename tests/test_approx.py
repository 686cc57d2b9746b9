"""approx_count_distinct (HLL++) accuracy gate — the sketch the exact
NDV in table_stats would become at 100 TB must land within its
documented error band on the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CHECK


def test_approx_ndv_within_5pct(spark):
    from projetbigdata_spark.sources.catalog import load_table

    l = load_table(spark, SF_CHECK, "lineitem")
    row = l.agg(
        F.countDistinct("l_extendedprice").alias("exact"),
        F.approx_count_distinct("l_extendedprice", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05, row


def test_approx_percentile_within_band(spark):
    """approx_percentile (the t-digest-class sketch exact percentiles
    become at 100 TB) must land within 1% relative error of the exact
    quantile on the fixtures."""
    from projetbigdata_spark.sources.catalog import load_table

    l = load_table(spark, SF_CHECK, "lineitem")
    row = l.agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("exact"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"
        ).alias("approx"),
    ).first()
    for e, a in zip(row.exact, row.approx):
        assert abs(a - e) / e < 0.01, (e, a)
