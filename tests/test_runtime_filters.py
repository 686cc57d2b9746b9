"""Runtime join-filter demonstrations — the two Catalyst features that
cut 100 TB fact scans at execution time rather than plan time:

- dynamic partition pruning (DPP): a selective dim filter is pushed
  into the partitioned fact scan as a runtime subquery, so only the
  partitions the dim actually references are read;
- runtime bloom-filter injection: for shuffle joins, a bloom filter
  built from the selective (creation) side is applied to the large
  (application) side scan, dropping never-joining rows before the
  shuffle.

Both are free once plans stay declarative (SURVEY.md §4.2) — these
tests pin that our scan/join shapes remain eligible, with the size
thresholds scaled down to fixture scale (at real scale the defaults
apply; the ELIGIBILITY is what's being protected)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CHECK


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Fact partitioned by event_type joined to a filtered dim: the
    fact scan must carry a dynamicpruning subquery filter (only the
    dim's surviving event_type partitions are read), and the result
    must equal the unpartitioned join."""
    from projetbigdata_spark.sources.catalog import load_table

    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF_CHECK, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("click", 1), ("purchase", 2), ("view", 3), ("error", 4)],
        ["event_type", "type_rank"],
    ).where(F.col("type_rank") <= 1)

    j = fact.join(dim, "event_type").groupBy("event_type").count()
    plan = _executed_plan(j)
    assert "dynamicpruning" in plan.lower(), plan

    got = {(r.event_type, r["count"]) for r in j.collect()}
    expected = {
        (r.event_type, r["count"])
        for r in ev.join(dim, "event_type")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert got == expected and got


def test_runtime_bloom_filter_injected_on_shuffle_join(spark):
    """Selective supplier filter ⋈ lineitem as a shuffle join: Catalyst
    must inject a bloom filter (might_contain) on the lineitem side.
    Thresholds are scaled to fixture size; broadcast is disabled
    because a broadcast join already prunes at the hash probe — the
    bloom path is the SMJ/SHJ story."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "1b",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from projetbigdata_spark.sources.catalog import load_table

        li = load_table(spark, SF_CHECK, "lineitem")
        supp = load_table(spark, SF_CHECK, "supplier").where(
            F.col("s_nationkey") == 3
        )
        j = (
            li.join(supp, li.l_suppkey == supp.s_suppkey)
            .groupBy("s_nationkey")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloomfilter" in opt or "might_contain" in opt, opt
        # and it still returns the right answer with the filter applied
        rows = j.collect()
        assert len(rows) == 1 and rows[0]["count"] > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
