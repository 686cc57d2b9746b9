"""Python UDAF surface (SURVEY.md §2.11) — a pandas GROUPED_AGG UDF
(Arrow-batched custom aggregate) next to its pure-Catalyst expression
twin, both held to the same DuckDB oracle.

The example aggregate is the GEOMETRIC MEAN of event values per event
type — a real metric (multiplicative averages for rates/ratios) that
Spark has no built-in for, so it's an honest UDAF demo rather than a
re-spelled avg(). The expression twin exp(avg(ln(x))) is the 100 TB
path: it stays in whole-stage codegen with map-side partial
aggregation, while the UDAF ships Arrow batches per group. Both round
to 6dp; values are filtered to > 0 (ln domain).
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf resolves the postponed
# string annotation "pd.Series" against the function's globals, so a
# local import would make the GROUPED_AGG signature undetectable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_events


def agg_geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas GROUPED_AGG UDAF call path (Arrow batch per group)."""
    from pyspark.sql.functions import pandas_udf

    tune(spark)

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import math

        import numpy as np

        # math.fsum is exactly rounded regardless of summand order, so
        # the result is identical however Arrow batches/partition order
        # feed the group — np.mean's pairwise summation was
        # partition-order-dependent near 6dp half-points (ADVICE r2).
        # Residual risk vs the oracle: DuckDB's avg(ln) accumulates
        # sequentially, so a group whose true mean sits within ~1 ulp
        # of a 5e-7 boundary could still round differently; that gap is
        # inherent to holding a float aggregate to a value-exact hash.
        logs = np.log(v.to_numpy())
        return float(math.exp(math.fsum(logs) / len(logs)))

    e = load_events(spark, sf_dir).where(F.col("value") > 0)
    # a GROUPED_AGG pandas UDF cannot share an agg() with JVM
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — the count rides in a
    # second agg joined on the 5-row group key. The expression twin
    # below shows the single-agg plan you'd actually run.
    g = e.groupBy("event_type").agg(
        F.round(geomean("value"), 6).alias("geomean_value")
    )
    n = e.groupBy("event_type").agg(F.count("*").alias("n"))
    # eqNullSafe, not join-on-name: both groupBys emit a NULL-key group
    # for failed-ingest rows, and null-rejecting equality would drop it
    # here while the expression twin and the oracle keep it
    return (
        g.alias("g")
        .join(
            n.alias("n"),
            F.col("g.event_type").eqNullSafe(F.col("n.event_type")),
        )
        .select("g.event_type", "g.geomean_value", "n.n")
    )


def agg_geomean_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression twin: exp(avg(ln(x))) — partial-agg friendly,
    whole-stage codegen, no Python. Same oracle as the UDAF path."""
    tune(spark)
    e = load_events(spark, sf_dir).where(F.col("value") > 0)
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.exp(F.avg(F.log("value"))), 6).alias("geomean_value"),
            F.count("*").alias("n"),
        )
    )


GEOMEAN_SQL = """
SELECT event_type,
       round(exp(avg(ln(value))), 6) AS geomean_value,
       count(*) AS n
FROM events
WHERE value > 0
GROUP BY event_type
"""


QUERIES = {
    "agg_geomean_udaf": agg_geomean_udaf,
    "agg_geomean_expr": agg_geomean_expr,
}

ORACLE_SQL = {
    "agg_geomean_udaf": GEOMEAN_SQL,
    "agg_geomean_expr": GEOMEAN_SQL,
}
