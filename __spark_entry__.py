"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``projetbigdata_spark`` (see SURVEY.md §7).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projetbigdata_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's A1
    vocabulary build (main_reglogit.py:58-71) made fully distributed —
    tokenize → explode → stopword filter → hash-agg → deterministic
    top-k vocab ids. Driver checks rows > 0."""
    from projetbigdata_spark.operators.vocabulary import vocab_topk

    return vocab_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.collect()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get
    rows-only checks — ML fits, LSH, streaming-native ops)."""
    return registry.collect()[1]
