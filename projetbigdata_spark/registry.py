"""Aggregates every operator module's QUERIES / ORACLE_SQL into the
single dict pair the driver contract (__spark_entry__.py) exposes.

Modules are imported lazily so a failure in one operator family (e.g.
an optional ML dep) can't take down the whole surface.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Ordered so the driver's correctness budget reaches every family:
# round 1 verified the relational/vocabulary/features modules but ran
# out of budget before windows..multimodal, so those run first now.
_MODULES = (
    "projetbigdata_spark.functions.nltk_tier",
    "projetbigdata_spark.operators.repetition",
    "projetbigdata_spark.operators.packing",
    "projetbigdata_spark.operators.quantize",
    "projetbigdata_spark.functions.udafs",
    "projetbigdata_spark.operators.windows",
    "projetbigdata_spark.operators.tfidf",
    "projetbigdata_spark.operators.textstats",
    "projetbigdata_spark.operators.sampling",
    "projetbigdata_spark.operators.sessionize",
    "projetbigdata_spark.operators.upsert",
    "projetbigdata_spark.operators.dedup",
    "projetbigdata_spark.operators.similarity",
    "projetbigdata_spark.streaming.events_batch",
    "projetbigdata_spark.ml.queries",
    "projetbigdata_spark.multimodal.binaryops",
    "projetbigdata_spark.operators.vocabulary",
    "projetbigdata_spark.functions.udtfs",
    "projetbigdata_spark.operators.relational",
    "projetbigdata_spark.operators.relational2",
    "projetbigdata_spark.operators.relational3",
    "projetbigdata_spark.operators.relational4",
    "projetbigdata_spark.operators.quality",
    "projetbigdata_spark.operators.features",
)


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLE_SQL", {}))
    missing = set(oracles) - set(queries)
    if missing:
        raise ValueError(f"oracle without query: {sorted(missing)}")
    return queries, oracles
