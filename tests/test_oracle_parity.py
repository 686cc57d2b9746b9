"""The local twin of the driver's correctness gate: every registered
query with an oracle runs at sf0.01 and must match DuckDB exactly
(column names, row count, order-insensitive values)."""

from __future__ import annotations

import pytest

from projetbigdata_spark import registry
from tests.conftest import SF_CHECK, assert_matches_oracle

QUERIES, ORACLES = registry.collect()
CHECKED = sorted(n for n in QUERIES if n in ORACLES)
ROWS_ONLY = sorted(n for n in QUERIES if n not in ORACLES)


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, oracle, name):
    df = QUERIES[name](spark, SF_CHECK)
    assert_matches_oracle(df, oracle, ORACLES[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name](spark, SF_CHECK)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
