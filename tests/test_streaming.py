"""Structured Streaming correctness: streaming result == batch twin.

window()/session semantics are shared Catalyst expressions, so the
oracle-checked batch queries in events_batch.py fully specify what the
streams must emit once drained with availableNow."""

from __future__ import annotations

import shutil

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """FileStreamSource wants a directory; stage the events parquet."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-000.parquet")
    return str(d)


@pytest.fixture(scope="module")
def drained_tumbling(spark, events_dir):
    from projetbigdata_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
        tumbling_counts_stream,
    )

    stream = tumbling_counts_stream(read_events_stream(spark, events_dir))
    run_to_memory_sink(stream, "tumbling_sink", mode="complete")
    return spark.table("tumbling_sink")


def test_streaming_tumbling_equals_batch(spark, drained_tumbling):
    from projetbigdata_spark.streaming.events_batch import events_tumbling_1h

    batch = events_tumbling_1h(spark, SF_SMOKE)
    streamed = drained_tumbling
    assert streamed.count() == batch.count()
    assert batch.subtract(streamed).count() == 0
    assert streamed.subtract(batch).count() == 0


def test_streaming_dedup_counts(spark, events_dir):
    from projetbigdata_spark.sources.catalog import load_events
    from projetbigdata_spark.streaming.jobs import (
        dedup_stream,
        read_events_stream,
        run_to_memory_sink,
    )

    stream = dedup_stream(read_events_stream(spark, events_dir))
    run_to_memory_sink(stream, "dedup_sink", mode="append")
    streamed = spark.table("dedup_sink")
    batch_keys = (
        load_events(spark, SF_SMOKE).select("user_id", "event_type").distinct()
    )
    assert streamed.count() == batch_keys.count()
    assert (
        streamed.select("user_id", "event_type").subtract(batch_keys).count() == 0
    )
