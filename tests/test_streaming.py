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


def test_streaming_session_window_closed_sessions(spark, events_dir):
    """Append-mode session windows emit exactly the sessions whose end
    precedes the final watermark (max event time - 2h delay); verify
    against the batch twin filtered the same way."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.sources.catalog import load_events
    from projetbigdata_spark.streaming.events_batch import events_session_30m
    from projetbigdata_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
        session_windows_stream,
    )

    stream = session_windows_stream(read_events_stream(spark, events_dir))
    run_to_memory_sink(stream, "session_sink", mode="append")
    streamed = spark.table("session_sink")

    max_ts = load_events(spark, SF_SMOKE).agg(F.max("ts")).first()[0]
    batch = events_session_30m(spark, SF_SMOKE).where(
        F.col("session_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    )
    assert streamed.count() == batch.count() > 0
    assert batch.subtract(streamed).count() == 0


def test_streaming_stateful_running_totals(spark, events_dir):
    """applyInPandasWithState custom operator: final per-user state
    must equal the batch groupBy totals."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.sources.catalog import load_events
    from projetbigdata_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
        running_totals_stream,
    )

    stream = running_totals_stream(read_events_stream(spark, events_dir))
    run_to_memory_sink(stream, "totals_sink", mode="update")
    # update mode re-emits a user's row each trigger; keep the last
    # (monotone n_events -> max is the final state)
    streamed = (
        spark.table("totals_sink")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    batch = (
        load_events(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(F.count("*").alias("bn"), F.sum("value").alias("bv"))
    )
    j = streamed.join(batch, "user_id", "full_outer")
    bad = j.where(
        F.col("n_events").isNull()
        | F.col("bn").isNull()
        | (F.col("n_events") != F.col("bn"))
        | (F.abs(F.col("total_value") - F.col("bv")) > 1e-6)
    )
    assert bad.count() == 0


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
