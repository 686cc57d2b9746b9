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


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Late-data drop: a second micro-batch whose events are older than
    (watermark = max_seen - 2h) must NOT appear in the aggregation.
    Files are staged with controlled names+mtimes so FileStreamSource
    processes on-time data first."""
    import os
    import time

    from pyspark.sql import functions as F

    from projetbigdata_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
        tumbling_counts_stream,
    )

    d = tmp_path / "late_events"
    d.mkdir()

    def write_events(rows, fname):
        df = spark.createDataFrame(
            rows, "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
        part = next(
            p for p in (tmp_path / "stage").iterdir() if p.name.endswith(".parquet")
        )
        part.rename(d / fname)

    base_ns = 1_700_000_000 * 10**9
    hour_ns = 3600 * 10**9
    now = time.time()
    # batch 0: t0+10h — sets the event-time high-water mark
    write_events(
        [(1, base_ns + 10 * hour_ns, 1, "click", 1.0, "{}")], "a_ontime.parquet"
    )
    os.utime(d / "a_ontime.parquet", (now - 100, now - 100))
    # batch 1: another on-time event — the watermark committed after
    # batch 0 (t0+8h) becomes the INPUT filter from this batch's commit
    # onward (watermarks apply one batch after they're computed)
    write_events(
        [(2, base_ns + 11 * hour_ns, 1, "view", 2.0, "{}")],
        "b_ontime.parquet",
    )
    os.utime(d / "b_ontime.parquet", (now - 50, now - 50))
    # batch 2: an event at t0 — 10h older than the 2h watermark: late
    write_events([(3, base_ns, 1, "click", 1.0, "{}")], "c_late.parquet")
    os.utime(d / "c_late.parquet", (now, now))

    # update mode: late input rows are filtered before aggregation
    # (complete mode retains all state and cannot demonstrate the drop)
    stream = tumbling_counts_stream(read_events_stream(spark, str(d)))
    q = run_to_memory_sink(stream, "late_sink", mode="update")
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1, [p["batchId"] for p in q.recentProgress]
    import datetime as dt

    t0 = dt.datetime.utcfromtimestamp(base_ns / 10**9)
    starts = {r.window_start for r in spark.table("late_sink").collect()}
    assert t0.replace(minute=0, second=0) not in starts, starts
    assert len(starts) == 2, starts


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


def test_stream_source_abstraction(spark, events_dir):
    """open_events_stream: every transport yields the SAME normalized
    schema, so jobs are transport-agnostic. The rate transport is
    exercised plan-side (composes with a real job); files transport
    execution is covered by the drain tests above."""
    import pytest

    from projetbigdata_spark.streaming.jobs import (
        open_events_stream,
        read_events_stream,
        tumbling_counts_stream,
    )

    files = open_events_stream(spark, {"kind": "files", "path": events_dir})
    rate = open_events_stream(spark, {"kind": "rate", "rows_per_second": 10})
    assert files.isStreaming and rate.isStreaming
    assert [f.name for f in files.schema] == [f.name for f in rate.schema]
    assert dict(files.dtypes)["ts"] == dict(rate.dtypes)["ts"] == "timestamp"
    # back-compat wrapper is the files spec
    assert read_events_stream(spark, events_dir).schema == files.schema
    # a real job composes with the synthetic transport (plan builds;
    # no execution — rate streams never terminate)
    tumbling_counts_stream(rate)
    with pytest.raises(KeyError):
        open_events_stream(spark, {"kind": "pulsar"})


def test_incremental_dedup_stream_equals_batch(spark, tmp_path):
    """Streaming ingest dedup == batch dedup_incremental: the src0
    batch arrives as TWO parquet micro-batches (maxFilesPerTrigger=1);
    per-batch verdicts against the static corpus signature table must
    together reproduce the batch operator's rows exactly (same
    signatures_of + incremental_match core on both paths)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import (
        INCR_NEW_SOURCE,
        _signatures,
        dedup_incremental,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import incremental_dedup_stream

    docs = load_table(spark, SF_SMOKE, "documents")
    new_docs = docs.where(F.col("source") == INCR_NEW_SOURCE).select(
        "doc_id", "text"
    )
    # stage the incoming batch as two files -> two triggers
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    # src0 doc_ids are the multiples of 20, so split on the 40-stride
    half = new_docs.where(F.col("doc_id") % 40 == 0)
    other = new_docs.subtract(half)
    half.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")
    other.coalesce(1).write.parquet(f"{in_dir}/b1.parquet")

    corpus_sigs = (
        _signatures(spark, SF_SMOKE)
        .join(docs.select("doc_id", "source"), "doc_id")
        .where(F.col("source") != INCR_NEW_SOURCE)
        .drop("source")
        .localCheckpoint()
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = incremental_dedup_stream(stream, corpus_sigs, out_dir).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    assert streamed.select("batch_id").distinct().count() == 2
    batch = dedup_incremental(spark, SF_SMOKE)
    assert streamed.count() == batch.count()
    cols = ["doc_id", "is_dup", "best_match", "best_est"]
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_ann_ingest_stream_equals_batch(spark, tmp_path):
    """Streaming ANN ingest == batch sim_ivf_incremental: the
    new-arrivals vector slice arrives as TWO parquet micro-batches;
    per-batch probes against the static frozen-codebook index must
    together reproduce the batch operator's top-k rows exactly (same
    build_ivf_base_index + incremental_ann_match core on both
    paths — the dedup twin's equality contract, for vectors)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        _is_new_col,
        build_ivf_base_index,
        sim_ivf_incremental,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import ann_ingest_stream

    new_vecs = (
        load_table(spark, SF_SMOKE, "embeddings")
        .where(_is_new_col())
        .select("vec_id", "embedding")
    )
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    half = new_vecs.where(F.col("vec_id") % 2 == 0)
    other = new_vecs.subtract(half)
    half.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")
    other.coalesce(1).write.parquet(f"{in_dir}/b1.parquet")

    cents, posting, base_norm = build_ivf_base_index(spark, SF_SMOKE)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = ann_ingest_stream(stream, cents, posting, base_norm, out_dir).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    assert streamed.select("batch_id").distinct().count() == 2
    batch = sim_ivf_incremental(spark, SF_SMOKE)
    cols = ["query_id", "neighbor_id", "cosine", "rnk"]
    assert streamed.count() == batch.count()
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_kafka_transport_construction_boundary(spark, events_dir):
    """The kafka spec of open_events_stream is exercised up to the
    classpath boundary: in this container the spark-sql-kafka connector
    jar is absent, so construction must fail with Spark's
    connector-missing guidance (DATA_SOURCE_NOT_FOUND naming the
    --packages coordinate), NOT a KeyError/TypeError in our own spec
    plumbing. If the jar IS on the classpath (deployment), the branch
    must instead yield the same normalized schema as every other
    transport. Deployment recipe: SCALE.md §Streaming."""
    import pytest

    from projetbigdata_spark.streaming.jobs import open_events_stream

    spec = {
        "kind": "kafka",
        "bootstrap_servers": "localhost:9092",
        "topic": "events",
        "max_offsets_per_trigger": 1000,
    }
    try:
        kafka = open_events_stream(spark, spec)
    except Exception as e:  # connector absent: the expected local outcome
        msg = str(e)
        assert "kafka" in msg.lower()
        assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg, msg
    else:  # connector present: full transport-agnostic schema contract
        files = open_events_stream(spark, {"kind": "files", "path": events_dir})
        assert kafka.isStreaming
        assert [f.name for f in kafka.schema] == [f.name for f in files.schema]


def test_files_transport_micros_fixture_no_conf_mutation(spark, tmp_path):
    """A TIMESTAMP(MICROS) events directory must stream without
    flipping the session-wide legacy nanosAsLong conf (which would
    change how every LATER reader in the session sees NANOS files).
    Probe-first hygiene, same as sources/catalog.load_events."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.streaming.jobs import open_events_stream

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, "false")
    micros_dir = str(tmp_path / "micros_events")
    spark.range(10).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        (F.col("id") % 3).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).coalesce(1).write.parquet(micros_dir)
    try:
        spark.conf.set(key, "false")
        stream = open_events_stream(spark, {"kind": "files", "path": micros_dir})
        assert dict(stream.dtypes)["ts"] == "timestamp"
        assert spark.conf.get(key) == "false", (
            "MICROS fixture must not flip the session-wide nanosAsLong conf"
        )
    finally:
        spark.conf.set(key, prev)


def test_rate_source_state_bounded(spark):
    """20s micro-soak of the session-window job on the rate transport
    (full soak: examples/rate_soak.py, SCALE.md §Streaming): the
    watermark must BOUND state — the rate source emits one event per
    user forever, so numRowsTotal plateaus at |users| open sessions;
    monotonic growth here is the unbounded-state bug this guards."""
    import time

    from projetbigdata_spark.streaming.jobs import (
        open_events_stream,
        session_windows_stream,
    )

    events = open_events_stream(spark, {"kind": "rate", "rows_per_second": 500})
    q = (
        session_windows_stream(events)
        .writeStream.format("memory")
        .queryName("rate_micro_soak")
        .outputMode("append")
        .start()
    )
    try:
        rows = []
        deadline = time.time() + 20
        while time.time() < deadline:
            time.sleep(4)
            p = q.lastProgress
            if p and p.get("stateOperators"):
                rows.append(
                    sum(op.get("numRowsTotal", 0) for op in p["stateOperators"])
                )
    finally:
        q.stop()
    assert rows, "no progress sampled in 20s"
    assert max(rows) <= 150, f"state grew past the user count: {rows}"


def test_stream_static_join_equals_batch(spark, events_dir):
    """Stream-static join: the streamed enrichment must equal the
    batch join row-for-row once drained (the static side re-plans per
    micro-batch; no state involved)."""
    from projetbigdata_spark.sources.catalog import load_events
    from projetbigdata_spark.streaming.jobs import (
        enriched_events_stream,
        open_events_stream,
        run_to_memory_sink,
        user_profile,
    )

    profile = user_profile(spark, SF_SMOKE).localCheckpoint()
    stream = open_events_stream(spark, {"kind": "files", "path": events_dir})
    run_to_memory_sink(
        enriched_events_stream(stream, profile), "enriched_sink"
    )
    streamed = spark.table("enriched_sink")

    batch = load_events(spark, SF_SMOKE).join(profile, "user_id").select(
        *streamed.columns
    )
    assert streamed.count() == batch.count() > 0
    assert streamed.subtract(batch).count() == 0
    assert batch.subtract(streamed).count() == 0


def test_stream_stream_join_equals_batch(spark, events_dir):
    """Stream-stream interval join: purchases ⋈ clicks (same user,
    click in the 30 min before the purchase) drained with availableNow
    must equal the oracle-checked batch twin pair-for-pair. Exercises
    the one streaming join class the other jobs don't: BOTH sides
    streaming, watermark + time-bound condition bounding the state."""
    from projetbigdata_spark.streaming.events_batch import (
        events_click_attribution,
    )
    from projetbigdata_spark.streaming.jobs import (
        click_attribution_stream,
        open_events_stream,
        run_to_memory_sink,
    )
    from pyspark.sql import functions as F

    ev = open_events_stream(spark, {"kind": "files", "path": events_dir})
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")
    run_to_memory_sink(
        click_attribution_stream(purchases, clicks), "attrib_sink"
    )
    streamed = spark.table("attrib_sink")

    batch = events_click_attribution(spark, SF_SMOKE)
    assert streamed.count() == batch.count() > 0
    assert streamed.subtract(batch).count() == 0
    assert batch.subtract(streamed).count() == 0


def test_transform_with_state_construction_or_totals(spark, events_dir):
    """Spark 4's transformWithStateInPandas tier: the query must
    CONSTRUCT against the streaming source unconditionally (API wiring
    is right), and when the runtime supports it (protobuf present —
    absent in this container) the drained totals must equal the batch
    aggregation, mirroring the applyInPandasWithState test."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.sources.catalog import load_events
    from projetbigdata_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
        running_totals_stream_tws,
        tws_available,
    )

    stream = running_totals_stream_tws(read_events_stream(spark, events_dir))
    assert stream.isStreaming and set(stream.columns) == {
        "user_id", "n_events", "total_value"
    }
    if not tws_available():
        pytest.skip("protobuf absent: transformWithState runtime blocked "
                    "(construction verified)")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        run_to_memory_sink(stream, "tws_totals_sink", mode="update")
        streamed = (
            spark.table("tws_totals_sink")
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
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill-and-resume with a checkpointLocation: a file-source stream
    drained in two separate query incarnations must deliver every
    event exactly once into the parquet sink — the offset log replays
    nothing and skips nothing. This is THE production property that
    distinguishes a checkpointed stream from a re-run batch job."""
    import shutil

    from pyspark.sql import functions as F

    from projetbigdata_spark.sources.catalog import load_events
    from projetbigdata_spark.streaming.jobs import open_events_stream

    # stage the corpus as 4 separate files so the offset log has
    # several entries to remember across the restart
    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    ev = load_events(spark, SF_SMOKE)
    ev.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "staged"))
    n = 0
    for i, part in enumerate(
        sorted((tmp_path / "staged").glob("part-*.parquet"))
    ):
        shutil.copy(part, src / f"f{i}.parquet")
        n += 1
    assert n == 4

    def run_once(max_files):
        stream = open_events_stream(
            spark,
            {"kind": "files", "path": str(src),
             "max_files_per_trigger": max_files},
        ).select("event_id", "user_id", "value")
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # incarnation 1 drains everything; incarnation 2 restarts from the
    # SAME checkpoint and must add nothing (offsets already committed)
    run_once(1)
    total = load_events(spark, SF_SMOKE).count()
    first = spark.read.parquet(sink)
    assert first.count() == total
    run_once(2)
    out = spark.read.parquet(sink)
    assert out.count() == total  # no replays after restart
    assert out.select("event_id").distinct().count() == total
    # and a NEW file arriving after the restart is picked up once
    shutil.copy(src / "f0.parquet", src / "f4_newarrival.parquet")
    run_once(2)
    dup_ids = spark.read.parquet(sink).groupBy("event_id").count()
    # the new file replays f0's events: each of those ids now appears
    # exactly twice (once per source file), everything else once
    replayed = dup_ids.where(F.col("count") == 2).count()
    once = dup_ids.where(F.col("count") == 1).count()
    f0_rows = spark.read.parquet(str(src / "f0.parquet")).count()
    assert replayed == f0_rows
    assert once == total - f0_rows
    assert dup_ids.where(F.col("count") > 2).count() == 0


def test_rocksdb_state_store_session_windows(spark, events_dir):
    """The RocksDB state-store provider — the backend you actually run
    at 100 TB state (bounded executor heap, incremental checkpoints) —
    must produce the identical session-window result as the default
    HDFS-backed store: drain the session stream under RocksDB and
    check it against the same watermark-filtered batch twin the
    default-provider test uses."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.sources.catalog import load_events
    from projetbigdata_spark.streaming.events_batch import events_session_30m
    from projetbigdata_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
        session_windows_stream,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = session_windows_stream(read_events_stream(spark, events_dir))
        run_to_memory_sink(stream, "rocksdb_session_sink")
        streamed = spark.table("rocksdb_session_sink")

        max_ts = load_events(spark, SF_SMOKE).agg(F.max("ts")).first()[0]
        batch = events_session_30m(spark, SF_SMOKE).where(
            F.col("session_end")
            < F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
        )
        assert streamed.count() == batch.count() > 0
        assert streamed.subtract(batch).count() == 0
        assert batch.subtract(streamed).count() == 0
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Spark's session_window MERGES an event exactly gap minutes
    after the previous one; the SESSION_SQL oracle must agree (it
    broke sessions at >= until the r3 review — latent because the
    fixtures' microsecond timestamps never land on an exact 30-min
    gap). Pin it with a constructed boundary corpus through BOTH
    engines."""
    import duckdb

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from projetbigdata_spark.streaming.events_batch import (
        SESSION_SQL,
        events_session_30m,
    )

    rows = [
        Row(event_id=0, ts="2024-01-01 00:00:00", user_id=1,
            event_type="click", value=1.0, props="{}"),
        Row(event_id=1, ts="2024-01-01 00:30:00", user_id=1,
            event_type="click", value=1.0, props="{}"),   # exact gap: merge
        Row(event_id=2, ts="2024-01-01 01:00:00.000001", user_id=1,
            event_type="click", value=1.0, props="{}"),   # 1µs over: break
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = events_session_30m(spark, d).collect()
    assert len(got) == 2
    assert sorted(r.n_events for r in got) == [1, 2]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    oracle = con.execute(SESSION_SQL).df()
    assert len(oracle) == 2
    assert sorted(oracle.n_events) == [1, 2]


def test_anomaly_stream_equals_batch(spark, tmp_path):
    """Streaming anomaly detection == batch events_anomaly_mad: the
    event stream arrives as TWO parquet micro-batches whose hourly
    count PARTIALS accumulate in the state table; the final flags
    snapshot must reproduce the batch frame exactly (both paths end in
    events_batch.mad_flags — the ann/dedup twins' equality contract,
    for the monitoring rule)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.sources.catalog import load_events
    from projetbigdata_spark.streaming.events_batch import (
        events_anomaly_mad,
    )
    from projetbigdata_spark.streaming.jobs import (
        anomaly_state_path,
        anomaly_stream,
        open_events_stream,
    )

    e = load_events(spark, SF_SMOKE)
    in_dir = str(tmp_path / "in")
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    # open_events_stream watches FLAT files (no recursiveFileLookup,
    # matching the events_dir fixture) — stage each half's part file
    # at the top level
    import glob
    import os

    os.makedirs(in_dir)
    half = e.where(F.col("event_id") % 2 == 0)
    other = e.subtract(half)
    for i, part in enumerate((half, other)):
        stage = str(tmp_path / f"stage{i}")
        part.coalesce(1).write.parquet(stage)
        shutil.copy(
            glob.glob(f"{stage}/part-*.parquet")[0],
            f"{in_dir}/b{i}.parquet",
        )

    stream = open_events_stream(
        spark,
        {"kind": "files", "path": in_dir, "max_files_per_trigger": 1},
    )
    # seed a LEGACY flat-layout file at the state_dir root: the v2
    # versioned subtree must never mix with it (ADVICE r6) — the run
    # below would fail partition discovery if it scanned the root
    os.makedirs(state_dir)
    with open(f"{state_dir}/legacy-flat.parquet", "wb") as fh:
        fh.write(b"not a real parquet file")

    q = anomaly_stream(stream, state_dir, out_dir).start()
    q.awaitTermination(120)

    # both micro-batches landed partials: same hour split across
    # triggers -> more partial rows than final (type, hour) groups
    partials = spark.read.parquet(anomaly_state_path(state_dir))
    streamed = spark.read.parquet(out_dir)
    assert partials.count() > streamed.count()

    batch = events_anomaly_mad(spark, SF_SMOKE)
    assert streamed.count() == batch.count()
    assert streamed.subtract(batch).count() == 0
    assert batch.subtract(streamed).count() == 0

    # at-least-once REPLAY of an already-committed micro-batch must be
    # a no-op: the partials are keyed by batch_id with overwrite, so
    # re-running the foreachBatch body with the same batch_id rewrites
    # identical content instead of double-counting (ADVICE r5)
    from projetbigdata_spark.streaming.jobs import anomaly_process

    before = sorted(
        spark.read.parquet(anomaly_state_path(state_dir)).collect(),
        key=lambda r: (r.event_type, str(r.hour), r.batch_id),
    )
    anomaly_process(state_dir, out_dir)(half, 0)
    after = sorted(
        spark.read.parquet(anomaly_state_path(state_dir)).collect(),
        key=lambda r: (r.event_type, str(r.hour), r.batch_id),
    )
    assert after == before
    replayed = spark.read.parquet(out_dir)
    assert replayed.subtract(batch).count() == 0
    assert batch.subtract(replayed).count() == 0

    # restart with the pinned (default) checkpoint RESUMES: no new
    # micro-batch runs, the state table is untouched
    q2 = anomaly_stream(stream, state_dir, out_dir).start()
    q2.awaitTermination(120)
    assert (
        sorted(
            spark.read.parquet(anomaly_state_path(state_dir)).collect(),
            key=lambda r: (r.event_type, str(r.hour), r.batch_id),
        )
        == before
    )


def test_quality_scores_stream_equals_batch(spark, tmp_path):
    """Streaming classifier scoring == the batch scorer on the same
    docs: the corpus arrives as two parquet micro-batches; per-batch
    frozen-coefficient verdicts must together reproduce
    corpus_quality_classifier_scores exactly (the stateless-model
    ingest twin — no state store, no ordering sensitivity)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.classifier import (
        corpus_quality_classifier_scores,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import quality_scores_stream

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    )
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    half = docs.where(F.col("doc_id") % 2 == 0)
    other = docs.subtract(half)
    half.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")
    other.coalesce(1).write.parquet(f"{in_dir}/b1.parquet")

    stream = (
        spark.readStream.schema("doc_id long, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = quality_scores_stream(stream, out_dir).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    assert streamed.select("batch_id").distinct().count() == 2
    batch = corpus_quality_classifier_scores(spark, SF_SMOKE)
    assert streamed.count() == batch.count()
    cols = ["doc_id", "lang", "logit_micros", "keep"]
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_trigram_scores_stream_equals_batch(spark, tmp_path):
    """Streaming LM scoring == the batch ingest twin on the same docs:
    the src0 batch arrives as two parquet micro-batches; per-batch
    frozen-model scores must together reproduce
    text_trigram_backoff_score_incremental exactly (stateless frozen
    model — no state store, no ordering sensitivity)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.selection import (
        text_trigram_backoff_score_incremental,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import trigram_scores_stream

    docs = load_table(spark, SF_SMOKE, "documents").where(
        F.col("source") == "src0"
    ).select("doc_id", "lang", "source", "text")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    # src0 doc_ids are all multiples of 20 (source = doc_id % 20), so
    # split on % 40 to get two non-empty micro-batches
    half = docs.where(F.col("doc_id") % 40 == 0)
    other = docs.subtract(half)
    assert half.count() > 0 and other.count() > 0
    half.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")
    other.coalesce(1).write.parquet(f"{in_dir}/b1.parquet")

    stream = (
        spark.readStream.schema(
            "doc_id long, lang string, source string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = trigram_scores_stream(stream, SF_SMOKE, out_dir).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    assert streamed.select("batch_id").distinct().count() == 2
    batch = text_trigram_backoff_score_incremental(spark, SF_SMOKE)
    assert streamed.count() == batch.count()
    cols = ["doc_id", "n_trigrams", "n_backoff", "sb_score_ppm"]
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_bloom_membership_stream_equals_batch(spark, tmp_path):
    """Streaming Bloom probing == the batch twin on the same docs: the
    src0 batch arrives as two micro-batches; per-batch verdicts against
    the frozen standing filter must together reproduce
    dedup_incremental_bloom exactly (monotone frozen filter — no state
    store, no ordering sensitivity)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import dedup_incremental_bloom
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import bloom_membership_stream

    docs = load_table(spark, SF_SMOKE, "documents").where(
        F.col("source") == "src0"
    ).select("doc_id", "source", "text")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    half = docs.where(F.col("doc_id") % 40 == 0)
    other = docs.subtract(half)
    assert half.count() > 0 and other.count() > 0
    half.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")
    other.coalesce(1).write.parquet(f"{in_dir}/b1.parquet")

    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = bloom_membership_stream(stream, SF_SMOKE, out_dir).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    assert streamed.select("batch_id").distinct().count() == 2
    batch = dedup_incremental_bloom(spark, SF_SMOKE)
    assert streamed.count() == batch.count()
    cols = ["doc_id", "possibly_dup"]
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_gopher_clean_stream_equals_batch(spark, tmp_path):
    """Streaming Gopher rule gating == the batch verdict on the same
    docs: the corpus arrives as two parquet micro-batches; per-batch
    in-row verdicts must together reproduce corpus_gopher_clean
    exactly (the stateless zero-shuffle ingest twin — no model table,
    no state store, no ordering sensitivity)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.repetition import (
        corpus_gopher_clean,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import gopher_clean_stream

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    half = docs.where(F.col("doc_id") % 2 == 0)
    other = docs.subtract(half)
    half.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")
    other.coalesce(1).write.parquet(f"{in_dir}/b1.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = gopher_clean_stream(stream, out_dir).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    assert streamed.select("batch_id").distinct().count() == 2
    batch = corpus_gopher_clean(spark, SF_SMOKE)
    assert streamed.count() == batch.count()
    cols = [c for c in batch.columns]
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_normalize_stream_equals_batch(spark, tmp_path):
    """Streaming normalization == the batch pass on the same docs:
    two parquet micro-batches of (doc_id, text) must together
    reproduce text_normalize exactly (stateless zero-shuffle in-row
    rules — the gopher_clean_stream class)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.curation import text_normalize
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import normalize_stream

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    half = docs.where(F.col("doc_id") % 2 == 0)
    other = docs.subtract(half)
    half.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")
    other.coalesce(1).write.parquet(f"{in_dir}/b1.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = normalize_stream(stream, out_dir).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    assert streamed.select("batch_id").distinct().count() == 2
    batch = text_normalize(spark, SF_SMOKE)
    cols = batch.columns
    assert streamed.count() == batch.count()
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_ccnet_select_stream_equals_batch(spark, tmp_path):
    """Streaming CCNet selection == the batch ingest twin on the same
    docs: the src0 batch arrives as two parquet micro-batches; each is
    verdicted against the frozen standing policy (gate + share cap +
    LM tercile bucket) and together the per-batch outputs must
    reproduce corpus_ccnet_select_incremental exactly (stateless
    frozen policy — no state store, no ordering sensitivity)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.selection import (
        corpus_ccnet_select_incremental,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import ccnet_select_stream

    docs = load_table(spark, SF_SMOKE, "documents").where(
        F.col("source") == "src0"
    ).select("doc_id", "lang", "source", "text")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    half = docs.where(F.col("doc_id") % 40 == 0)
    other = docs.subtract(half)
    assert half.count() > 0 and other.count() > 0
    half.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")
    other.coalesce(1).write.parquet(f"{in_dir}/b1.parquet")

    stream = (
        spark.readStream.schema(
            "doc_id long, lang string, source string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = ccnet_select_stream(stream, SF_SMOKE, out_dir).start()
    q.awaitTermination(180)

    streamed = spark.read.parquet(out_dir)
    assert streamed.select("batch_id").distinct().count() == 2
    batch = corpus_ccnet_select_incremental(spark, SF_SMOKE)
    cols = [
        "doc_id", "lang", "mixed", "lang_ok", "accept_ppm", "cap_ok",
        "ppl_bucket", "kept",
    ]
    assert streamed.count() == batch.count()
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_ccnet_select_stream_reads_persisted_policy(spark, tmp_path):
    """r11 (VERDICT r10 item 4): the streaming twin consuming a
    PERSISTED policy — save_ccnet_policy writes the epoch's parquet
    artifacts, ccnet_select_stream(policy_path=...) loads them instead
    of rebuilding, and the verdicts must equal the batch ingest twin
    exactly (load-then-apply ≡ build-then-apply, end to end at the
    streaming surface)."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import INCR_NEW_SOURCE
    from projetbigdata_spark.operators.selection import (
        ccnet_frozen_policy,
        corpus_ccnet_select_incremental,
        save_ccnet_policy,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import ccnet_select_stream

    standing = load_table(spark, SF_SMOKE, "documents").where(
        F.col("source") != INCR_NEW_SOURCE
    )
    pol_dir = str(tmp_path / "policy")
    save_ccnet_policy(ccnet_frozen_policy(standing), pol_dir)

    docs = load_table(spark, SF_SMOKE, "documents").where(
        F.col("source") == INCR_NEW_SOURCE
    ).select("doc_id", "lang", "source", "text")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    docs.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")

    stream = (
        spark.readStream.schema(
            "doc_id long, lang string, source string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = ccnet_select_stream(
        stream, SF_SMOKE, out_dir, policy_path=pol_dir
    ).start()
    q.awaitTermination(180)

    streamed = spark.read.parquet(out_dir)
    batch = corpus_ccnet_select_incremental(spark, SF_SMOKE)
    cols = [
        "doc_id", "lang", "mixed", "lang_ok", "accept_ppm", "cap_ok",
        "ppl_bucket", "kept",
    ]
    assert streamed.count() == batch.count()
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_bloom_stream_reads_persisted_bits(spark, tmp_path):
    """r11 epoch artifacts at the streaming surface: the Bloom twin
    consuming a PERSISTED bit set (save_bloom_bits →
    bloom_membership_stream(bits_path=...)) must reproduce the batch
    twin exactly."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import (
        INCR_NEW_SOURCE,
        bloom_bits_frame,
        dedup_incremental_bloom,
        save_bloom_bits,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import bloom_membership_stream

    standing = load_table(spark, SF_SMOKE, "documents").where(
        F.col("source") != INCR_NEW_SOURCE
    )
    bits_dir = str(tmp_path / "bloom")
    save_bloom_bits(bloom_bits_frame(standing), bits_dir)

    docs = load_table(spark, SF_SMOKE, "documents").where(
        F.col("source") == INCR_NEW_SOURCE
    ).select("doc_id", "source", "text")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    docs.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")

    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = bloom_membership_stream(
        stream, SF_SMOKE, out_dir, bits_path=bits_dir
    ).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    batch = dedup_incremental_bloom(spark, SF_SMOKE)
    cols = ["doc_id", "possibly_dup"]
    assert streamed.count() == batch.count()
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_trigram_stream_reads_persisted_model(spark, tmp_path):
    """r11 epoch artifacts at the streaming surface: the LM twin
    consuming a PERSISTED frozen model (save_sb_model →
    trigram_scores_stream(model_path=...)) must reproduce the batch
    frozen-LM twin exactly."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.dedup import INCR_NEW_SOURCE
    from projetbigdata_spark.operators.selection import (
        DSIR_TARGET_LANG,
        _sb_model,
        save_sb_model,
        text_trigram_backoff_score_incremental,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import trigram_scores_stream

    standing = load_table(spark, SF_SMOKE, "documents").where(
        F.col("source") != INCR_NEW_SOURCE
    )
    model_dir = str(tmp_path / "sb_model")
    save_sb_model(
        _sb_model(standing.where(F.col("lang") == DSIR_TARGET_LANG)),
        model_dir,
    )

    docs = load_table(spark, SF_SMOKE, "documents").where(
        F.col("source") == INCR_NEW_SOURCE
    ).select("doc_id", "lang", "source", "text")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    docs.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")

    stream = (
        spark.readStream.schema(
            "doc_id long, lang string, source string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = trigram_scores_stream(
        stream, SF_SMOKE, out_dir, model_path=model_dir
    ).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    batch = text_trigram_backoff_score_incremental(spark, SF_SMOKE)
    cols = ["doc_id", "n_trigrams", "n_backoff", "sb_score_ppm"]
    assert streamed.count() == batch.count()
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0


def test_ann_ingest_stream_reads_persisted_index(spark, tmp_path):
    """r11 epoch artifacts at the ANN streaming surface: the ingest
    twin probing a PERSISTED IVF index (save_ivf_index →
    load_ivf_index → ann_ingest_stream) must reproduce the batch twin
    exactly — the retrain-cadence deployment shape, end to end."""
    from pyspark.sql import functions as F

    from projetbigdata_spark.operators.similarity import (
        _is_new_col,
        build_ivf_base_index,
        load_ivf_index,
        save_ivf_index,
        sim_ivf_incremental,
    )
    from projetbigdata_spark.sources.catalog import load_table
    from projetbigdata_spark.streaming.jobs import ann_ingest_stream

    idx_dir = str(tmp_path / "ivf_index")
    save_ivf_index(build_ivf_base_index(spark, SF_SMOKE), idx_dir)
    cents, posting, base_norm = load_ivf_index(spark, idx_dir)

    new_vecs = (
        load_table(spark, SF_SMOKE, "embeddings")
        .where(_is_new_col())
        .select("vec_id", "embedding")
    )
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    new_vecs.coalesce(1).write.parquet(f"{in_dir}/b0.parquet")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = ann_ingest_stream(stream, cents, posting, base_norm, out_dir).start()
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    batch = sim_ivf_incremental(spark, SF_SMOKE)
    cols = ["query_id", "neighbor_id", "cosine", "rnk"]
    assert streamed.count() == batch.count()
    assert streamed.select(*cols).subtract(batch.select(*cols)).count() == 0
    assert batch.select(*cols).subtract(streamed.select(*cols)).count() == 0
