"""True Structured Streaming jobs over the events table (SURVEY.md
§2.12 north-star). The batch twins in events_batch.py are the
oracle-checked specs; these run the same Catalyst expressions through
readStream/writeStream with watermarks, so batch result == streaming
result is the correctness property (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.session import tune


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a DIRECTORY of events parquet files
    (FileStreamSource rejects single-file paths; maxFilesPerTrigger
    simulates micro-batch arrival — in deployment this is Kafka)."""
    tune(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts_stream(events: DataFrame) -> DataFrame:
    """Watermarked tumbling 1h aggregation — the streaming twin of
    events_batch.events_tumbling_1h."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Watermarked streaming dedup on (user_id, event_type) — the
    streaming spelling of events_batch.events_dedup_keyed."""
    return events.withWatermark("ts", "2 hours").dropDuplicates(
        ["user_id", "event_type"]
    )


def run_to_memory_sink(df: DataFrame, name: str, mode: str = "append"):
    """Drain a stream with availableNow into an in-memory table;
    returns the finished StreamingQuery."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q
