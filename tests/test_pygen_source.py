"""Custom Python DataSource (sources/pygen.py): batch + streaming
reads from the same registration, determinism, and partition layout."""

from __future__ import annotations

from pyspark.sql import functions as F


def _registered(spark):
    from projetbigdata_spark.sources.pygen import register

    register(spark)
    return spark


def test_corpusgen_batch_read(spark):
    s = _registered(spark)
    df = (
        s.read.format("corpusgen")
        .option("rows", 500)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # generation is partition-parallel
    assert df.count() == 500
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    # ids are a dense range; n_chars is consistent with text
    agg = df.agg(
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.count_distinct("doc_id").alias("n"),
        F.sum(
            (F.length("text") != F.col("n_chars")).cast("int")
        ).alias("bad_len"),
    ).first()
    assert (agg.lo, agg.hi, agg.n, agg.bad_len) == (0, 499, 500, 0)


def test_corpusgen_deterministic_across_reads_and_layouts(spark):
    """Row i depends only on (seed, i): re-reads and different
    partition counts yield identical datasets; a different seed does
    not."""
    s = _registered(spark)

    def read(seed, parts):
        return (
            s.read.format("corpusgen")
            .option("rows", 300)
            .option("partitions", parts)
            .option("seed", seed)
            .load()
        )

    a, b, c = read(42, 4), read(42, 7), read(43, 4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.exceptAll(c).count() > 0


def test_corpusgen_stream_drains_in_bounded_batches(spark):
    s = _registered(spark)
    st = (
        s.readStream.format("corpusgen")
        .option("rows", 300)
        .option("rows_per_batch", 50)
        .load()
    )
    assert st.isStreaming
    q = (
        st.writeStream.format("memory")
        .queryName("corpusgen_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table("corpusgen_sink")
    assert out.count() == 300
    assert out.select("doc_id").distinct().count() == 300
    # streamed rows are the SAME rows the batch read generates
    batch = (
        s.read.format("corpusgen").option("rows", 300).load()
    )
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_corpusgen_feeds_registered_operators(spark):
    """The generated corpus slots into the documents-operator surface:
    run the exact-dedup signature agg over a corpusgen frame staged as
    a documents table."""
    import tempfile

    from projetbigdata_spark import registry

    s = _registered(spark)
    d = tempfile.mkdtemp()
    s.read.format("corpusgen").option("rows", 400).load().write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    # dedup_exact touches only documents; staging just that table works
    queries, _ = registry.collect()
    out = queries["dedup_exact"](spark, d)
    assert out.count() == 400


def test_corpusgen_stream_through_ingest_dedup(spark, tmp_path):
    """Connector × curation composition: stream the corpusgen source
    through the foreachBatch ingest-dedup job against a corpus staged
    from the SAME generator — every streamed doc is byte-identical to
    its corpus twin (same seed), so every doc carrying a signature
    must come back is_dup with itself as the best match."""
    from projetbigdata_spark.operators.dedup import signatures_of
    from projetbigdata_spark.streaming.jobs import incremental_dedup_stream

    s = _registered(spark)
    corpus = (
        s.read.format("corpusgen").option("rows", 200).option("seed", 7)
        .load().select("doc_id", "text")
    )
    corpus_sigs = signatures_of(corpus).localCheckpoint()

    stream = (
        s.readStream.format("corpusgen")
        .option("rows", 200)
        .option("rows_per_batch", 80)
        .option("seed", 7)
        .load()
        .select("doc_id", "text")
    )
    out_dir = str(tmp_path / "verdicts")
    q = incremental_dedup_stream(stream, corpus_sigs, out_dir).start()
    q.awaitTermination(300)

    verdicts = spark.read.parquet(out_dir)
    assert verdicts.count() == 200  # anchored: every doc has a verdict
    signed = verdicts.where(F.col("best_match").isNotNull())
    assert signed.count() > 0
    wrong = signed.where(
        (~F.col("is_dup")) | (F.col("best_match") != F.col("doc_id"))
    )
    assert wrong.count() == 0
