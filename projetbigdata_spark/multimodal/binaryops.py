"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio decoders, so the decode kernels are
STUBS (decode_image raises NotImplementedError; a deterministic fake
stands in for tests) — but the Spark-side plumbing is real and tested:
schemas, batch iteration, UDF signatures, and the oracle checks that
the pandas path produces byte-exact metadata.

Fixture: `payload = encode(text, 'utf-8')` — a deterministic stand-in
for real media bytes (ASCII corpus, so byte i == char i, which is what
lets DuckDB oracle-check a binary pipeline).

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of corpus size; frame-sampling emits rows (UDTF shape)
so downstream repartitioning controls skew from large media files.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetbigdata_spark.session import tune
from projetbigdata_spark.sources.catalog import load_table

FRAME_STRIDE = 16


def decode_image(payload: bytes) -> "object":
    """Real decoder hook — requires an image library not present in
    this environment. Wire PIL/libvips here in deployment."""
    raise NotImplementedError(
        "image decode requires an imaging library; use fake_decode_meta "
        "for deterministic tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decode: derives (width, height,
    format) from the byte content — stable across engines/runs."""
    w = 16 + payload[0] % 64 if payload else 16
    h = 16 + (len(payload) % 64)
    fmt = ("png", "jpeg", "webp")[len(payload) % 3]
    return w, h, fmt


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the binary media column (fixture: utf-8 text bytes).
    NULL text (failed media fetch) becomes an EMPTY payload, not a
    null — every downstream pandas kernel (len / slicing /
    np.frombuffer) would crash on None, and the robustness contract is
    that degenerate rows survive with degenerate values rather than
    vanish or kill the job (same rule as content_dedup's guard)."""
    return docs.withColumn(
        "payload", F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8")
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary metadata extraction through mapInPandas (the real UDF
    shape for media pipelines): byte length + first byte. The oracle
    recomputes both relationally — this asserts the Arrow binary
    round-trip is byte-exact."""
    tune(spark)
    docs = with_payload(load_table(spark, sf_dir, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                }
            )

    return docs.select("doc_id", "payload").mapInPandas(
        extract, "doc_id long, n_bytes long, first_byte int"
    )


META_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video-style row expansion): emit every 16th
    byte as a (frame_idx, byte_val) row — the 1-row-to-N-rows UDTF
    shape every media pipeline needs, via mapInPandas."""
    tune(spark)
    docs = with_payload(load_table(spark, sf_dir, "documents"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_val = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = payload[::FRAME_STRIDE]
                for i, b in enumerate(frames):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_val.append(int(b))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "byte_val": out_val}
            )

    return docs.select("doc_id", "payload").mapInPandas(
        sample, "doc_id long, frame_idx int, byte_val int"
    )


FRAME_SQL = f"""
SELECT doc_id,
       CAST((pos - 1) / {FRAME_STRIDE} AS INT) AS frame_idx,
       CAST(ascii(substr(text, pos, 1)) AS INT) AS byte_val
FROM documents,
     LATERAL (SELECT unnest(generate_series(1, length(text), {FRAME_STRIDE}))
              AS pos)
"""


def multimodal_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed decode output through the stubbed kernel — the schema and
    batch shape a real image decode would produce. Full-oracle since
    r7: the deterministic fake derives (width, height, format) from
    the payload's first byte and byte length, both of which DuckDB
    recomputes relationally (the fixture payloads are ASCII text
    bytes, so ascii(first char) == first byte — the META_SQL
    convention) — the row now asserts the Arrow binary round-trip AND
    the kernel's arithmetic, not just row counts. A real decode would
    drop back to rows-only."""
    tune(spark)
    docs = with_payload(load_table(spark, sf_dir, "documents"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # inline the fake-decode logic (not a call to the module-level
        # fake_decode_meta): a module-global reference pickles by
        # reference and breaks when workers can't import this package
        def _meta(payload: bytes) -> tuple[int, int, str]:
            w = 16 + payload[0] % 64 if payload else 16
            h = 16 + (len(payload) % 64)
            fmt = ("png", "jpeg", "webp")[len(payload) % 3]
            return w, h, fmt

        for pdf in batches:
            metas = pdf["payload"].map(_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": metas.map(lambda m: m[0]).astype("int32"),
                    "height": metas.map(lambda m: m[1]).astype("int32"),
                    "format": metas.map(lambda m: m[2]),
                }
            )

    return docs.select("doc_id", "payload").mapInPandas(
        decode, "doc_id long, width int, height int, format string"
    )


FAKE_DECODE_SQL = """
SELECT doc_id,
       CAST(CASE WHEN octet_length(encode(coalesce(text, ''))) = 0
                 THEN 16
                 ELSE 16 + ascii(substr(text, 1, 1)) % 64 END
           AS INT) AS width,
       CAST(16 + octet_length(encode(coalesce(text, ''))) % 64
           AS INT) AS height,
       ['png', 'jpeg', 'webp']
           [1 + octet_length(encode(coalesce(text, ''))) % 3] AS format
FROM documents
"""


RESIZE_TO = 64


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize kernel shape (image-style): clip every payload to a fixed
    byte budget (the real op would be a vectorized image resize; the
    stand-in keeps the exact Spark plumbing — binary in, binary out,
    per-batch pandas transform) and emit the resized payload's size +
    md5 so the oracle can verify the bytes, not just the metadata."""
    tune(spark)
    docs = with_payload(load_table(spark, sf_dir, "documents"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            resized = pdf["payload"].map(lambda b: b[:RESIZE_TO])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": resized.map(len).astype("int64"),
                    "content_md5": resized.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return docs.select("doc_id", "payload").mapInPandas(
        resize, "doc_id long, n_bytes long, content_md5 string"
    )


RESIZE_SQL = f"""
SELECT doc_id,
       CAST(least(octet_length(encode(text)), {RESIZE_TO}) AS BIGINT)
           AS n_bytes,
       md5(substr(text, 1, {RESIZE_TO})) AS content_md5
FROM documents
"""


N_FEATURE_BUCKETS = 8


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over the binary column — the stage where a
    real pipeline runs CLIP/audio embedding models per media payload.
    The deterministic stand-in is an 8-bucket byte histogram (numpy
    bincount over payload bytes mod 8), emitted long-form so the
    oracle can verify every feature value exactly. The Spark shape is
    the real one: Arrow-batched mapInPandas, vectorized kernel per
    batch, 1-row-to-K-features expansion, no driver involvement."""
    import numpy as np

    tune(spark)
    docs = with_payload(load_table(spark, sf_dir, "documents"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_bucket, out_n = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                counts = np.bincount(
                    np.frombuffer(payload, dtype=np.uint8) % N_FEATURE_BUCKETS,
                    minlength=N_FEATURE_BUCKETS,
                )
                for b in range(N_FEATURE_BUCKETS):
                    if counts[b]:
                        out_doc.append(doc_id)
                        out_bucket.append(b)
                        out_n.append(int(counts[b]))
            yield pd.DataFrame(
                {"doc_id": out_doc, "bucket": out_bucket, "n": out_n}
            )

    return docs.select("doc_id", "payload").mapInPandas(
        extract, "doc_id long, bucket int, n long"
    )


FEATURE_SQL = f"""
SELECT doc_id,
       CAST(ascii(substr(text, pos, 1)) % {N_FEATURE_BUCKETS} AS INT)
           AS bucket,
       count(*) AS n
FROM documents,
     LATERAL (SELECT unnest(generate_series(1, length(text))) AS pos)
GROUP BY 1, 2
"""


def multimodal_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media content-hash dedup — the image/audio counterpart of
    dedup_exact: hash the raw payload bytes INSIDE the Arrow batch
    iterator (hashlib over the binary column, the shape a real media
    pipeline uses since media bytes never decode to strings), then one
    hash-agg for (keep_id, n_copies) per distinct payload.

    Oracle: the fixture payload is the utf-8 encoding of text, so
    DuckDB's md5(text) (VARCHAR md5 hashes the string's utf-8 bytes)
    reproduces the binary-side digest exactly — asserting the Arrow
    binary round-trip is byte-faithful end to end. Scale: map-side
    hash (constant memory per Arrow batch) + shuffle of
    |distinct payloads| skinny rows."""
    import hashlib

    tune(spark)
    docs = with_payload(load_table(spark, sf_dir, "documents"))

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    # NULL payloads (failed media fetches) stay NULL so
                    # they group under the NULL key like dedup_exact —
                    # never crash the batch (found by test_null_inputs)
                    "content_md5": [
                        None if x is None else hashlib.md5(bytes(x)).hexdigest()
                        for x in b["payload"]
                    ],
                }
            )

    hashed = docs.select("doc_id", "payload").mapInPandas(
        hash_batches, "doc_id long, content_md5 string"
    )
    return hashed.groupBy("content_md5").agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
    )


CONTENT_DEDUP_SQL = """
SELECT md5(text) AS content_md5,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


QUERIES = {
    "multimodal_feature_extract": multimodal_feature_extract,
    "multimodal_meta": multimodal_meta,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_fake_decode": multimodal_fake_decode,
    "multimodal_content_dedup": multimodal_content_dedup,
}

ORACLE_SQL = {
    "multimodal_feature_extract": FEATURE_SQL,
    "multimodal_meta": META_SQL,
    "multimodal_fake_decode": FAKE_DECODE_SQL,
    "multimodal_resize": RESIZE_SQL,
    "multimodal_frame_sample": FRAME_SQL,
    "multimodal_content_dedup": CONTENT_DEDUP_SQL,
}
