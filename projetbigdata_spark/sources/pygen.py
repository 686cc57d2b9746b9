"""`corpusgen` — a custom connector on Spark 4's Python DataSource
API: a deterministic synthetic-document generator usable as BOTH a
batch source and a streaming source from the same registration.

Why it exists: soak and load tests need corpora bigger than the
fixtures without shipping bytes (examples/gen_soak.py replicates
parquet; this generates on the executors — zero I/O, any size), and
the engine should demonstrate the modern connector extension point the
way the reference demonstrated custom ingestion with its driver-side
loaders (`loadFilesPartial.py:5-40` — which read the whole corpus into
driver memory; here every partition generates its slice in parallel
and the driver never sees a row).

Determinism: row i is a pure function of (seed, i) via md5, so any
partitioning, retry, or speculative re-execution yields identical
rows — the same property our md5-bucket sampling relies on.

Honest limits (by API design, not implementation): the Python batch
DataSource API does no filter/column pushdown — a real table should
stay parquet where Catalyst prunes at the scan. This is the
CONNECTOR surface, for sources that don't exist as files (services,
generators, custom wire formats). Streaming offsets are plain row
positions `{"pos": n}`; each microbatch covers [start, end) split
into rows_per_batch partitions, so `availableNow` drains the whole
range and a restart resumes from the committed offset.

Options: rows (total, default 1000), partitions (batch split, default
8), rows_per_batch (stream partition size, default 100), seed
(default 42).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars int"

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch "
    "spark line sort window group filter column query"
).split()
_LANGS = ("en", "fr", "de")


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _gen_rows(seed: int, start: int, end: int) -> Iterator[tuple]:
    """Rows [start, end): pure function of (seed, i) — executor-side,
    retry-stable, order-deterministic."""
    for i in range(start, end):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        n = 20 + h[0] % 30
        words = [_VOCAB[(h[j % 16] + j) % len(_VOCAB)] for j in range(n)]
        text = " ".join(words)
        yield (i, text, _LANGS[h[1] % 3], f"src{h[2] % 5}", len(text))


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.nparts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        step = max(1, (self.rows + self.nparts - 1) // self.nparts)
        return [
            _Range(i, min(i + step, self.rows))
            for i in range(0, self.rows, step)
        ] or [_Range(0, 0)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        yield from _gen_rows(self.seed, partition.start, partition.end)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.total = int(options.get("rows", 1000))
        self.per_batch = max(1, int(options.get("rows_per_batch", 100)))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        return {"pos": self.total}

    def partitions(self, start, end):
        s, e = start["pos"], end["pos"]
        return [
            _Range(i, min(i + self.per_batch, e))
            for i in range(s, e, self.per_batch)
        ] or [_Range(s, s)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        yield from _gen_rows(self.seed, partition.start, partition.end)

    def commit(self, end):
        pass


class CorpusGenDataSource(DataSource):
    """spark.read.format("corpusgen") / spark.readStream.format(...)"""

    @classmethod
    def name(cls) -> str:
        return "corpusgen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent registration of the corpusgen format."""
    spark.dataSource.register(CorpusGenDataSource)
