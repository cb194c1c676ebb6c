"""Custom connector via the Spark 4 Python DataSource API.

The reference hard-codes its two CSV inputs (recommender.py:40-44); a
real engine needs pluggable connectors. Spark 4's Python DataSource API
(SPARK-44076) is the sanctioned way to add one without JVM code: a
``DataSource`` subclass declares the schema, its reader splits the scan
into ``InputPartition``s, and each partition is read independently on an
executor — same parallel-scan contract as the builtin file sources.

``SyntheticDocsDataSource`` is a deterministic generator source (id,
title, body, body_len) used to exercise that contract end-to-end: the
row content is a pure function of the row id, so a DuckDB
``generate_series`` oracle can replay the whole scan and the driver's
correctness gate covers the connector like any other query.

Scale notes: ``partitions()`` returns one split per ``numPartitions``
(default 8) — Spark schedules them independently, so a generator of N
rows scans with full cluster parallelism and constant driver memory;
nothing is materialized driver-side. Arrow/pandas is not needed: the
reader yields plain tuples, and the per-row cost is trivial next to
the scan pipeline it feeds.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("title", StringType(), False),
        StructField("body", StringType(), False),
        StructField("body_len", IntegerType(), False),
    ]
)

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _row(i: int) -> tuple[int, str, str, int]:
    """Deterministic row content for id ``i`` (shared with the oracle:
    body = the word at i % 8 repeated (i % 5) + 1 times)."""
    word = _WORDS[i % len(_WORDS)]
    body = " ".join([word] * (i % 5 + 1))
    return (i, f"doc-{i}", body, len(body))


class _Range(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("numRows", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _Range(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("numRows", n)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> StructType:
        return DOCS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)


def register_stream(spark) -> None:
    spark.dataSource.register(CounterStreamDataSource)


# ---------------------------------------------------------------------------
# custom SINK: Python DataSource writer (jsonl files + commit manifest)
# ---------------------------------------------------------------------------


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int) -> None:
        self.path = path
        self.rows = rows


class _JsonlWriter(DataSourceWriter):
    """Per-partition task writer: stage to a uniquely-named file, report
    it in the commit message; the driver-side ``commit`` publishes a
    manifest naming exactly the committed files. Readers that honour the
    manifest never see files from failed/speculative tasks — the same
    two-phase contract as the builtin file sinks' _SUCCESS + file list.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> "_JsonlCommit":
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest = {
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class _JsonlStreamWriter(DataSourceStreamWriter):
    """STREAMING twin of the jsonl writer: same stage-then-publish
    protocol per MICRO-BATCH. Each epoch's tasks stage uniquely-named
    files; the driver-side ``commit(messages, batchId)`` publishes
    ``_MANIFEST-<batchId>.json`` naming exactly that epoch's committed
    files. Replayed batches (restart after a crash between sink commit
    and engine checkpoint) overwrite the SAME manifest id — readers that
    union manifests see each batch exactly once, which is how a
    file-based streaming sink upgrades at-least-once task execution to
    exactly-once publication.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> "_JsonlCommit":
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest = {
            "batch": batchId,
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId}.json"), "w"
        ) as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()`` —
    a pure-Python partitioned sink with a two-phase commit manifest.
    Also registers the STREAMING writer: ``df.writeStream.format(
    "jsonl_sink")`` publishes one manifest per micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> DataSourceStreamWriter:
        return _JsonlStreamWriter(self.options)


# ---------------------------------------------------------------------------
# custom STREAMING source: offset-tracked deterministic counter stream
# ---------------------------------------------------------------------------


class _CounterStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed synthetic stream: each micro-batch emits the next
    ``batchSize`` ids as (id, label) rows. Offsets are plain dicts the
    engine checkpoints — a restart resumes exactly where the last commit
    left off (exercised by the checkpoint-resume test).
    """

    def __init__(self, options: dict) -> None:
        self.batch = int(options.get("batchSize", 10))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = lo + self.batch
        return (iter([(i, _WORDS[i % len(_WORDS)]) for i in range(lo, hi)]),
                {"next": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            (i, _WORDS[i % len(_WORDS)])
            for i in range(int(start["next"]), int(end["next"]))
        )


COUNTER_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("label", StringType(), False),
    ]
)


class CounterStreamDataSource(DataSource):
    """``spark.readStream.format("counter_stream").option("batchSize", n)``."""

    @classmethod
    def name(cls) -> str:
        return "counter_stream"

    def schema(self) -> StructType:
        return COUNTER_SCHEMA

    def simpleStreamReader(self, schema: StructType):
        return _CounterStreamReader(self.options)


def clean_uncommitted(path: str) -> list[str]:
    """Remove data files the commit manifest does not name (leftovers
    from failed or speculative task attempts) — the VACUUM step of the
    sink's two-phase contract. Returns the removed paths. Raises if no
    manifest exists: without one there is no committed set to trust,
    and deleting anything would be guessing."""
    import json
    import os

    manifest_path = os.path.join(path, "_MANIFEST.json")
    with open(manifest_path) as f:
        committed = set(json.load(f)["files"])
    removed = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if (
            name.startswith("part-")
            and name.endswith(".jsonl")
            and full not in committed
        ):
            os.remove(full)
            removed.append(full)
    return removed
