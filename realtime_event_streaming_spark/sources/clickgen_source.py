"""Spark 4 Python Data Source: the click generator as a first-class
``spark.read.format("clickgen")`` source.

The reference's producer (producer/produce.py) is a standalone script;
`sources/clickgen.generate_clicks` already rebuilt its distributions
as column expressions. This module goes one step further and packages
the generator as a REGISTERED DATA SOURCE via the Python Data Source
API (pyspark.sql.datasource, new in Spark 4): users get partitioned,
deterministic synthetic load with plain ``spark.read`` — no imports,
no UDF plumbing — and the engine gets a worked example of the API its
own connectors would use.

Determinism contract: every column derives from md5(salt ":" i) 56-bit
integers — the SAME convention the oracle layer uses everywhere else —
so the source's output is reproducible across runs, partition counts
and engines, and a DuckDB oracle can restate the generator exactly
(see ``plans/source_queries.clickgen_source_histogram``). The
session-chain ``referrer`` column is deliberately NOT generated here:
it is a per-user window over arrival order (cross-partition state), so
it stays a downstream transform (`clickgen.generate_clicks` applies
it after its scan too).

Scale notes (100 TB): partitions carve the [0, n_events) id range, so
generation parallelizes to any cluster width with zero coordination;
rows are yielded per partition from pure arithmetic (no I/O, no
shared state). For bulk loads the Arrow-batch path
(DataSourceReader.read yielding pa.RecordBatch) is the documented
upgrade; row-tuples keep this reference implementation simple.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from .clickgen import COUNTRIES, DEVICES, PAGES

#: epoch ms of '2024-01-01 00:00:00 UTC' — generate_clicks' default.
_BASE_MS = 1_704_067_200_000

_SCHEMA = (
    "event_id string, user_id string, ts long, page string, "
    "country string, device string"
)


def _h(salt: str, i: int) -> int:
    """56-bit integer from md5(f'{salt}:{i}') — the repo-wide derived-
    value convention (matches DuckDB ('0x' || substr(md5(..),1,14))::BIGINT)."""
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:14], 16)


def _weighted(salt: str, i: int, choices) -> str:
    bucket = _h(salt, i) % 100
    cum = 0
    for value, weight in choices[:-1]:
        cum += weight
        if bucket < cum:
            return value
    return choices[-1][0]


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class ClickGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_events = int(options.get("n_events", 10_000))
        self.n_users = int(options.get("n_users", 500))
        self.step_ms = max(int(1000.0 / float(options.get("rate_per_sec", 100.0))), 1)
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self):
        per = max(1, -(-self.n_events // self.num_partitions))
        return [
            _Range(lo, min(lo + per, self.n_events))
            for lo in range(0, self.n_events, per)
        ]

    def read(self, partition: _Range):
        n_users, step_ms = self.n_users, self.step_ms
        for i in range(partition.start, partition.end):
            yield (
                hashlib.md5(f"evt{i}".encode()).hexdigest(),
                "u%06d" % (_h("usr", i) % n_users),
                _BASE_MS + i * step_ms + _h("jit", i) % step_ms,
                _weighted("page", i, PAGES),
                _weighted("country", i, COUNTRIES),
                _weighted("device", i, DEVICES),
            )


class ClickGenDataSource(DataSource):
    """``spark.read.format("clickgen").option("n_events", 50000).load()``"""

    @classmethod
    def name(cls) -> str:
        return "clickgen"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> ClickGenReader:
        return ClickGenReader(self.options)


def register(spark) -> None:
    """Idempotent session registration (re-registering replaces)."""
    spark.dataSource.register(ClickGenDataSource)


# ---------------------------------------------------------------------------
# Arrow-batch reader (bulk path) and streaming reader (offset-managed)
# ---------------------------------------------------------------------------


def _rows_for_range(start: int, end: int, n_users: int, step_ms: int):
    for i in range(start, end):
        yield (
            hashlib.md5(f"evt{i}".encode()).hexdigest(),
            "u%06d" % (_h("usr", i) % n_users),
            _BASE_MS + i * step_ms + _h("jit", i) % step_ms,
            _weighted("page", i, PAGES),
            _weighted("country", i, COUNTRIES),
            _weighted("device", i, DEVICES),
        )


class ClickGenArrowReader(ClickGenReader):
    """Bulk path: yields one Arrow RecordBatch per partition instead of
    Python row tuples — the documented upgrade for large n_events
    (same arithmetic, columnar transfer, no per-row pickling)."""

    def read(self, partition: _Range):
        import pyarrow as pa

        cols = list(
            zip(
                *_rows_for_range(
                    partition.start, partition.end, self.n_users, self.step_ms
                )
            )
        ) or [[]] * 6
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols[0], pa.string()),
                pa.array(cols[1], pa.string()),
                pa.array(cols[2], pa.int64()),
                pa.array(cols[3], pa.string()),
                pa.array(cols[4], pa.string()),
                pa.array(cols[5], pa.string()),
            ],
            names=["event_id", "user_id", "ts", "page", "country", "device"],
        )


class ClickGenStreamReader(DataSourceStreamReader):
    """Offset-managed streaming read: the unbounded id sequence emitted
    ``rows_per_batch`` per micro-batch. Offsets are plain dicts
    ({"i": next_unread}) — Spark checkpoints them, so a restarted query
    resumes exactly where it stopped (the same exactly-once discipline
    the file/Kafka sources give, reproduced in ~40 lines of Python).

    Scale notes: each micro-batch's range splits across
    ``num_partitions`` input partitions, so even the synthetic-load
    stream parallelizes; generation is pure arithmetic, so replays
    after failure are deterministic by construction."""

    def __init__(self, options):
        self.n_users = int(options.get("n_users", 500))
        self.step_ms = max(
            int(1000.0 / float(options.get("rate_per_sec", 100.0))), 1
        )
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        self.num_partitions = int(options.get("num_partitions", 4))

    def initialOffset(self):
        return {"i": 0}

    def latestOffset(self):
        # one planned micro-batch per trigger
        if not hasattr(self, "_latest"):
            self._latest = 0
        self._latest += self.rows_per_batch
        return {"i": self._latest}

    def partitions(self, start, end):
        lo, hi = start["i"], end["i"]
        per = max(1, -(-(hi - lo) // self.num_partitions))
        return [
            _Range(a, min(a + per, hi)) for a in range(lo, hi, per)
        ]

    def read(self, partition: _Range):
        yield from _rows_for_range(
            partition.start, partition.end, self.n_users, self.step_ms
        )

    def commit(self, end):
        """Nothing external to clean up — generation is stateless."""


class ClickGenStreamingDataSource(DataSource):
    """``spark.readStream.format("clickgen_stream")`` — the reference
    producer loop as a checkpointable Structured Streaming source."""

    @classmethod
    def name(cls) -> str:
        return "clickgen_stream"

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema) -> ClickGenStreamReader:
        return ClickGenStreamReader(self.options)


class ClickGenArrowDataSource(DataSource):
    """``format("clickgen_arrow")`` — same rows, Arrow-batch transfer."""

    @classmethod
    def name(cls) -> str:
        return "clickgen_arrow"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> ClickGenArrowReader:
        return ClickGenArrowReader(self.options)


def register_all(spark) -> None:
    """Register every clickgen source variant (idempotent)."""
    spark.dataSource.register(ClickGenDataSource)
    spark.dataSource.register(ClickGenArrowDataSource)
    spark.dataSource.register(ClickGenStreamingDataSource)
    spark.dataSource.register(WireDumpDataSource)


# ---------------------------------------------------------------------------
# wire-dump WRITER: the Kafka-wire JSON sink as a Python Data Source
# ---------------------------------------------------------------------------


class _WireCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class WireDumpWriter(DataSourceWriter):
    """Per-task JSON-lines writer with the commit/abort protocol the
    reference's Kafka producer cannot give its file fallback: each
    task writes a uniquely-named part file and reports it in its
    commit message; the DRIVER-side commit writes a ``_SUCCESS``
    manifest listing exactly the committed parts (readers ignore
    stragglers), and abort removes this task's partial file. That is
    the standard output-commit contract (what FileOutputCommitter
    does for parquet) reproduced for a custom wire format."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wiredump requires .option('path', ...)")

    def write(self, rows):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        from pyspark import TaskContext

        tc = TaskContext.get()
        part = f"part-{tc.partitionId():05d}-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, part)
        n = 0
        with open(full, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _WireCommit(part, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "parts": sorted(m.path for m in messages),
            "rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.path))
                except FileNotFoundError:
                    pass


class WireDumpDataSource(DataSource):
    """``df.write.format("wiredump").option("path", dir).save()`` —
    JSON-lines wire dump with a committed-parts manifest."""

    @classmethod
    def name(cls) -> str:
        return "wiredump"

    def writer(self, schema, overwrite: bool) -> WireDumpWriter:
        return WireDumpWriter(self.options)
