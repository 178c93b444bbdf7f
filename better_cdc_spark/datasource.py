"""Custom Python DataSource: a deterministic changelog generator.

The reference's ingest edge is a custom source — a Go goroutine speaking
the Postgres replication protocol and emitting RawMessages on a channel
(internal/wal/reader.go:124-178, 311-393). Spark's extension point for
exactly that role is the DataSource API: this module implements a
batch source that *generates* a wal2json-shaped change stream as a pure
function of (partition, row index) — the connector plumbing is real
(named format, options, partition planning, per-partition iterators);
only the wire protocol is replaced by arithmetic so the driver's DuckDB
oracle can reproduce every row with generate_series.

Scale design: partitions() returns one InputPartition per requested
split, so a 1000-executor cluster reads 1000 independent generator
streams with zero coordination — the same contract a real replication
source satisfies by slot-sharding. Rows never pass through the driver.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# Event mix echoes the reference's load harness: 60/40 within a 5-op tx is
# I,I,U,U,D (scripts/e2e-load-test.sh:22-27 uses 60/30/10 I/U/D with ~67%
# of traffic on orders; g % 3 != 0 gives the same two-thirds orders skew).
_OPS = ("I", "I", "U", "U", "D")


def gen_row(g: int) -> tuple:
    """The row at global index g — shared by every partition (and mirrored
    in SQL by the oracle; see qc09's generate_series expression)."""
    seq = g % 5
    return (
        g,
        g * 16,
        g // 5,
        seq,
        _OPS[seq],
        "accounts" if g % 3 == 0 else "orders",
        (g * 2654435761) % 1000000007,
    )


class ChangelogGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("partitions", "4"))
        self.rows_per_part = int(options.get("rowsperpartition", "1000"))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition):
        base = partition.value * self.rows_per_part
        for i in range(self.rows_per_part):
            yield gen_row(base + i)


class ChangelogGenDataSource(DataSource):
    """spark.read.format("changelog_gen").option("partitions", N)
    .option("rowsPerPartition", M).load()"""

    @classmethod
    def name(cls) -> str:
        return "changelog_gen"

    def schema(self) -> str:
        return (
            "g bigint, lsn bigint, txid bigint, seq_in_tx int, "
            "op string, tbl string, val bigint"
        )

    def reader(self, schema) -> ChangelogGenReader:
        return ChangelogGenReader(self.options)

    def streamReader(self, schema) -> "ChangelogGenStreamReader":
        return ChangelogGenStreamReader(self.options)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class ChangelogGenStreamReader(DataSourceStreamReader):
    """Streaming reader: monotonic offsets over the generated change log.

    The streaming face of R1 (internal/wal/reader.go): the offset is a
    single monotonically-increasing position — the LSN analog — up to
    ``maxRows`` (the WAL head). Spark persists the committed offset in
    the checkpoint exactly like the reference's acked-LSN tracking
    (reader.go:611-637), so a restarted query resumes from the last
    committed position, never re-emitting and never skipping. Each
    micro-batch's [start, end) range splits into ``partitions``
    independent generator slices — executors read in parallel, rows
    never pass through the driver.

    ``rowsPerBatch`` > 0 turns on per-trigger rate limiting (the
    maxOffsetsPerTrigger analog) by advancing an in-memory head pointer.
    That pointer is reader-local, so the dial is for CONTINUOUSLY
    RUNNING queries: this API gives latestOffset() no view of the
    committed offset, so a restarted rate-limited reader would re-admit
    from scratch (a real source derives latestOffset from the external
    system's head instead — Kafka end offsets, the replication slot's
    confirmed LSN). The restart-safe default (0) exposes the true head.
    """

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", "0"))
        self.max_rows = int(options.get("maxrows", "10000"))
        self.n_parts = int(options.get("partitions", "4"))
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        if self.rows_per_batch <= 0:
            return {"pos": self.max_rows}
        self._pos = min(self._pos + self.rows_per_batch, self.max_rows)
        return {"pos": self._pos}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for g in range(partition.start, partition.end):
            yield gen_row(g)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing external to ack

    def stop(self) -> None:
        pass


# ---------------------------------------------------------------------------
# Python DataSource WRITE path: a JSONL transport sink with 2-phase commit
# ---------------------------------------------------------------------------


class _SinkCommit(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class JsonlSinkWriter(DataSourceWriter):
    """Per-task JSONL writer with the standard two-phase commit contract:
    tasks stage to `<dir>/_staged/<uuid>.jsonl` and return a commit
    message; only the DRIVER's commit() publishes staged files into the
    final dir and re-stamps the `_BCS_COMMITTED` manifest (MERGING any
    previous manifest, so append-mode batches accumulate) — a failed or
    speculative task's file is never visible, and abort() removes the
    staging dir wholesale. This is the publisher-side idempotency/atomic-
    batch contract of the reference's JetStream sink (publish-then-ack,
    engine.go batch flush) expressed through Spark's sink API.

    Filesystem contract: ``path`` must be a SHARED mount visible to
    executors and driver under the same path (NFS/FUSE-mounted object
    store/local mode) — the same assumption every path-based file sink
    makes; executor-local staging with driver-side rename cannot work on
    per-node disks. One writer per path at a time (Spark's own file
    sinks require the same); abort() cleanup is best-effort.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")

    def write(self, iterator):
        import json
        import os
        import uuid

        staged_dir = os.path.join(self.path, "_staged")
        os.makedirs(staged_dir, exist_ok=True)
        staged = os.path.join(staged_dir, f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _SinkCommit(staged, n)

    def commit(self, messages):
        import json
        import os
        import shutil

        final = []
        manifest_path = os.path.join(self.path, "_BCS_COMMITTED")
        if os.path.exists(manifest_path):  # append mode: extend, don't clobber
            final = json.load(open(manifest_path))["files"]
        for m in messages:
            dest = os.path.join(self.path, os.path.basename(m.staged_path))
            shutil.move(m.staged_path, dest)
            final.append({"file": os.path.basename(dest), "rows": m.n_rows})
        shutil.rmtree(os.path.join(self.path, "_staged"), ignore_errors=True)
        with open(manifest_path, "w") as f:
            json.dump({"files": final, "total_rows": sum(x["rows"] for x in final)}, f)

    def abort(self, messages):
        import shutil
        import os

        shutil.rmtree(os.path.join(self.path, "_staged"), ignore_errors=True)


class JsonlSinkDataSource(DataSource):
    """df.write.format("bcs_jsonl_sink").option("path", dir).mode("append")"""

    @classmethod
    def name(cls) -> str:
        return "bcs_jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)
