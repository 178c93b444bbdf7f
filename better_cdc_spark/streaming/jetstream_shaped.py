"""JetStream-shaped publish transport (R11) over a file-backed stream.

The reference publishes to NATS JetStream: an idempotent ensure-or-
validate of the stream definition at startup, then per-event publishes
carrying ``Nats-Msg-Id = event_id`` for broker-side dedup inside the
configured duplicate window (/root/reference/internal/publisher/
jetstream.go:190-312 ensure/validate, :99-125 publish, :337-340 msg-id).

No broker ships in this container, so the transport is a directory — but
the SEMANTICS are the deliverable and they are real:

- ``ensure_stream``: create the stream manifest if absent, else validate
  every config field against the expected definition and FAIL on drift
  (name/subjects/retention/storage/replicas/max-age/duplicate-window —
  the same seven checks as validateStreamConfig, jetstream.go:277-312).
- ``publish``: rejects records whose subject no stream filter matches
  (JetStream's no-responders analog, checked with the same NATS wildcard
  grammar as config validation), serializes envelopes to the
  byte-compatible CDC JSON, and applies msg-id dedup bounded by the
  duplicate window — implemented exactly like the engine sink: the
  stream directory is partitioned by commit-time bucket and the dedup
  anti-join prunes to the batch's own buckets. O(batch window) per
  publish, never O(stream).

Swapping the directory for a real ``nats-py`` client at deploy time
changes only the I/O calls; every decision this module makes (ensure
semantics, subject routing, msg-id dedup, config drift failure) is
already exercised here.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from better_cdc_spark.session import ckpt

from better_cdc_spark.cdc.serialize import marshal_cdc_event
from better_cdc_spark.config import subject_filters_cover


@dataclass(frozen=True)
class StreamConfig:
    """Expected stream definition (expectedStreamConfig, jetstream.go:241-275)."""

    name: str = "CDC"
    subjects: tuple[str, ...] = ("cdc.>",)
    retention: str = "limits"
    storage: str = "file"
    replicas: int = 1
    max_age_s: float = 72 * 3600.0
    duplicate_window_s: float = 120.0

    def normalized(self) -> "StreamConfig":
        return StreamConfig(
            name=self.name or "CDC",
            subjects=tuple(self.subjects) or ("cdc.>",),
            retention=self.retention,
            storage="memory" if self.storage.lower() == "memory" else "file",
            replicas=max(1, self.replicas),
            max_age_s=self.max_age_s if self.max_age_s > 0 else 72 * 3600.0,
            duplicate_window_s=(
                self.duplicate_window_s if self.duplicate_window_s > 0 else 120.0
            ),
        )


class StreamConfigMismatch(RuntimeError):
    """Existing stream definition does not match the expected one."""


class StreamNotFound(RuntimeError):
    pass


def _validate_stream_config(actual: StreamConfig, expected: StreamConfig) -> None:
    """Field-by-field drift check (validateStreamConfig, jetstream.go:277-312)."""
    checks = [
        ("name", actual.name, expected.name),
        ("subjects", sorted(actual.subjects), sorted(expected.subjects)),
        ("retention", actual.retention, expected.retention),
        ("storage", actual.storage, expected.storage),
        ("replicas", actual.replicas, expected.replicas),
        ("max age", actual.max_age_s, expected.max_age_s),
        ("duplicate window", actual.duplicate_window_s, expected.duplicate_window_s),
    ]
    for label, got, want in checks:
        if got != want:
            raise StreamConfigMismatch(
                f"{label} mismatch: got {got!r} want {want!r}"
            )


class JetStreamShapedSink:
    """File-backed stream with JetStream ensure/publish/dedup semantics."""

    def __init__(self, spark: SparkSession, root_dir: str, config: StreamConfig) -> None:
        self.spark = spark
        self.config = config.normalized()
        self.stream_dir = os.path.join(root_dir, self.config.name)
        self.manifest_path = os.path.join(self.stream_dir, "stream.json")
        self.msgs_dir = os.path.join(self.stream_dir, "msgs")

    # -- ensure / validate (startup contract) ----------------------------

    def _read_manifest(self) -> StreamConfig | None:
        try:
            with open(self.manifest_path) as f:
                d = json.load(f)
        except FileNotFoundError:
            return None
        d["subjects"] = tuple(d["subjects"])
        return StreamConfig(**d)

    def ensure_stream(self) -> "JetStreamShapedSink":
        """Create-if-absent, else validate — idempotent startup step
        (ensureStream, jetstream.go:190-218)."""
        existing = self._read_manifest()
        if existing is not None:
            _validate_stream_config(existing, self.config)
            return self
        os.makedirs(self.stream_dir, exist_ok=True)
        # atomic publish of the manifest: tmp + rename
        fd, tmp = tempfile.mkstemp(dir=self.stream_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(self.config), f)
        os.replace(tmp, self.manifest_path)
        return self

    def validate_stream(self) -> None:
        """Exists-and-matches (validateStream, jetstream.go:227-239)."""
        existing = self._read_manifest()
        if existing is None:
            raise StreamNotFound(f"stream {self.config.name!r} not found")
        _validate_stream_config(existing, self.config)

    # -- publish ----------------------------------------------------------

    def publish(self, envelope: DataFrame) -> int:
        """Publish CDC envelopes; returns the number of NEW messages stored.

        Subject routing is validated against the stream's filters with
        the NATS wildcard grammar — an uncovered subject is a hard error
        (the reference would get no JetStream ack). Msg-id dedup inside
        the duplicate window uses the bucket-pruned anti-join: a
        republished event (same deterministic event_id ⇒ same commit
        timestamp ⇒ same bucket) is silently discarded, TestJetStreamDedup
        parity (readme.md:168).
        """
        return self.publish_records(
            marshal_cdc_event(envelope, "payload").select(
                F.col("event_id").alias("msg_id"),
                F.col("subject"),
                F.col("payload"),
                F.col("timestamp"),
            )
        )

    def publish_records(self, records: DataFrame) -> int:
        """Publish pre-serialized (msg_id, subject, payload, timestamp)
        records — the seam the ordered-publish transport uses; `publish`
        is marshal + this."""
        if self._read_manifest() is None:
            raise StreamNotFound(f"stream {self.config.name!r} not found")
        # Daily partitioning dial (see CDCStreamPipeline) — dedup is exact
        # at any width; duplicate_window_s stays the SEMANTIC contract.
        window_s = max(86400.0, self.config.duplicate_window_s)
        records = (
            records.select(
                "msg_id",
                "subject",
                "payload",
                F.coalesce(
                    F.floor(
                        F.unix_timestamp(F.col("timestamp")) / F.lit(float(window_s))
                    ),
                    F.lit(-1),
                )
                .cast("long")
                .alias("commit_bucket"),
            )
            .transform(ckpt)
        )

        # Subject covering: every distinct subject must match a filter.
        # Distinct subjects ≈ table count — a bounded driver check.
        subjects = [r[0] for r in records.select("subject").distinct().collect()]
        uncovered = [
            s for s in subjects
            if not subject_filters_cover(self.config.subjects, s)
        ]
        if uncovered:
            raise ValueError(
                f"subjects {uncovered} not covered by stream filters "
                f"{list(self.config.subjects)}"
            )

        buckets = [
            r[0] for r in records.select("commit_bucket").distinct().collect()
        ]
        # ONLY a provably empty store reads as empty; any other failure
        # re-raises — substituting an empty frame on a transient FS error
        # or corrupt footer would silently disable msg-id dedup and
        # re-store every replayed message (the same invisible-data-
        # hazard contract as CDCStreamPipeline._read_or_empty). "Empty"
        # has two shapes: the path does not exist (first publish), or it
        # exists with NO committed data files — a crash during the FIRST
        # store's write leaves only an uncommitted _temporary dir, which
        # the reader hides, so schema inference raises
        # UNABLE_TO_INFER_SCHEMA on every replay and would otherwise wedge
        # recovery permanently.
        try:
            existing = (
                self.spark.read.parquet(self.msgs_dir)
                .filter(F.col("commit_bucket").isin(buckets))
                .select("msg_id")
            )
        except AnalysisException as e:
            msg = str(e)
            if (
                "PATH_NOT_FOUND" not in msg
                and "Path does not exist" not in msg
                and "UNABLE_TO_INFER_SCHEMA" not in msg
            ):
                raise
            # Don't trust the error-message substring alone (r15 ADVICE):
            # UNABLE_TO_INFER_SCHEMA is only a first-publish signature when
            # the store truly holds NO committed data files. Verify by
            # listing (excluding _temporary/_SUCCESS/hidden entries); any
            # committed file present means the reader failed for some
            # OTHER reason — re-raise rather than silently disabling
            # msg-id dedup and re-storing every replayed message.
            if "UNABLE_TO_INFER_SCHEMA" in msg and self._has_committed_files():
                raise
            existing = records.select("msg_id").limit(0)
        fresh = records.join(existing, "msg_id", "left_anti").transform(ckpt)
        n = fresh.count()
        if n:
            # Backfills spanning many buckets: one writer set per bucket,
            # not tasks × buckets tiny files. Steady-state publishes keep
            # their parallelism (see CDCStreamPipeline rationale).
            if len(buckets) > 32:
                fresh = fresh.repartition("commit_bucket")
            fresh.write.mode("append").partitionBy("commit_bucket").parquet(
                self.msgs_dir
            )
        return n

    def _has_committed_files(self) -> bool:
        """True iff the msg store holds any COMMITTED data file.

        Committed = any file outside hidden/_-prefixed entries (the
        reader's own visibility rule: _temporary spill dirs, _SUCCESS
        markers and dotfiles are invisible to it). Hadoop FileSystem API,
        so the same check runs against HDFS/object stores on a cluster
        (the _pending_epoch_dirs precedent).
        """
        sc = self.spark.sparkContext
        jvm = sc._jvm
        Path = jvm.org.apache.hadoop.fs.Path
        root = Path(self.msgs_dir)
        fs = root.getFileSystem(sc._jsc.hadoopConfiguration())
        if not fs.exists(root):
            return False
        stack = [root]
        while stack:
            for st in fs.listStatus(stack.pop()):
                name = st.getPath().getName()
                if name.startswith(("_", ".")):
                    continue
                if st.isDirectory():
                    stack.append(st.getPath())
                else:
                    return True
        return False

    def messages(self) -> DataFrame:
        """All stored messages (consumer-side view)."""
        return self.spark.read.parquet(self.msgs_dir).drop("commit_bucket")


class SinkTransport:
    """Adapts the stream sink to the OrderedPublishEngine Transport
    protocol (streaming/publish_retry.py): ``publish_batch_async`` stores
    the items' serialized payloads through the SAME publish path as the
    DataFrame sink — subject-filter covering, msg-id dedup in the
    duplicate window, bucket-partitioned storage — and returns resolved
    acks. Broker parity: a retried or replayed item whose msg-id is
    already stored is a NO-OP ACK (JetStream duplicate-window behavior),
    which is exactly what makes at-least-once upstream + this sink
    effectively-once.

    Driver-side by design: the engine's ordered publish loop runs over
    the COLLECTED micro-batch (bounded by the batch-size dial), the same
    model as the reference's per-event loop; executors never see this
    class. ``fail_injector`` is the test seam: called with each item
    batch before the write, it may raise to simulate broker faults.
    """

    def __init__(self, sink: JetStreamShapedSink, publish_time=None, fail_injector=None):
        import datetime as _dt

        self.sink = sink
        self.publish_time = publish_time or _dt.datetime(2024, 1, 1)
        self.fail_injector = fail_injector

    def publish_batch_async(self, items):
        from better_cdc_spark.streaming.publish_retry import PendingAck

        if self.fail_injector is not None:
            self.fail_injector(items)
        rows = [
            (i.event_id, i.subject, bytes(i.payload), self.publish_time)
            for i in items
        ]
        df = self.sink.spark.createDataFrame(
            rows, "msg_id string, subject string, payload binary, timestamp timestamp"
        )
        self.sink.publish_records(df)  # dup msg-ids are broker no-op acks
        return [
            PendingAck(subject=i.subject, event_id=i.event_id, acked=True, resolved=True)
            for i in items
        ]
