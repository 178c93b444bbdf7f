"""JetStream-shaped transport: ensure/validate/publish/dedup semantics.

Mirrors the reference's publisher contract (jetstream.go:190-312 +
TestJetStreamDedup, readme.md:168): idempotent stream ensure, hard
failure on config drift, subject-filter routing, msg-id dedup inside the
duplicate window with bucket-pruned IO.
"""

from __future__ import annotations

import pytest

from better_cdc_spark.cdc import normalize_changelog, synthesize_changelog_from_orders
from better_cdc_spark.io import load_table
from better_cdc_spark.streaming.jetstream_shaped import (
    JetStreamShapedSink,
    StreamConfig,
    StreamConfigMismatch,
    StreamNotFound,
)
from tests.conftest import SF_SMOKE

CFG = StreamConfig(subjects=("cdc.>",))


@pytest.fixture(scope="module")
def envelope(spark):
    orders = load_table(spark, SF_SMOKE, "orders").limit(200)
    return normalize_changelog(
        synthesize_changelog_from_orders(orders),
        database="testdb",
        allowlist=["public.orders", "public.accounts"],
    ).localCheckpoint(eager=True)


def test_ensure_is_idempotent_and_validates_drift(spark, tmp_path):
    sink = JetStreamShapedSink(spark, str(tmp_path), CFG).ensure_stream()
    # second ensure with identical config: fine
    JetStreamShapedSink(spark, str(tmp_path), CFG).ensure_stream()
    sink.validate_stream()
    # drifted definition → hard failure naming the field
    drifted = StreamConfig(subjects=("cdc.>",), duplicate_window_s=300.0)
    with pytest.raises(StreamConfigMismatch, match="duplicate window mismatch"):
        JetStreamShapedSink(spark, str(tmp_path), drifted).ensure_stream()
    with pytest.raises(StreamConfigMismatch, match="replicas mismatch"):
        JetStreamShapedSink(
            spark, str(tmp_path), StreamConfig(subjects=("cdc.>",), replicas=3)
        ).ensure_stream()


def test_validate_missing_stream(spark, tmp_path):
    with pytest.raises(StreamNotFound, match="not found"):
        JetStreamShapedSink(spark, str(tmp_path), CFG).validate_stream()


def test_publish_requires_stream(spark, tmp_path, envelope):
    with pytest.raises(StreamNotFound):
        JetStreamShapedSink(spark, str(tmp_path), CFG).publish(envelope)


def test_publish_dedups_msg_id_within_window(spark, tmp_path, envelope):
    sink = JetStreamShapedSink(spark, str(tmp_path), CFG).ensure_stream()
    n_events = envelope.count()
    assert sink.publish(envelope) == n_events
    # full republish (at-least-once upstream): broker-side no-op
    assert sink.publish(envelope) == 0
    msgs = sink.messages()
    assert msgs.count() == n_events
    assert msgs.select("msg_id").distinct().count() == n_events
    # payloads are the byte-compatible CDC JSON with routed subjects
    row = msgs.limit(1).collect()[0]
    assert row["subject"].startswith("cdc.testdb.public.")
    assert b'"event_id"' in row["payload"].encode() if isinstance(row["payload"], str) else b'"event_id"' in row["payload"]


def test_publish_rejects_uncovered_subject(spark, tmp_path, envelope):
    narrow = StreamConfig(subjects=("cdc.testdb.public.orders",))
    sink = JetStreamShapedSink(spark, str(tmp_path), narrow).ensure_stream()
    with pytest.raises(ValueError, match="not covered"):
        sink.publish(envelope)  # accounts subject has no matching filter
