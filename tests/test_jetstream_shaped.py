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


def test_publish_recovers_when_first_write_crashed_before_commit(
    spark, tmp_path, envelope
):
    """Crash-window replay: a kill during the FIRST store's parquet write
    leaves msgs_dir existing but with no committed data files (only an
    uncommitted _temporary dir, which the reader hides). Schema inference
    then raises UNABLE_TO_INFER_SCHEMA — which must read as an EMPTY
    store (nothing was committed), not wedge every subsequent replay."""
    import os

    sink = JetStreamShapedSink(spark, str(tmp_path), CFG).ensure_stream()
    os.makedirs(os.path.join(sink.msgs_dir, "_temporary"), exist_ok=True)
    n_events = envelope.count()
    assert sink.publish(envelope) == n_events
    assert sink.messages().count() == n_events


def test_empty_store_classifier_requires_no_committed_files(
    spark, tmp_path, envelope
):
    """r16 (from r15 ADVICE): UNABLE_TO_INFER_SCHEMA is only trusted as a
    first-publish signature when the store verifiably holds NO committed
    data file. _has_committed_files is that verifier: hidden/_ entries
    (the reader's own visibility rule) never count, any real file does —
    so a store whose parquet files survive some other read failure
    re-raises instead of silently disabling msg-id dedup."""
    import os

    sink = JetStreamShapedSink(spark, str(tmp_path), CFG).ensure_stream()
    # missing dir -> no committed files
    assert not sink._has_committed_files()
    # only invisible entries (_temporary spill, _SUCCESS, dotfile) -> still none
    os.makedirs(os.path.join(sink.msgs_dir, "_temporary", "0"), exist_ok=True)
    open(os.path.join(sink.msgs_dir, "_SUCCESS"), "w").close()
    open(os.path.join(sink.msgs_dir, ".hidden"), "w").close()
    assert not sink._has_committed_files()
    # a committed data file (even nested in a partition dir) flips it
    part = os.path.join(sink.msgs_dir, "commit_bucket=1")
    os.makedirs(part, exist_ok=True)
    with open(os.path.join(part, "part-00000.parquet"), "w") as f:
        f.write("x")
    assert sink._has_committed_files()


def test_publish_rejects_uncovered_subject(spark, tmp_path, envelope):
    narrow = StreamConfig(subjects=("cdc.testdb.public.orders",))
    sink = JetStreamShapedSink(spark, str(tmp_path), narrow).ensure_stream()
    with pytest.raises(ValueError, match="not covered"):
        sink.publish(envelope)  # accounts subject has no matching filter


def test_ordered_engine_over_sink_transport_is_effectively_once(spark, tmp_path):
    """Integration: OrderedPublishEngine driving the REAL sink publish
    path through SinkTransport, with an injected transient fault on the
    second item's first attempt. The retry republishes it; msg-id dedup
    absorbs any replay; the stored stream holds each event exactly once,
    in a state identical to a fault-free run."""
    from better_cdc_spark.streaming.jetstream_shaped import (
        JetStreamShapedSink,
        SinkTransport,
        StreamConfig,
    )
    from better_cdc_spark.streaming.publish_retry import (
        OrderedPublishEngine,
        PublishItem,
        publish_and_checkpoint,
    )

    sink = JetStreamShapedSink(
        spark, str(tmp_path), StreamConfig(subjects=("cdc.>",))
    ).ensure_stream()

    items = [
        PublishItem(
            subject="cdc.testdb.public.orders",
            event_id=f"evt-{i}",
            payload=f'{{"n":{i}}}'.encode(),
            position=f"0/{i}",
        )
        for i in range(4)
    ]

    calls = {"n": 0}

    def flaky(batch):
        calls["n"] += 1
        # second publish call (= item 1, ordered single-item batches)
        # dies AFTER the broker stored the message on a previous run?
        # No — simulate the classic ack-lost case: raise on first touch
        # of evt-1 only, so the engine retries an item the broker may
        # or may not have stored; dedup makes both worlds identical.
        if batch[0].event_id == "evt-1" and calls["n"] == 2:
            raise ConnectionError("broker hiccup")

    transport = SinkTransport(sink, fail_injector=flaky)
    engine = OrderedPublishEngine(max_publish_retries=2, sleep=lambda s: None)
    acked = []
    result = publish_and_checkpoint(
        engine, transport, items, commit_position="0/99", checkpoint_cb=acked.append
    )
    assert result.is_complete()
    assert acked == ["0/99"]
    assert engine.retry_count == 1

    # at-least-once upstream replay of the whole batch: broker no-op
    engine2 = OrderedPublishEngine(max_publish_retries=0, sleep=lambda s: None)
    engine2.publish_with_retry(SinkTransport(sink), items)

    stored = sink.messages().toPandas()
    assert sorted(stored.msg_id) == [f"evt-{i}" for i in range(4)]
    assert set(stored.subject) == {"cdc.testdb.public.orders"}
