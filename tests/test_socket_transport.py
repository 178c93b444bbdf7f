"""Network-proven transports: the replication session and the publish
engine driven over REAL TCP sockets against in-process scriptable
servers — converting round-5's "transport-injectable" into
"network-proven" without external dependencies.

Mirrors the reference's integration surface:
- reconnect loop with resume-from-LSN over a dropped link
  (/root/reference/internal/wal/reader.go:233-293)
- idle-advance heartbeat on a quiet stream
  (tests/integration/cdc_idle_heartbeat_test.go:12-41)
- ack-gated publish scenarios: fail-nth retry, slow ack, dropped ack,
  max-payload poison (/root/reference/internal/publisher/
  waitforacks_test.go:30-179 and engine_test.go:209-433)

No Spark session needed — these are driver-side protocol engines.
"""

from __future__ import annotations

import time

import pytest

from better_cdc_spark.cdc.replication import (
    ReplicationError,
    ReplicationLoop,
    ReplicationSession,
    lsn_to_str,
    start_replication_command,
)
from better_cdc_spark.cdc.socket_wire import FakeWalServer, connect_wire
from better_cdc_spark.streaming.publish_retry import (
    OrderedPublishEngine,
    PublishItem,
    publish_and_checkpoint,
)
from better_cdc_spark.streaming.socket_broker import (
    BrokerScript,
    FakeBrokerServer,
    SocketPublishTransport,
)


def wal_of(n: int, base: int = 1000):
    return [(base + i, f"payload-{i}".encode()) for i in range(n)]


def wait_until(pred, timeout_s: float = 3.0):
    end = time.monotonic() + timeout_s
    while time.monotonic() < end:
        if pred():
            return True
        time.sleep(0.02)
    return pred()


# -- replication over TCP ----------------------------------------------------


def test_socket_session_delivers_payloads_and_advances_confirmed_flush():
    wal = wal_of(10)
    with FakeWalServer(wal, keepalive_every=3) as srv:
        wire = connect_wire(
            "127.0.0.1", srv.port, start_replication_command("slot1", "0/0")
        )
        session = ReplicationSession(wire, standby_timeout_s=5.0)
        payloads = []
        for frame in session.poll():
            payloads.append(frame.payload)
            session.set_acked_position(lsn_to_str(frame.wal_start))
        assert session.ended
        assert payloads == [p for _, p in wal]
        assert session.stats.keepalives >= 3
        # the server observed the acked LSN advancing to the last frame
        assert wait_until(
            lambda: srv.confirmed_flush() == lsn_to_str(wal[-1][0])
        ), srv.confirmed_flush()
        wire.close()
        # the server parsed the START_REPLICATION command off the wire
        assert srv.connections[0].start_command.startswith(
            'START_REPLICATION SLOT "slot1" LOGICAL 0/0'
        )


def test_midstream_disconnect_reconnects_and_resumes_from_acked_lsn():
    """The reader.go:233-293 loop over a real dropped link: connection 0
    is hard-closed after 6 frames; the loop must reconnect and issue
    START_REPLICATION at the ACKED LSN, receiving only unacked WAL —
    every payload exactly once."""
    wal = wal_of(15)
    with FakeWalServer(wal, disconnect_after={0: 6}) as srv:
        loop = ReplicationLoop(
            connect=lambda resume: connect_wire(
                "127.0.0.1", srv.port,
                start_replication_command("slot1", resume),
            ),
            sleep=lambda s: None,  # skip real backoff
            standby_timeout_s=5.0,
        )
        seen = []

        def on_payload(frame):
            seen.append(frame.payload)
            return lsn_to_str(frame.wal_start)

        final = loop.run(on_payload)
        assert seen == [p for _, p in wal]  # exactly once, in order
        assert loop.reconnects == 1
        assert final == lsn_to_str(wal[-1][0])
        # the second connection resumed from the acked mid-stream LSN,
        # never 0/0 (the exact frame depends on how many of the 6 sent
        # frames survived the RST's receive-buffer discard)
        assert len(srv.connections) == 2
        assert srv.connections[1].start_lsn in {lsn for lsn, _ in wal[:6]}


def test_error_response_is_fatal_not_retried():
    with FakeWalServer(wal_of(3), error_on_connection={0: "slot dropped"}) as srv:
        loop = ReplicationLoop(
            connect=lambda resume: connect_wire(
                "127.0.0.1", srv.port,
                start_replication_command("slot1", resume),
            ),
            sleep=lambda s: None,
        )
        with pytest.raises(ReplicationError, match="slot dropped"):
            loop.run(lambda f: None)
        assert loop.fatal is not None
        assert len(srv.connections) == 1  # no retry on fatal


def test_idle_stream_heartbeats_over_socket():
    """A quiet server (stream held open, zero frames): the client's
    standby timeout must fire and send heartbeat statuses over the
    socket — the idle-advance contract that keeps confirmed_flush moving
    (cdc_idle_heartbeat_test.go parity, now network-proven)."""
    with FakeWalServer([], idle_hold_s=1.0) as srv:
        wire = connect_wire(
            "127.0.0.1", srv.port, start_replication_command("slot1", "1/AB")
        )
        session = ReplicationSession(
            wire, start_lsn="1/AB", standby_timeout_s=0.15
        )
        list(session.poll())
        assert session.ended
        assert session.stats.heartbeats >= 2
        # heartbeats carried the acked (start) LSN to the server
        assert wait_until(lambda: srv.confirmed_flush() == "1/AB")
        wire.close()


def test_partial_frame_across_standby_timeout_resyncs():
    """A large XLogData spanning TCP segments with the standby timeout
    striking between them: the timeout must surface as WireTimeout (a
    routine heartbeat signal) WITHOUT discarding the partial bytes, and
    the next recv must return the complete frame — no stream desync."""
    import socket as socklib
    import threading

    from better_cdc_spark.cdc import socket_wire as sw
    from better_cdc_spark.cdc.replication import (
        PG_EPOCH_US,
        WireTimeout,
        decode_frame,
        encode_xlog_data,
    )

    payload = b"x" * 4096
    msg = sw._pack_msg(
        sw.MSG_COPY_DATA, encode_xlog_data(1234, 1234, PG_EPOCH_US, payload)
    )
    half = len(msg) // 2
    srv = socklib.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        conn.setsockopt(socklib.IPPROTO_TCP, socklib.TCP_NODELAY, 1)
        sw.read_message(conn)  # the START_REPLICATION Query
        conn.sendall(sw._pack_msg(sw.MSG_COPY_BOTH_RESPONSE, b"\x00\x00\x00"))
        conn.sendall(msg[:half])
        time.sleep(0.5)  # > the client's 0.1 s standby timeout
        conn.sendall(msg[half:])
        conn.sendall(sw._pack_msg(sw.MSG_COPY_DONE, b""))
        time.sleep(0.3)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    wire = connect_wire(
        "127.0.0.1", port, start_replication_command("slot1", "0/0")
    )
    timeouts = 0
    while True:
        try:
            body = wire.recv(0.1)
            break
        except WireTimeout:
            timeouts += 1
            assert timeouts < 50, "never completed the split frame"
    assert timeouts >= 1  # the deadline really struck mid-message
    frame = decode_frame(body)
    assert frame.payload == payload and frame.wal_start == 1234
    assert wire.recv(2.0) is None  # CopyDone still parses → no desync
    wire.close()
    srv.close()
    t.join(timeout=3)


# -- publish engine over TCP -------------------------------------------------


def items_of(n: int):
    return [
        PublishItem(
            subject="cdc.testdb.public.orders",
            event_id=f"e{i}",
            payload=f"body-{i}".encode(),
            position=f"0/{i + 16:X}",
        )
        for i in range(n)
    ]


def fast_engine(**kw):
    kw.setdefault("sleep", lambda s: time.sleep(min(s, 0.01)))
    return OrderedPublishEngine(**kw)


def test_socket_publish_all_acked_in_order():
    with FakeBrokerServer() as srv:
        with SocketPublishTransport("127.0.0.1", srv.port) as tp:
            items = items_of(5)
            result = fast_engine().publish_with_retry(tp, items)
    assert result.is_complete()
    assert result.last_success_position == items[-1].position
    assert [e for _, e in srv.received] == [i.event_id for i in items]


def test_fail_nth_transient_retries_then_succeeds_over_socket():
    script = BrokerScript(fail_first={"e2": 2})
    with FakeBrokerServer(script) as srv:
        with SocketPublishTransport("127.0.0.1", srv.port) as tp:
            engine = fast_engine(max_publish_retries=3, publish_timeout_s=2.0)
            result = engine.publish_with_retry(tp, items_of(4))
    assert result.is_complete()
    assert srv.attempts("e2") == 3  # two transient errors + the success
    assert engine.retry_count == 2


def test_max_payload_is_permanent_and_quarantined_over_socket():
    script = BrokerScript(max_payload=16)
    quarantined = []
    with FakeBrokerServer(script) as srv:
        with SocketPublishTransport("127.0.0.1", srv.port) as tp:
            items = items_of(3)
            items[1].payload = b"x" * 64  # poison
            engine = fast_engine(
                max_publish_retries=3,
                publish_timeout_s=2.0,
                failure_policy="dlq",
                quarantine_cb=lambda item, err: quarantined.append(item.event_id),
            )
            result = engine.publish_with_retry(tp, items)
    assert result.is_resolved()
    assert quarantined == ["e1"]
    assert srv.attempts("e1") == 1  # permanent: retrying cannot succeed
    assert result.last_success_position == items[-1].position


def test_dropped_ack_times_out_then_retry_is_answered():
    """The broker swallows the first response for e1 (stuck ack): the
    engine must time out waiting, retry the publish, and succeed on the
    answered retry — TestWaitForAcks_PartialAckThenTimeout over a real
    socket."""
    script = BrokerScript(drop_ack={"e1"})
    with FakeBrokerServer(script) as srv:
        with SocketPublishTransport("127.0.0.1", srv.port) as tp:
            engine = fast_engine(max_publish_retries=2, publish_timeout_s=0.4)
            result = engine.publish_with_retry(tp, items_of(3))
    assert result.is_complete()
    assert srv.attempts("e1") == 2
    assert engine.retry_count == 1


def test_slow_ack_is_observed_promptly_not_at_full_timeout():
    """Acks resolve from the transport's reader THREAD (no resolve_at):
    the wait loop's poll cap must observe them within ~50 ms of arrival
    instead of sleeping out the whole publish timeout."""
    script = BrokerScript(ack_delay_s={"e0": 0.3})
    with FakeBrokerServer(script) as srv:
        with SocketPublishTransport("127.0.0.1", srv.port) as tp:
            engine = OrderedPublishEngine(publish_timeout_s=10.0)
            t0 = time.monotonic()
            result = engine.publish_with_retry(tp, items_of(1))
            wall = time.monotonic() - t0
    assert result.is_complete()
    assert wall < 2.0, f"slow ack took {wall:.2f}s — poll cap regressed"


def test_partial_failure_does_not_checkpoint_over_socket():
    """Crash policy + a transient failure that exhausts retries: the
    batch must NOT checkpoint (the commit position is a transaction
    boundary), and the contiguous-prefix position is diagnostics only
    (TestFlushWithBatchPublish_PartialFailureDoesNotCheckpoint)."""
    script = BrokerScript(fail_first={"e1": 99})
    ckpts = []
    with FakeBrokerServer(script) as srv:
        with SocketPublishTransport("127.0.0.1", srv.port) as tp:
            engine = fast_engine(max_publish_retries=1, publish_timeout_s=2.0)
            items = items_of(3)
            result = publish_and_checkpoint(
                engine, tp, items, commit_position="0/FF",
                checkpoint_cb=ckpts.append,
            )
    assert not result.is_resolved()
    assert ckpts == []
    assert result.last_success_position == items[0].position
    # and the all-green path checkpoints the COMMIT position
    with FakeBrokerServer() as srv:
        with SocketPublishTransport("127.0.0.1", srv.port) as tp:
            result = publish_and_checkpoint(
                fast_engine(), tp, items_of(2), commit_position="0/FF",
                checkpoint_cb=ckpts.append,
            )
    assert result.is_complete()
    assert ckpts == ["0/FF"]


def test_end_to_end_wal_to_broker_relay_with_ack_gated_checkpoint():
    """The reference's main loop over TWO real sockets (engine.go's
    read→publish→ack→checkpoint cycle): frames stream from the WAL
    socket, batches publish through the ordered engine to the broker
    socket (one scripted transient failure → retry over the wire), and
    the replication ack advances ONLY after the batch fully resolves —
    so the WAL server's confirmed_flush can never pass an unpublished
    position."""
    wal = [(2000 + i, f"ev-{i}".encode()) for i in range(12)]
    broker_script = BrokerScript(fail_first={"ev-5": 1})
    with FakeWalServer(wal, keepalive_every=5) as wsrv:
        with FakeBrokerServer(broker_script) as bsrv:
            with SocketPublishTransport("127.0.0.1", bsrv.port) as tp:
                wire = connect_wire(
                    "127.0.0.1", wsrv.port,
                    start_replication_command("slot1", "0/0"),
                )
                session = ReplicationSession(wire, standby_timeout_s=5.0)
                engine = fast_engine(max_publish_retries=2, publish_timeout_s=2.0)
                batch, published_hwm = [], []

                def flush_batch():
                    result = engine.publish_with_retry(tp, batch)
                    assert result.is_complete(), result.first_error
                    # checkpoint gate: ack the batch's LAST position only
                    # now that every item resolved
                    session.set_acked_position(batch[-1].position)
                    published_hwm.append(batch[-1].position)
                    batch.clear()

                for frame in session.poll():
                    batch.append(
                        PublishItem(
                            subject="cdc.testdb.public.orders",
                            event_id=frame.payload.decode(),
                            payload=frame.payload,
                            position=lsn_to_str(frame.wal_start),
                        )
                    )
                    if len(batch) == 4:
                        flush_batch()
                if batch:
                    flush_batch()
                assert session.ended
                wire.close()

            # broker saw every event, in order, with exactly one retry
            eids = [e for _, e in bsrv.received]
            assert [e for e in eids if eids.count(e) == 1 or e != "ev-5"]
            assert [e for e in dict.fromkeys(eids)] == [f"ev-{i}" for i in range(12)]
            assert bsrv.attempts("ev-5") == 2

        # the WAL server's acked positions never outran publishing:
        # every standby status carries a batch-boundary LSN
        statuses = [
            s.flush_lsn
            for rec in wsrv.connections
            for s in rec.standby_statuses
            if s.flush_lsn
        ]
        from better_cdc_spark.cdc.replication import lsn_to_int

        boundaries = {lsn_to_int(p) for p in published_hwm} | {0}
        assert set(statuses) <= boundaries
        assert wait_until(
            lambda: wsrv.confirmed_flush() == lsn_to_str(wal[-1][0])
        ) or wsrv.confirmed_flush() == lsn_to_str(wal[-1][0])


def test_malformed_frame_length_raises_not_desyncs():
    """A frame header whose length field is < 4 violates PostgreSQL
    framing (the length counts itself): the wire must raise
    ConnectionError immediately rather than slice part of the 5 header
    bytes back into the accumulator and silently desync every later
    frame (round-7 advice, socket_wire.py:143)."""
    import socket as socklib
    import struct
    import threading

    from better_cdc_spark.cdc import socket_wire as sw

    srv = socklib.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        sw.read_message(conn)  # the START_REPLICATION Query
        conn.sendall(sw._pack_msg(sw.MSG_COPY_BOTH_RESPONSE, b"\x00\x00\x00"))
        # kind 'd' with length=2 (< 4, impossible) then trailing garbage
        conn.sendall(b"d" + struct.pack(">I", 2) + b"\xde\xad\xbe\xef")
        time.sleep(0.5)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    wire = connect_wire(
        "127.0.0.1", port, start_replication_command("slot1", "0/0")
    )
    with pytest.raises(ConnectionError, match="malformed frame"):
        wire.recv(2.0)
    wire.close()
    srv.close()
    t.join(timeout=3)


def test_oversized_drop_ack_is_not_marked_persisted():
    """drop_ack swallows the broker's response, but max_payload gates
    persistence FIRST: an oversized message whose ack is dropped must
    not appear in received_payloads while its retry gets 'maxpayload'
    (round-7 advice, socket_broker.py:248)."""
    script = BrokerScript(max_payload=16, drop_ack={"e1"})
    quarantined = []
    with FakeBrokerServer(script) as srv:
        with SocketPublishTransport("127.0.0.1", srv.port) as tp:
            items = items_of(3)
            items[1].payload = b"x" * 64  # poison AND first ack dropped
            engine = fast_engine(
                max_publish_retries=3,
                publish_timeout_s=0.4,
                failure_policy="dlq",
                quarantine_cb=lambda item, err: quarantined.append(item.event_id),
            )
            result = engine.publish_with_retry(tp, items)
        assert result.is_resolved()
        assert quarantined == ["e1"]
        # broker state is consistent: the oversized payload was never stored
        assert b"x" * 64 not in srv.received_payloads
