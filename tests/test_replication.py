"""Replication wire framing + session loop vs a scripted wire.

Mirrors /root/reference/internal/wal/reader.go:311-393 (frame dispatch),
:594-637 (standby status + monotone ack), and the idle-heartbeat
integration test (tests/integration/cdc_idle_heartbeat_test.go:12-41):
confirmed_flush must advance while the stream is idle. Pure byte/logic
tests — no Spark session.
"""

from __future__ import annotations

import pytest

from better_cdc_spark.cdc.replication import (
    Keepalive,
    ReplicationError,
    ReplicationSession,
    StandbyStatus,
    WireTimeout,
    XLogData,
    decode_frame,
    encode_keepalive,
    encode_standby_status,
    encode_xlog_data,
    lsn_to_int,
    lsn_to_str,
)

T0 = 1_700_000_000_000_000  # some unix µs


class ScriptedWire:
    """Script: list of frames (bytes), WireTimeout instances, or
    ReplicationError instances; recv pops in order, returns None when
    exhausted. send() captures everything the client transmits."""

    def __init__(self, script):
        self.script = list(script)
        self.sent: list[bytes] = []

    def recv(self, timeout_s):
        if not self.script:
            return None
        item = self.script.pop(0)
        if isinstance(item, (WireTimeout, ReplicationError)):
            raise item
        return item

    def send(self, frame: bytes) -> None:
        self.sent.append(frame)


def sent_statuses(wire) -> list[StandbyStatus]:
    return [decode_frame(b) for b in wire.sent]


# -- codecs -------------------------------------------------------------------


def test_lsn_roundtrip():
    for s in ("0/0", "0/100010", "16/B374D848", "FFFFFFFF/FFFFFFFF"):
        assert lsn_to_str(lsn_to_int(s)) == s


def test_xlog_data_roundtrip():
    f = decode_frame(encode_xlog_data(1000, 2000, T0, b'{"action":"I"}'))
    assert isinstance(f, XLogData)
    assert (f.wal_start, f.wal_end, f.server_time_us) == (1000, 2000, T0)
    assert f.payload == b'{"action":"I"}'


def test_keepalive_roundtrip():
    f = decode_frame(encode_keepalive(5000, T0, True))
    assert isinstance(f, Keepalive)
    assert f.server_wal_end == 5000 and f.reply_requested


def test_standby_status_roundtrip():
    f = decode_frame(encode_standby_status(7, 8, 9, T0, False))
    assert isinstance(f, StandbyStatus)
    assert (f.write_lsn, f.flush_lsn, f.apply_lsn) == (7, 8, 9)
    assert f.client_time_us == T0 and not f.reply_requested


def test_empty_and_unknown_frames_are_skipped():
    assert decode_frame(b"") is None
    assert decode_frame(b"z" + b"\x00" * 24) is None  # unknown id byte


# -- session dispatch ---------------------------------------------------------


def payload_frames(session) -> list[bytes]:
    return [x.payload for x in session.poll()]


def test_xlog_frames_yield_payloads_and_ack_after_processing():
    wire = ScriptedWire(
        [
            encode_xlog_data(lsn_to_int("0/10"), 0, T0, b"line-1"),
            encode_xlog_data(lsn_to_int("0/20"), 0, T0, b"line-2"),
        ]
    )
    s = ReplicationSession(wire, clock_us=lambda: T0)
    got = []
    for frame in s.poll():
        got.append(frame.payload)
        s.set_acked_position(lsn_to_str(frame.wal_start))
    assert got == [b"line-1", b"line-2"]
    # one standby status after each data frame, carrying the acked LSN
    st = sent_statuses(wire)
    assert len(st) == 2
    assert st[-1].flush_lsn == lsn_to_int("0/20")
    assert s.acked_lsn == "0/20"


def test_keepalive_reply_requested_forces_status_even_with_nothing_acked():
    wire = ScriptedWire([encode_keepalive(0, T0, True)])
    s = ReplicationSession(wire, clock_us=lambda: T0)
    assert payload_frames(s) == []
    st = sent_statuses(wire)
    assert len(st) == 1 and st[0].reply_requested
    assert s.stats.keepalives == 1


def test_keepalive_without_reply_request_is_silent_before_first_ack():
    # sendStandbyStatus suppresses a zero-LSN unforced status
    # (reader.go:595-598)
    wire = ScriptedWire([encode_keepalive(0, T0, False)])
    s = ReplicationSession(wire, clock_us=lambda: T0)
    assert payload_frames(s) == []
    assert wire.sent == []


def test_unknown_and_empty_frames_increment_skip_count_only():
    wire = ScriptedWire([b"", b"z12345678901234567890123456789"])
    s = ReplicationSession(wire, clock_us=lambda: T0)
    assert payload_frames(s) == []
    assert s.stats.skipped == 2
    assert wire.sent == []


def test_error_response_is_fatal():
    wire = ScriptedWire(
        [encode_xlog_data(16, 0, T0, b"ok"), ReplicationError("slot dropped")]
    )
    s = ReplicationSession(wire, clock_us=lambda: T0)
    it = s.poll()
    assert next(it).payload == b"ok"
    with pytest.raises(ReplicationError):
        next(it)


# -- idle-advance heartbeat ---------------------------------------------------


def test_idle_timeout_advances_confirmed_flush():
    # the integration-test contract: process one event, then an idle
    # stream; the forced heartbeat must carry the acked LSN so the
    # server's confirmed_flush advances past the initial position
    wire = ScriptedWire(
        [
            encode_xlog_data(lsn_to_int("0/100"), 0, T0, b"evt"),
            WireTimeout(),
            WireTimeout(),
        ]
    )
    s = ReplicationSession(wire, clock_us=lambda: T0)
    for frame in s.poll():
        s.set_acked_position(lsn_to_str(frame.wal_start))
    st = sent_statuses(wire)
    # 1 post-data status + 2 idle heartbeats, all at the acked LSN
    assert len(st) == 3 and s.stats.heartbeats == 2
    assert all(x.flush_lsn == lsn_to_int("0/100") for x in st)


def test_idle_timeout_before_any_ack_sends_keepalive_ping():
    wire = ScriptedWire([WireTimeout()])
    s = ReplicationSession(wire, clock_us=lambda: T0)
    assert payload_frames(s) == []
    st = sent_statuses(wire)
    assert len(st) == 1 and st[0].reply_requested and st[0].flush_lsn == 0


# -- resume-from-LSN + monotone ack ------------------------------------------


def test_resume_from_lsn_initializes_ack_floor():
    # START_REPLICATION at the checkpointed LSN: statuses never regress
    # below it, and stale acks (out-of-order batch completions) are
    # ignored by the monotone max (reader.go:627-637)
    wire = ScriptedWire(
        [
            encode_xlog_data(lsn_to_int("0/400"), 0, T0, b"new"),
            WireTimeout(),
        ]
    )
    s = ReplicationSession(wire, start_lsn="0/300", clock_us=lambda: T0)
    assert s.acked_lsn == "0/300"
    for frame in s.poll():
        s.set_acked_position(lsn_to_str(frame.wal_start))
        s.set_acked_position("0/250")  # stale ack must not regress
    assert s.acked_lsn == "0/400"
    assert sent_statuses(wire)[-1].flush_lsn == lsn_to_int("0/400")


def test_monotone_ack_keeps_max():
    wire = ScriptedWire([])
    s = ReplicationSession(wire)
    for lsn in ("0/10", "0/30", "0/20"):
        s.set_acked_position(lsn)
    assert s.acked_lsn == "0/30"


# -- startup commands ---------------------------------------------------------


def test_start_replication_command_wal2json_args():
    from better_cdc_spark.cdc.replication import start_replication_command

    cmd = start_replication_command("cdc_slot", "0/1A2B3C", "wal2json")
    assert cmd.startswith('START_REPLICATION SLOT "cdc_slot" LOGICAL 0/1A2B3C (')
    for arg in ('"pretty-print" \'false\'', '"include-xids" \'true\'',
                '"include-timestamp" \'true\'', '"format-version" \'2\''):
        assert arg in cmd


def test_start_replication_command_pgoutput_publications():
    from better_cdc_spark.cdc.replication import start_replication_command

    cmd = start_replication_command(
        "s", "0/0", "pgoutput", publications=("pub_a", "pub_b")
    )
    assert "proto_version '1'" in cmd
    assert "publication_names 'pub_a,pub_b'" in cmd
    with pytest.raises(ValueError, match="unsupported plugin"):
        start_replication_command("s", plugin="test_decoding")


# -- reconnect loop -----------------------------------------------------------


def test_reconnect_resumes_from_last_acked_lsn():
    from better_cdc_spark.cdc.replication import ReplicationLoop

    slept = []
    sessions = []

    class DroppyWire(ScriptedWire):
        pass

    def connect():
        k = len(sessions)
        if k == 0:
            w = DroppyWire(
                [
                    encode_xlog_data(lsn_to_int("0/100"), 0, T0, b"a"),
                    encode_xlog_data(lsn_to_int("0/200"), 0, T0, b"b"),
                    OSError("connection reset"),  # transient drop
                ]
            )
        else:
            w = DroppyWire([encode_xlog_data(lsn_to_int("0/300"), 0, T0, b"c")])
        sessions.append(w)
        return w

    # ScriptedWire.recv raises non-Replication errors too
    def recv(self, timeout_s):
        if not self.script:
            return None
        item = self.script.pop(0)
        if isinstance(item, BaseException):
            raise item
        return item

    DroppyWire.recv = recv

    got = []
    loop = ReplicationLoop(connect, start_lsn="0/50", sleep=slept.append)
    final = loop.run(lambda f: (got.append(f.payload), lsn_to_str(f.wal_start))[1])
    assert got == [b"a", b"b", b"c"]
    assert loop.reconnects == 1 and slept == [1.0]
    # the second session started from the acked 0/200, not 0/50
    assert final == "0/300"


def test_reconnect_backoff_doubles_to_cap_and_resets():
    from better_cdc_spark.cdc.replication import ReplicationLoop

    slept = []
    attempts = {"n": 0}

    def connect():
        attempts["n"] += 1
        if attempts["n"] <= 7:
            raise OSError("refused")
        return ScriptedWire([encode_xlog_data(16, 0, T0, b"ok")])

    loop = ReplicationLoop(connect, sleep=slept.append)
    loop.run(lambda f: None)
    assert slept == [1.0, 2.0, 4.0, 8.0, 16.0, 30.0, 30.0]
    assert loop.reconnects == 7


def test_fatal_error_stops_reconnect_loop():
    from better_cdc_spark.cdc.replication import ReplicationLoop

    def connect():
        return ScriptedWire([ReplicationError("slot does not exist")])

    loop = ReplicationLoop(connect, sleep=lambda s: None)
    with pytest.raises(ReplicationError):
        loop.run(lambda f: None)
    assert loop.fatal is not None
    assert loop.reconnects == 0


# -- property round-trips -----------------------------------------------------


from hypothesis import given, settings, strategies as st  # noqa: E402

lsn_ints = st.integers(min_value=0, max_value=(1 << 64) - 1)
times_us = st.integers(min_value=946_684_800_000_000, max_value=4_102_444_800_000_000)


@settings(max_examples=200, deadline=None)
@given(ws=lsn_ints, we=lsn_ints, t=times_us, payload=st.binary(max_size=256))
def test_xlog_frame_roundtrip_property(ws, we, t, payload):
    f = decode_frame(encode_xlog_data(ws, we, t, payload))
    assert (f.wal_start, f.wal_end, f.server_time_us, f.payload) == (ws, we, t, payload)


@settings(max_examples=100, deadline=None)
@given(v=lsn_ints)
def test_lsn_roundtrip_property(v):
    assert lsn_to_int(lsn_to_str(v)) == v


@settings(max_examples=100, deadline=None)
@given(w=lsn_ints, f=lsn_ints, a=lsn_ints, t=times_us, rr=st.booleans())
def test_standby_status_roundtrip_property(w, f, a, t, rr):
    s = decode_frame(encode_standby_status(w, f, a, t, rr))
    assert (s.write_lsn, s.flush_lsn, s.apply_lsn, s.client_time_us,
            s.reply_requested) == (w, f, a, t, rr)


def test_truncated_frames_are_skipped_not_fatal():
    # shorter than the fixed header for each kind: skip-with-count
    wire = ScriptedWire([b"w\x00\x01", b"k\x00", b"r" + b"\x00" * 10,
                         encode_xlog_data(16, 0, T0, b"ok")])
    s = ReplicationSession(wire, clock_us=lambda: T0)
    assert payload_frames(s) == [b"ok"]
    assert s.stats.skipped == 3


def test_frame_budget_exhaustion_resumes_instead_of_stopping():
    # a session ending because poll() exhausted max_frames is NOT a
    # server close (session.ended stays False); the caller must roll a
    # fresh session from the acked LSN so consumption never silently
    # stops mid-stream
    got = []
    resume = "0/0"
    scripts = [
        [encode_xlog_data(0x100 + i, 0, T0, b"x") for i in range(3)],  # budget-cut
        [encode_xlog_data(0x200 + i, 0, T0, b"y") for i in range(2)],  # clean end
    ]
    for script in scripts:
        s = ReplicationSession(ScriptedWire(script), start_lsn=resume,
                               clock_us=lambda: T0)
        for frame in s.poll(max_frames=3):
            got.append(frame.wal_start)
            s.set_acked_position(lsn_to_str(frame.wal_start))
        resume = s.acked_lsn
    assert len(got) == 5  # nothing lost across the roll
    assert resume == lsn_to_str(0x201)
