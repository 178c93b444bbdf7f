"""Logical-replication wire framing (R1) — XLogData, keepalive, standby status.

Implements the COPY-substream message formats of the public PostgreSQL
streaming replication protocol (all integers big-endian; timestamps are
microseconds since 2000-01-01):

- XLogData           'w' + walStart(8) + walEnd(8) + serverTime(8) + payload
- PrimaryKeepalive   'k' + serverWalEnd(8) + serverTime(8) + replyRequested(1)
- StandbyStatusUpdate 'r' + write(8) + flush(8) + apply(8) + clientTime(8)
                       + replyRequested(1)

Reference parity (/root/reference/internal/wal/reader.go):
- frame dispatch: 'w' → payload out + standby status; 'k' → refresh the
  standby deadline, reply if requested; empty payload and unknown frame
  bytes are skipped with a count, never fatal (reader.go:339-393)
- idle-advance heartbeat: a receive timeout sends a FORCED standby
  status carrying the acked LSN, so confirmed_flush advances on an idle
  stream (handleStandbyTimeout; integration test
  tests/integration/cdc_idle_heartbeat_test.go:12-41)
- standby status carries the acked LSN in write/flush/apply and is
  suppressed while nothing has been acked unless a reply was requested
  (sendStandbyStatus, reader.go:594-606)
- acked-LSN tracking is monotone max (setAckedLSN, reader.go:627-637)
- an ErrorResponse frame is FATAL (reader.go:337-338)
- resume: START_REPLICATION names the slot's restart LSN; the session
  records it and the server replays from there (startWal2JSON /
  startPGOutput, reader.go:124-178)

Spark context: encode/decode are pure byte kernels — the registry query
qc19 runs them INSIDE executors over Arrow batches (frame building and
parsing are embarrassingly parallel); only the session/heartbeat logic
is driver-side, where the reference also runs it (single replication
socket per engine — the protocol itself is serial, the decode fan-out
is not).
"""

from __future__ import annotations

import struct
from collections.abc import Callable
from dataclasses import dataclass, field

PG_EPOCH_US = 946_684_800_000_000  # 2000-01-01 in unix µs

XLOG_DATA = b"w"
PRIMARY_KEEPALIVE = b"k"
STANDBY_STATUS = b"r"


def lsn_to_int(lsn: str) -> int:
    """'X/Y' hex notation → 64-bit int (pglogrepl.ParseLSN analog)."""
    hi, lo = lsn.split("/")
    return (int(hi, 16) << 32) | int(lo, 16)


def lsn_to_str(v: int) -> str:
    return f"{v >> 32:X}/{v & 0xFFFFFFFF:X}"


# -- frame codecs ------------------------------------------------------------


def encode_xlog_data(wal_start: int, wal_end: int, server_time_us: int, payload: bytes) -> bytes:
    return XLOG_DATA + struct.pack(">QQQ", wal_start, wal_end, server_time_us - PG_EPOCH_US) + payload


def encode_keepalive(server_wal_end: int, server_time_us: int, reply_requested: bool) -> bytes:
    return PRIMARY_KEEPALIVE + struct.pack(
        ">QQB", server_wal_end, server_time_us - PG_EPOCH_US, 1 if reply_requested else 0
    )


def encode_standby_status(
    write_lsn: int, flush_lsn: int, apply_lsn: int, client_time_us: int, reply_requested: bool
) -> bytes:
    return STANDBY_STATUS + struct.pack(
        ">QQQQB", write_lsn, flush_lsn, apply_lsn, client_time_us - PG_EPOCH_US,
        1 if reply_requested else 0,
    )


@dataclass(frozen=True)
class XLogData:
    wal_start: int
    wal_end: int
    server_time_us: int
    payload: bytes


@dataclass(frozen=True)
class Keepalive:
    server_wal_end: int
    server_time_us: int
    reply_requested: bool


@dataclass(frozen=True)
class StandbyStatus:
    write_lsn: int
    flush_lsn: int
    apply_lsn: int
    client_time_us: int
    reply_requested: bool


def decode_frame(buf: bytes):
    """One CopyData payload → typed frame, or None for empty/unknown.

    Mirrors the reader's tolerance: empty payloads and unknown frame
    bytes are skip-with-warn, not errors (reader.go:340-342, 386-388).
    """
    if not buf:
        return None
    kind = buf[:1]
    # a frame shorter than its fixed header is malformed — skip, never
    # raise (struct errors out of here would crash the session loop the
    # docstring promises is skip-tolerant)
    if kind == XLOG_DATA and len(buf) >= 25:
        ws, we, t = struct.unpack_from(">QQQ", buf, 1)
        return XLogData(ws, we, t + PG_EPOCH_US, buf[25:])
    if kind == PRIMARY_KEEPALIVE and len(buf) >= 18:
        we, t, rr = struct.unpack_from(">QQB", buf, 1)
        return Keepalive(we, t + PG_EPOCH_US, bool(rr))
    if kind == STANDBY_STATUS and len(buf) >= 34:
        w, f, a, t, rr = struct.unpack_from(">QQQQB", buf, 1)
        return StandbyStatus(w, f, a, t + PG_EPOCH_US, bool(rr))
    return None


# -- session (driver-side protocol loop) -------------------------------------


class ReplicationError(RuntimeError):
    """Fatal server ErrorResponse (fatalReplicationError analog)."""


class WireTimeout(Exception):
    """Raised by a wire's recv() when the standby deadline elapses."""


@dataclass
class _SessionStats:
    frames: int = 0
    keepalives: int = 0
    skipped: int = 0
    heartbeats: int = 0


class ReplicationSession:
    """Frame loop with ack tracking and standby heartbeats.

    `wire` is any object with ``recv(timeout_s) -> bytes`` (raising
    WireTimeout on deadline and ReplicationError for a server error
    response) and ``send(frame: bytes)``. Tests script it in-process;
    a deployment wraps a psycopg/pq COPY-both socket with the same two
    calls — the session logic never changes.
    """

    def __init__(
        self,
        wire,
        start_lsn: str = "0/0",
        standby_timeout_s: float = 10.0,
        clock_us: Callable[[], int] = lambda: PG_EPOCH_US,
    ) -> None:
        self.wire = wire
        self.start_lsn = start_lsn
        self.standby_timeout_s = standby_timeout_s
        self.clock_us = clock_us
        self._acked = lsn_to_int(start_lsn)
        self.stats = _SessionStats()
        #: True once recv() returned None — the server closed cleanly.
        #: poll() can ALSO end by exhausting max_frames; callers use this
        #: flag to tell the two apart (a budget end must resume, not stop)
        self.ended = False

    # acked-LSN tracking: monotone max (reader.go:627-637)
    def set_acked_position(self, lsn: str) -> None:
        v = lsn_to_int(lsn)
        if v > self._acked:
            self._acked = v

    @property
    def acked_lsn(self) -> str:
        return lsn_to_str(self._acked)

    def _send_standby_status(self, reply_requested: bool) -> None:
        # suppressed before anything is acked, unless the server asked
        if self._acked == 0 and not reply_requested:
            return
        self.wire.send(
            encode_standby_status(
                self._acked, self._acked, self._acked, self.clock_us(), reply_requested
            )
        )

    def poll(self, max_frames: int = 1_000_000):
        """Consume frames until the wire is exhausted; yields XLogData
        payload bytes in arrival order. Keepalives and timeouts are
        handled inline: a timeout emits the idle-advance heartbeat and
        the loop continues; an exhausted wire (recv returns None) ends
        the generator."""
        for _ in range(max_frames):
            try:
                buf = self.wire.recv(self.standby_timeout_s)
            except WireTimeout:
                # idle-advance: a FORCED status carrying the acked LSN,
                # so confirmed_flush moves even with zero traffic
                self.stats.heartbeats += 1
                if self._acked:
                    self._send_standby_status(False)
                else:
                    # nothing acked yet — heartbeat with a reply request
                    # so the server keeps the link alive
                    self.wire.send(
                        encode_standby_status(0, 0, 0, self.clock_us(), True)
                    )
                continue
            if buf is None:
                self.ended = True
                return
            frame = decode_frame(buf)
            if frame is None:
                self.stats.skipped += 1
                continue
            if isinstance(frame, XLogData):
                self.stats.frames += 1
                yield frame
                self._send_standby_status(False)
            elif isinstance(frame, Keepalive):
                self.stats.keepalives += 1
                self._send_standby_status(frame.reply_requested)


# -- startup commands & reconnect orchestration ------------------------------


def start_replication_command(
    slot: str,
    start_lsn: str = "0/0",
    plugin: str = "wal2json",
    publications: tuple[str, ...] = (),
) -> str:
    """The START_REPLICATION wire command for the supported plugins,
    with the reference's exact plugin arguments (startWal2JSON
    reader.go:295-309: pretty-print/include-xids/include-timestamp/
    format-version '2'; startPGOutput reader.go:594-607: proto_version
    '1' + publication_names). Unsupported plugins are a hard error
    (replicationHandlers, reader.go:222-230)."""
    if plugin in ("", "wal2json"):
        args = [
            "\"pretty-print\" 'false'",
            "\"include-xids\" 'true'",
            "\"include-timestamp\" 'true'",
            "\"format-version\" '2'",
        ]
    elif plugin == "pgoutput":
        args = ["proto_version '1'"]
        if publications:
            args.append(f"publication_names '{','.join(publications)}'")
    else:
        raise ValueError(f"unsupported plugin: {plugin}")
    return (
        f'START_REPLICATION SLOT "{slot}" LOGICAL {start_lsn} '
        f"({', '.join(args)})"
    )


BASE_RECONNECT_BACKOFF_S = 1.0
MAX_RECONNECT_BACKOFF_S = 30.0  # reader.go:24


class ReplicationLoop:
    """Reconnect orchestration (runReplicationLoop, reader.go:233-293):
    connect → start → poll; a transient failure resets the connection,
    sleeps with doubling backoff (1 s → 30 s cap), and RESUMES FROM THE
    LAST ACKED LSN — never the original start position, so a reconnect
    replays only unacked WAL. Backoff resets to the base after a
    successful start. Fatal errors (server ErrorResponse: dropped slot,
    wrong wal_level) stop the loop instead of retrying forever.

    `connect` returns a wire (or raises); `sleep` is injectable for
    deterministic tests. A `connect` accepting one positional parameter
    is called with the RESUME LSN string — a socket transport needs it
    to issue START_REPLICATION at the right position (the server
    replays from there, reader.go:124-178); a zero-arg `connect` keeps
    the original contract for wires that track position themselves.
    """

    def __init__(
        self,
        connect: Callable[[], object],
        start_lsn: str = "0/0",
        standby_timeout_s: float = 10.0,
        sleep: Callable[[float], None] = None,
        clock_us: Callable[[], int] = lambda: PG_EPOCH_US,
    ) -> None:
        import time as _t

        import inspect

        self.connect = connect
        try:
            self._connect_wants_lsn = (
                len(inspect.signature(connect).parameters) >= 1
            )
        except (TypeError, ValueError):
            self._connect_wants_lsn = False
        self.start_lsn = start_lsn
        self.standby_timeout_s = standby_timeout_s
        self.sleep = sleep if sleep is not None else _t.sleep
        self.clock_us = clock_us
        self.reconnects = 0
        self.fatal: BaseException | None = None

    def run(self, on_payload: Callable[[XLogData], str | None], max_attempts: int = 100):
        """Drive sessions until a wire ends cleanly (recv → None) or a
        fatal error. on_payload processes one XLogData and returns the
        LSN to ack (or None). Returns the final acked LSN."""
        resume = self.start_lsn
        backoff = BASE_RECONNECT_BACKOFF_S
        for _ in range(max_attempts):
            try:
                wire = (
                    self.connect(resume) if self._connect_wants_lsn
                    else self.connect()
                )
            except ReplicationError as exc:
                self.fatal = exc
                raise
            except Exception:
                self.reconnects += 1
                self.sleep(backoff)
                backoff = min(backoff * 2, MAX_RECONNECT_BACKOFF_S)
                continue
            session = ReplicationSession(
                wire,
                start_lsn=resume,
                standby_timeout_s=self.standby_timeout_s,
                clock_us=self.clock_us,
            )
            backoff = BASE_RECONNECT_BACKOFF_S  # successful start
            try:
                for frame in session.poll():
                    acked = on_payload(frame)
                    if acked is not None:
                        session.set_acked_position(acked)
                if session.ended:
                    return session.acked_lsn  # clean end of stream
                # poll() exhausted its frame budget mid-stream — NOT a
                # server close; resume a fresh session from the acked
                # LSN without sleeping (nothing failed)
                resume = session.acked_lsn
                continue
            except ReplicationError as exc:
                self.fatal = exc
                raise
            except Exception:
                # transient loop error: resume from the last ACKED lsn
                resume = session.acked_lsn
                self.reconnects += 1
                self.sleep(backoff)
                backoff = min(backoff * 2, MAX_RECONNECT_BACKOFF_S)
        raise RuntimeError("replication loop exhausted max_attempts")
