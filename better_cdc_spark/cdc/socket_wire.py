"""TCP transport for the replication session — the "last I/O inch".

rounds 1-5 delivered the full replication protocol logic (XLogData /
keepalive / standby framing, idle-advance heartbeat, resume-from-LSN,
reconnect backoff) over INJECTED in-process wires; no code opened a
socket. This module closes that inch with the real byte layer the
PostgreSQL protocol uses around the replication substream, over an
actual TCP socket:

- Outer framing is the PG wire format: 1-byte message type + int32
  length (length includes itself, excludes the type byte).
- ``Q`` Query carries the START_REPLICATION command (NUL-terminated).
- ``W`` CopyBothResponse switches the link into copy-both mode.
- ``d`` CopyData carries one replication frame each way (XLogData /
  keepalive server→client, standby status client→server).
- ``c`` CopyDone is the clean end of stream.
- ``E`` ErrorResponse is fatal (dropped slot, wrong wal_level) —
  mapped to ReplicationError exactly like fatalReplicationError
  (/root/reference/internal/wal/reader.go:337-338).

`SocketWire` adapts a connected socket to the two-call wire contract
(`recv(timeout_s)` / `send(frame)`) that ReplicationSession and
ReplicationLoop already speak — the session logic is byte-for-byte the
one the in-process tests pinned; only the I/O is new. `FakeWalServer`
is a scriptable in-process server (threaded, real listening socket)
speaking the same format: scripted mid-stream disconnects, error
responses, keepalive interleave, and per-connection records of the
requested start LSN and received standby statuses — mirroring what the
reference integration tests script against a real Postgres
(/root/reference/internal/wal/reader.go:233-293 reconnect loop;
tests/integration/cdc_idle_heartbeat_test.go).

Spark context: one replication socket per engine is driver-side serial
BY PROTOCOL (same as the reference); the decode fan-out stays in
executors (qc19/qc21). Nothing here touches the 100 TB data path.
"""

from __future__ import annotations

import socket
import struct
import threading
import time
from dataclasses import dataclass, field

from better_cdc_spark.cdc.replication import (
    PG_EPOCH_US,
    ReplicationError,
    WireTimeout,
    decode_frame,
    encode_keepalive,
    encode_xlog_data,
    lsn_to_int,
    lsn_to_str,
)

# PG wire message type bytes (public protocol, protocol.sgml)
MSG_QUERY = b"Q"
MSG_COPY_BOTH_RESPONSE = b"W"
MSG_COPY_DATA = b"d"
MSG_COPY_DONE = b"c"
MSG_ERROR_RESPONSE = b"E"


def _pack_msg(kind: bytes, body: bytes) -> bytes:
    return kind + struct.pack(">I", len(body) + 4) + body


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    """Read exactly n bytes; None on clean EOF at a message boundary;
    ConnectionError on EOF mid-message (the dropped-link case)."""
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            if not buf:
                return None
            raise ConnectionError("connection closed mid-message")
        buf += chunk
    return buf


def read_message(sock: socket.socket) -> tuple[bytes, bytes] | None:
    """One (type, body) wire message; None on clean close."""
    head = _recv_exact(sock, 5)
    if head is None:
        return None
    kind, length = head[:1], struct.unpack(">I", head[1:])[0]
    body = _recv_exact(sock, length - 4) if length > 4 else b""
    if body is None and length > 4:
        raise ConnectionError("connection closed mid-message")
    return kind, body or b""


def _error_response(message: str) -> bytes:
    # minimal ErrorResponse: severity + message fields, NUL-terminated
    body = b"SFATAL\x00M" + message.encode() + b"\x00\x00"
    return _pack_msg(MSG_ERROR_RESPONSE, body)


def _parse_error_response(body: bytes) -> str:
    msg = "server error"
    for fld in body.split(b"\x00"):
        if fld[:1] == b"M":
            msg = fld[1:].decode(errors="replace")
    return msg


class SocketWire:
    """Adapt a connected replication socket to the session wire calls.

    Construction performs the startup exchange: send the
    START_REPLICATION command as a Query message, require the
    CopyBothResponse (an ErrorResponse here — e.g. unknown slot — is
    fatal immediately, matching START_REPLICATION failing on the
    reference's connect path, reader.go:124-178).
    """

    def __init__(self, sock: socket.socket, start_command: str) -> None:
        self.sock = sock
        #: partial-message accumulator — persists across recv() calls so a
        #: standby timeout that strikes after part of a frame was consumed
        #: (a large XLogData spanning TCP segments) resumes mid-message
        #: instead of desyncing the stream on the next read
        self._buf = b""
        self.sock.sendall(_pack_msg(MSG_QUERY, start_command.encode() + b"\x00"))
        msg = read_message(self.sock)
        if msg is None:
            raise ConnectionError("server closed during startup")
        kind, body = msg
        if kind == MSG_ERROR_RESPONSE:
            raise ReplicationError(_parse_error_response(body))
        if kind != MSG_COPY_BOTH_RESPONSE:
            raise ConnectionError(f"unexpected startup message {kind!r}")

    def _read_message_buffered(self) -> tuple[bytes, bytes] | None:
        """read_message over the persistent accumulator: the socket
        timeout bounds each recv() slice, not the whole message, and
        bytes already buffered survive a WireTimeout."""
        while True:
            if len(self._buf) >= 5:
                kind = self._buf[:1]
                length = struct.unpack(">I", self._buf[1:5])[0]
                if length < 4:
                    # PostgreSQL framing invariant: the length field counts
                    # itself, so < 4 is malformed. Slicing with it would
                    # leave part of the 5 header bytes in the accumulator
                    # and silently desync every later frame — fail loudly.
                    raise ConnectionError(
                        f"malformed frame: length {length} < 4 (kind {kind!r})"
                    )
                total = 1 + length  # type byte + length (incl. itself)
                if len(self._buf) >= total:
                    body = self._buf[5:total]
                    self._buf = self._buf[total:]
                    return kind, body
            chunk = self.sock.recv(65536)
            if not chunk:
                if self._buf:
                    raise ConnectionError("connection closed mid-message")
                return None
            self._buf += chunk

    def recv(self, timeout_s: float) -> bytes | None:
        self.sock.settimeout(timeout_s)
        try:
            msg = self._read_message_buffered()
        except socket.timeout as exc:  # standby deadline → heartbeat
            # buffered partial bytes stay in self._buf for the next call
            raise WireTimeout() from exc
        if msg is None:
            return None
        kind, body = msg
        if kind == MSG_COPY_DATA:
            return body
        if kind == MSG_COPY_DONE:
            return None  # clean end of stream
        if kind == MSG_ERROR_RESPONSE:
            raise ReplicationError(_parse_error_response(body))
        return b""  # unknown outer message: skip-with-count downstream

    def send(self, frame: bytes) -> None:
        self.sock.sendall(_pack_msg(MSG_COPY_DATA, frame))

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def connect_wire(
    host: str, port: int, start_command: str, connect_timeout_s: float = 5.0
) -> SocketWire:
    sock = socket.create_connection((host, port), timeout=connect_timeout_s)
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return SocketWire(sock, start_command)


# -- scriptable in-process server --------------------------------------------


@dataclass
class ConnectionRecord:
    start_command: str = ""
    start_lsn: int = 0
    standby_statuses: list = field(default_factory=list)
    frames_sent: int = 0


class FakeWalServer:
    """Real listening TCP server speaking the replication wire format.

    Scripts (all optional):
    - ``wal``: list of (lsn_int, payload bytes) — the stream content. A
      connection starting at LSN X receives entries with lsn > X
      (resume replays only unacked WAL; the session acks each frame's
      own wal_start, so strict-greater is the no-duplicate contract).
    - ``keepalive_every``: interleave a PrimaryKeepalive after every N
      XLogData frames (reply_requested on every second one).
    - ``disconnect_after``: {connection_index: frame_count} — hard-drop
      the link mid-stream after sending that many XLogData frames (the
      reconnect-loop case).
    - ``error_on_connection``: {connection_index: message} — respond to
      START_REPLICATION with a fatal ErrorResponse instead of copy-both.

    Per-connection records (start command/LSN, standby statuses) let
    tests assert resume positions and confirmed-flush advancement.
    """

    def __init__(
        self,
        wal: list[tuple[int, bytes]],
        keepalive_every: int = 0,
        disconnect_after: dict[int, int] | None = None,
        error_on_connection: dict[int, str] | None = None,
        idle_hold_s: float = 0.0,
    ) -> None:
        self.wal = sorted(wal)
        self.keepalive_every = keepalive_every
        self.disconnect_after = disconnect_after or {}
        self.error_on_connection = error_on_connection or {}
        #: hold the stream open (no frames, no CopyDone) this long after
        #: the WAL drains — forces the client's standby timeout so the
        #: idle-advance heartbeat is exercised over the socket
        self.idle_hold_s = idle_hold_s
        self.connections: list[ConnectionRecord] = []
        self._server = socket.create_server(("127.0.0.1", 0))
        self.port = self._server.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def __enter__(self) -> "FakeWalServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def stop(self) -> None:
        self._stop.set()
        try:
            self._server.close()
        except OSError:
            pass
        self._thread.join(timeout=5)

    # -- server side ------------------------------------------------------

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._server.accept()
            except OSError:
                return
            idx = len(self.connections)
            rec = ConnectionRecord()
            self.connections.append(rec)
            t = threading.Thread(
                target=self._handle, args=(conn, idx, rec), daemon=True
            )
            t.start()

    def _handle(self, conn: socket.socket, idx: int, rec: ConnectionRecord) -> None:
        try:
            msg = read_message(conn)
            if msg is None or msg[0] != MSG_QUERY:
                return
            rec.start_command = msg[1].rstrip(b"\x00").decode()
            # parse "... LOGICAL <lsn> (..." out of the command
            toks = rec.start_command.split()
            rec.start_lsn = lsn_to_int(toks[toks.index("LOGICAL") + 1])

            if idx in self.error_on_connection:
                conn.sendall(_error_response(self.error_on_connection[idx]))
                return
            conn.sendall(_pack_msg(MSG_COPY_BOTH_RESPONSE, b"\x00\x00\x00"))

            drop_at = self.disconnect_after.get(idx)
            sent = 0
            for lsn, payload in self.wal:
                if lsn <= rec.start_lsn:
                    continue
                conn.sendall(
                    _pack_msg(
                        MSG_COPY_DATA,
                        encode_xlog_data(lsn, lsn, PG_EPOCH_US, payload),
                    )
                )
                sent += 1
                rec.frames_sent = sent
                if self.keepalive_every and sent % self.keepalive_every == 0:
                    conn.sendall(
                        _pack_msg(
                            MSG_COPY_DATA,
                            encode_keepalive(lsn, PG_EPOCH_US, sent % 2 == 0),
                        )
                    )
                if drop_at is not None and sent >= drop_at:
                    # hard drop: RST-ish close mid-stream, no CopyDone
                    conn.setsockopt(
                        socket.SOL_SOCKET, socket.SO_LINGER,
                        struct.pack("ii", 1, 0),
                    )
                    conn.close()
                    return
                self._drain_client(conn, rec)
            if self.idle_hold_s:
                end = time.monotonic() + self.idle_hold_s
                while time.monotonic() < end:
                    time.sleep(0.02)
                    self._drain_client(conn, rec)
            conn.sendall(_pack_msg(MSG_COPY_DONE, b""))
            # keep reading standby statuses until the client closes
            conn.settimeout(2.0)
            try:
                while True:
                    msg = read_message(conn)
                    if msg is None:
                        break
                    self._record_status(msg, rec)
            except (OSError, ConnectionError):
                pass
        except (OSError, ConnectionError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _drain_client(self, conn: socket.socket, rec: ConnectionRecord) -> None:
        # peek-then-read: only start a message when bytes are already
        # queued, then read it blocking (a 34-byte status on loopback
        # arrives whole) — never desyncs the stream on a partial read
        import select

        try:
            while select.select([conn], [], [], 0.0)[0]:
                conn.settimeout(1.0)
                msg = read_message(conn)
                if msg is None:
                    return
                self._record_status(msg, rec)
        except (OSError, ConnectionError):
            pass
        finally:
            conn.settimeout(None)

    def _record_status(self, msg: tuple[bytes, bytes], rec: ConnectionRecord) -> None:
        kind, body = msg
        if kind == MSG_COPY_DATA:
            frame = decode_frame(body)
            if frame is not None and hasattr(frame, "flush_lsn"):
                rec.standby_statuses.append(frame)

    # -- test conveniences -------------------------------------------------

    def confirmed_flush(self) -> str:
        """Max flush LSN acked across all connections (what the slot's
        confirmed_flush_lsn would be)."""
        mx = 0
        for rec in self.connections:
            for s in rec.standby_statuses:
                mx = max(mx, s.flush_lsn)
        return lsn_to_str(mx)
