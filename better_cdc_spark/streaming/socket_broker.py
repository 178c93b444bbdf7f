"""TCP broker transport for the ordered publish engine.

The round-5 publish engine (streaming/publish_retry.py) is fully
transport-agnostic and was tested against in-process fakes. This module
closes the network inch: a `SocketPublishTransport` that ships publish
requests over a real TCP socket and resolves PendingAcks from a reader
THREAD as ack/err replies arrive — the asynchronous-completion shape a
real broker client (e.g. JetStream PublishAsync,
/root/reference/internal/publisher/jetstream.go:99-125) has — plus a
scriptable `FakeBrokerServer` (fail-nth, slow-ack, dropped-ack,
max-payload) mirroring the reference's mockBatchPublisher scenarios
(/root/reference/internal/publisher/waitforacks_test.go:30-179) over
the wire instead of in-process.

Wire format (both directions): 4-byte big-endian length + JSON body.
  client→server  {"req", "subject", "event_id", "payload_hex"}
  server→client  {"req", "event_id", "ok": true}
               | {"req", "event_id", "err": "transient" | "maxpayload"
                                            | "api:<code>" | "badsubject"}
A reply may arrive out of order and at any later time; the transport
matches it to ITS OWN request via the echoed per-request token "req" —
a retry of a lost-response publish must not be satisfied by the
original's late reply (real async broker clients correlate the same
way). An error string is mapped back to the engine's typed taxonomy so
permanent-error classification (is_permanent_publish_error) behaves
identically to the in-process path.

Scale note: like the engine itself this runs driver-side inside
foreachBatch over the COLLECTED bounded envelope batch; executors never
touch sockets.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time
from collections import defaultdict
from collections.abc import Sequence
from dataclasses import dataclass, field

from better_cdc_spark.streaming.publish_retry import (
    ApiError,
    BadSubjectError,
    MaxPayloadError,
    PendingAck,
    PublishError,
    PublishItem,
)


def _send_msg(sock: socket.socket, obj: dict) -> None:
    body = json.dumps(obj).encode()
    sock.sendall(struct.pack(">I", len(body)) + body)


def _recv_msg(sock: socket.socket) -> dict | None:
    head = b""
    while len(head) < 4:
        chunk = sock.recv(4 - len(head))
        if not chunk:
            return None
        head += chunk
    n = struct.unpack(">I", head)[0]
    body = b""
    while len(body) < n:
        chunk = sock.recv(n - len(body))
        if not chunk:
            return None
        body += chunk
    return json.loads(body)


def _err_from_wire(err: str) -> BaseException:
    if err == "maxpayload":
        return MaxPayloadError("message exceeds broker max payload")
    if err == "badsubject":
        return BadSubjectError("malformed subject")
    if err.startswith("api:"):
        return ApiError(int(err[4:]))
    return PublishError(err)


class SocketPublishTransport:
    """publish_batch_async over a real TCP connection.

    Acks resolve from a background reader thread (resolved flag set
    externally, no resolve_at) — the exact completion shape
    wait_for_acks' poll cap exists for. One transport = one connection
    = one reader thread; close() joins it.
    """

    def __init__(self, host: str, port: int, connect_timeout_s: float = 5.0) -> None:
        self.sock = socket.create_connection((host, port), timeout=connect_timeout_s)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.sock.settimeout(None)
        self._lock = threading.Lock()
        self._outstanding: dict[int, PendingAck] = {}
        self._req_seq = 0
        self._closed = False
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()

    def publish_batch_async(self, items: Sequence[PublishItem]) -> list[PendingAck]:
        pending = []
        for item in items:
            p = PendingAck(subject=item.subject, event_id=item.event_id)
            with self._lock:
                self._req_seq += 1
                req = self._req_seq
                self._outstanding[req] = p
            _send_msg(
                self.sock,
                {
                    "req": req,
                    "subject": item.subject,
                    "event_id": item.event_id,
                    "payload_hex": item.payload.hex(),
                },
            )
            pending.append(p)
        return pending

    def forget(self, pending) -> None:
        """Drop registrations for acks the engine abandoned on timeout —
        the broker may never answer those request tokens, and each retry
        registers a new one (same unbounded-growth hazard as the NATS
        transport's reply-token registry)."""
        doomed = {id(p) for p in pending}
        with self._lock:
            for k in [
                k for k, v in self._outstanding.items() if id(v) in doomed
            ]:
                del self._outstanding[k]

    def _read_loop(self) -> None:
        try:
            while True:
                msg = _recv_msg(self.sock)
                if msg is None:
                    return
                with self._lock:
                    p = self._outstanding.pop(msg.get("req"), None)
                if p is None:
                    continue  # reply to an unknown/duplicate request token
                if msg.get("ok"):
                    p.acked = True
                else:
                    p.err = _err_from_wire(msg.get("err", "unknown"))
                p.resolved = True  # terminal-state flag LAST (visibility)
        except (OSError, ConnectionError, ValueError):
            return

    def close(self) -> None:
        self._closed = True
        try:
            self.sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self.sock.close()
        self._reader.join(timeout=5)

    def __enter__(self) -> "SocketPublishTransport":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


@dataclass
class BrokerScript:
    """Per-server behavior script.

    - max_payload: permanent 'maxpayload' error for larger payloads.
    - fail_first: {event_id: k} — reply 'transient' to the first k
      publishes of that event, then ack (the fail-nth retry scenario).
    - ack_delay_s: {event_id: seconds} — delay the reply (slow ack).
    - drop_ack: event_ids never replied to (stuck ack → client timeout;
      a RETRY of the same event IS replied to, matching a broker that
      lost the first response).
    """

    max_payload: int | None = None
    fail_first: dict[str, int] = field(default_factory=dict)
    ack_delay_s: dict[str, float] = field(default_factory=dict)
    drop_ack: set = field(default_factory=set)


class FakeBrokerServer:
    """Scriptable in-process broker over a real listening socket.

    Records every received publish (subject, event_id, attempt number)
    so ordering and retry-count assertions read straight off the wire
    log, like the reference's mock publisher records publishedMsgs.
    """

    def __init__(self, script: BrokerScript | None = None) -> None:
        self.script = script or BrokerScript()
        self.received: list[tuple[str, str]] = []  # (subject, event_id)
        #: payload bytes of every PERSISTED publish, in storage order —
        #: a drop_ack message is persisted with its ack lost, so its
        #: retry persists AGAIN: the at-least-once duplication consumers
        #: must dedup by msg id (qc11/qc29)
        self.received_payloads: list[bytes] = []
        self._attempts: dict[str, int] = defaultdict(int)
        self._dropped_once: set = set()
        self._lock = threading.Lock()
        self._server = socket.create_server(("127.0.0.1", 0))
        self.port = self._server.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def __enter__(self) -> "FakeBrokerServer":
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

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._server.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn: socket.socket) -> None:
        try:
            while True:
                msg = _recv_msg(conn)
                if msg is None:
                    return
                threading.Thread(
                    target=self._reply, args=(conn, msg), daemon=True
                ).start()
        except (OSError, ConnectionError):
            pass

    def _reply(self, conn: socket.socket, msg: dict) -> None:
        eid, subject, req = msg["event_id"], msg["subject"], msg.get("req")
        payload = bytes.fromhex(msg.get("payload_hex", ""))
        with self._lock:
            self._attempts[eid] += 1
            attempt = self._attempts[eid]
            self.received.append((subject, eid))
            s = self.script
            if eid in s.drop_ack and eid not in self._dropped_once:
                self._dropped_once.add(eid)
                # max_payload gates persistence even when the ack is lost:
                # a real broker rejects an oversized message BEFORE storing
                # it, so a drop_ack'ed oversized publish must not appear
                # persisted while its retry gets 'maxpayload'
                if s.max_payload is None or len(payload) <= s.max_payload:
                    self.received_payloads.append(payload)  # persisted, ack lost
                return  # lost response; the retry will be answered
        if s.max_payload is not None and len(payload) > s.max_payload:
            reply = {"req": req, "event_id": eid, "err": "maxpayload"}
        elif attempt <= s.fail_first.get(eid, 0):
            reply = {"req": req, "event_id": eid, "err": "transient"}
        else:
            reply = {"req": req, "event_id": eid, "ok": True}
            with self._lock:
                self.received_payloads.append(payload)
        delay = s.ack_delay_s.get(eid)
        if delay:
            time.sleep(delay)
        try:
            with self._lock:
                _send_msg(conn, reply)
        except (OSError, ConnectionError):
            pass

    def attempts(self, event_id: str) -> int:
        with self._lock:
            return self._attempts[event_id]
