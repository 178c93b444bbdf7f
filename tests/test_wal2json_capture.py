"""Live-capture integration: a REAL wal2json format-version-2 capture
file (byte-shaped exactly like the PostgreSQL plugin's output — one
JSON object per message, LSN carried by the FRAME, not the JSON) driven
end-to-end through the production path:

    capture.jsonl → XLogData frames over a real TCP replication socket
    (scripted mid-stream disconnect ⇒ resume-from-acked-LSN) →
    ReplicationLoop → parse_wal2json_frames (cdc/wal2json.py) →
    normalize_changelog (allowlist / tx assembly / event-id / subject) →
    proto-encoded ordered ack-gated publish over a real TCP broker
    socket (scripted transient failure ⇒ in-order retry) → consumer
    decode + msg-id dedup.

What a LIVE deployment swaps in (and ONLY this — the rest of the path
is byte-identical; the full mapping lives in cdc/wal2json.py's module
docstring):
  - FakeWalServer → PostgreSQL with a wal2json slot
    (``pg_create_logical_replication_slot(name, 'wal2json')``,
    format-version 2); connect_wire ↔ pgconn StartReplication.
  - FakeBrokerServer/SocketPublishTransport → a real NATS JetStream
    client publishing with Nats-Msg-Id = event_id.

Reference analogs: tests/integration/helpers_test.go:44-182 (live
Postgres+NATS rig), internal/parser/wal2json.go:112-168 (decode
dispatch this capture exercises action by action).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from better_cdc_spark.cdc.normalize import normalize_changelog
from better_cdc_spark.cdc.replication import (
    ReplicationLoop,
    lsn_to_str,
    start_replication_command,
)
from better_cdc_spark.cdc.socket_wire import FakeWalServer, connect_wire
from better_cdc_spark.cdc.wal2json import parse_wal2json_frames
from better_cdc_spark.codecs import decode_protobuf, encode_protobuf
from better_cdc_spark.streaming.publish_retry import (
    OrderedPublishEngine,
    PublishItem,
)
from better_cdc_spark.streaming.socket_broker import (
    BrokerScript,
    FakeBrokerServer,
    SocketPublishTransport,
)

# The capture: two transactions against public.orders, one row against
# a NON-allowlisted table, one truncate, one unknown action. Timestamp
# styles vary on purpose (wal2json emits "+00" or "+00:00" depending on
# the server's offset); values are raw JSON atoms (numbers unquoted,
# a boolean, a null) exactly as the plugin writes them.
CAPTURE = [
    {"action": "B", "xid": 801, "timestamp": "2024-05-01 10:00:00.000100+00"},
    {
        "action": "I", "xid": 801,
        "timestamp": "2024-05-01 10:00:00.000200+00",
        "schema": "public", "table": "orders",
        "columns": [
            {"name": "o_orderkey", "type": "integer", "value": 11},
            {"name": "total_cents", "type": "bigint", "value": 12345},
            {"name": "rush", "type": "boolean", "value": True},
        ],
    },
    {
        "action": "U", "xid": 801,
        "timestamp": "2024-05-01 10:00:00.000300+00",
        "schema": "public", "table": "orders",
        "columns": [
            {"name": "o_orderkey", "type": "integer", "value": 11},
            {"name": "total_cents", "type": "bigint", "value": 20000},
            {"name": "note", "type": "text", "value": None},
        ],
        "identity": [{"name": "o_orderkey", "type": "integer", "value": 11}],
    },
    {"action": "C", "xid": 801, "timestamp": "2024-05-01 10:00:00.000900+00"},
    {"action": "B", "xid": 802, "timestamp": "2024-05-01 10:00:01+02:00"},
    {
        "action": "D", "xid": 802,
        "timestamp": "2024-05-01 10:00:01.100000+02:00",
        "schema": "public", "table": "orders",
        "identity": [{"name": "o_orderkey", "type": "integer", "value": 7}],
    },
    {  # not in the allowlist — must be filtered like wal2json.go:172-179
        "action": "I", "xid": 802,
        "timestamp": "2024-05-01 10:00:01.200000+02:00",
        "schema": "public", "table": "audit_log",
        "columns": [{"name": "id", "type": "integer", "value": 1}],
    },
    {
        "action": "T", "xid": 802,
        "timestamp": "2024-05-01 10:00:01.300000+02:00",
        "schema": "public", "table": "orders",
    },
    {"action": "C", "xid": 802, "timestamp": "2024-05-01 10:00:02+02:00"},
    # unknown action: dropped silently (wal2json.go:164-166)
    {"action": "M", "xid": 803, "timestamp": "2024-05-01 10:00:03+00"},
]


def test_wal2json_capture_file_end_to_end(spark, tmp_path):
    # -- the capture file (what pg_recvlogical -f would have written) ---
    capture_path = tmp_path / "capture.jsonl"
    capture_path.write_text(
        "\n".join(json.dumps(m, separators=(",", ":")) for m in CAPTURE) + "\n"
    )

    # -- leg 1: replay it over the replication socket, with a scripted
    # disconnect after 4 frames forcing a resume from the acked LSN ----
    lines = capture_path.read_text().splitlines()
    wal = [(5000 + i, line.encode()) for i, line in enumerate(lines)]
    frames: list[tuple[int, str, str]] = []

    def on_payload(frame):
        frames.append(
            (len(frames), lsn_to_str(frame.wal_start), frame.payload.decode())
        )
        return lsn_to_str(frame.wal_start)

    with FakeWalServer(wal, disconnect_after={0: 4}) as srv:
        loop = ReplicationLoop(
            connect=lambda resume: connect_wire(
                "127.0.0.1", srv.port,
                start_replication_command("capture_slot", resume),
            ),
            sleep=lambda s: None,
            standby_timeout_s=5.0,
        )
        loop.run(on_payload)
        assert loop.reconnects >= 1, "disconnect script did not fire"
    assert len(frames) == len(CAPTURE)  # resume duplicated nothing

    # -- leg 2: wire JSON → ingest rows → normalized envelopes ----------
    changelog = parse_wal2json_frames(spark, frames)
    ev = normalize_changelog(
        changelog, database="testdb", allowlist=["public.orders"]
    ).orderBy("txid", "lsn").collect()

    assert [(r["txid"], r["operation"]) for r in ev] == [
        (801, "INSERT"), (801, "UPDATE"), (802, "DELETE"), (802, "DDL")
    ]  # audit_log filtered, unknown action dropped, B/C consumed

    ins, upd, dele, ddl = ev
    # raw JSON atoms survive as their text (numbers, booleans; null stays null)
    assert ins["after"]["total_cents"] == "12345"
    assert ins["after"]["rush"] == "true"
    assert upd["after"]["note"] is None
    assert upd["before"] == {"o_orderkey": "11"}
    assert dele["before"] == {"o_orderkey": "7"}
    # event ids: commit LSN (tx-end position) + in-tx ordinal
    c801 = lsn_to_str(5003)
    assert ins["event_id"] == f"{c801}:801:INSERT:public.orders:0"
    assert upd["event_id"] == f"{c801}:801:UPDATE:public.orders:1"
    assert ddl["event_id"].endswith(":802:DDL:public.orders:1")
    # commit metadata stamped from the C row (the +02:00 form parsed too)
    assert str(dele["commit_time"]) == "2024-05-01 08:00:02"  # UTC
    assert all(r["subject"] == "cdc.testdb.public.orders" for r in ev)

    # -- leg 3: ordered ack-gated publish over the broker socket --------
    writer = [(1, "event_id", "string"), (2, "operation", "string"),
              (3, "txid", "uint64")]
    items = [
        PublishItem(subject=r["subject"], event_id=r["event_id"],
                    payload=encode_protobuf(
                        {"event_id": r["event_id"],
                         "operation": r["operation"],
                         "txid": int(r["txid"])}, writer),
                    position=r["lsn"])
        for r in ev
    ]
    script = BrokerScript(fail_first={items[1].event_id: 1})
    engine = OrderedPublishEngine(
        max_publish_retries=3, publish_timeout_s=2.0,
        sleep=lambda s: time.sleep(min(s, 0.002)),
    )
    with FakeBrokerServer(script) as srv:
        with SocketPublishTransport("127.0.0.1", srv.port) as tp:
            result = engine.publish_with_retry(tp, items)
        received = list(srv.received_payloads)
    assert result.is_complete() and engine.retry_count == 1

    # -- consumer: decode + msg-id identity ------------------------------
    got = [decode_protobuf(bytes(p), writer) for p in received]
    assert [g["event_id"] for g in got] == [i.event_id for i in items]
    assert [g["operation"] for g in got] == ["INSERT", "UPDATE", "DELETE", "DDL"]


def test_wal2json_parse_drops_unknown_and_keeps_frame_lsn(spark):
    frames = [
        (0, lsn_to_str(42), json.dumps({"action": "B", "xid": 9,
                                        "timestamp": "2024-01-01 00:00:00+00"})),
        (1, lsn_to_str(43), json.dumps({"action": "Z", "xid": 9})),
        (2, lsn_to_str(44), json.dumps({
            "action": "I", "xid": 9, "schema": "s", "table": "t",
            "timestamp": "2024-01-01T00:00:00.500000+00:00",
            "columns": [{"name": "k", "type": "integer", "value": 5}]})),
    ]
    rows = parse_wal2json_frames(spark, frames).orderBy("ingest_seq").collect()
    assert [r["action"] for r in rows] == ["B", "I"]
    assert rows[1]["lsn"] == lsn_to_str(44)  # LSN comes from the FRAME
    assert rows[1]["columns"][0]["value"] == "5"
    assert str(rows[1]["timestamp"]).startswith("2024-01-01 00:00:00.5")


def test_wal2json_malformed_payload_is_fatal(spark):
    """An undecodable payload must FAIL the parse, not silently drop —
    the reference's decode loop sets a fatal error and stops
    (wal2json.go:70-74); losing a malformed message would silently
    corrupt the stream's transaction structure."""
    import pytest as _pytest

    frames = [
        (0, lsn_to_str(1), json.dumps({"action": "B", "xid": 1})),
        (1, lsn_to_str(2), '{"action": "I", "xid": '),  # truncated JSON
    ]
    with _pytest.raises(Exception, match="(?i)malformed|failfast|corrupt"):
        parse_wal2json_frames(spark, frames).collect()


def test_wal2json_z_suffixed_utc_timestamps_parse(spark):
    """RFC3339 'Z'-suffixed UTC timestamps are valid wal2json output the
    reference parser accepts; the parse ladder must handle them rather
    than yielding NULL (round-8 advice: 'X'-class patterns match Z,
    'x'-class do not)."""
    frames = [
        (0, lsn_to_str(10), json.dumps({
            "action": "I", "xid": 7, "schema": "s", "table": "t",
            "timestamp": "2024-03-01T12:30:45.250000Z",
            "columns": [{"name": "k", "type": "integer", "value": 1}]})),
        (1, lsn_to_str(11), json.dumps({
            "action": "I", "xid": 7, "schema": "s", "table": "t",
            "timestamp": "2024-03-01 12:30:46Z",
            "columns": [{"name": "k", "type": "integer", "value": 2}]})),
    ]
    rows = parse_wal2json_frames(spark, frames).orderBy("ingest_seq").collect()
    assert str(rows[0]["timestamp"]).startswith("2024-03-01 12:30:45.25")
    assert str(rows[1]["timestamp"]).startswith("2024-03-01 12:30:46")


def test_wal2json_unparseable_timestamp_is_fatal(spark):
    """A present-but-unparseable timestamp must raise, not silently
    become NULL — the module is FAILFAST on undecodable payloads and a
    NULL commit timestamp would corrupt ordering downstream."""
    import pytest as _pytest

    frames = [
        (0, lsn_to_str(12), json.dumps({
            "action": "I", "xid": 8, "schema": "s", "table": "t",
            "timestamp": "01/02/2024 09:00:00",  # not a wal2json format
            "columns": [{"name": "k", "type": "integer", "value": 3}]})),
    ]
    with _pytest.raises(Exception, match="unparseable wal2json timestamp"):
        parse_wal2json_frames(spark, frames).collect()


def test_wal2json_null_timestamp_stays_null(spark):
    """Actions without a timestamp field (NULL) stay NULL — only a
    PRESENT unparseable value is fatal."""
    frames = [
        (0, lsn_to_str(13), json.dumps({
            "action": "I", "xid": 9, "schema": "s", "table": "t",
            "columns": [{"name": "k", "type": "integer", "value": 4}]})),
    ]
    rows = parse_wal2json_frames(spark, frames).collect()
    assert rows[0]["timestamp"] is None


def test_wal2json_second_capture_type_domain(spark):
    """Second, COMMITTED capture (tests/data/wal2json_capture2.jsonl)
    widening the decoded value domain per wal2json.go:182-221: array
    literals (quoted elements, embedded commas, empty array), interval
    text in both day-qualified and clock forms, bytea hex, a
    timestamptz VALUE string, unchanged-TOAST column omission on
    UPDATE (wal2json omits the column entirely — the image must not
    invent a key), and commit/action timestamps across the remaining
    format-ladder rungs ('T'-separated RFC3339 'Z' forms and
    minute-offset '-05:30' forms). Same production path as capture 1:
    socket replay with a scripted disconnect → parse → normalize."""
    import os

    capture_path = os.path.join(
        os.path.dirname(__file__), "data", "wal2json_capture2.jsonl"
    )
    lines = open(capture_path, newline="").read().splitlines()
    wal = [(7000 + i, line.encode()) for i, line in enumerate(lines)]
    frames: list[tuple[int, str, str]] = []

    def on_payload(frame):
        frames.append(
            (len(frames), lsn_to_str(frame.wal_start), frame.payload.decode())
        )
        return lsn_to_str(frame.wal_start)

    with FakeWalServer(wal, disconnect_after={0: 3}) as srv:
        loop = ReplicationLoop(
            connect=lambda resume: connect_wire(
                "127.0.0.1", srv.port,
                start_replication_command("capture_slot2", resume),
            ),
            sleep=lambda s: None,
            standby_timeout_s=5.0,
        )
        loop.run(on_payload)
        assert loop.reconnects >= 1
    assert len(frames) == len(lines)  # resume duplicated nothing

    changelog = parse_wal2json_frames(spark, frames)
    ev = normalize_changelog(
        changelog, database="testdb", allowlist=["public.orders"]
    ).orderBy("txid", "lsn").collect()

    assert [(r["txid"], r["operation"]) for r in ev] == [
        (901, "INSERT"), (901, "UPDATE"), (902, "DELETE")
    ]  # audit_log filtered; B/C consumed
    ins, upd, dele = ev

    # PostgreSQL array literals survive byte-for-byte as their text form
    assert ins["after"]["tags"] == '{rush,"gift wrap","a,b"}'
    assert ins["after"]["weights"] == "{1,2,3}"
    assert upd["after"]["weights"] == "{}"
    # interval text in both spellings; bytea hex escape form
    assert ins["after"]["grace"] == "1 day 02:03:04.500000"
    assert upd["after"]["grace"] == "02:03:04"
    assert ins["after"]["blob"] == "\\x48656c6c6f00ff"
    # timestamptz VALUES pass through as text (they are column data,
    # not protocol timestamps — the consumer parses them)
    assert ins["after"]["placed_at"] == "2024-06-01 11:59:58.123456+00"
    assert upd["after"]["placed_at"] == "2024-06-01 11:59:59-05:30"
    # unchanged-TOAST omission: wal2json drops the column from the U
    # image entirely; the envelope must not resurrect it as NULL
    assert "blob" not in upd["after"]
    # identity with an array member
    assert dele["before"] == {"o_orderkey": "21", "tags": "{rush}"}
    # commit stamps across the remaining ladder rungs, normalized to UTC
    assert str(ins["commit_time"]) == "2024-06-01 12:00:00.999999"
    assert str(dele["commit_time"]) == "2024-06-01 18:30:01"
    assert all(r["subject"] == "cdc.testdb.public.orders" for r in ev)
