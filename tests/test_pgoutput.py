"""Binary pgoutput decode: wire-level edge cases the oracle can't express.

Mirrors the reference's parser tests (internal/parser/pgoutput_test.go):
'u' unchanged-TOAST cells skipped, empty string ≠ NULL (pgoutput_test.go:245),
relation-registry refresh on re-sent 'R' (ALTER mid-stream), unknown
relations dropped, and the tx-context carry across decode chunks.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from better_cdc_spark.cdc.pgoutput import (
    RelationInfo,
    decode_pgoutput,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_truncate,
    encode_update,
    parse_relation,
)

REL = RelationInfo(
    relid=16400,
    schema="public",
    table="users",
    columns=("id", "email", "bio"),
    column_oids=(20, 25, 25),
    key_flags=(1, 0, 0),
)

MSG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("msg", T.BinaryType(), False),
    ]
)


def _decode(spark, msgs, chunk_rows=4096):
    df = spark.createDataFrame(msgs, schema=MSG_SCHEMA)
    return decode_pgoutput(spark, df, chunk_rows=chunk_rows)


def test_relation_roundtrip():
    rel = parse_relation(encode_relation(REL))
    assert rel == REL


def test_toast_skip_and_empty_string_vs_null(spark):
    """'u' cells vanish from the image; '' stays a real empty string;
    'n' is SQL NULL (reference pgoutput_test.go:245 + pgoutput.go:611-642)."""
    msgs = [
        (1, encode_relation(REL)),
        (2, encode_begin("0/100", 0, 7)),
        # id=1, email='' (empty, NOT null), bio unchanged-TOAST
        (3, encode_insert(REL.relid, [("t", b"1"), ("t", b""), ("u", None)])),
        # id=2, email NULL, bio present
        (4, encode_insert(REL.relid, [("t", b"2"), ("n", None), ("t", b"hi")])),
        (5, encode_commit("0/100", 123_456)),
    ]
    rows = {tuple(sorted((c["name"], c["value"]) for c in r["columns"])): r
            for r in _decode(spark, msgs).filter(F.col("action") == "I").collect()}
    img1 = next(v for k, v in rows.items() if ("id", "1") in k)
    cols1 = {c["name"]: c["value"] for c in img1["columns"]}
    assert cols1 == {"id": "1", "email": ""}  # bio ('u') skipped entirely
    img2 = next(v for k, v in rows.items() if ("id", "2") in k)
    cols2 = {c["name"]: c["value"] for c in img2["columns"]}
    assert cols2 == {"id": "2", "email": None, "bio": "hi"}


def test_update_identity_drops_padding_nulls(spark):
    """The 'K' old tuple is full-width with 'n' padding for non-key
    columns; the identity image keeps only the real key values."""
    msgs = [
        (1, encode_relation(REL)),
        (2, encode_begin("0/200", 0, 8)),
        (3, encode_update(
            REL.relid,
            [("t", b"5"), ("n", None), ("n", None)],
            [("t", b"5"), ("t", b"x@y"), ("t", b"new bio")],
        )),
        (4, encode_delete(REL.relid, [("t", b"6"), ("n", None), ("n", None)])),
        (5, encode_commit("0/200", 1)),
    ]
    out = _decode(spark, msgs)
    upd = out.filter(F.col("action") == "U").collect()[0]
    assert [(c["name"], c["value"]) for c in upd["identity"]] == [("id", "5")]
    assert {c["name"]: c["value"] for c in upd["columns"]} == {
        "id": "5", "email": "x@y", "bio": "new bio"
    }
    dele = out.filter(F.col("action") == "D").collect()[0]
    assert [(c["name"], c["value"]) for c in dele["identity"]] == [("id", "6")]
    assert dele["columns"] is None


def test_registry_versioning_mid_stream_alter(spark):
    """A re-sent 'R' (ALTER) applies only to messages after it; earlier
    data decodes with the earlier schema."""
    rel_v2 = RelationInfo(
        REL.relid, "public", "users",
        ("id", "email", "bio", "age"), (20, 25, 25, 23), (1, 0, 0, 0),
    )
    msgs = [
        (1, encode_relation(REL)),
        (2, encode_begin("0/300", 0, 9)),
        (3, encode_insert(REL.relid, [("t", b"1"), ("t", b"a@b"), ("t", b"old")])),
        (4, encode_commit("0/300", 1)),
        (5, encode_relation(rel_v2)),
        (6, encode_begin("0/301", 0, 10)),
        (7, encode_insert(REL.relid, [("t", b"2"), ("t", b"c@d"), ("t", b"new"), ("t", b"33")])),
        (8, encode_commit("0/301", 2)),
    ]
    ins = {r["ingest_seq"]: r for r in _decode(spark, msgs).filter(F.col("action") == "I").collect()}
    assert [c["name"] for c in ins[3]["columns"]] == ["id", "email", "bio"]
    assert [c["name"] for c in ins[7]["columns"]] == ["id", "email", "bio", "age"]
    assert {c["name"]: c["type"] for c in ins[7]["columns"]}["age"] == "integer"


def test_unknown_relation_dropped(spark):
    """Reference parity: rel.ID == 0 → event dropped, stream continues
    (buildRelationEvent, pgoutput.go:592-596)."""
    msgs = [
        (1, encode_relation(REL)),
        (2, encode_begin("0/400", 0, 11)),
        (3, encode_insert(99999, [("t", b"1")])),
        (4, encode_insert(REL.relid, [("t", b"2"), ("t", b"e"), ("t", b"f")])),
        (5, encode_commit("0/400", 1)),
    ]
    out = _decode(spark, msgs).filter(F.col("action") == "I").collect()
    assert len(out) == 1
    assert {c["name"]: c["value"] for c in out[0]["columns"]}["id"] == "2"


def test_truncate_emits_per_relation_rows(spark):
    rel2 = RelationInfo(16401, "public", "orders", ("id",), (20,), (1,))
    msgs = [
        (1, encode_relation(REL)),
        (2, encode_relation(rel2)),
        (3, encode_begin("0/500", 0, 12)),
        (4, encode_truncate([REL.relid, rel2.relid])),
        (5, encode_commit("0/500", 1)),
    ]
    out = _decode(spark, msgs).filter(F.col("action") == "T").collect()
    assert sorted(r["table"] for r in out) == ["orders", "users"]
    assert all(r["xid"] == 12 for r in out)


def test_tx_context_carries_across_chunks(spark):
    """chunk_rows=2 splits the transaction across many chunks: rows in
    chunks with no local Begin must inherit (xid, begin-LSN) via the
    prefix-scan carry, matching single-threaded stateful decode."""
    msgs = [(1, encode_relation(REL)), (2, encode_begin("0/600", 0, 13))]
    for i in range(3, 11):
        msgs.append((i, encode_insert(REL.relid, [("t", str(i).encode()), ("n", None), ("n", None)])))
    msgs.append((11, encode_commit("0/600", 1)))
    out = _decode(spark, msgs, chunk_rows=2)
    data = out.filter(F.col("action") == "I").collect()
    assert len(data) == 8
    assert all(r["xid"] == 13 and r["lsn"] == "0/600" for r in data)
    commit = out.filter(F.col("action") == "C").collect()[0]
    assert commit["xid"] == 13


def test_undecodable_message_raises(spark):
    msgs = [(1, b"Zgarbage")]
    with pytest.raises(Exception, match="undecodable|PythonException"):
        _decode(spark, msgs).collect()


def test_roundtrip_matches_wal2json_normalize(spark):
    """encode→decode→normalize ≡ normalize on the wal2json shape, with
    adversarial values: unicode, empty string (≠ NULL), NULL, interleaved
    transactions (the encoder re-serializes them contiguously; envelope
    equality proves in-tx order and commit stamping survive)."""
    import datetime

    from better_cdc_spark.cdc.normalize import normalize_changelog
    from better_cdc_spark.cdc.pgoutput import (
        decode_pgoutput,
        encode_changelog_as_pgoutput,
    )
    from better_cdc_spark.schemas import CHANGE_LOG_SCHEMA

    def cols(entries):
        return [
            {"name": n, "type": t, "value": v} for n, t, v in entries
        ]

    TS = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        # interleaved txs 1 and 2
        (1, "0/10", "B", 1, None, None, None, None, None),
        (2, "0/20", "B", 2, None, None, None, None, None),
        (3, "0/10", "I", 1, None, "public", "users",
         cols([("id", "bigint", "1"), ("name", "text", "héllo ✓"), ("bio", "text", "")]), None),
        (4, "0/20", "I", 2, None, "public", "users",
         cols([("id", "bigint", "2"), ("name", "text", None), ("bio", "text", "x")]), None),
        (5, "0/10", "U", 1, None, "public", "users",
         cols([("id", "bigint", "1"), ("name", "text", "après"), ("bio", "text", "ü")]),
         cols([("id", "bigint", "1")])),
        (6, "0/10", "C", 1, TS, None, None, None, None),
        (7, "0/20", "D", 2, None, "public", "users", None,
         cols([("id", "bigint", "2")])),
        (8, "0/20", "C", 2, TS, None, None, None, None),
    ]
    changelog = spark.createDataFrame(rows, schema=CHANGE_LOG_SCHEMA)

    direct = normalize_changelog(changelog, database="testdb").toPandas()
    msgs = encode_changelog_as_pgoutput(changelog)
    decoded = decode_pgoutput(spark, msgs, chunk_rows=3)
    via_wire = normalize_changelog(decoded, database="testdb").toPandas()

    key = ["event_id"]
    d = direct.sort_values(key).reset_index(drop=True)
    w = via_wire.sort_values(key).reset_index(drop=True)
    assert list(d["event_id"]) == list(w["event_id"])
    for col in ("event_type", "operation", "subject", "lsn", "txid",
                "schema", "table", "commit_time", "before", "after"):
        assert list(d[col]) == list(w[col]), f"column {col} diverged"
    # the adversarial values survived the wire byte-exactly
    after = {r["event_id"]: r["after"] for _, r in w.iterrows()}
    ins1 = after["0/10:1:INSERT:public.users:0"]
    assert ins1["name"] == "héllo ✓" and ins1["bio"] == ""
    ins2 = after["0/20:2:INSERT:public.users:0"]
    assert ins2["name"] is None and ins2["bio"] == "x"


def test_pgoutput_wide_type_domain_text_cells(spark):
    """Second capture set (wal2json_capture2 parity): pgoutput carries
    every value as a 't' text cell, so the array-literal / interval /
    bytea-hex / timestamptz domain must survive byte-for-byte —
    including embedded quotes and commas inside array elements — and a
    'u' TOAST cell on the SAME row must skip without shifting its
    neighbours (cell decode is positional)."""
    rel = RelationInfo(
        relid=16600,
        schema="public",
        table="orders",
        columns=("o_orderkey", "tags", "grace", "placed_at", "blob"),
        column_oids=(20, 1009, 1186, 1184, 17),
        key_flags=(1, 0, 0, 0, 0),
    )
    vals = [
        ("t", b"21"),
        ("t", b'{rush,"gift wrap","a,b"}'),
        ("t", b"1 day 02:03:04.500000"),
        ("t", b"2024-06-01 11:59:58.123456+00"),
        ("u", None),  # TOASTed bytea unchanged: skipped, no shift
    ]
    msgs = [
        (1, encode_relation(rel)),
        (2, encode_begin("0/200", 0, 11)),
        (3, encode_insert(rel.relid, vals)),
        (4, encode_commit("0/200", 222_333)),
    ]
    img = _decode(spark, msgs).filter(F.col("action") == "I").collect()
    assert len(img) == 1
    cols = {c["name"]: c["value"] for c in img[0]["columns"]}
    assert cols == {
        "o_orderkey": "21",
        "tags": '{rush,"gift wrap","a,b"}',
        "grace": "1 day 02:03:04.500000",
        "placed_at": "2024-06-01 11:59:58.123456+00",
    }
    assert "blob" not in cols  # 'u' skipped entirely, not nulled
