"""Kafka-shaped source/sink: wire-schema fidelity and encode/decode roundtrip.

Mirrors the reference's publish contract tests (jetstream publish with
Msg-Id = event_id, subject routing — internal/publisher/jetstream_test.go)
against the Spark Kafka record shape.
"""

from __future__ import annotations

import datetime

import pytest

from better_cdc_spark.cdc import normalize_changelog
from better_cdc_spark.schemas import CHANGE_LOG_SCHEMA
from better_cdc_spark.streaming.kafka_shaped import (
    KAFKA_RECORD_SCHEMA,
    from_kafka_records,
    read_kafka_shaped_stream,
    to_kafka_records,
    write_kafka_shaped,
)

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _col(name, typ, value):
    return {"name": name, "type": typ, "value": value}


@pytest.fixture(scope="module")
def envelope(spark):
    rows = [
        (1, "0/16A1B8", "B", 42, None, None, None, None, None),
        (2, "0/16A1B8", "I", 42, None, "public", "users",
         [_col("id", "bigint", "1"), _col("email", "text", "a@b.c")], None),
        (3, "0/16A1B8", "U", 42, None, "public", "users",
         [_col("id", "bigint", "1"), _col("email", "text", "x@b.c")],
         [_col("id", "bigint", "1")]),
        (4, "0/16A1B8", "C", 42, TS, None, None, None, None),
        (5, "0/16A200", "B", 43, None, None, None, None, None),
        (6, "0/16A200", "D", 43, None, "public", "orders",
         None, [_col("id", "bigint", "7")]),
        (7, "0/16A200", "C", 43, TS, None, None, None, None),
    ]
    return normalize_changelog(
        spark.createDataFrame(rows, CHANGE_LOG_SCHEMA), database="testdb"
    )


def test_record_schema_matches_spark_kafka_sink_contract(envelope):
    records = to_kafka_records(envelope)
    # The Kafka sink consumes exactly these columns with these types; the
    # source adds offset/timestamp/timestampType broker-side.
    by_name = {f.name: f.dataType for f in records.schema.fields}
    for name in ("key", "value", "topic", "partition", "headers"):
        expected = KAFKA_RECORD_SCHEMA[name].dataType
        assert by_name[name] == expected, name


def test_key_is_event_id_and_topic_is_subject(envelope):
    rows = to_kafka_records(envelope).collect()
    src = {r["event_id"]: r for r in envelope.collect()}
    assert len(rows) == len(src) == 3
    for r in rows:
        eid = bytes(r["key"]).decode()
        assert eid in src
        assert r["topic"] == src[eid]["subject"]
        headers = {h["key"]: bytes(h["value"]).decode() for h in r["headers"]}
        assert headers["event_type"] == src[eid]["event_type"]
        assert headers["source"] == "testdb"


def test_same_tx_lands_on_same_partition(envelope):
    rows = to_kafka_records(envelope, num_partitions=8).collect()
    parts_by_tx: dict[str, set] = {}
    for r in rows:
        txid = bytes(r["key"]).decode().split(":")[1]
        parts_by_tx.setdefault(txid, set()).add(r["partition"])
        assert 0 <= r["partition"] < 8
    assert all(len(p) == 1 for p in parts_by_tx.values())


def test_encode_decode_roundtrip(envelope):
    decoded = from_kafka_records(to_kafka_records(envelope))
    cols = ["event_id", "event_type", "source", "timestamp", "commit_time",
            "lsn", "txid", "schema", "table", "operation", "before", "after",
            "metadata", "subject"]
    want = {r["event_id"]: r.asDict() for r in envelope.select(cols).collect()}
    got = {r["event_id"]: r.asDict() for r in decoded.select(cols).collect()}
    assert got == want


def test_file_transport_stream_roundtrip(spark, envelope, tmp_path):
    topic_dir = str(tmp_path / "topic")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_kafka_shaped(to_kafka_records(envelope), topic_dir)

    stream = read_kafka_shaped_stream(
        spark, topic_dir, subscribe_pattern=r"cdc\.testdb\.public\..*"
    )
    q = (
        from_kafka_records(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()

    sunk = spark.read.parquet(out_dir)
    assert sunk.count() == 3
    assert set(r["operation"] for r in sunk.collect()) == {"INSERT", "UPDATE", "DELETE"}


def test_topic_filter_drops_other_subjects(spark, envelope, tmp_path):
    topic_dir = str(tmp_path / "t2")
    write_kafka_shaped(to_kafka_records(envelope), topic_dir)
    stream = read_kafka_shaped_stream(
        spark, topic_dir, subscribe_pattern=r"cdc\.testdb\.public\.users"
    )
    q = stream.writeStream.format("memory").queryName("kf_users").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = spark.sql("select topic from kf_users").collect()
    assert len(got) == 2
    assert all(r["topic"] == "cdc.testdb.public.users" for r in got)
