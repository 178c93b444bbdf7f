"""CDC-semantics tests mirroring the reference's unit/integration invariants.

Golden values come from the reference's own tests:
  - exact event-id string (transformer_test.go:174-183)
  - value-exclusion / in-tx distinctness (transformer_test.go:185-237)
  - empty-string column values stay '' (pgoutput_test.go:245)
  - TRUNCATE → cdc.ddl with empty images (cdc_truncate_test.go:12-54)
  - failure policies crash|dlq|skip (engine_failure_policy_test.go:40-293)
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from better_cdc_spark.cdc import normalize_changelog
from better_cdc_spark.cdc.dlq import PermanentPublishError, route_failures
from better_cdc_spark.schemas import CHANGE_LOG_SCHEMA

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def make_changelog(spark, rows):
    return spark.createDataFrame(rows, CHANGE_LOG_SCHEMA)


def col_entry(name, typ, value):
    return {"name": name, "type": typ, "value": value}


@pytest.fixture(scope="module")
def golden_events(spark):
    """One tx on public.users: INSERT + UPDATE (same row) + DELETE, plus a
    filtered table and a TRUNCATE in a second tx."""
    rows = [
        # tx 42: B, I, U, D on public.users + one row on an ignored table
        (1, "0/16A1B8", "B", 42, None, None, None, None, None),
        (2, "0/16A1B8", "I", 42, None, "public", "users", [col_entry("id", "bigint", "1"), col_entry("email", "text", "a@b.c"), col_entry("note", "text", "")], None),
        (3, "0/16A1B8", "U", 42, None, "public", "users", [col_entry("id", "bigint", "1"), col_entry("email", "text", "x@b.c")], [col_entry("id", "bigint", "1")]),
        (4, "0/16A1B8", "I", 42, None, "internal", "audit", [col_entry("id", "bigint", "9")], None),
        (5, "0/16A1B8", "D", 42, None, "public", "users", None, [col_entry("id", "bigint", "1")]),
        (6, "0/16A1B8", "C", 42, TS, None, None, None, None),
        # tx 43: TRUNCATE
        (7, "0/16A200", "B", 43, None, None, None, None, None),
        (8, "0/16A200", "T", 43, None, "public", "users", None, None),
        (9, "0/16A200", "C", 43, TS, None, None, None, None),
    ]
    df = normalize_changelog(
        make_changelog(spark, rows), database="testdb", allowlist=["public.users"]
    )
    return {r["event_id"]: r.asDict() for r in df.collect()}


def test_golden_event_id_format(golden_events):
    # Exact golden string from transformer_test.go:179.
    assert "0/16A1B8:42:INSERT:public.users:0" in golden_events


def test_in_tx_events_distinct_and_ordered(golden_events):
    ids = [k for k in golden_events if k.startswith("0/16A1B8:42:")]
    assert sorted(ids) == [
        "0/16A1B8:42:DELETE:public.users:2",
        "0/16A1B8:42:INSERT:public.users:0",
        "0/16A1B8:42:UPDATE:public.users:1",
    ]
    # seq_in_tx skips the filtered internal.audit row (filter-before-buffer, R4)


def test_event_id_excludes_row_values(spark):
    # Same change with different values → same id (replay collapses, R8).
    def one(value):
        rows = [
            (1, "0/1", "B", 7, None, None, None, None, None),
            (2, "0/1", "I", 7, None, "public", "users", [col_entry("v", "text", value)], None),
            (3, "0/1", "C", 7, TS, None, None, None, None),
        ]
        df = normalize_changelog(make_changelog(spark, rows), allowlist=["public.users"])
        return df.select("event_id").collect()[0][0]

    assert one("alpha") == one("beta")


def test_envelope_fields(golden_events):
    ins = golden_events["0/16A1B8:42:INSERT:public.users:0"]
    assert ins["event_type"] == "cdc.insert"
    assert ins["operation"] == "INSERT"
    assert ins["subject"] == "cdc.testdb.public.users"
    assert ins["commit_time"] == TS
    assert ins["txid"] == 42
    assert ins["before"] is None
    assert ins["after"] == {"id": "1", "email": "a@b.c", "note": ""}
    assert ins["metadata"] == {"txid": "42"}

    upd = golden_events["0/16A1B8:42:UPDATE:public.users:1"]
    assert upd["event_type"] == "cdc.update"
    assert upd["before"] == {"id": "1"}
    assert upd["after"] == {"id": "1", "email": "x@b.c"}

    dele = golden_events["0/16A1B8:42:DELETE:public.users:2"]
    assert dele["event_type"] == "cdc.delete"
    assert dele["after"] is None
    assert dele["before"] == {"id": "1"}


def test_empty_string_is_not_null(golden_events):
    # pgoutput_test.go:245 — empty payload is '', not NULL.
    ins = golden_events["0/16A1B8:42:INSERT:public.users:0"]
    assert ins["after"]["note"] == ""
    assert ins["after"]["note"] is not None


def test_table_allowlist_filters(golden_events):
    assert not any(":internal.audit:" in k for k in golden_events)


def test_truncate_maps_to_ddl_with_empty_images(golden_events):
    ddl = golden_events["0/16A200:43:DDL:public.users:0"]
    assert ddl["event_type"] == "cdc.ddl"
    assert ddl["operation"] == "DDL"
    assert ddl["before"] == {} and ddl["after"] == {}


def test_subject_sanitization(spark):
    # config.go:188-234: non [A-Za-z0-9_-] chars in tokens become '_'.
    rows = [
        (1, "0/1", "B", 1, None, None, None, None, None),
        (2, "0/1", "I", 1, None, "my schema", "t.v", [col_entry("id", "bigint", "1")], None),
        (3, "0/1", "C", 1, TS, None, None, None, None),
    ]
    df = normalize_changelog(make_changelog(spark, rows), database="db*x")
    subj = df.select("subject").collect()[0][0]
    assert subj == "cdc.db_x.my_schema.t_v"


@pytest.fixture()
def dlq_input(spark, request):
    rows = [
        (1, "0/1", "B", 1, None, None, None, None, None),
        (2, "0/1", "I", 1, None, "public", "users", [col_entry("id", "bigint", "1"), col_entry("blob", "text", "x" * 100)], None),
        (3, "0/1", "I", 1, None, "public", "users", [col_entry("id", "bigint", "2"), col_entry("blob", "text", "ok")], None),
        (4, "0/1", "C", 1, TS, None, None, None, None),
    ]
    ev = normalize_changelog(make_changelog(spark, rows), allowlist=["public.users"])
    payload = F.element_at("after", "blob")
    return ev, payload


def test_dlq_policy_quarantines_with_truncation(dlq_input):
    ev, payload = dlq_input
    ok, dlq = route_failures(
        ev, F.octet_length(payload) > 50, F.lit("too big"), payload, policy="dlq", prefix_cap=10
    )
    assert ok.count() == 1
    rec = dlq.collect()[0].asDict()
    assert rec["error"] == "too big"
    assert rec["payload_size"] == 100
    assert rec["truncated"] is True
    assert rec["payload_prefix"] == "x" * 10
    assert rec["subject"] == "dlq.testdb.public.users"


def test_skip_policy_drops(dlq_input):
    ev, payload = dlq_input
    ok, dlq = route_failures(
        ev, F.octet_length(payload) > 50, F.lit("e"), payload, policy="skip"
    )
    assert ok.count() == 1 and dlq.count() == 0


def test_crash_policy_raises(dlq_input):
    ev, payload = dlq_input
    with pytest.raises(PermanentPublishError):
        route_failures(ev, F.octet_length(payload) > 50, F.lit("e"), payload, policy="crash")


def test_marshal_cdc_event_reference_shape(spark):
    """R20: publish payload matches Go json.Marshal(CDCEvent) byte layout.

    Field order = events.go:104-119 declaration order; omitempty drops the
    empty DDL maps; timestamps RFC3339 'Z'; txid is a bare number.
    """
    import json

    from better_cdc_spark.cdc.serialize import marshal_cdc_event

    rows = [
        (1, "0/16A1B8", "B", 42, None, None, None, None, None),
        (2, "0/16A1B8", "I", 42, None, "public", "users",
         [col_entry("id", "bigint", "1"), col_entry("email", "text", "a@b.c")], None),
        (3, "0/16A1B8", "T", 42, None, "public", "users", None, None),
        (4, "0/16A1B8", "C", 42, TS, None, None, None, None),
    ]
    envelope = normalize_changelog(make_changelog(spark, rows), database="testdb")
    out = marshal_cdc_event(envelope)
    docs = [json.loads(r["value"]) for r in out.collect()]
    assert docs, "no events serialized"
    for doc in docs:
        expected_keys = [
            "event_id", "event_type", "source", "timestamp", "commit_time",
            "lsn", "txid", "schema", "table", "operation",
        ]
        assert list(doc.keys())[: len(expected_keys)] == expected_keys
        assert isinstance(doc["txid"], int)
        if doc["operation"] == "DDL":
            # omitempty: empty images are ABSENT, not {} (Go omits len-0 maps)
            assert "before" not in doc and "after" not in doc
        if doc["operation"] == "INSERT":
            assert "after" in doc and "before" not in doc
            assert doc["after"] == {"id": "1", "email": "a@b.c"}
        ts = doc["commit_time"]
        assert ts.endswith("Z") and "." not in ts  # RFC3339, whole seconds


class TestApplyChangelog:
    """MERGE-apply semantics (cdc/apply.py): the consumer-side materializer
    implied by the reference's idempotent-sink contract (R11/R14)."""

    @pytest.fixture(scope="class")
    def applied(self, spark):
        from better_cdc_spark.cdc import apply_changelog

        snapshot = spark.createDataFrame(
            [(1, "old-1"), (2, "old-2"), (3, "old-3")], "id long, val string"
        )
        changes = spark.createDataFrame(
            [
                # key 1: two versions, final UPDATE wins
                (1, "v1", "UPDATE", 10),
                (1, "v2", "UPDATE", 20),
                # key 2: delete of existing
                (2, None, "DELETE", 10),
                # key 4: insert of new
                (4, "new-4", "INSERT", 10),
                # key 5: insert then delete -> absent
                (5, "new-5", "INSERT", 10),
                (5, None, "DELETE", 20),
                # key 9: delete of absent -> no-op
                (9, None, "DELETE", 10),
            ],
            "id long, val string, operation string, commit_seq long",
        )
        return apply_changelog(snapshot, changes, "id", "commit_seq"), snapshot, changes

    def test_merge_semantics(self, applied):
        out, _, _ = applied
        state = {r["id"]: r["val"] for r in out.collect()}
        assert state == {1: "v2", 3: "old-3", 4: "new-4"}

    def test_reapply_is_fixpoint(self, spark, applied):
        """Retried micro-batch re-applies idempotently (effectively-once,
        readme.md:118): MERGE(MERGE(s, c), c) == MERGE(s, c)."""
        from better_cdc_spark.cdc import apply_changelog

        out, _, changes = applied
        again = apply_changelog(out, changes, "id", "commit_seq")
        assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}

    def test_broadcast_plan_has_no_snapshot_shuffle(self, spark):
        """broadcast_changes=True: the anti-join must be a BroadcastHashJoin
        so a 100 TB snapshot is never shuffled for a small delta."""
        from better_cdc_spark.cdc import apply_changelog

        snapshot = spark.range(1000).select(
            F.col("id"), F.lit("x").alias("val")
        )
        changes = spark.range(10).select(
            F.col("id"),
            F.lit("y").alias("val"),
            F.lit("UPDATE").alias("operation"),
            F.lit(1).alias("commit_seq"),
        )
        out = apply_changelog(snapshot, changes, "id", "commit_seq", broadcast_changes=True)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_replayed_commit_record_does_not_multiply_rows(spark):
    """At-least-once delivery can duplicate the 'C' marker; the commit join
    must still emit each data row exactly once (ADVICE r1)."""
    rows = [
        (1, "0/AA00", "B", 7, None, None, None, None, None),
        (2, "0/AA00", "I", 7, None, "public", "users", [col_entry("id", "bigint", "1")], None),
        (3, "0/AA00", "I", 7, None, "public", "users", [col_entry("id", "bigint", "2")], None),
        (4, "0/AA00", "C", 7, TS, None, None, None, None),
        (5, "0/AA00", "C", 7, TS, None, None, None, None),  # replayed marker
    ]
    df = normalize_changelog(make_changelog(spark, rows), allowlist=["public.users"])
    ids = [r["event_id"] for r in df.collect()]
    assert sorted(ids) == [
        "0/AA00:7:INSERT:public.users:0",
        "0/AA00:7:INSERT:public.users:1",
    ]


def test_streaming_datasource_resumes_from_checkpoint(spark, tmp_path):
    """R1 acked-LSN parity: a restarted streaming read resumes from the
    checkpointed offset — rows [0, 4000) from run 1 are not re-emitted
    when run 2 raises the WAL head to 8000; the sink ends with exactly
    one copy of every row."""
    from better_cdc_spark.datasource import ChangelogGenDataSource

    spark.dataSource.register(ChangelogGenDataSource)
    out = str(tmp_path / "ds_sink")
    ck = str(tmp_path / "ds_ck")

    def run(max_rows: int) -> None:
        q = (
            spark.readStream.format("changelog_gen")
            .option("partitions", 4)
            .option("maxRows", max_rows)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    run(4000)
    first = spark.read.parquet(out)
    assert first.count() == 4000
    run(8000)  # restart, same checkpoint, head advanced
    sunk = spark.read.parquet(out)
    assert sunk.count() == 8000
    assert sunk.select("g").distinct().count() == 8000  # no re-emission
    assert sunk.agg(F.min("g"), F.max("g")).collect()[0][:] == (0, 7999)


def test_snapshot_handoff_equals_pure_changelog_fold(spark):
    """Bootstrap theorem: injecting a CONSISTENT snapshot at seq 3 into the
    LWW fold changes nothing — the result equals folding the changelog
    alone. (If the snapshot were inconsistent with the ≤3 prefix, rows
    would differ — this is the invariant a handoff must preserve.)"""
    from better_cdc_spark.queries import load_all
    from better_cdc_spark.cdc.apply import snapshot_at
    from tests.conftest import SF_SMOKE

    reg = load_all()
    handoff = reg["qc13_snapshot_handoff"].fn(spark, SF_SMOKE)
    # pure changelog fold: same synthetic stream, no snapshot injection
    from better_cdc_spark.io import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, SF_SMOKE, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    two = F.col("id") % 4 == 0
    versions = base.select(
        "*",
        F.explode(F.when(two, F.array(F.lit(2), F.lit(4))).otherwise(F.array(F.lit(2)))).alias("v"),
    )
    last_v = F.when(two, F.lit(4)).otherwise(F.lit(2))
    op = (
        F.when(F.col("v") < last_v, "INSERT")
        .when(F.col("id") % 10 < 6, "INSERT")
        .when(F.col("id") % 10 < 9, "UPDATE")
        .otherwise("DELETE")
    )
    changes = versions.select(
        "id",
        F.concat_ws("-", "status", F.col("v").cast("string")).alias("status"),
        (F.col("cents") + F.col("v")).alias("total_cents"),
        op.alias("operation"),
        F.col("v").alias("commit_seq"),
    )
    pure = snapshot_at(changes, keys="id", order_col="commit_seq", cutoff=4)
    a = {tuple(r) for r in handoff.collect()}
    b = {tuple(r) for r in pure.select("id", "status", "total_cents").collect()}
    assert a == b


def test_scd2_increment_matches_batch_fold_with_reinserts(spark):
    """scd2_apply_increment: batch-by-batch fold == scd2_history, on a
    stream with a delete-then-reinsert (absent from the qc14 fixture) and
    a delete-only batch."""
    import pandas as pd
    from pyspark.sql import functions as F
    from better_cdc_spark.cdc import scd2_apply_increment, scd2_history

    rows = [
        # key 1: insert, update, delete, reinsert (4 waves)
        (1, "a", 10, "INSERT", 1), (1, "b", 11, "UPDATE", 2),
        (1, None, None, "DELETE", 3), (1, "c", 12, "INSERT", 4),
        # key 2: insert wave 1, delete-only wave 3
        (2, "x", 20, "INSERT", 1), (2, None, None, "DELETE", 3),
        # key 3: two versions in ONE wave (in-batch chaining)
        (3, "p", 30, "INSERT", 2), (3, "q", 31, "UPDATE", 2),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "status", "total_cents", "operation", "commit_seq"])
    )
    batch_fold = scd2_history(
        df.withColumn("o", F.struct("commit_seq", "status")),
        keys="id", order_col=F.struct("commit_seq", "status"),
    ).drop("o")
    # stream fold: one wave per batch, in order, starting from an empty
    # history with the output schema
    hist = (
        df.withColumn("valid_to", F.lit(None).cast("struct<commit_seq:bigint,status:string>"))
        .withColumn("version", F.lit(None).cast("int"))
        .withColumn("is_current", F.lit(True))
        .limit(0)
    )
    for wv in sorted({r[4] for r in rows}):
        b = df.filter(F.col("commit_seq") == wv)
        hist = scd2_apply_increment(
            hist, b, keys="id", order_col=F.struct("commit_seq", "status")
        ).localCheckpoint(eager=True)
    got = {tuple(r) for r in hist.select("id", "status", "total_cents", "version", "is_current").collect()}
    want = {tuple(r) for r in batch_fold.select("id", "status", "total_cents", "version", "is_current").collect()}
    assert got == want
