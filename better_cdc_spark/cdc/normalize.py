"""Change-log → normalized CDC envelope (the reference's decode+transform).

Pipeline stages and their reference analogs:
  - table allowlist filter        (internal/parser/wal2json.go:172-179)
  - tx assembly: commit stamping  (internal/parser/pgoutput.go:247-304, 387-398)
  - seq_in_tx WAL-order ordinal   (internal/parser/pgoutput.go:264-277)
  - event_type mapping            (internal/transformer/transformer.go:61-73)
  - deterministic event_id        (internal/transformer/transformer.go:75-106)
  - subject routing + sanitize    (internal/publisher/publisher.go:195-210,
                                   internal/config/config.go:188-234)

Spark-first design: commit metadata is joined onto data rows by txid
(broadcast — commit rows are tiny relative to data), seq_in_tx is a window
ordinal, everything else is narrow column expressions inside one codegen
stage. No Python UDFs anywhere.

Scale: the only shuffles are the commit-row aggregate + the window on txid.
At 100 TB both hash-partition on txid; skewed giant transactions are the
known hazard (the reference spills them to disk, pgoutput.go:39-111 —
Spark's external sort/agg spills natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# Operation per wal2json action code (internal/parser/wal2json.go:131-166).
_OP = {"I": "INSERT", "U": "UPDATE", "D": "DELETE", "T": "DDL"}

# event_type per operation (internal/transformer/transformer.go:61-73).
_EVENT_TYPE = {
    "INSERT": "cdc.insert",
    "UPDATE": "cdc.update",
    "DELETE": "cdc.delete",
    "DDL": "cdc.ddl",
}

# NATS-subject token sanitization (internal/config/config.go:188-234):
# any character outside [A-Za-z0-9_-] is replaced with '_'.
_SANITIZE_RE = "[^A-Za-z0-9_-]"


def _entries_to_map(col: F.Column) -> F.Column:
    """ARRAY<STRUCT<name,type,value>> → MAP<STRING,STRING> (dynamic image)."""
    return F.map_from_entries(
        F.transform(col, lambda c: F.struct(c["name"].alias("key"), c["value"].alias("value")))
    )


def sanitize_token(col: F.Column) -> F.Column:
    return F.regexp_replace(col, _SANITIZE_RE, "_")


def normalize_changelog(
    changelog: DataFrame,
    database: str = "testdb",
    allowlist: list[str] | None = None,
) -> DataFrame:
    """Normalize a wal2json-v2 change log into the CDC envelope.

    Returns one row per data action (I/U/D/T) with the CDC_EVENT_SCHEMA
    columns. Begin/Commit markers are consumed into per-row commit metadata
    — transaction structure becomes a data property.
    """
    op_expr = F.create_map(
        *[x for k, v in _OP.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("action")]
    etype_expr = F.create_map(
        *[x for k, v in _EVENT_TYPE.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("operation")]

    # Commit markers → per-tx commit metadata (TransactionEndLSN semantics:
    # the commit row's own lsn is the checkpoint position, pgoutput.go:251-256).
    # One commit row per tx even under at-least-once replay: a duplicated
    # 'C' record must not multiply the data rows it joins onto.
    commits = (
        changelog.filter(F.col("action") == "C")
        .select(
            F.col("xid"),
            F.col("lsn").alias("commit_lsn"),
            F.col("timestamp").alias("commit_time"),
        )
        .dropDuplicates(["xid"])
    )

    data = changelog.filter(F.col("action").isin(list(_OP)))
    if allowlist is not None:
        data = data.filter(
            F.concat_ws(".", "schema", "table").isin(allowlist) | F.col("table").isNull()
        )

    # Filter-before-buffering (R4): seq_in_tx is assigned on the filtered
    # stream, matching the reference's decode-time allowlist.
    data = data.join(F.broadcast(commits), "xid", "left")

    w = W.partitionBy("xid").orderBy("ingest_seq")
    data = (
        data.withColumn("operation", op_expr)
        .withColumn("seq_in_tx", F.row_number().over(w) - F.lit(1))
        .withColumn("event_type", etype_expr)
    )

    # Deterministic event id: lsn:txid:op:schema.table:seq_in_tx
    # (transformer.go:85-106). Excludes row values by design so replays
    # collapse to identical ids while in-tx events stay distinct.
    evt_lsn = F.coalesce("commit_lsn", "lsn")
    event_id = F.concat_ws(
        ":",
        evt_lsn,
        F.col("xid").cast("string"),
        F.col("operation"),
        F.concat_ws(".", "schema", "table"),
        F.col("seq_in_tx").cast("string"),
    )
    subject = F.concat_ws(
        ".",
        F.lit("cdc"),
        sanitize_token(F.lit(database)),
        sanitize_token(F.col("schema")),
        sanitize_token(F.col("table")),
    )

    is_ddl = F.col("operation") == "DDL"
    empty_map = F.map_from_entries(
        F.array().cast("array<struct<key:string,value:string>>")
    )
    before = F.when(
        F.col("operation").isin("UPDATE", "DELETE"), _entries_to_map(F.col("identity"))
    ).when(is_ddl, empty_map)
    after = F.when(
        F.col("operation").isin("INSERT", "UPDATE"), _entries_to_map(F.col("columns"))
    ).when(is_ddl, empty_map)

    return data.select(
        event_id.alias("event_id"),
        F.col("event_type"),
        F.lit(database).alias("source"),
        F.coalesce("timestamp", "commit_time").alias("timestamp"),
        F.col("commit_time"),
        evt_lsn.alias("lsn"),
        F.col("xid").alias("txid"),
        F.col("schema"),
        F.col("table"),
        F.col("operation"),
        before.alias("before"),
        after.alias("after"),
        F.create_map(F.lit("txid"), F.col("xid").cast("string")).alias("metadata"),
        subject.alias("subject"),
    )


def typed_projection(cdc_events: DataFrame, schema_table: str, table_schema) -> DataFrame:
    """Dynamic image → typed columns via the table catalog (relationInfo
    analog, pgoutput.go:20-26): element_at + ANSI casts, all JVM-side."""
    rows = cdc_events.filter(
        F.concat_ws(".", "schema", "table") == schema_table
    ).filter(F.col("after").isNotNull())
    cols = [
        F.element_at("after", f.name).cast(f.dataType).alias(f.name)
        for f in table_schema.fields
    ]
    return rows.select(F.col("event_id"), *cols)
