"""Schemas: CDC envelope, wal2json-v2 change-log ingest, table catalog.

The envelope matches the reference's ``CDCEvent`` JSON shape
(reference: internal/model/events.go:104-119); the change-log schema matches
the wal2json-v2 wire format the reference decodes
(reference: internal/parser/wal2json.go:223-240, FIXTURES.md §2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# wal2json-v2 style change-log ingest row (FIXTURES.md §2).
# One row per action: B | C | I | U | D | T, ordered by ingest_seq.
CHANGE_LOG_SCHEMA = T.StructType(
    [
        T.StructField("ingest_seq", T.LongType(), False),
        T.StructField("lsn", T.StringType(), True),
        T.StructField("action", T.StringType(), False),
        T.StructField("xid", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "identity",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
            True,
        ),
    ]
)

# Normalized publishable envelope (reference: internal/model/events.go:104-119).
# Row images are dynamic MAP<STRING,STRING> — the analog of the reference's
# map[string]interface{} before/after; typed projections are derived at the
# edge with from_json + a table schema from the catalog.
CDC_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("commit_time", T.TimestampType(), True),
        T.StructField("lsn", T.StringType(), True),
        T.StructField("txid", T.LongType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("operation", T.StringType(), False),
        T.StructField("before", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("after", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("subject", T.StringType(), True),
    ]
)

# DLQ record (reference: internal/publisher/dlq.go:17-33).
DLQ_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("subject", T.StringType(), True),
        T.StructField("database", T.StringType(), True),
        T.StructField("schema", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("operation", T.StringType(), True),
        T.StructField("lsn", T.StringType(), True),
        T.StructField("txid", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("payload_size", T.LongType(), True),
        T.StructField("truncated", T.BooleanType(), True),
        T.StructField("payload_prefix", T.StringType(), True),
        T.StructField("quarantined_at", T.TimestampType(), True),
    ]
)

# Per-table typed schemas — the analog of the reference's relationInfo
# registry (reference: internal/parser/pgoutput.go:20-26). from_json(after,
# TABLE_CATALOG[t]) turns the dynamic image into typed columns.
TABLE_CATALOG: dict[str, T.StructType] = {
    "public.accounts": T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("email", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("created_at", T.TimestampType()),
            T.StructField("updated_at", T.TimestampType()),
        ]
    ),
    "public.orders": T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("account_id", T.LongType()),
            T.StructField("total_cents", T.IntegerType()),
            T.StructField("status", T.StringType()),
            T.StructField("created_at", T.TimestampType()),
            T.StructField("updated_at", T.TimestampType()),
        ]
    ),
}
