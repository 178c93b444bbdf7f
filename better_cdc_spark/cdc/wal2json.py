"""wal2json format-version-2 wire ingest — the live-capture seam.

The reference consumes the PostgreSQL ``wal2json`` logical-decoding
plugin's format-version-2 output: ONE JSON object per replication
message, ``action`` ∈ {B, C, I, U, D, T}, with ``columns`` (new values,
I/U) and ``identity`` (old key values, U/D) as name/type/value arrays
(reference: internal/parser/wal2json.go:222-240 for the struct,
:112-168 for the action dispatch). Crucially the LSN is NOT in the
JSON — it is the XLogData WALStart of the frame that carried the
message (wal2json.go:119-120), and event ordering is the arrival
order on the replication socket.

This module is the translation from that wire form to the engine's
``CHANGE_LOG_SCHEMA`` ingest rows (schemas.py): frames in, a normal
DataFrame out, with LSN and ingest sequence attached from the frame
metadata exactly as the reference's decode loop does. Everything
downstream (cdc/normalize.py's allowlist → tx assembly → event-id →
subject pipeline) is shared with the synthetic-changelog path — the
ONLY difference between a test capture and live PostgreSQL is who
produced the frames.

Swap-in seam for a live deployment (documented for the integration
test in tests/test_wal2json_capture.py):

  - ``connect_wire(host, port, start_replication_command(...))``
    (cdc/socket_wire.py) ↔ pgx/pgconn's ``StartReplication`` on a
    connection with ``replication=database`` — same START_REPLICATION
    query message, same CopyBothResponse handshake, same XLogData /
    keepalive frames (the wire rig speaks the real framing, only the
    server is fake).
  - ``ReplicationLoop`` (cdc/replication.py) ↔ the reference's
    wal/reader.go receive loop — standby status updates, ack-gated
    confirmed_flush_lsn, reconnect-and-resume are already the real
    protocol here.
  - ``FakeWalServer`` ↔ PostgreSQL itself; a live slot created with
    ``pg_create_logical_replication_slot(name, 'wal2json')`` and
    ``proto_format=2`` options yields byte-identical payloads to a
    capture replayed through the rig.

Values arrive as JSON atoms of any type (wal2json emits numbers
unquoted); the ingest schema stores them as their raw JSON text —
Spark's from_json preserves atom text for StringType fields, matching
the reference's ``interface{}`` passthrough (wal2json.go:243-253)
closely enough for the string-image envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the wire message itself (wal2json.go:222-233) — no lsn, no seq
WAL2JSON_V2_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType(), False),
        T.StructField("xid", T.LongType(), True),
        T.StructField("timestamp", T.StringType(), True),
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

# PostgreSQL timestamp formats wal2json emits (space separator; offset
# with or without minutes) — the same ladder the reference tries
# (wal2json.go:201-209), plus the RFC3339 'Z'-suffixed UTC forms the
# reference parser also accepts ('X'-class patterns match a literal Z
# as zero offset; 'x'-class patterns do not). Tried in order; first
# success wins.
_PG_TS_FORMATS = (
    "yyyy-MM-dd HH:mm:ss.SSSSSSxxx",
    "yyyy-MM-dd HH:mm:ss.SSSSSSx",
    "yyyy-MM-dd HH:mm:ssxxx",
    "yyyy-MM-dd HH:mm:ssx",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx",
    "yyyy-MM-dd'T'HH:mm:ssxxx",
    "yyyy-MM-dd HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
)


def _pg_timestamp(col: F.Column) -> F.Column:
    out = F.lit(None).cast("timestamp")
    for fmt in _PG_TS_FORMATS:
        out = F.coalesce(out, F.try_to_timestamp(col, F.lit(fmt)))
    # FAILFAST parity for timestamps: a present-but-unparseable value
    # means the slot/plugin emits a format we do not know — fail loud
    # like the reference's fatal timestamp-parse path, never a silent
    # NULL that would corrupt commit ordering downstream.
    return (
        F.when(col.isNull(), F.lit(None).cast("timestamp"))
        .when(
            out.isNull(),
            F.raise_error(
                F.concat(F.lit("unparseable wal2json timestamp: "), col)
            ).cast("timestamp"),
        )
        .otherwise(out)
    )


def parse_wal2json_frames(
    spark: SparkSession, frames: list[tuple[int, str, str]]
) -> DataFrame:
    """(ingest_seq, lsn, payload_json) frames → CHANGE_LOG_SCHEMA rows.

    ``frames`` is what the replication consumer hands over: arrival
    ordinal, the XLogData WALStart rendered as an LSN string, and the
    wal2json v2 message text. Unknown actions are dropped exactly like
    the reference's default branch (wal2json.go:164-166). The JSON
    decode runs distributed (from_json inside codegen) — only the
    bounded frame list itself is driver-side, which mirrors the
    reference's single replication-socket ingestion; at scale the
    frames land in object storage / a broker first and this same parse
    runs over that source.
    """
    raw = spark.createDataFrame(
        [(int(s), l, p) for s, l, p in frames],
        "ingest_seq long, lsn string, payload string",
    )
    # FAILFAST: an UNDECODABLE payload is fatal, exactly like the
    # reference's decode loop (wal2json.go:70-74 sets a fatal error and
    # stops the parser — malformed WAL output means the slot/plugin
    # config is wrong, and silently dropping it would corrupt the
    # stream's transaction structure). An unknown ACTION in well-formed
    # JSON stays a non-fatal skip (wal2json.go:164-166), handled by the
    # action filter below.
    m = raw.select(
        "ingest_seq",
        "lsn",
        F.from_json(
            "payload", WAL2JSON_V2_SCHEMA, {"mode": "FAILFAST"}
        ).alias("m"),
    ).filter(F.col("m.action").isin("B", "C", "I", "U", "D", "T"))
    return m.select(
        "ingest_seq",
        "lsn",
        F.col("m.action").alias("action"),
        F.col("m.xid").alias("xid"),
        _pg_timestamp(F.col("m.timestamp")).alias("timestamp"),
        F.col("m.schema").alias("schema"),
        F.col("m.table").alias("table"),
        F.col("m.columns").alias("columns"),
        F.col("m.identity").alias("identity"),
    )
