"""Kafka-shaped CDC source/sink (reference R1 ingest + R11 publish surface).

The reference publishes each CDC event to NATS JetStream with
`Nats-Msg-Id = event_id` for broker-side dedup and a
`cdc.{db}.{schema}.{table}` subject (internal/publisher/jetstream.go:99-125,
314-383; subject build publisher.go:195-210). The Kafka analog of that
contract is:

  - topic   = sanitized subject            (keyed routing),
  - key     = event_id bytes               (idempotent-producer dedup key,
                                            also the compaction key),
  - value   = the byte-compatible CDC JSON (cdc/serialize.py),
  - headers = event_type + source metadata (NATS header analog).

This module encodes/decodes that wire shape as DataFrames whose schema is
EXACTLY Spark's built-in Kafka source/sink schema
(key binary, value binary, topic string, partition int, offset long,
timestamp timestamp, timestampType int, headers array<struct<key:string,
value:binary>>). On a real cluster the parquet stand-in used here swaps
for `format("kafka")` with no change to the encode/decode logic — the
container has no Kafka broker or connector jars, so transport is gated
behind options (SURVEY §2.2 R1/R3: file/Kafka source interchangeable).

Scale: encode is a narrow codegen projection (to_json + concat), no
Python, no shuffle. Partition assignment mirrors Kafka's default
murmur2-style keyed partitioner via a deterministic hash of the key so a
100-TB replay lands events for one table-row on one partition — the
ordering unit the reference guarantees per subject (R12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from better_cdc_spark.cdc.serialize import RFC3339_SECONDS, marshal_cdc_event

# Spark's Kafka source exposes records with exactly this schema; the Kafka
# sink consumes (key, value, topic[, partition, headers]). Keeping the
# stand-in identical means every reader/writer below is transport-agnostic.
KAFKA_HEADER_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("value", T.BinaryType(), True),
        ]
    )
)

KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
        T.StructField("headers", KAFKA_HEADER_TYPE, True),
    ]
)

# The JSON payload schema (field order = Go struct order, serialize.py).
CDC_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("commit_time", T.TimestampType()),
        T.StructField("lsn", T.StringType()),
        T.StructField("txid", T.LongType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("operation", T.StringType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)


def to_kafka_records(envelope: DataFrame, num_partitions: int = 32) -> DataFrame:
    """CDC envelope rows → Kafka-sink-shaped records.

    Keyed by event_id (the reference's Nats-Msg-Id, jetstream.go:337-340),
    topic from the sanitized subject, partition from a deterministic hash
    of the ORDERING key (txid) so all events of a transaction land on one
    partition in order — matching the reference's per-subject ordered
    delivery (R12) without a global sort.
    """
    payload = marshal_cdc_event(envelope, value_col="_json")
    return payload.select(
        F.col("event_id").cast("binary").alias("key"),
        F.col("_json").cast("binary").alias("value"),
        F.col("subject").alias("topic"),
        F.pmod(F.xxhash64(F.col("txid")), F.lit(num_partitions))
        .cast("int")
        .alias("partition"),
        F.array(
            F.struct(
                F.lit("event_type").alias("key"),
                F.col("event_type").cast("binary").alias("value"),
            ),
            F.struct(
                F.lit("source").alias("key"),
                F.col("source").cast("binary").alias("value"),
            ),
        )
        .cast(KAFKA_HEADER_TYPE)
        .alias("headers"),
    )


def from_kafka_records(records: DataFrame) -> DataFrame:
    """Kafka-source-shaped records → CDC envelope (inverse of encode).

    Works identically on `spark.readStream.format("kafka")` output and on
    the parquet stand-in — only (value, topic) are needed, so a real
    deployment can also consume compacted topics where key survives but
    offsets/timestamps differ from publish time.
    """
    parsed = records.select(
        F.from_json(
            F.col("value").cast("string"),
            CDC_VALUE_SCHEMA,
            {"timestampFormat": RFC3339_SECONDS, "timeZone": "UTC"},
        ).alias("e"),
        F.col("topic").alias("subject"),
    )
    return parsed.select("e.*", "subject")


def write_kafka_shaped(
    records: DataFrame,
    path_or_servers: str,
    *,
    transport: str = "files",
    topic_column_required: bool = True,
) -> None:
    """Batch-write Kafka-shaped records.

    transport="files" (default, this container): append parquet at
    `path_or_servers`, preserving the exact record schema. transport=
    "kafka": `path_or_servers` is `kafka.bootstrap.servers`; requires the
    spark-sql-kafka connector on the classpath (not in this container).
    """
    if topic_column_required and "topic" not in records.columns:
        raise ValueError("kafka-shaped records need a 'topic' column")
    if transport == "kafka":
        (
            records.write.format("kafka")
            .option("kafka.bootstrap.servers", path_or_servers)
            .save()
        )
        return
    records.write.mode("append").parquet(path_or_servers)


def read_kafka_shaped_stream(
    spark: SparkSession,
    path_or_servers: str,
    *,
    transport: str = "files",
    subscribe_pattern: str | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming read of Kafka-shaped records (the R1 source surface).

    File transport plays the WAL-reader role here exactly as the
    reference's tests drive the engine from fixture files; the kafka
    branch is the production path (offset tracking, backpressure via
    maxOffsetsPerTrigger — Spark-native analogs of R16/R19).
    """
    if transport == "kafka":
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", path_or_servers)
            .option("subscribePattern", subscribe_pattern or "cdc\\..*")
            .option("startingOffsets", "earliest")
        )
        return reader.load()
    stream = (
        spark.readStream.schema(KAFKA_RECORD_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path_or_servers)
    )
    if subscribe_pattern is not None:
        stream = stream.filter(F.col("topic").rlike(subscribe_pattern))
    return stream
