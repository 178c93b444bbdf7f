"""R20: CDCEvent JSON serialization, byte-compatible with the reference.

The reference publishes `json.Marshal(CDCEvent)` per event
(internal/engine/engine.go:20-23, 340-351); the struct's JSON tags and
field order are internal/model/events.go:104-119 — event_id, event_type,
source, timestamp, commit_time, lsn, txid, schema, table, operation,
before, after, metadata, with `omitempty` on the three maps (Go omits nil
AND length-0 maps).

Spark-first: one `to_json(struct(...))` projection — a narrow codegen map,
no Python. Byte-compat rules implemented here:

- field order = Go struct declaration order (to_json preserves struct
  field order; Go json.Marshal emits declaration order),
- empty/null maps are nulled before serialization so ignoreNullFields
  drops them exactly where omitempty would,
- timestamps render as RFC3339 with 'Z' (Go time.Time.MarshalJSON);
  sub-second digits are emitted only when non-zero in Go, so inputs are
  truncated to whole seconds by contract here (CDC commit times at
  second precision; documented divergence for sub-second inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RFC3339_SECONDS = "yyyy-MM-dd'T'HH:mm:ssXXX"


def _omit_if_empty(col: F.Column) -> F.Column:
    return F.when(F.size(col) > 0, col)


def marshal_cdc_event(envelope: DataFrame, value_col: str = "value") -> DataFrame:
    """envelope rows → one JSON string per event (the publish payload).

    Input: the normalize_changelog output schema. Output: all original
    columns plus `value_col` holding the reference-shaped JSON. Routing
    metadata (subject) stays as a column — the reference also carries the
    subject outside the payload (publisher.go:27-38).
    """
    payload = F.struct(
        F.col("event_id"),
        F.col("event_type"),
        F.col("source"),
        F.date_trunc("second", F.col("timestamp")).alias("timestamp"),
        F.date_trunc("second", F.col("commit_time")).alias("commit_time"),
        F.col("lsn"),
        F.col("txid"),
        F.col("schema"),
        F.col("table"),
        F.col("operation"),
        _omit_if_empty(F.col("before")).alias("before"),
        _omit_if_empty(F.col("after")).alias("after"),
        _omit_if_empty(F.col("metadata")).alias("metadata"),
    )
    return envelope.withColumn(
        value_col,
        F.to_json(
            payload,
            {"timestampFormat": RFC3339_SECONDS, "timeZone": "UTC"},
        ),
    )
