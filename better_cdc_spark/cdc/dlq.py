"""Failure policy + dead-letter side output.

Reference behavior (internal/engine/engine.go:229-290,
internal/publisher/dlq.go:36-82): permanent publish errors are routed per
policy crash|dlq|skip; DLQ records carry the error, payload size, and a
payload prefix truncated to a cap (64 KiB — dlq.go:15); DLQ subject is
"{prefix}.{database}.{schema}.{table}".

Spark-first: the policy engine is a pair of complementary filters — one
DataFrame of publishable events, one side-output DataFrame of DLQ records.
Both derive from the same plan (Catalyst computes the predicate once per
row); no row ever visits the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_PREFIX_CAP = 64 * 1024  # bytes (dlq.go:15)

POLICIES = ("crash", "dlq", "skip")


class PermanentPublishError(RuntimeError):
    """Raised under policy='crash' when permanently-failing rows exist."""


def route_failures(
    events: DataFrame,
    error_pred: F.Column,
    error_msg: F.Column,
    payload: F.Column,
    policy: str = "dlq",
    dlq_prefix: str = "dlq",
    prefix_cap: int = PAYLOAD_PREFIX_CAP,
) -> tuple[DataFrame, DataFrame]:
    """Split events into (publishable, dlq_records) per the failure policy.

    `error_pred` marks permanently-failing rows (the analog of
    ErrMaxPayload/ErrBadSubject classification, publisher/errors.go:19-31).

    policy='crash' → raise if any failing row exists (fail the query);
    policy='skip'  → failing rows are dropped, empty DLQ;
    policy='dlq'   → failing rows become DLQ records.
    """
    if policy not in POLICIES:
        raise ValueError(f"policy must be one of {POLICIES}, got {policy!r}")

    ok = events.filter(~error_pred)
    if policy == "crash":
        n_bad = events.filter(error_pred).count()
        if n_bad:
            raise PermanentPublishError(f"{n_bad} permanently-failing events (policy=crash)")
        return ok, events.limit(0).filter(F.lit(False)).select(F.col("event_id"))
    if policy == "skip":
        return ok, events.filter(F.lit(False)).select(F.col("event_id"))

    payload_size = F.octet_length(payload)
    dlq = events.filter(error_pred).select(
        F.col("event_id"),
        F.concat_ws(
            ".", F.lit(dlq_prefix), F.col("source"), F.col("schema"), F.col("table")
        ).alias("subject"),
        F.col("source").alias("database"),
        F.col("schema"),
        F.col("table"),
        F.col("operation"),
        F.col("lsn"),
        F.col("txid"),
        error_msg.alias("error"),
        payload_size.cast("long").alias("payload_size"),
        (payload_size > prefix_cap).alias("truncated"),
        F.substring(payload, 1, prefix_cap).alias("payload_prefix"),
    )
    return ok, dlq
