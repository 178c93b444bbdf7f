"""CDC pipeline queries (SURVEY.md §2: R2–R9, R15; Q43), oracle-paired.

The change log is synthesized deterministically from the `orders` table
(better_cdc_spark.cdc.changelog) so the full normalize pipeline —
allowlist filter, commit stamping, seq_in_tx, event ids, subjects, DLQ —
is checkable against an ANSI-SQL oracle that performs the same derivation
directly on `orders`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from better_cdc_spark.cdc import (
    normalize_changelog,
    synthesize_changelog_from_orders,
)
from better_cdc_spark.cdc.dlq import route_failures
from better_cdc_spark.cdc.normalize import typed_projection
from better_cdc_spark.io import load_table
from better_cdc_spark.queries import query
from better_cdc_spark.session import tune_for_oracle

ALLOWLIST = ["public.orders", "public.accounts"]

# Shared oracle CTEs: the SQL mirror of changelog synthesis + normalize.
_ORACLE_BASE = """
WITH base AS (
  SELECT o_orderkey AS okey,
         o_orderkey % 997 AS xid,
         CASE WHEN o_orderkey % 7 = 0 THEN 'audit_log'
              WHEN o_orderkey % 3 = 0 THEN 'orders'
              ELSE 'accounts' END AS tbl,
         CASE WHEN o_orderkey % 10 < 6 THEN 'INSERT'
              WHEN o_orderkey % 10 < 9 THEN 'UPDATE'
              ELSE 'DELETE' END AS op,
         o_orderstatus AS status,
         CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR) AS total_cents,
         o_orderdate
  FROM orders
), txc AS (
  SELECT xid, MAX(o_orderdate) AS commit_time FROM base GROUP BY xid
), filtered AS (
  SELECT b.*,
         ROW_NUMBER() OVER (PARTITION BY b.xid ORDER BY b.okey) - 1 AS seq,
         '0/' || printf('%x', b.xid * 16 + 1048576) AS lsn,
         t.commit_time
  FROM base b JOIN txc t USING (xid)
  WHERE b.tbl <> 'audit_log'
), envelope AS (
  SELECT concat_ws(':', lsn, CAST(xid AS VARCHAR), op,
                   'public.' || tbl, CAST(seq AS VARCHAR)) AS event_id,
         CASE op WHEN 'INSERT' THEN 'cdc.insert'
                 WHEN 'UPDATE' THEN 'cdc.update'
                 ELSE 'cdc.delete' END AS event_type,
         'testdb' AS source,
         commit_time,
         lsn,
         xid AS txid,
         'public' AS "schema",
         tbl AS "table",
         op AS operation,
         'cdc.testdb.public.' || tbl AS subject,
         CASE WHEN op IN ('UPDATE','DELETE') THEN 1 END AS n_before,
         CASE WHEN op IN ('INSERT','UPDATE') THEN 3 END AS n_after,
         CASE WHEN op IN ('INSERT','UPDATE') THEN status END AS after_status,
         CASE WHEN op IN ('UPDATE','DELETE') THEN CAST(okey AS VARCHAR) END AS before_id,
         okey, seq, status, total_cents
  FROM filtered
)
"""


def _normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    changelog = synthesize_changelog_from_orders(orders)
    return normalize_changelog(changelog, database="testdb", allowlist=ALLOWLIST)


@query(
    "qc01_cdc_normalize",
    oracle=_ORACLE_BASE
    + """
    SELECT event_id, event_type, source, commit_time, lsn, txid,
           "schema", "table", operation, subject,
           n_before, n_after, after_status, before_id
    FROM envelope
    """,
    tags=("cdc", "flagship"),
)
def qc01_cdc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC normalize: change log → envelope (R2, R4, R5, R7, R8, R9).

    Exercises allowlist filtering, commit stamping by txid, seq_in_tx
    ordinals, deterministic event ids, event-type mapping, and subject
    routing in one plan. The dynamic before/after images are surfaced as
    sizes + extracted entries so the compare is representation-free.
    """
    tune_for_oracle(spark)
    ev = _normalized(spark, sf_dir)
    return ev.select(
        "event_id",
        "event_type",
        "source",
        "commit_time",
        "lsn",
        "txid",
        "schema",
        "table",
        "operation",
        "subject",
        F.size("before").alias("n_before"),
        F.size("after").alias("n_after"),
        F.element_at("after", "status").alias("after_status"),
        F.element_at("before", "id").alias("before_id"),
    )


@query(
    "q43_seq_in_tx",
    oracle=_ORACLE_BASE
    + """
    SELECT txid, okey, CAST(seq AS BIGINT) AS seq_in_tx
    FROM envelope
    """,
    tags=("cdc", "window"),
)
def q43_seq_in_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transaction WAL-order ordinal (reference SeqInTx, R5/Q43):
    row_number over (partition by txid order by ingest order) - 1."""
    tune_for_oracle(spark)
    ev = _normalized(spark, sf_dir)
    # seq_in_tx is embedded in the event id (last ':' token).
    seq = F.element_at(F.split("event_id", ":"), -1).cast("bigint")
    okey = F.element_at("before", "id").cast("bigint")
    okey = F.coalesce(okey, F.element_at("after", "id").cast("bigint"))
    return ev.select(F.col("txid"), okey.alias("okey"), seq.alias("seq_in_tx"))


@query(
    "qc02_typed_projection",
    oracle=_ORACLE_BASE
    + """
    SELECT event_id,
           okey AS id,
           status,
           CAST(total_cents AS INTEGER) AS total_cents
    FROM envelope
    WHERE "table" = 'orders' AND operation IN ('INSERT','UPDATE')
    """,
    tags=("cdc", "schema"),
)
def qc02_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic MAP image → typed columns (relationInfo registry analog)."""
    tune_for_oracle(spark)
    ev = _normalized(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("total_cents", T.IntegerType()),
        ]
    )
    return typed_projection(ev, "public.orders", schema)


@query(
    "qc03_dlq_routing",
    oracle=_ORACLE_BASE
    + """
    , payloads AS (
      SELECT *,
             concat_ws('|', event_id, COALESCE(after_status, '')) AS payload
      FROM envelope
    )
    SELECT event_id,
           'dlq.testdb.public.' || "table" AS subject,
           'testdb' AS database, "schema", "table", operation, lsn, txid,
           'max payload exceeded' AS error,
           CAST(length(payload) AS BIGINT) AS payload_size,
           (length(payload) > 36) AS truncated,
           substr(payload, 1, 36) AS payload_prefix
    FROM payloads
    WHERE length(payload) > 38
    """,
    tags=("cdc", "dlq"),
)
def qc03_dlq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure policy 'dlq': permanent failures → dead-letter side output
    with payload truncation (R15; dlq.go:36-82, 64 KiB cap scaled to 48B
    so truncation is exercised at test scale)."""
    tune_for_oracle(spark)
    ev = _normalized(spark, sf_dir)
    payload = F.concat_ws(
        "|", F.col("event_id"), F.coalesce(F.element_at("after", "status"), F.lit(""))
    )
    _ok, dlq = route_failures(
        ev,
        error_pred=F.octet_length(payload) > 38,
        error_msg=F.lit("max payload exceeded"),
        payload=payload,
        policy="dlq",
        prefix_cap=36,
    )
    return dlq


@query(
    "qc04_event_id_invariants",
    oracle=_ORACLE_BASE
    + """
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT event_id) AS n_distinct_ids,
           COUNT(DISTINCT txid) AS n_txs,
           CAST(MAX(seq) AS BIGINT) AS max_seq_in_tx
    FROM envelope
    """,
    tags=("cdc", "invariant"),
)
def qc04_event_id_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-id uniqueness invariant (cdc_dedup_test.go:118-163): ids are
    distinct across and within transactions; replay of the same change
    yields the same id (determinism is implied by the hash-match itself)."""
    tune_for_oracle(spark)
    ev = _normalized(spark, sf_dir)
    seq = F.element_at(F.split("event_id", ":"), -1).cast("bigint")
    return ev.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_id").alias("n_distinct_ids"),
        F.countDistinct("txid").alias("n_txs"),
        F.max(seq).alias("max_seq_in_tx"),
    )
