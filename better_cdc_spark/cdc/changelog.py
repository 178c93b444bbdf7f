"""Change-log sources: JSON-lines reader + deterministic synthesis.

The engine's canonical CDC ingest format is the wal2json-v2 row shape
(reference: internal/parser/wal2json.go:223-240): one record per action
B/C/I/U/D/T with columns/identity arrays of {name, type, value}.

`synthesize_changelog_from_orders` derives a deterministic change log from
the driver's `orders` table so correctness can be oracle-checked: the same
derivation is expressible in ANSI SQL. The workload mix mirrors the
reference's load harness (60/30/10 I/U/D — scripts/e2e-load-test.sh:22-27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from better_cdc_spark.schemas import CHANGE_LOG_SCHEMA

# Transaction grouping modulus: ~15 orders per synthetic tx at sf0.01.
TX_MOD = 997
# Base offset so synthetic LSNs resemble real ones ("0/10nnnn").
LSN_BASE = 1_048_576


def read_changelog_json(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSON-lines change log with the explicit wire schema.

    Explicit schema = no inference scan; at scale this is a streaming
    source too (spark.readStream.schema(...).json(path)).
    """
    return spark.read.schema(CHANGE_LOG_SCHEMA).json(path)


def synthesize_changelog_from_orders(orders: DataFrame) -> DataFrame:
    """orders → deterministic wal2json-v2 change log (B/C/I/U/D rows).

    Derivation (all pure column expressions, reproducible in SQL):
      xid        = o_orderkey % 997
      table      = audit_log (o_orderkey%7=0, excluded by the allowlist)
                   | orders (o_orderkey%3=0) | accounts
      action     = I (60%) | U (30%) | D (10%) by o_orderkey%10
      commit lsn = '0/' || hex(xid*16 + 1048576)   (shared by the tx)
      ingest_seq = o_orderkey*10 for data rows; B/C rows bracket the tx
      commit ts  = max(o_orderdate) within the tx
    """
    base = orders.select(
        F.col("o_orderkey").alias("okey"),
        (F.col("o_orderkey") % TX_MOD).alias("xid"),
        F.when(F.col("o_orderkey") % 7 == 0, "audit_log")
        .when(F.col("o_orderkey") % 3 == 0, "orders")
        .otherwise("accounts")
        .alias("table"),
        F.when(F.col("o_orderkey") % 10 < 6, "I")
        .when(F.col("o_orderkey") % 10 < 9, "U")
        .otherwise("D")
        .alias("action"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string").alias("total_cents"),
        F.col("o_orderdate").alias("ts"),
    )
    lsn = F.concat(F.lit("0/"), F.format_string("%x", F.col("xid") * 16 + F.lit(LSN_BASE)))

    col_entry = lambda name, typ, val: F.struct(  # noqa: E731
        F.lit(name).alias("name"), F.lit(typ).alias("type"), val.alias("value")
    )
    new_cols = F.array(
        col_entry("id", "bigint", F.col("okey").cast("string")),
        col_entry("status", "text", F.col("status")),
        col_entry("total_cents", "bigint", F.col("total_cents")),
    )
    key_cols = F.array(col_entry("id", "bigint", F.col("okey").cast("string")))

    data_rows = base.select(
        (F.col("okey") * 10).alias("ingest_seq"),
        lsn.alias("lsn"),
        F.col("action"),
        F.col("xid"),
        F.lit(None).cast("timestamp").alias("timestamp"),
        F.lit("public").alias("schema"),
        F.col("table"),
        F.when(F.col("action").isin("I", "U"), new_cols).alias("columns"),
        F.when(F.col("action").isin("U", "D"), key_cols).alias("identity"),
    )

    tx = base.groupBy("xid").agg(
        F.min("okey").alias("min_okey"),
        F.max("okey").alias("max_okey"),
        F.max("ts").alias("commit_ts"),
    )
    marker = lambda seq_col, act, ts: tx.select(  # noqa: E731
        seq_col.alias("ingest_seq"),
        F.concat(
            F.lit("0/"), F.format_string("%x", F.col("xid") * 16 + F.lit(LSN_BASE))
        ).alias("lsn"),
        F.lit(act).alias("action"),
        F.col("xid"),
        ts.alias("timestamp"),
        F.lit(None).cast("string").alias("schema"),
        F.lit(None).cast("string").alias("table"),
        F.lit(None).cast(data_rows.schema["columns"].dataType).alias("columns"),
        F.lit(None).cast(data_rows.schema["identity"].dataType).alias("identity"),
    )
    begin_rows = marker(F.col("min_okey") * 10 - 5, "B", F.lit(None).cast("timestamp"))
    commit_rows = marker(F.col("max_okey") * 10 + 5, "C", F.col("commit_ts"))

    return data_rows.unionByName(begin_rows).unionByName(commit_rows)
