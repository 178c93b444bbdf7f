"""SCD Type-2 historization: a versioned change stream → dimension history.

The reference's envelope stream is the canonical input for warehouse
historization (its docs position consumers as MERGE/history builders,
readme.md "Use cases"; the apply half lives in cdc.apply). This module
derives the *history* table: one row per surviving version of each key
with half-open validity ``[valid_from, valid_to)`` and an ``is_current``
flag — the standard slowly-changing-dimension type 2 shape.

Semantics per key, ordered by ``order_col`` (the commit order):
  - every INSERT/UPDATE event opens a version at its own commit position;
  - the next event for the key (any operation) closes it — ``valid_to`` =
    that event's position, exclusive;
  - DELETE events emit no version themselves, but close the previous one
    (a deleted key has no current version);
  - the last event of a key, if not a DELETE, is the open/current version.

Spark-first: one hash shuffle on the key, then ``lead()`` + ``row_number``
over the same sort — Catalyst reuses the exchange/sort for both windows,
so the whole historization is a single-pass window stage. At 100 TB this
partitions by key exactly like the MERGE apply; no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    keys: str | Sequence[str],
    order_col: str | Column,
    op_col: str = "operation",
    delete_op: str = "DELETE",
    version_col: str = "version",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build the SCD2 history of a keyed change stream.

    ``order_col`` is both the sort order and the validity axis: each
    version's ``valid_from`` is its own ``order_col`` value (already a
    column of ``changes``); ``valid_to_col`` is the next event's value
    (null = open). ``version_col`` numbers surviving versions 1..n per
    key. Ties in ``order_col`` within a key are nondeterministic — pass a
    total order (e.g. ``F.struct("lsn", "seq_in_tx")`` for the engine's
    envelope).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    w = W.partitionBy(*key_list).orderBy(order)
    # lead() must see DELETE events (they close the prior version) —
    # compute it before filtering them out.
    closed = changes.withColumn(valid_to_col, F.lead(order).over(w))
    versions = closed.filter(F.col(op_col) != delete_op)
    # Renumber over the same partitioning+sort: no extra shuffle.
    return versions.withColumn(version_col, F.row_number().over(w)).withColumn(
        current_col, F.col(valid_to_col).isNull()
    )


def scd2_apply_increment(
    history: DataFrame,
    batch: DataFrame,
    keys: str | Sequence[str],
    order_col: str | Column,
    op_col: str = "operation",
    delete_op: str = "DELETE",
    version_col: str = "version",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """One incremental SCD2 step: fold a change micro-batch into a history.

    The streaming (foreachBatch) counterpart of ``scd2_history``: applying
    batches in stream order yields EXACTLY the batch fold's table — the
    equivalence the qc14 oracle checks. Per batch:

      - the key's first event closes its open history version (valid_to =
        that event's position, exclusive — DELETEs close like the batch
        fold);
      - within the batch, versions chain via lead() over the same key sort;
      - version numbers continue from the key's surviving-row count so far.

    Scale: every step is keyed by the dimension key — two window passes
    over the (small) batch, one left-anti/semi split of the history, and a
    count-per-key join; the history is never globally sorted or rewritten
    per key, so the step cost is O(batch + touched-history), which is what
    lets a 100 TB dimension historize continuously.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    w = W.partitionBy(*key_list).orderBy(order)

    b = batch.withColumn(valid_to_col, F.lead(order).over(w))
    first_seq = batch.groupBy(*key_list).agg(F.min(order).alias("__close_at"))

    open_rows = history.filter(F.col(current_col))
    closed_open = (
        open_rows.join(first_seq, key_list)
        .withColumn(valid_to_col, F.col("__close_at"))
        .drop("__close_at")
        .withColumn(current_col, F.lit(False))
    )
    rest = history.filter(~F.col(current_col)).unionByName(
        open_rows.join(first_seq.select(*key_list), key_list, "left_anti")
    )

    base = history.groupBy(*key_list).agg(F.count("*").alias("__base"))
    new_rows = (
        b.filter(F.col(op_col) != delete_op)
        .join(base, key_list, "left")
        .withColumn(
            version_col,
            (F.coalesce(F.col("__base"), F.lit(0)) + F.row_number().over(w)).cast("int"),
        )
        .drop("__base")
        .withColumn(current_col, F.col(valid_to_col).isNull())
    )
    return rest.unionByName(closed_open).unionByName(
        new_rows.select(*rest.columns)
    )
