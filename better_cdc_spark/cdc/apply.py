"""Changelog apply: materialize a table snapshot from CDC events (MERGE).

The reference publishes an ordered, effectively-once envelope stream and
leaves materialization to the consumer; its own docs map the consumer side
to an idempotent MERGE target (SURVEY.md R11/R14 — jetstream.go:99-125
publish with Nats-Msg-Id dedup, readme.md:118 effectively-once contract).
This module is that consumer: given a previous snapshot and a batch of CDC
events, produce the next snapshot with standard upsert/delete semantics —
the Spark-native equivalent of `MERGE INTO snapshot USING latest_changes`.

Semantics (per key, using the latest event by ``order_col``):
  - INSERT/UPDATE → the after-image replaces any existing row (upsert);
  - DELETE        → the row is removed (delete of an absent key is a no-op);
  - keys with no event pass through unchanged.

Scale: the change set is reduced to one row per key with a single shuffle
(window TopK, better_cdc_spark.operators.dedup_keep_first), then the
snapshot is anti-joined against the touched-key set. For the canonical
100 TB-snapshot + small-delta shape, pass ``broadcast_changes=True``: the
touched keys broadcast, the anti-join needs NO snapshot shuffle, and the
whole apply is one narrow pass over the snapshot plus a union. Without
broadcast both sides hash-partition on the key — still one shuffle each.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from better_cdc_spark.operators import dedup_keep_first


def latest_per_key(
    changes: DataFrame,
    keys: str | Sequence[str],
    order_col: str | Column,
) -> DataFrame:
    """Collapse a multi-version change batch to the final event per key.

    ``order_col`` must be a total commit order within each key — for the
    engine's envelope that is ``(lsn, seq_in_tx)`` (pass
    ``F.struct("lsn", "seq_in_tx")``). Ties are nondeterministic, as in
    any CDC apply: give it a real ordering.
    """
    return dedup_keep_first(changes, keys, order_col, ascending=False)


def snapshot_at(
    changes: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    cutoff,
    op_col: str = "operation",
    delete_op: str = "DELETE",
) -> DataFrame:
    """Point-in-time reconstruction: table state as of ``order_col <= cutoff``.

    CDC time travel — replay the changelog only up to a commit position
    (LSN / commit_seq / timestamp) and materialize what the table looked
    like then: latest surviving after-image per key, deletes removed.
    ``apply_changelog`` is the incremental step; this is the from-scratch
    fold the reference enables by retaining the ordered event stream.

    Scale: the cutoff filter is a pushable predicate on the changelog scan
    (partition-prune by LSN range when the log is LSN-partitioned, which
    is how a 100 TB changelog should be laid out); reconstruction is then
    ONE shuffle on the key for the latest-per-key window.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    hist = changes.filter(F.col(order_col) <= F.lit(cutoff))
    latest = latest_per_key(hist, key_list, order_col)
    return latest.filter(F.col(op_col) != delete_op).drop(op_col)


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: str | Sequence[str],
    order_col: str | Column,
    op_col: str = "operation",
    delete_op: str = "DELETE",
    broadcast_changes: bool = False,
) -> DataFrame:
    """Next snapshot = MERGE(previous snapshot, change batch).

    ``changes`` must carry the snapshot's columns (the after-image), the
    ``op_col`` operation, and ``order_col``; extra columns are dropped.
    Output schema is exactly ``snapshot.columns``.

    In streaming, call this inside ``foreachBatch`` with the micro-batch
    as ``changes`` — Spark's commit log makes the batch boundary atomic
    (R16 analog), so a retried batch re-applies idempotently: MERGE of
    the same latest-per-key state is a fixpoint.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    latest = latest_per_key(changes, key_list, order_col)

    touched = latest.select(*key_list)
    if broadcast_changes:
        touched = F.broadcast(touched)
    untouched = snapshot.join(touched, key_list, "left_anti")

    upserts = latest.filter(F.col(op_col) != delete_op).select(*snapshot.columns)
    return untouched.unionByName(upserts)
