"""Reusable composite operators the engine adds on top of Spark built-ins.

These are the operators the reference ecosystem (and any 100 TB pipeline)
needs but Spark does not ship as single calls: as-of joins, per-group top-k,
and skew-salted joins. Each is a pure DataFrame → DataFrame transform —
no collect, no RDDs — so Catalyst/AQE still owns physical planning.

The query registry (better_cdc_spark.queries) exercises these against
DuckDB oracles; this module is the API a user composes directly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "asof_",
    direction: str = "backward",
    tolerance: "Column | None" = None,
) -> DataFrame:
    """For each left row, attach the nearest right row on the chosen side.

    ``direction="backward"`` (default): latest right with right_ts <=
    left_ts; ``"forward"``: earliest right with right_ts >= left_ts;
    ``"nearest"``: whichever of those two candidates is closer, distance
    ties keeping the earlier row — all inclusive, pandas ``merge_asof``
    semantics, keyed by ``on``.
    ``tolerance`` (a Column interval/number, e.g. ``F.expr("INTERVAL 30
    MINUTES")``) drops matches farther than that from the left timestamp;
    the plan cost is identical (one post-filter on the carried
    right_ts). Implemented as a union-merge: tag both sides, sort each
    key's combined timeline once, and carry the most recent right payload
    forward with ``last(ignorenulls=True)``. Left rows with no preceding
    right row are dropped (inner as-of).

    Scale: ONE shuffle on the key and a per-key sort — linear in
    |left|+|right|. The naive equi-join + row_number plan materializes
    O(left_per_key × right_per_key) rows before pruning; this never
    exceeds its input, so hot keys cannot blow up the intermediate. Ties
    on the timestamp resolve to the right row (inclusive bound).

    The whole right payload travels as ONE struct carried by a single
    ``last(ignorenulls=True)`` — so every output row's right columns come
    from the SAME matched right row even when individual payload columns
    are null (pandas ``merge_asof`` semantics), and a row whose payload is
    entirely null still counts as a match. One window function regardless
    of payload width.

    If multiple right rows share (key, right_ts), the carried row is the
    last in encounter order — deduplicate the right side first for
    deterministic results (the registry queries pre-aggregate).
    """
    keys = [on] if isinstance(on, str) else list(on)
    # The matched right timestamp is carried (prefixed) like any payload
    # column; the left timestamp becomes the merge axis and is re-emitted
    # under its own name.
    right_payload = [c for c in right.columns if c not in keys]
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    ts_type = left.schema[left_ts].dataType.simpleString()
    # The marker field is non-null on every right row, so the struct itself
    # is the match indicator — null payload columns cannot break anchoring.
    payload_struct = F.struct(
        F.lit(True).alias("__matched"),
        *[F.col(c).alias(c) for c in right_payload],
    )
    payload_type = T.StructType(
        [T.StructField("__matched", T.BooleanType(), False)]
        + [right.schema[c] for c in right_payload]
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).cast(ts_type).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        payload_struct.alias("__r"),
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *left_payload,
        F.lit(None).cast(payload_type).alias("__r"),
    )
    if direction == "backward":
        # Right rows sort before left rows at the same instant → inclusive <=,
        # and the running frame carries the most recent right forward.
        w = (
            W.partitionBy(*keys)
            .orderBy("__t", "__is_left")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carried = F.last("__r", ignorenulls=True).over(w)
    elif direction == "forward":
        # Mirror image: at equal instants the right row must sort AFTER the
        # left row so the forward frame (which starts at the left row) still
        # sees it → inclusive >=; first(ignorenulls) looks ahead.
        w = (
            W.partitionBy(*keys)
            .orderBy("__t", (F.lit(1) - F.col("__is_left")))
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        carried = F.first("__r", ignorenulls=True).over(w)
    elif direction == "nearest":
        # ONE partitioning + ONE ordering serves both candidate windows
        # (no second exchange or sort). Right rows sort before left rows
        # at equal instants, so the backward frame sees a same-ts right at
        # distance 0 — which beats any forward candidate — making the
        # right-first ordering correct for BOTH sides: the forward frame
        # only needs strictly-later rights. Distance ties prefer the
        # backward match (pandas merge_asof keeps the earlier row).
        ordering = ["__t", "__is_left"]
        w_back = (
            W.partitionBy(*keys)
            .orderBy(*ordering)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        w_fwd = (
            W.partitionBy(*keys)
            .orderBy(*ordering)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        prev = F.last("__r", ignorenulls=True).over(w_back)
        nxt = F.first("__r", ignorenulls=True).over(w_fwd)
        gap_prev = F.col("__t") - prev[right_ts]
        gap_next = nxt[right_ts] - F.col("__t")
        carried = (
            F.when(prev.isNull(), nxt)
            .when(nxt.isNull(), prev)
            .when(gap_next < gap_prev, nxt)
            .otherwise(prev)
        )
    else:
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    merged = r_tagged.unionByName(l_tagged).select(
        *keys,
        "__t",
        "__is_left",
        *left_payload,
        carried.alias("__r"),
    )
    out = merged.filter((F.col("__is_left") == 1) & F.col("__r").isNotNull())
    if tolerance is not None:
        if direction == "forward":
            gap = F.col("__r")[right_ts] - F.col("__t")
        elif direction == "nearest":
            gap = F.greatest(
                F.col("__t") - F.col("__r")[right_ts],
                F.col("__r")[right_ts] - F.col("__t"),
            )
        else:
            gap = F.col("__t") - F.col("__r")[right_ts]
        out = out.filter(gap <= tolerance)
    return out.select(
        *keys,
        F.col("__t").alias(left_ts),
        *left_payload,
        *[F.col("__r")[c].alias(f"{right_prefix}{c}") for c in right_payload],
    )


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str | Sequence[str],
    when_matched_update: "dict[str, Column] | None" = None,
    when_matched_delete: "Column | None" = None,
    when_not_matched_insert: "dict[str, Column] | bool" = False,
    when_not_matched_by_source_update: "dict[str, Column] | None" = None,
    when_not_matched_by_source_delete: "Column | None" = None,
) -> DataFrame:
    """Delta-style ``MERGE INTO`` as a pure DataFrame transform.

    Joins ``target`` and ``source`` on the key columns ``on`` and applies
    the standard clauses (including Delta's WHEN NOT MATCHED BY SOURCE
    pair, which acts on target rows whose key has no source match —
    retention/dormancy logic in one MERGE instead of a second pass):

      - ``when_matched_delete``: predicate (over ``t.*`` / ``s.*`` aliased
        columns) — matched target rows satisfying it are removed;
      - ``when_matched_update``: {target_col: expr} — matched rows (that
        survived the delete clause) get these columns replaced;
      - ``when_not_matched_insert``: ``True`` to insert source rows
        column-by-name (missing target columns null), or {target_col:
        expr} for explicit values; ``False`` drops unmatched source rows;
      - ``when_not_matched_by_source_delete``: predicate over ``t.*`` —
        unmatched target rows satisfying it are removed;
      - ``when_not_matched_by_source_update``: {target_col: expr} applied
        to unmatched target rows that survived the delete clause.

    Target rows with no source match always pass through unchanged, and
    the output schema is exactly ``target``'s — so the result is the next
    version of the target table, same contract as ``apply_changelog`` but
    with arbitrary clause logic instead of CDC operation codes.

    Expressions reference the two sides via the ``t``/``s`` aliases
    (``F.col("t.balance") + F.col("s.delta")``).

    Scale: ONE shuffle (the outer join on the key). ``source`` should be
    pre-collapsed to one row per key (``latest_per_key``) — multiple
    matches multiply target rows, as in SQL MERGE, where it's an error.
    For the 100 TB-snapshot + tiny-delta shape prefer ``apply_changelog``
    with ``broadcast_changes=True`` (anti-join + union, no snapshot
    shuffle); merge_into's full-outer join cannot be broadcast.
    """
    keys = [on] if isinstance(on, str) else list(on)
    t = target.withColumn("__te", F.lit(True)).alias("t")
    s = source.withColumn("__se", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    how = "full_outer" if when_not_matched_insert is not False else "left_outer"
    j = t.join(s, cond, how)

    matched = F.col("t.__te").isNotNull() & F.col("s.__se").isNotNull()
    source_only = F.col("t.__te").isNull()
    target_only = F.col("t.__te").isNotNull() & F.col("s.__se").isNull()
    if when_matched_delete is not None:
        j = j.filter(~(matched & F.coalesce(when_matched_delete, F.lit(False))))
    if when_not_matched_by_source_delete is not None:
        j = j.filter(
            ~(target_only & F.coalesce(when_not_matched_by_source_delete, F.lit(False)))
        )

    updates = when_matched_update or {}
    inserts = when_not_matched_insert if isinstance(when_not_matched_insert, dict) else {}
    out_cols = []
    for c in target.columns:
        val = F.col(f"t.{c}")
        if c in keys:
            if when_not_matched_insert is not False and c in source.columns:
                val = F.coalesce(val, F.col(f"s.{c}"))
        else:
            if c in updates:
                val = F.when(matched, updates[c]).otherwise(val)
            if when_not_matched_by_source_update and c in when_not_matched_by_source_update:
                val = F.when(
                    target_only, when_not_matched_by_source_update[c]
                ).otherwise(val)
            if when_not_matched_insert is not False:
                ins = inserts.get(
                    c,
                    F.col(f"s.{c}")
                    if c in source.columns
                    else F.lit(None).cast(target.schema[c].dataType),
                )
                val = F.when(source_only, ins).otherwise(val)
        out_cols.append(val.alias(c))
    return j.select(*out_cols)


def topk_per_group(
    df: DataFrame,
    group_cols: str | Sequence[str],
    order_col: str | Column,
    k: int,
    descending: bool = True,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group via a ranking window.

    Always pass a deterministic tiebreak in ``order_col`` (e.g.
    ``F.struct(F.col("score").desc(), F.col("id"))``-style composite)
    or include a unique key — row_number over a non-unique ordering is
    nondeterministic under retries.

    Scale: one shuffle on the group key; Spark's window TopK pushes a
    per-partition rank limit before the final sort when k is small.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    order = order.desc() if descending else order.asc()
    w = W.partitionBy(*groups).orderBy(order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed left keys.

    The left side gets a deterministic salt (xxhash64 of the whole row,
    mod ``num_salts``) so a hot key's rows spread across ``num_salts``
    shuffle partitions; the right side is replicated once per salt via
    an exploded literal sequence. Semantically identical to
    ``left.join(right, on, how)`` for inner/left joins.

    Use when one build-side-small-enough-to-replicate table meets a
    probe side with pathological key skew that AQE's skew-join split
    (enabled in session.get_spark) cannot fix — e.g. a single key
    holding >1/32 of all rows. Replication multiplies the right side
    ×num_salts: keep the right side small or num_salts modest.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return l_salted.join(r_salted, keys + ["__salt"], how).drop("__salt")


def interval_bucket_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    dedup_keys: Sequence[str],
    cell_seconds: int = 30 * 86400,
) -> DataFrame:
    """Interval-overlap join as an equi-join on fixed-width time cells.

    The scalable rewrite of ``a.start <= b.end AND b.start <= a.end``:
    each interval explodes into the cells it covers, the join runs as a
    hash equi-join on the cell id, and the exact overlap predicate then
    prunes false positives inside the join — so the quadratic broadcast
    nested-loop the naive condition forces never happens. Overlapping
    pairs that share several cells emerge once per shared cell;
    ``dedup_keys`` names the pair identity to collapse them.

    Pick ``cell_seconds`` near the typical interval length: much smaller
    multiplies the explode fan-out, much larger degrades toward one giant
    bucket (the BNLJ again, per-cell). Output: all columns of both inputs,
    one row per overlapping pair.
    """

    def cells(start: str, end: str) -> Column:
        lo = F.floor(F.unix_timestamp(F.col(start)) / cell_seconds)
        hi = F.floor(F.unix_timestamp(F.col(end)) / cell_seconds)
        return F.explode(F.sequence(lo, hi))

    lc = left.withColumn("__cell", cells(l_start, l_end))
    rc = right.withColumn("__cell", cells(r_start, r_end))
    joined = lc.join(rc, ["__cell"]).filter(
        (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    )
    return joined.drop("__cell").dropDuplicates(list(dedup_keys))


def dedup_keep_first(
    df: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str | Column,
    ascending: bool = True,
) -> DataFrame:
    """Keep exactly one row per key: the first by ``order_col``.

    Deterministic alternative to ``dropDuplicates`` (which keeps an
    arbitrary row). One shuffle on the key; the per-key sort is a
    min-heap of size 1 (row_number + filter fuses into TopK).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    order = order.asc() if ascending else order.desc()
    w = W.partitionBy(*keys).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def blocked_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    part_cols: Sequence[str] = (),
    n_blocks: int = 256,
    inclusive: bool = False,
) -> DataFrame:
    """Two-level partial+offset cumulative sum over a value frame.

    For each row, the sum of ``value_col`` over all rows in the same
    ``part_cols`` group with a strictly smaller ``order_col``
    (``inclusive=True`` adds the row's own value) — WITHOUT running a
    single-task WindowExec over the whole frame. The classic
    ``sum().over(Window.partitionBy(g).orderBy(v))`` puts every row of
    a group through ONE task; fine for small per-group frames, a
    straggler at 100 TB when a group's distinct-value frame reaches
    hundreds of millions of rows.

    The two-level scan instead:

    1. blocks rows by a monotonic range split of ``order_col``
       (``blk = floor((v - min) / width)`` — order-preserving, so
       block k's rows all precede block k+1's);
    2. runs the within-block cumsum with ``blk`` IN the window
       partition spec — parallel across ``groups x n_blocks`` tasks;
    3. aggregates per-block totals (``groups x n_blocks`` rows, tiny),
       scans THOSE for per-block offsets (the only group-wide window,
       bounded by ``n_blocks`` rows per group, never frame-sized);
    4. broadcast-joins offsets back: ``cumsum = within + offset``.

    ``order_col`` must be integral (the range split does integer
    arithmetic) and distinct within its group — the op targets
    per-(group, value) aggregate frames (rank statistics, ECDFs,
    Lorenz-style cumulative shares), where that holds by construction.
    Skewed value distributions only unbalance block SIZES, never
    correctness; ``n_blocks`` trades split granularity vs offset-frame
    size.
    """
    parts = list(part_cols)
    bounds = df.agg(
        F.min(order_col).cast("long").alias("__lo"),
        F.max(order_col).cast("long").alias("__hi"),
    )
    width = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.col("__hi") - F.col("__lo") + 1) / F.lit(n_blocks)).cast("long"),
    )
    blocked = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__blk", F.floor((F.col(order_col) - F.col("__lo")) / width))
        .drop("__lo", "__hi")
    )
    upper = 0 if inclusive else -1
    w_in = (
        W.partitionBy(*parts, "__blk")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, upper)
    )
    within = blocked.withColumn(
        "__within", F.coalesce(F.sum(value_col).over(w_in), F.lit(0)).cast("long")
    )
    w_off = W.partitionBy(*parts).orderBy("__blk").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        blocked.groupBy(*parts, "__blk")
        .agg(F.sum(value_col).cast("long").alias("__bt"))
        .select(
            *parts,
            "__blk",
            F.coalesce(F.sum("__bt").over(w_off), F.lit(0)).cast("long").alias("__off"),
        )
    )
    return (
        within.join(F.broadcast(offsets), parts + ["__blk"])
        .withColumn(out_col, (F.col("__within") + F.col("__off")).cast("long"))
        .drop("__blk", "__within", "__off")
    )


def blocked_row_number(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    out_col: str,
    part_cols: Sequence[str] = (),
    n_blocks: int = 256,
    descending: bool = False,
) -> DataFrame:
    """Global (or per-group) 1-based row_number over the total order
    (``order_col`` [``descending``], ``tiebreak_col`` asc) without a
    single-task whole-frame sort.

    The classic ``row_number().over(Window.orderBy(...))`` funnels every
    row through ONE task. Here the rank decomposes exactly:

        rank(row) = #rows with a strictly smaller order value
                    + rank among the row's own value ties

    The first term is :func:`blocked_cumsum` of per-value counts over
    the distinct-value frame (fully parallel two-level scan); the
    second is a window PARTITIONED BY the order value — as parallel as
    the value distribution, bounded by the largest tie group, never the
    frame. ``order_col`` must be integral (cumsum's range split).
    """
    parts = list(part_cols)
    key = (-F.col(order_col)) if descending else F.col(order_col)
    tmp = df.withColumn("__k", key.cast("long"))
    pv = tmp.groupBy(*parts, "__k").agg(F.count("*").cast("long").alias("__c"))
    cum = blocked_cumsum(
        pv, "__k", "__c", "__below", part_cols=parts, n_blocks=n_blocks
    )
    w = W.partitionBy(*parts, "__k").orderBy(tiebreak_col)
    return (
        tmp.join(cum.select(*parts, "__k", "__below"), parts + ["__k"])
        .withColumn(out_col, (F.col("__below") + F.row_number().over(w)).cast("long"))
        .drop("__k", "__below", "__c")
    )


def blocked_ordered_cumsum(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    value_col: str,
    out_col: str,
    part_cols: Sequence[str] = (),
    n_blocks: int = 256,
    descending: bool = False,
    inclusive: bool = True,
) -> DataFrame:
    """Cumulative sum of ``value_col`` over the TOTAL order
    (``order_col`` [``descending``], ``tiebreak_col`` asc) without a
    single-task whole-frame window — the running-total twin of
    :func:`blocked_row_number` (Lorenz / Pareto curves, cumulative
    revenue shares, crossing-rank reports).

    Decomposes exactly like the rank:

        cum(row) = sum(value) over rows with a strictly smaller order
                   key + running sum within the row's own tie group

    The first term is :func:`blocked_cumsum` of per-key value sums over
    the distinct-key frame (two-level parallel scan); the second is a
    window PARTITIONED BY the order key — bounded by the largest tie
    group, never the frame. ``order_col`` must be integral.
    """
    parts = list(part_cols)
    key = (-F.col(order_col)) if descending else F.col(order_col)
    tmp = df.withColumn("__k", key.cast("long"))
    pv = tmp.groupBy(*parts, "__k").agg(
        F.sum(value_col).cast("long").alias("__vs")
    )
    below = blocked_cumsum(
        pv, "__k", "__vs", "__below", part_cols=parts, n_blocks=n_blocks
    )
    upper = 0 if inclusive else -1
    w_tie = (
        W.partitionBy(*parts, "__k")
        .orderBy(tiebreak_col)
        .rowsBetween(W.unboundedPreceding, upper)
    )
    return (
        tmp.join(below.select(*parts, "__k", "__below"), parts + ["__k"])
        .withColumn(
            out_col,
            (
                F.col("__below")
                + F.coalesce(F.sum(value_col).over(w_tie), F.lit(0))
            ).cast("long"),
        )
        .drop("__k", "__below", "__vs")
    )


def blocked_ntile(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    n: int,
    out_col: str,
    n_blocks: int = 256,
    descending: bool = False,
) -> DataFrame:
    """``ntile(n)`` over a GLOBAL total order without the global sort.

    ntile is a closed-form function of the global row number: with N
    rows, the first N % n tiles take ceil(N/n) rows and the rest take
    floor(N/n) (front-first remainder — Spark's and DuckDB's shared
    rule). Rank comes from :func:`blocked_row_number`; N attaches as a
    1-row broadcast. The order (``order_col``, ``tiebreak_col``) must
    be a total order (ntile on a tied, underspecified order is
    nondeterministic in ANY engine — this op just makes that contract
    explicit).
    """
    ranked = blocked_row_number(
        df, order_col, tiebreak_col, "__r",
        n_blocks=n_blocks, descending=descending,
    )
    tot = df.agg(F.count("*").cast("long").alias("__N"))
    q = F.floor(F.col("__N") / n).cast("long")
    rem = (F.col("__N") % n).cast("long")
    big = q + 1  # rows per tile in the first (N % n) tiles
    r = F.col("__r")
    # exact integer ceil-divisions; longs stay < 2^53 so the double
    # division underneath floor() is exact
    bucket = F.when(r <= big * rem, F.floor((r + big - 1) / big)).otherwise(
        rem + F.floor((r - big * rem + q - 1) / q)
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(out_col, bucket.cast("long"))
        .drop("__r", "__N")
    )


def hw_additive_step(acc: Column, x: Column) -> Column:
    """One Holt-Winters additive smoothing step (alpha=1/2, beta=1/4,
    gamma=1/2, season m=12) on a 14-double state array
    ``[l, b, s_0..s_11]``; ``x`` is ``[y, slot]`` with slot in 0..11.

    Shared by the batch fold (q42l) and its streaming twin (qm21) so
    both execute the IDENTICAL IEEE op sequence — the equivalence that
    lets the batch oracle hash-check the streaming result. The updated
    seasonal slot splices back via computed-index slice/concat
    (1-based, mirroring DuckDB's list_slice in the oracle).
    """
    i = F.element_at(x, 2).cast("int")
    y = F.element_at(x, 1)
    s_old = F.element_at(acc, i + 3)
    l_old = F.element_at(acc, 1)
    b_old = F.element_at(acc, 2)
    l_new = (y - s_old) / 2 + (l_old + b_old) / 2
    b_new = (l_new - l_old) / 4 + 3 * b_old / 4
    s_new = (y - l_new) / 2 + s_old / 2
    return F.concat(
        F.concat(F.array(l_new, b_new), F.slice(acc, 3, i)),
        F.concat(F.array(s_new), F.slice(acc, i + 4, 11 - i)),
    )


def kalman_cv_step(acc: Column, x: Column) -> Column:
    """One constant-velocity Kalman predict+update step on a 5-double
    state array ``[level, velocity, p11, p12, p22]``; ``x`` is the
    scalar observation. Model constants are dyadic (Q=diag(1/16,1/16),
    R=4) and the op sequence is pinned, so the batch fold (q42n) and
    its streaming twin (qm22) produce bit-identical states — the same
    shared-step equivalence hw_additive_step provides for q42l/qm21.
    Nested singleton-array transforms act as let-bindings for the
    predicted covariance and the gain pair.
    """

    pred = F.array(
        F.element_at(acc, 1) + F.element_at(acc, 2),
        F.element_at(acc, 2),
        F.element_at(acc, 3)
        + 2 * F.element_at(acc, 4)
        + F.element_at(acc, 5)
        + 0.0625,
        F.element_at(acc, 4) + F.element_at(acc, 5),
        F.element_at(acc, 5) + 0.0625,
    )

    def upd(a):
        gains = F.array(
            F.element_at(a, 3) / (F.element_at(a, 3) + 4),
            F.element_at(a, 4) / (F.element_at(a, 3) + 4),
        )

        def fin(k):
            innov = x - F.element_at(a, 1)
            return F.array(
                F.element_at(a, 1) + F.element_at(k, 1) * innov,
                F.element_at(a, 2) + F.element_at(k, 2) * innov,
                (1 - F.element_at(k, 1)) * F.element_at(a, 3),
                (1 - F.element_at(k, 1)) * F.element_at(a, 4),
                F.element_at(a, 5)
                - F.element_at(k, 2) * F.element_at(a, 4),
            )

        return F.element_at(F.transform(F.array(gains), fin), 1)

    return F.element_at(F.transform(F.array(pred), upd), 1)


def page_hinkley_step(acc: Column, x: Column) -> Column:
    """One PAGE-HINKLEY drift-detection step on a 5-double state array
    ``[t, sum, m, m_min, first_alarm_t]``; ``x`` is the scalar
    observation. Constants are pinned (delta=0.0625 dyadic drift
    allowance, lambda=2.0 alarm threshold); the cumulative deviation
    m_t = sum(x_i - mean_i - delta) uses the RUNNING mean, so the
    recurrence is order-sensitive and the op sequence is pinned for
    the batch fold (q42o) / streaming twin (qm23) bit-equivalence the
    hw_additive_step / kalman_cv_step pairs established. Singleton
    transforms are the let-bindings for (t', sum') and m'.
    """

    pair = F.array(F.element_at(acc, 1) + 1, F.element_at(acc, 2) + x)

    def upd(p):
        t_new = F.element_at(p, 1)
        s_new = F.element_at(p, 2)
        m_expr = F.element_at(acc, 3) + x - s_new / t_new - 0.0625

        def fin(mm):
            m_new = F.element_at(mm, 1)
            mmin_new = F.least(F.element_at(acc, 4), m_new)
            return F.array(
                t_new,
                s_new,
                m_new,
                mmin_new,
                F.when(
                    (F.element_at(acc, 5) < 0)
                    & (m_new - mmin_new > 2.0),
                    t_new,
                ).otherwise(F.element_at(acc, 5)),
            )

        return F.element_at(F.transform(F.array(F.array(m_expr)), fin), 1)

    return F.element_at(F.transform(F.array(pair), upd), 1)


def croston_step(acc: Column, x: Column) -> Column:
    """One CROSTON intermittent-demand step on a 4-double state array
    ``[z_level, q_interval, periods_since, init]``; ``x`` is the
    scalar demand. Dyadic alpha=1/2 on both the demand-size and the
    inter-demand-interval smoothers; zero periods only bump the
    counter; the first demand seeds. Shared by the batch fold (q42p)
    and its streaming twin (qm24) so both execute the identical IEEE
    op sequence — the hw_additive_step / kalman_cv_step /
    page_hinkley_step equivalence contract."""
    return (
        F.when(
            x == 0,
            F.array(
                F.element_at(acc, 1),
                F.element_at(acc, 2),
                F.element_at(acc, 3) + 1,
                F.element_at(acc, 4),
            ),
        )
        .when(
            F.element_at(acc, 4) == 0,
            F.array(x, F.element_at(acc, 3), F.lit(1.0), F.lit(1.0)),
        )
        .otherwise(
            F.array(
                F.element_at(acc, 1) / 2 + x / 2,
                F.element_at(acc, 2) / 2 + F.element_at(acc, 3) / 2,
                F.lit(1.0),
                F.lit(1.0),
            )
        )
    )
