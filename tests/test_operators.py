"""Unit tests for the reusable composite operators (better_cdc_spark.operators)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from better_cdc_spark import operators as ops


def test_asof_join_matches_pandas_merge_asof(spark):
    left = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 25, 2.0), ("a", 5, 3.0), ("b", 10, 4.0), ("c", 10, 5.0)],
        "k string, t long, lv double",
    )
    right = spark.createDataFrame(
        [("a", 10, "x"), ("a", 20, "y"), ("b", 1, "z"), ("d", 1, "w")],
        "k string, t long, rv string",
    )
    out = (
        ops.asof_join(left, right, on="k", left_ts="t", right_ts="t")
        .orderBy("k", "t")
        .collect()
    )
    got = [(r.k, r.t, r.lv, r.asof_t, r.asof_rv) for r in out]
    lp = pd.DataFrame(
        {"k": ["a", "a", "a", "b", "c"], "t": [10, 25, 5, 10, 10], "lv": [1.0, 2.0, 3.0, 4.0, 5.0]}
    ).sort_values("t")
    rp = pd.DataFrame({"k": ["a", "a", "b", "d"], "t": [10, 20, 1, 1], "rv": ["x", "y", "z", "w"]}).sort_values("t")
    rp["rt"] = rp["t"]
    exp_pdf = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    exp_pdf = exp_pdf.dropna(subset=["rv"]).sort_values(["k", "t"])
    expected = [
        (r.k, int(r.t), r.lv, int(r.rt), r.rv) for r in exp_pdf.itertuples()
    ]
    assert got == expected
    # inclusive bound: left t=10 matched right t=10 ('x'), not dropped
    assert ("a", 10, 1.0, 10, "x") in got
    # 'c' has no right rows → dropped (inner as-of); 'd' right-only → absent
    assert all(r[0] != "c" for r in got)


def test_asof_join_tie_takes_row_at_same_instant(spark):
    left = spark.createDataFrame([("a", 10, 1.0)], "k string, t long, lv double")
    right = spark.createDataFrame([("a", 10, "same")], "k string, t long, rv string")
    out = ops.asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()
    assert len(out) == 1 and out[0].asof_rv == "same"


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i, float(i)) for i in range(10)] + [("g2", i, float(-i)) for i in range(3)],
        "g string, id int, score double",
    )
    top = ops.topk_per_group(df, "g", F.struct(F.col("score"), F.col("id")), k=2)
    got = {(r.g, r.id) for r in top.collect()}
    assert got == {("g1", 9), ("g1", 8), ("g2", 0), ("g2", 1)}


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], "k int, v int"
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (5, "e")], "k int, name string")
    plain = {(r.k, r.v, r.name) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.v, r.name) for r in ops.salted_join(left, right, "k", num_salts=4).collect()}
    assert salted == plain

    plain_l = {
        (r.k, r.v, r.name) for r in left.join(right, "k", "left").collect()
    }
    salted_l = {
        (r.k, r.v, r.name)
        for r in ops.salted_join(left, right, "k", num_salts=4, how="left").collect()
    }
    assert salted_l == plain_l


def test_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [("k1", 3, "c"), ("k1", 1, "a"), ("k1", 2, "b"), ("k2", 9, "z")],
        "k string, ord int, val string",
    )
    out = {(r.k, r.val) for r in ops.dedup_keep_first(df, "k", "ord").collect()}
    assert out == {("k1", "a"), ("k2", "z")}
    out_desc = {
        (r.k, r.val)
        for r in ops.dedup_keep_first(df, "k", "ord", ascending=False).collect()
    }
    assert out_desc == {("k1", "c"), ("k2", "z")}


def test_asof_join_null_payloads_stay_row_consistent(spark):
    """Null right payload cells must neither drop the match nor mix rows.

    Regression (ADVICE r1): per-column last(ignorenulls) carried each
    payload column independently, so nulls pulled values from OLDER right
    rows, and a null in the anchor column dropped a genuinely matched left
    row. The struct carry keeps merge_asof semantics.
    """
    left = spark.createDataFrame(
        [("a", 15, 1.0), ("a", 25, 2.0)], "k string, t long, lv double"
    )
    right = spark.createDataFrame(
        [("a", 10, None, "A10"), ("a", 20, "B20", None)],
        "k string, t long, rv1 string, rv2 string",
    )
    out = ops.asof_join(left, right, on="k", left_ts="t", right_ts="t")
    got = {(r.t, r.asof_rv1, r.asof_rv2) for r in out.collect()}
    # t=15 matches the t=10 row even though rv1 (the would-be anchor) is
    # null; t=25 matches the t=20 row and must NOT inherit rv2 from t=10.
    assert got == {(15, None, "A10"), (25, "B20", None)}


def test_asof_join_all_null_payload_row_still_matches(spark):
    left = spark.createDataFrame([("a", 15, 1.0)], "k string, t long, lv double")
    right = spark.createDataFrame([("a", 10, None)], "k string, t long, rv string")
    out = ops.asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()
    assert len(out) == 1
    assert out[0].asof_t == 10 and out[0].asof_rv is None


class TestMergeInto:
    def _tables(self, spark):
        target = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, name string, bal double",
        )
        source = spark.createDataFrame(
            [(2, 5.0, False), (3, 0.0, True), (9, 7.0, False)],
            "id long, delta double, kill boolean",
        )
        return target, source

    def test_all_three_clauses(self, spark):
        target, source = self._tables(spark)
        out = ops.merge_into(
            target,
            source,
            on="id",
            when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
            when_matched_delete=F.col("s.kill"),
            when_not_matched_insert={"name": F.lit("new"), "bal": F.col("s.delta")},
        )
        got = {(r.id, r.name, r.bal) for r in out.collect()}
        # 1 untouched, 2 updated, 3 deleted, 9 inserted
        assert got == {(1, "a", 10.0), (2, "b", 25.0), (9, "new", 7.0)}
        assert out.columns == target.columns

    def test_insert_by_name_null_fills_missing(self, spark):
        target, source = self._tables(spark)
        out = ops.merge_into(target, source, on="id", when_not_matched_insert=True)
        row9 = out.filter(F.col("id") == 9).collect()[0]
        assert row9.name is None and row9.bal is None  # not in source by name
        assert out.count() == 4

    def test_no_insert_drops_unmatched_source(self, spark):
        target, source = self._tables(spark)
        out = ops.merge_into(
            target, source, on="id",
            when_matched_update={"bal": F.col("s.delta")},
        )
        assert {r.id for r in out.collect()} == {1, 2, 3}
        # no insert clause → planner may use a plain left join (no full outer)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "FullOuter" not in plan


def test_scd2_history_versions_and_deletes(spark):
    from better_cdc_spark.cdc import scd2_history

    changes = spark.createDataFrame(
        [
            # key 1: I@1 → U@3 → D@5  (two closed versions, none current)
            (1, "v1", "INSERT", 1),
            (1, "v2", "UPDATE", 3),
            (1, None, "DELETE", 5),
            # key 2: I@2 → U@4        (one closed, one current)
            (2, "w1", "INSERT", 2),
            (2, "w2", "UPDATE", 4),
            # key 3: lone DELETE      (no versions at all)
            (3, None, "DELETE", 7),
        ],
        "id long, val string, operation string, seq long",
    )
    out = scd2_history(changes, keys="id", order_col="seq")
    got = {
        (r.id, r.val, r.seq, r.valid_to, r.version, r.is_current)
        for r in out.collect()
    }
    assert got == {
        (1, "v1", 1, 3, 1, False),
        (1, "v2", 3, 5, 2, False),
        (2, "w1", 2, 4, 1, False),
        (2, "w2", 4, None, 2, True),
    }


def test_scd2_history_single_shuffle(spark):
    from better_cdc_spark.cdc import scd2_history

    changes = spark.createDataFrame(
        [(1, "a", "INSERT", 1)], "id long, val string, operation string, seq long"
    )
    plan = (
        scd2_history(changes, keys="id", order_col="seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both windows share one exchange: the lead() and renumber sorts reuse it
    assert plan.count("Exchange") == 1


def test_interval_bucket_join_matches_naive(spark):
    """Cell decomposition == naive overlap join, incl. multi-cell spans."""
    from better_cdc_spark.operators import interval_bucket_join

    left = spark.createDataFrame(
        [(1, "2024-01-01", "2024-03-15"),   # spans 3 monthly cells
         (2, "2024-06-01", "2024-06-02"),   # no partner overlaps
         (3, "2024-02-01", "2024-02-05")],
        "lid long, ls string, le string",
    ).select("lid", F.col("ls").cast("timestamp").alias("ls"),
             F.col("le").cast("timestamp").alias("le"))
    right = spark.createDataFrame(
        [(10, "2024-03-10", "2024-04-01"),  # overlaps 1 only
         (11, "2024-01-20", "2024-02-02"),  # overlaps 1 and 3
         (12, "2024-09-01", "2024-09-09")], # overlaps none
        "rid long, rs string, re string",
    ).select("rid", F.col("rs").cast("timestamp").alias("rs"),
             F.col("re").cast("timestamp").alias("re"))
    got = {
        (r.lid, r.rid)
        for r in interval_bucket_join(
            left, right, "ls", "le", "rs", "re", dedup_keys=("lid", "rid")
        ).collect()
    }
    naive = {
        (r.lid, r.rid)
        for r in left.join(
            right, (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
        ).collect()
    }
    assert got == naive == {(1, 10), (1, 11), (3, 11)}


def test_snapshot_at_cutoffs(spark):
    """Replay to successive cutoffs walks the table through its history."""
    from better_cdc_spark.cdc import snapshot_at

    log = spark.createDataFrame(
        [(1, "a1", "INSERT", 1),
         (2, "b1", "INSERT", 1),
         (1, "a2", "UPDATE", 2),
         (2, None, "DELETE", 3),
         (3, "c1", "INSERT", 3)],
        "id long, val string, operation string, seq long",
    )
    def state(cutoff):
        return {
            (r.id, r.val)
            for r in snapshot_at(log, "id", "seq", cutoff).select("id", "val").collect()
        }
    assert state(1) == {(1, "a1"), (2, "b1")}
    assert state(2) == {(1, "a2"), (2, "b1")}
    assert state(3) == {(1, "a2"), (3, "c1")}


def test_q36f_approx_quantiles_within_bound(spark):
    from better_cdc_spark.queries import load_all
    from tests.conftest import SF_SMOKE

    rows = load_all()["q36f_approx_quantiles"].fn(spark, SF_SMOKE).collect()
    assert rows and all(r["within_bound"] for r in rows), rows


def test_asof_forward_tolerance_edges(spark):
    """Forward as-of: equal instants match (inclusive >=), the EARLIEST
    following right row wins, and tolerance drops matches beyond it."""
    import pandas as pd
    from pyspark.sql import functions as F
    from better_cdc_spark.operators import asof_join

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2, 3], "lt": [10, 40, 10, 10], "lv": ["a", "b", "c", "d"]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2, 3], "rt": [10, 20, 100, 5], "rv": ["x", "y", "z", "w"]})
    )
    out = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        direction="forward", tolerance=F.lit(15),
    ).select("k", "lt", "asof_rt", "asof_rv")
    got = {(r["k"], r["lt"]): (r["asof_rt"], r["asof_rv"]) for r in out.collect()}
    # (1,10): rt=10 equal instant matches (not rt=20 — earliest wins)
    # (1,40): nothing follows within 15 → dropped
    # (2,10): rt=100 is 90 away → dropped by tolerance
    # (3,10): rt=5 precedes → no forward match
    assert got == {(1, 10): (10, "x")}
    # without tolerance, (1,40)->nothing (no later row), (2,10)->100
    out2 = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt", direction="forward"
    ).select("k", "lt", "asof_rt")
    got2 = {(r["k"], r["lt"]): r["asof_rt"] for r in out2.collect()}
    assert got2 == {(1, 10): 10, (2, 10): 100}


def test_hll_sketch_union_within_bound(spark):
    """q36g: the union of per-group HLL sketches estimates the global
    distinct within the 5%% bound (lgK=12 → ~1.6%% std error)."""
    from better_cdc_spark.queries import load_all
    from tests.conftest import SF_SMOKE

    row = load_all()["q36g_hll_sketch_union"].fn(spark, SF_SMOKE).collect()[0]
    assert row["within_bound"], (row["estimate"], row["exact"])
    assert abs(row["estimate"] - row["exact"]) / row["exact"] <= 0.05


def test_bitmap_overlap_matches_bruteforce(spark):
    """q48's chunked-bitmap intersection equals the set-intersection it
    encodes, including ids on 63-bit word boundaries (62, 63, 126)."""
    from better_cdc_spark.queries.relational import q48_bitmap_overlap
    import itertools

    rows = [("s1", i) for i in [0, 5, 62, 63, 126, 200]] + [
        ("s2", i) for i in [5, 62, 64, 126, 300]
    ] + [("s3", i) for i in [0, 300]]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, None, uid, seg, None, None) for i, (seg, uid) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.parquet(os.path.join(d, "events.parquet"))
        got = {
            (r.seg_a, r.seg_b): (r.n_common, r.size_a, r.size_b, r.n_union)
            for r in q48_bitmap_overlap(spark, d).collect()
        }
    sets = {}
    for seg, uid in rows:
        sets.setdefault(seg, set()).add(uid)
    for a, b in itertools.combinations(sorted(sets), 2):
        exp = (
            len(sets[a] & sets[b]), len(sets[a]), len(sets[b]),
            len(sets[a] | sets[b]),
        )
        assert got[(a, b)] == exp, (a, b, got[(a, b)], exp)


def test_weighted_sample_is_deterministic_and_k_per_stratum(spark):
    from better_cdc_spark.queries.relational import q52b_weighted_sample
    from tests.conftest import SF_SMOKE

    a = q52b_weighted_sample(spark, SF_SMOKE).toPandas()
    b = q52b_weighted_sample(spark, SF_SMOKE).toPandas()
    key = lambda p: sorted(map(tuple, p[["c_mktsegment", "rk", "o_orderkey"]].values.tolist()))
    assert key(a) == key(b)
    per = a.groupby("c_mktsegment").rk.agg(["min", "max", "count"])
    assert (per["min"] == 1).all() and (per["max"] == per["count"]).all()
    assert (per["count"] <= 10).all()


def test_kmv_sketch_estimates_track_exact_bitmap_counts(spark):
    """q49's KMV intersection estimate stays within sketch error of the
    exact q48 bitmap counts (k=64 -> ~12.5% std error; assert 3 sigma)."""
    from better_cdc_spark.queries.relational import (
        q48_bitmap_overlap,
        q49_kmv_sketch_overlap,
    )
    from tests.conftest import SF_SMOKE

    exact = {
        (r.seg_a, r.seg_b): r.n_common
        for r in q48_bitmap_overlap(spark, SF_SMOKE).collect()
    }
    est = {
        (r.seg_a, r.seg_b): r.est_common
        for r in q49_kmv_sketch_overlap(spark, SF_SMOKE).collect()
    }
    assert set(est) == set(exact)
    for pair, e in est.items():
        n = exact[pair]
        assert abs(e - n) <= max(0.375 * n, 8), (pair, e, n)


def test_lttb_downsample_optimality_invariant(spark):
    """Post-hoc verification of q45d: endpoints preserved, points
    monotonic in time, one per bucket, and — the LTTB contract — each
    interior selection maximizes triangle area against the ACTUAL
    previous selection and next-bucket centroid, re-checked directly
    over the raw series (an independent scan of the candidate bucket,
    not a second run of the kernel)."""
    import numpy as np

    from better_cdc_spark.io import load_table
    from better_cdc_spark.queries import load_all
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    out = (
        load_all()["q45d_lttb_downsample"].fn(spark, SF_SMOKE).toPandas()
        .sort_values(["event_type", "pos"])
    )
    raw = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.unix_millis("ts").alias("x"),
            F.round(F.col("value") * 1000, 0).cast("long").alias("y"),
            "event_id",
        )
        .toPandas()
        .sort_values(["event_type", "x", "event_id"], kind="mergesort")
    )
    n_out = 20
    for et, sel in out.groupby("event_type"):
        series = raw[raw.event_type == et].reset_index(drop=True)
        n = len(series)
        xs, ys = series["x"].to_numpy(), series["y"].to_numpy()
        sx, sy = sel["x"].to_numpy(), sel["y"].to_numpy()
        assert (np.diff(sx) >= 0).all()
        assert (sx[0], sy[0]) == (xs[0], ys[0])
        assert (sx[-1], sy[-1]) == (xs[-1], ys[-1])
        if n <= n_out:
            assert len(sel) == n
            continue
        assert len(sel) == n_out
        edges = [1 + (i * (n - 2)) // (n_out - 2) for i in range(n_out - 1)]
        # map each interior selection back to its raw index
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            cand = np.where(
                (xs[lo:hi] == sx[b + 1]) & (ys[lo:hi] == sy[b + 1])
            )[0]
            assert cand.size >= 1, f"selection {b+1} not inside its bucket"
            nlo, nhi = (edges[b + 1], edges[b + 2]) if b < n_out - 3 else (n - 1, n)
            cx2 = int(xs[nlo:nhi].sum()) * 2 // (nhi - nlo)
            cy2 = int(ys[nlo:nhi].sum()) * 2 // (nhi - nlo)
            px, py = int(sx[b]), int(sy[b])
            areas = [
                abs((px * 2 - cx2) * (int(ys[i]) - py) - (px - int(xs[i])) * (cy2 - py * 2))
                for i in range(lo, hi)
            ]
            got = abs(
                (px * 2 - cx2) * (int(sy[b + 1]) - py)
                - (px - int(sx[b + 1])) * (cy2 - py * 2)
            )
            assert got == max(areas), f"bucket {b}: {got} < {max(areas)}"


def _classic_cumsum(rows, parts, inclusive):
    # reference: per-group ordered prefix sum in plain python
    out = {}
    groups = {}
    for g, v, c in rows:
        groups.setdefault(g, []).append((v, c))
    for g, vs in groups.items():
        acc = 0
        for v, c in sorted(vs):
            out[(g, v)] = acc + (c if inclusive else 0)
            acc += c
    return out


def test_blocked_cumsum_matches_classic_window(spark):
    import random

    rng = random.Random(7)
    rows = []
    for g in ("a", "b", "c"):
        # distinct values per group, deliberately skewed + negative
        vals = rng.sample(range(-500, 4000), 200)
        rows += [(g, v, rng.randint(1, 9)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long, c long")
    for inclusive in (False, True):
        got = {
            (r.g, r.v): r.below
            for r in ops.blocked_cumsum(
                df, "v", "c", "below", part_cols=("g",),
                n_blocks=16, inclusive=inclusive,
            ).collect()
        }
        assert got == _classic_cumsum(rows, ("g",), inclusive)


def test_blocked_cumsum_degenerate_single_block(spark):
    # all values inside one block width; n_blocks larger than the span
    df = spark.createDataFrame(
        [("x", 1, 5), ("x", 2, 7), ("x", 3, 11)], "g string, v long, c long"
    )
    got = {
        r.v: r.below
        for r in ops.blocked_cumsum(
            df, "v", "c", "below", part_cols=("g",), n_blocks=1024
        ).collect()
    }
    assert got == {1: 0, 2: 5, 3: 12}


def test_blocked_cumsum_no_partition_cols(spark):
    df = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "v long, c long")
    got = {r.v: r.below for r in ops.blocked_cumsum(df, "v", "c", "below").collect()}
    assert got == {10: 0, 20: 1, 30: 3}


def _classic_ordered_cumsum(rows, descending, inclusive):
    # reference: running total over the (key [desc], tiebreak asc) order
    order = sorted(rows, key=lambda r: (-r[0] if descending else r[0], r[1]))
    out, acc = {}, 0
    for k, tb, v in order:
        out[(k, tb)] = acc + (v if inclusive else 0)
        acc += v
    return out


def test_blocked_ordered_cumsum_matches_classic_window(spark):
    import random

    rng = random.Random(11)
    # duplicate keys on purpose: tie groups of size 1-6 with varying values
    rows = []
    tb = 0
    for k in rng.sample(range(-300, 900), 120):
        for _ in range(rng.randint(1, 6)):
            rows.append((k, tb, rng.randint(-5, 50)))
            tb += 1
    df = spark.createDataFrame(rows, "k long, tb long, v long")
    for descending in (False, True):
        for inclusive in (True, False):
            got = {
                (r.k, r.tb): r.cum
                for r in ops.blocked_ordered_cumsum(
                    df, "k", "tb", "v", "cum",
                    n_blocks=8, descending=descending, inclusive=inclusive,
                ).collect()
            }
            assert got == _classic_ordered_cumsum(rows, descending, inclusive)


def test_blocked_ordered_cumsum_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 0, 10), ("a", 1, 1, 20), ("a", 2, 2, 5),
         ("b", 1, 3, 7), ("b", 3, 4, 1)],
        "g string, k long, tb long, v long",
    )
    got = {
        (r.g, r.tb): r.cum
        for r in ops.blocked_ordered_cumsum(
            df, "k", "tb", "v", "cum", part_cols=("g",), n_blocks=4
        ).collect()
    }
    assert got == {("a", 0): 10, ("a", 1): 30, ("a", 2): 35,
                   ("b", 3): 7, ("b", 4): 8}
