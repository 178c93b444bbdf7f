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
