"""Property-based tests (hypothesis) for composite operators.

Goes beyond the reference's table-driven style (SURVEY §5.1 notes it has no
property testing): random inputs against independent reference
implementations — pandas merge_asof for the as-of join, a brute-force
Python Jaccard for the candidate-verification kernel.

Spark round-trips are expensive, so examples are few but each is a full
randomized scenario; deadline is disabled (JVM warmup skews timing).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, assume, given, settings, strategies as st
from pyspark.sql import functions as F

from better_cdc_spark import llmops
from better_cdc_spark import operators as ops

KEYS = ["a", "b", "c"]

event_lists = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 50), st.integers(0, 999)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left_rows=event_lists, right_rows=event_lists)
def test_asof_join_agrees_with_pandas_merge_asof(spark, left_rows, right_rows):
    # de-dup (key, t) so the as-of winner is well-defined on both engines
    left_rows = list({(k, t): (k, t, v) for k, t, v in left_rows}.values())
    right_rows = list({(k, t): (k, t, v) for k, t, v in right_rows}.values())

    left = spark.createDataFrame(left_rows, "k string, t long, lv long")
    right = spark.createDataFrame(right_rows, "k string, t long, rv long")
    got = {
        (r.k, r.t, r.lv, r.asof_t, r.asof_rv)
        for r in ops.asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "t", "lv"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "rv"]).sort_values("t")
    rp["rt"] = rp["t"]
    exp = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    exp = exp.dropna(subset=["rv"])
    expected = {
        (r.k, int(r.t), int(r.lv), int(r.rt), int(r.rv)) for r in exp.itertuples()
    }
    assert got == expected


def _py_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


texts = st.lists(
    st.text(alphabet="ab ", min_size=5, max_size=40).map(
        lambda s: " ".join(s.split()) or "a a a"
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_txt=texts)
def test_jaccard_for_pairs_matches_python(spark, docs_txt):
    rows = [(i, t) for i, t in enumerate(docs_txt) if len(t.split(" ")) >= 3]
    assume(len(rows) >= 2)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = llmops.shingle_postings(docs, "doc_id")
    pairs = spark.createDataFrame(
        [(a, b) for a, _ in rows for b, _ in rows if a < b], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in llmops.jaccard_for_pairs(postings, pairs, "doc_id").collect()
    }
    txt = dict(rows)
    for (a, b), jac in got.items():
        assert jac == pytest.approx(_py_jaccard(txt[a], txt[b]), abs=1e-6)
    # pairs with zero intersection are absent from the output by design
    for a, _ in rows:
        for b, _ in rows:
            if a < b and (a, b) not in got:
                assert _py_jaccard(txt[a], txt[b]) == 0.0


changelogs = st.lists(
    st.tuples(
        st.integers(1, 8),                      # key
        st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
        st.integers(0, 999),                    # payload
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(log_rows=changelogs, cutoff_frac=st.floats(0.0, 1.0))
def test_snapshot_at_agrees_with_python_fold(spark, log_rows, cutoff_frac):
    """snapshot_at == sequential replay of the log up to the cutoff.

    The reference implementation is the obvious one: fold the ordered
    events into a dict, DELETE removing, anything else upserting.
    """
    from better_cdc_spark.cdc import snapshot_at

    rows = [
        (key, op, payload, seq + 1)  # seq: unique total order
        for seq, (key, op, payload) in enumerate(log_rows)
    ]
    cutoff = max(1, int(round(cutoff_frac * len(rows))))
    expected: dict[int, int] = {}
    for key, op, payload, seq in rows:
        if seq > cutoff:
            break
        if op == "DELETE":
            expected.pop(key, None)
        else:
            expected[key] = payload
    log = spark.createDataFrame(
        rows, "id long, operation string, payload long, seq long"
    )
    got = {
        (r.id, r.payload)
        for r in snapshot_at(log, "id", "seq", cutoff).select("id", "payload").collect()
    }
    assert got == set(expected.items())


merge_targets = st.lists(
    st.tuples(st.integers(1, 10), st.integers(0, 99)), min_size=0, max_size=12,
    unique_by=lambda t: t[0],
)
merge_sources = st.lists(
    st.tuples(st.integers(1, 10), st.integers(0, 99), st.booleans()),
    min_size=0, max_size=12, unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(tgt=merge_targets, src=merge_sources)
def test_merge_into_agrees_with_python_merge(spark, tgt, src):
    """merge_into == the obvious dict-based three-clause merge.

    Source rows carry a delete flag; matched+flag → delete, matched →
    update value, unmatched source → insert, untouched target passes.
    """
    target = spark.createDataFrame(tgt or [(None, None)], "id long, val long").filter(
        F.col("id").isNotNull()
    )
    source = spark.createDataFrame(
        src or [(None, None, None)], "id long, sval long, del boolean"
    ).filter(F.col("id").isNotNull())
    out = ops.merge_into(
        target,
        source,
        on="id",
        when_matched_update={"val": F.col("s.sval")},
        when_matched_delete=F.col("s.del"),
        when_not_matched_insert={"val": F.col("s.sval")},
    )
    got = {(r.id, r.val) for r in out.collect()}

    state = dict(tgt)
    for key, sval, is_del in src:
        if key in state:
            if is_del:
                del state[key]
            else:
                state[key] = sval
        else:
            state[key] = sval
    assert got == set(state.items())


interval_lists = st.lists(
    st.tuples(st.integers(0, 200), st.integers(0, 60)),  # (start_day, len_days)
    min_size=1, max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ls=interval_lists, rs=interval_lists)
def test_interval_bucket_join_agrees_with_naive(spark, ls, rs):
    """Cell decomposition finds exactly the naive overlap pairs, for any
    interval layout (spans much longer and much shorter than the cell)."""
    def frame(rows, pfx):
        data = [
            (i, f"2024-01-01 00:00:00", s, s + l)
            for i, (s, l) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            [(i, s, e) for i, _, s, e in data], f"{pfx}id long, s long, e long"
        )
        day = 86400
        return df.select(
            f"{pfx}id",
            F.timestamp_seconds(F.lit(1704067200) + F.col("s") * day).alias(f"{pfx}s"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("e") * day).alias(f"{pfx}e"),
        )

    left, right = frame(ls, "l"), frame(rs, "r")
    got = {
        (r.lid, r.rid)
        for r in ops.interval_bucket_join(
            left, right, "ls", "le", "rs", "re", dedup_keys=("lid", "rid")
        ).collect()
    }
    naive = {
        (r.lid, r.rid)
        for r in left.join(
            right, (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
        ).collect()
    }
    assert got == naive


scd2_logs = st.lists(
    st.tuples(
        st.integers(1, 5),                                  # key
        st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
        st.integers(0, 99),                                 # payload
    ),
    min_size=1, max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(log_rows=scd2_logs)
def test_scd2_history_agrees_with_python_fold(spark, log_rows):
    """scd2_history == sequential per-key versioning.

    Reference fold: each non-DELETE event opens a version valid from its
    seq until the key's next event's seq (None if last); DELETEs emit
    nothing but close the prior version; versions number 1..n per key.
    """
    from better_cdc_spark.cdc import scd2_history

    rows = [
        (key, op, payload, seq + 1)
        for seq, (key, op, payload) in enumerate(log_rows)
    ]
    expected = set()
    by_key: dict[int, list] = {}
    for key, op, payload, seq in rows:
        by_key.setdefault(key, []).append((seq, op, payload))
    for key, evts in by_key.items():
        vnum = 0
        for i, (seq, op, payload) in enumerate(evts):
            nxt = evts[i + 1][0] if i + 1 < len(evts) else None
            if op == "DELETE":
                continue
            vnum += 1
            expected.add((key, payload, seq, nxt, vnum, nxt is None))
    log = spark.createDataFrame(
        rows, "id long, operation string, payload long, seq long"
    )
    got = {
        (r.id, r.payload, r.seq, r.valid_to, r.version, r.is_current)
        for r in scd2_history(log, keys="id", order_col="seq").collect()
    }
    assert got == expected
