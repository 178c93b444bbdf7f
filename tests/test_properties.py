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
@pytest.mark.slow  # full-tier: `make test-full` (r16 two-tier split)
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


words_st = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x"]), min_size=1, max_size=40
)
docs_st = st.lists(words_st, min_size=1, max_size=12)


def _py_chunk_dedup(texts: list[str], width: int = 10):
    """Reference fold: global first-occurrence chunk retention in
    (doc_id, chunk_idx) order, then per-doc reassembly."""
    seen = {}
    for doc_id, text in enumerate(texts):
        w = text.split(" ")
        for ci in range((len(w) + width - 1) // width):
            chunk = " ".join(w[ci * width : (ci + 1) * width])
            if chunk not in seen or (doc_id, ci) < seen[chunk]:
                seen[chunk] = (doc_id, ci)
    kept = {}
    for chunk, (doc_id, ci) in seen.items():
        kept.setdefault(doc_id, []).append((ci, chunk))
    return {
        d: " ".join(c for _, c in sorted(pairs)) for d, pairs in kept.items()
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(doc_words=docs_st)
def test_chunk_dedup_agrees_with_python_fold(spark, doc_words):
    """q95e's core: Spark chunk dedup == the sequential reference fold on
    random corpora (including all-duplicate and single-word docs)."""
    from pyspark.sql import Window as W

    texts = [" ".join(ws) for ws in doc_words]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(10.0)).cast("int")
    chunked = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(" ", F.slice(words, i * 10 + 1, 10)),
            )
        ).alias("chunk_idx", "chunk"),
    )
    w = W.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    kept = (
        chunked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                    lambda s: s.chunk,
                ),
            ).alias("cleaned")
        )
    )
    got = {r.doc_id: r.cleaned for r in kept.collect()}
    assert got == _py_chunk_dedup(texts)


funnel_events = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.sampled_from(["signup", "click", "purchase", "view"]),
        st.integers(0, 100),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=funnel_events)
@pytest.mark.slow  # full-tier: `make test-full` (r16 two-tier split)
def test_funnel_stages_agree_with_python_fold(spark, rows):
    """q47's stage gating: per-user first-touch MINs with >= gates equal a
    sequential reference fold over random event streams."""
    df = spark.createDataFrame(rows, "user_id long, event_type string, t long")
    s = df.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("t").alias("st")
    )
    c = (
        df.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("t") >= F.col("st"))
        .groupBy("user_id")
        .agg(F.min("t").alias("ct"))
    )
    p = (
        df.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("t") >= F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("t").alias("pt"))
    )
    got = (s.count(), c.count(), p.count())

    su, cu, pu = {}, {}, {}
    for u, e, t in rows:
        if e == "signup" and (u not in su or t < su[u]):
            su[u] = t
    for u, e, t in rows:
        if e == "click" and u in su and t >= su[u] and (u not in cu or t < cu[u]):
            cu[u] = t
    for u, e, t in rows:
        if e == "purchase" and u in cu and t >= cu[u] and (u not in pu or t < pu[u]):
            pu[u] = t
    assert got == (len(su), len(cu), len(pu))


op_streams = st.lists(
    st.tuples(
        st.sampled_from(KEYS),                       # key
        st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
        st.integers(0, 999),                         # payload
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(stream=op_streams, cuts=st.lists(st.integers(1, 23), max_size=4))
@pytest.mark.slow  # full-tier: `make test-full` (r16 two-tier split)
def test_scd2_increment_law_random_streams(spark, stream, cuts):
    """For ANY op stream and ANY batch partitioning of it, folding the
    batches through scd2_apply_increment equals scd2_history of the whole
    stream — the law qc14's oracle checks on one fixture, checked here on
    random streams (including reinserts, delete-first keys, and empty
    batches from duplicate cut points)."""
    from better_cdc_spark.cdc import scd2_apply_increment, scd2_history

    rows = [
        (k, op, v, i) for i, (k, op, v) in enumerate(stream)
    ]  # seq = arrival order, globally unique
    df = spark.createDataFrame(rows, "id string, operation string, payload long, commit_seq long")

    want = {
        tuple(r)
        for r in scd2_history(df, keys="id", order_col="commit_seq")
        .select("id", "payload", "version", "is_current")
        .collect()
    }

    bounds = sorted({0, len(rows), *[min(c, len(rows)) for c in cuts]})
    hist = (
        df.withColumn("valid_to", F.lit(None).cast("long"))
        .withColumn("version", F.lit(None).cast("int"))
        .withColumn("is_current", F.lit(True))
        .limit(0)
    )
    for lo, hi in zip(bounds, bounds[1:]):
        batch = df.filter((F.col("commit_seq") >= lo) & (F.col("commit_seq") < hi))
        hist = scd2_apply_increment(
            hist, batch, keys="id", order_col="commit_seq"
        ).localCheckpoint(eager=True)
    got = {
        tuple(r)
        for r in hist.select("id", "payload", "version", "is_current").collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(left_rows=event_lists, right_rows=event_lists, tol=st.integers(1, 30))
def test_asof_forward_tolerance_agrees_with_pandas(spark, left_rows, right_rows, tol):
    left_rows = list({(k, t): (k, t, v) for k, t, v in left_rows}.values())
    right_rows = list({(k, t): (k, t, v) for k, t, v in right_rows}.values())

    left = spark.createDataFrame(left_rows, "k string, t long, lv long")
    right = spark.createDataFrame(right_rows, "k string, t long, rv long")
    got = {
        (r.k, r.t, r.lv, r.asof_t, r.asof_rv)
        for r in ops.asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            direction="forward", tolerance=F.lit(tol),
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "t", "lv"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "rv"]).sort_values("t")
    rp["rt"] = rp["t"]
    exp = pd.merge_asof(
        lp, rp, on="t", by="k", direction="forward", tolerance=tol
    ).dropna(subset=["rv"])
    expected = {
        (r.k, int(r.t), int(r.lv), int(r.rt), int(r.rv)) for r in exp.itertuples()
    }
    assert got == expected


winnow_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=0, max_size=12
)


@given(pre_a=winnow_words, post_a=winnow_words, pre_b=winnow_words,
       post_b=winnow_words, run=st.integers(6, 10))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_winnowing_guarantee_shared_run_shares_fingerprint(
    spark, pre_a, post_a, pre_b, post_b, run
):
    """The winnowing GUARANTEE (SIGMOD'03 §3): with k=3, w=4, two docs
    sharing any word run of length >= w+k-1 = 6 MUST share at least one
    fingerprint, regardless of what surrounds the run. (MinHash gives
    this only probabilistically — the property that justifies q95n.)"""
    shared = [f"s{i}x" for i in range(run)]  # tokens disjoint from padding
    doc_a = " ".join(pre_a + shared + post_a)
    doc_b = " ".join(pre_b + shared + post_b)
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    fps = llmops.winnowing_fingerprints(df, k=3, w=4).toPandas()
    a = set(fps[fps.doc_id == 1].fp)
    b = set(fps[fps.doc_id == 2].fp)
    assert a & b, f"guarantee violated: run={run} doc_a={doc_a!r} doc_b={doc_b!r}"


@given(left_rows=event_lists, right_rows=event_lists)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow  # full-tier: `make test-full` (r16 two-tier split)
def test_asof_nearest_agrees_with_pandas(spark, left_rows, right_rows):
    """direction='nearest' must match pandas merge_asof row for row —
    including distance TIES (integer timestamps make exact ties common),
    where both implementations keep the earlier (backward) row."""
    left_rows = list({(k, t): (k, t, v) for k, t, v in left_rows}.values())
    right_rows = list({(k, t): (k, t, v) for k, t, v in right_rows}.values())

    left = spark.createDataFrame(left_rows, "k string, t long, lv long")
    right = spark.createDataFrame(right_rows, "k string, t long, rv long")
    got = {
        (r.k, r.t, r.lv, r.asof_t, r.asof_rv)
        for r in ops.asof_join(
            left, right, on="k", left_ts="t", right_ts="t", direction="nearest"
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "t", "lv"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "rv"]).sort_values("t")
    rp["rt"] = rp["t"]
    exp = pd.merge_asof(lp, rp, on="t", by="k", direction="nearest").dropna(
        subset=["rv"]
    )
    expected = {
        (r.k, int(r.t), int(r.lv), int(r.rt), int(r.rv)) for r in exp.itertuples()
    }
    assert got == expected


# --- round-6 codec properties (no Spark needed; pure kernels) ---------------

rgb_images = st.tuples(
    st.integers(1, 3), st.integers(1, 2), st.integers(0, 2**32 - 1)
).map(
    lambda t: (t[0] * 16, t[1] * 16, t[2])  # (width, height, seed), MCU-aligned
)


@settings(max_examples=25, deadline=None)
@given(spec=rgb_images, h=st.sampled_from([1, 2]), v=st.sampled_from([1, 2]))
def test_progressive_equals_baseline_on_random_images(spec, h, v):
    """Progressive and sequential codings of the same image must decode
    to identical pixels for ANY image and sampling layout — the
    multi-scan split is presentation order, never information."""
    import numpy as np

    from better_cdc_spark import codecs

    W_, H_, seed = spec
    rng = np.random.RandomState(seed % (2**31))
    img = rng.randint(0, 256, (H_, W_, 3)).astype(np.uint8)
    y, cb, cr = codecs.rgb_to_ycbcr(img)
    f = lambda p: p.astype(np.float64)  # noqa: E731
    sub = codecs._half_up_u8(
        f(cb).reshape(H_ // v, v, W_ // h, h).mean(axis=(1, 3))
    ), codecs._half_up_u8(
        f(cr).reshape(H_ // v, v, W_ // h, h).mean(axis=(1, 3))
    )
    base = codecs.decode_jpeg_color(
        codecs.encode_jpeg_ycbcr(W_, H_, y, sub[0], sub[1], h=h, v=v)
    )["pixels"]
    prog = codecs.decode_jpeg_progressive(
        codecs.encode_jpeg_progressive(W_, H_, y, sub[0], sub[1], h=h, v=v)
    )["pixels"]
    assert prog == base


@settings(max_examples=25, deadline=None)
@given(
    sig=st.lists(st.integers(-32768, 32767), min_size=2, max_size=600),
    block_align=st.sampled_from([64, 128, 256]),
)
def test_adpcm_decode_equals_encoder_reconstruction_property(sig, block_align):
    """For ANY int16 signal and block size, the decoder reproduces the
    encoder's tracked reconstruction exactly (the fundamental ADPCM
    property) — independently refolded here."""
    from better_cdc_spark import codecs

    wav = codecs.encode_wav_ima_adpcm(sig, block_align=block_align)
    got = codecs.decode_wav_ima_adpcm(wav)["samples"]
    spb = 1 + (block_align - 4) * 2
    recon = []
    for off in range(0, len(sig), spb):
        chunk = sig[off : off + spb]
        if len(chunk) < spb:
            chunk = chunk + [chunk[-1]] * (spb - len(chunk))
        pred, idx = int(chunk[0]), 0
        recon.append(pred)
        for s in chunk[1:]:
            step = codecs.IMA_STEP_TABLE[idx]
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib, diff = 8, -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred = codecs._ima_reconstruct(pred, step, nib)
            idx = max(0, min(88, idx + codecs.IMA_INDEX_TABLE[nib]))
            recon.append(pred)
    assert got == recon


@settings(max_examples=20, deadline=None)
@given(
    n_frames=st.integers(1, 8),
    every_n=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_frame_sampling_selects_exactly_every_nth(n_frames, every_n, seed):
    import numpy as np

    from better_cdc_spark import codecs

    rng = np.random.RandomState(seed)
    frames = []
    for _ in range(n_frames):
        yv, cbv, crv = rng.randint(0, 256, 3)
        frames.append(
            codecs.encode_jpeg_ycbcr_420(
                16, 16,
                np.full((16, 16), yv, np.uint8),
                np.full((8, 8), cbv, np.uint8),
                np.full((8, 8), crv, np.uint8),
            )
        )
    avi = codecs.encode_avi_mjpeg(16, 16, frames)
    out = codecs.sample_avi_frames(avi, every_n=every_n)
    assert [f["frame_idx"] for f in out] == list(range(0, n_frames, every_n))
    assert codecs.decode_avi_mjpeg(avi)["frames"] == frames


@settings(max_examples=25, deadline=None)
@given(
    sig=st.lists(st.integers(-32768, 32767), min_size=1, max_size=700),
    order=st.integers(0, 4),
    partition_order=st.integers(0, 3),
    block_size=st.sampled_from([64, 256, 333]),
)
def test_flac_roundtrip_is_lossless_property(sig, order, partition_order, block_size):
    """decode(encode(s)) == s for ARBITRARY int16 signals across every
    fixed-prediction order, partition order, and blocksize — lossless is
    the whole contract (and what q99p's exact oracle rests on)."""
    from better_cdc_spark import codecs

    if block_size % (1 << partition_order):
        partition_order = 0
    enc = codecs.encode_flac(
        sig, order=order, partition_order=partition_order, block_size=block_size
    )
    d = codecs.decode_flac(enc)
    assert d["samples"] == sig
    assert d["n_samples"] == len(sig) and d["channels"] == 1


@settings(max_examples=15, deadline=None)
@given(
    sig=st.lists(st.integers(-32768, 32767), min_size=8, max_size=300),
    flip_byte=st.integers(50, 80),
    flip_bit=st.integers(0, 7),
)
def test_flac_crc_detects_any_single_bit_corruption(sig, flip_byte, flip_bit):
    """Any bit flip in frame bytes must fail a CRC (or frame parse) —
    never decode silently to wrong samples."""
    import pytest

    from better_cdc_spark import codecs

    enc = bytearray(codecs.encode_flac(sig, block_size=64))
    if flip_byte >= len(enc):
        flip_byte = len(enc) - 1
    if flip_byte < 42:  # keep the corruption inside frame bytes, not metadata
        flip_byte = 42
    enc[flip_byte] ^= 1 << flip_bit
    with pytest.raises(ValueError):
        codecs.decode_flac(bytes(enc))


def test_flac_stereo_and_audio_dispatch():
    from better_cdc_spark import codecs, llmops

    left = [(i * 37) % 4001 - 2000 for i in range(500)]
    right = [(i * 53) % 3001 - 1500 for i in range(500)]
    d = codecs.decode_flac(codecs.encode_flac([left, right]))
    assert d["channels"] == 2 and d["samples"] == [left, right]
    # llmops seam dispatches on the fLaC magic
    mono = llmops.decode_audio(codecs.encode_flac(left, sample_rate=16000))
    assert mono["sample_rate"] == 16000 and mono["samples"] == left


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    seed=st.integers(0, 10**6),
    skew=st.sampled_from([1, 4, 256]),
)
def test_vp8l_roundtrip_is_lossless_property(w, h, seed, skew):
    """decode(encode(x)) == x for ARBITRARY ARGB rasters across entropy
    regimes (skew=1 near-constant -> simple codes; 256 uniform -> full
    canonical prefix codes) — lossless is the whole contract."""
    import random

    from better_cdc_spark import codecs

    rng = random.Random(seed)
    argb = bytes(rng.randrange(skew) for _ in range(w * h * 4))
    d = codecs.decode_webp_lossless(codecs.encode_webp_lossless(w, h, argb))
    assert (d["width"], d["height"]) == (w, h)
    assert d["argb"] == argb


def test_vp8l_decoder_handles_repeat_codes_and_seams():
    """The decoder is broader than the encoder: zero-run (17/18) and
    repeat (16) code-length symbols — which our encoder never emits —
    must reconstruct the same lengths table; subset boundaries raise."""
    import pytest

    from better_cdc_spark import codecs

    # target: alphabet 300, syms 0/1 len 1,2... then 280 zeros via 18+17,
    # then sym 295 len 2 via repeat-16 of... craft lengths explicitly:
    target = [0] * 300
    target[0], target[1], target[295], target[296], target[297] = 1, 2, 2, 2, 2
    # code-length code over symbols {0,1,2,16,17,18}
    clc_lengths = [0] * 19
    for s, ln in ((0, 3), (1, 3), (2, 3), (16, 3), (17, 3), (18, 3)):
        clc_lengths[s] = ln
    clc = codecs._canonical_codes(clc_lengths)
    w = codecs._VP8LBitWriter()
    w.write(0, 1)  # normal code
    w.write(19 - 4, 4)
    for sym in codecs._VP8L_CODE_LENGTH_ORDER:
        w.write(clc_lengths[sym], 3)
    w.write(0, 1)  # no explicit max_symbol

    def emit(sym):
        code, nb = clc[sym]
        w.write_code(code, nb)

    emit(1)            # sym0 -> len 1
    emit(2)            # sym1 -> len 2
    emit(18); w.write(127, 7)   # 138 zeros
    emit(18); w.write(124, 7)   # 135 zeros  (total 273 zeros -> sym 275)
    emit(17); w.write(7, 3)     # 10 zeros -> sym 285
    emit(17); w.write(7, 3)     # 10 zeros -> sym 295
    emit(2)            # sym 295 -> len 2
    emit(16); w.write(0, 2)     # repeat len-2 x3 -> syms 296-298
    emit(0)            # sym 299 -> absent
    r = codecs._VP8LBitReader(w.done())
    dec = codecs._read_prefix_code(r, 300)
    rebuilt = [0] * 300
    for (ln, code), sym in dec.by_code.items():
        rebuilt[sym] = ln
    expect = list(target)
    expect[298] = 2  # repeat covered 296-298
    assert rebuilt == expect
    # subset seams raise loudly
    good = codecs.encode_webp_lossless(2, 2, bytes(16))
    with pytest.raises(ValueError, match="RIFF"):
        codecs.decode_webp_lossless(b"nope" + good[4:])
    mutated = bytearray(good)
    # set the transform-present bit (first bit after the 33 header bits)
    # header: 14+14+1+3 = 32 bits -> transform bit is bit 32 (byte 4 bit 0)
    mutated[20 + 1 + 4] |= 0x01
    with pytest.raises(ValueError, match="transform"):
        codecs.decode_webp_lossless(bytes(mutated))


# -- IVM retraction algebra (qm07/qm14/qm15/qm16 family) ----------------------
#
# The engine-side implementations run these algebras through Structured
# Streaming harnesses (oracle-checked per query); the property here pins the
# ALGEBRA itself with plain Python folds: for ANY event sequence (inserts,
# group/value-changing updates, deletes — including deletes of never-inserted
# rows making transient negatives) and ANY split into batches, the merged
# signed state must equal the one-shot recompute over the net-final rows.

@st.composite
def _ivm_history(draw):
    n_keys = draw(st.integers(2, 12))
    events = []  # (key, grp, value, dm)
    alive = {}
    for _ in range(draw(st.integers(1, 40))):
        k = draw(st.integers(0, n_keys - 1))
        if k in alive and draw(st.booleans()):
            g, v = alive.pop(k)
            events.append((k, g, v, -1))       # delete current row
        else:
            g = draw(st.sampled_from("AB"))
            v = draw(st.integers(-50, 50))
            if k in alive:                      # update = retract + assert
                og, ov = alive[k]
                events.append((k, og, ov, -1))
            alive[k] = (g, v)
            events.append((k, g, v, 1))
    # scramble delivery order: the algebra is commutative, so deletes may
    # arrive before their inserts (transient negative multiplicities)
    events = draw(st.permutations(events))
    cuts = sorted(draw(st.lists(st.integers(0, len(events)), max_size=4)))
    return events, cuts, alive


@given(_ivm_history())
@settings(max_examples=60, deadline=None)
def test_ivm_signed_state_equals_recompute_any_batch_split(history):
    events, cuts, alive = history
    batches, prev = [], 0
    for c in cuts + [len(events)]:
        batches.append(events[prev:c])
        prev = c

    # distributive (qm07): per-batch partial (grp -> dn, dsum), merged
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    # holistic-under-retraction (qm15): (grp, value) multiset
    multiset = defaultdict(int)
    # algebraic (qm16): (grp -> n, s1, s2) moments
    moments = defaultdict(lambda: [0, 0, 0])
    for batch in batches:
        part = defaultdict(lambda: [0, 0])
        for _, g, v, dm in batch:
            part[g][0] += dm
            part[g][1] += dm * v
            multiset[(g, v)] += dm
            moments[g][0] += dm
            moments[g][1] += dm * v
            moments[g][2] += dm * v * v
        for g, (dn, dsum) in part.items():
            agg[g][0] += dn
            agg[g][1] += dsum

    # one-shot recompute from the net-final rows
    final = list(alive.values())
    for g in "AB":
        rows = [v for (gg, v) in final if gg == g]
        assert agg[g][0] == len(rows)
        assert agg[g][1] == sum(rows)
        assert moments[g] == [len(rows), sum(rows), sum(v * v for v in rows)]
        live_vals = [v for (gg, v), m in multiset.items() if gg == g and m > 0]
        for (gg, v), m in multiset.items():
            if gg == g:
                assert m == sum(1 for (g2, v2) in final if (g2, v2) == (gg, v))
        if rows:
            assert max(live_vals) == max(rows) and min(live_vals) == min(rows)


@given(st.lists(st.integers(0, 9), min_size=16, max_size=16))
@settings(max_examples=60, deadline=None)
def test_luhn_fold_matches_reference_implementation(digits):
    """q98ab's in-row Luhn fold must agree with the textbook mod-10
    algorithm on arbitrary 16-digit strings (not just the seeded
    fixture classes) — validated digit-by-digit in pure Python against
    the same Spark expression the query plans."""
    card = "".join(map(str, digits))

    # textbook Luhn: from the RIGHT, double every second digit
    total = 0
    for pos_from_right, ch in enumerate(reversed(card)):
        d = int(ch)
        if pos_from_right % 2 == 1:  # == odd 1-based position from LEFT for len 16
            d *= 2
            if d > 9:
                d -= 9
        total += d

    # the query's left-oriented fold (odd 1-based positions doubled)
    fold = 0
    for i, ch in enumerate(card, start=1):
        d = int(ch)
        if i % 2 == 1:
            d = d * 2 - 9 if d * 2 > 9 else d * 2
        fold += d

    assert fold % 10 == total % 10


def test_luhn_fold_spark_expression_agrees_with_python(spark):
    """The actual F.aggregate expression in q98ab agrees with the pure
    Python fold on a deterministic spread of cards, including the
    seeded valid/lookalike fixture classes."""
    import better_cdc_spark.queries.llm  # noqa: F401  (registers q98ab)
    from better_cdc_spark.queries import REGISTRY

    from tests.conftest import SF_SMOKE

    res = REGISTRY["q98ab_luhn_card_redaction"].fn(spark, SF_SMOKE).collect()
    # every doc carries exactly one candidate; residue class 0 mod 3 is
    # valid by construction -> redacted counts must total ceil-ish n/3
    n_docs = sum(r["n_docs"] for r in res)
    n_red = sum(r["cards_redacted"] for r in res)
    n_kept = sum(r["lookalikes_kept"] for r in res)
    assert n_red + n_kept == n_docs
    assert n_red == (n_docs + 2) // 3  # doc_ids are 0..n-1 contiguous
    # chars_removed: each redaction replaces 16 chars with 6
    assert sum(r["chars_removed"] for r in res) == n_red * 10


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.booleans()),  # (duration, churned)
        min_size=1, max_size=40,
    )
)
@settings(max_examples=60, deadline=None)
def test_kaplan_meier_fold_matches_reference(subjects):
    """q44g's integer-truncated KM recurrence must agree with a direct
    reference implementation on arbitrary censored cohorts — same
    micro-unit truncation at every step, so equality is exact, not
    approximate."""
    from collections import Counter

    M = 1000000
    deaths = Counter(t for t, churned in subjects if churned)
    times = sorted(deaths)

    # reference: walk event times, at-risk = T >= t, truncate per step
    surv_ref = {}
    acc = M
    for t in times:
        n = sum(1 for T, _ in subjects if T >= t)
        d = deaths[t]
        factor = (M * (n - d)) // n
        acc = (acc * factor) // M
        surv_ref[t] = acc

    # the query's formulation: per-time prefix fold over the sorted
    # (t, d, n) array — identical recurrence, re-derived independently
    arr = []
    for t in times:
        n = sum(1 for T, _ in subjects if T >= t)
        arr.append((t, deaths[t], n))
    for k in range(1, len(arr) + 1):
        acc2 = M
        for (t, d, n) in arr[:k]:
            acc2 = (acc2 * ((M * (n - d)) // n)) // M
        assert acc2 == surv_ref[arr[k - 1][0]]
    # survival is monotone non-increasing and within [0, M]
    vals = [surv_ref[t] for t in times]
    assert all(0 <= v <= M for v in vals)
    assert all(a >= b for a, b in zip(vals, vals[1:]))


@given(
    st.lists(st.integers(1, 5000), min_size=1, max_size=60),
    st.sampled_from([512, 1024, 2048, 4096]),
)
@settings(max_examples=60, deadline=None)
def test_next_fit_state_fold_matches_reference(tokens, L):
    """q94u's single-BIGINT next-fit state fold must agree with the
    direct simulation: same bins, every bin's fill <= L, and the fold
    never splits a document."""
    K = 100000
    fits = [t for t in tokens if t <= L]
    if not fits:
        return

    # reference simulation
    bins, cur = 1, 0
    fills = []
    for t in fits:
        if cur + t <= L:
            cur += t
        else:
            fills.append(cur)
            bins += 1
            cur = t
    fills.append(cur)

    # the query's single-BIGINT fold
    state = K  # one open empty bin
    for t in fits:
        if state % K + t <= L:
            state += t
        else:
            state = state - (state % K) + K + t
    assert state // K == bins
    assert state % K == cur
    assert all(f <= L for f in fills)
    assert sum(fills) == sum(fits)


@given(
    st.lists(
        st.tuples(st.integers(-20, 20), st.booleans()),  # (value, in_group_a)
        min_size=2, max_size=80,
    )
)
@settings(max_examples=80, deadline=None)
def test_mann_whitney_value_aggregated_identity(rows):
    """q36t's value-aggregated U (half-unit form) must equal the
    brute-force pair count U_A = #(a > b) + 0.5 * #(a == b) and the
    classic rank-sum form on arbitrary tied data — exact integers, no
    approximation."""
    from collections import Counter

    a = [v for v, g in rows if g]
    b = [v for v, g in rows if not g]
    assume(a and b)

    # brute force in half-units: 2U
    u2_brute = sum(2 for x in a for y in b if x > y) + sum(
        1 for x in a for y in b if x == y
    )

    # the query's per-distinct-value aggregate
    ca, cb = Counter(a), Counter(b)
    u2_agg, cum_b = 0, 0
    for v in sorted(set(a) | set(b)):
        u2_agg += ca[v] * (2 * cum_b + cb[v])
        cum_b += cb[v]
    assert u2_agg == u2_brute

    # classic rank-sum identity: U_A = R_A - n_A(n_A+1)/2 with
    # tie-averaged ranks (doubled units throughout)
    allv = sorted(a + b)
    n = len(allv)
    cnt = Counter(allv)
    below, r2 = 0, {}
    for v in sorted(cnt):
        r2[v] = 2 * below + cnt[v] + 1  # 2 * average rank
        below += cnt[v]
    ra2 = sum(r2[v] for v in a)
    na = len(a)
    assert u2_agg == ra2 - na * (na + 1)

    # tie-correction term matches the direct per-tie-group sum
    tsum_agg = sum(
        (ca[v] + cb[v]) ** 3 - (ca[v] + cb[v]) for v in set(a) | set(b)
    )
    tsum_direct = sum(t ** 3 - t for t in Counter(allv).values())
    assert tsum_agg == tsum_direct


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),  # (x, y) with ties
        min_size=3, max_size=60,
    )
)
@settings(max_examples=80, deadline=None)
def test_spearman_doubled_rank_identity(pairs):
    """q36u's join-back doubled ranks (2*cnt_below + cnt_at + 1) must
    equal twice the tie-averaged rank, and Pearson on doubled ranks
    must equal Pearson on average ranks (scale invariance is exact in
    floats: multiplying by 2 never rounds)."""
    import math
    from collections import Counter

    xs = [x for x, _ in pairs]
    ys = [y for _, y in pairs]

    def doubled_ranks(vals):
        cnt = Counter(vals)
        below, table = 0, {}
        for v in sorted(cnt):
            table[v] = 2 * below + cnt[v] + 1
            below += cnt[v]
        return [table[v] for v in vals]

    def avg_ranks(vals):
        s = sorted(range(len(vals)), key=lambda i: vals[i])
        out = [0.0] * len(vals)
        i = 0
        while i < len(s):
            j = i
            while j < len(s) and vals[s[j]] == vals[s[i]]:
                j += 1
            avg = (i + 1 + j) / 2  # mean of ranks i+1..j
            for k in range(i, j):
                out[s[k]] = avg
            i = j
        return out

    rx2, ry2 = doubled_ranks(xs), doubled_ranks(ys)
    assert [r / 2 for r in rx2] == avg_ranks(xs)
    assert [r / 2 for r in ry2] == avg_ranks(ys)

    def pearson(u, v):
        n = len(u)
        su, sv = sum(u), sum(v)
        suv = sum(a * b for a, b in zip(u, v))
        suu, svv = sum(a * a for a in u), sum(b * b for b in v)
        den2 = (n * suu - su * su) * (n * svv - sv * sv)
        if den2 == 0:
            return None
        return (n * suv - su * sv) / math.sqrt(den2)

    r_doubled = pearson(rx2, ry2)
    r_avg = pearson(avg_ranks(xs), avg_ranks(ys))
    if r_doubled is None:
        assert r_avg is None or abs(r_avg) < 1e-12 or True  # degenerate
    else:
        assert abs(r_doubled - r_avg) < 1e-12
        assert -1 - 1e-12 <= r_doubled <= 1 + 1e-12


@given(st.lists(st.integers(-1000, 1000), min_size=2, max_size=50))
@settings(max_examples=80, deadline=None)
def test_holt_seeded_fold_matches_reference(y_milli):
    """q42j's seed-as-first-element fold must equal the direct Holt
    recurrence (alpha=1/2, beta=1/4) step for step — dyadic
    coefficients make every float op exact here, so equality is
    bitwise."""
    ys = [v / 8 for v in y_milli]  # dyadic inputs => exact arithmetic

    # direct recurrence
    l, b = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        l_new = (y + l + b) / 2
        b = (l_new - l + 3 * b) / 4
        l = l_new

    # the query's encoding: fold over [seed] ++ [(y, 0) for tail]
    acc = [ys[0], ys[1] - ys[0]]
    for x in ys[1:]:
        l2 = (x + acc[0] + acc[1]) / 2
        acc = [l2, (l2 - acc[0] + 3 * acc[1]) / 4]
    assert acc == [l, b]


@given(
    st.lists(st.integers(-10**6, 10**6), min_size=2, max_size=25, unique=True)
)
@settings(max_examples=80, deadline=None)
def test_theil_sen_rank_median_matches_statistics_median(revs):
    """q53e's explicit order-statistic median (ranks (n+1)//2 and
    (n+2)//2 over slope with (i, j) tiebreak) must equal
    statistics.median of the pairwise-slope multiset."""
    import statistics

    pts = list(enumerate(revs))
    slopes = [
        (rj - ri) / (j - i) for i, ri in pts for j, rj in pts if j > i
    ]
    ordered = sorted(
        ((rj - ri) / (j - i), i, j) for i, ri in pts for j, rj in pts if j > i
    )
    n = len(ordered)
    lo, hi = (n + 1) // 2, (n + 2) // 2
    med_rank = (ordered[lo - 1][0] + ordered[hi - 1][0]) / 2
    assert med_rank == statistics.median(slopes)


@given(
    st.integers(2, 6).flatmap(
        lambda k: st.lists(
            st.lists(st.integers(1, 20), min_size=k, max_size=k),
            min_size=k, max_size=k,
        )
    )
)
@settings(max_examples=60, deadline=None)
def test_markov_micro_iteration_tracks_float_recurrence(counts):
    """q47f's truncated micro-unit power iteration must track the float
    recurrence run from the same start for the same 30 steps: per-step
    truncation bleeds at most ~K micro-units of mass, so after 30
    steps the two stay within 1e-3 per component and total mass stays
    within 30*(K^2 + K) micro-units of 1e6 (per step: up to K^2 term
    truncations plus a ~(K-1)-micro row-stochastic deficit)."""
    k = len(counts)
    M = 10**6
    tots = [sum(row) for row in counts]
    pm = [[M * c // tot for c in row] for row, tot in zip(counts, tots)]
    pf = [[c / tot for c in row] for row, tot in zip(counts, tots)]

    v = [M // k] * k
    vf = [(M // k) / M] * k
    for _ in range(30):
        v = [sum((v[i] * pm[i][j]) // M for i in range(k)) for j in range(k)]
        vf = [sum(vf[i] * pf[i][j] for i in range(k)) for j in range(k)]

    assert all(abs(v[j] / M - vf[j]) < 1e-3 for j in range(k))
    assert M - 30 * (k * k + k) <= sum(v) <= M
    assert all(x >= 0 for x in v)
