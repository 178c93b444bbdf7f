"""Property-based tests (hypothesis) for the wire/infra layers added in
rounds 12-13: nkey Base32+CRC encoding, the Prometheus-style latency
histogram, and the rotation classifier. All pure-Python — no Spark JVM,
so hundreds of examples run in seconds.
"""

from __future__ import annotations

from hypothesis import given, strategies as st

from better_cdc_spark.metrics import LatencyHistogram
from better_cdc_spark.queries import QuerySpec
from better_cdc_spark.streaming.nats_wire import (
    nkey_decode_seed,
    nkey_encode_public,
    nkey_encode_seed,
)
from tools import rotation

seeds32 = st.binary(min_size=32, max_size=32)


@given(raw=seeds32)
def test_nkey_seed_roundtrip_any_32_bytes(raw):
    seed = nkey_encode_seed(raw)
    assert seed.startswith("SU")
    assert nkey_decode_seed(seed) == raw
    assert nkey_encode_public(raw).startswith("U")


@given(raw=seeds32, pos=st.integers(0, 57))
def test_nkey_single_char_corruption_never_decodes_different_bytes(raw, pos):
    """Flipping one Base32 character either raises (CRC16-CCITT detects
    any <=5-bit burst inside the payload) or decodes to the SAME seed —
    the final symbol carries 2 padding bits the decoder drops, so a flip
    confined to them is byte-identical and legitimately valid. What must
    NEVER happen: different bytes accepted as a valid seed."""
    seed = nkey_encode_seed(raw)
    pos = min(pos, len(seed) - 1)
    alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    repl = next(c for c in alphabet if c != seed[pos])
    corrupt = seed[:pos] + repl + seed[pos + 1 :]
    try:
        decoded = nkey_decode_seed(corrupt)
    except ValueError:
        return  # detected — the common case
    assert decoded == raw  # padding-bit flip: same payload, same CRC region


@given(
    values=st.lists(st.floats(0.1, 1e6, allow_nan=False), min_size=1, max_size=60),
)
def test_histogram_invariants(values):
    """Count conservation, cumulative-bucket monotonicity, and quantile
    monotone-in-q + bounded-by-largest-finite-upper (PromQL clamp)."""
    h = LatencyHistogram((100.0, 1000.0, 10000.0))
    for v in values:
        h.observe(v)
    assert h.count == len(values)
    assert abs(h.sum - sum(values)) < 1e-6 * max(1.0, sum(values))
    cum = 0
    for c in h.bucket_counts:
        assert c >= 0
        cum += c
    assert cum == h.count
    qs = [h.quantile(q) for q in (0.1, 0.5, 0.9, 0.99)]
    assert all(b is not None for b in qs)
    assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:])), qs
    assert qs[-1] <= 10000.0 + 1e-9  # clamp at largest finite upper


@given(v=st.floats(1.0, 1e5), n=st.integers(1, 1000))
def test_histogram_batched_observe_equals_n_singles(v, n):
    """observe(v, n) must equal n scaled singles: same bucket, n-times
    the counts and sum (the O(1)-per-batch contract bench relies on)."""
    a, one = LatencyHistogram((10.0, 100.0)), LatencyHistogram((10.0, 100.0))
    a.observe(v, n=n)
    one.observe(v)
    assert a.count == n
    assert a.bucket_counts == [c * n for c in one.bucket_counts]
    assert abs(a.sum - v * n) < 1e-9 * max(1.0, v * n)


def _spec(name, body, oracle="SELECT 1 AS x"):
    fn = eval(f"lambda spark, sf_dir: {body!r}")  # noqa: S307 - test-local literal
    return QuerySpec(name=name, fn=fn, oracle=oracle)


@given(
    greens=st.dictionaries(
        st.sampled_from([f"q{i}" for i in range(8)]), st.integers(1, 9), max_size=8
    ),
    edited=st.sets(st.sampled_from([f"q{i}" for i in range(8)]), max_size=4),
)
def test_rotation_classify_partitions_registry(greens, edited):
    """classify() must PARTITION the registry: every entry lands in
    exactly one of (never, changed, pads), never-verified first, and
    only hash-mismatched green entries flag as changed."""
    reg = {f"q{i}": _spec(f"q{i}", f"plan-{i}") for i in range(8)}
    state = {
        q: {
            "green_round": rnd,
            "src_hash": ("stale" if q in edited else rotation.src_hash(reg[q])),
        }
        for q, rnd in greens.items()
    }
    never, changed, pads = rotation.classify(reg, greens, state)
    assert sorted(never + changed + pads) == sorted(reg)
    assert set(never) == set(reg) - set(greens)
    assert set(changed) == set(greens) & edited
    # pads ordered oldest green round first
    rounds = [greens[q] for q in pads]
    assert rounds == sorted(rounds)
