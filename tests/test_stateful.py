"""streaming/stateful: engine selection + equivalence.

The Spark-4 StatefulProcessor code path must run EVERYWHERE: on
transformWithStateInPandas where google.protobuf is present (its
state-server wire protocol needs it), and on the shim engine (the same
processor hosted on applyInPandasWithState) otherwise. q85b is therefore
registered unconditionally, and the engine list below adapts at collection
time — no environment skips.
"""

from __future__ import annotations

import pytest

from better_cdc_spark.queries import load_all
from better_cdc_spark.streaming.stateful import (
    HAS_TRANSFORM_WITH_STATE,
    stateful_user_agg,
)
from tests.conftest import SF_SMOKE

ENGINES = ["legacy", "shim"] + (["tws"] if HAS_TRANSFORM_WITH_STATE else [])


def test_q85b_registered_unconditionally():
    reg = load_all()
    assert "q85b_transform_with_state" in reg


def test_auto_engine_always_resolves():
    # auto = tws where the wire protocol can load, shim otherwise; never
    # an exception and never the bare legacy callback (the point is that
    # the StatefulProcessor class itself executes).
    expected = "tws" if HAS_TRANSFORM_WITH_STATE else "shim"
    assert expected in ENGINES


@pytest.mark.parametrize("engine", ENGINES)
def test_engine_matches_batch(spark, engine):
    from better_cdc_spark.io import load_table
    from better_cdc_spark.streaming.core import events_stream, run_to_memory

    out = run_to_memory(
        stateful_user_agg(events_stream(spark, SF_SMOKE), engine=engine),
        mode="update",
    )
    # update-mode re-emits a key per batch; final state = max n_events per key
    final = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in sorted(out.collect(), key=lambda r: r["n_events"])
    }
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 2))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F_count().alias("n"), F_sum_cents().alias("s"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, (n, s) in batch.items():
        assert final[uid] == (n, round(s, 2))


def test_shim_handle_rejects_unsupported_features():
    from better_cdc_spark.streaming.stateful import _ShimHandle

    h = _ShimHandle(group_state=None)
    with pytest.raises(NotImplementedError):
        h.getListState("x", None)
    with pytest.raises(NotImplementedError):
        h.getMapState("x", None)
    with pytest.raises(NotImplementedError):
        h.registerTimer(0)
    with pytest.raises(NotImplementedError):
        h.getValueState("x", None, ttl_duration_ms=1000)


def F_count():
    from pyspark.sql import functions as F

    return F.count("*")


def F_sum_cents():
    from pyspark.sql import functions as F

    return (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).cast("double")
