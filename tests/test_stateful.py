"""streaming/stateful: capability gate + engine equivalence.

The tws path needs google.protobuf (state-server protocol); in containers
without it the auto engine must fall back to applyInPandasWithState and the
q85b query must NOT be registered. Where protobuf IS present, both engines
must produce the same result (hash-checked via the shared oracle smoke).
"""

from __future__ import annotations

import pytest

from better_cdc_spark.queries import load_all
from better_cdc_spark.streaming.stateful import (
    HAS_TRANSFORM_WITH_STATE,
    stateful_user_agg,
)
from tests.conftest import SF_SMOKE


def test_registration_tracks_capability():
    reg = load_all()
    assert ("q85b_transform_with_state" in reg) == HAS_TRANSFORM_WITH_STATE


def test_legacy_engine_matches_batch(spark):
    from better_cdc_spark.io import load_table
    from better_cdc_spark.streaming.core import events_stream, run_to_memory

    out = run_to_memory(
        stateful_user_agg(events_stream(spark, SF_SMOKE), engine="legacy"),
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


def F_count():
    from pyspark.sql import functions as F

    return F.count("*")


def F_sum_cents():
    from pyspark.sql import functions as F

    return (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).cast("double")


@pytest.mark.skipif(
    not HAS_TRANSFORM_WITH_STATE, reason="google.protobuf not in container"
)
def test_tws_engine_runs(spark):
    from better_cdc_spark.streaming.core import events_stream, run_to_memory

    out = run_to_memory(
        stateful_user_agg(events_stream(spark, SF_SMOKE), engine="tws"),
        mode="update",
    )
    assert out.count() > 0
