"""R21 observability parity: observed metrics + progress listener."""

from __future__ import annotations

import time

from better_cdc_spark.metrics import CDCMetricsListener
from better_cdc_spark.streaming.pipeline import CDCStreamPipeline

from tests.test_streaming import changelog_dirs  # noqa: F401  (fixture reuse)


def _wait(cond, timeout=20.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.25)
    return False


def test_listener_counts_events_batches_and_lag(spark, changelog_dirs):  # noqa: F811
    src, work = changelog_dirs
    listener = CDCMetricsListener()
    spark.streams.addListener(listener)
    try:
        pipe = CDCStreamPipeline(spark, src, work, allowlist=["public.users"])
        pipe.run_available()
        # Listener callbacks are delivered asynchronously after the query
        # stops — poll for the folded counters.
        assert _wait(lambda: listener.batches_total >= 2), listener.snapshot()
        snap = listener.snapshot()
        # 11 changelog rows over two files (maxFilesPerTrigger=1 → ≥2 batches)
        assert snap["cdc_events_processed_total"] == 11
        assert snap["cdc_commits_total"] == 2
        assert snap["cdc_batch_duration_ms_last"] is not None
        assert snap["cdc_batch_duration_ms_avg"] > 0
        # commit markers carry TS=2024-01-01 → lag is large and positive
        assert snap["cdc_replication_lag_ms"] > 0
    finally:
        spark.streams.removeListener(listener)
