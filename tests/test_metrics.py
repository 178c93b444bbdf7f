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


def test_latency_histogram_quantiles_and_buckets():
    """LatencyHistogram follows Prometheus semantics: cumulative buckets,
    linear interpolation inside the target bucket, +Inf observations
    clamped to the largest finite bound."""
    from better_cdc_spark.metrics import LatencyHistogram

    h = LatencyHistogram((100.0, 500.0, 1000.0))
    assert h.quantile(0.5) is None  # empty
    for v in (50.0, 60.0, 70.0, 80.0):  # 4 obs in (0, 100]
        h.observe(v)
    # rank 2 of 4 in the first bucket: 0 + 100 * (2/4) = 50
    assert h.quantile(0.5) == 50.0
    h.observe(5000.0)  # +Inf bucket → quantiles there clamp to 1000
    assert h.quantile(0.99) == 1000.0
    assert h.count == 5
    assert h.sum == 50 + 60 + 70 + 80 + 5000
    lines = h.prom_lines("x", "help")
    assert 'x_bucket{le="100"} 4' in lines
    assert 'x_bucket{le="1000"} 4' in lines
    assert 'x_bucket{le="+Inf"} 5' in lines


def test_listener_populates_latency_histograms(spark, changelog_dirs):  # noqa: F811
    """Real micro-batches feed both SLO histograms: batch wall in µs,
    per-event transform latency in ns (row-weighted), and snapshot()
    precomputes the dashboard percentiles (p50/p90/p99)."""
    src, work = changelog_dirs
    listener = CDCMetricsListener()
    spark.streams.addListener(listener)
    try:
        pipe = CDCStreamPipeline(spark, src, work, allowlist=["public.users"])
        pipe.run_available()
        assert _wait(lambda: listener.batches_total >= 2), listener.snapshot()
        snap = listener.snapshot()
        assert listener.batch_latency_us.count == listener.batches_total
        # transform observations are row-weighted: one per input event
        assert listener.transform_latency_ns.count == snap["cdc_events_processed_total"]
        assert snap["cdc_batch_latency_us_p50"] is not None
        assert snap["cdc_batch_latency_us_p99"] >= snap["cdc_batch_latency_us_p50"]
        assert snap["cdc_transform_latency_ns_p90"] is not None
    finally:
        spark.streams.removeListener(listener)
