"""Health surface (R22): ready/not-ready transitions around a real stream.

Mirrors the reference's health server contract (server.go:29-125):
/health always 200; /ready 200 only while every readiness check passes,
503 with "name: error" otherwise; /metrics exposes the R21 counters.
"""

from __future__ import annotations

import urllib.error
import urllib.request

import pytest

from better_cdc_spark.health import HealthServer, stream_readiness
from better_cdc_spark.metrics import CDCMetricsListener, with_stream_metrics


def _get(port: int, path: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_health_always_ok_and_unknown_404():
    with HealthServer() as srv:
        assert _get(srv.port, "/health") == (200, "ok")
        assert _get(srv.port, "/nope")[0] == 404


def test_ready_with_no_checks_is_ready():
    with HealthServer() as srv:
        assert _get(srv.port, "/ready") == (200, "ready")


def test_ready_transitions_around_stream(spark, tmp_path):
    """not started → 503; active stream → 200; stopped stream → 503."""
    listener = CDCMetricsListener()
    spark.streams.addListener(listener)
    try:
        srv = HealthServer(listener=listener)
        srv.add_readiness(stream_readiness(None))
        with srv:
            code, body = _get(srv.port, "/ready")
            assert code == 503 and "stream" in body

        df = with_stream_metrics(
            spark.readStream.format("rate").option("rowsPerSecond", "5").load()
            .selectExpr("'I' AS action", "timestamp")
        )
        q = (
            df.writeStream.format("memory")
            .queryName("health_probe")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            srv2 = HealthServer(listener=listener, readiness=[stream_readiness(q)])
            with srv2:
                assert _get(srv2.port, "/ready") == (200, "ready")
                q.processAllAvailable()
                code, metrics = _get(srv2.port, "/metrics")
                assert code == 200
                assert "# TYPE cdc_batches_total counter" in metrics
        finally:
            q.stop()
            q.awaitTermination()

        srv3 = HealthServer(listener=listener, readiness=[stream_readiness(q)])
        with srv3:
            code, _ = _get(srv3.port, "/ready")
            assert code == 503
    finally:
        spark.streams.removeListener(listener)


def test_metrics_render_skips_none_and_names_counters():
    class FakeListener:
        last_progress = None

        def snapshot(self):
            return {"cdc_events_processed_total": 7, "cdc_replication_lag_ms": None}

    srv = HealthServer(listener=FakeListener())
    text = srv.render_metrics()
    assert "cdc_events_processed_total 7" in text
    assert "replication_lag" not in text


def test_metrics_renders_histogram_buckets():
    """The /metrics exposition carries the reference's SLO histograms
    (prometheus.go:134-139): cumulative _bucket{le} lines, _sum, _count,
    under the reference's exact metric names so the shipped dashboard's
    histogram_quantile queries key one-to-one."""
    listener = CDCMetricsListener()
    listener.batch_latency_us.observe(750.0)       # lands in le="1000"
    listener.batch_latency_us.observe(200000.0)    # lands in +Inf
    listener.transform_latency_ns.observe(300.0, n=5)
    with HealthServer(listener=listener) as srv:
        _, text = _get(srv.port, "/metrics")
    assert "# TYPE cdc_engine_batch_latency_microseconds histogram" in text
    assert 'cdc_engine_batch_latency_microseconds_bucket{le="1000"} 1' in text
    assert 'cdc_engine_batch_latency_microseconds_bucket{le="+Inf"} 2' in text
    assert "cdc_engine_batch_latency_microseconds_count 2" in text
    assert 'cdc_engine_transform_latency_nanoseconds_bucket{le="500"} 5' in text
    assert "cdc_engine_transform_latency_nanoseconds_sum 1500.0" in text


def test_debug_threads_is_opt_in():
    """/debug/threads mirrors the reference's optional pprof mount
    (server.go:77-79): 404 unless enable_debug, and when on it dumps
    every live Python thread's stack (this request's handler thread is
    guaranteed to appear)."""
    with HealthServer() as srv:
        assert _get(srv.port, "/debug/threads")[0] == 404
    with HealthServer(enable_debug=True) as srv:
        code, body = _get(srv.port, "/debug/threads")
    assert code == 200
    assert "--- thread" in body and "do_GET" in body


def test_debug_heap_opt_in_and_tracing_gate():
    """/debug/heap mirrors the pprof heap profile: 404 unless
    enable_debug; 409 with a hint when tracemalloc isn't tracing (the
    server never enables tracing behind the operator's back); top
    allocation lines when it is."""
    import tracemalloc

    with HealthServer() as srv:
        assert _get(srv.port, "/debug/heap")[0] == 404
    with HealthServer(enable_debug=True) as srv:
        was_tracing = tracemalloc.is_tracing()
        if not was_tracing:
            code, body = _get(srv.port, "/debug/heap")
            assert code == 409 and "tracemalloc" in body
        tracemalloc.start()
        try:
            code, body = _get(srv.port, "/debug/heap")
            assert code == 200
            assert body.startswith("# driver heap:")
            assert ".py:" in body  # at least one file:line allocation row
        finally:
            if not was_tracing:
                tracemalloc.stop()


def test_debug_profile_opt_in_shape_and_bad_seconds():
    """/debug/profile?seconds=N mirrors /debug/pprof/profile
    (server.go:77-79): 404 unless enable_debug; when on, a short
    time-sampled run returns the collapsed-stack exposition — a header
    line with the sample count, then '<thread>;<file:func>;... N' rows
    (a busy worker thread is guaranteed to appear). Non-numeric and
    non-positive seconds are 400."""
    import threading
    import time

    with HealthServer() as srv:
        assert _get(srv.port, "/debug/profile?seconds=0.2")[0] == 404

    stop = threading.Event()

    def spin() -> None:  # a stack the sampler must catch
        while not stop.is_set():
            sum(range(1000))

    t = threading.Thread(target=spin, name="bcs-spin", daemon=True)
    t.start()
    try:
        with HealthServer(enable_debug=True) as srv:
            code, body = _get(srv.port, "/debug/profile?seconds=0.3")
            assert code == 200
            lines = body.splitlines()
            assert lines[0].startswith("# cpu profile:")
            n_samples = int(lines[0].split()[3])
            assert n_samples >= 1
            assert any(
                line.startswith("bcs-spin;") and ":spin" in line
                for line in lines[1:]
            )
            # every data row ends with an integer sample count
            assert all(l.rsplit(" ", 1)[1].isdigit() for l in lines[1:])
            assert _get(srv.port, "/debug/profile?seconds=abc")[0] == 400
            assert _get(srv.port, "/debug/profile?seconds=-1")[0] == 400
    finally:
        stop.set()
        t.join(timeout=2)
