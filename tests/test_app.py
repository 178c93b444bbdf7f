"""EngineApp — the composed cdc-handler process (app.py, the
cmd/cdc-handler/main.go analog): config -> pipeline -> metrics ->
health in one lifecycle, driven end-to-end over a synthetic wal2json
source with the health surface probed while the stream is live.
"""

from __future__ import annotations

import urllib.error
import urllib.request

from better_cdc_spark.app import EngineApp
from better_cdc_spark.config import load as load_config
from better_cdc_spark.streaming.core import stamp_ordered_mtimes
from tools.e2e_load import synthetic_ops


def _get(port: int, path: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=5
        ) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_app_end_to_end_once_mode(spark, tmp_path):
    """One composed run: synthetic ops -> sink, with /health /ready
    /metrics live during processing, readiness flipping not-ready after
    stop, and the reference-named counters fed by the run."""
    src = str(tmp_path / "src")
    n_ops = 3000
    # the wal2json contract is an ORDERED stream: contiguous ingest_seq
    # ranges per file + range-ordered mtimes (see tools/e2e_load.py) —
    # a scattered coalesce would let commit markers overtake their data
    synthetic_ops(spark, n_ops).repartitionByRange(
        4, "ingest_seq"
    ).sortWithinPartitions("ingest_seq").write.json(src)
    stamp_ordered_mtimes(src)

    cfg = load_config(env={"HEALTH_ADDR": "127.0.0.1:0",
                           "DATABASE_NAME": "testdb"})
    app = EngineApp(spark, cfg, src, str(tmp_path / "work"))
    with app:
        port = app.health.port
        assert _get(port, "/health") == (200, "ok")
        code, _ = _get(port, "/ready")
        assert code == 200  # stream active
        assert _get(port, "/debug/threads")[0] == 404  # debug not opted in
        app.process_available()
        code, metrics = _get(port, "/metrics")
        assert code == 200
        assert "cdc_events_processed_total" in metrics
        assert "cdc_engine_batch_latency_microseconds_bucket" in metrics
        assert app.pipeline.sink().count() == n_ops
        assert app.listener.events_total >= 1
    # after stop: server down, not just not-ready
    try:
        _get(port, "/health")
        server_up = True
    except (urllib.error.URLError, ConnectionError, OSError):
        server_up = False
    assert not server_up


def test_app_readiness_not_ready_before_stream(spark, tmp_path):
    """/ready must fail loudly BEFORE the stream starts: the health
    surface comes up first (orchestrator probing order), with the
    stream check registered as failing until the query is live."""
    src = str(tmp_path / "src2")
    synthetic_ops(spark, 100).coalesce(1).write.json(src)
    stamp_ordered_mtimes(src)
    cfg = load_config(env={"HEALTH_ADDR": "127.0.0.1:0"})
    app = EngineApp(spark, cfg, src, str(tmp_path / "work2"))
    # start only the health surface, with the unstarted-stream check
    app.health.add_readiness(
        __import__("better_cdc_spark.health", fromlist=["stream_readiness"])
        .stream_readiness(None)
    )
    app.health.start()
    try:
        code, body = _get(app.health.port, "/ready")
        assert code == 503 and "not started" in body
    finally:
        app.health.stop()
