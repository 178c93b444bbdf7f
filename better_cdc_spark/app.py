"""Engine entrypoint — the reference's cmd/cdc-handler/main.go analog.

The reference wires config → logger → metrics → health server → CDC
engine → publisher in one process (cmd/cdc-handler/main.go:83-116 for
the health/readiness wiring); every piece of that surface exists here
(config.py, logging_setup.py, metrics.py, health.py, streaming/
pipeline.py) but until round 13 only tests composed them. This module
is the committed composition: validated env config, tuned SparkSession,
progress-fed metrics listener, health/readiness/metrics HTTP surface on
HEALTH_ADDR, and the commit-boundary CDC pipeline — runnable as

    python -m better_cdc_spark SOURCE_DIR [--work-dir D] [--once]
        [--debug] [--cpus N]

``--once`` processes everything available and exits (the batch/backfill
mode, like the e2e rig); without it the stream runs until SIGINT/SIGTERM
and shuts down cleanly. ``--debug`` opts into the /debug/* endpoints and
development-style logging, mirroring the reference's EnablePprof +
development-logger gates.

Scale: this is driver-side wiring only — the pipeline's work runs on
executors exactly as in the query registry; the health server and
listener are O(1) per micro-batch on the driver.
"""

from __future__ import annotations

import argparse
import signal
import sys
import tempfile
import threading
import time

from better_cdc_spark import config as config_mod
from better_cdc_spark.health import HealthServer, stream_readiness
from better_cdc_spark.logging_setup import new_logger
from better_cdc_spark.metrics import CDCMetricsListener
from better_cdc_spark.streaming.pipeline import CDCStreamPipeline


class EngineApp:
    """Composed engine process: pipeline + metrics + health, one lifecycle.

    start() brings the health surface up BEFORE the stream (the reference
    starts its health server first for the same reason: orchestrators
    probe /ready during startup, and "stream not started" is a readiness
    failure, not a connection refusal)."""

    def __init__(
        self,
        spark,
        cfg: "config_mod.EngineConfig",
        source_dir: str,
        work_dir: str,
        enable_debug: bool = False,
    ) -> None:
        self.spark = spark
        self.cfg = cfg
        self.listener = CDCMetricsListener()
        self.pipeline = CDCStreamPipeline(spark, source_dir, work_dir, config=cfg)
        host, port = cfg.health_host_port()
        self.health = HealthServer(
            listener=self.listener, host=host, port=port,
            enable_debug=enable_debug,
        )
        self.query = None

    def start(self) -> "EngineApp":
        self.spark.streams.addListener(self.listener)
        self.health.start()
        self.health.add_readiness(stream_readiness(self.query))  # not-ready yet
        self.query = self.pipeline.start()
        # rebind readiness to the live query handle
        self.health.readiness[-1] = stream_readiness(self.query)
        return self

    def process_available(self) -> None:
        """Drain everything currently in the source (--once mode)."""
        self.query.processAllAvailable()

    def stop(self) -> None:
        try:
            if self.query is not None:
                self.query.stop()
                try:
                    self.query.awaitTermination()
                except Exception:
                    # A stream that died with an error re-raises its
                    # StreamingQueryException here; shutdown must not —
                    # the failure already propagated from the run loop
                    # (or is readable via query.exception()), and raising
                    # out of stop() would mask it in --once mode.
                    pass
        finally:
            self.health.stop()
            try:
                self.spark.streams.removeListener(self.listener)
            except Exception:  # listener already gone on double-stop
                pass

    def __enter__(self) -> "EngineApp":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="better_cdc_spark",
        description="CDC engine process: changelog source -> committed "
        "envelope sink, with /health /ready /metrics on HEALTH_ADDR.",
    )
    ap.add_argument("source_dir", help="changelog JSON-lines directory")
    ap.add_argument("--work-dir", default=None,
                    help="sink/checkpoint root (default: a temp dir)")
    ap.add_argument("--once", action="store_true",
                    help="process available input, then exit")
    ap.add_argument("--debug", action="store_true",
                    help="enable /debug endpoints + development logging")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] cores (default: session factory choice)")
    args = ap.parse_args(argv)

    log = new_logger("cdc-handler", debug=args.debug)
    cfg = config_mod.load()
    log.info("config loaded: database=%s health_addr=%s policy=%s",
             cfg.database, cfg.health_addr, cfg.failure_policy)

    from better_cdc_spark.session import get_spark

    spark = get_spark("cdc-handler", cpus=args.cpus)
    work_dir = args.work_dir
    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="bcs_app_")
        # the sink inside work_dir IS the run's output — never silently
        # deleted; be loud that it landed in /tmp so the operator either
        # collects it or passes --work-dir next time
        log.warning("no --work-dir given; sink/checkpoint under %s "
                    "(persists after exit)", work_dir)
    app = EngineApp(spark, cfg, args.source_dir, work_dir,
                    enable_debug=args.debug)
    app.start()
    log.info("health surface on port %d; pipeline started (source=%s)",
             app.health.port, args.source_dir)

    if args.once:
        try:
            t0 = time.perf_counter()
            app.process_available()
            drain_s = time.perf_counter() - t0
            n = app.pipeline.sink().count()
            # drain_sec covers processAllAvailable only (the comparable to
            # tools/e2e_load.py's run_available wall); tools/app_load.py
            # parses this line for the app-mode ops/sec benchmark
            log.info("drained source in %.2fs; sink holds %d events",
                     drain_s, n)
        finally:
            app.stop()
        return 0

    stop_evt = threading.Event()

    def _on_signal(signum, frame):  # noqa: ARG001 - signal contract
        log.info("signal %d: shutting down", signum)
        stop_evt.set()

    signal.signal(signal.SIGINT, _on_signal)
    signal.signal(signal.SIGTERM, _on_signal)
    clean = False
    try:
        while not stop_evt.wait(1.0):
            if not app.query.isActive:
                exc = app.query.exception()
                log.error("stream terminated: %s", exc)
                return 1
        clean = True
    finally:
        app.stop()
        # only the signal-initiated path is a clean shutdown — logging it
        # on the stream-failure return would contradict the exit code and
        # mask the failure from log-based monitoring
        if clean:
            log.info("clean shutdown")
    return 0


if __name__ == "__main__":
    sys.exit(main())
