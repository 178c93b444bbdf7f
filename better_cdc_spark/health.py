"""Health/readiness/metrics HTTP surface (R22 parity).

Mirrors the reference's health server contract
(/root/reference/internal/health/server.go:29-125) with the stdlib HTTP
server — no web framework in the container, none needed:

- ``/health``  → 200 "ok" unconditionally (liveness).
- ``/ready``   → runs the registered readiness checks; 200 "ready" when
  all pass, 503 with "name: error; ..." when any fails (same body shape
  as server.go:56-74).
- ``/metrics`` → Prometheus text exposition of the CDCMetricsListener
  snapshot plus last-progress gauges — the promhttp.Handler() analog
  (server.go:92), scraping the R21 counters (metrics.py).

The server runs on a daemon thread on the Spark DRIVER — it reports
driver-side stream state exactly like the reference process reports its
own; executor health is the cluster manager's concern. ``port=0`` binds
an ephemeral port (tests); a fixed port matches HEALTH_ADDR deployments.

``stream_readiness(query)`` is the canonical check: ready iff the
StreamingQuery is active and has thrown no exception — the analog of the
reference's publisher/replication readiness closures (main.go wiring).
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

ReadinessCheck = tuple[str, Callable[[], None]]  # (name, raises-on-not-ready)


def stream_readiness(query) -> ReadinessCheck:
    """Readiness check for a Structured Streaming query handle."""

    def check() -> None:
        if query is None:
            raise RuntimeError("stream not started")
        if not query.isActive:
            exc = query.exception()
            raise RuntimeError(str(exc) if exc else "stream not active")

    return ("stream", check)


def _prom_escape(name: str) -> str:
    return name.replace("-", "_")


class HealthServer:
    """stdlib HTTP server exposing /health, /ready, /metrics."""

    def __init__(
        self,
        listener=None,
        readiness: list[ReadinessCheck] | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        enable_debug: bool = False,
    ) -> None:
        self.listener = listener
        self.readiness: list[ReadinessCheck] = list(readiness or [])
        # Opt-in profiling surface, mirroring the reference's optional
        # pprof mount (internal/health/server.go:77-79: EnablePprof gates
        # /debug/pprof/*). Off by default for the same reason: stack dumps
        # leak internals and cost wall time; production opts in explicitly.
        self.enable_debug = enable_debug
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: str, ctype: str = "text/plain") -> None:
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self) -> None:  # noqa: N802
                if self.path == "/health":
                    self._send(200, "ok")
                elif self.path == "/ready":
                    failures = []
                    for name, fn in outer.readiness:
                        try:
                            fn()
                        except Exception as e:  # check failed → not ready
                            failures.append(f"{name or 'unnamed'}: {e}")
                    if failures:
                        self._send(503, "; ".join(failures))
                    else:
                        self._send(200, "ready")
                elif self.path == "/metrics":
                    self._send(200, outer.render_metrics(), "text/plain; version=0.0.4")
                elif self.path == "/debug/threads" and outer.enable_debug:
                    self._send(200, outer.render_threads())
                elif self.path == "/debug/heap" and outer.enable_debug:
                    code, body = outer.render_heap()
                    self._send(code, body)
                elif (
                    self.path.split("?", 1)[0] == "/debug/profile"
                    and outer.enable_debug
                ):
                    from urllib.parse import parse_qs, urlsplit

                    qs = parse_qs(urlsplit(self.path).query)
                    try:
                        seconds = float(qs.get("seconds", ["2"])[0])
                    except ValueError:
                        self._send(400, "seconds must be a number")
                        return
                    code, body = outer.render_profile(seconds)
                    self._send(code, body)
                else:
                    self._send(404, "not found")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # -- lifecycle -------------------------------------------------------

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "HealthServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="bcs-health", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "HealthServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- readiness wiring -------------------------------------------------

    def add_readiness(self, check: ReadinessCheck) -> None:
        self.readiness.append(check)

    # -- metrics rendering -------------------------------------------------

    def render_metrics(self) -> str:
        """Prometheus text exposition from the listener snapshot."""
        lines: list[str] = []
        snap = self.listener.snapshot() if self.listener is not None else {}
        for name, value in snap.items():
            if value is None:
                continue
            pname = _prom_escape(name)
            kind = "counter" if name.endswith("_total") else "gauge"
            lines.append(f"# TYPE {pname} {kind}")
            lines.append(f"{pname} {value}")
        # Latency histograms (reference SLO buckets, prometheus.go:134-139):
        # full cumulative-bucket exposition so histogram_quantile works.
        hists = getattr(self.listener, "histograms", None)
        if callable(hists):
            for name, (hist, help_text) in hists().items():
                lines.extend(hist.prom_lines(name, help_text))
        p = getattr(self.listener, "last_progress", None)
        if p is not None:
            lines.append("# TYPE cdc_last_batch_id gauge")
            lines.append(f"cdc_last_batch_id {p.batchId}")
        return "\n".join(lines) + "\n"

    def render_threads(self) -> str:
        """Py-spy-style dump of every live Python thread's stack — the
        /debug/pprof/goroutine analog for a Python driver. Driver-side
        only, like the reference's pprof (executor stacks belong to the
        cluster manager / Spark UI)."""
        import sys
        import threading as _threading
        import traceback

        names = {t.ident: t.name for t in _threading.enumerate()}
        out: list[str] = []
        for ident, frame in sorted(sys._current_frames().items()):
            out.append(f"--- thread {ident} ({names.get(ident, '?')}) ---")
            out.extend(s.rstrip() for s in traceback.format_stack(frame))
        return "\n".join(out) + "\n"

    def render_heap(self, top_n: int = 25) -> tuple[int, str]:
        """Driver-heap top allocations — the /debug/pprof/heap analog.
        tracemalloc must already be tracing (start the process with
        PYTHONTRACEMALLOC=1 or call tracemalloc.start(); tracing costs
        memory+time, so the server never turns it on behind the
        operator's back): 409 with the hint otherwise."""
        import tracemalloc

        if not tracemalloc.is_tracing():
            return 409, (
                "tracemalloc not tracing; start the driver with "
                "PYTHONTRACEMALLOC=1 (or call tracemalloc.start()) to "
                "enable heap profiling\n"
            )
        snap = tracemalloc.take_snapshot()
        stats = snap.statistics("lineno")[:top_n]
        total_kib = sum(s.size for s in snap.statistics("filename")) / 1024
        out = [f"# driver heap: {total_kib:.0f} KiB traced, top {top_n} by line"]
        out.extend(str(s) for s in stats)
        return 200, "\n".join(out) + "\n"

    def render_profile(
        self, seconds: float = 2.0, hz: int = 100, top_n: int = 50
    ) -> tuple[int, str]:
        """Time-sampled CPU profile of the driver's Python threads — the
        /debug/pprof/profile?seconds=N analog (reference
        internal/health/server.go:77-79), py-spy-shaped: repeated
        sys._current_frames() walks aggregated into flamegraph-collapsed
        stacks ("file:func;file:func ..." bottom→top) with sample counts.
        Pure stdlib, no tracing hooks installed — cost is the sampling
        loop itself, bounded by the 30 s cap. The sampling (handler)
        thread excludes itself."""
        import os
        import sys
        import threading as _threading
        import time

        if not (seconds == seconds and seconds > 0):  # NaN or non-positive
            return 400, "seconds must be positive\n"
        seconds = min(seconds, 30.0)  # bound the handler's walltime
        interval = 1.0 / max(1, min(hz, 500))
        me = _threading.get_ident()
        counts: dict[str, int] = {}
        samples = 0
        deadline = time.monotonic() + seconds
        while True:
            names = {t.ident: t.name for t in _threading.enumerate()}
            for ident, frame in sys._current_frames().items():
                if ident == me:
                    continue
                stack: list[str] = []
                f = frame
                while f is not None:
                    co = f.f_code
                    stack.append(
                        f"{os.path.basename(co.co_filename)}:{co.co_name}"
                    )
                    f = f.f_back
                key = (
                    names.get(ident, "?") + ";" + ";".join(reversed(stack))
                )
                counts[key] = counts.get(key, 0) + 1
            samples += 1
            if time.monotonic() >= deadline:
                break
            time.sleep(interval)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
        out = [
            f"# cpu profile: {samples} samples over {seconds:g}s "
            f"(collapsed stacks: '<thread>;<file:func>;...' sample-count)"
        ]
        out.extend(f"{stack} {n}" for stack, n in top)
        return 200, "\n".join(out) + "\n"
