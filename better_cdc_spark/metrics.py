"""Observability: R21 parity via Spark's observe() API + query listeners.

The reference exports Prometheus counters/gauges/histograms from hand-rolled
atomics (internal/metrics/metrics.go:12-201, prometheus.go:98-174):
events_total, batches_total, batch latency, replication lag, quarantined
count. Spark-first, the same signals come for free from the streaming
progress feed plus per-batch observed metrics:

- ``with_stream_metrics(df)`` attaches ``observe()`` aggregates evaluated
  inside the running query (no extra pass over the data — the metrics ride
  the existing plan).
- ``CDCMetricsListener`` subscribes to query progress and folds each
  micro-batch's numbers into reference-named counters; ``snapshot()`` is
  the Prometheus-scrape analog.

Replication lag ≡ wall clock − max(commit_time) observed in the batch
(reference: internal/metrics/prometheus.go:154-155, computed at
pgoutput.go:258-262).

Scale: listener work is O(1) per micro-batch on the driver; observed
metrics are partial-aggregated on executors like any agg.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "cdc_source"

# Reference SLO buckets (internal/metrics/prometheus.go:134-139): batch
# publish latency in MICROseconds, per-event transform latency in
# NANOseconds. Names + buckets match so the reference's Grafana dashboard
# (histogram_quantile over *_bucket{le}) keys one-to-one.
BATCH_LATENCY_BUCKETS_US = (100.0, 500.0, 1000.0, 5000.0, 10000.0, 50000.0, 100000.0)
TRANSFORM_LATENCY_BUCKETS_NS = (100.0, 500.0, 1000.0, 5000.0, 10000.0, 50000.0)


class LatencyHistogram:
    """Prometheus-style cumulative histogram: fixed upper bounds + +Inf.

    O(#buckets) per observe, O(1) memory — listener-thread safe in CPython
    (single driver thread feeds it; reads are approximate scrapes, same as
    Prometheus). ``observe(v, n)`` adds n observations of value v so a
    batch of N uniform events costs one call, not N.
    """

    def __init__(self, uppers: tuple[float, ...]) -> None:
        self.uppers = tuple(sorted(uppers))
        self.bucket_counts = [0] * (len(self.uppers) + 1)  # +Inf last
        self.sum = 0.0
        self.count = 0

    def observe(self, value: float, n: int = 1) -> None:
        for i, ub in enumerate(self.uppers):
            if value <= ub:
                self.bucket_counts[i] += n
                break
        else:
            self.bucket_counts[-1] += n
        self.sum += value * n
        self.count += n

    def quantile(self, q: float) -> float | None:
        """histogram_quantile semantics: linear interpolation inside the
        target bucket; observations in +Inf clamp to the largest finite
        upper bound (what PromQL returns for quantiles landing there)."""
        if self.count == 0:
            return None
        rank = q * self.count
        cum = 0
        lower = 0.0
        for i, ub in enumerate(self.uppers):
            prev = cum
            cum += self.bucket_counts[i]
            if cum >= rank:
                frac = (rank - prev) / max(self.bucket_counts[i], 1)
                return round(lower + (ub - lower) * frac, 3)
            lower = ub
        return self.uppers[-1] if self.uppers else None

    def prom_lines(self, name: str, help_text: str) -> list[str]:
        """Text exposition: # HELP/# TYPE + cumulative _bucket/_sum/_count."""
        lines = [f"# HELP {name} {help_text}", f"# TYPE {name} histogram"]
        cum = 0
        for i, ub in enumerate(self.uppers):
            cum += self.bucket_counts[i]
            le = f"{ub:g}"
            lines.append(f'{name}_bucket{{le="{le}"}} {cum}')
        cum += self.bucket_counts[-1]
        lines.append(f'{name}_bucket{{le="+Inf"}} {cum}')
        lines.append(f"{name}_sum {round(self.sum, 3)}")
        lines.append(f"{name}_count {self.count}")
        return lines


def with_stream_metrics(df: DataFrame, name: str = OBSERVATION_NAME) -> DataFrame:
    """Attach observed metrics to a (streaming) changelog DataFrame.

    events_total / commits_total / max_commit_ts are computed inside the
    query per micro-batch and surfaced through the progress feed — the
    zero-cost analog of the reference's per-batch counter increments
    (internal/engine/engine.go:340-363).
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("events_total"),
        F.sum(F.when(F.col("action") == "C", 1).otherwise(0)).alias("commits_total"),
        F.max("timestamp").alias("max_commit_ts"),
    )


class CDCMetricsListener(StreamingQueryListener):
    """Folds progress events into reference-named counters.

    Counter names mirror internal/metrics/metrics.go so dashboards keyed
    to the reference translate one-to-one: cdc_events_processed_total,
    cdc_batches_total, cdc_batch_duration_ms, cdc_replication_lag_ms.
    """

    def __init__(self) -> None:
        self.events_total = 0
        self.commits_total = 0
        self.batches_total = 0
        self.last_batch_duration_ms: float | None = None
        self.total_batch_duration_ms = 0.0
        self.last_rows_per_second: float | None = None
        self.replication_lag_ms: float | None = None
        self.last_progress: Any = None
        # Reference-parity latency histograms (prometheus.go:134-139):
        # batch latency in µs; per-event transform latency in ns (the
        # micro-batch's addBatch wall divided across its rows, observed
        # row-weighted — Spark transforms a batch at a time, so per-event
        # latency is uniform within one batch by construction).
        self.batch_latency_us = LatencyHistogram(BATCH_LATENCY_BUCKETS_US)
        self.transform_latency_ns = LatencyHistogram(TRANSFORM_LATENCY_BUCKETS_NS)

    # -- StreamingQueryListener interface --------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: D102
        pass

    def onQueryProgress(self, event) -> None:  # noqa: D102
        p = event.progress
        self.last_progress = p
        if p.numInputRows == 0 and not p.observedMetrics:
            return  # idle trigger — reference counts only real batches
        self.batches_total += 1
        dur = (p.durationMs or {}).get("triggerExecution")
        if dur is not None:
            self.last_batch_duration_ms = float(dur)
            self.total_batch_duration_ms += float(dur)
            self.batch_latency_us.observe(float(dur) * 1000.0)
        xform = (p.durationMs or {}).get("addBatch", dur)
        n_rows = int(p.numInputRows or 0)
        if xform is not None and n_rows > 0:
            per_event_ns = float(xform) * 1_000_000.0 / n_rows
            self.transform_latency_ns.observe(per_event_ns, n=n_rows)
        if p.processedRowsPerSecond:
            self.last_rows_per_second = float(p.processedRowsPerSecond)
        obs = (p.observedMetrics or {}).get(OBSERVATION_NAME)
        if obs is not None:
            self.events_total += int(obs["events_total"] or 0)
            self.commits_total += int(obs["commits_total"] or 0)
            max_commit = obs["max_commit_ts"]
            if max_commit is not None:
                lag = time.time() - max_commit.timestamp()
                self.replication_lag_ms = round(lag * 1000.0, 3)
        else:
            self.events_total += int(p.numInputRows)

    def onQueryIdle(self, event) -> None:  # noqa: D102
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: D102
        pass

    # -- scrape ----------------------------------------------------------

    def snapshot(self) -> dict[str, float | int | None]:
        """Point-in-time metric values (the /metrics endpoint analog)."""
        avg = (
            self.total_batch_duration_ms / self.batches_total
            if self.batches_total
            else None
        )
        return {
            "cdc_events_processed_total": self.events_total,
            "cdc_commits_total": self.commits_total,
            "cdc_batches_total": self.batches_total,
            "cdc_batch_duration_ms_last": self.last_batch_duration_ms,
            "cdc_batch_duration_ms_avg": avg,
            "cdc_rows_per_second_last": self.last_rows_per_second,
            "cdc_replication_lag_ms": self.replication_lag_ms,
            # dashboard percentiles (cdc-dashboard.json computes these via
            # histogram_quantile; the snapshot precomputes them for
            # scrapers without a PromQL engine)
            "cdc_batch_latency_us_p50": self.batch_latency_us.quantile(0.50),
            "cdc_batch_latency_us_p90": self.batch_latency_us.quantile(0.90),
            "cdc_batch_latency_us_p99": self.batch_latency_us.quantile(0.99),
            "cdc_transform_latency_ns_p50": self.transform_latency_ns.quantile(0.50),
            "cdc_transform_latency_ns_p90": self.transform_latency_ns.quantile(0.90),
            "cdc_transform_latency_ns_p99": self.transform_latency_ns.quantile(0.99),
        }

    def histograms(self) -> dict[str, tuple[LatencyHistogram, str]]:
        """name -> (histogram, help) for the /metrics text exposition.
        Names match the reference exactly (namespace_subsystem_name) so
        the shipped Grafana dashboard's histogram_quantile queries work
        unmodified against this engine's scrape."""
        return {
            "cdc_engine_batch_latency_microseconds": (
                self.batch_latency_us,
                "Batch publishing latency in microseconds",
            ),
            "cdc_engine_transform_latency_nanoseconds": (
                self.transform_latency_ns,
                "Event transformation latency in nanoseconds",
            ),
        }
