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
        }
