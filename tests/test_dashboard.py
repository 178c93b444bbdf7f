"""Grafana dashboard ↔ /metrics contract.

The committed dashboard (monitoring/grafana/dashboards/cdc-dashboard.json,
mirroring the reference's monitoring/grafana/dashboards/cdc-dashboard.json)
must only query metric names this engine actually exports: every
``cdc_*`` identifier referenced by a panel expr — with the Prometheus
histogram ``_bucket``/``_sum``/``_count`` suffixes folded back to their
base series — has to appear in a primed /metrics scrape, or the panel
renders "no data" forever.
"""

from __future__ import annotations

import json
import os
import re

from better_cdc_spark.health import HealthServer
from better_cdc_spark.metrics import CDCMetricsListener

DASH_PATH = os.path.join(
    os.path.dirname(__file__), "..", "monitoring", "grafana", "dashboards",
    "cdc-dashboard.json",
)


def _dashboard_exprs() -> list[str]:
    dash = json.load(open(DASH_PATH))
    exprs = []
    for panel in dash["panels"]:
        for target in panel.get("targets", []):
            exprs.append(target["expr"])
    return exprs


def _referenced_metrics(exprs: list[str]) -> set[str]:
    names = set()
    for expr in exprs:
        for m in re.findall(r"\bcdc_[a-z0-9_]+", expr):
            names.add(re.sub(r"_(bucket|sum|count)$", "", m))
    return names


def _primed_listener() -> CDCMetricsListener:
    """A listener with every snapshot field non-None (render_metrics
    drops None values, so an unprimed field would hide a name)."""
    listener = CDCMetricsListener()
    listener.events_total = 100
    listener.commits_total = 3
    listener.batches_total = 4
    listener.total_batch_duration_ms = 40.0
    listener.last_batch_duration_ms = 10.0
    listener.last_rows_per_second = 250.0
    listener.replication_lag_ms = 12.5
    listener.batch_latency_us.observe(750.0, n=4)
    listener.transform_latency_ns.observe(300.0, n=100)

    class _Progress:  # the one field render_metrics reads
        batchId = 7

    listener.last_progress = _Progress()
    return listener


def test_every_dashboard_metric_is_exported():
    exprs = _dashboard_exprs()
    assert exprs, "dashboard has no panel targets"
    referenced = _referenced_metrics(exprs)
    assert referenced, "dashboard references no cdc_* metrics"

    text = HealthServer(listener=_primed_listener()).render_metrics()
    exported = set(re.findall(r"^(cdc_[a-z0-9_]+)(?:\{| )", text, re.M))
    exported = {re.sub(r"_(bucket|sum|count)$", "", n) for n in exported}

    missing = sorted(referenced - exported)
    assert not missing, f"dashboard queries unexported metrics: {missing}"


def test_histogram_panels_use_rate_over_buckets():
    """The latency panels must follow the reference's PromQL shape —
    histogram_quantile over sum(rate(..._bucket[5m])) by (le) — so they
    survive counter resets and multi-instance scrapes."""
    exprs = _dashboard_exprs()
    hq = [e for e in exprs if "histogram_quantile" in e]
    assert len(hq) >= 6  # p50/p90/p99 for both SLO histograms
    for e in hq:
        assert re.search(r"sum\(rate\(cdc_engine_\w+_bucket\[5m\]\)\) by \(le\)", e), e


def test_dashboard_is_valid_grafana_shape():
    dash = json.load(open(DASH_PATH))
    assert dash["title"] and dash["uid"]
    assert isinstance(dash["panels"], list) and dash["panels"]
    for panel in dash["panels"]:
        assert panel["type"] in ("timeseries", "stat")
        assert panel["title"]
        assert "gridPos" in panel
