"""Bench plumbing the driver runs per-round: drift probes + sf1 probe.

bench.py's per-class drift probes and the sf1 scaling probe execute only
inside the driver's bench run, so a wiring break would surface as a
missing BENCH block instead of a red test. These smoke the pieces at
sf0.001 (seconds, not the sf0.1 minutes the real bench pays).
"""

from __future__ import annotations

import pytest

import bench

SF_DIR = "/root/testdata/sf0.001"


def test_class_probes_return_positive_walls(spark):
    walls = bench.run_class_probes(spark, SF_DIR)
    assert set(walls) == {"shuffle", "cpu"}
    assert all(isinstance(v, float) and v > 0 for v in walls.values())


def test_drift_class_covers_every_reference_query():
    """Every query with an r1/r4 reference must have a drift class, or
    the class-median normalization silently falls back to the global
    median for it."""
    referenced = set(bench.R1_BASELINE) | set(bench.R4_REFERENCE)
    missing = referenced - set(bench.DRIFT_CLASS)
    assert not missing, f"reference queries without a drift class: {missing}"
    assert set(bench.DRIFT_CLASS.values()) == {"shuffle", "cpu"}
    assert set(bench.PROBE_ANCHOR) == {"shuffle", "cpu"}


@pytest.mark.slow  # full-tier: `make test-full` (r16 two-tier split)
def test_sf1_scaling_fabricates_and_measures(spark):
    """The sf1 probe fabricates the amplified corpus and produces a
    wall + rows + exponent row per probed query (one fast query here;
    the real run probes all of SF1_QUERIES at sf0.1)."""
    res = bench.run_sf1_scaling(spark, SF_DIR, {"q97h_bm25_topk": 1.0})
    assert res["amplification"] == 10
    row = res["queries"]["q97h_bm25_topk"]
    assert row["sf1_sec"] > 0 and row["rows_sf1"] >= row["rows_sf01"] > 0
    assert "exponent" in row and "rows_ratio" in row
    # the other registry queries were skipped (no base time supplied);
    # extra probe-only twins always run and time their own base
    assert set(res["queries"]) == {"q97h_bm25_topk", "q99q_banded_linear"}
    lin = res["queries"]["q99q_banded_linear"]
    assert lin["sf01_sec"] > 0 and lin["sf1_sec"] > 0
    # constant cluster size: true pair count grows ~linearly (10x data
    # -> ~10x rows), NOT quadratically like q99q's 160-image fixture
    assert lin["rows_ratio"] <= 15, lin
    for name in bench.SF1_QUERIES:
        assert name in bench.HEADLINE, f"{name} probed but not a headline query"
    for name in bench.SF1_EXTRA_PROBES:
        assert name not in bench.HEADLINE  # probe-only, not a headline entry


def test_compact_line_fits_driver_tail_window():
    """The driver parses bench's LAST stdout line from a 2000-byte tail;
    build_compact_line must stay under that against the committed full
    artifact (and degrade by dropping per-query detail, never clipping)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "bench_full_latest.json")
    full = json.load(open(path))
    line = bench.build_compact_line(full)
    assert len(line) < 2000, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert "e2e_1m_pinned_r13_ops_per_sec" in parsed
    # app-mode 1M pin (tools/app_load.py): must ride along with the rig pin
    # and carry its vs-rig ratio so the compact line proves the composed
    # entrypoint holds rig throughput
    assert parsed["app_1m_pinned_r14_ops_per_sec"] == bench.APP_SCALE_1M["value"]
    assert parsed["app_1m_pinned_r14_vs_rig"] == bench.APP_SCALE_1M["vs_rig_ratio"]
    assert "sf1_exponent_max" in parsed
    # degradation path: an absurdly wide queries dict still fits
    wide = dict(full, queries={f"q{i:03d}_padpadpad": 1.234 for i in range(200)})
    line2 = bench.build_compact_line(wide)
    assert len(line2) < 2000
    assert json.loads(line2)["queries"] == {"_see": "bench_full_latest.json"}


def test_r14_anchor_matches_committed_provenance():
    """bench.R14_ANCHOR is the pinned copy of ANCHORS_R14.json (the
    committed measurement artifact with full provenance); the two must
    never drift, and the anchored set must be exactly the r1+r4
    reference-tracked queries so no headline query silently loses its
    honest current-profile reading."""
    import json
    from pathlib import Path

    doc = json.loads(
        (Path(bench.__file__).resolve().parent / "ANCHORS_R14.json").read_text()
    )
    assert doc["_provenance"]["measured_round"] == 14
    assert doc["_provenance"]["solo"] is True
    committed = {n: a["anchor_sec"] for n, a in doc["anchors"].items()}
    assert committed == bench.R14_ANCHOR
    assert set(bench.R14_ANCHOR) == set(bench.R1_BASELINE) | set(bench.R4_REFERENCE)
    # each anchor is the median of its three committed rep-mins
    for n, a in doc["anchors"].items():
        import statistics

        assert a["anchor_sec"] == round(statistics.median(a["rep_mins"]), 3), n
