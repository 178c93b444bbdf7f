"""Re-anchor the drift-tracked headline queries on the CURRENT VM profile
(r13 verdict item 1, option a): the r1/r4 anchors are nine-plus rounds and
several VM-profile shifts old, and q97h_bm25_topk's class-normalized ratio
crept upward for three rounds on byte-identical code — anchor rot, not a
plan defect (the committed r13 plan pin shows the intended shape).

Method — matches bench.py's headline convention exactly so anchor and
future measurement are the same experiment:
  * SOLO, sf0.1, local[32]; one warm-up action before timing
  * per query: min of 3 consecutive runs (steady-state data path)
  * the whole pass repeated in R=3 INDEPENDENT JVMs (fresh SparkSession
    per rep); the committed anchor is the MEDIAN of the three min-of-3
    walls, so one hot/cold rep cannot set the anchor
Writes ANCHORS_R14.json (committed with provenance); bench.py pins the
resulting dict as R14_ANCHOR. The r1/r4 series stays in bench.py and
PLANS.md for history.

Run: PYTHONPATH=. python tools/reanchor.py [sf_dir]  (SOLO — no other
Spark session may run concurrently or walls crater 3-8x.)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# The anchor-tracked set, derived from bench.py's reference dicts (NOT a
# hand-copy): a future round that adds a headline query to R1_BASELINE /
# R4_REFERENCE is automatically measured on the next reanchor run, and
# test_r14_anchor_matches_committed_provenance keeps the committed JSON
# honest against the same source of truth.
sys.path.insert(0, str(REPO))
import bench  # noqa: E402

ANCHORED = sorted(set(bench.R1_BASELINE) | set(bench.R4_REFERENCE))

_REP_SNIPPET = r"""
import json, sys, time
from better_cdc_spark.session import get_spark
from better_cdc_spark.queries import load_all

sf_dir, names = sys.argv[1], json.loads(sys.argv[2])
spark = get_spark("reanchor", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()
reg["q30_grouped_agg_tpch_q1"].fn(spark, sf_dir).count()  # warm-up
out = {}
for name in names:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("ANCHOR_REP " + json.dumps(out))
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps: list[dict[str, float]] = []
    for rep in range(3):
        proc = subprocess.run(
            [sys.executable, "-c", _REP_SNIPPET, sf_dir, json.dumps(ANCHORED)],
            capture_output=True, text=True, timeout=1800,
            env={**os.environ, "PYTHONPATH": str(REPO)}, cwd=str(REPO),
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("ANCHOR_REP ")),
            None,
        )
        if proc.returncode != 0 or line is None:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            return 1
        walls = json.loads(line[len("ANCHOR_REP "):])
        reps.append(walls)
        print(f"rep {rep + 1}/3: total {round(sum(walls.values()), 2)} s")

    import pyspark

    anchors = {
        n: {
            "anchor_sec": round(statistics.median(r[n] for r in reps), 3),
            "rep_mins": [r[n] for r in reps],
        }
        for n in ANCHORED
    }
    doc = {
        "_provenance": {
            "measured_round": 14,
            "sf_dir": sf_dir,
            "method": "median over 3 independent JVMs of (min of 3 warm runs)",
            "solo": True,
            "cpus": 32,
            "pyspark": pyspark.__version__,
        },
        "anchors": anchors,
    }
    out_path = REPO / "ANCHORS_R14.json"
    out_path.write_text(json.dumps(doc, indent=2) + "\n")
    print(f"wrote {out_path}")
    for n, a in anchors.items():
        print(f"  {n}: {a['anchor_sec']} {a['rep_mins']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
