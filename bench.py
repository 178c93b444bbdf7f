"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}. The driver records this as BENCH_r{N}.json.

Each timed run executes the full plan and consumes results via count()
(no driver-side materialization of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from better_cdc_spark.queries import load_all
from better_cdc_spark.session import DEFAULT_SF_DIR, get_spark

# Headline set: one per operator family, heaviest variants.
HEADLINE = [
    "q30_grouped_agg_tpch_q1",   # scan-heavy grouped agg
    "q20_inner_join",            # shuffle join
    "q25_broadcast_join",        # broadcast star join
    "q27_asof_join",             # union-merge as-of join
    "qh05_local_supplier_volume",  # 6-table snowflake join chain
    "qh08_market_share",         # 8-table join + conditional agg
    "qh21_waiting_supplier",     # join + EXISTS + NOT EXISTS self-joins
    "q40_ranking_windows",       # window functions
    "q52_topk_per_group",        # join + topk window
    "q34_having",                # high-cardinality agg
    "q36_stat_aggs",             # stats aggs
    "qc01_cdc_normalize",        # CDC envelope pipeline (flagship CDC path)
    "q95_exact_dedup",           # content-hash dedup shuffle
    "q96_minhash_lsh",           # minhash sigs + LSH band join + verify
    "q97_cosine_topk",           # embedding scoring + topk window
    "q98_text_stats",            # regex/higher-order text kernels
    "q94_curation_pipeline",     # composed quality->dedup->near-dedup flow
    "q94d_curation_pipeline_lsh",  # the production LSH-driven composite
    "q96d_semdedup",             # distributed k-means + cluster-pruned dedup
    "q96e_tfidf_cosine",         # prefix-filtered sparse similarity join
    "q97h_bm25_topk",            # inverted-index lexical retrieval
    "q95p_dup_span_extract",     # cross-doc span dedup + island merge
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    registry = load_all()
    names = [n for n in HEADLINE if n in registry]

    # Warm-up: JVM + parquet footer caches, one light action.
    registry["q30_grouped_agg_tpch_q1"].fn(spark, sf_dir).count()

    # min of 3 runs: the first run pays one-time plan compilation / AQE
    # scheduling, and this VM's wall clock is noisy (±20-30% run-to-run);
    # the min reflects the engine's steady-state data path, which is what
    # the cross-round 2x regression envelope should track.
    times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)

    # e2e CDC load rig (the reference's scripts/e2e-load-test.sh analog):
    # full pipeline ops/sec as a sibling metric. n_ops is recorded in the
    # row — compare ops/sec only at equal n_ops across rounds.
    from tools.e2e_load import run_load

    e2e_ops = int(os.environ.get("SPARK_GRAFT_E2E_OPS", "300000"))
    cdc_e2e = run_load(spark, e2e_ops, n_batches=4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cdc_e2e": cdc_e2e,
            }
        )
    )


if __name__ == "__main__":
    main()
