"""Core-scaling evidence at the sf1-equivalent corpus (r16, VERDICT item 1).

At sf0.1 every headline query is 0.2-4 s and fixed per-job cost dominates,
so 8-core vs 32-core walls are ~equal and the bench cannot demonstrate
parallel scaling. This probe times the heavy similarity family against the
PERSISTED 10x amplified corpus (tools/sf1_corpus.py) at the CURRENT
$SPARK_GRAFT_CPUS, warm min-of-2 per query — run it once with
SPARK_GRAFT_CPUS=32 and once with 8 (fresh process each, Spark master is
fixed per JVM) and compare.

    SPARK_GRAFT_CPUS=32 PYTHONPATH=/root/repo python tools/sf1_scaling_probe.py /tmp/bcs_sf1_ab
    SPARK_GRAFT_CPUS=8  PYTHONPATH=/root/repo python tools/sf1_scaling_probe.py /tmp/bcs_sf1_ab
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "q94_curation_pipeline",
    "q94d_curation_pipeline_lsh",
    "q96_minhash_lsh",
    "q96e_tfidf_cosine",
    "q97h_bm25_topk",
    "q95p_dup_span_extract",
    "q96d_semdedup",
)


def main() -> int:
    from better_cdc_spark.queries import load_all
    from better_cdc_spark.session import CPUS, get_spark

    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bcs_sf1_ab"
    registry = load_all()
    spark = get_spark("sf1-scaling-probe")
    print(f"cpus={CPUS} sf1_dir={sf1_dir}", flush=True)
    out = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"sf1probe:{name}")
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            registry[name].fn(spark, sf1_dir).count()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = min(walls)
        print(f"SF1SCALE cpus={CPUS} {name} min={min(walls):.3f} all={walls}",
              flush=True)
    print("TOTAL", round(sum(out.values()), 2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
