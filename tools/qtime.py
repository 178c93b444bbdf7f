"""Time individual registry queries with the bench methodology (min-of-3
warm `.count()` on a get_spark session, q30 warm-up first) — the isolation
harness for optimization rounds.

    PYTHONPATH=/root/repo python tools/qtime.py q96e_tfidf_cosine [more...]
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... override as usual
    QTIME_REPS=N for a different rep count; QTIME_NOOP=1 times the noop
    sink (guide §1.4) instead of count() for column-pruning-proof timing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from better_cdc_spark.queries import load_all
from better_cdc_spark.session import DEFAULT_SF_DIR, get_spark


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: qtime.py <query> [query...]")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    reps = int(os.environ.get("QTIME_REPS", "3"))
    use_noop = os.environ.get("QTIME_NOOP", "0") == "1"
    registry = load_all()
    spark = get_spark("qtime")
    registry["q30_grouped_agg_tpch_q1"].fn(spark, sf_dir).count()

    for name in names:
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"QTIME {name} min={min(walls):.3f} "
            f"all={[round(w, 3) for w in walls]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
