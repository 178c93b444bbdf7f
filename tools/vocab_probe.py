"""Vocabulary-independence probe for q96e's sparse TF-IDF verify.

The round-5 verdict accepted the sparse rewrite of q96e on the ARGUMENT
that its payload scales with doc length, never |vocab| — the dense
docs×vocab form it replaced is quadratic-in-vocabulary and would build
10^9–10^10 cells at web-corpus vocabularies. This probe supplies the
empirical proof: the SAME clustered near-duplicate workload (fixed doc
count, fixed doc length, fixed candidate structure) is run through the
registered q96e pipeline at a small and a 100k+ vocabulary, recording
wall time and total shuffle-write bytes (Spark REST API). If the sparse
claim holds, both stay flat while the dense form's cell count grows
linearly in |vocab|; a vocab-proportional regression in either number
means a densification crept back into the plan.

Corpus: n_base clusters of `copies` near-duplicate docs (each replica
mutates 1 of the 50 terms → cosine ≈ 0.98, above the 0.95 τ), terms
drawn deterministically from a V-term vocabulary — the ~n_base·C(5,2)
intra-cluster pairs dominate the verify workload at every V (small
vocabularies add some cross-cluster collisions on top; that surplus is
the small-V run's problem, not the big-V run's).

Usage: PYTHONPATH=/root/repo python tools/vocab_probe.py [V_small V_big]
Defaults: 10_000 150_000. Run SOLO (shuffle-byte attribution assumes one
app on the REST endpoint; concurrent sessions also crater walls).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_BASE = 2_000
COPIES = 5
DOC_LEN = 50
MUTATE = 1
UI_PORT = 4077


def get_spark_with_ui() -> SparkSession:
    return (
        SparkSession.builder.master("local[8]")
        .appName("vocab-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")  # REST metrics need the UI
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def shuffle_write_bytes(spark: SparkSession) -> int:
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def synth_corpus(spark: SparkSession, vocab: int):
    """Deterministic clustered corpus: doc_id = base*COPIES + copy; term
    j of a base doc is t[(base*17 + j*29) mod V]; each non-zero copy
    swaps the first MUTATE terms for copy-specific ones."""
    ids = spark.range(N_BASE * COPIES).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / COPIES).cast("long").alias("base"),
        (F.col("id") % COPIES).alias("copy"),
    )
    term = lambda expr: F.concat(F.lit("t"), expr.cast("string"))  # noqa: E731
    terms = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
        lambda j: F.when(
            (j < MUTATE) & (F.col("copy") > 0),
            term((F.col("base") * 17 + j * 29 + F.col("copy") * 7919) % vocab),
        ).otherwise(term((F.col("base") * 17 + j * 29) % vocab)),
    )
    return ids.select("doc_id", F.concat_ws(" ", terms).alias("text"))


def run_once(spark: SparkSession, vocab: int) -> dict:
    import shutil

    from better_cdc_spark.queries import load_all

    registry = load_all()
    sf_dir = tempfile.mkdtemp(prefix=f"bcs_vocab_{vocab}_")
    try:
        synth_corpus(spark, vocab).coalesce(8).write.parquet(
            f"{sf_dir}/documents.parquet"
        )
        fn = registry["q96e_tfidf_cosine"].fn

        wall, pairs, sw = float("inf"), 0, 0
        for _ in range(2):  # min-of-2: first run pays plan compilation
            sw0 = shuffle_write_bytes(spark)
            t0 = time.perf_counter()
            pairs = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if dt < wall:
                wall, sw = dt, shuffle_write_bytes(spark) - sw0
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)
    n_docs = N_BASE * COPIES
    return {
        "vocab": vocab,
        "docs": n_docs,
        "pairs": pairs,
        "wall_s": round(wall, 2),
        "shuffle_mb": round(sw / 1e6, 1),
        "dense_cells": n_docs * vocab,  # what the replaced form would build
    }


def main() -> int:
    v_small = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    v_big = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    spark = get_spark_with_ui()
    spark.sparkContext.setLogLevel("ERROR")
    rows = [run_once(spark, v) for v in (v_small, v_big)]
    for r in rows:
        print(json.dumps(r))
    ratio = rows[1]["wall_s"] / max(rows[0]["wall_s"], 1e-9)
    sratio = rows[1]["shuffle_mb"] / max(rows[0]["shuffle_mb"], 1e-9)
    vratio = v_big / v_small
    print(
        f"vocab x{vratio:.0f}: wall x{ratio:.2f}, shuffle x{sratio:.2f}, "
        f"dense cells would grow x{vratio:.0f} "
        f"(to {rows[1]['dense_cells']:.1e})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
