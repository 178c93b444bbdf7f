"""Scale probe: run the corpus kernels on a ~100×-amplified documents table.

The driver's documents table is 500 rows at every SF, which cannot expose
quadratic blowups or single-partition hotspots. This probe fabricates a
corpus of N_COPIES mutated replicas (~50k docs, /tmp only — testdata is
never touched), runs the dedup/similarity kernels end-to-end, and reports
wall times plus the invariants that matter at 100 TB:

- candidate generation stays an equi-join (no CartesianProduct /
  BroadcastNestedLoopJoin in any plan),
- minhash signature aggregation partial-aggregates map-side,
- runtimes grow ~linearly in corpus size (compare N_COPIES=20 vs 100).

Usage: PYTHONPATH=/root/repo python tools/scale_probe.py [n_copies]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

from better_cdc_spark import llmops
from better_cdc_spark.io import load_table
from better_cdc_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def amplified_corpus(spark, n_copies: int):
    """n_copies mutated replicas of documents: unique ids, ~10% exact dupes,
    per-copy token prefix so most replicas are near-but-not-exact variants."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    copies = docs.crossJoin(
        spark.range(n_copies).select(F.col("id").alias("copy"))
    )
    return copies.select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        F.when(F.col("copy") % 10 == 0, F.col("text"))  # exact dupes
        .otherwise(F.concat(F.lit("v"), F.col("copy"), F.lit(" "), F.col("text")))
        .alias("text"),
    )


def no_product_join(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def main() -> int:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("scale-probe", cpus=32)
    corpus = amplified_corpus(spark, n_copies)
    path = tempfile.mkdtemp(prefix="bcs_scale_") + "/corpus"
    corpus.repartition(32).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()
    print(f"corpus: {n} docs ({n_copies} copies)")

    t0 = time.perf_counter()
    sigs = llmops.minhash_signatures(docs)
    n_sigs = sigs.count()
    t_sig = time.perf_counter() - t0
    print(f"minhash signatures: {n_sigs} in {t_sig:.1f}s "
          f"({n_sigs / t_sig:,.0f} docs/s)")

    t0 = time.perf_counter()
    cands = llmops.minhash_candidate_pairs(docs)
    assert no_product_join(cands), "candidate join degenerated to a product join"
    n_cand = cands.count()
    t_cand = time.perf_counter() - t0
    print(f"lsh candidate pairs: {n_cand} in {t_cand:.1f}s (equi-join verified)")

    t0 = time.perf_counter()
    dedup = (
        docs.withColumn("k", F.xxhash64("text"))
        .groupBy("k")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    n_dup = dedup.count()
    print(f"exact dedup groups: {n_dup} in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    sh = docs.select("doc_id", llmops.simhash64(F.col("text")).alias("sh"))
    # aggregate over sh so column pruning can't skip the UDF
    sh.agg(F.count_distinct("sh")).collect()
    print(f"simhash fingerprints: {n} in {time.perf_counter() - t0:.1f}s")

    # PQ: encode an amplified embedding corpus, then ADC-scan codes only.
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", llmops.as_double_vec("embedding").alias("v")
    )
    emb_big = emb.crossJoin(
        spark.range(n_copies).select(F.col("id").alias("copy"))
    ).select((F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"), "v")
    books = llmops.train_pq_codebooks(emb)
    t0 = time.perf_counter()
    codes = emb_big.select("vec_id", llmops.pq_encoder(books)(F.col("v")).alias("codes"))
    n_vec = codes.count()
    t_enc = time.perf_counter() - t0
    print(f"pq encode: {n_vec} vecs in {t_enc:.1f}s ({n_vec / t_enc:,.0f} vecs/s)")
    queries = [
        (r["vec_id"], __import__("numpy").asarray(r["v"]))
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    t0 = time.perf_counter()
    approx = codes.mapInPandas(
        llmops.pq_adc_kernel(books, queries), "qid long, nid long, approx double"
    )
    n_scored = approx.count()
    t_adc = time.perf_counter() - t0
    print(f"pq adc scan: {n_scored} scores in {t_adc:.1f}s "
          f"({n_scored / t_adc:,.0f} pair-scores/s)")

    return 0


if __name__ == "__main__":
    sys.exit(main())
