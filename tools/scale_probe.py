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


def timed(label: str, action, unit: str = "docs"):
    """min-of-2: the first run pays Python-worker spawn, scan warm-up, and
    plan compilation (historically 10-20x on UDF kernels — see bench.py's
    identical policy); the min is the steady-state data path."""
    best, count = float("inf"), 0
    for _ in range(2):
        t0 = time.perf_counter()
        count = action()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {count} in {best:.1f}s ({count / best:,.0f} {unit}/s)")
    return count


def main() -> int:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("scale-probe", cpus=32)
    corpus = amplified_corpus(spark, n_copies)
    path = tempfile.mkdtemp(prefix="bcs_scale_") + "/corpus"
    corpus.repartition(32).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()
    print(f"corpus: {n} docs ({n_copies} copies)")

    timed("minhash signatures", lambda: llmops.minhash_signatures(docs).count())

    cands = llmops.minhash_candidate_pairs(docs)
    assert no_product_join(cands), "candidate join degenerated to a product join"
    timed("lsh candidate pairs (equi-join verified)",
          lambda: llmops.minhash_candidate_pairs(docs).count(), unit="pairs")

    def dedup_count():
        return (
            docs.withColumn("k", F.xxhash64("text"))
            .groupBy("k")
            .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )

    timed("exact dedup groups", dedup_count, unit="groups")

    def chunk_dedup_count():
        # q95e's scale form: the first-occurrence window keys on
        # xxhash64(chunk) so shuffle rows carry 8 bytes, not chunk text.
        from pyspark.sql import Window as W

        words = F.split(F.col("text"), " ")
        n_chunks = F.ceil(F.size(words) / F.lit(10.0)).cast("int")
        chunked = docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i * 10 + 1, 10))),
                )
            ).alias("chunk_idx", "chunk_key"),
        )
        w = W.partitionBy("chunk_key").orderBy("doc_id", "chunk_idx")
        kept = (
            chunked.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        )
        assert no_product_join(kept), "chunk dedup must stay join-free"
        return kept.groupBy("doc_id").count().count()

    timed("chunk dedup survivors", chunk_dedup_count, unit="docs")

    def simhash_all():
        sh = docs.select("doc_id", llmops.simhash64(F.col("text")).alias("sh"))
        # aggregate over sh so column pruning can't skip the UDF
        sh.agg(F.count_distinct("sh")).collect()
        return n

    timed("simhash fingerprints", simhash_all)

    # PQ: encode an amplified embedding corpus, then ADC-scan codes only.
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", llmops.as_double_vec("embedding").alias("v")
    )
    emb_big = emb.crossJoin(
        spark.range(n_copies).select(F.col("id").alias("copy"))
    ).select((F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"), "v")
    books = llmops.train_pq_codebooks(emb)
    codes = emb_big.select("vec_id", llmops.pq_encoder(books)(F.col("v")).alias("codes"))

    def encode_count():
        # force the UDF: count() alone would prune the codes column
        return codes.filter(F.size("codes") > 0).count()

    timed("pq encode", encode_count, unit="vecs")
    queries = [
        (r["vec_id"], __import__("numpy").asarray(r["v"]))
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]

    def adc_count():
        return codes.mapInPandas(
            llmops.pq_adc_kernel(books, queries), "qid long, nid long, approx double"
        ).count()

    timed("pq adc scan", adc_count, unit="pair-scores")

    # SemDeDup assignment: the literal-argmin projection must add ZERO
    # exchanges — the only shuffle in assign-then-count is the count's own
    # groupBy. (The Lloyd update's kxdim model exchange is probed by the
    # registered query; here we probe the per-vector assignment rate.)
    unit_big = emb_big.withColumn("nrm", llmops.l2_norm(F.col("v"))).select(
        "vec_id", F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("u")
    )
    seeds = [r["u"] for r in unit_big.orderBy("vec_id").limit(8).collect()]
    assigned_counts = unit_big.withColumn(
        "c", llmops.nearest_centroid(seeds, "u")
    ).groupBy("c").count()
    plan = assigned_counts._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange") - plan.count("AQEShuffleRead")
    assert n_exchanges <= 2, f"assignment added exchanges:\n{plan[:2000]}"

    n_vecs = emb_big.count()

    def assign_all():
        assigned_counts.collect()
        return n_vecs

    timed("semdedup k-means assignment", assign_all, unit="vecs")

    # Bloom decontamination probe: 16 KiB bitset from the base benchmark,
    # membership over the amplified corpus's shingles — must stay join-free.
    base_docs = docs.filter(F.col("doc_id") < 20).select(
        "doc_id", F.lower(F.regexp_replace("text", llmops.PUNCT_RE, "")).alias("text")
    )
    bench_sh = (
        base_docs.select(llmops.tokens().alias("w"))
        .select(F.explode(llmops.word_shingles("w", k=8)).alias("shingle"))
        .distinct()
    )
    bits = llmops.build_bloom_bits(bench_sh)
    corpus_sh = (
        docs.select(F.lower(F.regexp_replace("text", llmops.PUNCT_RE, "")).alias("text"))
        .select(llmops.tokens().alias("w"))
        .select(F.explode(llmops.word_shingles("w", k=8)).alias("shingle"))
        .localCheckpoint(eager=True)  # time the PROBE, not shingle generation
    )
    n_sh = corpus_sh.count()
    flagged = corpus_sh.filter(llmops.bloom_probe(bits, F.col("shingle")))
    assert no_product_join(flagged) and "Join" not in (
        flagged._jdf.queryExecution().executedPlan().toString()
    ), "bloom probe must be join-free"

    def bloom_all():
        flagged.count()
        return n_sh

    timed("bloom membership probe", bloom_all, unit="shingles")

    return 0


if __name__ == "__main__":
    sys.exit(main())
