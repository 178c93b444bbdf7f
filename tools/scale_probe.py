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
    """Thin wrapper: every mkdtemp the probe makes is rmtree'd on the way
    out (the amplified corpus is hundreds of MB — same /tmp-leak advisory
    class as bench.py's sf1 probe, fixed round 13)."""
    import shutil

    dirs: list[str] = []

    def probe_tmpdir(prefix: str) -> str:
        d = tempfile.mkdtemp(prefix=prefix)
        dirs.append(d)
        return d

    try:
        return _probe(probe_tmpdir)
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


def _probe(probe_tmpdir) -> int:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("scale-probe", cpus=32)
    corpus = amplified_corpus(spark, n_copies)
    path = probe_tmpdir("bcs_scale_") + "/corpus"
    corpus.repartition(32).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()
    print(f"corpus: {n} docs ({n_copies} copies)")

    timed("minhash signatures", lambda: llmops.minhash_signatures(docs).count())

    # q96g's bet: one xxhash64 + per-bin min per posting vs 64 affine
    # lanes — the signature stage should win big while banding/verify
    # stay identical. Timed on the same corpus right after the classic
    # path so the ratio is apples-to-apples.
    timed(
        "oph signatures (one-permutation, densified)",
        lambda: llmops.oph_signatures(docs).count(),
    )

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

    # PCA Gram partials (q97w's kernel): on an amplified vector corpus the
    # payload must never cross an exchange — the shuffle carries only
    # d^2 + d + 1 integer rows per batch, so wall time is scan-bound and
    # the aggregated frame is exactly d^2 + d + 1 rows regardless of N.
    # localCheckpoint: the amplification crossJoin is corpus FABRICATION,
    # not part of the probed plan — cut lineage so the assertion sees only
    # the kernel + aggregate.
    emb_mat = emb_big.withColumnRenamed("v", "embedding").localCheckpoint()
    gram = llmops.int_gram_partials(emb_mat)
    gagg = gram.groupBy("i", "j").agg(F.sum("g").alias("g"))
    assert no_product_join(gagg), "gram aggregation must stay join-free"

    def gram_count():
        c = gagg.count()
        assert c == 64 * 64 + 64 + 1, f"gram frame wrong size: {c}"
        return n_copies * 2000  # vectors processed at sf0.1

    timed("pca gram partials", gram_count, unit="vecs")

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

    # --- round-4-late kernels ---------------------------------------------

    # Release earlier kernels' pinned state (localCheckpoint RDDs survive
    # while their DataFrames are referenced; accumulated executor memory
    # pressure inflated the late kernels' wall by ~7x in one run —
    # winnowing measured 51 s here vs 6.7 s standalone at the same scale).
    import gc

    gc.collect()
    spark.catalog.clearCache()

    # BM25 retrieval: inverted-index scoring over the amplified corpus.
    # The query vocabulary semi-join must bound every downstream shuffle.
    from pyspark.sql import Window as W

    qterms = spark.createDataFrame(
        [(1, "table"), (1, "scan"), (2, "join"), (2, "hash"),
         (3, "window"), (3, "agg")],
        "qid int, w string",
    )
    dl, stats, tf, dfreq = llmops.bm25_postings(docs, qterms)
    scored = (tf.join(F.broadcast(qterms), "w").join(F.broadcast(dfreq), "w")
              .join(dl, "doc_id").crossJoin(F.broadcast(stats))
              .groupBy("qid", "doc_id")
              .agg(F.sum(llmops.bm25_term_score()).alias("s")))
    top = scored.withColumn(
        "rnk", F.row_number().over(W.partitionBy("qid").orderBy(F.col("s").desc(), "doc_id"))
    ).filter(F.col("rnk") <= 10)
    bm25_plan = top._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in bm25_plan
    # exactly one nested-loop is allowed: the 1-row stats scalar broadcast
    # (the canonical scalar-subquery plan); every multi-row join must be
    # a hash join on the term/doc key
    assert bm25_plan.count("BroadcastNestedLoopJoin") <= 1, "bm25 grew a product join"

    def bm25_all():
        top.count()
        return n

    timed("bm25 retrieval (3 queries, postings-bounded)", bm25_all)

    # Winnowing fingerprints at 100 TB shape: xxhash64 gram keys (the
    # documented substitution for md5 strings), one window-min per doc.
    wtoks = F.filter(F.split("text", " "), lambda x: x != "")
    gram_h = F.when(
        F.size(wtoks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(wtoks) - 2),
            lambda i: F.xxhash64(F.concat_ws(
                " ", F.element_at(wtoks, i), F.element_at(wtoks, i + 1),
                F.element_at(wtoks, i + 2))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    grams = docs.select("doc_id", F.posexplode(gram_h).alias("i", "h"))
    fps = (grams.select(
        "doc_id", "i",
        F.min("h").over(W.partitionBy("doc_id").orderBy("i").rowsBetween(-3, 0)).alias("fp"))
        .filter(F.col("i") >= 3).select("doc_id", "fp").distinct())

    def winnow_all():
        fps.count()
        return n

    timed("winnowing fingerprints (xxhash64 keys)", winnow_all)

    # Duplicate-span extraction: stride-1 8-gram hits on a ~100x
    # self-similar corpus (EVERY gram is cross-doc duplicated — worst
    # case), islands merged per doc.
    gram8 = F.when(
        F.size(wtoks) >= 8,
        F.transform(
            F.sequence(F.lit(1), F.size(wtoks) - 7),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(wtoks, i, 8))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g8 = docs.select("doc_id", F.posexplode(gram8).alias("i", "g"))
    dupg = (g8.groupBy("g").agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2).select("g"))
    hits = g8.join(dupg, "g").select("doc_id", F.col("i").alias("s"),
                                     (F.col("i") + 7).alias("e"))
    prev = F.max("e").over(W.partitionBy("doc_id").orderBy("s", "e")
                           .rowsBetween(W.unboundedPreceding, -1))
    isl = (hits
           .select("doc_id", "s", "e",
                   F.when(F.col("s") > F.coalesce(prev, F.lit(-1)) + 1, 1)
                   .otherwise(0).alias("ni"))
           .select("doc_id", "s", "e",
                   F.sum("ni").over(W.partitionBy("doc_id").orderBy("s", "e")).alias("isl"))
           .groupBy("doc_id", "isl")
           .agg(F.min("s").alias("a"), F.max("e").alias("b")))
    assert no_product_join(isl), "span hits must stay an equi-join"

    def span_all():
        isl.count()
        return n

    timed("dup-span extraction (worst-case self-similar)", span_all)

    # hashed-gram variant (q95u): identical span pipeline but the grams
    # collapse to xxhash64 in the narrow stage — the dup-gram shuffle
    # carries 8-byte longs instead of 8-word strings
    g8h = docs.select(
        "doc_id",
        F.posexplode(F.transform(gram8, lambda g: F.xxhash64(g))).alias("i", "gh"),
    )
    dupgh = (g8h.groupBy("gh").agg(F.countDistinct("doc_id").alias("nd"))
             .filter(F.col("nd") >= 2).select("gh"))
    hitsh = g8h.join(dupgh, "gh").select("doc_id", F.col("i").alias("s"),
                                         (F.col("i") + 7).alias("e"))
    islh = (hitsh
            .select("doc_id", "s", "e",
                    F.when(F.col("s") > F.coalesce(prev, F.lit(-1)) + 1, 1)
                    .otherwise(0).alias("ni"))
            .select("doc_id", "s", "e",
                    F.sum("ni").over(W.partitionBy("doc_id").orderBy("s", "e")).alias("isl"))
            .groupBy("doc_id", "isl")
            .agg(F.min("s").alias("a"), F.max("e").alias("b")))
    assert no_product_join(islh), "hashed span hits must stay an equi-join"

    def span_hashed_all():
        islh.count()
        return n

    timed("dup-span extraction (hashed gram keys)", span_hashed_all)

    # --- q99q/q99u banded-hamming image near-dup, hash-level ---------
    # The decode stages are embarrassingly parallel narrow maps; the
    # scale risk is the band self-join. Probe it at n_copies*5k hashes
    # with q99q's cluster structure (groups of ~5 near-identical 64-bit
    # hashes as four 16-bit bands, variants flipping 1-2 bits).
    n_hashes = n_copies * 5000
    groups = n_hashes // 5
    h = spark.range(n_hashes).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % groups).alias("g"),
        (F.col("id") / groups).cast("long").alias("t"),
    )
    hashes = h.select(
        "doc_id",
        *[
            (
                F.xxhash64(F.col("g") + k).bitwiseAND(F.lit(0xFFFF))
                # variant t flips bit (t+k) of band (t % 4): 1-bit drift
                .bitwiseXOR(
                    F.when(
                        (F.col("t") > 0) & (F.col("t") % 4 == k),
                        F.shiftleft(F.lit(1), 3 + k),
                    ).otherwise(F.lit(0))
                )
            ).alias(f"b{k}")
            for k in range(4)
        ],
    )
    bands = hashes.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("k", "bv"),
    )
    hamming = sum(
        F.bit_count(F.col(f"a.b{kk}").bitwiseXOR(F.col(f"b.b{kk}")))
        for kk in range(4)
    )
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            hamming.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )
    assert no_product_join(pairs), "banded hamming join degenerated to a product"

    def ahash_pairs():
        pairs.count()
        return n_hashes

    timed("ahash banded hamming join (hash-level)", ahash_pairs, unit="hashes")

    # --- chunked-bitmap overlap matrix (q48 kernel): S=20 segments over
    # U users (U scales with n_copies); each user joins a segment iff
    # hash(user, seg) % 3 == 0 (~1/3 density). The membership table
    # (S x U x 1/3 rows) must collapse to S x U/63 words BEFORE pairwise
    # work, and the pair join must stay a chunk equi-join.
    n_users = 10_000 * n_copies
    members = (
        spark.range(n_users * 20)  # narrow fixture: no join in the lineage
        .select(
            F.expr("id div 20").alias("user_id"),
            (F.col("id") % 20).alias("seg"),
        )
        .filter(F.xxhash64("user_id", "seg") % 3 == 0)
    )
    words = (
        members.select(
            "seg",
            F.expr("user_id div 63").alias("chunk"),
            F.expr("shiftleft(1L, cast(user_id % 63 as int))").alias("bit"),
        )
        .groupBy("seg", "chunk")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )
    overlap = (
        words.alias("a")
        .join(
            words.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.seg") < F.col("b.seg")),
        )
        .select(
            F.col("a.seg").alias("sa"), F.col("b.seg").alias("sb"),
            F.bit_count(F.col("a.mask").bitwiseAND(F.col("b.mask"))).alias("pc"),
        )
        .groupBy("sa", "sb")
        .agg(F.sum("pc").alias("n_common"))
    )
    assert no_product_join(overlap), "bitmap pair join degenerated to a product"

    def bitmap_overlap():
        assert overlap.count() == 190  # 20 choose 2 pairs
        return n_users * 20 // 3  # approx membership rows folded

    timed("bitmap overlap matrix (190 segment pairs)", bitmap_overlap,
          unit="memberships")

    # -- qm14 delta-join IVM: state probe reads O(matching buckets) -----
    # The claim under test: an epoch's state read is bounded by the
    # buckets its OWN keys hash into, not by accumulated state size.
    # Build a large bucketed B-state once; run the same delta step with
    # a batch whose keys span 2 buckets vs one spanning all 16 — the
    # executed scan must touch exactly |batch buckets| hive partitions.
    NB = 16
    state_dir = probe_tmpdir("bcs_probe_qm14_") + "/state_b"
    big_state = spark.range(200_000 * max(1, n_copies // 20)).select(
        F.col("id").alias("custkey"),
        F.concat(F.lit("seg"), F.pmod(F.col("id"), F.lit(5))).alias("seg"),
        F.lit(1).cast("long").alias("dmb"),
        F.pmod(F.xxhash64("custkey"), F.lit(NB)).alias("kb"),
    )
    big_state.write.partitionBy("kb").parquet(state_dir)

    da_all = spark.range(50_000).select(F.col("id").alias("custkey")).withColumn(
        "kb", F.pmod(F.xxhash64("custkey"), F.lit(NB))
    )
    narrow_keys = da_all.filter(F.col("kb").isin([3, 11]))
    wide_keys = da_all

    def run_epoch(keys_df, label):
        da = keys_df.select("custkey", "kb").withColumn(
            "dma", F.lit(1).cast("long")
        ).localCheckpoint(eager=True)
        kbs = [r["kb"] for r in da.select("kb").distinct().collect()]
        probe_df = spark.read.parquet(state_dir).filter(F.col("kb").isin(kbs))
        t0 = time.perf_counter()
        n = da.drop("kb").join(probe_df.drop("kb"), "custkey").count()
        wall = time.perf_counter() - t0
        # metric must come from the probe frame's OWN query execution —
        # count() above executed a derived plan whose metrics live there
        meter = spark.read.parquet(state_dir).filter(F.col("kb").isin(kbs))
        meter.collect()
        n_parts = (
            meter._jdf.queryExecution().executedPlan()
            .collectLeaves().apply(0).metrics().apply("numPartitions").value()
        )
        print(f"  qm14 epoch [{label}]: buckets={len(kbs)} scanned_partitions={n_parts} "
              f"joined={n} wall={wall:.2f}s")
        return len(kbs), n_parts, wall

    kb_n, parts_n, wall_n = run_epoch(narrow_keys, "2-bucket batch")
    kb_w, parts_w, wall_w = run_epoch(wide_keys, "16-bucket batch")
    assert parts_n == kb_n == 2, "narrow epoch read more than its own buckets"
    assert parts_w == kb_w == NB
    print(f"  qm14 state-prune: narrow epoch scanned {parts_n}/{NB} buckets "
          f"({wall_n:.2f}s vs {wall_w:.2f}s full-spread) — epoch IO is "
          f"O(matching buckets), not O(state)")

    # ---- blocked_cumsum: two-level partial+offset scan vs the classic
    # single-task whole-frame window (the r10 operators.py addition) ----
    from pyspark.sql import Window as W

    from better_cdc_spark.operators import blocked_cumsum

    n_vals = 4_000_000
    frame = (
        spark.range(n_vals)
        .select(
            F.col("id").alias("v"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1).alias("c"),
        )
        .localCheckpoint(eager=True)
    )

    def classic_cumsum():
        w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
        return (
            frame.select(F.coalesce(F.sum("c").over(w), F.lit(0)).alias("b"))
            .agg(F.sum("b")).collect()[0][0]
        )

    def blocked():
        return (
            blocked_cumsum(frame, "v", "c", "b", n_blocks=256)
            .agg(F.sum("b")).collect()[0][0]
        )

    s_classic = timed(f"classic global-window cumsum over {n_vals:,} distinct values", classic_cumsum, "rows")
    s_blocked = timed(f"blocked_cumsum (256 range blocks) over {n_vals:,}", blocked, "rows")
    assert s_classic == s_blocked, "blocked cumsum diverged from the classic window"
    print("  blocked_cumsum: identical checksum; wide scan parallel across "
          "blocks, only the 256-row totals frame single-task")

    # --- q94z link-prediction candidate generation -------------------
    # Candidates may materialize ONLY through a shared successor (the
    # LSH-band-join shape): on an amplified N-node modular graph the
    # pair frame must stay O(|E| * max_indeg) — linear in N — and the
    # plan product-free.
    n_nodes = n  # the amplified corpus size doubles as the node count
    nodes = spark.range(n_nodes).select(F.col("id").alias("src"))
    ledges = nodes.select(
        "src",
        F.explode(
            F.slice(
                F.array(*[(F.col("src") * 7 + F.lit(k)) % F.lit(n_nodes)
                          for k in (1, 2, 3)]),
                1,
                (1 + F.col("src") % 3).cast("int"),
            )
        ).alias("dst"),
    ).localCheckpoint(eager=True)  # fabrication cut; probe the join only
    le1 = ledges.select(F.col("src").alias("u"), "dst")
    le2 = ledges.select(F.col("src").alias("v"), F.col("dst").alias("dst2"))
    lcand = (
        le1.join(le2, (F.col("dst") == F.col("dst2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )
    assert no_product_join(lcand), "link-pred candidates degenerated to a product"

    def linkpred_all():
        return lcand.count()

    timed("link-pred candidates (shared-successor equi-join)",
          linkpred_all, unit="pairs")

    # --- q98ah shingle-frequency novelty join ------------------------
    # The novelty join keys on the shingle (content-bucket shuffle);
    # worst case here: ~90% of the amplified corpus shares every gram.
    nov_sh = corpus_sh.distinct()
    nov_freq = nov_sh.groupBy("shingle").agg(F.count("*").alias("nd"))
    nov = nov_sh.join(nov_freq, "shingle").groupBy().agg(
        F.sum(F.when(F.col("nd") == 1, 1).otherwise(0)).alias("novel")
    )
    assert no_product_join(nov), "novelty join degenerated to a product"

    def novelty_all():
        nov.collect()
        return n_sh

    timed("ngram novelty (shingle-keyed frequency join)",
          novelty_all, unit="shingles")

    return 0


if __name__ == "__main__":
    sys.exit(main())
