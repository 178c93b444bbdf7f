"""Property tests for the LLM-pipeline kernels (llmops, queries/llm).

The oracle harness (test_oracle_smoke) covers the deterministic queries;
these tests cover what an SQL oracle can't: sketch recall/precision
guarantees of MinHash-LSH, SimHash and hyperplane-ANN.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from better_cdc_spark import llmops
from better_cdc_spark.io import load_table
from better_cdc_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def test_minhash_identical_docs_always_candidates(spark, docs):
    """Jaccard-1 pairs share the full signature → every band collides.

    Deterministic (no probabilistic margin): recall for exact duplicates
    is 1 by construction. Corpus = docs ∪ shifted-id copies of 50 docs.
    """
    dupes = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    corpus = docs.unionByName(dupes)
    cands = llmops.minhash_candidate_pairs(corpus, "doc_id")
    found = {
        (a, b)
        for a, b in cands.filter(F.col("doc_b") >= 1000000).select("doc_a", "doc_b").collect()
    }
    expected = {(i, i + 1000000) for i in range(50)}
    assert expected <= found


def test_minhash_recall_on_high_similarity_pairs(spark, docs):
    """LSH candidates must cover the high-Jaccard truth set.

    16 bands × 4 rows → P(candidate | j≥0.8) ≥ 1-(1-0.8⁴)¹⁶ ≈ 0.9996;
    asserting 90% leaves a wide margin.
    """
    postings = llmops.shingle_postings(docs, "doc_id")
    truth = {
        (r.doc_a, r.doc_b)
        for r in llmops.exact_jaccard_pairs(postings, "doc_id", 0.8).collect()
    }
    if not truth:
        pytest.skip("no j>=0.8 pairs at this SF")
    cands = {
        (r.doc_a, r.doc_b) for r in llmops.minhash_candidate_pairs(docs, "doc_id").collect()
    }
    recall = len(truth & cands) / len(truth)
    assert recall >= 0.9, f"minhash recall {recall} over {len(truth)} pairs"


def test_lsh_skew_caps(spark, docs):
    """max_df / max_bucket dials: generous caps preserve candidates exactly;
    a bucket cap of 1 removes every pair-forming bucket (no candidates)."""
    base = {
        (r.doc_a, r.doc_b)
        for r in llmops.minhash_candidate_pairs(docs, "doc_id").collect()
    }
    n_docs = docs.count()
    capped = {
        (r.doc_a, r.doc_b)
        for r in llmops.minhash_candidate_pairs(
            docs, "doc_id", max_df=n_docs, max_bucket=n_docs
        ).collect()
    }
    assert capped == base  # caps at corpus size are no-ops
    strangled = llmops.minhash_candidate_pairs(docs, "doc_id", max_bucket=1).count()
    assert strangled == 0  # every candidate needs a bucket of >= 2 docs


def test_minhash_verified_pairs_are_exact(spark):
    """q96_minhash_lsh emits only exact-verified pairs (precision 1)."""
    mh = REGISTRY["q96_minhash_lsh"].fn(spark, SF_SMOKE).toPandas()
    ex = REGISTRY["q96_ngram_jaccard"].fn(spark, SF_SMOKE).toPandas()
    exact = set(zip(ex.doc_a, ex.doc_b))
    assert set(zip(mh.doc_a, mh.doc_b)) <= exact
    assert (mh.jaccard >= 0.2).all()


def test_simhash_identical_docs_distance_zero(spark, docs):
    """Identical text → identical fingerprint → hamming 0 through the join."""
    dupes = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    corpus = docs.unionByName(dupes)
    pairs = llmops.simhash_near_pairs(corpus, "doc_id", max_hamming=8)
    zero = pairs.filter((F.col("doc_b") >= 1000000) & (F.col("hamming") == 0))
    found = {(r.doc_a, r.doc_b) for r in zero.collect()}
    assert {(i, i + 1000000) for i in range(20)} <= found


def test_simhash_emitted_pairs_within_bound(spark):
    pdf = REGISTRY["q96_simhash"].fn(spark, SF_SMOKE).toPandas()
    assert (pdf.hamming <= 8).all()
    assert (pdf.doc_a < pdf.doc_b).all()


def test_ann_recall_and_exactness_vs_brute_force(spark):
    """LSH-bucketed ANN: scores are exact, ranks well-formed, recall ≥ floor.

    The 0.15 floor reflects ~7/64 buckets probed over weakly-clustered
    embeddings (measured ≈0.25 at sf0.01); exact cosine values must agree
    with brute force wherever pairs overlap.
    """
    bf = REGISTRY["q97_cosine_topk"].fn(spark, SF_SMOKE).toPandas()
    ann = REGISTRY["q97_ann_lsh"].fn(spark, SF_SMOKE).toPandas()
    assert (ann.rnk <= 10).all()
    truth = set(zip(bf.qid, bf.nid))
    got = set(zip(ann.qid, ann.nid))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.15, f"ann recall {recall}"
    merged = bf.merge(ann, on=["qid", "nid"], suffixes=("_bf", "_ann"))
    assert (merged.cosine_bf == merged.cosine_ann).all()


def test_pq_ann_recall_and_exactness_vs_brute_force(spark):
    """PQ-ADC ANN: shortlist-then-rerank recall ≥ floor, cosines exact.

    A 4×k shortlist over 8×4-bit codes recovers most of the true top-10
    (measured ≈0.9 at sf0.001); wherever the sets overlap the re-ranked
    cosine must equal brute force bit-for-bit (same kernel).
    """
    bf = REGISTRY["q97_cosine_topk"].fn(spark, SF_SMOKE).toPandas()
    pq = REGISTRY["q97_ann_pq"].fn(spark, SF_SMOKE).toPandas()
    assert (pq.rnk <= 10).all()
    truth = set(zip(bf.qid, bf.nid))
    got = set(zip(pq.qid, pq.nid))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"pq ann recall {recall}"
    merged = bf.merge(pq, on=["qid", "nid"], suffixes=("_bf", "_pq"))
    assert (merged.cosine_bf == merged.cosine_pq).all()


def test_pq_codes_compress_and_roundtrip(spark):
    """Codes are within [0, k); encoder is deterministic across calls."""
    from better_cdc_spark.io import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", llmops.as_double_vec("embedding").alias("v")
    )
    books = llmops.train_pq_codebooks(emb)
    assert books.shape == (llmops.PQ_M, llmops.PQ_K, 64 // llmops.PQ_M)
    codes = emb.select("vec_id", llmops.pq_encoder(books)(F.col("v")).alias("codes"))
    pdf = codes.toPandas()
    flat = [c for arr in pdf.codes for c in arr]
    assert min(flat) >= 0 and max(flat) < llmops.PQ_K
    again = [list(c) for c in codes.toPandas().sort_values("vec_id").codes]
    assert [list(c) for c in pdf.sort_values("vec_id").codes] == again


def test_multimodal_decode_stubs_raise(spark):
    """Remaining seams are explicit: audio/video decode and unrecognized
    image formats raise; recognized formats dispatch to the executing
    pure-Python codecs (PNG/PPM/baseline-grayscale JPEG, q99c/q99f)."""
    for fn in (llmops.decode_audio, llmops.decode_video_frames):
        with pytest.raises(NotImplementedError):
            fn(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        llmops.decode_image(b"RIFF....WEBP")  # format without a codec here
    from better_cdc_spark import codecs

    png = codecs.encode_png(4, 2, bytes(range(8)))
    assert llmops.decode_image(png)["width"] == 4
    jpg = codecs.encode_jpeg_gray(8, 8, bytes([50]) * 64)
    assert llmops.decode_image(jpg)["height"] == 8
    # JPEG dispatch: a 3-component 4:2:0 stream routes to the color path
    color = codecs.encode_jpeg_color_420(16, 16, bytes([10, 200, 60]) * 256)
    d = llmops.decode_image(color)
    assert (d["width"], d["height"]) == (16, 16)
    assert len(d["pixels"]) == 16 * 16 * 3


def test_simhash_deterministic_across_runs(spark, docs):
    a = docs.select("doc_id", llmops.simhash64(F.col("text")).alias("sh")).toPandas()
    b = docs.select("doc_id", llmops.simhash64(F.col("text")).alias("sh")).toPandas()
    assert a.sort_values("doc_id").sh.tolist() == b.sort_values("doc_id").sh.tolist()


def test_dedup_clusters_on_known_graph(spark):
    """Chain, triangle, isolated pair → min-label components."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain: all label 1
         (10, 11), (11, 12), (10, 12),  # triangle: label 10
         (20, 21)],                   # pair: label 20
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_id, r.cluster_id) for r in llmops.dedup_clusters(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_multiprobe_radius_two_improves_recall(spark):
    """Widening the probe radius must not lose pairs and should find more."""
    from better_cdc_spark.io import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", llmops.as_double_vec("embedding").alias("v")
    )
    corpus = emb.withColumn("bucket", llmops.hyperplane_bucket("v"))

    def probe_pairs(radius):
        probes = corpus.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("qid"),
            F.explode(llmops.multiprobe_buckets("bucket", radius=radius)).alias("bucket"),
        )
        hit = corpus.join(probes, "bucket").filter(F.col("vec_id") != F.col("qid"))
        return {(r.qid, r.vec_id) for r in hit.select("qid", "vec_id").distinct().collect()}

    r1, r2 = probe_pairs(1), probe_pairs(2)
    assert r1 <= r2
    assert len(r2) > len(r1)


def test_ivf_recall_and_exactness_vs_brute_force(spark):
    """IVF ANN: deterministic quantizer, exact cosines, recall >= floor.

    Measured ~0.83 at sf0.001 with 4/16 cells probed (k-means cells track
    the label clusters in the embeddings); 0.6 leaves margin.
    """
    bf = REGISTRY["q97_cosine_topk"].fn(spark, SF_SMOKE).toPandas()
    ivf = REGISTRY["q97_ann_ivf"].fn(spark, SF_SMOKE).toPandas()
    assert (ivf.rnk <= 10).all()
    truth = set(zip(bf.qid, bf.nid))
    got = set(zip(ivf.qid, ivf.nid))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"ivf recall {recall}"
    merged = bf.merge(ivf, on=["qid", "nid"], suffixes=("_bf", "_ivf"))
    assert (merged.cosine_bf == merged.cosine_ivf).all()
    # determinism: two runs produce identical results
    again = REGISTRY["q97_ann_ivf"].fn(spark, SF_SMOKE).toPandas()
    assert got == set(zip(again.qid, again.nid))


def test_df_cap_drops_hot_shingles_keeps_true_dupes(spark):
    # 4 docs sharing one boilerplate sentence (a hot shingle in every doc);
    # docs 1 and 2 are otherwise near-identical, docs 3 and 4 unrelated.
    boiler = "licensed under the apache license version two"
    rows = [
        (1, f"{boiler} the quick brown fox jumps over the lazy dog today"),
        (2, f"{boiler} the quick brown fox jumps over the lazy dog tonight"),
        (3, f"{boiler} completely different subject matter about databases"),
        (4, f"{boiler} yet another unrelated snippet concerning compilers"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    postings = llmops.shingle_postings(docs, "doc_id")

    capped = llmops.cap_shingle_df(postings, max_df=2, id_col="doc_id")
    dfreq = {
        r["shingle"]: r["c"]
        for r in postings.groupBy("shingle").agg(F.count("*").alias("c")).collect()
    }
    kept = {r["shingle"] for r in capped.select("shingle").distinct().collect()}
    assert all(dfreq[s] <= 2 for s in kept)
    assert any(c > 2 for c in dfreq.values())  # the boilerplate was hot

    # Capped Jaccard still pairs the true near-dupes and ONLY them.
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in llmops.exact_jaccard_pairs(
            postings, "doc_id", threshold=0.5, max_df=2
        ).collect()
    }
    assert pairs == {(1, 2)}

    # A generous cap is a no-op: identical pairs with and without it.
    uncapped = llmops.exact_jaccard_pairs(postings, "doc_id", 0.1).collect()
    roomy = llmops.exact_jaccard_pairs(postings, "doc_id", 0.1, max_df=10**6).collect()
    assert sorted(map(tuple, roomy)) == sorted(map(tuple, uncapped))


def test_simhash_block_cap(spark, docs):
    """Corpus-size cap is a no-op; cap 1 kills every pair-forming block."""
    base = {
        (r.doc_a, r.doc_b)
        for r in llmops.simhash_near_pairs(docs, "doc_id").collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in llmops.simhash_near_pairs(
            docs, "doc_id", max_block=docs.count()
        ).collect()
    }
    assert capped == base
    assert llmops.simhash_near_pairs(docs, "doc_id", max_block=1).count() == 0


def test_q94d_matches_exact_composite(spark):
    """q94d (LSH-driven near-dedup) vs q94 (exact all-pairs near-dedup).

    Precision is exact by construction (candidates are verified with
    pair-bounded Jaccard before any drop), so q94d can only keep MORE docs
    than q94 — never drop a doc the exact composite keeps. Recall floor:
    the injected exact duplicates (jaccard 1.0) collide in every LSH band,
    so q94d must drop every one of them, and overall the kept-set excess
    stays under 5% of q94's drops.
    """
    exact = REGISTRY["q94_curation_pipeline"].fn(spark, SF_SMOKE).toPandas()
    lsh = REGISTRY["q94d_curation_pipeline_lsh"].fn(spark, SF_SMOKE).toPandas()
    exact_kept = set(exact.doc_id)
    lsh_kept = set(lsh.doc_id)
    # no false drops (precision 1)
    assert exact_kept <= lsh_kept
    # injected duplicates (doc_id >= 1000000 copies) are jaccard-1 pairs:
    # LSH recall for them is deterministic — all must be dropped
    assert not {d for d in lsh_kept if d >= 1000000 and d - 1000000 in lsh_kept}
    # overall recall floor: docs the exact composite dropped but LSH kept
    # (missed near-dup pairs) stay a small fraction of the corpus
    missed = lsh_kept - exact_kept
    assert len(missed) <= max(3, round(0.05 * len(exact_kept))), sorted(missed)[:10]


def test_semdedup_drops_injected_scaled_duplicates(spark):
    """q96d: every injected ×1.02 copy is dominated by its original.

    Scaling preserves direction, so after L2-normalization the copy and
    its original are the same unit vector (cosine 1 ≥ τ) and spherical
    k-means MUST co-cluster them — the drop is deterministic, not a
    probabilistic-recall property. Originals are all mutually distant
    (max observed cosine ≈ 0.5 at this SF), so exactly the copies drop.
    """
    out = REGISTRY["q96d_semdedup"].fn(spark, SF_SMOKE).toPandas()
    injected = set(out.vec_id[out.vec_id >= 1000000])
    assert injected  # the query injects every 10th vec
    dropped = set(out.vec_id[~out.kept])
    assert dropped == injected
    # cluster ids are the seed ordinals: a copy shares its original's cluster
    by_id = dict(zip(out.vec_id, out.cluster))
    assert all(by_id[d] == by_id[d - 1000000] for d in injected)


def test_lloyd_centroids_empty_cluster_keeps_previous(spark):
    """A seed with no members after assignment keeps its old centroid, so
    cluster ids never renumber mid-run (determinism contract)."""
    import pandas as pd

    # two tight groups far apart + a third seed that captures nothing
    vecs = [[0.0, 1.0], [0.05, 1.0], [1.0, 0.0], [1.0, 0.05], [0.9, 0.1]]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(5), "u": vecs})
    )
    init = [[0.0, 1.0], [1.0, 0.0], [-1.0, -1.0]]  # 3rd centroid unreachable
    cents = llmops.lloyd_centroids(df, init, iters=2, vec_col="u")
    assert cents[2] == [-1.0, -1.0]
    assigned = df.withColumn("c", llmops.nearest_centroid(cents, "u")).collect()
    got = {r["vec_id"]: r["c"] for r in assigned}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 1}


def test_tfidf_prefix_filter_pairs_are_fully_verified(spark):
    """q96e invariants: symmetric-duplicate coverage and exact precision.

    An identical-text pair has identical weight vectors, hence identical
    top-prefix terms — prefix filtering MUST candidate it and the verify
    emits cosine 1.0. And every emitted pair must satisfy the threshold
    with its full (not prefix) dot product, recomputed here directly.
    """
    out = REGISTRY["q96e_tfidf_cosine"].fn(spark, SF_SMOKE).toPandas()
    assert (out.cosine >= 0.95).all()
    assert (out.doc_a < out.doc_b).all()
    # recompute one emitted pair's cosine from raw text, independently
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").toPandas()
    txt = dict(zip(docs.doc_id, docs.text))
    import math
    from collections import Counter

    n = len(docs)
    dfc = Counter(t for s in txt.values() for t in set(s.split()))
    def vec(d):
        c = Counter(txt[d].split())
        return {t: c[t] * (math.log((1 + n) / (1 + dfc[t])) + 1) for t in c}
    row = out.iloc[0]
    va, vb = vec(row.doc_a), vec(row.doc_b)
    dp = sum(va[t] * vb[t] for t in va.keys() & vb.keys())
    na = math.sqrt(sum(x * x for x in va.values()))
    nb = math.sqrt(sum(x * x for x in vb.values()))
    assert abs(dp / (na * nb) - row.cosine) < 1e-3


def test_temperature_sampling_flattens_skewed_domains(spark):
    """q95j: α=0.5 keeps a LOWER per-doc fraction of the doubled domains.

    src0–3 are doubled in the query's corpus; with rate ∝ sqrt(n)/n their
    per-doc keep rate must be 1/sqrt(2) of the small domains' — so the
    kept-count ratio big:small per doc stays well under 1, while kept
    counts PER DOMAIN still end up larger for doubled domains (flattened,
    not inverted).
    """
    out = REGISTRY["q95j_temperature_sample"].fn(spark, SF_SMOKE).toPandas()
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source").toPandas()
    n_per = docs.groupby("source").size()
    big = {"src0", "src1", "src2", "src3"}
    kept = out.groupby("source").size()
    rate_big = sum(kept.get(s, 0) for s in big) / (2 * sum(n_per[s] for s in big if s in n_per))
    small = [s for s in n_per.index if s not in big]
    rate_small = sum(kept.get(s, 0) for s in small) / sum(n_per[s] for s in small)
    assert rate_big < rate_small  # flattening direction
    # expected ratio 1/sqrt(2) ≈ 0.707 — allow sampling noise at smoke SF
    assert 0.4 < rate_big / rate_small < 0.95


def test_bloom_decontaminate_superset_of_exact(spark):
    """q95k vs q95b: Bloom membership has NO false negatives, so the bloom
    flag set must contain every exactly-contaminated doc; false positives
    stay within the (1-e^{-kn/m})^k budget (≈6e-5 per probe)."""
    exact = REGISTRY["q95b_decontaminate"].fn(spark, SF_SMOKE).toPandas()
    bloom = REGISTRY["q95k_bloom_decontaminate"].fn(spark, SF_SMOKE).toPandas()
    e = set(exact.doc_id[exact.contaminated])
    b = set(bloom.doc_id[bloom.contaminated])
    assert e <= b, sorted(e - b)[:10]
    assert len(b - e) <= max(5, len(exact) // 100), sorted(b - e)[:10]
    # same doc universe
    assert set(exact.doc_id) == set(bloom.doc_id)


def test_ivf_persisted_index_serves_identically_and_prunes(spark):
    """q97f: the cold-start probe over the persisted, cell-partitioned
    index returns EXACTLY the ephemeral q97_ann_ivf results (same
    deterministic centroid model), and its scan carries a cell
    PartitionFilter — the index is a partition layout."""
    ephem = REGISTRY["q97_ann_ivf"].fn(spark, SF_SMOKE)
    cold = REGISTRY["q97f_ivf_index_persist"].fn(spark, SF_SMOKE)
    a = {tuple(r) for r in ephem.collect()}
    b = {tuple(r) for r in cold.collect()}
    assert a == b
    plan = cold._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, "index scan lost its PartitionFilters section"
    assert "cell" in plan.split("PartitionFilters", 1)[1][:160], (
        "cell filter missing from PartitionFilters"
    )


def test_resize_ppm_nearest_upscale_duplicates_pixels():
    """The query path only ever downscales (sources are >=4px); pin the
    upscale semantics too: floor scaling duplicates source pixels, so a
    2x1 image resized to 4x2 repeats each source pixel 2x in x and y."""
    import pandas as pd
    from better_cdc_spark import codecs
    from better_cdc_spark.llmops import resize_ppm_nearest

    rgb = bytes([10, 20, 30, 200, 210, 220])  # two pixels: A, B
    payload = codecs.encode_ppm(2, 1, rgb)
    pdf = pd.DataFrame({"doc_id": pd.Series([7], dtype="int64"),
                        "payload": [payload]})
    (out,) = list(resize_ppm_nearest(4, 2)(iter([pdf])))
    row = out.iloc[0]
    assert (row.src_w, row.src_h) == (2, 1)
    # grid: sx = [0,0,1,1], sy = [0,0] -> A A B B twice
    expect = (sum([10, 20, 30]) * 2 + sum([200, 210, 220]) * 2) * 2
    assert row.resized_checksum == expect


@pytest.mark.slow  # full-tier: `make test-full` (r16 two-tier split)
def test_incremental_lsh_equals_one_shot_candidates(spark, docs):
    """q95aa's across-batches discovery: every unordered pair has exactly
    one discovery event (later batch probes an index holding the earlier
    doc, same-batch pairs come from the self-join), so the union over
    batches must EQUAL the one-shot candidate set — set equality, not a
    recall bound. Signature scheme is shared, so this pins the probe
    join, the partition bucketing, and the append lifecycle at once."""
    incr = REGISTRY["q95aa_incremental_minhash_lsh"].fn(spark, SF_SMOKE).toPandas()
    one_shot = REGISTRY["q96_minhash_lsh"].fn(spark, SF_SMOKE).toPandas()
    assert set(zip(incr.doc_a, incr.doc_b)) == set(
        zip(one_shot.doc_a, one_shot.doc_b)
    )
    # verified values agree pairwise too
    a = incr.set_index(["doc_a", "doc_b"]).jaccard.sort_index()
    b = one_shot.set_index(["doc_a", "doc_b"]).jaccard.sort_index()
    assert (a == b).all()
    # discovery events happen exactly when the LATER-ARRIVING doc's
    # batch runs: found_in_batch == max of the two docs' batch ids
    n_batches = 3
    later = (incr.doc_a % n_batches).combine(incr.doc_b % n_batches, max)
    assert (incr.found_in_batch == later).all()


def test_incremental_lsh_probe_is_partition_pruned(spark, docs, tmp_path):
    """The band-index probe must resolve to PartitionFilters on pb — the
    file-listing-time pruning that makes the probe O(batch-relevant
    files) instead of an index scan (q97f's contract, LSH edition)."""
    rows = llmops.lsh_band_rows(docs.limit(60))
    idx_dir = str(tmp_path / "band_index")
    rows.coalesce(1).write.partitionBy("pb").parquet(idx_dir)
    probe = spark.read.parquet(idx_dir).filter(F.col("pb").isin([1, 5, 9]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "pb" in plan.split("PartitionFilters", 1)[1][:160]
    assert probe.select("pb").distinct().count() <= 3


def test_binary_quantization_recall_vs_brute_force(spark):
    """64-bit sign fingerprints: hamming top-10 must recover a usable
    fraction of the exact cosine top-10 (the rerank-stage contract).
    The 0.15 floor mirrors the hyperplane-LSH test's on these
    weakly-clustered synthetic embeddings (measured ~0.25 at sf0.001 —
    1 bit/dim on near-isotropic data is the hard regime; real embedding
    corpora cluster far more)."""
    bf = REGISTRY["q97_cosine_topk"].fn(spark, SF_SMOKE).toPandas()
    bq = REGISTRY["q97m_binary_quantize_ann"].fn(spark, SF_SMOKE).toPandas()
    assert (bq.rnk <= 10).all() and (bq.hamming >= 0).all() and (bq.hamming <= 64).all()
    truth = set(zip(bf.qid, bf.nid))
    got = set(zip(bq.qid, bq.nid))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.15, f"binary-quantization recall {recall}"


def test_incremental_ahash_equals_one_shot(spark):
    """q99u's across-batch discovery must EQUAL the one-shot q99q pair
    set (exact equality — aHash banding is deterministic, so this is a
    theorem, not a recall bound), with each pair discovered exactly once
    in the later doc's batch."""
    incr = REGISTRY["q99u_incremental_ahash_index"].fn(spark, SF_SMOKE).toPandas()
    ones = REGISTRY["q99q_ahash_near_dup"].fn(spark, SF_SMOKE).toPandas()
    key = lambda df: set(zip(df.d1, df.d2, df.hamming))  # noqa: E731
    assert key(incr) == key(ones)
    assert len(incr) == len(ones)  # one discovery event per pair
    later = (incr.d1 % 3).combine(incr.d2 % 3, max)
    assert (incr.found_in_batch == later).all()


def test_oph_identical_docs_always_candidates(spark, docs):
    """Jaccard-1 pairs have identical shingle sets → identical OPH bins,
    mins, and empty-bin pattern → identical densified signatures →
    every band collides. Deterministic, like the classic-MinHash case."""
    dupes = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    corpus = docs.unionByName(dupes)
    sigs = (
        llmops.oph_signatures(corpus, "doc_id")
        .select("doc_id", F.explode(llmops.lsh_band_keys("sig")).alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    found = {
        (r.doc_a, r.doc_b)
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") + 1000000 == F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .collect()
    }
    assert {(i, i + 1000000) for i in range(50)} <= found


def test_oph_recall_and_precision(spark, docs):
    """Densified OPH candidates cover the high-Jaccard truth set, and the
    verified output of q96g is a subset of the exact pair set (precision
    1 with exact jaccard values)."""
    postings = llmops.shingle_postings(docs, "doc_id")
    truth = {
        (r.doc_a, r.doc_b)
        for r in llmops.exact_jaccard_pairs(postings, "doc_id", 0.8).collect()
    }
    if not truth:
        pytest.skip("no j>=0.8 pairs at this SF")
    got = REGISTRY["q96g_one_perm_minhash"].fn(spark, SF_SMOKE).toPandas()
    pairs = set(zip(got.doc_a, got.doc_b))
    recall = len(truth & pairs) / len(truth)
    assert recall >= 0.9, f"OPH recall {recall} over {len(truth)} pairs"
    ex = REGISTRY["q96_ngram_jaccard"].fn(spark, SF_SMOKE).toPandas()
    assert pairs <= set(zip(ex.doc_a, ex.doc_b))
    assert (got.jaccard >= 0.2).all()


def test_oph_signature_shape_and_densification(spark, docs):
    """Signatures are 64 non-null lanes even for tiny docs (the
    densification contract): a 3-shingle doc fills at most 3 bins, so
    ≥61 lanes are borrowed — all must be non-null and deterministic."""
    tiny = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    sig = llmops.oph_signatures(tiny, "doc_id").collect()[0]["sig"]
    assert len(sig) == 64 and all(v is not None for v in sig)
    sig2 = llmops.oph_signatures(tiny, "doc_id").collect()[0]["sig"]
    assert sig == sig2


def test_sq8_unit_sphere_recall_and_integer_exactness(spark):
    """Unit-sphere int8 quantization: top-1 preserved exactly, top-10
    recall near-perfect (measured 0.975/0.9875 at sf0.001/0.01 — the
    per-dim affine variant scores ~6%, which is why the unit-sphere
    form is THE code path), scores integral and symmetric-bounded."""
    bf = REGISTRY["q97_cosine_topk"].fn(spark, SF_SMOKE).toPandas()
    q8 = REGISTRY["q97v_int8_quantized_search"].fn(spark, SF_SMOKE).toPandas()
    assert (q8.rnk <= 10).all()
    truth = set(zip(bf.qid, bf.nid))
    got = set(zip(q8.qid, q8.nid))
    assert len(truth & got) / len(truth) >= 0.9
    top1 = bf[bf.rnk == 1].merge(q8[q8.rnk == 1], on="qid", suffixes=("_bf", "_q8"))
    assert (top1.nid_bf == top1.nid_q8).all()
    # |q_d| <= 127 and 64 dims -> |dot| <= 64 * 127^2
    assert (q8.q_dot.abs() <= 64 * 127 * 127).all()
