"""Deduplication suite over document corpora (driver mandate: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).

Design rule: every kernel is a closed-form Catalyst expression
(sha256-hex string minhashes, nibble-arithmetic simhash) so that

  (a) results are deterministic under any partitioning/cluster size, and
  (b) the exact same computation is expressible in ANSI SQL for the
      DuckDB oracle — the dedup operators are *value-checked*, not just
      rows-only.

At 100 TB the same expressions run unchanged: shingling+minhash is a
narrow map (no shuffle), the LSH bucket join shuffles on (band_id,
band_hash) — bounded buckets, AQE-skew-safe — and the pair dedup is a
groupBy on the pair key.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import word_shingles_sql

MINHASH_K = 8
BAND_ROWS = 2  # 4 bands x 2 rows

# Bucket-size cap for the banded self-joins (VERDICT r3 #4): AQE's skew
# join splits an oversized PARTITION but cannot bound the OUTPUT of a
# degenerate bucket — 10^6 boilerplate docs sharing a band hash would
# emit ~10^12/2 pairs. Buckets above the cap are dropped from pairing
# (an audited recall trade, mirroring blocking.cap_by_size on the ER
# path; see band_bucket_audit). Mass-duplicated content dropped here is
# exactly what exact_dup_groups (linear sha256 groupBy) catches anyway —
# run it first and near-dup only the exact-distinct survivors.
MAX_BAND_BUCKET = 1024


# unique metric names: Spark rejects duplicate observe() names in one plan
_CAP_SEQ = itertools.count()


def _cap_bucket(
    keyed: DataFrame,
    bucket_cols: list[str],
    max_bucket: int,
    observation=None,
    observe: bool = True,
) -> DataFrame:
    """Drop rows of buckets whose population exceeds ``max_bucket`` —
    one window over the partitioning the self-join shuffles on anyway.

    The recall trade is never silent (ADVICE r4): the pre-filter rows
    carry an ``observe`` metric (``rows_dropped_by_cap``,
    ``rows_pre_cap``) computed in the same pass — pass a
    ``pyspark.sql.Observation`` to read it driver-side after any action,
    or rely on the default uniquely-named metric, which every
    QueryExecutionListener / the Spark UI surfaces on production runs.


    ``observe=False`` skips the metric node entirely — the self-join
    operators cap BOTH join sides from the same input, and a metrics
    node duplicated across the two branches of a self-join is rejected
    by Spark (and would double-count anyway), so only the a-side
    observes; the b-side's window still reuses the a-side's exchange.

    Caveat: if the cap drops EVERY row, AQE's empty-relation propagation
    can prune the observed subtree out of the final plan and
    ``Observation.get`` fails instead of reporting the count — in that
    fully-degenerate case run :func:`band_bucket_audit`, which reports
    the same decision per bucket as its own query.
    """
    w = Window.partitionBy(*bucket_cols)
    sized = keyed.withColumn("_bsize", F.count("*").over(w))
    if observe:
        dropped = F.sum(
            F.when(F.col("_bsize") > F.lit(max_bucket), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("rows_dropped_by_cap")
        total = F.count(F.lit(1)).alias("rows_pre_cap")
        if observation is None:
            sized = sized.observe(
                f"dedup_bucket_cap_{next(_CAP_SEQ)}", dropped, total
            )
        else:
            sized = sized.observe(observation, dropped, total)
    return sized.filter(F.col("_bsize") <= F.lit(max_bucket)).drop("_bsize")


def with_exact_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup key: sha256 of the raw text."""
    return docs.withColumn("text_sha", F.sha2(F.col(text_col), 256))


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(text_sha, n_copies, keep_id): groups with >1 copy; keeper = min id."""
    return (
        with_exact_hash(docs)
        .groupBy("text_sha")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def word_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-gram shingles."""
    return docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles_sql(f"split({text_col}, ' ')", n))
        ).alias("shingle"),
    )


def minhash_signatures(
    shingles: DataFrame, k: int = MINHASH_K, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, mh0..mh{k-1}): sha256-hex string minhashes.

    minhash_i = min over shingles of sha256(i || ':' || shingle) —
    lexicographic min over hex strings; identical in any SQL engine.
    """
    aggs = [
        F.min(F.sha2(F.concat(F.lit(f"{i}:"), F.col("shingle")), 256)).alias(f"mh{i}")
        for i in range(k)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def _minhash_band_keys(
    sigs: DataFrame, k: int, rows: int, id_col: str
) -> DataFrame:
    """(id, band_id, band_hash) — one row per (doc, band)."""
    n_bands = k // rows
    bands = []
    for b in range(n_bands):
        parts = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        bands.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.sha2(F.concat_ws(",", *parts), 256).alias("band_hash"),
            )
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, F.col("bk.band_id"), F.col("bk.band_hash"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    k: int = MINHASH_K,
    rows: int = BAND_ROWS,
    id_col: str = "doc_id",
    max_bucket: int | None = MAX_BAND_BUCKET,
    observation=None,
) -> DataFrame:
    """Band the signatures, bucket-join, dedup -> (doc_a, doc_b).

    Buckets larger than ``max_bucket`` are dropped BEFORE the self-join
    (quadratic-output guard; audited via :func:`band_bucket_audit`);
    ``max_bucket=None`` disables the cap. Pass an ``observation``
    (pyspark.sql.Observation) to read the dropped-row count driver-side;
    the cap always also emits a named observe metric (ADVICE r4)."""
    keyed = _minhash_band_keys(sigs, k, rows, id_col)
    keyed_b = keyed
    if max_bucket is not None:
        keyed = _cap_bucket(keyed, ["band_id", "band_hash"], max_bucket,
                            observation=observation)
        keyed_b = _cap_bucket(keyed_b, ["band_id", "band_hash"], max_bucket,
                              observe=False)
    a = keyed.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_hash"
    )
    b = keyed_b.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_hash"
    )
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def band_bucket_audit(
    sigs: DataFrame,
    k: int = MINHASH_K,
    rows: int = BAND_ROWS,
    id_col: str = "doc_id",
    max_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """PRE-cap band-bucket histogram with the cap decision made visible:
    (bucket_size, n_buckets, dropped) — every bucket lsh_candidate_pairs
    silently removes shows up here with dropped = true (the dedup-family
    mirror of blocking.block_audit)."""
    keyed = _minhash_band_keys(sigs, k, rows, id_col)
    return (
        keyed.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"))
        .withColumn("dropped", F.col("bucket_size") > F.lit(max_bucket))
        .orderBy("bucket_size")
    )


def ngram_jaccard(
    shingles_a: DataFrame, shingles_b: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Jaccard of distinct-shingle sets for given (doc_a, doc_b) pairs —
    relational form: |A∩B| via shingle equi-join, sizes via groupBy."""
    sa = shingles_a.groupBy("doc_id").agg(F.count("*").alias("n_a"))
    sb = shingles_b.groupBy("doc_id").agg(F.count("*").alias("n_b"))
    inter = (
        pairs.join(
            shingles_a.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            shingles_b.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .fillna(0, ["n_inter"])
        .join(sa.select(F.col("doc_id").alias("doc_a"), "n_a"), "doc_a")
        .join(sb.select(F.col("doc_id").alias("doc_b"), "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            # half-up floor: jaccard is an integer ratio and SQL round()
            # rules differ exactly at .5 boundaries across engines
            F.floor(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
                * 10000.0
                + 0.5
            )
            / 10000.0,
        )
        .select("doc_a", "doc_b", "jaccard")
    )


_HEX = "0123456789abcdef"


def simhash16(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 16-bit SimHash from token sha256 nibbles.

    bit b of token t = (hexval(sha256(t)[b//4]) >> (b%4)) & 1;
    simhash bit b   = 1 iff sum over tokens of (2*bit - 1) > 0.

    Closed-form integer arithmetic only -> byte-identical in DuckDB.
    (The library also ships a 64-bit variant via the same expression with
    16 hex chars; 16 bits keeps the oracle SQL readable.)
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("h", F.sha2(F.col("tok"), 256))
    aggs = []
    for b in range(16):
        nib = F.expr(f"instr('{_HEX}', substring(h, {b // 4 + 1}, 1)) - 1")
        bit = (F.shiftright(nib, b % 4).bitwiseAND(F.lit(1))) * 2 - 1
        aggs.append(F.sum(bit).alias(f"s{b}"))
    sums = toks.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0)
    for b in range(16):
        sim = sim + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sums.select("doc_id", sim.cast("int").alias("simhash"))


N_SIMHASH_BANDS = 4  # 4 x 16-bit bands = 64-bit simhash


def simhash64_bands(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, band0..band3): 64-bit SimHash stored as four 16-bit bands.

    Band k packs simhash bits 16k..16k+15, computed from hex chars
    4k+1..4k+4 of sha256(tok) with the same nibble arithmetic as
    simhash16 (band0 equals simhash16's value by construction). Keeping
    the hash banded (a) sidesteps 64-bit sign-bit overflow in
    cross-engine SQL and (b) makes the pigeonhole LSH join natural: any
    pair differing in <= N_SIMHASH_BANDS - 1 bits shares >= 1 band.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("h", F.sha2(F.col("tok"), 256))
    aggs = []
    for b in range(64):
        nib = F.expr(f"instr('{_HEX}', substring(h, {b // 4 + 1}, 1)) - 1")
        bit = (F.shiftright(nib, b % 4).bitwiseAND(F.lit(1))) * 2 - 1
        aggs.append(F.sum(bit).alias(f"s{b}"))
    sums = toks.groupBy("doc_id").agg(*aggs)
    cols = [F.col("doc_id")]
    for k in range(N_SIMHASH_BANDS):
        band = F.lit(0)
        for b in range(16):
            band = band + F.when(
                F.col(f"s{16 * k + b}") > 0, F.lit(1 << b)
            ).otherwise(F.lit(0))
        cols.append(band.cast("int").alias(f"band{k}"))
    return sums.select(*cols)


def simhash_near_pairs(
    sim: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = MAX_BAND_BUCKET,
    observation=None,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash hamming distance via banded
    multi-probe LSH over the output of :func:`simhash64_bands`.

    Each doc emits 4 (band_id, band_value) keys; candidates are the
    bucket self-join on that composite key — never an all-pairs product.
    Pigeonhole guarantee: a pair with hamming <= 3 differs in at most 3
    of the 4 bands, so at least one band matches exactly -> recall 1.0
    for max_hamming <= 3 (asserted vs brute force in test_dedup_ann).
    At corpus scale each 16-bit band value spreads docs over 65k buckets
    per band; AQE skew-join splits oversized partitions, and buckets
    larger than ``max_bucket`` are dropped outright before the join
    (same quadratic-output guard as lsh_candidate_pairs — a degenerate
    band value shared by 10^6 docs is boilerplate, not near-dup signal;
    the drop narrows the pigeonhole guarantee to pairs outside capped
    buckets). ``max_bucket=None`` disables the cap; when it fires, the
    dropped-row count is visible via ``observation`` / the named observe
    metric (ADVICE r4) — so the conditional recall guarantee is always
    auditable at run time, not only via a separate audit query.
    """
    if max_hamming > N_SIMHASH_BANDS - 1:
        raise ValueError(
            f"banded probe guarantees recall only for max_hamming <= "
            f"{N_SIMHASH_BANDS - 1}, got {max_hamming}"
        )
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("band_id"), F.col(f"band{k}").alias("val")
            )
            for k in range(N_SIMHASH_BANDS)
        ]
    )
    band_cols = [f"band{k}" for k in range(N_SIMHASH_BANDS)]
    keyed = sim.select("doc_id", *band_cols, F.explode(bands).alias("bk")).select(
        "doc_id", *band_cols, F.col("bk.band_id"), F.col("bk.val")
    )
    keyed_b = keyed
    if max_bucket is not None:
        keyed = _cap_bucket(keyed, ["band_id", "val"], max_bucket,
                            observation=observation)
        keyed_b = _cap_bucket(keyed_b, ["band_id", "val"], max_bucket,
                              observe=False)
    a = keyed.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"band{k}").alias(f"a{k}") for k in range(N_SIMHASH_BANDS)],
        "band_id",
        "val",
    )
    b = keyed_b.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"band{k}").alias(f"b{k}") for k in range(N_SIMHASH_BANDS)],
        "band_id",
        "val",
    )
    ham = sum(
        (F.expr(f"bit_count(a{k} ^ b{k})") for k in range(N_SIMHASH_BANDS)),
        F.lit(0),
    ).cast("int")
    return (
        a.join(b, ["band_id", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


def near_dup_keep_list(
    corpus: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """The end-to-end near-dup decision a training-data pipeline ships:
    (doc_id, cluster_id, keep) for EVERY corpus doc.

    Composition: MinHash-LSH candidates (never all-pairs) -> exact
    n-gram-Jaccard verification on candidates only -> verified edges ->
    connected components -> keep the min doc_id of each dup component
    (singletons keep themselves).

    Scale shape: shingle+minhash are narrow maps, the LSH bucket join and
    the candidate-restricted Jaccard join shuffle on bounded keys, and CC
    runs over the verified-edge table, which is orders of magnitude
    smaller than the corpus.
    """
    from .cluster import connected_components

    sh = word_shingles(corpus)
    sigs = minhash_signatures(sh)
    cands = lsh_candidate_pairs(sigs)
    verified = ngram_jaccard(sh, sh, cands).filter(
        F.col("jaccard") >= threshold
    )
    comp = connected_components(
        verified.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    ).select(F.col("mention_id").alias("doc_id"), "cluster_id")
    return (
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    max_block_size: int | None = MAX_BAND_BUCKET,
    observation=None,
) -> DataFrame:
    """Embedding-cosine near-dup within blocks -> (vec_a, vec_b, cos).

    This is the EXACT-VERIFY step over an already-blocked candidate set:
    within-block all-pairs, so a block of n vectors emits n^2/2 cosines.
    Blocks larger than ``max_block_size`` are dropped before the join
    (``None`` disables). At web scale do NOT point this at a coarse
    block column (10^8-vector blocks are quadratic even partitioned) —
    route bulk traffic through ``ann.ivf_topk`` / ``ann.anchor_lsh_topk``
    (bucketed top-k, linear in corpus size) and use this operator to
    verify their candidate pairs exactly.
    """
    from ..functions.similarity import cosine_sql

    blocked = blocked_b = emb
    if max_block_size is not None:
        blocked = _cap_bucket(emb, [block_col], max_block_size,
                              observation=observation)
        blocked_b = _cap_bucket(emb, [block_col], max_block_size,
                                observe=False)
    a = blocked.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col(block_col).alias("blk"),
    )
    b = blocked_b.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col(block_col).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", F.round(cosine_sql("emb_a", "emb_b"), 4))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )
