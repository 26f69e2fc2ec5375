"""Similarity search over embedding columns (driver mandate).

* ``bruteforce_topk`` — exact cosine top-k: the correctness baseline.
  Query set broadcast against the corpus; per-query top-k via window
  rank (Spark plans TakeOrdered-per-group after the narrow cross join).
* ``anchor_lsh_buckets`` / ``anchor_lsh_topk`` — the scale path:
  random-hyperplane LSH where the hyperplanes are the first P corpus
  vectors (deterministic, data-derived, and — unlike RNG hyperplanes —
  exactly reproducible in the SQL oracle). Candidates = same bucket;
  exact rerank within bucket. At 10^12 vectors the bucket join replaces
  the full cross product; recall is tunable via P (fewer planes = bigger
  buckets).
* ``ivf_topk`` — IVF-style: coarse centroids = hash-sampled corpus
  vectors; each vector assigned to nearest centroid (one broadcast
  join); queries probe their nearest ``n_probe`` centroids only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_sql


def _pairs(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = corpus.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    return q.crossJoin(c).filter(F.col("query_id") != F.col("cand_id"))


def bruteforce_topk(queries: DataFrame, corpus: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k per query (query_id, cand_id, cos, rank)."""
    scored = _pairs(queries, corpus).withColumn(
        "cos", F.round(cosine_sql("q_emb", "c_emb"), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def anchor_lsh_buckets(
    emb: DataFrame, anchors: DataFrame, n_planes: int = 4
) -> DataFrame:
    """(vec_id, bucket): sign-pattern of dot products vs anchor vectors.

    ``anchors`` must have n_planes rows (anchor_rank, embedding).
    Implemented as one broadcast join + pivot-free string agg.
    """
    a = anchors.select(
        F.col("anchor_rank"), F.col("embedding").alias("a_emb")
    )
    dots = (
        emb.crossJoin(F.broadcast(a))
        .withColumn("dot", F.round(cosine_sql("embedding", "a_emb"), 6))
        .withColumn(
            "bit",
            F.when(F.col("dot") >= 0, F.lit(1)).otherwise(F.lit(0)),
        )
    )
    return dots.groupBy("vec_id").agg(
        F.sum(F.expr("shiftleft(bit, cast(anchor_rank as int))"))
        .cast("int")
        .alias("bucket")
    )


def anchor_lsh_topk(
    queries: DataFrame, corpus: DataFrame, anchors: DataFrame, k: int = 10
) -> DataFrame:
    """Bucketed ANN: candidates share the query's bucket; exact rerank."""
    cb = anchor_lsh_buckets(corpus, anchors)
    qb = anchor_lsh_buckets(queries, anchors)
    c = corpus.join(cb, "vec_id").select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        "bucket",
    )
    q = queries.join(qb, "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", F.round(cosine_sql("q_emb", "c_emb"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
) -> DataFrame:
    """IVF-style ANN: centroids = deterministic corpus sample (lowest
    xxhash64 of vec_id); assignment + probing are broadcast joins."""
    cents = (
        corpus.withColumn("_h", F.xxhash64("vec_id"))
        .orderBy("_h")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cent_emb"),
        )
    )
    # assign corpus vectors to their nearest centroid
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.desc("cent_cos"), F.asc("centroid_id")
    )
    assigned = (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("cent_cos", F.round(cosine_sql("embedding", "cent_emb"), 6))
        .withColumn("crk", F.row_number().over(assign_w))
        .filter(F.col("crk") == 1)
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("c_emb"),
            "centroid_id",
        )
    )
    probe_w = Window.partitionBy("vec_id").orderBy(
        F.desc("cent_cos"), F.asc("centroid_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("cent_cos", F.round(cosine_sql("embedding", "cent_emb"), 6))
        .withColumn("crk", F.row_number().over(probe_w))
        .filter(F.col("crk") <= n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            "centroid_id",
        )
    )
    scored = (
        probes.join(assigned, "centroid_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", F.round(cosine_sql("q_emb", "c_emb"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )
