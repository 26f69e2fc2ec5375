"""t4 — THE gate: pairwise F1 >= 0.99 vs gold clusters at the shared
blocking key (BASELINE.json:metric). Plus t5 resume and t6 determinism."""

import pytest
from pyspark.sql import functions as F

from entity_knowledge_in_bert_spark import datagen
from entity_knowledge_in_bert_spark.plans import eval as ev
from entity_knowledge_in_bert_spark.plans.pipeline import ERPipeline
from entity_knowledge_in_bert_spark.sources.tableio import TableIO

N_PAGES = 400


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    io = TableIO(spark, wh)
    pipe = ERPipeline(spark, io)
    pages = datagen.gen_pages_df(spark, N_PAGES)
    clusters = pipe.run(pages)
    return io, clusters


def _gold(spark):
    return datagen.gen_gold_df(spark, N_PAGES).withColumn(
        "mention_id", F.xxhash64(F.col("url"), F.col("begin"), F.col("surface"))
    )


def test_all_gold_mentions_detected(spark, pipeline_run):
    io, _ = pipeline_run
    gold = _gold(spark)
    m = io.read("stage_mention")
    assert gold.join(m, "mention_id", "left_anti").count() == 0


def test_pairwise_f1_gate(spark, pipeline_run):
    """THE north-star quality gate: F1 >= 0.99 on labeled pairs at the
    shared (frozen) blocking key."""
    io, clusters = pipeline_run
    gold = _gold(spark)
    pairs = io.read("stage_pairs")
    labeled = ev.labeled_pairs_from_gold(
        pairs, gold.select("mention_id", "entity_gold")
    )
    res = ev.pairwise_f1(labeled, clusters)
    assert res["f1"] >= 0.99, res
    assert res["precision"] >= 0.99, res
    assert res["recall"] >= 0.99, res


def test_resume_from_stage(spark, pipeline_run):
    """t5: re-running only the cluster stage from existing snapshots gives
    the identical output (idempotent resume)."""
    io, clusters = pipeline_run
    before = clusters.agg(
        F.expr("bit_xor(xxhash64(mention_id, cluster_id))").alias("h")
    ).collect()[0]["h"]
    pipe2 = ERPipeline(spark, io)
    again = pipe2.run(from_stage="cluster")
    after = again.agg(
        F.expr("bit_xor(xxhash64(mention_id, cluster_id))").alias("h")
    ).collect()[0]["h"]
    assert before == after


def test_lineage_written(spark, pipeline_run):
    io, _ = pipeline_run
    lin = io.read_lineage()
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {"extract", "mention", "block", "pairs", "score", "cluster"} <= stages
    assert lin.filter(F.col("rows_out") < 0).count() == 0


def test_idf_vocab_bounded(spark):
    """The encoder's IDF dict is broadcast; its size must be bounded
    independent of corpus size (VERDICT r1 #3: unbounded driver collect).
    Stopword entries (weight 0.0) sit outside the cap but are structurally
    tiny (tokens in >30% of documents)."""
    from pyspark.sql import functions as F2

    from entity_knowledge_in_bert_spark.operators import encoder

    cap = 40
    sizes = []
    for n_pages in (150, 600):
        pages = datagen.gen_pages_df(spark, n_pages)
        n_distinct = (
            pages.select(F2.explode(F2.split("text", " ")).alias("t"))
            .select("t")
            .distinct()
            .count()
        )
        assert n_distinct > cap  # the cap must actually bite
        d = encoder.compute_idf(spark, pages, "text", max_vocab=cap)
        n_signal = sum(1 for v in d.values() if v != 0.0)
        assert n_signal <= cap, (n_pages, n_signal)
        sizes.append(len(d))
    # 4x the corpus must not grow the dict beyond the stopword slack
    assert sizes[1] <= cap + sum(
        1
        for v in encoder.compute_idf(
            spark, datagen.gen_pages_df(spark, 600), "text", max_vocab=cap
        ).values()
        if v == 0.0
    )


def test_determinism_two_runs(spark, tmp_path_factory):
    """t6: same seed, fresh warehouse -> byte-identical cluster hash."""
    hashes = []
    for i in range(2):
        wh = str(tmp_path_factory.mktemp(f"wh_det{i}"))
        io = TableIO(spark, wh)
        pipe = ERPipeline(spark, io)
        pages = datagen.gen_pages_df(spark, 120)
        clusters = pipe.run(pages)
        hashes.append(
            clusters.agg(
                F.expr("bit_xor(xxhash64(mention_id, cluster_id))").alias("h")
            ).collect()[0]["h"]
        )
    assert hashes[0] == hashes[1]


def test_bucketed_mentions_pipeline_identical(spark, pipeline_run, tmp_path_factory):
    """bucket_mentions changes the stage_mention LAYOUT only: the full
    pipeline output is row-identical to the unbucketed run."""
    io, clusters = pipeline_run
    wh = str(tmp_path_factory.mktemp("wh_bucketed"))
    io2 = TableIO(spark, wh)
    pipe = ERPipeline(spark, io2, bucket_mentions=8)
    pages = datagen.gen_pages_df(spark, N_PAGES)
    clusters2 = pipe.run(pages)
    a = {(r["mention_id"], r["cluster_id"]) for r in clusters.collect()}
    b = {(r["mention_id"], r["cluster_id"]) for r in clusters2.collect()}
    assert a == b
