"""CC per-iteration durability option (north_rule checkpoint granularity)."""

from pyspark.sql import functions as F

from entity_knowledge_in_bert_spark import datagen
from entity_knowledge_in_bert_spark.plans.pipeline import ERPipeline
from entity_knowledge_in_bert_spark.sources.tableio import TableIO


def test_durable_cc_iterations_write_frontier(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "wh"))
    pipe = ERPipeline(spark, io)
    pages = datagen.gen_pages_df(spark, 80)
    pipe.run(pages, to_stage="score")
    pipe.stage_cluster(durable_iterations=True)
    assert io.exists("cc_frontier")
    lin = io.read_lineage()
    iters = lin.filter(F.col("stage").startswith("cluster_iter"))
    assert iters.count() >= 1


def test_cc_kill_resume_equals_uninterrupted(spark, tmp_path):
    """VERDICT r3 #7: a run killed mid-CC and resumed from the last
    persisted frontier must produce EXACTLY the uninterrupted clustering
    (large-star/small-star is confluent — any completed iteration's
    frontier reaches the same fixpoint)."""
    from entity_knowledge_in_bert_spark.operators import cluster

    io = TableIO(spark, str(tmp_path / "wh_kr"))
    pipe = ERPipeline(spark, io)
    pipe.run(datagen.gen_pages_df(spark, 120), to_stage="score")
    edges = io.read("stage_score")

    uninterrupted = {
        (r["mention_id"], r["cluster_id"])
        for r in cluster.connected_components(edges).collect()
    }

    # "killed" run: only the first iteration completes, frontier durable
    # (inputs records the stage_score snapshot the frontier derives from,
    # exactly as the pipeline's per_iter does — ADVICE r4 lineage guard)
    score_snap = io.latest_snapshot("stage_score")

    def per_iter(i, frontier):
        io.write(frontier, "cc_frontier", stage=f"cluster_iter{i}",
                 inputs=[score_snap])

    cluster.connected_components(
        edges, max_iters=1, on_iteration=per_iter
    ).count()
    assert io.exists("cc_frontier")

    # resume from the persisted frontier — never rereads stage_score rows
    resumed = {
        (r["mention_id"], r["cluster_id"])
        for r in cluster.connected_components(
            edges, start_frontier=io.read("cc_frontier")
        ).collect()
    }
    assert resumed == uninterrupted

    # pipeline-level resume path writes the identical cluster table
    pipe.stage_cluster(durable_iterations=True, resume_from_frontier=True)
    table = {
        (r["mention_id"], r["cluster_id"])
        for r in io.read("stage_cluster").collect()
    }
    full = {
        (r["mention_id"], r["cluster_id"])
        for r in cluster.assign_clusters(
            io.read("stage_mention"), edges
        ).collect()
    }
    assert table == full


def test_stale_frontier_is_refused_after_rescore(spark, tmp_path):
    """ADVICE r4 (medium): a cc_frontier whose lineage doesn't match the
    CURRENT stage_score snapshot must be ignored on resume — resuming
    from it would silently cluster the stale edge set (the frontier
    replaces the edges argument entirely). After a re-score, the
    pipeline must fall back to a fresh run over the new edges."""
    from entity_knowledge_in_bert_spark.operators import cluster

    io = TableIO(spark, str(tmp_path / "wh_stale"))
    pipe = ERPipeline(spark, io)
    pipe.run(datagen.gen_pages_df(spark, 80), to_stage="score")
    # durable clustering run leaves a cc_frontier tied to this stage_score
    pipe.stage_cluster(durable_iterations=True)
    assert io.snapshot_entry("cc_frontier")["inputs"] == [
        io.latest_snapshot("stage_score")
    ]

    # re-score: grow the corpus so the edge set actually changes
    pipe.run(datagen.gen_pages_df(spark, 120), to_stage="score")
    new_score = io.latest_snapshot("stage_score")
    assert io.snapshot_entry("cc_frontier")["inputs"] != [new_score]

    # resume request with a stale frontier -> fresh run over NEW edges
    pipe.stage_cluster(resume_from_frontier=True)
    table = {
        (r["mention_id"], r["cluster_id"])
        for r in io.read("stage_cluster").collect()
    }
    expect = {
        (r["mention_id"], r["cluster_id"])
        for r in cluster.assign_clusters(
            io.read("stage_mention"), io.read("stage_score", new_score)
        ).collect()
    }
    assert table == expect
