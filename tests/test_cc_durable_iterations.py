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
