"""Physical-plan guards (SURVEY.md §4, §7 M4): the Arrow boundary must be
ArrowEvalPython (vectorized), never BatchEvalPython (per-row Python); and
relational filters must push to the parquet scan."""

from pyspark.sql import functions as F

from entity_knowledge_in_bert_spark import datagen
from entity_knowledge_in_bert_spark.operators import mentions, pairs, scoring
from entity_knowledge_in_bert_spark.operators.encoder import make_encoder_udf
from entity_knowledge_in_bert_spark.operators.extract import with_extracted_text


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_per_row_python_in_pipeline(spark):
    pages = datagen.gen_pages_df(spark, 50)
    latest = mentions.latest_snapshot(mentions.english_pages(pages))
    extracted = with_extracted_text(latest).select(
        "url", F.col("text_extracted").alias("text")
    )
    aliases = datagen.alias_df(spark)
    m = mentions.detect_mentions(extracted, aliases)
    embed = make_encoder_udf({"the": 1.0})
    m = m.withColumn("vec", embed(F.col("ctx_left"), F.col("ctx_right")))
    keyed = m.limit(100)
    p = pairs.attach_features(
        keyed.select(
            F.col("mention_id").alias("mention_a"),
            (F.col("mention_id") + 1).alias("mention_b"),
        ),
        m,
    )
    scored = scoring.score_pairs(p, aliases)
    plan = _plan(scored)
    assert "BatchEvalPython" not in plan, "per-row Python UDF leaked into the plan"
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter((F.col("lang") == "en") & (F.col("n_chars") >= 200))
        .select("doc_id", "n_chars")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "n_chars" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    plan = _plan(df)
    rs = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_broadcast_join_for_alias_dict(spark):
    pages = datagen.gen_pages_df(spark, 30)
    latest = mentions.latest_snapshot(mentions.english_pages(pages))
    m = mentions.detect_mentions(
        latest.select("url", "text"), datagen.alias_df(spark)
    )
    assert "BroadcastHashJoin" in _plan(m)


def test_ivf_assignment_is_shuffle_free(spark, sf_dir):
    """The IVF coarse-quantization (corpus -> nearest centroid) must be a
    pure projection: NO Exchange in its plan (VERDICT r1: the old
    crossJoin+window shuffled a 16x-expanded corpus)."""
    from pyspark.sql import functions as F2

    from entity_knowledge_in_bert_spark.operators import ann

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ann.ivf_centroids(e, 16)
    assigned = e.select(
        F2.col("vec_id").alias("cand_id"),
        (-F2.array_max(ann._cent_score_array("embedding", cents))["neg_id"]).alias(
            "centroid_id"
        ),
    )
    plan = _plan(assigned)
    assert "Exchange" not in plan, plan
    assert "Scan parquet" in plan


def test_wholestage_codegen_on_relational_spine(spark, sf_dir):
    from entity_knowledge_in_bert_spark.plans.queries import q1_pricing_summary

    df = q1_pricing_summary(spark, sf_dir)
    pre = _plan(df)
    # partial (map-side) + final aggregation, column-pruned scan
    assert pre.count("HashAggregate") >= 2
    assert "ReadSchema" in pre and "l_shipdate" not in pre.split("ReadSchema")[1][:300]
    df.collect()  # materialize so AQE finalizes the plan
    post = _plan(df)
    assert "isFinalPlan=true" in post
    # "*(N)" prefixes mark whole-stage-codegen stages in the compact form
    assert "*(1)" in post and "*(2)" in post


def test_o1_topk_is_take_ordered(spark, sf_dir):
    """O1 must plan a distributed TakeOrderedAndProject (per-partition
    top-k + merge), NOT a single-partition global sort of the corpus
    (the scale defect class VERDICT r2 flagged on the global windows)."""
    from entity_knowledge_in_bert_spark.plans.queries import queries

    df = queries()["o1_global_sort"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
