"""Re-crawl retract path (plans/incremental.py): merging a delta that
RE-CRAWLS existing urls with changed content must converge to the batch
rebuild over the reconciled (as-of latest) corpus — tombstoned mentions
leave the live tables, split components are re-solved, late arrivals are
dropped."""

import pytest
from pyspark.sql import functions as F

from entity_knowledge_in_bert_spark import datagen
from entity_knowledge_in_bert_spark.plans import eval as ev
from entity_knowledge_in_bert_spark.plans.incremental import IncrementalER
from entity_knowledge_in_bert_spark.plans.pipeline import ERPipeline
from entity_knowledge_in_bert_spark.sources.tableio import TableIO

N_BASE, N_RECRAWL, N_NEW = 300, 60, 40


def _ids(df, col="mention_id"):
    return {r[col] for r in df.select(col).distinct().collect()}


def _cluster_set(df):
    return {(r["mention_id"], r["cluster_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def retract_run(spark, tmp_path_factory):
    # incremental: base build, then one delta that re-crawls urls
    # [0, N_RECRAWL) at generation 1 AND adds new urls [N_BASE, +N_NEW)
    io = TableIO(spark, str(tmp_path_factory.mktemp("wh_retract")))
    ERPipeline(spark, io).run(datagen.gen_pages_df(spark, N_BASE))
    delta = datagen.gen_pages_df(
        spark, N_RECRAWL, start=0, generation=1
    ).unionByName(datagen.gen_pages_df(spark, N_NEW, start=N_BASE))
    merged = IncrementalER(spark, io).merge(delta)

    # batch rebuild over the union corpus — the as-of rule (J7) picks the
    # generation-1 snapshot for the re-crawled urls
    io_b = TableIO(spark, str(tmp_path_factory.mktemp("wh_retract_batch")))
    union_pages = datagen.gen_pages_df(spark, N_BASE).unionByName(delta)
    batch = ERPipeline(spark, io_b).run(union_pages)
    return io, io_b, merged, batch


def test_live_mentions_equal_batch(spark, retract_run):
    """(stage_mention chain − tombstones) must equal the batch rebuild's
    mention table: old mentions of re-crawled urls are gone, re-emitted
    identical spans survive once, new spans appear."""
    io, io_b, _, _ = retract_run
    inc = IncrementalER(spark, io)
    live = _ids(inc._live(io.read("stage_mention")))
    bat = _ids(io_b.read("stage_mention"))
    assert live == bat


def test_tombstones_are_real_retractions(spark, retract_run):
    """Tombstoned ids existed in the base mention table and are absent
    from the batch rebuild (they belonged to superseded content)."""
    io, io_b, _, _ = retract_run
    tomb = _ids(io.read("retracted_mentions"))
    assert tomb  # generation-1 content genuinely changed mentions
    base_ids = _ids(io.read("stage_mention"))
    bat = _ids(io_b.read("stage_mention"))
    assert tomb <= base_ids
    assert not (tomb & bat)


def test_cluster_table_excludes_retracted(spark, retract_run):
    io, io_b, merged, batch = retract_run
    tomb = _ids(io.read("retracted_mentions"))
    clus = _ids(merged)
    assert not (tomb & clus)
    assert clus == _ids(batch)  # mention-complete over the same live set


def test_retract_f1_gate_vs_batch(spark, retract_run):
    """North-star gate on the retracted+merged cluster table, evaluated
    on the BATCH rebuild's labeled pairs over the reconciled corpus with
    generation-aware gold."""
    io, io_b, merged, _ = retract_run
    gold = (
        datagen.gen_gold_df(spark, N_RECRAWL, start=0, generation=1)
        .unionByName(
            datagen.gen_gold_df(spark, N_BASE - N_RECRAWL, start=N_RECRAWL)
        )
        .unionByName(datagen.gen_gold_df(spark, N_NEW, start=N_BASE))
        .withColumn(
            "mention_id",
            F.xxhash64(F.col("url"), F.col("begin"), F.col("surface")),
        )
    )
    labeled = ev.labeled_pairs_from_gold(
        io_b.read("stage_pairs"), gold.select("mention_id", "entity_gold")
    )
    res = ev.pairwise_f1(labeled, merged)
    assert res["f1"] >= 0.99, res


def test_late_arrival_is_dropped(spark, retract_run):
    """Re-delivering the ORIGINAL generation-0 snapshots of re-crawled
    urls (warc_ts older than the stored generation-1 extract) must be a
    clean no-op under the as-of rule."""
    io, _, merged, _ = retract_run
    before = _cluster_set(io.read("stage_cluster"))
    stale = datagen.gen_pages_df(spark, 30, start=0)  # generation 0 again
    out = IncrementalER(spark, io).merge(stale)
    assert _cluster_set(out) == before
