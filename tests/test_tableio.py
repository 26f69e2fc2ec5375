"""TableIO — snapshot semantics, time travel, lineage (north_rule X4)."""

import pytest
from pyspark.sql import functions as F

from entity_knowledge_in_bert_spark.sources.tableio import TableIO


@pytest.fixture()
def io(spark, tmp_path):
    return TableIO(spark, str(tmp_path / "wh"))


def test_snapshot_create_and_read(spark, io):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    info = io.write(df, "t1", stage="s1")
    assert info.rows == 100
    assert io.read("t1").count() == 100


def test_latest_snapshot_wins(spark, io):
    io.write(spark.range(10), "t2", stage="s1")
    io.write(spark.range(25), "t2", stage="s1")
    assert io.read("t2").count() == 25


def test_time_travel_by_snapshot_id(spark, io):
    s1 = io.write(spark.range(10), "t3", stage="s1")
    io.write(spark.range(99), "t3", stage="s1")
    assert io.read("t3", snapshot_id=s1.snapshot_id).count() == 10
    assert io.read("t3").count() == 99


def test_lineage_rows_match_data(spark, io):
    io.write(spark.range(1000).repartition(4), "t4", stage="mystage")
    lin = io.read_lineage().filter(F.col("stage") == "mystage")
    total = lin.agg(F.sum("rows_out")).collect()[0][0]
    assert total == 1000
    assert lin.select("partition_id").distinct().count() >= 1


def test_missing_table_raises(io):
    with pytest.raises(FileNotFoundError):
        io.read("never_written")


def test_exists(spark, io):
    assert not io.exists("t5")
    io.write(spark.range(1), "t5")
    assert io.exists("t5")


def test_append_chain(spark, io):
    io.write(spark.range(10), "t6", stage="s1")
    io.write(spark.range(10, 15), "t6", stage="s1", append=True)
    assert io.read("t6").count() == 15
    # delta-only read of the append snapshot
    assert io.read("t6", io.latest_snapshot("t6"), chain=False).count() == 5
    # second append chains through the first
    io.write(spark.range(15, 18), "t6", stage="s1", append=True)
    assert io.read("t6").count() == 18


def test_bucketed_join_has_no_exchange(spark, io):
    """bucket_by snapshots: an equi-join on the bucket column planned as
    a sort-merge join needs NO exchange and NO sort on either side —
    the co-located-join layout that deletes a full-corpus shuffle per
    consumer at 100 TB."""
    left = spark.range(1000).withColumn("v", F.col("id") * 2)
    right = spark.range(1000).withColumn("w", F.col("id") + 1)
    io.write(left, "bl", bucket_by=(["id"], 4))
    io.write(right, "br", bucket_by=(["id"], 4))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = io.read("bl").join(io.read("br"), "id")
        assert j.count() == 1000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_snapshot_readable_without_catalog(spark, io, tmp_path):
    """The parquet files behind a bucketed snapshot stay readable when
    the writing session's in-memory catalog is gone."""
    io.write(spark.range(50).withColumn("v", F.lit(1)), "bc", bucket_by=(["id"], 2))
    man = io._load_manifest("bc")
    bt = man["snapshots"][-1]["bucket_table"]
    spark.sql(f"DROP TABLE {bt}")
    assert io.read("bc").count() == 50
