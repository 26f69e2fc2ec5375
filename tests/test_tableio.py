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
