"""T1-T6 — streaming semantics: availableNow stream == batch on the same
input (the engine's stream/batch parity contract)."""

from pyspark.sql import functions as F

from entity_knowledge_in_bert_spark.streaming import ingest


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream = ingest.read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = ingest.run_stream_to_table(
        spark, ingest.tumbling_counts(stream), output_mode="complete"
    )
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stateful_dedup_drops_duplicate_file(spark, sf_dir, tmp_path):
    """Two copies of the same file in the source dir -> dedup keeps one
    copy of each event_id (watermark wide enough to hold all state)."""
    import shutil

    d = tmp_path / "dup_src"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "b.parquet")
    stream = ingest.read_events_stream(spark, str(d))
    deduped = ingest.run_stream_to_table(
        spark, ingest.stateful_dedup(stream, watermark="8760 hours")
    )
    n_unique = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert deduped.count() == n_unique


def test_sliding_windows_run(spark, sf_dir):
    stream = ingest.read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = ingest.run_stream_to_table(
        spark, ingest.sliding_value_sum(stream), output_mode="complete"
    )
    # every event lands in 4 sliding windows (1h window / 15m slide)
    total_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert got.agg(F.count("*")).collect()[0][0] > 0
    rows = got.collect()
    assert all(r["win_end"] > r["win_start"] for r in rows)
