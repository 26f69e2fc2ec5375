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


def test_stateful_profile_carries_state_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: two source files -> two micro-batches; the
    per-user state (count + distinct-type set + max ts) must accumulate
    ACROSS batches, so the max-reduced emission log equals the batch
    aggregate over the doubled corpus."""
    import shutil

    from pyspark.sql import functions as F

    d = tmp_path / "profile_src"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "b.parquet")
    stream = ingest.read_events_stream(spark, str(d))
    log = ingest.run_stream_to_table(
        spark, ingest.stateful_user_profile(stream), output_mode="update"
    )
    got = log.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("n_types").alias("n_types"),
        F.max("max_ts_us").alias("max_ts_us"),
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = (
        ev.unionAll(ev)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").cast("int").alias("n_types"),
            # ts is TIMESTAMP_NTZ; session tz is UTC so the cast is identity
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("max_ts_us"),
        )
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # state really crossed batches: counts are the DOUBLED corpus counts
    single = ev.groupBy("user_id").count()
    doubled_ok = (
        got.join(single, "user_id")
        .filter(F.col("n_events") != 2 * F.col("count"))
        .count()
    )
    assert doubled_ok == 0


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
