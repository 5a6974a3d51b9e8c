"""Streaming/batch semantic equality: the streaming pipeline drained with
Trigger.AvailableNow must produce exactly the batch query's rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_llm_spark.streaming import events as se


def test_hourly_stream_equals_batch(spark, sf_dir, tmp_path):
    import os

    events_dir = str(tmp_path / "events_stream")  # file source needs a DIR
    os.makedirs(events_dir)
    os.symlink(f"{sf_dir}/events.parquet", f"{events_dir}/part-0.parquet")
    stream = se.read_events_stream(spark, events_dir)
    out = se.hourly_event_counts(stream)
    rows = se.run_available_now(out, str(tmp_path / "ckpt"))

    batch = (
        spark.read.parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    )
    got = {(r["hour"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in rows}
    want = {(r["hour"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in batch}
    assert got == want
