"""Streaming/batch semantic equality: the streaming pipeline drained with
Trigger.AvailableNow must produce exactly the batch query's rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_llm_spark.streaming import events as se


def test_stateful_sessions_match_batch(spark, sf_dir, tmp_path):
    """Sessions CLOSED by the stateful operator must equal the batch
    sessionization minus each user's final (still-open) session."""
    import os

    from crawl4ai_llm_spark.streaming import sessions as ss

    events_dir = str(tmp_path / "ev_stream")
    os.makedirs(events_dir)
    os.symlink(f"{sf_dir}/events.parquet", f"{events_dir}/part-0.parquet")
    stream = se.read_events_stream(spark, events_dir)
    rows = ss.run_stream_append(ss.session_updates(stream), str(tmp_path / "ckpt2"))
    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"]) for r in rows}

    # batch truth: sessions per user, excluding the last (unclosed) one
    import itertools

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", F.col("ts").cast("timestamp").cast("long").alias("epoch"))
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["epoch"])
    want = set()
    for uid, ts_list in by_user.items():
        ts_list.sort()
        sessions = []
        start = last = ts_list[0]
        n = 1
        for t in ts_list[1:]:
            if t - last > ss.SESSION_GAP_S:
                sessions.append((uid, start, last, n))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        want.update(sessions)  # final open session NOT emitted by the stream
    assert got == want
    assert len(got) > 0


def test_sessionize_survives_multichunk_groups(spark, tmp_path):
    """One user's microbatch exceeding arrow maxRecordsPerBatch arrives as
    MULTIPLE chunks, each internally unordered across sessions. Per-chunk
    sorting (the round-2 bug shape) would split sessions at chunk
    boundaries and emit phantom sessions; the fix accumulates the whole
    group and sorts once. This pins the fix permanently: red on the old
    code, green now."""
    import datetime as dt
    import os

    from crawl4ai_llm_spark.streaming import sessions as ss

    # 30 events for ONE user, alternating between two far-apart time bands
    # (A ≈ t0, B ≈ t0+3h): sorted, they form exactly two sessions (A closed,
    # B still open → emit only A). In arrival order every adjacent pair is
    # > gap apart — per-chunk processing would close ~29 phantom sessions.
    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)
    ts = []
    for i in range(15):
        ts.append(t0 + dt.timedelta(seconds=60 * i))            # band A
        ts.append(t0 + dt.timedelta(hours=3, seconds=60 * i))   # band B
    rows = [(i, t, 7, "click", 1.0, "{}") for i, t in enumerate(ts)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    events_dir = str(tmp_path / "mc_stream")
    os.makedirs(events_dir)
    df.coalesce(1).write.parquet(events_dir, mode="overwrite")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = se.read_events_stream(spark, events_dir)
        out = ss.run_stream_append(ss.session_updates(stream), str(tmp_path / "mc_ckpt"))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"]) for r in out}
    epoch = lambda t: int(t.replace(tzinfo=dt.timezone.utc).timestamp())  # noqa: E731
    band_a = sorted(epoch(t) for t in ts[0::2])
    assert got == {(7, band_a[0], band_a[-1], 15)}, got


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
