"""North-rule parity tests: Spark frontier engine vs pure-Python oracle.

Criteria (SURVEY.md §8.2 / BASELINE.json north_rule):
  (a) exact final URL-seen set equality
  (b) wave-level ordering equality (every URL's first-schedule wave)
  (c) per-host in-wave order equality
  (d) per-row span-sequence equality (kind, text, media_ref, order)
  (e) kill/resume: a crashed-and-resumed crawl equals an uninterrupted one
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_llm_spark.frontier import webgraph as wg
from crawl4ai_llm_spark.frontier.engine import CrawlConfig, FrontierEngine

from tests.oracle_crawler import simulate

SPEC = wg.GraphSpec(n_hosts=12, pages_per_host=30, hot_factor=8, max_links=10, seed="test-42")
CFG = dict(delay=1.0, wave_seconds=16.0, max_retries=3, max_depth=4, max_waves=60)
SEEDS = wg.seed_urls(SPEC, n_seeds=15)


@pytest.fixture(scope="module")
def oracle():
    return simulate(SPEC, SEEDS, **{k: v for k, v in CFG.items()})


@pytest.fixture(scope="module")
def engine_run(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("crawl_wh"))
    eng = FrontierEngine(
        spark,
        wh,
        CrawlConfig(
            delay=CFG["delay"],
            wave_seconds=CFG["wave_seconds"],
            max_retries=CFG["max_retries"],
            max_depth=CFG["max_depth"],
            max_waves=CFG["max_waves"],
            graph=SPEC,
        ),
    )
    eng.run(seeds=SEEDS)
    return eng


def test_seen_set_equality(engine_run, oracle):
    got = {r["url"] for r in engine_run.seen.read().select("url").collect()}
    assert got == oracle.seen


def test_wave_assignment_equality(engine_run, oracle):
    sched = (
        engine_run.schedule.read()
        .groupBy("url")
        .agg(F.min("wave").alias("wave"))
        .collect()
    )
    got = {r["url"]: r["wave"] for r in sched}
    assert got == oracle.wave_of


def test_per_host_in_wave_order(engine_run, oracle):
    rows = engine_run.schedule.read().select("host", "wave", "host_rank", "url").collect()
    got: dict[tuple[str, int], list[tuple[int, str]]] = {}
    for r in rows:
        got.setdefault((r["host"], r["wave"]), []).append((r["host_rank"], r["url"]))
    got_order = {k: [u for _, u in sorted(v)] for k, v in got.items()}
    oracle_order = {k: v for k, v in oracle.host_order.items() if v}
    assert got_order == oracle_order


def test_span_sequence_equality(engine_run, oracle):
    rows = engine_run.docs.read().select("doc_id", "spans").collect()
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in rows
    }
    want = {
        u: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for u, spans in oracle.spans.items()
    }
    assert got == want


def test_fetch_and_seen_counts(engine_run, oracle):
    assert engine_run.docs.read().count() == len(oracle.fetched)
    assert engine_run.seen.read().count() == len(oracle.seen)


def test_checkpoint_lineage_totals(engine_run, oracle):
    cp = engine_run.checkpoints.read()
    total_sched = cp.agg(F.sum("urls_scheduled")).collect()[0][0]
    # every schedule-log row is covered by per-partition lineage counters
    assert total_sched == engine_run.schedule.read().count()


def test_resume_equals_uninterrupted(spark, tmp_path, oracle):
    wh = str(tmp_path / "resume_wh")
    cfg = CrawlConfig(
        delay=CFG["delay"],
        wave_seconds=CFG["wave_seconds"],
        max_retries=CFG["max_retries"],
        max_depth=CFG["max_depth"],
        max_waves=3,
        graph=SPEC,
    )
    eng = FrontierEngine(spark, wh, cfg)
    eng.run(seeds=SEEDS)  # stops after wave 3 — the "crash"

    # simulate a torn wave: docs got an uncommitted wave-4 append, the
    # checkpoint never landed
    junk = spark.createDataFrame([("junk", [], 4)], eng.docs.read().schema)
    eng.docs.append(junk, counters={"wave": 4})

    cfg2 = CrawlConfig(**{**cfg.__dict__, "max_waves": CFG["max_waves"]})
    eng2 = FrontierEngine(spark, wh, cfg2)
    assert eng2.resume() == 3  # rolls docs back to wave 3
    eng2.run(seeds=None, max_waves=CFG["max_waves"])

    got_seen = {r["url"] for r in eng2.seen.read().select("url").collect()}
    assert got_seen == oracle.seen
    got_waves = {
        r["url"]: r["wave"]
        for r in eng2.schedule.read().groupBy("url").agg(F.min("wave").alias("wave")).collect()
    }
    assert got_waves == oracle.wave_of
    assert "junk" not in {r["doc_id"] for r in eng2.docs.read().select("doc_id").collect()}


def test_resume_backfills_legacy_docs_wave_column(spark, tmp_path):
    """A warehouse written before docs carried the row-level ``wave``
    column (pre-r06) must resume: the column is backfilled with the
    committed wave (exact for the legacy case — no recrawl history, one
    row per doc_id) and subsequent wave appends schema-match."""
    wh = str(tmp_path / "legacy_wh")
    cfg = CrawlConfig(
        delay=CFG["delay"], wave_seconds=CFG["wave_seconds"],
        max_retries=CFG["max_retries"], max_depth=CFG["max_depth"],
        max_waves=2, graph=SPEC,
    )
    eng = FrontierEngine(spark, wh, cfg)
    eng.run(seeds=SEEDS)
    committed = eng.last_committed_wave()
    # forge the legacy layout: same rows, no wave column
    legacy = eng.docs.read().drop("wave")
    eng.docs.overwrite(legacy, counters={"wave": committed})

    eng2 = FrontierEngine(spark, wh, CrawlConfig(**{**cfg.__dict__, "max_waves": 4}))
    assert eng2.resume() == committed
    migrated = eng2.docs.read()
    assert "wave" in migrated.columns
    assert migrated.where(F.col("wave") != committed).count() == 0
    # the resumed crawl appends cleanly against the migrated schema
    eng2.run(seeds=None, max_waves=4)
    assert eng2.docs.read().where(F.col("wave") > committed).count() > 0


def test_partitioned_bloom_probe_matches_broadcast(spark):
    """The executor-resident (cogrouped) Bloom tier must agree bit-for-bit
    with the broadcast tier: same bitmaps, same maybe_seen output."""
    from crawl4ai_llm_spark.frontier import bloom as bm

    seen = spark.range(0, 6000).select(
        ((F.col("id") * 2654435761) % 1000000007 - 500000000).alias("url_hash")
    )
    n = 16
    # bitmaps: distributed build (broadcast tier) vs cogrouped update tier
    broadcast_filters = bm.build_blooms(seen, n)
    rows = bm.update_filter_rows(seen.select("url_hash"), None, n).collect()
    part_filters = {r["bucket"]: bytes(r["bloom"]) for r in rows}
    assert part_filters == broadcast_filters
    # probe: members + fresh keys, both tiers, identical verdicts per key
    mix = seen.unionByName(
        spark.range(0, 3000).select((F.col("id") * 7919 + 13).alias("url_hash"))
    )
    got_b, bc = bm.probe_expr(mix, broadcast_filters, n)
    b_map = {r["url_hash"]: r["maybe_seen"] for r in got_b.collect()}
    bc.destroy()
    filters_df = spark.createDataFrame(
        [(k, v) for k, v in part_filters.items()], "bucket int, bloom binary"
    )
    got_p = bm.probe_cogrouped(mix, filters_df, n)
    p_map = {r["url_hash"]: r["maybe_seen"] for r in got_p.collect()}
    assert p_map == b_map
    # incremental update carries untouched buckets through unchanged
    delta = spark.range(100000, 100200).select((F.col("id") * 31).alias("url_hash"))
    rows2 = bm.update_filter_rows(delta, filters_df, n).collect()
    assert {r["bucket"] for r in rows2} == set(part_filters)  # complete table
    probed2 = bm.probe_cogrouped(delta, spark.createDataFrame(
        [(r["bucket"], bytes(r["bloom"])) for r in rows2], "bucket int, bloom binary"
    ), n)
    assert probed2.where(~F.col("maybe_seen")).count() == 0  # no false negatives


def test_partitioned_bloom_engine_matches_oracle(spark, tmp_path, oracle):
    """Full crawl with bloom_transport='partitioned': nothing transits the
    driver, final seen set still exactly equals the oracle, and the filter
    table participates in kill/resume."""
    wh = str(tmp_path / "pbloom_wh")
    cfg = CrawlConfig(
        delay=CFG["delay"],
        wave_seconds=CFG["wave_seconds"],
        max_retries=CFG["max_retries"],
        max_depth=CFG["max_depth"],
        max_waves=3,
        bloom_transport="partitioned",
        graph=SPEC,
    )
    eng = FrontierEngine(spark, wh, cfg)
    eng.run(seeds=SEEDS)  # "crash" after wave 3
    eng2 = FrontierEngine(spark, wh, CrawlConfig(**{**cfg.__dict__, "max_waves": CFG["max_waves"]}))
    assert eng2.resume() == 3
    eng2.run(seeds=None, max_waves=CFG["max_waves"])
    got = {r["url"] for r in eng2.seen.read().select("url").collect()}
    assert got == oracle.seen
    # the filter table reflects the final seen set (no false negatives)
    filters_df = eng2.blooms_table.read()
    assert filters_df is not None
    from crawl4ai_llm_spark.frontier import bloom as bm

    probed = bm.probe_cogrouped(
        eng2.seen.read().select("url_hash"), filters_df, eng2.config.bloom_buckets
    )
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_auto_transport_switches_mid_run_with_parity(spark, tmp_path, oracle):
    """bloom_transport='auto' must START on broadcast (filter footprint
    under the budget: 15 seed buckets × 16 KiB), SWITCH one-way to
    partitioned once the footprint outgrows broadcast_budget_bytes, and the
    crawl's final seen set must still exactly equal the oracle — the
    transport choice is pure mechanism, never semantics."""
    wh = str(tmp_path / "auto_wh")
    cfg = CrawlConfig(
        delay=CFG["delay"],
        wave_seconds=CFG["wave_seconds"],
        max_retries=CFG["max_retries"],
        max_depth=CFG["max_depth"],
        max_waves=CFG["max_waves"],
        bloom_transport="auto",
        # seeds fill ~15 of 64 buckets (~245 KiB) — under budget; after
        # wave 1's discoveries most buckets are non-empty (~1 MiB) — over
        broadcast_budget_bytes=400_000,
        graph=SPEC,
    )
    eng = FrontierEngine(spark, wh, cfg)
    eng.run(seeds=SEEDS)
    assert eng.transport_log[0] == "broadcast"
    assert "partitioned" in eng.transport_log, eng.transport_log
    sw = eng.transport_log.index("partitioned")
    assert all(t == "partitioned" for t in eng.transport_log[sw:]), "switch must be one-way"
    got = {r["url"] for r in eng.seen.read().select("url").collect()}
    assert got == oracle.seen
    # the switched state survives kill/resume: a fresh engine resolves
    # straight to partitioned from the filter table's existence
    eng2 = FrontierEngine(spark, wh, cfg)
    eng2.resume()
    assert eng2._resolve_transport() == "partitioned"


def test_evict_keeps_partitioned_filter_state(spark, tmp_path):
    """evict_from_seen on a partitioned/switched-auto run must keep the
    filter table alive, not drop it: a dropped table would make auto's next
    wave fall back to a driver-side broadcast rebuild of the entire filter
    set (the regime the budget ruled out) and break the one-way-switch
    invariant (code-review r03 finding). The rebuild itself is DEFERRED
    (ADVICE r03): N evictions tag the table ``stale`` at zero rebuild cost
    — a stale filter only over-includes the evicted keys, which the exact
    anti-join verifies anyway — and the next wave's probe rebuilds once."""
    wh = str(tmp_path / "evict_part_wh")
    cfg = CrawlConfig(
        delay=CFG["delay"],
        wave_seconds=CFG["wave_seconds"],
        max_retries=CFG["max_retries"],
        max_depth=CFG["max_depth"],
        max_waves=2,
        bloom_transport="auto",
        broadcast_budget_bytes=1,  # switch immediately
        graph=SPEC,
    )
    eng = FrontierEngine(spark, wh, cfg)
    eng.run(seeds=SEEDS)
    assert eng.transport_log[-1] == "partitioned"
    pre_evict_snap = eng.blooms_table.current_snapshot().snapshot_id
    victims = [r["url"] for r in eng.seen.read().limit(3).collect()]
    # three separate evictions: each must cost a metadata-only commit (same
    # file list), never a filter rebuild
    for v in victims:
        assert eng.evict_from_seen([v]) == 1
    # filter table survives (tagged stale, not dropped) → auto stays partitioned
    assert not eng.blooms_table.is_empty()
    assert eng._resolve_transport() == "partitioned"
    snap = eng.blooms_table.current_snapshot()
    assert snap.counters.get("stale") == 1
    assert snap.files == eng.blooms_table.snapshot(pre_evict_snap).files
    # the stale filter still has no false negatives on the remaining seen set
    from crawl4ai_llm_spark.frontier import bloom as bm

    probed = bm.probe_cogrouped(
        eng.seen.read().select("url_hash"), eng.blooms_table.read(), cfg.bloom_buckets
    )
    assert probed.where(~F.col("maybe_seen")).count() == 0
    # the next wave's probe performs the ONE deferred rebuild and clears the tag
    eng.run_wave(eng.last_committed_wave() + 1)
    snap2 = eng.blooms_table.current_snapshot()
    assert not snap2.counters.get("stale")
    assert snap2.files != snap.files  # actually rebuilt
    probed2 = bm.probe_cogrouped(
        eng.seen.read().select("url_hash"), eng.blooms_table.read(), cfg.bloom_buckets
    )
    assert probed2.where(~F.col("maybe_seen")).count() == 0


def test_resume_survives_torn_manifest_tmp(spark, tmp_path, oracle):
    """A crash BETWEEN the manifest tmp-write and its atomic rename leaves a
    snap-N.json.tmp-<uuid> file in meta/. snapshots() must ignore it (it was
    never published) and resume() must sweep it — this is exactly the crash
    window the manifest log exists to survive."""
    import os

    wh = str(tmp_path / "torn_wh")
    cfg = CrawlConfig(
        delay=CFG["delay"],
        wave_seconds=CFG["wave_seconds"],
        max_retries=CFG["max_retries"],
        max_depth=CFG["max_depth"],
        max_waves=2,
        graph=SPEC,
    )
    eng = FrontierEngine(spark, wh, cfg)
    eng.run(seeds=SEEDS)

    # forge the torn tmp file a kill-during-_publish would leave behind
    torn = os.path.join(eng.docs.meta_dir, "snap-99.json.tmp-deadbeef")
    with open(torn, "w") as f:
        f.write("{ partial")

    eng2 = FrontierEngine(spark, wh, cfg)
    assert [s.snapshot_id for s in eng2.docs.snapshots()]  # parses fine
    assert eng2.resume() == 2
    assert not os.path.exists(torn)  # swept
    # crawl continues normally after the torn-manifest recovery
    eng2.run(seeds=None, max_waves=CFG["max_waves"])
    got_seen = {r["url"] for r in eng2.seen.read().select("url").collect()}
    assert got_seen == oracle.seen
