"""FrontierEngine — the PySpark-native crawl frontier + fetch scheduler.

The north-rule centerpiece (BASELINE.json): a from-scratch replacement for
the reference's asyncio crawler (crawl4ai_llm CrawlerConfig semantics,
config.py:35-62) built as deterministic microbatch *waves* over
snapshot-committed tables.

Per wave:
  1. POLITENESS + PRIORITY DRAIN — per-host budget
     B = max(1, ⌊wave_seconds / crawl_delay⌋) (robots override, else the
     CrawlerConfig.delay default, ref config.py:56), priority
     (depth asc, score desc, url_hash asc). Realized as an EXACT two-phase
     top-B: rank within (host, salt) first — pmod(url_hash, n_salts) salts
     split the hot host across partitions — then rank the ≤ salts·B
     survivors per host. Same result as a single per-host window, without
     a skewed shuffle (host 0 holds ~30% of the frontier by construction).
  2. FETCH — scheduled URLs cross to Python once, in Arrow batches
     (mapInPandas), returning (ok, links, interleaved spans). No per-row
     UDFs anywhere (driver input_hint mandate).
  3. RETRY — failures requeue with attempt+1 while attempt ≤ max_retries
     (ref config.py:54-55 semantics).
  4. DISCOVER — out-links are canonicalized (vectorized pandas UDF),
     murmur3-hashed, robots-filtered (broadcast join against the tiny
     rules table), deduplicated: groupBy(url).min(depth) within the wave,
     Bloom-prefiltered against the seen set (bloom.py — no false
     negatives), then EXACT anti-join on the Bloom-positive remainder.
  5. COMMIT — docs/seen/schedule/frontier/checkpoint snapshots, checkpoint
     LAST; every snapshot is tagged with the wave, so a killed job resumes
     from the last fully-committed wave (``resume()`` rolls each table back
     to the checkpointed wave).

Crawl-order parity with the reference semantics is defined and tested at
wave granularity (SURVEY.md §8.2): same URL→wave assignment, same per-host
in-wave order, same final seen set as the pure-Python oracle simulator
(tests/oracle_crawler.py) on the same seeded web graph.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from crawl4ai_llm_spark.catalog import Catalog
from crawl4ai_llm_spark.frontier import bloom as bloom_mod
from crawl4ai_llm_spark.frontier import webgraph as wg
from crawl4ai_llm_spark.functions.urls import canonicalize_url, host_of, url_hash
from crawl4ai_llm_spark.schemas import SPAN_TYPE

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)


@dataclass
class CrawlConfig:
    # reference CrawlerConfig semantics (config.py:54-56)
    delay: float = 1.0
    max_retries: int = 3
    # engine wave parameters
    wave_seconds: float = 8.0
    max_depth: int = 5
    max_waves: int = 1000
    n_salts: int = 8
    use_bloom: bool = True
    bloom_buckets: int = 64
    graph: wg.GraphSpec = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.graph is None:
            self.graph = wg.GraphSpec()


def score_expr(hash_col) -> F.Column:
    """Deterministic priority score from the URL hash (shared with the
    oracle): ((hash & 0x7fffffff) % 1000) / 1000."""
    return ((hash_col.bitwiseAND(F.lit(0x7FFFFFFF))) % 1000).cast("double") / 1000.0


class FrontierEngine:
    def __init__(self, spark: SparkSession, warehouse: str, config: CrawlConfig | None = None):
        self.spark = spark
        self.config = config or CrawlConfig()
        self.catalog = Catalog(spark, warehouse)
        self.frontier = self.catalog.table("frontier_pending")
        self.seen = self.catalog.table("seen")
        self.docs = self.catalog.table("docs_spans")
        self.schedule = self.catalog.table("schedule")
        self.checkpoints = self.catalog.table("checkpoints")
        self._robots_df: DataFrame | None = None

    # ------------------------------------------------------------------ setup

    def robots_df(self) -> DataFrame:
        """Tiny host→rules dimension — always broadcast (C7)."""
        if self._robots_df is None:
            rows = wg.robots_rules(self.config.graph)
            self._robots_df = self.spark.createDataFrame(
                rows, "host string, deny_prefixes array<string>, crawl_delay double"
            )
        return self._robots_df

    def _with_frontier_cols(self, urls: DataFrame, depth_col: str = "depth") -> DataFrame:
        """url (canonical) → full frontier row (hash, host, score)."""
        return urls.select(
            "url",
            url_hash(F.col("url")).alias("url_hash"),
            host_of(F.col("url")).alias("host"),
            F.col(depth_col).cast("int").alias("depth"),
            F.lit(0).alias("attempt"),
        ).withColumn("score", score_expr(F.col("url_hash")))

    def _robots_allowed(self, df: DataFrame) -> DataFrame:
        """Drop robots-denied URLs: broadcast join + vectorized prefix test."""
        path = F.regexp_replace(F.col("url"), r"^[a-z]+://[^/]+", "")
        return (
            df.join(F.broadcast(self.robots_df().select("host", "deny_prefixes")), "host", "left")
            .where(
                F.col("deny_prefixes").isNull()
                | ~F.exists(F.col("deny_prefixes"), lambda p: path.startswith(p))
            )
            .drop("deny_prefixes")
        )

    def init_seeds(self, seeds: list[str]) -> None:
        """Canonicalize + dedup the seed list, commit frontier/seen at wave 0."""
        raw = self.spark.createDataFrame([(s,) for s in seeds], ["raw_url"])
        canon = raw.select(canonicalize_url(F.col("raw_url")).alias("url")).where(
            F.col("url").isNotNull()
        )
        rows = self._with_frontier_cols(
            canon.distinct().withColumn("depth", F.lit(0))
        )
        rows = self._robots_allowed(rows)
        self.frontier.overwrite(rows, counters={"wave": 0})
        self.seen.overwrite(
            rows.select("url_hash", "url", F.lit(0).alias("wave")), counters={"wave": 0}
        )
        self.checkpoints.overwrite(
            self.spark.createDataFrame(
                [(0, -1, 0, 0, 0)],
                "wave int, partition_id int, urls_scheduled long, urls_fetched long, urls_failed long",
            ).withColumn("committed_at", F.current_timestamp()),
            counters={"wave": 0},
        )

    # ------------------------------------------------------------------ wave

    def _fetch(self, scheduled: DataFrame) -> DataFrame:
        """Arrow-batched synthetic fetch (C9). Real deployment swaps the body
        for async HTTP with the same batch interface."""
        spec = self.config.graph

        def run(batches):
            for pdf in batches:
                oks, links, spans = [], [], []
                for url, attempt in zip(pdf["url"], pdf["attempt"]):
                    ok = wg.fetch_ok(spec, url, int(attempt))
                    oks.append(ok)
                    links.append(wg.out_links(spec, url) if ok else [])
                    spans.append(wg.page_spans(spec, url) if ok else [])
                yield pd.DataFrame(
                    {
                        "url": pdf["url"],
                        "attempt": pdf["attempt"],
                        "depth": pdf["depth"],
                        "ok": oks,
                        "links": links,
                        "spans": spans,
                    }
                )

        return scheduled.select("url", "attempt", "depth").mapInPandas(
            run, FETCH_RESULT_SCHEMA
        )

    def run_wave(self, wave: int) -> dict[str, int]:
        cfg = self.config
        pending = self.frontier.read()
        if pending is None or pending.isEmpty():
            return {"scheduled": 0}

        # --- politeness budget (C5) + two-phase exact per-host top-B ---
        budget = F.greatest(
            F.lit(1),
            F.floor(F.lit(cfg.wave_seconds) / F.coalesce(F.col("crawl_delay"), F.lit(cfg.delay))),
        ).cast("int")
        with_budget = pending.join(
            F.broadcast(self.robots_df().select("host", "crawl_delay")), "host", "left"
        ).withColumn("budget", budget).drop("crawl_delay")

        pri = [F.col("depth").asc(), F.col("score").desc(), F.col("url_hash").asc()]
        salt = F.pmod(F.col("url_hash"), F.lit(cfg.n_salts))
        w_salted = Window.partitionBy("host", salt).orderBy(*pri)
        with_r1 = with_budget.withColumn("r1", F.row_number().over(w_salted)).cache()
        # phase 1 keeps at most n_salts·B rows per host; a row cut here can
        # never be in the true per-host top-B (its own salt already has B
        # better rows), so phase 2 over the survivors is EXACT.
        pruned = with_r1.where(F.col("r1") <= F.col("budget"))
        salt_cut = with_r1.where(F.col("r1") > F.col("budget"))
        w_host = Window.partitionBy("host").orderBy(*pri)
        ranked = pruned.withColumn("host_rank", F.row_number().over(w_host))
        scheduled = ranked.where(F.col("host_rank") <= F.col("budget")).cache()
        n_scheduled = scheduled.count()
        if n_scheduled == 0:
            return {"scheduled": 0}

        # --- fetch (C9) ---
        results = self._fetch(scheduled).withColumn(
            "partition_id", F.spark_partition_id()
        ).cache()

        # --- retries (C8) ---
        requeue = (
            results.where(~F.col("ok") & (F.col("attempt") + 1 <= cfg.max_retries))
            .select("url", "depth", (F.col("attempt") + 1).alias("attempt"))
            .join(scheduled.select("url", "url_hash", "host", "score"), "url")
            .select("url", "url_hash", "host", "depth", "attempt", "score")
        )

        # --- discovery (C1/C2/C10 + dedup C3/C4) ---
        discovered = (
            results.where(F.col("ok"))
            .select(F.col("depth").alias("parent_depth"), F.explode("links").alias("raw_url"))
            .where(F.col("parent_depth") + 1 <= cfg.max_depth)
            .select(
                canonicalize_url(F.col("raw_url")).alias("url"),
                (F.col("parent_depth") + 1).alias("depth"),
            )
            .where(F.col("url").isNotNull())
            .groupBy("url")
            .agg(F.min("depth").alias("depth"))  # wave-deterministic dedup
        )
        discovered = self._robots_allowed(
            self._with_frontier_cols(discovered)
        )
        seen_df = self.seen.read()
        if cfg.use_bloom and seen_df is not None:
            blooms = bloom_mod.build_blooms(seen_df, cfg.bloom_buckets)
            probed = bloom_mod.probe_expr(discovered, blooms, cfg.bloom_buckets)
            definitely_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
            candidates = probed.where(F.col("maybe_seen")).drop("maybe_seen")
            # exact verification tier (C4): only Bloom-positive candidates
            # pay the anti-join against the seen table
            verified_new = candidates.join(seen_df.select("url"), "url", "left_anti")
            new_links = definitely_new.unionByName(verified_new)
        elif seen_df is not None:
            new_links = discovered.join(seen_df.select("url"), "url", "left_anti")
        else:
            new_links = discovered
        new_links = new_links.select(
            "url", "url_hash", "host", "depth", "attempt", "score"
        ).cache()

        # --- assemble next frontier: rows cut in either top-B phase stay ---
        cols = ["url", "url_hash", "host", "depth", "attempt", "score"]
        leftovers = (
            ranked.where(F.col("host_rank") > F.col("budget"))
            .select(*cols)
            .unionByName(salt_cut.select(*cols))
        )
        next_frontier = leftovers.unionByName(requeue).unionByName(new_links)

        # --- counters + per-partition lineage ---
        lineage = (
            results.groupBy("partition_id")
            .agg(
                F.count("*").alias("urls_scheduled"),
                F.sum(F.col("ok").cast("long")).alias("urls_fetched"),
                F.sum((~F.col("ok")).cast("long")).alias("urls_failed"),
            )
            .withColumn("wave", F.lit(wave))
            .select("wave", "partition_id", "urls_scheduled", "urls_fetched", "urls_failed")
            .withColumn("committed_at", F.current_timestamp())
        )
        n_fetched = results.where(F.col("ok")).count()

        # --- commits (checkpoint LAST = the wave's commit point) ---
        wave_tag = {"wave": wave}
        self.docs.append(
            results.where(F.col("ok")).select(F.col("url").alias("doc_id"), "spans"),
            counters=wave_tag,
        )
        self.seen.append(
            new_links.select("url_hash", "url", F.lit(wave).alias("wave")), counters=wave_tag
        )
        self.schedule.append(
            scheduled.select(
                "url", "host", "depth", "attempt", "host_rank", F.lit(wave).alias("wave")
            ),
            counters=wave_tag,
        )
        self.frontier.overwrite(next_frontier, counters=wave_tag)
        self.checkpoints.append(lineage, counters=wave_tag)

        stats = {"scheduled": n_scheduled, "fetched": n_fetched}
        scheduled.unpersist()
        with_r1.unpersist()
        results.unpersist()
        new_links.unpersist()
        return stats

    # ------------------------------------------------------------------ drive

    def last_committed_wave(self) -> int:
        snap = self.checkpoints.current_snapshot()
        if snap is None:
            return -1
        return int(snap.counters.get("wave", 0))

    def resume(self) -> int:
        """Roll every table back to the last fully-committed wave (the
        checkpoint table's HEAD tag). Tables whose HEAD carries a NEWER wave
        tag were written by a killed, uncommitted wave — rewind them."""
        committed = self.last_committed_wave()
        if committed < 0:
            return -1
        for tbl in (self.docs, self.seen, self.schedule, self.frontier):
            snap = tbl.current_snapshot()
            if snap is None or int(snap.counters.get("wave", 0)) <= committed:
                continue
            for cand in reversed(tbl.snapshots()):
                if int(cand.counters.get("wave", 0)) <= committed:
                    tbl.rollback(cand.snapshot_id)
                    break
        return committed

    def run(self, seeds: list[str] | None = None, max_waves: int | None = None) -> int:
        """Crawl to frontier exhaustion (or the wave cap). Returns the number
        of waves executed."""
        if seeds is not None:
            self.init_seeds(seeds)
            start = 0
        else:
            start = self.resume()
        max_waves = max_waves or self.config.max_waves
        wave = start
        while wave < max_waves:
            wave += 1
            stats = self.run_wave(wave)
            if stats.get("scheduled", 0) == 0:
                break
        return wave - start
