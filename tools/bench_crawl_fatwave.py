"""Content-dedup integration cost vs wave size (VERDICT r05 #3).

The r05 A/B measured the per-wave match-then-ingest at ~5 s/wave on the
bench graph's ~27k-doc waves — a FIXED stage chain (probe join,
broadcast count, verify, distinct, ingest append) that read as −38%
urls/s AT THAT WAVE SIZE. The amortization claim ("at production fat
waves the fixed cost shrinks toward the signature pass's ∝-bytes
floor") was argued, not exercised. This tool exercises it: the same
graph family at 1× / 2× / 4× hosts (same depth profile, so docs/wave
scales with the graph), each crawled with content_dedup off and on,
every leg stamped with the IN-RUN /proc/stat sys share (the r05 scaling
gate's measurement — instant controls miss mid-run windows).

Expected shape: the absolute dedup overhead per wave grows ∝ wave bytes
only through the signature pass, so overhead/wall falls as waves fatten;
the ≤15% target at the largest size is the acceptance line VERDICT set.

Usage: python tools/bench_crawl_fatwave.py [--quick] [--scales=1,2,4]
                                           [--latency=MS]
`--latency` runs both legs under the engine's async-pool fetch model
(2048 concurrent request slots, MS per request) — the politeness-bound
wall a production crawler actually runs at; the default 0 is the
instant-fetch worst case. Writes one JSON line per leg + a final
summary JSON line; healthy-box evidence for BENCH.md's r06 table.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cpu_jiffies() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[1]) + int(parts[2]), int(parts[3])


def run_leg(spark, scale: int, dedup_on: bool, latency_ms: float = 0.0) -> dict:
    from crawl4ai_llm_spark.frontier import webgraph as wg
    from crawl4ai_llm_spark.frontier.engine import CrawlConfig, FrontierEngine

    # same family as bench.py's crawl_throughput graph; hosts (and seeds)
    # scale together so the BFS depth profile — and therefore the wave
    # COUNT — stays put while every wave fattens ∝ scale
    spec = wg.GraphSpec(
        n_hosts=300 * scale,
        pages_per_host=700,
        hot_factor=30,
        max_links=12,
        # the default 16-word vocab makes organic near-dup PAIRS grow ∝
        # hosts² (measured 6.9k→107k from 1×→4×), drowning the fixed-cost
        # amortization this tool exists to measure — large vocab kills the
        # accidental collisions; near_dup_every=50 plants a LINEAR-in-corpus
        # dup rate (chain length 14/host) so the match path still does work
        vocab=65536,
        near_dup_every=50,
        seed="bench-42",
    )
    cfg = CrawlConfig(
        wave_seconds=3600.0,
        max_depth=5,
        max_waves=8,
        graph=spec,
        content_dedup=dedup_on,
        content_dedup_policy="flag",
        # --latency mode: the engine's async-pool fetch model (each Arrow
        # batch sleeps len*latency/async_concurrency) — the
        # politeness-bound wall a production crawler actually runs at,
        # vs the instant-fetch worst case at the default 0
        fetch_latency_ms=latency_ms,
    )
    with tempfile.TemporaryDirectory() as tmp:
        eng = FrontierEngine(spark, tmp, cfg)
        u0, s0 = _cpu_jiffies()
        t0 = time.time()
        waves = eng.run(seeds=wg.seed_urls(spec, n_seeds=1000 * scale))
        wall = time.time() - t0
        u1, s1 = _cpu_jiffies()
        n_urls = eng.schedule.read().count()
        n_docs = eng.docs.read().count()
        n_pairs = (
            eng.dup_pairs.read().count()
            if dedup_on and not eng.dup_pairs.is_empty()
            else 0
        )
        # DIRECT phase attribution (engine.wave_marks): the dedup cost is
        # the serial match phase plus whatever it adds to the commit pool —
        # robust to the box-state variance that can swamp an off/on wall
        # subtraction (measured 2-5x run swings on this sandbox)
        match_wall = sum(m.get("content_dedup_match", 0.0) for m in eng.wave_marks.values())
        commit_wall = sum(
            m.get("table_commits+filter_delta", 0.0) for m in eng.wave_marks.values()
        )
    du, ds = u1 - u0, s1 - s0
    return {
        "scale": scale,
        "content_dedup": dedup_on,
        "fetch_latency_ms": latency_ms,
        "urls": n_urls,
        "docs": n_docs,
        "waves": waves,
        "docs_per_wave": round(n_docs / max(1, waves)),
        "wall_sec": round(wall, 1),
        "urls_per_sec": round(n_urls / wall, 1),
        "dup_pairs": n_pairs,
        "match_wall_sec": round(match_wall, 1),
        "match_ms_per_doc": round(1000 * match_wall / max(1, n_docs), 3),
        "commit_wall_sec": round(commit_wall, 1),
        "run_sys_frac": round(ds / max(1, du + ds), 3),
    }


def main() -> None:
    from crawl4ai_llm_spark.session import get_spark

    scales = [1, 2, 4]
    latency_ms = 0.0
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--latency"):
            latency_ms = float(a.split("=", 1)[1])
    if "--quick" in sys.argv:
        scales = [1]
    import bench  # repo-root bench.py: the fixed-work hardware-state anchor

    def wait_healthy(limit_min: float = 20.0) -> dict:
        """Poll the fixed-work anchor until the box leaves its degraded
        kernel-time state (sys share < 0.25; windows of 0.5-0.9 come and
        go on ~10-min scales on this sandbox, independent of our load).
        Gives up after limit_min and stamps the leg with what it saw."""
        t0 = time.time()
        while True:
            ctl = bench.cpu_state_control()
            if ctl["allcore_sys_frac"] < 0.25 or time.time() - t0 > limit_min * 60:
                return ctl
            print(
                f"# box degraded (allcore_sys_frac={ctl['allcore_sys_frac']}), waiting",
                flush=True,
            )
            time.sleep(45)

    spark = get_spark(app_name="bench_crawl_fatwave")
    bench.cpu_state_control()  # throwaway: the first control in a fresh
    # process reads degraded while the JVM warms (measured 0.95 → 0.01)
    # JVM/JIT warm-up crawl, unrecorded: the first leg of a fresh JVM
    # otherwise runs ~30% slow (measured 86 s vs 58 s for the identical
    # scale-1 off leg), which biases the first A/B pair
    from crawl4ai_llm_spark.frontier import webgraph as _wg
    from crawl4ai_llm_spark.frontier.engine import CrawlConfig as _CC
    from crawl4ai_llm_spark.frontier.engine import FrontierEngine as _FE

    _spec = _wg.GraphSpec(n_hosts=40, pages_per_host=200, seed="warmup")
    with tempfile.TemporaryDirectory() as _tmp:
        _FE(spark, _tmp, _CC(wave_seconds=3600.0, max_depth=3, max_waves=4,
                             graph=_spec, content_dedup=True,
                             content_dedup_policy="flag")).run(
            seeds=_wg.seed_urls(_spec, n_seeds=40))
    rows = []
    for scale in scales:
        legs = {}
        for dedup_on in (False, True):
            # fixed-work control BEFORE the leg: the leg's own in-run sys
            # share is workload-colored (dedup waves intrinsically run
            # ~0.3), so degradation is judged from this anchor instead
            ctl = wait_healthy()
            r = run_leg(spark, scale, dedup_on, latency_ms=latency_ms)
            r["pre_leg_allcore_sys_frac"] = ctl["allcore_sys_frac"]
            r["pre_leg_allcore_sec"] = ctl["allcore_sec"]
            legs[dedup_on] = r
            print(json.dumps(r), flush=True)
        off, on = legs[False], legs[True]
        overhead_sec = on["wall_sec"] - off["wall_sec"]
        rows.append(
            {
                "scale": scale,
                "docs_per_wave": on["docs_per_wave"],
                "off_urls_per_sec": off["urls_per_sec"],
                "on_urls_per_sec": on["urls_per_sec"],
                "overhead_sec": round(overhead_sec, 1),
                "overhead_per_wave_sec": round(overhead_sec / max(1, on["waves"]), 2),
                "throughput_cost_pct": round(
                    100 * (1 - on["urls_per_sec"] / off["urls_per_sec"]), 1
                ),
                # direct attribution: serial match phase + commit-pool delta
                # (off-leg commit wall as the baseline) — the A/B columns
                # above inherit BOTH legs' box noise; these inherit only the
                # on-leg's
                "match_wall_sec": on["match_wall_sec"],
                "match_ms_per_doc": on["match_ms_per_doc"],
                "commit_delta_sec": round(
                    on["commit_wall_sec"] - off["commit_wall_sec"], 1
                ),
                "direct_cost_pct": round(
                    100
                    * (on["match_wall_sec"] + on["commit_wall_sec"] - off["commit_wall_sec"])
                    / max(0.1, on["wall_sec"]),
                    1,
                ),
                "dup_pairs": on["dup_pairs"],
                "worst_sys_frac": max(off["run_sys_frac"], on["run_sys_frac"]),
                "worst_pre_leg_ctl": max(
                    off["pre_leg_allcore_sys_frac"], on["pre_leg_allcore_sys_frac"]
                ),
            }
        )
    print(json.dumps({"summary": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
