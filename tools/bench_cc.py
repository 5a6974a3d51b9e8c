"""Benchmark connected_components above the driver threshold (VERDICT r02 #5).

The driver union-find tier had been measured only implicitly (every
q_dedup_clusters run); the distributed Pregel min-label + pointer-doubling
loop had never been timed at all. This tool synthesizes pair lists with
known structure — C chains of length L (stress: diameter) plus K cliques of
size S (stress: per-round join fan-in) — at several edge counts, runs BOTH
tiers on the same input, checks the component count, and prints a table for
BENCH.md. The crossover pins ``driver_threshold``.

Usage: python tools/bench_cc.py [--sizes 250000,1000000,2000000,4000000]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_edges(
    spark: SparkSession, n_edges: int, chain_len: int = 64, clique_size: int = 8
) -> tuple[DataFrame, int]:
    """~n_edges undirected pairs: half chain edges, half clique edges,
    generated distributed (spark.range — nothing on the driver). Returns
    (pairs, expected_component_count)."""
    chain_edges = n_edges // 2
    n_chains = max(1, chain_edges // (chain_len - 1))
    clique_edges_per = clique_size * (clique_size - 1) // 2
    n_cliques = max(1, (n_edges - n_chains * (chain_len - 1)) // clique_edges_per)

    ch = (
        spark.range(n_chains * chain_len)
        .where((F.col("id") % chain_len) != chain_len - 1)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    base = n_chains * chain_len
    idx = F.sequence(F.lit(0), F.lit(clique_size - 1))
    cl = (
        spark.range(n_cliques)
        .select((F.lit(base) + F.col("id") * clique_size).alias("b"))
        .select("b", F.explode(idx).alias("i"))
        .select("b", "i", F.explode(idx).alias("j"))
        .where(F.col("i") < F.col("j"))
        .select(
            (F.col("b") + F.col("i")).alias("doc_a"),
            (F.col("b") + F.col("j")).alias("doc_b"),
        )
    )
    return ch.unionByName(cl), n_chains + n_cliques


def run_tier(pairs: DataFrame, driver_threshold: int, expected_components: int) -> float:
    from crawl4ai_llm_spark.operators.dedup import connected_components

    # (re-)materialize the edge cache OUTSIDE the timed window: the driver
    # tier unpersists the pairs cache on exit, and letting the next tier
    # pay edge regeneration inside its timing would bias the comparison
    pairs = pairs.cache()
    pairs.count()
    t0 = time.time()
    labels = connected_components(pairs, max_iters=30, driver_threshold=driver_threshold)
    n_comp = labels.select("cluster_id").distinct().count()
    dt = time.time() - t0
    assert n_comp == expected_components, (n_comp, expected_components)
    return dt


def _peak_rss_mb() -> int:
    """This (Python driver) process's lifetime peak RSS in MB — the side
    of the driver-memory wall the union-find tier actually occupies (the
    collected edge arrays and the numpy union-find live here; the JVM
    heap is bounded separately by spark.driver.memory)."""
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="250000,1000000,2000000,4000000")
    ap.add_argument("--chain-len", type=int, default=64)
    ap.add_argument("--tiers", default="dist,hybrid", help="--big mode tiers")
    ap.add_argument(
        "--big",
        action="store_true",
        help="VERDICT r06 #6: 16M/32M edges, distributed + hybrid tiers only "
        "(the pure driver tier would collect the full edge list — the exact "
        "wall the hybrid exists to avoid), with peak driver RSS per leg",
    )
    args = ap.parse_args()

    from crawl4ai_llm_spark.session import get_spark

    spark = get_spark(app_name="bench_cc")
    if args.big:
        print(f"# baseline peak driver RSS: {_peak_rss_mb()} MB")
        print(
            "| edges | components | distributed Pregel+doubling (s) | "
            "hybrid shrink→driver (s) | peak driver RSS after (MB) |"
        )
        print("|---|---|---|---|---|")
        tiers = args.tiers.split(",")
        for n in (int(s) for s in args.sizes.split(",")):
            pairs, want = synth_edges(spark, n, chain_len=args.chain_len)
            pairs = pairs.cache()
            n_actual = pairs.count()
            cells = {"dist": "-", "hybrid": "-", "rss": []}
            for tier in tiers:
                thr = 0 if tier == "dist" else 4_000_000
                t = run_tier(pairs, driver_threshold=thr, expected_components=want)
                cells[tier] = f"{t:.1f}"
                cells["rss"].append(f"{tier} {_peak_rss_mb()}")
            pairs.unpersist()
            print(
                f"| {n_actual:,} | {want:,} | {cells['dist']} | {cells['hybrid']} | "
                f"{', '.join(cells['rss'])} |",
                flush=True,
            )
        spark.stop()
        return
    print(
        "| edges | components | driver union-find (s) | "
        "distributed Pregel+doubling (s) | hybrid shrink→driver (s) |"
    )
    print("|---|---|---|---|---|")
    for n in (int(s) for s in args.sizes.split(",")):
        pairs, want = synth_edges(spark, n, chain_len=args.chain_len)
        pairs = pairs.cache()
        n_actual = pairs.count()
        t_driver = run_tier(pairs, driver_threshold=1 << 60, expected_components=want)
        t_dist = run_tier(pairs, driver_threshold=0, expected_components=want)
        # hybrid (the shipped default): distributed shrink rounds until the
        # CONDENSED graph fits 4M edges, then a driver union-find finish —
        # at sizes ≤ 4M raw edges this is the plain driver tier, so the
        # column is informative above it
        t_hybrid = run_tier(pairs, driver_threshold=4_000_000, expected_components=want)
        pairs.unpersist()
        print(
            f"| {n_actual:,} | {want:,} | {t_driver:.1f} | {t_dist:.1f} | {t_hybrid:.1f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
