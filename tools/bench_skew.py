"""Hot-host skew evidence: salted two-phase top-B vs a naive per-host window.

Builds a skewed frontier (one host holds ~45% of all URLs — the politeness
scheduler's worst case: AQE's skew-join splitting cannot help a WINDOW,
because rank() needs the whole partition together). Times:

  naive    row_number over (host)            — the hot host is ONE task
  salted   rank within (host, salt) ≤ B, then rank the ≤ salts·B
           survivors per host (exact by pigeonhole, engine.py)

The budget is a PER-HOST COLUMN (robots crawl_delay ⇒ different budgets
per host), exactly like the engine — which means Spark's WindowGroupLimit
rank-pushdown (constant limits only) cannot rescue the naive plan, and the
hot host's full row set must be sorted in a single task.

Asserts both select the same rows, then appends the timings to BENCH.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_ROWS = 40_000_000
HOT_FRACTION = 0.45
N_HOSTS = 200
BUDGET = 200
N_SALTS = 16


def build_frontier(spark):
    hot = int(N_ROWS * HOT_FRACTION)
    df = spark.range(N_ROWS).select(
        F.when(F.col("id") < hot, F.lit("hot.example"))
        .otherwise(F.concat(F.lit("host"), (F.pmod(F.col("id"), N_HOSTS)).cast("string")))
        .alias("host"),
        F.pmod(F.col("id") * 2654435761, F.lit(2**31)).alias("url_hash"),
        (F.pmod(F.col("id") * 48271, F.lit(1000)) / 1000.0).alias("score"),
        (F.pmod(F.col("id"), F.lit(5))).cast("int").alias("depth"),
    ).withColumn(
        # per-host budget column (the engine's robots crawl_delay shape) —
        # non-constant, so WindowGroupLimit cannot push it into the sort
        "budget",
        F.when(F.length("host") % 2 == 0, F.lit(BUDGET)).otherwise(F.lit(BUDGET // 2)),
    )
    return df.repartition(32).cache()


def main() -> None:
    from crawl4ai_llm_spark.session import get_spark

    spark = get_spark(app_name="skew_bench")
    fr = build_frontier(spark)
    fr.count()
    pri = [F.col("depth").asc(), F.col("score").desc(), F.col("url_hash").asc()]

    def naive():
        w = Window.partitionBy("host").orderBy(*pri)
        return fr.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= F.col("budget"))

    def salted():
        salt = F.pmod(F.col("url_hash"), F.lit(N_SALTS))
        w1 = Window.partitionBy("host", salt).orderBy(*pri)
        pruned = fr.withColumn("r1", F.row_number().over(w1)).where(
            F.col("r1") <= F.col("budget")
        )
        w2 = Window.partitionBy("host").orderBy(*pri)
        return (
            pruned.withColumn("rn", F.row_number().over(w2))
            .where(F.col("rn") <= F.col("budget"))
            .drop("r1")
        )

    # correctness: identical selections
    a = {tuple(r) for r in naive().select("host", "url_hash").collect()}
    b = {tuple(r) for r in salted().select("host", "url_hash").collect()}
    assert a == b, f"salted selection diverged: {len(a)} vs {len(b)}"
    print(f"selections identical: {len(a)} rows")

    times = {}
    for name, fn in (("naive", naive), ("salted", salted)):
        best = min(_time(fn) for _ in range(3))
        times[name] = best
        print(f"{name}: {best:.2f}s")

    speedup = times["naive"] / times["salted"]
    section = f"""
## Hot-host skew evidence (tools/bench_skew.py)

Per-host top-{BUDGET} politeness drain over a {N_ROWS:,}-row frontier where
one host holds {int(HOT_FRACTION*100)}% of all rows (window skew — AQE cannot split a
window partition). Identical output rows verified.

| strategy | wall time |
|---|---|
| naive per-host window (hot host = one task) | {times['naive']:.2f} s |
| salted two-phase exact top-B (engine.py)    | {times['salted']:.2f} s |

**{speedup:.1f}× faster under skew, exact same selection.**
"""
    with open("/root/repo/BENCH.md", "a") as f:
        f.write(section)
    print(f"speedup {speedup:.2f}x — appended to BENCH.md")
    spark.stop()


def _time(fn) -> float:
    t0 = time.time()
    fn().count()
    return time.time() - t0


if __name__ == "__main__":
    main()
