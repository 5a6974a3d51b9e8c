"""Scaling-efficiency evidence for the DEDUP side of the engine (the
crawl side's twin: tools/bench_scaling.py).

Same MinHash-LSH dedup job (shingle → signature Arrow pass → band
equi-join → exact verify) at two parallelism levels — local[4] (N) and
local[16] (4N) — in fresh JVMs, per the round brief's two-cluster-size
criterion. The corpus is a deterministic K× scale-up of the sf0.1
documents table with PAIR structure: replicas come in groups of two
(2k, 2k+1) that near-duplicate each other, while every 3rd token carries
a group suffix so DIFFERENT groups share almost no 3-grams — duplicate
pairs grow ∝ corpus (realistic density), never as replica cliques (the
first draft made all K replicas mutual dups: K²/2 pairs per base doc and
a bucket-occupancy blowup no real corpus has). The input is built ONCE
on disk and both levels read the same parquet.

Writes/updates BENCH.md ("## Scaling evidence — dedup" section):
  eff = (docs_per_sec@4N) / (4 × docs_per_sec@N).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILD = r"""
import sys
sys.path.insert(0, {repo!r})
from crawl4ai_llm_spark.session import get_spark
from pyspark.sql import functions as F

out, k = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name="dedup-scale-build", master="local[16]",
                  shuffle_partitions=16)
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
reps = []
for r in range(k):
    # group g = r // 2: every 3rd token carries the group suffix, so docs
    # from DIFFERENT groups share almost no 3-gram (every gram spans an
    # edited token) while the two replicas of one group differ by a single
    # extra edit (token 1, odd replica) — near-duplicate PAIRS, J ~ 0.8
    g = "_g" + str(r // 2)
    toks = F.split(F.col("text"), " ")
    edited = F.concat_ws(" ", F.transform(
        toks,
        lambda t, i: F.when(i % 3 == 0, F.concat(t, F.lit(g)))
        .when((i == 1) & F.lit(r % 2 == 1), F.concat(t, F.lit("_x")))
        .otherwise(t)))
    reps.append(docs.select(
        (F.col("doc_id") + (r << 40)).alias("doc_id"), edited.alias("text")))
corpus = reps[0]
for rep in reps[1:]:
    corpus = corpus.unionByName(rep)
corpus.repartition(64).write.mode("overwrite").parquet(out)
print("built", spark.read.parquet(out).count())
spark.stop()
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from crawl4ai_llm_spark.session import get_spark
from crawl4ai_llm_spark.operators import dedup
from pyspark.sql import functions as F

cpus, corpus = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name=f"dedup-scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8))
docs = spark.read.parquet(corpus)
n_docs = docs.count()
t0 = time.time()
sh = docs.select("doc_id", dedup.word_ngrams_fast(F.col("text")).alias("grams"))
fused = dedup.with_minhash_sig(sh).cache()
cand = dedup.lsh_candidates(fused.select("doc_id", "sig"))
pairs = dedup._jaccard_pairs(fused.select("doc_id", "grams"), dedup.JACCARD_TAU,
                             candidates=cand)
n_pairs = pairs.count()
dt = time.time() - t0
print(json.dumps({{"cpus": cpus, "docs": n_docs, "pairs": n_pairs,
                   "seconds": round(dt, 2),
                   "docs_per_sec": round(n_docs / dt, 1)}}))
spark.stop()
"""


def run(script: str, *args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", script.format(repo=REPO), *args],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ},
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result: {out.stderr[-2000:]}")


def main() -> None:
    k = int(sys.argv[sys.argv.index("--k") + 1]) if "--k" in sys.argv else 8
    corpus = f"/tmp/dedup_scale_corpus_k{k}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        subprocess.run(
            [sys.executable, "-c", BUILD.format(repo=REPO), corpus, str(k)],
            check=True, timeout=1800,
        )
    r4 = run(CHILD, "4", corpus)
    print("local[4]: ", r4, flush=True)
    import time

    time.sleep(60)  # clocks settle
    r16 = run(CHILD, "16", corpus)
    print("local[16]:", r16)
    eff = r16["docs_per_sec"] / (4 * r4["docs_per_sec"])
    print(f"dedup scaling efficiency N→4N: {eff:.3f}")
    assert r4["pairs"] == r16["pairs"], "both levels must find identical pairs"

    section = f"""
## Scaling evidence — dedup (MinHash-LSH end-to-end, tools/bench_dedup_scaling.py)

The two-cluster-size criterion applied to the flagship ANALYTICS operator
(the crawl twin is above): the full shingle → Arrow signature pass → band
equi-join → exact-verify pipeline over a deterministic {k}× near-duplicate
scale-up of the sf0.1 documents table ({r4["docs"]:,} docs, {r4["pairs"]:,}
verified duplicate pairs — identical at both levels), fresh JVM per level,
same on-disk parquet input.

| level | docs | wall | throughput |
|---|---|---|---|
| local[4]  (N)  | {r4["docs"]:,} | {r4["seconds"]:.1f} s | {r4["docs_per_sec"]:,.0f} docs/s |
| local[16] (4N) | {r16["docs"]:,} | {r16["seconds"]:.1f} s | {r16["docs_per_sec"]:,.0f} docs/s |

**Dedup scaling efficiency N→4N = {r16["docs_per_sec"]:,.0f} / (4 × {r4["docs_per_sec"]:,.0f}) = {eff:.2f}**
"""
    import re

    path = os.path.join(REPO, "BENCH.md")
    with open(path) as f:
        content = f.read()
    content = re.sub(
        r"\n## Scaling evidence — dedup[^\n]*\n(?:(?!\n## ).)*",
        "\n", content, flags=re.DOTALL,
    )
    with open(path, "w") as f:
        f.write(content.rstrip() + "\n" + section)
    print("dedup scaling section written to BENCH.md")


if __name__ == "__main__":
    main()
