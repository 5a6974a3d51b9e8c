"""ANN recall sweep (BENCH.md): recall@3 and candidate fraction for each
sign-LSH tier on the synthetic corpus — single-bucket (8-bit), multiband
(8x8), multiprobe (8x8 + ANN_PROBE_FLIPS lowest-margin 1-bit flips —
the constant is imported from operators.similarity so this sweep can
never disagree with the shipped engine; VERDICT r04 #5 / r05 #5).

Pure numpy (no Spark): the band/probe rules here replicate the executed
semantics exactly (sign bit = v > 0 or NaN; flips at globally smallest
|v[dim]|, ties to lower dim), and the gate separately proves the Spark
plan equals the same rule via the DuckDB oracle — so this sweep measures
the RULES' recall, on the full corpus, in seconds. The synthetic corpus
is near-uniform on the sphere: the worst case for sign LSH (real
embedding corpora cluster and do far better at the same candidate cost).

Usage: python tools/bench_ann_recall.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from crawl4ai_llm_spark.operators.similarity import (  # noqa: E402
    ANN_BAND_BITS as BAND_BITS,
    ANN_BANDS as N_BANDS,
    ANN_PROBE_FLIPS as N_FLIPS,
)

TOP_K = 3


def band_keys(V: np.ndarray) -> np.ndarray:
    """(n, N_BANDS) uint64 sign-band keys; NaN sets the bit (engine rule)."""
    bits = ((V > 0) | np.isnan(V)).astype(np.uint64)
    W = np.uint64(1) << np.arange(BAND_BITS, dtype=np.uint64)
    return (bits.reshape(len(V), N_BANDS, BAND_BITS) * W).sum(axis=2)


def recall_and_cands(cand_lists, exact3, n_corpus) -> tuple[float, float]:
    hits = total = 0
    n_cand = 0
    for qi, cands in enumerate(cand_lists):
        n_cand += len(cands)
        hits += len(set(exact3[qi]) & cands)
        total += len(exact3[qi])
    return hits / total, n_cand / (len(cand_lists) * n_corpus)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    n = len(V)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    q_idx = np.where(ids < n_queries)[0]

    # exact top-3 (excluding self)
    S = Vn[q_idx] @ Vn.T
    exact3 = []
    for r, qi in enumerate(q_idx):
        s = S[r].copy()
        s[qi] = -np.inf
        top = np.argsort(-s, kind="stable")[:TOP_K]
        exact3.append([int(ids[i]) for i in top])

    K = band_keys(V)  # (n, 8)

    rows = []

    # single bucket: band 0 key equality (the 8-bit LSH tier)
    cands = [
        {int(ids[j]) for j in np.where(K[:, 0] == K[qi, 0])[0] if j != qi}
        for qi in q_idx
    ]
    r, c = recall_and_cands(cands, exact3, n)
    rows.append(("single-bucket 8-bit", r, c))

    # multiband 8x8: any band key equality
    cands = [
        {int(ids[j]) for j in np.where((K == K[qi]).any(axis=1))[0] if j != qi}
        for qi in q_idx
    ]
    r, c = recall_and_cands(cands, exact3, n)
    rows.append(("multiband 8x8", r, c))

    # multiprobe: exact keys + N_FLIPS lowest-margin 1-bit flips per query
    cands = []
    for qi in q_idx:
        margins = np.abs(V[qi])
        flip_dims = np.argsort(margins, kind="stable")[:N_FLIPS]
        probe = {(b, int(K[qi, b])) for b in range(N_BANDS)}
        for d in flip_dims:
            b, j = int(d) // BAND_BITS, int(d) % BAND_BITS
            probe.add((b, int(K[qi, b] ^ np.uint64(1 << j))))
        mask = np.zeros(n, dtype=bool)
        for b, key in probe:
            mask |= K[:, b] == key
        mask[qi] = False
        cands.append({int(ids[j]) for j in np.where(mask)[0]})
    r, c = recall_and_cands(cands, exact3, n)
    rows.append((f"multiprobe 8x8 +{N_FLIPS} flips", r, c))

    print(f"\ncorpus n={n}, {len(q_idx)} queries, recall@{TOP_K} vs exact\n")
    print("| tier | recall@3 | candidates (frac of corpus) |")
    print("|---|---|---|")
    for name, r, c in rows:
        print(f"| {name} | {r:.3f} | {c:.3f} |")
    print(json.dumps({"n": n, "n_flips": N_FLIPS, "rows": [
        {"tier": name, "recall": round(r, 4), "cand_frac": round(c, 4)}
        for name, r, c in rows
    ]}))


if __name__ == "__main__":
    main()
