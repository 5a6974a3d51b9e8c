"""Partitioned Bloom filters for the URL-seen set (SURVEY.md §2.7 C3).

Spark's ``bloom_filter_agg`` is not registered as a SQL function in this
build, so the filter is built with numpy inside ``applyInPandas`` — one
Bloom per hash bucket of the seen table. Probing happens driver-broadcast:
the per-bucket bitmaps (n_buckets × m/8 bytes ≈ 1 MB at defaults) are
collected once per wave and probed by a vectorized pandas UDF.

Guarantee: NO false negatives — ``might_contain == False`` proves a URL is
new. Bloom-positive candidates still go through the exact anti-join, so the
final seen-set answer is always exact (the C4 verification tier).

At 10^10 URLs: n_buckets scales with the seen-table bucket count (the
blooms stay partition-local, built where the data lives — only the bitmaps
move), and the exact tier is an anti-join that touches only the
bloom-positive fraction (~p·new + true-dups) instead of every candidate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BITS = 1 << 17  # bits per bucket bloom (16 KiB)
K_HASHES = 5
MIX = 2_654_435_761


def _positions(hashes: np.ndarray) -> np.ndarray:
    """(n, K_HASHES) bit positions via double hashing of the 64-bit key."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(M_BITS)
    h2 = ((h * np.uint64(MIX)) % np.uint64(M_BITS)) | np.uint64(1)
    i = np.arange(K_HASHES, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(M_BITS)


def build_blooms(seen: DataFrame, n_buckets: int = 64) -> dict[int, bytes]:
    """One Bloom bitmap per ``pmod(url_hash, n_buckets)`` bucket, built
    partition-local via applyInPandas and collected (small: bitmaps only)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(M_BITS, dtype=bool)
        pos = _positions(pdf["url_hash"].to_numpy())
        bits[pos.ravel().astype(np.int64)] = True
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bloom": [np.packbits(bits).tobytes()]}
        )

    with_bucket = seen.select(
        F.col("url_hash"), F.pmod(F.col("url_hash"), F.lit(n_buckets)).alias("bucket")
    )
    rows = (
        with_bucket.groupBy("bucket")
        .applyInPandas(build, "bucket int, bloom binary")
        .collect()
    )
    return {r["bucket"]: bytes(r["bloom"]) for r in rows}


def probe_expr(df: DataFrame, blooms: dict[int, bytes], n_buckets: int = 64):
    """Adds ``maybe_seen``: False ⇒ provably new (skip the exact tier).

    Ships the PACKED bitmaps (m/8 bytes each) via broadcast — unpacking
    happens worker-side per batch, so per-task deserialization stays ~1 MB
    regardless of core count. Returns (df, broadcast) so the caller can
    destroy the broadcast once the wave is committed.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(blooms)

    @F.pandas_udf("boolean")
    def might_contain(url_hash: pd.Series) -> pd.Series:
        h = url_hash.to_numpy()
        if n_buckets & (n_buckets - 1) == 0:
            # power-of-two: two's-complement AND equals pmod AND avoids the
            # signed-int64 modulo, which is ~100x slower than unsigned ops
            # on this platform's numpy
            buckets = (h.view(np.uint64) & np.uint64(n_buckets - 1)).astype(np.int64)
        else:
            buckets = np.mod(h, n_buckets)  # matches F.pmod for the probe side
        out = np.zeros(len(h), dtype=bool)
        pos = _positions(h)
        table = bc.value
        for b in np.unique(buckets):
            bm = table.get(int(b))
            if bm is None:
                continue  # empty bucket: nothing seen there
            bits = np.unpackbits(np.frombuffer(bm, dtype=np.uint8))
            m = buckets == b
            out[m] = bits[pos[m].astype(np.int64)].all(axis=1)
        return pd.Series(out)

    return df.withColumn("maybe_seen", might_contain(F.col("url_hash"))), bc
