"""Partitioned cuckoo filters — the deletable URL-seen tier (C4).

Complements the Bloom tier (bloom.py): a cuckoo filter stores 16-bit
fingerprints in 4-slot buckets with two candidate buckets per key
(partial-cuckoo hashing, Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014 — public algorithm), so it supports DELETION —
needed when a URL is evicted from the seen set for recrawl, which a Bloom
filter cannot express.

Same deployment shape as bloom.py: one filter per ``pmod(url_hash, n)``
partition of the seen table, built where the data lives via
``applyInPandas``, probed via a broadcast of the (small) packed tables.
Like the Bloom tier it has NO false negatives (an inserted key always
probes positive until deleted), so the exact anti-join verification tier
stays sound. The one way a cuckoo filter can break that promise is
SATURATION (MAX_KICKS exhausted on insert at ~>95% load): a saturated
bucket is marked with a sentinel byte and from then on probes
maybe_seen=True for every key — the invariant degrades to "no false
negatives OR always-positive", never to a silent false negative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1 << 14  # buckets per partition filter
SLOTS = 4
MAX_KICKS = 500
FP_BITS = 16
_MIX = 0x9E3779B1

# Packed size of one filter table. A packed blob LONGER than this carries a
# trailing saturation sentinel: at least one insert into the bucket failed
# (MAX_KICKS exhausted, ~>95% load), so the filter can no longer promise
# "no false negatives". Saturated buckets degrade to maybe_seen=True for
# every key (probe_expr), which routes all their URLs through the exact
# anti-join verification tier — correctness is preserved, only the
# filter's pruning benefit is lost for that bucket.
_TABLE_BYTES = N_BUCKETS * SLOTS * 2
_SATURATED = b"\x01"


def is_saturated(data: bytes) -> bool:
    return len(data) > _TABLE_BYTES


def saturated_buckets(filters: dict[int, bytes]) -> list[int]:
    """Observability: which bucket filters have degraded to always-maybe."""
    return sorted(b for b, d in filters.items() if is_saturated(d))


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the 64-bit key."""
    fp = ((h >> np.uint64(32)) ^ h).astype(np.uint64) & np.uint64(0xFFFF)
    return np.where(fp == 0, np.uint64(1), fp).astype(np.uint16)


def _bucket1(h: np.ndarray) -> np.ndarray:
    return (h.astype(np.uint64) % np.uint64(N_BUCKETS)).astype(np.int64)


def _alt_bucket(b: np.ndarray, fp: np.ndarray) -> np.ndarray:
    # b ^ hash(fp): the partial-key cuckoo property — computable from the
    # stored fingerprint alone, which is what makes kicks (and deletes) work.
    # uint64 arithmetic: signed-int64 multiply is pathologically slow on
    # this platform's numpy, and this runs per probe batch.
    # both operands are < N_BUCKETS (a power of two), so XOR stays in range
    mix = (fp.astype(np.uint64) * np.uint64(_MIX)) % np.uint64(N_BUCKETS)
    return (b.astype(np.uint64) ^ mix).astype(np.int64)


class CuckooFilter:
    """Single-partition cuckoo filter over int64 keys."""

    def __init__(self, table: np.ndarray | None = None):
        self.table = table if table is not None else np.zeros((N_BUCKETS, SLOTS), dtype=np.uint16)

    # -- scalar core (python loop — used in partition build, numpy probe) --

    def _insert_one(self, b: int, fp: int) -> bool:
        for cand in (b, int(_alt_bucket(np.array([b]), np.array([fp], dtype=np.uint16))[0])):
            row = self.table[cand]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # kick loop
        cur_b, cur_fp = b, fp
        rng = np.random.default_rng(fp * 2654435761 % (2**32))  # deterministic kicks
        for _ in range(MAX_KICKS):
            slot = int(rng.integers(SLOTS))
            cur_fp, self.table[cur_b, slot] = int(self.table[cur_b, slot]), cur_fp
            cur_b = int(_alt_bucket(np.array([cur_b]), np.array([cur_fp], dtype=np.uint16))[0])
            row = self.table[cur_b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur_fp
                return True
        return False  # table overfull — caller should grow/repartition

    def insert(self, keys: np.ndarray) -> int:
        h = keys.astype(np.int64).view(np.uint64)
        fps = _fingerprint(h)
        bs = _bucket1(h)
        failed = 0
        for b, fp in zip(bs, fps):
            if not self._insert_one(int(b), int(fp)):
                failed += 1
        return failed

    def delete(self, keys: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns #removed."""
        h = keys.astype(np.int64).view(np.uint64)
        fps = _fingerprint(h)
        bs = _bucket1(h)
        removed = 0
        for b, fp in zip(bs.tolist(), fps.tolist()):
            for cand in (b, int(_alt_bucket(np.array([b]), np.array([fp], dtype=np.uint16))[0])):
                row = self.table[cand]
                hit = np.where(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    removed += 1
                    break
        return removed

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe."""
        h = keys.astype(np.int64).view(np.uint64)
        fps = _fingerprint(h)
        b1 = _bucket1(h)
        b2 = _alt_bucket(b1, fps)
        in1 = (self.table[b1] == fps[:, None]).any(axis=1)
        in2 = (self.table[b2] == fps[:, None]).any(axis=1)
        return in1 | in2

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        # tolerate (and strip) the saturation sentinel byte
        return cls(
            np.frombuffer(data[:_TABLE_BYTES], dtype=np.uint16)
            .reshape(N_BUCKETS, SLOTS)
            .copy()
        )


# -- partitioned build / probe (same shape as bloom.py) -----------------------


def update_filters(
    delta: DataFrame,
    old: dict[int, bytes] | None,
    n_partitions: int = 64,
    delete: bool = False,
) -> dict[int, bytes]:
    """Incrementally insert (or delete) a hash delta into the partitioned
    filters — DISTRIBUTED: each bucket's update runs where its delta rows
    land; only the packed tables (128 KiB each) move. Returns the updated
    bucket→filter map (buckets without delta rows keep their old filter)."""
    spark = delta.sparkSession
    bc = spark.sparkContext.broadcast(old or {})

    def upd(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        prior = bc.value.get(b)
        if prior is not None and is_saturated(prior):
            # once saturated the bucket is permanently degraded (always
            # maybe_seen) until a full rebuild — skip the insert to avoid
            # growing a table that can no longer be trusted for negatives
            return pd.DataFrame({"bucket": [b], "filter": [prior]})
        cf = CuckooFilter.from_bytes(prior) if prior else CuckooFilter()
        keys = pdf["url_hash"].to_numpy()
        failed = 0
        if delete:
            cf.delete(keys)
        else:
            failed = cf.insert(keys)
        packed = cf.to_bytes() + (_SATURATED if failed else b"")
        return pd.DataFrame({"bucket": [b], "filter": [packed]})

    with_bucket = delta.select(
        "url_hash", F.pmod(F.col("url_hash"), F.lit(n_partitions)).alias("bucket")
    )
    rows = (
        with_bucket.groupBy("bucket").applyInPandas(upd, "bucket int, filter binary").collect()
    )
    out = dict(old or {})
    out.update({r["bucket"]: bytes(r["filter"]) for r in rows})
    bc.destroy()
    return out


def build_filters(seen: DataFrame, n_partitions: int = 64) -> dict[int, bytes]:
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter()
        failed = cf.insert(pdf["url_hash"].to_numpy())
        packed = cf.to_bytes() + (_SATURATED if failed else b"")
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "filter": [packed]}
        )

    with_bucket = seen.select(
        "url_hash", F.pmod(F.col("url_hash"), F.lit(n_partitions)).alias("bucket")
    )
    rows = (
        with_bucket.groupBy("bucket").applyInPandas(build, "bucket int, filter binary").collect()
    )
    return {r["bucket"]: bytes(r["filter"]) for r in rows}


def probe_expr(df: DataFrame, filters: dict[int, bytes], n_partitions: int = 64):
    """Adds ``maybe_seen`` like bloom.probe_expr; returns (df, broadcast)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(filters)

    @F.pandas_udf("boolean")
    def might_contain(url_hash: pd.Series) -> pd.Series:
        h = url_hash.to_numpy()
        if n_partitions & (n_partitions - 1) == 0:
            # power-of-two fast path (signed-int64 modulo is ~100x slower
            # than unsigned ops on this platform's numpy)
            buckets = (h.view(np.uint64) & np.uint64(n_partitions - 1)).astype(np.int64)
        else:
            buckets = np.mod(h, n_partitions)
        out = np.zeros(len(h), dtype=bool)
        table = bc.value
        for b in np.unique(buckets):
            data = table.get(int(b))
            if data is None:
                continue
            m = buckets == b
            if is_saturated(data):
                # degraded bucket: no false-negative guarantee — force every
                # key through the exact anti-join verification tier
                out[m] = True
            else:
                out[m] = CuckooFilter.from_bytes(data).contains(h[m])
        return pd.Series(out)

    return df.withColumn("maybe_seen", might_contain(F.col("url_hash"))), bc
