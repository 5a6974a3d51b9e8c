"""Murmur3 x86-32 in pure Python — bit-identical to Spark's ``F.hash``.

Spark hashes UTF-8 bytes with Murmur3_x86_32, seed 42 (the engine's URL
hash, SURVEY.md §8.3 ruling). The pure-Python port here is what lets the
oracle crawl simulator agree with the Spark engine on every ``url_hash``
without a JVM. Public algorithm (Austin Appleby, public domain).
"""

from __future__ import annotations

SPARK_SEED = 42
_MASK32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h


def murmur3_32(data: bytes, seed: int = SPARK_SEED) -> int:
    """Murmur3 x86-32 over bytes; returns SIGNED 32-bit int like Spark.

    Note: Spark processes the 4-byte tail blocks the same as full blocks?
    No — Spark's Murmur3_x86_32.hashUnsafeBytes processes tail bytes
    ONE AT A TIME (each as a signed byte "half block"), which differs from
    the canonical C++ tail handling. This port follows Spark.
    """
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & _MASK32
    n = len(data)
    n_blocks = n // 4
    for i in range(n_blocks):
        k1 = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k1 = (k1 * c1) & _MASK32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * c2) & _MASK32
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _MASK32
    # Spark tail: each remaining byte hashed as its own int "block"
    # (sign-extended), mixing like a full block — see
    # Murmur3_x86_32.hashUnsafeBytes in Spark (public source).
    for i in range(n_blocks * 4, n):
        b = data[i]
        if b >= 128:
            b -= 256  # signed byte, as the JVM reads it
        k1 = (b * c1) & _MASK32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * c2) & _MASK32
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & _MASK32
    h1 ^= n
    h1 = _fmix32(h1)
    if h1 >= 1 << 31:
        h1 -= 1 << 32
    return h1


def spark_hash_str(s: str) -> int:
    """Equivalent of Spark ``F.hash(string_col)`` for one Python string."""
    return murmur3_32(s.encode("utf-8"))
