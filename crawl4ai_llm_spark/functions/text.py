"""Text-analysis column expressions for training-data pipelines.

All pure JVM-side built-ins (whole-stage codegen — no Python in the hot
path), and all arithmetic chosen to be bit-for-bit reproducible by the ANSI
SQL oracles: integer polynomial hashing with explicit modulus, sequential
left-fold aggregation, fixed-order floating-point formulas.

Operators provided (driver-graded pipeline ops):
  tokens / distinct tokens     tokenization
  char_fingerprint             rolling polynomial document hash
  token_hash32                 32-bit token hash (simhash input)
  quality_score                length/stopword/type-token-ratio scoring
  lang-id markers              n-gram-free marker-word language heuristic
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# polynomial-hash modulus + multiplier (Knuth), and a 32-bit mixer
# (Fibonacci hashing constant) — plain integer arithmetic that any SQL
# engine reproduces exactly.
HASH_P = 1_000_000_007
HASH_MULT = 131
MIX32 = 2_654_435_761
# second independent mixer (xxHash PRIME32_2 — public constant) for the
# upper half of 64-bit token fingerprints; products stay < 2^62 in BIGINT
MIX32B = 2_246_822_519
TWO32 = 4_294_967_296

# marker vocabularies for the language-ID heuristic — three synthetic
# "languages" over the corpus vocabulary (function words / query words /
# data words). Real deployment swaps these for per-language stopword sets;
# the operator shape (argmax of distinct-marker overlap) is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "func": ["the", "a", "fast", "slow", "big", "small"],
    "query": ["query", "join", "filter", "group", "sort", "agg", "scan", "merge"],
    "data": ["table", "row", "column", "key", "value", "data", "batch", "stream"],
}

STOPWORDS = ["the", "a"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(col, " "), lambda x: x != F.lit(""))


def char_fingerprint(col: Column) -> Column:
    """Rolling polynomial hash over the document's characters —
    the document-fingerprint operator. acc = (acc*131 + codepoint) mod P,
    left-to-right; reproducible in any engine with 64-bit integers."""
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * HASH_MULT + F.ascii(c)) % HASH_P,
    )


def token_hash32(col: Column) -> Column:
    """32-bit token hash: polynomial hash mixed by the Fibonacci constant.
    Products stay < 2^63 (P * MIX32 ≈ 2.7e18), so plain BIGINT arithmetic."""
    return (char_fingerprint(col) * F.lit(MIX32)) % F.lit(TWO32)


def token_hash32b(col: Column) -> Column:
    """Second independent 32-bit token hash (different mixer + offset) —
    the upper half of the engine's 64-bit SimHash fingerprint. Kept as two
    32-bit halves rather than one 64-bit value so every intermediate stays
    positive BIGINT in ANY engine (bit 63 would overflow signed arithmetic).
    A production deployment swaps both halves for xxhash64; this pair is the
    cross-engine-reproducible stand-in."""
    return (char_fingerprint(col) * F.lit(MIX32B) + F.lit(1)) % F.lit(TWO32)


def quality_components(text_col: Column, n_chars_col: Column) -> dict[str, Column]:
    """Quality-scoring components. Each is a single fixed-order float
    expression so the oracle reproduces it exactly."""
    toks = tokens(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    return {
        "n_tokens": n.cast("long"),
        "n_distinct": n_distinct.cast("long"),
        "stop_ratio": n_stop.cast("double") / n.cast("double"),
        "type_token_ratio": n_distinct.cast("double") / n.cast("double"),
        "length_score": F.least(n_chars_col.cast("double") / F.lit(500.0), F.lit(1.0)),
    }


def quality_score(text_col: Column, n_chars_col: Column) -> Column:
    """Composite quality score in [0,1]: favors low stopword density,
    lexical diversity, and adequate length."""
    c = quality_components(text_col, n_chars_col)
    return (
        F.lit(0.4) * (F.lit(1.0) - c["stop_ratio"])
        + F.lit(0.3) * c["type_token_ratio"]
        + F.lit(0.3) * c["length_score"]
    )


def lang_scores(text_col: Column) -> dict[str, Column]:
    """Distinct-marker overlap per candidate language."""
    distinct_toks = F.array_distinct(tokens(text_col))
    return {
        lang: F.size(F.array_intersect(distinct_toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text_col: Column) -> Column:
    """Argmax language with deterministic tiebreak (declaration order)."""
    scores = lang_scores(text_col)
    names = list(LANG_MARKERS)
    best = scores[names[0]]
    best_name = F.lit(names[0])
    for name in names[1:]:
        is_better = scores[name] > best
        best_name = F.when(is_better, F.lit(name)).otherwise(best_name)
        best = F.when(is_better, scores[name]).otherwise(best)
    return best_name
