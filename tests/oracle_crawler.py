"""Pure-Python reference crawl simulator — the ordering/seen-set oracle.

Implements the crawl semantics defined in SURVEY.md §8.1 from the
reference's own parameters (CrawlerConfig: delay/max_retries,
crawl4ai_llm/config.py:54-56) and its dedup-before-schedule behavior
(DuplicateProductError index check, json_storage.py:195-197), on the same
seeded web graph the Spark engine fetches (webgraph.py — shared code, so
divergence can only come from engine logic).

Semantics (normative for the parity tests, SURVEY.md §8.2):
  - wave budget per host: B = max(1, ⌊wave_seconds / crawl_delay(host)⌋)
  - per-host in-wave order: priority (depth asc, score desc, url_hash asc)
  - dedup on canonical URL at enqueue time; same-wave rediscoveries take
    the MIN depth
  - failures retried with attempt+1 while attempt+1 ≤ max_retries
  - robots deny/allow prefixes filter at enqueue (longest-match-wins,
    RFC 9309); robots crawl_delay overrides the default politeness delay

No Spark, no hashing trickery: murmur3 comes from the pure-Python port
(frontier/hashing.py) that is verified bit-identical to F.hash.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawl4ai_llm_spark.frontier import webgraph as wg
from crawl4ai_llm_spark.frontier.hashing import spark_hash_str
from crawl4ai_llm_spark.functions.urls import _canonicalize_one


def score_of(url_hash: int) -> float:
    return ((url_hash & 0x7FFFFFFF) % 1000) / 1000.0


def host_of(canon_url: str) -> str:
    return canon_url.split("//")[1].split("/")[0]


@dataclass
class OracleResult:
    seen: set[str] = field(default_factory=set)
    wave_of: dict[str, int] = field(default_factory=dict)  # first-schedule wave
    host_order: dict[tuple[str, int], list[str]] = field(default_factory=dict)
    spans: dict[str, list[dict]] = field(default_factory=dict)
    fetched: set[str] = field(default_factory=set)
    fetch_wave_of: dict[str, int] = field(default_factory=dict)  # wave of the OK fetch
    dead: set[str] = field(default_factory=set)
    n_waves: int = 0


def simulate(
    spec: wg.GraphSpec,
    seeds: list[str],
    delay: float = 1.0,
    wave_seconds: float = 8.0,
    max_retries: int = 3,
    max_depth: int = 5,
    max_waves: int = 1000,
) -> OracleResult:
    rules = {r["host"]: r for r in wg.robots_rules(spec)}

    def allowed(u: str) -> bool:
        return wg.robots_allows(rules, u)

    def budget(host: str) -> int:
        d = rules.get(host, {}).get("crawl_delay") or delay
        return max(1, int(wave_seconds // d))

    res = OracleResult()
    # pending: url -> (depth, attempt)
    pending: dict[str, tuple[int, int]] = {}
    for s in seeds:
        u = _canonicalize_one(s)
        if u and allowed(u) and u not in res.seen:
            res.seen.add(u)
            pending[u] = (0, 0)

    wave = 0
    while pending and wave < max_waves:
        wave += 1
        by_host: dict[str, list[str]] = {}
        for u in pending:
            by_host.setdefault(host_of(u), []).append(u)
        scheduled: list[str] = []
        for host, urls in by_host.items():
            urls.sort(key=lambda u: (pending[u][0], -score_of(spark_hash_str(u)), spark_hash_str(u)))
            take = urls[: budget(host)]
            res.host_order[(host, wave)] = list(take)
            scheduled.extend(take)

        discovered: dict[str, int] = {}
        for u in scheduled:
            depth, attempt = pending.pop(u)
            res.wave_of.setdefault(u, wave)
            if wg.fetch_ok(spec, u, attempt):
                res.fetched.add(u)
                res.fetch_wave_of[u] = wave
                res.spans[u] = wg.page_spans(spec, u)
                if depth + 1 <= max_depth:
                    for raw in wg.out_links(spec, u):
                        c = _canonicalize_one(raw)
                        if c and allowed(c) and c not in res.seen:
                            d = discovered.get(c)
                            discovered[c] = depth + 1 if d is None else min(d, depth + 1)
            else:
                if attempt + 1 <= max_retries:
                    pending[u] = (depth, attempt + 1)
                else:
                    res.dead.add(u)
        for c, d in discovered.items():
            res.seen.add(c)
            pending[c] = (d, 0)
    res.n_waves = wave
    return res
