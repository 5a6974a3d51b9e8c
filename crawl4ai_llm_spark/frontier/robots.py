"""robots.txt parsing → the host-rules dimension table (C7).

The reference carries robots-relevant knobs (user_agent, headers —
CrawlerConfig, crawl4ai_llm/config.py:49-59) but no parser; the engine
completes the path: raw robots.txt bodies (fetched like any URL) parse
into ``(host, deny_prefixes, crawl_delay)`` rows — the tiny dimension the
scheduler broadcast-joins every wave.

Parsing follows the de-facto standard (user-agent groups, most-specific
agent match, Disallow/Allow prefixes, Crawl-delay): pure function + a
mapInPandas wrapper, so it tests without Spark and scales with it.

Rule application (engine._robots_allowed and webgraph.robots_allows)
follows the de-facto longest-match-wins semantics (RFC 9309 §2.2.2): the
longest matching prefix among Allow+Disallow decides; an exact-length tie
goes to Allow (least restrictive). A URL matching both `Allow: /pub/ok`
and the broader `Disallow: /pub` is therefore crawled.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def parse_robots_txt(text: str, user_agent: str = "crawl4ai") -> dict:
    """→ {deny_prefixes: [...], allow_prefixes: [...], crawl_delay: float|None}

    Groups are selected by longest user-agent token match; ``*`` is the
    fallback. Empty Disallow means allow-all (per the original spec).
    """
    ua = user_agent.lower()
    groups: list[tuple[list[str], dict]] = []
    agents: list[str] = []
    rules: dict = {"deny": [], "allow": [], "delay": None}
    saw_rule = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if saw_rule:  # new group starts
                groups.append((agents, rules))
                agents, rules, saw_rule = [], {"deny": [], "allow": [], "delay": None}, False
            agents.append(val.lower())
        elif key == "disallow":
            saw_rule = True
            if val:
                rules["deny"].append(val)
        elif key == "allow":
            saw_rule = True
            if val:
                rules["allow"].append(val)
        elif key == "crawl-delay":
            saw_rule = True
            try:
                rules["delay"] = float(val)
            except ValueError:
                pass
    if agents:
        groups.append((agents, rules))

    best: dict | None = None
    best_len = -1
    for agent_list, r in groups:
        for a in agent_list:
            if a == "*" and best_len < 0:
                best = r
                best_len = 0
            elif a != "*" and a in ua and len(a) > best_len:
                best = r
                best_len = len(a)
    if best is None:
        return {"deny_prefixes": [], "allow_prefixes": [], "crawl_delay": None}
    return {
        "deny_prefixes": best["deny"],
        "allow_prefixes": best["allow"],
        "crawl_delay": best["delay"],
    }


def rules_table(robots_bodies: DataFrame, user_agent: str = "crawl4ai") -> DataFrame:
    """(host, robots_txt) → (host, deny_prefixes, allow_prefixes,
    crawl_delay) via one Arrow-batched pass — the broadcast side of the
    politeness join."""

    def parse(batches):
        for pdf in batches:
            parsed = [parse_robots_txt(t, user_agent) for t in pdf["robots_txt"]]
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "deny_prefixes": [p["deny_prefixes"] for p in parsed],
                    "allow_prefixes": [p["allow_prefixes"] for p in parsed],
                    "crawl_delay": [p["crawl_delay"] for p in parsed],
                }
            )

    return robots_bodies.mapInPandas(
        parse,
        "host string, deny_prefixes array<string>, allow_prefixes array<string>, crawl_delay double",
    )
