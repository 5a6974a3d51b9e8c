from __future__ import annotations

from crawl4ai_llm_spark.frontier.robots import parse_robots_txt, rules_table
from crawl4ai_llm_spark.frontier.webgraph import robots_allows

SAMPLE = """
# robots for example.com
User-agent: *
Disallow: /private/
Crawl-delay: 2

User-agent: crawl4ai
Disallow: /internal/
Allow: /internal/public/
Crawl-delay: 0.5

User-agent: other-bot
Disallow: /
"""


def test_specific_agent_group_wins():
    r = parse_robots_txt(SAMPLE, "crawl4ai/1.0")
    assert r["deny_prefixes"] == ["/internal/"]
    assert r["allow_prefixes"] == ["/internal/public/"]
    assert r["crawl_delay"] == 0.5


def test_wildcard_fallback():
    r = parse_robots_txt(SAMPLE, "someone-else")
    assert r["deny_prefixes"] == ["/private/"]
    assert r["crawl_delay"] == 2.0


def test_empty_and_missing():
    assert parse_robots_txt("")["deny_prefixes"] == []
    assert parse_robots_txt("User-agent: *\nDisallow:")["deny_prefixes"] == []  # allow-all
    assert parse_robots_txt(None)["crawl_delay"] is None


def test_longest_match_wins():
    """RFC 9309 §2.2.2: longest matching prefix decides; tie → Allow."""
    rules = {
        "h.example": {
            "deny_prefixes": ["/internal/"],
            "allow_prefixes": ["/internal/public/"],
        }
    }
    assert not robots_allows(rules, "https://h.example/internal/secret")
    # Allow carve-out inside the broader Disallow is honored
    assert robots_allows(rules, "https://h.example/internal/public/page")
    assert robots_allows(rules, "https://h.example/open")
    # exact tie goes to Allow (least restrictive)
    tie = {"h.example": {"deny_prefixes": ["/a/"], "allow_prefixes": ["/a/"]}}
    assert robots_allows(tie, "https://h.example/a/x")
    # unknown host / empty rules ⇒ allowed
    assert robots_allows({}, "https://other.example/x")


def test_engine_allow_carveout_matches_oracle(spark):
    """The engine's column-expression filter and the pure-Python oracle
    agree on every (deny, allow, path) case from the synthetic graph's
    rule shapes."""
    from pyspark.sql import functions as F

    from crawl4ai_llm_spark.frontier import webgraph as wg
    from crawl4ai_llm_spark.frontier.engine import CrawlConfig, FrontierEngine

    import tempfile

    spec = wg.GraphSpec(n_hosts=20)
    with tempfile.TemporaryDirectory() as tmp:
        eng = FrontierEngine(spark, tmp, CrawlConfig(graph=spec))
        urls = [
            # host0: deny /p/1, allow /p/10 → /p/10* allowed, other /p/1* denied
            ("https://host0.example/p/10", True),
            ("https://host0.example/p/105", True),
            ("https://host0.example/p/12", False),
            ("https://host0.example/p/2", True),
            # host5: deny /p/1, no allow
            ("https://host5.example/p/10", False),
            ("https://host5.example/p/2", True),
            # host1: no rules
            ("https://host1.example/p/1", True),
        ]
        df = spark.createDataFrame(
            [(u,) for u, _ in urls], "url string"
        ).select(
            "url",
            F.regexp_extract("url", r"//([^/]+)", 1).alias("host"),
        )
        kept = {r["url"] for r in eng._robots_allowed(df).collect()}
        rules = {r["host"]: r for r in wg.robots_rules(spec)}
        for u, expect in urls:
            assert (u in kept) == expect, u
            assert robots_allows(rules, u) == expect, u


def test_rules_table_spark(spark):
    bodies = spark.createDataFrame(
        [("a.com", SAMPLE), ("b.com", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string",
    )
    rows = {r["host"]: r for r in rules_table(bodies, "crawl4ai").collect()}
    assert rows["a.com"]["deny_prefixes"] == ["/internal/"]
    assert rows["a.com"]["crawl_delay"] == 0.5
    assert rows["b.com"]["deny_prefixes"] == ["/x"]
    assert rows["b.com"]["crawl_delay"] is None
