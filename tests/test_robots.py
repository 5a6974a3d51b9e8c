from __future__ import annotations

from crawl4ai_llm_spark.frontier.robots import parse_robots_txt, rules_table

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
