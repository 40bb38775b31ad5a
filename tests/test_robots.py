"""robots.txt evaluation (`pipeline/robots.py`) — RFC 9309 semantics.

Goldens are hand-derived from the RFC's matching rules (longest match
wins, ties to Allow, '*'/'$' wildcards, most-specific user-agent group);
the DataFrame operator is then checked against the pure-python kernel
over a generated crawl."""

from __future__ import annotations

import pytest

from clucene_spark.pipeline.robots import (
    parse_robots,
    robots_decision,
    robots_filter,
    url_path,
)

ROBOTS = """
# example file
User-agent: GoodBot
Disallow: /private/
Allow: /private/ok

User-agent: *
Disallow: /tmp/
Disallow: /*.pdf$
Allow: /tmp/pub*
Disallow:
"""


def test_group_selection_most_specific():
    # GoodBot group governs agents containing 'goodbot'; others fall to *
    g = parse_robots(ROBOTS, "Mozilla/5.0 GoodBot/1.2")
    assert g == [(False, "/private/"), (True, "/private/ok")]
    star = parse_robots(ROBOTS, "SomeOtherBot")
    assert star == [(False, "/tmp/"), (False, "/*.pdf$"), (True, "/tmp/pub*")]


def test_longest_match_and_tie_to_allow():
    rules = [(False, "/a"), (True, "/a/b"), (False, "/a/b")]
    assert robots_decision(rules, "/a/x")[0] is False
    # /a/b matches both a Disallow and an Allow of equal length: Allow wins
    assert robots_decision(rules, "/a/b/c")[0] is True
    assert robots_decision(rules, "/zzz") == (True, "")


def test_wildcards_star_and_dollar():
    rules = parse_robots(ROBOTS, "x")
    dec = lambda p: robots_decision(rules, p)[0]  # noqa: E731
    assert dec("/tmp/secret") is False
    assert dec("/tmp/pub/file") is True          # longer Allow beats /tmp/
    assert dec("/docs/report.pdf") is False      # /*.pdf$ end anchor
    assert dec("/docs/report.pdf.html") is True  # $ must not match mid-path
    assert dec("/anything/else") is True


def test_rules_before_user_agent_ignored_and_empty_disallow():
    txt = "Disallow: /early\nUser-agent: *\nDisallow:\n"
    assert parse_robots(txt, "x") == []
    assert robots_decision([], "/early/thing") == (True, "")


def test_url_path():
    assert url_path("https://a.example/x/y?q=1") == "/x/y?q=1"
    assert url_path("http://a.example") == "/"
    assert url_path("a.example/p") == "/p"


@pytest.fixture()
def crawl(spark):
    rows = [
        (i, f"https://site{i % 3}.example/sec{i % 5}/page{i}")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


@pytest.fixture()
def robots_df(spark):
    # site0: blocks /sec0 except /sec0/page30; site1: blocks pages ending
    # in 0 via wildcard; site2 has no robots row (everything allowed)
    rows = [
        (
            "site0.example",
            "User-agent: *\nDisallow: /sec0\nAllow: /sec0/page30\n",
        ),
        ("site1.example", "User-agent: *\nDisallow: /*0$\n"),
    ]
    return spark.createDataFrame(rows, "domain string, robots_txt string")


def test_robots_filter_matches_kernel(spark, crawl, robots_df):
    got = robots_filter(
        crawl, robots_df, keep_denied=True
    ).orderBy("doc_id").collect()
    by_dom = {
        "site0.example": parse_robots(
            "User-agent: *\nDisallow: /sec0\nAllow: /sec0/page30\n", "x"
        ),
        "site1.example": parse_robots("User-agent: *\nDisallow: /*0$\n", "x"),
    }
    assert len(got) == 60
    for r in got:
        dom = r["url"].split("/")[2]
        rules = by_dom.get(dom, [])
        want_allow, want_rule = robots_decision(rules, url_path(r["url"]))
        assert r["robots_allowed"] == want_allow, r["url"]
        assert r["robots_rule"] == want_rule, r["url"]
    # spot-check the interesting rows
    rows = {r["doc_id"]: r for r in got}
    assert rows[30]["robots_allowed"] is True       # site0 Allow exception
    assert rows[0]["robots_allowed"] is False       # site0 /sec0/page0
    assert rows[10]["robots_allowed"] is False      # site1 page10 ends in 0
    assert rows[40]["robots_allowed"] is False      # site1 page40 ends in 0
    assert rows[25]["robots_allowed"] is True       # site1 page25
    assert rows[2]["robots_allowed"] is True        # site2 no robots


def test_robots_filter_drops_denied_by_default(spark, crawl, robots_df):
    kept = robots_filter(crawl, robots_df).collect()
    annotated = robots_filter(crawl, robots_df, keep_denied=True).collect()
    n_allowed = sum(1 for r in annotated if r["robots_allowed"])
    assert len(kept) == n_allowed < 60
    assert "robots_allowed" not in kept[0].asDict()


def test_crawl_delay_group_selection_and_parsing():
    from clucene_spark.pipeline.robots import crawl_delay

    txt = (
        "User-agent: other\nCrawl-delay: 99\n"
        "User-agent: GoodBot\nCrawl-delay: 2.5\nDisallow: /x\n"
        "User-agent: *\nCrawl-delay: 7\n"
    )
    assert crawl_delay(txt, "GoodBot/1.0") == 2.5
    assert crawl_delay(txt, "SomethingElse") == 7.0
    assert crawl_delay("User-agent: *\nDisallow: /a\n", "x") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: soon\n", "x") is None


def test_fetch_plan(spark):
    from clucene_spark.pipeline.robots import fetch_plan

    pages = spark.createDataFrame(
        [(f"https://s{i % 2}.example/p{i}",) for i in range(10)],
        "url string",
    )
    robots = spark.createDataFrame(
        [("s0.example", "User-agent: *\nCrawl-delay: 3\n")],
        "domain string, robots_txt string",
    )
    got = {r["domain"]: r for r in fetch_plan(pages, robots).collect()}
    assert got["s0.example"]["n_pages"] == 5
    assert got["s0.example"]["crawl_delay"] == 3.0
    assert got["s0.example"]["est_sec"] == 15.0
    assert got["s1.example"]["crawl_delay"] == 1.0  # default
    assert got["s1.example"]["est_sec"] == 5.0


def test_ua_group_with_only_crawl_delay_not_merged(spark):
    """Regression (r5): a UA group containing only non-rule directives
    (Crawl-delay) merged its UA tokens into the NEXT group, so 'mybot'
    inherited '*'s Disallow and lost the whole site."""
    from clucene_spark.pipeline.robots import crawl_delay, parse_robots

    txt = ("User-agent: mybot\nCrawl-delay: 5\n\n"
           "User-agent: *\nDisallow: /\n")
    assert parse_robots(txt, "mybot") == []        # mybot's group: no rules
    assert parse_robots(txt, "otherbot") == [(False, "/")]
    assert crawl_delay(txt, "mybot") == 5.0        # consistent grouping
    assert crawl_delay(txt, "otherbot") is None


def test_robots_filter_preserves_caller_domain_column(spark):
    """Regression (r5): drop('domain') also removed the caller's own
    'domain' column from the pages table."""
    from clucene_spark.pipeline.robots import robots_filter

    pages = spark.createDataFrame(
        [(1, "https://a.example/x", "a.example")],
        "doc_id long, url string, domain string",
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nAllow: /\n")],
        "domain string, robots_txt string",
    )
    out = robots_filter(pages, robots)
    assert "domain" in out.columns
    assert out.select("domain").first()[0] == "a.example"
