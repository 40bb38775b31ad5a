"""robots.txt (RFC 9309) evaluation — the crawl-politeness filter.

A web-scale ingest must drop pages the site's robots.txt disallows for
the crawling agent before they reach dedup/indexing. This implements the
Robots Exclusion Protocol's matching rules:

  * group selection: the group whose ``User-agent`` token is the longest
    case-insensitive substring of the crawler's agent string wins; the
    ``*`` group is the fallback (RFC 9309 §2.2.1);
  * rule matching: ``Allow``/``Disallow`` values are path prefixes with
    ``*`` (any sequence) and ``$`` (end anchor) wildcards (§2.2.2-2.2.3);
  * decision: the LONGEST matching rule value wins; on a length tie,
    Allow wins; no match or empty Disallow -> allowed (§2.2.2).

Scale notes (100 TB): the robots table is per-DOMAIN (tiny next to the
page table — one row per site, not per page). ``robots_filter``
pre-parses each domain's file ONCE into a rules array (map-only over the
small side), then equi-joins pages on domain — Catalyst/AQE broadcasts
the parsed side when it fits, so the page table never shuffles — and
evaluates the longest-match walk in an Arrow-batched kernel with a
per-batch compiled-pattern cache. No per-page re-parse, no driver-side
state.

Upstream of the reference (CLucene indexes whatever documents it is
handed); the protocol itself is public (RFC 9309 / the classic
robotstxt.org spec).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .urls import domain_of


# ---------------------------------------------------------------------------
# parsing + matching (pure python kernels)
# ---------------------------------------------------------------------------

def parse_robots(content: str, agent: str) -> list[tuple[bool, str]]:
    """robots.txt text -> the [(allow, pattern), ...] rule list of the
    group governing `agent` (most-specific user-agent token wins, '*' is
    the fallback; consecutive UA lines share one group)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_uas: list[str] = []
    cur_rules: list[tuple[bool, str]] | None = None
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur_rules is not None:  # a rules block just closed
                groups.append((cur_uas, cur_rules))
                cur_uas, cur_rules = [], None
            cur_uas.append(val.lower())
        elif key in ("allow", "disallow"):
            if not cur_uas:
                continue  # rule before any user-agent line: ignored
            if cur_rules is None:
                cur_rules = []
            if val:  # empty Disallow/Allow matches nothing (RFC 9309)
                cur_rules.append((key == "allow", val))
        elif cur_uas:
            # any OTHER directive (crawl-delay, sitemap, ...) still opens
            # the group's rules block: a group containing only
            # 'Crawl-delay' must not merge its UA tokens into the NEXT
            # group (crawl_delay() in this file already splits there)
            if cur_rules is None:
                cur_rules = []
    if cur_uas:
        groups.append((cur_uas, cur_rules or []))

    agent_l = agent.lower()
    best_len, best_rules = -1, []
    star_rules: list[tuple[bool, str]] | None = None
    for uas, rules in groups:
        for ua in uas:
            if ua == "*":
                if star_rules is None:
                    star_rules = rules
            elif ua in agent_l and len(ua) > best_len:
                best_len, best_rules = len(ua), rules
    if best_len >= 0:
        return best_rules
    return star_rules if star_rules is not None else []


def crawl_delay(content: str, agent: str) -> float | None:
    """The governing group's ``Crawl-delay`` (seconds), or None. Group
    selection is identical to `parse_robots` (most-specific UA token,
    '*' fallback); a non-numeric value is ignored like a missing one."""
    groups: list[tuple[list[str], float | None]] = []
    cur_uas: list[str] = []
    cur_delay: float | None = None
    in_rules = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((cur_uas, cur_delay))
                cur_uas, cur_delay, in_rules = [], None, False
            cur_uas.append(val.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            if not cur_uas:
                continue
            in_rules = True
            if key == "crawl-delay":
                try:
                    cur_delay = float(val)
                except ValueError:
                    pass
    if cur_uas:
        groups.append((cur_uas, cur_delay))

    agent_l = agent.lower()
    best_len, best = -1, None
    star: tuple[bool, float | None] = (False, None)
    for uas, delay in groups:
        for ua in uas:
            if ua == "*":
                if not star[0]:
                    star = (True, delay)
            elif ua in agent_l and len(ua) > best_len:
                best_len, best = len(ua), delay
    if best_len >= 0:
        return best
    return star[1] if star[0] else None


def fetch_plan(
    pages: DataFrame,
    robots: DataFrame,
    agent: str = "cluceneSparkBot",
    url_col: str = "url",
    default_delay: float = 1.0,
    domain_col: str = "domain",
    content_col: str = "robots_txt",
) -> DataFrame:
    """Politeness-bounded fetch schedule per domain: page count, the
    site's Crawl-delay (default when undeclared), and the serial fetch
    time `n_pages * delay` — the number a crawl scheduler shards its
    frontier by (a domain's pages CANNOT be parallelized past its
    delay, so est_sec is the per-domain critical path). One groupBy
    shuffle of (domain) keys; delays ride a broadcast."""
    delays_src = robots.select(
        F.col(domain_col).alias("domain"), F.col(content_col).alias("txt")
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "domain": b["domain"],
                    "delay": [
                        crawl_delay(t or "", agent) for t in b["txt"]
                    ],
                }
            )

    delays = delays_src.mapInPandas(run, "domain string, delay double")
    counts = (
        pages.select(domain_of(F.col(url_col)).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_pages"))
    )
    j = counts.join(F.broadcast(delays), "domain", "left")
    eff = F.coalesce(F.col("delay"), F.lit(float(default_delay)))
    return j.select(
        "domain",
        "n_pages",
        eff.alias("crawl_delay"),
        F.round(F.col("n_pages") * eff, 1).alias("est_sec"),
    )


def _compile_pattern(pattern: str):
    """robots path pattern -> compiled regex (match from path start).
    ``*`` -> ``.*``; a trailing ``$`` anchors the end; everything else is
    literal."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile(rx + ("$" if anchored else ""))


def robots_decision(
    rules: list[tuple[bool, str]], path: str,
    _cache: dict | None = None,
) -> tuple[bool, str]:
    """(allowed, winning_pattern) for a URL path under a parsed rule
    list: longest matching pattern wins, ties go to Allow, no match
    allows."""
    best = (True, "", -1)  # (allow, pattern, length)
    for allow, pattern in rules:
        if _cache is not None:
            rx = _cache.get(pattern)
            if rx is None:
                rx = _cache[pattern] = _compile_pattern(pattern)
        else:
            rx = _compile_pattern(pattern)
        if rx.match(path):
            n = len(pattern)
            if n > best[2] or (n == best[2] and allow and not best[0]):
                best = (allow, pattern, n)
    return best[0], best[1]


def url_path(url: str) -> str:
    """Path + query of a URL (the robots matching target): strip scheme
    and authority, keep from the first '/' after the host; default '/'."""
    rest = url.split("://", 1)[-1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


# ---------------------------------------------------------------------------
# DataFrame operator
# ---------------------------------------------------------------------------

_RULES_SCHEMA = (
    "domain string, rules array<struct<allow:boolean,pattern:string>>"
)


def parse_robots_df(
    robots: DataFrame,
    agent: str = "cluceneSparkBot",
    domain_col: str = "domain",
    content_col: str = "robots_txt",
) -> DataFrame:
    """(domain, robots_txt) -> (domain, rules array) — each site's file
    parsed ONCE, on the small per-domain side."""
    src = robots.select(
        F.col(domain_col).alias("domain"), F.col(content_col).alias("txt")
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for dom, txt in zip(b["domain"], b["txt"]):
                rules = parse_robots(txt or "", agent)
                out.append(
                    (dom, [{"allow": a, "pattern": p} for a, p in rules])
                )
            yield pd.DataFrame(out, columns=["domain", "rules"])

    return src.mapInPandas(run, _RULES_SCHEMA)


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    agent: str = "cluceneSparkBot",
    url_col: str = "url",
    keep_denied: bool = False,
    broadcast_rules: bool = True,
) -> DataFrame:
    """Annotate (and by default filter) pages by the robots decision of
    their domain. Pages with no robots row for their domain are allowed
    (a missing robots.txt allows everything). Adds ``robots_allowed``
    and ``robots_rule`` (the winning pattern, '' if none); with the
    default ``keep_denied=False`` only allowed pages survive.

    ``broadcast_rules=True`` (default) pins a broadcast join — the
    parsed side is one row per DOMAIN, so it fits for any realistic
    robots table and the page side never shuffles (Catalyst has no
    stats for the mapInPandas output, so without the hint the static
    plan falls back to sort-merge). Pass False only for extreme domain
    counts where the rules table genuinely exceeds broadcast limits."""
    # rename the parsed side's join columns to reserved names: a plain
    # drop('domain') at the end would also delete a caller-owned
    # 'domain' column from the pages table (drop-by-name removes EVERY
    # column with that name)
    parsed = parse_robots_df(robots, agent=agent).select(
        F.col("domain").alias("_rb_domain"), F.col("rules").alias("_rb_rules")
    )
    if broadcast_rules:
        parsed = F.broadcast(parsed)
    joined = pages.withColumn(
        "_rdom", domain_of(F.col(url_col))
    ).join(parsed, F.col("_rdom") == F.col("_rb_domain"), "left")

    @F.pandas_udf("struct<allowed:boolean,rule:string>")
    def decide(url: pd.Series, rules: pd.Series) -> pd.DataFrame:
        cache: dict = {}
        alw, pat = [], []
        for u, rl in zip(url, rules):
            if rl is None or len(rl) == 0:
                alw.append(True)
                pat.append("")
                continue
            a, p = robots_decision(
                [(r["allow"], r["pattern"]) for r in rl],
                url_path(u),
                _cache=cache,
            )
            alw.append(a)
            pat.append(p)
        return pd.DataFrame({"allowed": alw, "rule": pat})

    out = (
        joined.withColumn("_dec", decide(F.col(url_col), F.col("_rb_rules")))
        .withColumn("robots_allowed", F.col("_dec.allowed"))
        .withColumn("robots_rule", F.col("_dec.rule"))
        .drop("_rdom", "_rb_domain", "_rb_rules", "_dec")
    )
    if keep_denied:
        return out
    return out.where(F.col("robots_allowed")).drop(
        "robots_allowed", "robots_rule"
    )
