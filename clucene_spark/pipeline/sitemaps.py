"""Sitemap (sitemaps.org XML) parsing and crawl-freshness gap analysis.

Sitemaps are the crawl scheduler's other input next to robots.txt: each
site publishes the URLs it wants crawled with optional ``lastmod`` /
``changefreq`` / ``priority`` hints, either as a ``<urlset>`` of pages or
a ``<sitemapindex>`` of child sitemaps. A 100-TB ingest uses them to (a)
seed the frontier and (b) find STALE pages — captured before their
declared lastmod — without re-fetching anything.

Operators:
  * ``sitemap_entries(df)`` — map-only explode of sitemap XML blobs into
    (loc, kind, lastmod, changefreq, priority) rows; namespace-agnostic
    (real sitemaps disagree about xmlns), entity-safe, tolerant of
    missing optional tags.
  * ``crawl_gap(sitemap_df, pages_df)`` — per sitemap URL, the crawl
    status against the captured table: ``missing`` (never crawled),
    ``stale`` (latest capture predates lastmod), ``fresh``. One
    outer-join shuffle on canonical URL; the page side is pre-aggregated
    to (url, latest_ts) so page payloads never move.

The XML grammar is the public sitemaps.org protocol; this sits upstream
of the reference engine's scope (it indexes whatever pages the crawl
hands over).
"""

from __future__ import annotations

import datetime as _dt
import xml.etree.ElementTree as _ET
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .urls import canonicalize_url


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(content) -> list[dict]:
    """One sitemap XML blob -> entry dicts. ``kind`` is 'url' for
    <urlset> members and 'sitemap' for <sitemapindex> members; optional
    fields default to None. Malformed XML raises ValueError (callers
    decide drop-vs-fail)."""
    if isinstance(content, (bytes, bytearray)):
        content = bytes(content)
    try:
        root = _ET.fromstring(content)
    except _ET.ParseError as e:
        raise ValueError(f"bad sitemap XML: {e}") from None
    out: list[dict] = []
    for node in root:
        kind = _local(node.tag)
        if kind not in ("url", "sitemap"):
            continue
        ent: dict = {
            "kind": kind, "loc": None, "lastmod": None,
            "changefreq": None, "priority": None,
        }
        for child in node:
            name = _local(child.tag)
            val = (child.text or "").strip()
            if name == "loc":
                ent["loc"] = val or None
            elif name == "lastmod":
                ent["lastmod"] = _parse_lastmod(val)
            elif name == "changefreq":
                ent["changefreq"] = val or None
            elif name == "priority":
                try:
                    ent["priority"] = float(val)
                except ValueError:
                    pass
        if ent["loc"]:
            out.append(ent)
    return out


def _parse_lastmod(val: str):
    """sitemaps.org allows W3C datetime: date-only or full timestamp
    (with 'Z' or numeric offset); normalize to a naive UTC datetime."""
    if not val:
        return None
    try:
        if len(val) == 10:
            return _dt.datetime.strptime(val, "%Y-%m-%d")
        dt = _dt.datetime.fromisoformat(val.replace("Z", "+00:00"))
        if dt.tzinfo is not None:
            dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return dt
    except ValueError:
        return None


_ENTRIES_SCHEMA = (
    "site string, kind string, loc string, lastmod timestamp, "
    "changefreq string, priority double"
)


def sitemap_entries(
    sitemaps: DataFrame,
    site_col: str = "site",
    content_col: str = "sitemap_xml",
    strict: bool = False,
) -> DataFrame:
    """(site, sitemap_xml) -> one row per entry. Map-only Arrow explode;
    malformed blobs are dropped (or raise, with ``strict=True``)."""
    src = sitemaps.select(
        F.col(site_col).alias("site"), F.col(content_col).alias("xml")
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for site, xml in zip(b["site"], b["xml"]):
                try:
                    ents = parse_sitemap(xml)
                except ValueError:
                    if strict:
                        raise
                    continue
                for e in ents:
                    rows.append(
                        (site, e["kind"], e["loc"], e["lastmod"],
                         e["changefreq"], e["priority"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["site", "kind", "loc", "lastmod",
                         "changefreq", "priority"],
            )

    return src.mapInPandas(run, _ENTRIES_SCHEMA)


def crawl_gap(
    entries: DataFrame,
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Sitemap URL entries x captured pages -> per-URL crawl status:
    'missing' | 'stale' (latest capture < lastmod) | 'fresh'. Both sides
    key on the CANONICAL url; pages pre-aggregate to (canon, latest_ts)
    before the join so only id-sized rows shuffle."""
    want = entries.where(F.col("kind") == "url").select(
        "site",
        F.col("loc"),
        canonicalize_url(F.col("loc")).alias("canon"),
        "lastmod",
        "priority",
    )
    latest = (
        pages.select(
            canonicalize_url(F.col(url_col)).alias("canon"),
            F.col(ts_col).alias("ts"),
        )
        .groupBy("canon")
        .agg(F.max("ts").alias("latest_ts"))
    )
    j = want.join(latest, "canon", "left")
    status = (
        F.when(F.col("latest_ts").isNull(), F.lit("missing"))
        .when(
            F.col("lastmod").isNotNull()
            & (F.col("latest_ts") < F.col("lastmod")),
            F.lit("stale"),
        )
        .otherwise(F.lit("fresh"))
    )
    return j.select(
        "site", "loc", "lastmod", "latest_ts", "priority",
        status.alias("status"),
    )
