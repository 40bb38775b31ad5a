"""Sitemap parsing + crawl-gap (`pipeline/sitemaps.py`)."""

from __future__ import annotations

import datetime as dt

import pytest

from clucene_spark.pipeline.sitemaps import (
    crawl_gap,
    parse_sitemap,
    sitemap_entries,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/p1</loc><lastmod>2024-03-05</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://a.example/p2?x=1&amp;y=2</loc>
       <lastmod>2024-03-05T10:30:00+02:00</lastmod></url>
  <url><loc>https://a.example/p3</loc><priority>not-a-number</priority></url>
  <url><lastmod>2024-01-01</lastmod></url><!-- no loc: dropped -->
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example/sitemap-1.xml</loc>
           <lastmod>2024-02-02</lastmod></sitemap>
</sitemapindex>"""


def test_parse_urlset():
    ents = parse_sitemap(URLSET.encode())
    assert [e["loc"] for e in ents] == [
        "https://a.example/p1",
        "https://a.example/p2?x=1&y=2",   # entity unescaped by the parser
        "https://a.example/p3",
    ]
    assert ents[0]["lastmod"] == dt.datetime(2024, 3, 5)
    assert ents[0]["changefreq"] == "daily" and ents[0]["priority"] == 0.8
    # tz offset normalized to naive UTC
    assert ents[1]["lastmod"] == dt.datetime(2024, 3, 5, 8, 30)
    assert ents[2]["priority"] is None


def test_parse_index_and_no_namespace():
    ents = parse_sitemap(INDEX)
    assert ents == [{
        "kind": "sitemap", "loc": "https://a.example/sitemap-1.xml",
        "lastmod": dt.datetime(2024, 2, 2), "changefreq": None,
        "priority": None,
    }]
    bare = "<urlset><url><loc>https://b.example/</loc></url></urlset>"
    assert parse_sitemap(bare)[0]["loc"] == "https://b.example/"


def test_malformed_raises():
    with pytest.raises(ValueError, match="bad sitemap"):
        parse_sitemap(b"<urlset><url>")


def test_sitemap_entries_drops_or_raises(spark):
    df = spark.createDataFrame(
        [("a.example", URLSET), ("bad.example", "<urlset><url>")],
        "site string, sitemap_xml string",
    )
    got = sitemap_entries(df).collect()
    assert len(got) == 3 and {r["site"] for r in got} == {"a.example"}
    with pytest.raises(Exception):
        sitemap_entries(df, strict=True).collect()


def test_crawl_gap_statuses(spark):
    xml = (
        '<urlset>'
        '<url><loc>https://s.example/fresh</loc>'
        '<lastmod>2024-01-01</lastmod></url>'
        '<url><loc>https://s.example/stale</loc>'
        '<lastmod>2024-06-01</lastmod></url>'
        '<url><loc>https://s.example/missing</loc></url>'
        '<url><loc>https://www.s.example/canon/?utm_source=x</loc>'
        '<lastmod>2024-01-01</lastmod></url>'
        '</urlset>'
    )
    entries = sitemap_entries(
        spark.createDataFrame(
            [("s.example", xml)], "site string, sitemap_xml string"
        )
    )
    pages = spark.createDataFrame(
        [
            ("https://s.example/fresh", dt.datetime(2024, 2, 1)),
            ("https://s.example/fresh", dt.datetime(2023, 1, 1)),
            ("https://s.example/stale", dt.datetime(2024, 2, 1)),
            ("https://s.example/canon", dt.datetime(2024, 3, 1)),
        ],
        "url string, warc_ts timestamp",
    )
    got = {r["loc"]: r for r in crawl_gap(entries, pages).collect()}
    assert got["https://s.example/fresh"]["status"] == "fresh"
    assert got["https://s.example/fresh"]["latest_ts"] == dt.datetime(2024, 2, 1)
    assert got["https://s.example/stale"]["status"] == "stale"
    assert got["https://s.example/missing"]["status"] == "missing"
    # canonicalization bridges www./trailing-slash/utm noise
    assert got["https://www.s.example/canon/?utm_source=x"]["status"] == "fresh"
