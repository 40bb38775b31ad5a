"""Link-graph operators: anchor extraction, anchor-text aggregation,
fixed-iteration PageRank (pipeline/links.py)."""

import pytest

from clucene_spark.pipeline.links import (
    anchor_text_agg,
    extract_links,
    extract_links_py,
    pagerank,
)


# ---------------------------------------------------------------------------
# extract_links_py (pure python kernel)
# ---------------------------------------------------------------------------

def test_extract_links_py_shapes():
    html = (
        '<p>pre <a href="/b?x=1">go <b>deep</b> link</a> mid '
        "<a href='../up'>rel</a> "
        '<a href=bare>bare</a> '
        '<a href="javascript:void(0)">js</a> '
        '<a href="mailto:x@y.z">mail</a> '
        '<a href="#frag">frag-only</a> '
        '<a href="https://other.example/abs">abs &amp; more</a></p>'
    )
    got = extract_links_py("https://site0.example/a/page", html)
    assert got == [
        ("https://site0.example/b?x=1", "go deep link"),
        ("https://site0.example/up", "rel"),
        ("https://site0.example/a/bare", "bare"),
        ("https://other.example/abs", "abs & more"),
    ]


def test_extract_links_py_entity_href_and_bytes():
    # &amp; inside href must unescape BEFORE resolution; bytes input ok
    html = b'<a href="/q?a=1&amp;b=2">x</a>'
    assert extract_links_py("http://h.example/", html) == [
        ("http://h.example/q?a=1&b=2", "x")
    ]


# ---------------------------------------------------------------------------
# Spark forms
# ---------------------------------------------------------------------------

def test_extract_links_df(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.example/p", '<a href="/x">one</a><a href="/y">two</a>'),
            ("https://b.example/p", "no links here"),
        ],
        "url string, html string",
    )
    rows = sorted(
        extract_links(pages).collect(), key=lambda r: (r.src_url, r.dst_url)
    )
    assert [(r.src_url, r.dst_url, r.anchor_text) for r in rows] == [
        ("https://a.example/p", "https://a.example/x", "one"),
        ("https://a.example/p", "https://a.example/y", "two"),
    ]


def test_anchor_text_agg(spark):
    links = spark.createDataFrame(
        [
            # two sources on different domains -> same canonical target
            ("https://a.example/1", "https://www.t.example/p/?utm_source=z", "Click Here"),
            ("http://b.example/2", "https://t.example/p/", "here now"),
            # self-link (same canonical) must be dropped
            ("https://t.example/p", "https://t.example/p/", "self"),
            # second target
            ("https://a.example/1", "https://u.example/q", "Other"),
        ],
        "src_url string, dst_url string, anchor_text string",
    )
    got = {r.dst: r for r in anchor_text_agg(links).collect()}
    t = got["t.example/p"]
    assert t.n_inlinks == 2 and t.n_src_domains == 2
    assert t.anchor_terms == "click here now"
    u = got["u.example/q"]
    assert (u.n_inlinks, u.n_src_domains, u.anchor_terms) == (1, 1, "other")


# ---------------------------------------------------------------------------
# PageRank vs a dense numpy oracle
# ---------------------------------------------------------------------------

def _numpy_pagerank(edges, iters, d=0.85):
    import numpy as np

    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    dedup = sorted({(s, t) for s, t in edges if s != t})
    out = np.zeros(n)
    for s, _ in dedup:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, t in dedup:
            inflow[idx[t]] += r[idx[s]] / out[idx[s]]
        dmass = r[out == 0].sum()
        r = (1 - d) / n + d * (inflow + dmass / n)
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_numpy_with_dangling_and_dupes(spark):
    # deterministic graph: hub, chain, a dangling sink, a duplicate edge
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("d", "e"),  # e dangles (no out-links)
        ("a", "b"),  # duplicate collapses
        ("f", "f"),  # self-loop dropped -> f dangles too
        ("f", "a"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.url: r.rank for r in pagerank(df, iters=3).collect()}
    want = _numpy_pagerank(edges, iters=3)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12)
    # ranks stay a probability distribution (dangling mass conserved)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df, iters=2).count() == 0


def test_resolve_redirects_chains_cycles_caps(spark):
    from clucene_spark.pipeline.links import resolve_redirects

    edges = [("u3", "u2"), ("u2", "u1"), ("u1", "u0"),   # chain -> u0
             ("ca", "cb"), ("cb", "ca")]                 # 2-cycle
    edges += [(f"L{i}", f"L{i+1}") for i in range(12)]   # 12-hop chain
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["src"]: r for r in resolve_redirects(df, max_hops=8).collect()}

    assert (got["u3"]["final"], got["u3"]["n_hops"],
            got["u3"]["terminal"]) == ("u0", 3, True)
    assert got["u2"]["final"] == "u0" and got["u2"]["n_hops"] == 2
    assert got["u1"]["final"] == "u0" and got["u1"]["n_hops"] == 1
    # cycle members never terminate
    assert got["ca"]["terminal"] is False
    assert got["cb"]["terminal"] is False
    # a chain longer than max_hops is not certified terminal...
    assert got["L0"]["terminal"] is False
    # ...but hops within the cap resolve fully
    assert (got["L8"]["final"], got["L8"]["terminal"]) == ("L12", True)


def test_warc_scan_surfaces_redirect_location(spark, tmp_path):
    import io

    from clucene_spark.data import warc as W

    rec = W.build_record(
        "response",
        W.http_response(
            b"", status=301, reason="Moved",
            extra=[("Location", "https://t.example/new")],
        ),
        url="https://t.example/old",
    )
    ok = W.build_record(
        "response", W.http_response(b"<p>x</p>"), url="https://t.example/new"
    )
    p = tmp_path / "r.warc.gz"
    p.write_bytes(W.gzip_member(rec) + W.gzip_member(ok))
    rows = {r["url"]: r for r in W.warc_scan(spark, [str(p)]).collect()}
    assert rows["https://t.example/old"]["http_status"] == 301
    assert rows["https://t.example/old"]["location"] == "https://t.example/new"
    assert rows["https://t.example/new"]["location"] is None
