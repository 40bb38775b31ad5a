"""Web link-graph operators: anchor extraction, anchor-text aggregation,
and fixed-iteration PageRank.

A web-scale fulltext index does not rank pages on body text alone — the
classic inputs a crawl pipeline derives per target URL are (a) the anchor
text of the links pointing at it (an extra searchable field, often the
single strongest relevance signal for navigational queries) and (b) a
link-analysis score (PageRank) used as a static rank component. The
reference engine indexes whatever fields it is handed
(`document/Field.cpp`); producing those fields from a 100-TB crawl is the
distributed step this module supplies.

Scale notes (100 TB):
  * `extract_links` is map-only — an Arrow-batched pandas UDF fused into
    the page scan (stdlib `html`/`urllib.parse` make Python unavoidable,
    exactly like `extract.extract_text_col`), exploding to one row per
    anchor. No shuffle.
  * `anchor_text_agg` is ONE shuffle on canonical target URL with
    map-side partial aggregation (the term explode happens before the
    groupBy, so combiners shrink hub pages' fan-in).
  * `pagerank` is the standard distributed power iteration: per round
    one join (ranks ⟕ edges on src) + one groupBy(dst) shuffle, with the
    dangling-rank mass folded in via a 1-row cross join (broadcast by
    AQE). Edges are hash-repartitioned on src ONCE and persisted so every
    round's join reuses the same partitioning; lineage is truncated per
    round with localCheckpoint like `graph.connected_components`.
"""

from __future__ import annotations

import html as _html
import re
from urllib.parse import urljoin

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from .urls import canonicalize_url, domain_of

_A_RE = re.compile(
    r"(?is)<a\b[^>]*?href\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a>"
)
_TAG_RE = re.compile(r"<[^>]*>")


def extract_links_py(base_url: str, raw) -> list[tuple[str, str]]:
    """One page -> [(absolute_href, anchor_text)] in document order.

    href is entity-unescaped then resolved against the page URL
    (stdlib urljoin: relative paths, ../, protocol-relative). Anchor
    text is the tag-stripped, entity-unescaped, whitespace-collapsed
    inner HTML. javascript:/mailto:/empty hrefs are dropped."""
    if raw is None:
        return []  # failed fetch: no links
    s = (
        raw.decode("utf-8", "replace")
        if isinstance(raw, (bytes, bytearray))
        else raw
    )
    out = []
    for m in _A_RE.finditer(s):
        href = _html.unescape(m.group(2) or m.group(3) or m.group(4) or "")
        href = href.strip()
        if not href or href.lstrip().lower().startswith(
                ("javascript:", "mailto:", "#")):  # schemes are case-insensitive
            continue
        anchor = _html.unescape(_TAG_RE.sub(" ", m.group(5)))
        anchor = " ".join(anchor.split())
        try:
            absu = urljoin(base_url, href)
        except ValueError:
            continue
        out.append((absu, anchor))
    return out


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Pages -> one row per anchor: (src_url, dst_url, anchor_text).

    Map-only: Arrow-batched UDF returning an array of structs, exploded
    JVM-side. At 100 TB this fuses into the crawl scan with no shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<dst_url:string,anchor_text:string>>")
    def _links(url: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [
                    {"dst_url": d, "anchor_text": a}
                    for d, a in extract_links_py(u, h)
                ]
                for u, h in zip(url, html)
            ]
        )

    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(_links(F.col(url_col), F.col(html_col))).alias("lnk"),
        )
        .select("src_url", "lnk.dst_url", "lnk.anchor_text")
    )


def anchor_text_agg(links: DataFrame) -> DataFrame:
    """Per canonical target URL: in-link count, distinct source domains,
    and the sorted distinct lowercased anchor terms — the extra
    searchable field a web index attaches to each page.

    One shuffle (groupBy canonical dst). Self-links (same canonical src
    and dst) are dropped first, the standard anchor-corpus rule. Term
    explode precedes the groupBy so partial aggregation combines
    map-side; `array_sort(collect_set(...))` keeps the output
    deterministic for any row order."""
    e = links.select(
        canonicalize_url(F.col("src_url")).alias("src"),
        domain_of(F.col("src_url")).alias("src_domain"),
        canonicalize_url(F.col("dst_url")).alias("dst"),
        F.col("anchor_text"),
    ).where(F.col("src") != F.col("dst"))
    terms = e.select(
        "src",
        "src_domain",
        "dst",
        F.explode_outer(
            F.filter(
                F.split(F.lower(F.col("anchor_text")), r"\s+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    # two-level aggregation instead of one multi-distinct groupBy: a
    # single groupBy with two count_distincts plans as Expand (3x the
    # exploded-term volume through the shuffle); keying the first level
    # by (dst, src, domain) dedupes terms map-side, and the second level
    # aggregates the already-tiny per-inlink rows (src_domain is a
    # function of src, so rows are unique per (dst, src) and count(*)
    # IS the distinct-src count)
    per_src = terms.groupBy("dst", "src", "src_domain").agg(
        F.filter(F.collect_set("term"), lambda t: t.isNotNull()).alias("ts")
    )
    return per_src.groupBy("dst").agg(
        F.count("*").alias("n_inlinks"),
        # size(collect_set) not count_distinct: same value, but it folds
        # into this agg's partial/final phases instead of planning a
        # third distinct-rewrite exchange
        F.size(F.collect_set("src_domain")).cast("long").alias(
            "n_src_domains"
        ),
        F.array_join(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("ts")))
            ),
            " ",
        ).alias("anchor_terms"),
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    partitions: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over (src, dst) edges -> (url, rank).

    Deterministic power iteration with uniform init 1/N and full
    dangling-mass redistribution each round:

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/out(u) + D/N)

    where D is the summed rank of nodes with no out-links. Duplicate
    (src, dst) edges collapse to one (a link counts once). The node set
    is src ∪ dst.

    Distribution: edges are repartitioned on src ONCE and persisted, so
    the per-round ranks⟕edges join co-partitions without re-shuffling
    the (much larger) edge side; each round then costs one groupBy(dst)
    shuffle. The dangling scalar rides in via a 1-row aggregate
    cross-joined (broadcast) onto the node set. localCheckpoint per
    round keeps the plan O(1) deep exactly like
    `graph.connected_components` (on a real cluster use checkpoint()
    with a checkpoint dir)."""
    spark = edges.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    e = (
        edges.select(
            F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
        )
        .where(F.col("e_src") != F.col("e_dst"))
        .distinct()
        .repartition(n_parts, "e_src")
        .persist()
    )
    nodes = (
        e.select(F.col("e_src").alias("url"))
        .union(e.select(F.col("e_dst").alias("url")))
        .distinct()
        .persist()
    )
    n_total = nodes.count()
    if n_total == 0:
        e.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "url string, rank double")
    out_deg = e.groupBy("e_src").agg(F.count("*").alias("out_deg"))
    ranks = nodes.select("url", F.lit(1.0 / n_total).alias("rank"))
    for _ in range(iters):
        r = ranks.join(
            out_deg, ranks["url"] == out_deg["e_src"], "left"
        ).select("url", "rank", "out_deg")
        dangling = r.where(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        contrib = (
            r.join(e, r["url"] == e["e_src"])
            .select(
                F.col("e_dst").alias("url"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("url")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "url", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "url",
                (
                    F.lit((1.0 - damping) / n_total)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dmass") / n_total
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    nodes.unpersist()
    return ranks


def resolve_redirects(
    redirects: DataFrame, max_hops: int = 8
) -> DataFrame:
    """Collapse HTTP redirect chains: (src, dst) edges from 3xx
    responses -> (src, final, n_hops, terminal). A crawl stores aliases
    under every hop URL; dedup and link analysis should key on the
    chain's end.

    Pointer doubling: each round substitutes final(x) := final(dst(x)),
    so chains up to 2^k collapse in k self-join rounds —
    ceil(log2(max_hops)) shuffles instead of max_hops (the
    `connected_components` recipe). ``terminal`` is False for cycles and
    chains longer than max_hops (their resolved target still redirects);
    lineage is truncated per round with localCheckpoint."""
    import math

    m = redirects.select(
        F.col("src").alias("m_src"),
        F.col("dst").alias("m_dst"),
        F.lit(1).alias("hops"),
    ).localCheckpoint(eager=True)
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        nxt = m.select(
            F.col("m_src").alias("j_src"),
            F.col("m_dst").alias("j_dst"),
            F.col("hops").alias("j_hops"),
        )
        m = (
            m.join(nxt, m["m_dst"] == nxt["j_src"], "left")
            .select(
                "m_src",
                F.coalesce("j_dst", "m_dst").alias("m_dst"),
                F.when(
                    F.col("j_dst").isNotNull(),
                    F.least(
                        F.col("hops") + F.col("j_hops"),
                        F.lit(max_hops + 1),
                    ),
                ).otherwise(F.col("hops")).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    srcs = redirects.select(F.col("src").alias("s")).distinct()
    return (
        m.join(srcs, m["m_dst"] == srcs["s"], "left")
        .select(
            F.col("m_src").alias("src"),
            F.col("m_dst").alias("final"),
            F.col("hops").cast("int").alias("n_hops"),
            (F.col("s").isNull() & (F.col("hops") <= max_hops)).alias(
                "terminal"
            ),
        )
    )
