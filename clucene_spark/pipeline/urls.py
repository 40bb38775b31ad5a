"""URL canonicalization + URL-level dedup for Common-Crawl-style webtext.

The BASELINE input is an Iceberg table of web pages keyed by
(url, warc_ts) — the same page is crawled many times under trivially
different URLs (http vs https, www., tracking params, fragments,
trailing slashes, param order). Before any content-level dedup a web
pipeline collapses those to one canonical row per page, keeping the
freshest capture (latest warc_ts) — the URL-level analogue of
exact_dedup, and the cheapest dedup pass there is: pure string algebra
per row, one shuffle on the canonical key.

Everything here is JVM-side Catalyst column math (regexp / split /
array_sort / array_join) — no Python in the plan, so the pass runs at
scan speed and whole-stage-codegens. At 100 TB the only shuffle is the
groupBy(canon_url); host-level skew (one domain with billions of pages)
does not skew THIS key because the full path+query participates.

Canonicalization spec (documented simplifications are marked):
  1. strip the #fragment,
  2. collapse the scheme: http:// and https:// compare equal,
  3. host: lowercase, strip one leading "www.", strip an explicit
     default port (:80 / :443 — stripped for either scheme, a
     simplification: the schemes are already collapsed),
  4. path: strip trailing slashes ("/a/" == "/a"); case preserved,
  5. query: drop tracking params (any utm_* key, and gclid / fbclid /
     msclkid / ref), sort the survivors bytewise, rejoin; an emptied
     query drops its "?".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tracking-param key prefixes (prefix tests, not a regex: the filter
# lambda runs inside a higher-order function, which Catalyst evaluates
# interpreted — startsWith is a cheap byte compare there, a regex is not)
TRACKING_PARAM_PREFIXES = ("utm_", "gclid=", "fbclid=", "msclkid=", "ref=")


def _is_tracking(p: Column) -> Column:
    cond = None
    for pref in TRACKING_PARAM_PREFIXES:
        c = p.startswith(pref)
        cond = c if cond is None else cond | c
    return cond


def canonicalize_url(url: Column) -> Column:
    """Canonical page key for a raw crawl URL (spec in module docstring).

    Pure Catalyst expression — usable inside any select/groupBy without
    leaving whole-stage codegen.
    """
    u = F.regexp_replace(url, r"#.*$", "")                      # 1. fragment
    u = F.regexp_replace(u, r"^[Hh][Tt][Tt][Pp][Ss]?://", "")   # 2. scheme
    host = F.lower(F.regexp_extract(u, r"^([^/?]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")                # 3. www.
    host = F.regexp_replace(host, r":(80|443)$", "")            # 3. port
    rest = F.regexp_replace(u, r"^[^/?]+", "")
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", ""      # 4. slash
    )
    query = F.when(
        rest.contains("?"), F.regexp_extract(rest, r"\?(.*)$", 1)
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~_is_tracking(p),                 # 5. tracking
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


def url_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level dedup groups: one row per canonical URL seen >1 time,
    with the survivor = latest capture (max ts, doc_id tiebreak).

    Returns (canon_url, n_copies, keep_doc). Latest-wins via
    max(struct(ts, id)) — a single map-side-combining aggregation, no
    window function, no second pass. At 100 TB this is one shuffle of
    (canon_url, ts, id) triples; the page payload (html/text) never
    moves — callers semi-join survivors back against the full table.
    """
    canon = pages.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
    )
    return (
        canon.groupBy("canon_url")
        .agg(
            F.count("*").alias("n_copies"),
            F.max(F.struct("ts", "doc_id"))["doc_id"].alias("keep_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )


def url_dedup_survivors(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """The full-table form: the input pages rows with only the canonical
    survivor of every URL group retained (latest warc_ts wins). Shuffles
    only (canon_url, ts, id); survivors join back broadcast-free via a
    doc_id semi-join that AQE can plan as shuffled-hash on the id."""
    canon = pages.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
    )
    keep = (
        canon.groupBy("canon_url")
        .agg(F.max(F.struct("ts", "doc_id"))["doc_id"].alias(id_col))
        .select(id_col)
    )
    return pages.join(keep, id_col, "left_semi")


def url_dedup_hinted(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """URL dedup honoring the page's DECLARED canonical
    (``<link rel="canonical">``) over syntactic canonicalization: the
    group key is canonicalize(coalesce(declared, fetched_url)), so every
    session/tracking variant that declares the same canonical collapses
    into one group even when the fetched URLs differ beyond what string
    rules can see. Returns (canon_url, n_copies, keep_doc) like
    `url_dedup`.

    Same scale shape: the hint extraction fuses into the page scan
    (Arrow-batched), then one shuffle of (canon, ts, id) triples — the
    page payload never moves."""
    from .extract import canonical_hint_col

    canon = pages.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
        canonicalize_url(
            F.coalesce(
                canonical_hint_col(F.col(html_col), F.col(url_col)),
                F.col(url_col),
            )
        ).alias("canon_url"),
    )
    return (
        canon.groupBy("canon_url")
        .agg(
            F.count("*").alias("n_copies"),
            F.max(F.struct("ts", "doc_id"))["doc_id"].alias("keep_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )


def domain_of(url: Column) -> Column:
    """Registrable-host key (lowercased host, www. stripped, port
    stripped) — the stratification key for per-domain caps and corpus-mix
    stats over webtext. Simplification: no public-suffix list in this
    container, so the full host is the domain key (subdomain-level)."""
    u = F.regexp_replace(url, r"^[Hh][Tt][Tt][Pp][Ss]?://", "")
    host = F.lower(F.regexp_extract(u, r"^([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":\d+$", "")


def domain_stats(
    pages: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Docs per domain — the input for per-domain caps (feed to
    sampling.stratum_cap with stratum=domain). One partial-aggregating
    shuffle on the domain key."""
    return (
        pages.select(domain_of(F.col(url_col)).alias("domain"), id_col)
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc"),
            F.max(id_col).alias("max_doc"),
        )
    )


def blocklist_filter(
    pages: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    keep_blocked: bool = False,
) -> DataFrame:
    """Domain blocklist filtering with SUFFIX semantics: a blocklist
    entry ``bad.example`` blocks the domain itself and every subdomain
    (``ads.bad.example``), the convention of public blocklists. Each
    page's host explodes into its suffix chain (a.b.c -> a.b.c, b.c, c
    — bounded by label count, ~4-6 rows) and semi-joins the broadcast
    blocklist, so the page table never shuffles and matching is exact
    equality, not LIKE scans. ``keep_blocked=True`` annotates with
    ``blocked`` instead of filtering."""
    # blocked-host set first, then one broadcast join back on the DERIVED
    # host string. The r4 form joined hits back on ALL page columns,
    # which (a) shuffled the full page payload (html included) as a join
    # key and (b) let any row with a NULL field escape the blocklist
    # entirely (NULL == NULL is never true in a join condition).
    bl = F.broadcast(
        blocklist.select(F.col(domain_col).alias("_bl_domain")).distinct()
    )
    pages2 = pages.withColumn("_bl_host", domain_of(F.col(url_col)))
    labels = F.split(F.col("_bl_host"), r"\.")
    n = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n), "."),
    )
    blocked_hosts = (
        pages2.select("_bl_host")
        .where(F.col("_bl_host").isNotNull())
        .distinct()  # bounded by distinct domains, not pages
        .withColumn("_sfx", F.explode(suffixes))
        .join(bl, F.col("_sfx") == F.col("_bl_domain"))
        .select("_bl_host")
        .distinct()
    )
    if keep_blocked:
        marked = pages2.join(
            F.broadcast(blocked_hosts).withColumn("blocked", F.lit(True)),
            "_bl_host",
            "left",
        )
        return marked.withColumn(
            "blocked", F.coalesce("blocked", F.lit(False))
        ).drop("_bl_host")
    return pages2.join(
        F.broadcast(blocked_hosts), "_bl_host", "left_anti"
    ).drop("_bl_host")
