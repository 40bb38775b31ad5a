"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: clucene_spark (see SURVEY.md §2 for the operator inventory these
queries cover). All float scores are rounded to 4 decimals on BOTH sides so
cross-engine libm ULP differences cannot flip value hashes or top-k rank
ties; ranking ties break by doc_id ASC per the reference's HitQueue
semantics (search/HitQueue.cpp:100-105).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from clucene_spark.index.build import InvertedIndex
from clucene_spark.queryparser.parser import parse as _parse
from clucene_spark.search.engine import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    ConstantScoreQuery,
    FilteredQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    Searcher,
    TermQuery,
    WildcardQuery,
)

# ---------------------------------------------------------------------------
# index cache (one InvertedIndex per sf_dir per session)
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict[str, InvertedIndex] = {}
_SEARCHER_CACHE: dict[tuple[str, str], Searcher] = {}
_STORE_CACHE: dict[tuple[str, bool], "SegmentStore"] = {}


def _index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    key = sf_dir
    if key not in _INDEX_CACHE:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        _INDEX_CACHE[key] = InvertedIndex(docs).cache()
    return _INDEX_CACHE[key]


def _store(spark: SparkSession, sf_dir: str, compacted: bool = False):
    """Persistent compressed segment index for sf_dir (built under /tmp once
    per session); compacted=True additionally runs the log-structured merge
    to a single segment — so the driver gate also covers the on-disk codec,
    merge, and block-max WAND paths (SURVEY §2b/2c + north-star format)."""
    import hashlib
    import tempfile

    from clucene_spark.index.merge import optimize
    from clucene_spark.index.segments import SegmentStore, build_segments

    key = (sf_dir, compacted)
    if key not in _STORE_CACHE:
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        d = f"{tempfile.gettempdir()}/clucene_idx_{tag}_{'c' if compacted else 'p'}"
        try:
            _STORE_CACHE[key] = SegmentStore(spark, d)
        except FileNotFoundError:
            idx = _index(spark, sf_dir)
            build_segments(idx.tokens, idx.doc_lens, d, docs_per_segment=256)
            if compacted:
                optimize(spark, d)
            _STORE_CACHE[key] = SegmentStore(spark, d)
    return _STORE_CACHE[key]


def _searcher(spark: SparkSession, sf_dir: str, similarity: str = "bm25") -> Searcher:
    key = (sf_dir, similarity)
    if key not in _SEARCHER_CACHE:
        _SEARCHER_CACHE[key] = Searcher(_index(spark, sf_dir), similarity=similarity)
    return _SEARCHER_CACHE[key]


# ---------------------------------------------------------------------------
# entry: flagship query (smoke check at sf0.001)
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ranked free-text OR query, BM25 top-10 over documents."""
    s = _searcher(spark, "/root/testdata/sf0.001")
    q = (
        BooleanQuery()
        .add(TermQuery(term="spark"), SHOULD)
        .add(TermQuery(term="vector"), SHOULD)
        .add(TermQuery(term="window"), SHOULD)
    )
    return s.topk(q, k=10, round_to=4)


# ---------------------------------------------------------------------------
# SQL oracle prelude (DuckDB dialect) — same index pipeline in pure SQL
# ---------------------------------------------------------------------------

_PRELUDE = """
WITH tokens AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
tok AS (SELECT * FROM tokens WHERE term <> ''),
postings AS (
  SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id
),
doc_lens AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
),
term_dict AS (
  SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
  FROM postings GROUP BY term
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM doc_lens
),
bm25 AS (
  SELECT p.doc_id, p.term,
         ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS sc,
         t.df, p.tf, d.dl, s.n_docs, s.avgdl
  FROM postings p
  JOIN term_dict t USING (term)
  JOIN doc_lens d USING (doc_id)
  CROSS JOIN stats s
)
"""


def _bm25_topk_sql(terms: list[str], k: int = 10) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return (
        _PRELUDE
        + f"""
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term IN ({tl})
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

# Gate-window ordering (round 5). The external driver oracle-checks only the
# FIRST 50 entries of queries(); round 2 prepended 14 search gates and silently
# pushed the whole dedup/ANN/text/multimodal family out of the checked window
# (VERDICT r02 "What's wrong #1"). Rotation policy since round 5 (amended per
# VERDICT r04 "What's wrong #3" — 145 registered queries exceed the 2x50 slots
# a two-round invariant needs): every registered query must be driver-green
# within the last THREE rounds, with window priority
#   never-driver-checked  >  code-changed-since-last-row  >  stalest.
# Round 4 went 50/50 green on the new-r4 + r2-stale-complement window; the r5
# window is therefore exactly the 49 gates that have FULL oracles but have
# never had a driver row (the r4-late WARC/robots/links/BM25F/MLT/fsck/DSIR/
# line-span-URL-dedup/span-boolean/paging/collapse/suggest families), plus
# wand_or_topk (the one r4 wall-time regression — re-pinned so the driver
# re-certifies rank-identity while BENCH_r05 re-measures the timing). The 95
# demoted gates are all driver-green in r3 or r4 with unchanged code; every
# demotion is re-verified locally each round by `python tools/check_oracle.py`
# (which checks ALL registered queries regardless of window membership).
_GATE_WINDOW: tuple = (
    # --- never driver-checked: full oracles, zero driver rows (r4-late) ---
    "explain_bool_topk",        # BooleanWeight::explain, queryNorm + coord
    "explain_phrase",           # PhraseWeight::explain components
    "multimodal_jpeg_stats",    # baseline JPEG codec round-trip
    "shard_assign",             # deterministic shard export assignment
    "embed_quantize_int8",      # int8 embedding quantization
    "ann_cosine_int8_topk",     # int8 packed ANN top-k
    "batch_term_topk",          # batched multi-query term top-k
    "corpus_shuffle",           # deterministic corpus shuffle
    "span_boolean_topk",        # SpanScoreQuery inside BooleanQuery
    "span_fielded_topk",        # fielded SpanScoreQuery (last refused form)
    "decontaminate_fraction",   # per-doc contamination fraction
    "dedup_url",                # URL canonicalization + latest-capture dedup
    "dedup_url_hinted",         # rel=canonical declared-target dedup
    "web_domain_stats",         # docs-per-domain rollup
    "dedup_lines",              # CCNet-style corpus line dedup + rewrite
    "dedup_spans",              # ExactSubstr span rewrite (Lee et al.)
    "sample_mixture",           # fractional-epoch mixture resampling
    "sample_domain_cap",        # per-domain corpus-mix cap
    "sample_dsir",              # DSIR importance resampling (Xie et al.)
    "term_page2_topk",          # cursor deep-paging (search-after)
    "index_fsck_stats",         # CheckIndex-style integrity audit
    "bm25f_topk",               # BM25F weighted-field ranking
    "mlt_topk",                 # MoreLikeThis find-similar
    "text_ppl_buckets",         # CCNet perplexity buckets
    "dedup_cluster_best",       # quality-preferring cluster survivor
    "suggest_term",             # did-you-mean spell suggest
    "collapse_topk",            # field collapsing (one best hit per source)
    "stream_url_dedup",         # stateful streaming URL dedup
    "web_extract_text",         # distributed HTML->text extraction
    "text_normalize",           # NFC + control/NBSP/CRLF normalization
    "pipeline_ingest_crawl",    # robots->blocklist->boilerplate->URL-dedup
    "pipeline_ingest_webtext",  # extract->normalize->dedup->quality cascade
    "web_anchor_text",          # anchor-text field aggregation
    "web_pagerank",             # PageRank w/ dangling-mass redistribution
    "warc_roundtrip",           # WARC reader (gzip/plain record cutter)
    "wet_records",              # WET conversion-record path
    "warc_index_stats",         # full crawl->index composition
    "robots_filter",            # RFC 9309 robots.txt evaluation
    "warc_charset",             # BOM/HTTP/meta charset-aware decode
    "sitemap_gap",              # sitemap vs crawl freshness gap
    "stream_warc_stats",        # continuous crawl indexing stream
    "wand_anchor_field_topk",   # BM25 WAND over the anchor field
    "static_rank_topk",         # BM25 x PageRank static-rank blend
    "crawl_supersede",          # re-crawl supersedence (latest capture wins)
    "web_main_content",         # jusText-style boilerplate removal
    "crawl_fetch_plan",         # politeness fetch planning (Crawl-delay)
    "web_redirects",            # redirect resolution via pointer doubling
    "url_blocklist",            # suffix-semantics domain blocklist
    "time_travel_stats",        # commit-generation time travel
    # --- r4 wall-time regression re-pin (r4-green; BENCH re-measures) ---
    "wand_or_topk",
    # --- demoted to out-of-window this round: every r4-window gate (all 50
    # driver-green in CORRECTNESS_r04) and the r3-green unchanged set — each
    # is within the three-round staleness contract and is re-verified locally
    # via tools/check_oracle.py; see GATES.md for the full per-gate ledger.
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        # --- leaf + boolean query algebra (SURVEY §2d) ---
        "term_topk_bm25": lambda spark, sf: _searcher(spark, sf).topk(
            TermQuery(term="spark"), 10, round_to=4
        ),
        "term_topk_classic": lambda spark, sf: _searcher(spark, sf, "classic").topk(
            TermQuery(term="spark"), 10, round_to=4
        ),
        "bool_and_topk": lambda spark, sf: _searcher(spark, sf).topk(
            BooleanQuery()
            .add(TermQuery(term="spark"), MUST)
            .add(TermQuery(term="join"), MUST),
            10,
            round_to=4,
        ),
        "bool_or_topk": lambda spark, sf: _searcher(spark, sf).topk(
            BooleanQuery()
            .add(TermQuery(term="spark"), SHOULD)
            .add(TermQuery(term="vector"), SHOULD)
            .add(TermQuery(term="window"), SHOULD),
            10,
            round_to=4,
        ),
        "bool_not_topk": lambda spark, sf: _searcher(spark, sf).topk(
            BooleanQuery()
            .add(TermQuery(term="spark"), MUST)
            .add(TermQuery(term="vector"), MUST_NOT),
            10,
            round_to=4,
        ),
        "bool_minshould_topk": lambda spark, sf: _searcher(spark, sf).topk(
            BooleanQuery(
                min_should_match=2,
            )
            .add(TermQuery(term="spark"), SHOULD)
            .add(TermQuery(term="join"), SHOULD)
            .add(TermQuery(term="vector"), SHOULD),
            10,
            round_to=4,
        ),
        "phrase_exact_topk": lambda spark, sf: _searcher(spark, sf).topk(
            PhraseQuery(terms=["batch", "batch"]), 10, round_to=4
        ),
        "prefix_topk": lambda spark, sf: _searcher(spark, sf).topk(
            PrefixQuery(prefix="s"), 10, round_to=4
        ),
        "wildcard_topk": lambda spark, sf: _searcher(spark, sf).topk(
            WildcardQuery(pattern="s?a*"), 10, round_to=4
        ),
        "fuzzy_topk": lambda spark, sf: _searcher(spark, sf).topk(
            FuzzyQuery(term="spark", min_similarity=0.7), 10, round_to=4
        ),
        "fuzzy_prefix_topk": lambda spark, sf: _searcher(spark, sf).topk(
            FuzzyQuery(term="spark", min_similarity=0.5, prefix_length=2),
            10, round_to=4,
        ),
        "range_topk": lambda spark, sf: _searcher(spark, sf).topk(
            RangeQuery(lower="sm", upper="st", inclusive=True), 10, round_to=4
        ),
        "multi_phrase_topk": lambda spark, sf: _searcher(spark, sf).topk(
            __import__("clucene_spark.search.engine", fromlist=["MultiPhraseQuery"])
            .MultiPhraseQuery(slots=[["key", "hash"], ["value"]]),
            10,
            round_to=4,
        ),
        # MultiPhraseQuery with slop: the SloppyPhraseScorer walk over the
        # per-slot unions (MultiPhraseQuery.cpp:99-105)
        "multi_phrase_sloppy_topk": lambda spark, sf: _searcher(spark, sf).topk(
            __import__("clucene_spark.search.engine", fromlist=["MultiPhraseQuery"])
            .MultiPhraseQuery(slots=[["key", "hash"], ["value"]], slop=2),
            10,
            round_to=4,
        ),
        # PARTIALLY-overlapping slots (r4): doc-dependent repeat detection
        # per the reference's one-time checkedRepeats — the two gates pin
        # both outcomes (clean first doc / colliding first doc)
        "multi_phrase_overlap_topk": _q_mp_overlap,
        "multi_phrase_overlap_repeat_topk": _q_mp_overlap_repeat,
        "explain_term": lambda spark, sf: _searcher(spark, sf)
        .explain(TermQuery(term="spark"))
        .select(
            "doc_id", "tf", "dl",
            F.round("idf", 4).alias("idf"),
            F.round("tf_norm", 4).alias("tf_norm"),
            F.round("score", 4).alias("score"),
        )
        .orderBy("doc_id"),
        # BooleanWeight::explain composition: per-doc clause sums + coord
        # (components gate; the classic-coord identity is pytest-gated in
        # tests/test_search.py::test_explain_boolean_invariant)
        "explain_bool_topk": lambda spark, sf: _searcher(spark, sf)
        .explain_boolean(
            BooleanQuery()
            .add(TermQuery(term="spark"), MUST)
            .add(TermQuery(term="vector"), SHOULD)
        )
        .select(
            "doc_id",
            F.round("must_sum", 4).alias("must_sum"),
            F.round("should_sum", 4).alias("should_sum"),
            "overlap", "max_overlap",
            F.round("coord", 4).alias("coord"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10),
        # PhraseWeight::explain (PhraseQuery.cpp:379-460): Σidf over the
        # phrase terms × tf(phraseFreq) × boost, component columns; the
        # TestExplanations product==score invariant is pytest-gated in
        # tests/test_search.py (new r4 late -> enters the window r5)
        "explain_phrase": lambda spark, sf: _searcher(spark, sf)
        .explain_phrase(PhraseQuery(terms=["batch", "batch"]))
        .select(
            "doc_id",
            F.col("pfreq").cast("long").alias("pfreq"),
            "dl",
            F.round("idf", 4).alias("idf"),
            F.round("tf_norm", 4).alias("tf_norm"),
            F.round("score", 4).alias("score"),
        )
        .orderBy("doc_id"),
        "explain_term_classic": lambda spark, sf: _searcher(spark, sf, "classic")
        .explain(TermQuery(term="spark"))
        .select(
            "doc_id", "tf", "dl",
            F.round("weight", 4).alias("weight"),
            F.round("tf_sqrt", 4).alias("tf_sqrt"),
            F.round("length_norm", 4).alias("length_norm"),
            F.round("score", 4).alias("score"),
        )
        .orderBy("doc_id"),
        "phrase_sloppy_topk": lambda spark, sf: _searcher(spark, sf).topk(
            PhraseQuery(terms=["key", "value"], slop=2), 10, round_to=4
        ),
        "phrase_sloppy3_topk": lambda spark, sf: _searcher(spark, sf).topk(
            PhraseQuery(terms=["key", "value", "table"], slop=4), 10, round_to=4
        ),
        # repeated query term — exercises the PhrasePositions repeat
        # handling (SloppyPhraseScorer.cpp:72-171)
        "phrase_sloppy_repeat_topk": lambda spark, sf: _searcher(spark, sf).topk(
            PhraseQuery(terms=["batch", "batch"], slop=1), 10, round_to=4
        ),
        "boosted_or_topk": lambda spark, sf: _searcher(spark, sf).topk(
            BooleanQuery()
            .add(TermQuery(term="spark", boost=2.0), SHOULD)
            .add(TermQuery(term="join"), SHOULD),
            10,
            round_to=4,
        ),
        "matchall_topk": lambda spark, sf: _searcher(spark, sf).topk(
            MatchAllQuery(), 10, round_to=4
        ),
        "constant_score_filter": lambda spark, sf: _searcher(spark, sf).topk(
            ConstantScoreQuery(boost=2.5, predicate=F.col("source") == "src3"),
            10,
            round_to=4,
        ),
        "filtered_term_topk": lambda spark, sf: _searcher(spark, sf).topk(
            FilteredQuery(
                query=TermQuery(term="spark"),
                predicate=(F.col("n_chars") >= 100) & (F.col("n_chars") <= 300),
            ),
            10,
            round_to=4,
        ),
        # ChainedFilter XOR of a QueryFilter (docs matching 'join') and a
        # column RangeFilter — the bitset ops of ChainedFilter.h:50-57
        "chained_filter_topk": lambda spark, sf: _searcher(spark, sf).topk(
            FilteredQuery(
                query=TermQuery(term="spark"),
                predicate=__import__(
                    "clucene_spark.search.engine", fromlist=["ChainedFilter"]
                ).ChainedFilter(
                    filters=[
                        __import__(
                            "clucene_spark.search.engine",
                            fromlist=["QueryFilter"],
                        ).QueryFilter(TermQuery(term="join")),
                        F.col("n_chars") >= 300,
                    ],
                    ops=["XOR"],
                ),
            ),
            10,
            round_to=4,
        ),
        "sort_by_field": lambda spark, sf: _searcher(spark, sf).topk_sorted(
            TermQuery(term="spark"), "n_chars", ascending=False, k=10
        ),
        # multi-key Sort (reference TestSort testSortCombos/testMultiSort):
        # stored field ASC, then relevance as a sort component
        # (SortField::FIELD_SCORE), then the doc-order tail
        "sort_multi_topk": lambda spark, sf: _searcher(spark, sf).topk_sorted(
            TermQuery(term="spark"), k=10,
            sort_fields=[("lang", True), ("score", False)],
        ),
        "numeric_range_encoded": _q_numeric_range_encoded,
        "span_near_topk": _q_span_near,
        "span_first_topk": _q_span_first,
        "span_or_topk": _q_span_or,
        "span_not_topk": _q_span_not,
        "wand_fielded_topk": _q_wand_fielded,
        "wand_phrase_topk": lambda spark, sf: __import__(
            "clucene_spark.search.wand", fromlist=["phrase_query_direct"]
        ).phrase_query_direct(_store(spark, sf), ["batch", "batch"], k=10),
        "wand_sloppy_phrase_topk": lambda spark, sf: __import__(
            "clucene_spark.search.wand", fromlist=["phrase_query_direct"]
        ).phrase_query_direct(_store(spark, sf), ["key", "value"], k=10, slop=2),
        "lang_dispatch_topk": _q_lang_dispatch,
        "stream_ingest_topk": _q_stream_ingest,
        # --- query parser path (SURVEY §3b: parse -> AST -> plan) ---
        "parsed_and_topk": lambda spark, sf: _searcher(spark, sf).topk(
            _parse("spark AND join"), 10, round_to=4
        ),
        "parsed_nested_topk": lambda spark, sf: _searcher(spark, sf).topk(
            _parse("window OR (spark AND join)"), 10, round_to=4
        ),
        "parsed_sloppy_phrase_topk": lambda spark, sf: _searcher(spark, sf).topk(
            _parse('"key value"~2'), 10, round_to=4
        ),
        "parsed_boost_topk": lambda spark, sf: _searcher(spark, sf).topk(
            _parse("spark^2 OR join"), 10, round_to=4
        ),
        "parsed_range_topk": lambda spark, sf: _searcher(spark, sf).topk(
            _parse("[sm TO st]"), 10, round_to=4
        ),
        "parsed_fielded_topk": lambda spark, sf: _searcher(spark, sf).topk(
            _parse("source:src3 AND spark", keyword_fields={"source", "lang"}),
            10, round_to=4,
        ),
        # explicit range on a declared keyword field -> ConstantScore
        # column-range predicate (was silently match-nothing, ADVICE r02)
        "parsed_keyword_range_topk": lambda spark, sf: _searcher(spark, sf).topk(
            _parse("source:[src1 TO src3] AND spark",
                   keyword_fields={"source", "lang"}),
            10, round_to=4,
        ),
        # MultiFieldQueryParser: one string parsed per field, OR-combined
        # with per-field boosts (MultiFieldQueryParser.cpp:40-76)
        "parsed_multifield_topk": _q_multifield_parsed,
        # --- multi-field index: Term=(field,text), per-field tf/idf/norms
        #     (reference index/Term.cpp, FieldInfos.cpp) ---
        "fielded_tf_topk": _q_fielded_tf,
        "parsed_fielded_tf_topk": _q_fielded_parsed,
        # r4 late: fielded SpanScoreQuery (the engine's last refused query
        # form) — enters the r5 window
        "span_fielded_topk": _q_span_fielded,
        # --- DateTools-encoded date range through the parser's date
        #     detection (QueryParser.cpp:428-489, DateTools.h:30-49) ---
        "date_range_topk": _q_date_range,
        # --- contrib highlighter: best fragment + markup over a result page ---
        "highlight_fragments": _q_highlight,
        # --- StandardAnalyzer DFA driving an oracle-gated index ---
        "term_topk_bm25_std": _q_term_topk_std,
        "phrase_topk_std": _q_phrase_topk_std,
        # --- SnowballAnalyzer(french) end-to-end ---
        "snowball_fr_topk": _q_snowball_fr,
        "term_dict_utf16": _q_term_dict_utf16,
        "range_utf16_topk": _q_range_utf16,
        # --- persistent segment store + block-max WAND (SURVEY §2b/2c/2d,
        #     north-star: varbyte segments, LSM merge, BMW top-k) ---
        # serving path default: wand_query_direct (shuffle-free fan-out;
        # rank-identical to wand_query, tested)
        "wand_or_topk": lambda spark, sf: __import__(
            "clucene_spark.search.wand", fromlist=["wand_query_direct"]
        ).wand_query_direct(_store(spark, sf), ["spark", "vector", "window"], k=10),
        "wand_and_topk": lambda spark, sf: __import__(
            "clucene_spark.search.wand", fromlist=["wand_query_direct"]
        ).wand_query_direct(_store(spark, sf), ["spark", "join"], k=10, mode="AND"),
        "wand_merged_topk": lambda spark, sf: __import__(
            "clucene_spark.search.wand", fromlist=["wand_query_direct"]
        ).wand_query_direct(_store(spark, sf, compacted=True), ["spark", "vector", "window"], k=10),
        "wand_delete_topk": _q_wand_delete,
        # --- index-build aggregations (SURVEY §2b: term dict, norms) ---
        "term_dict": lambda spark, sf: _index(spark, sf).term_dict.orderBy("term"),
        "term_dict_salted": lambda spark, sf: __import__(
            "clucene_spark.index.build", fromlist=["salted_term_dict"]
        ).salted_term_dict(_index(spark, sf).tokens, n_salts=16).orderBy("term"),
        "doc_lens": lambda spark, sf: _index(spark, sf).doc_lens.orderBy("doc_id"),
        "corpus_stats": lambda spark, sf: _index(spark, sf).doc_lens.agg(
            F.count("*").alias("n_docs"), F.round(F.avg("dl"), 4).alias("avgdl")
        ),
        "top_df_terms": lambda spark, sf: _index(spark, sf)
        .term_dict.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(10),
        # --- training-data pipeline: dedup family ---
        "dedup_exact": _q_dedup_exact,
        "dedup_chunk": _q_dedup_chunk,
        "dedup_window_stats": _q_window_dedup,
        # r4 late: webtext URL-level dedup + domain rollup + line dedup —
        # enter the r5 window
        "dedup_url": _q_url_dedup,
        "web_domain_stats": _q_domain_stats,
        "sample_domain_cap": _q_domain_cap,
        "web_extract_text": _q_extract_text,
        "text_normalize": _q_text_normalize,
        "pipeline_ingest_webtext": _q_ingest_webtext,
        "stream_url_dedup": _q_stream_url_dedup,
        "dedup_lines": _q_line_dedup,
        # r4 late: ExactSubstr rewrite (span-level cut with owner rule) —
        # enters the r5 window
        "dedup_spans": _q_span_dedup,
        # r4 late: link-graph family (anchor-text field + PageRank static
        # rank) — enter the r5 window
        "web_anchor_text": _q_anchor_text,
        "web_pagerank": _q_pagerank,
        # r4 late: WARC/WET source readers (Common Crawl's on-disk format)
        "warc_roundtrip": _q_warc_roundtrip,
        "wet_records": _q_wet_records,
        "warc_index_stats": _q_warc_index_stats,
        "robots_filter": _q_robots_filter,
        "warc_charset": _q_warc_charset,
        "sitemap_gap": _q_sitemap_gap,
        "stream_warc_stats": _q_stream_warc_stats,
        "wand_anchor_field_topk": _q_wand_anchor_field,
        "static_rank_topk": _q_static_rank,
        "crawl_supersede": _q_crawl_supersede,
        "web_main_content": _q_main_content,
        "dedup_url_hinted": _q_url_dedup_hinted,
        "crawl_fetch_plan": _q_fetch_plan,
        "web_redirects": _q_redirects,
        "url_blocklist": _q_blocklist,
        "time_travel_stats": _q_time_travel,
        "pipeline_ingest_crawl": _q_ingest_crawl,
        "pipeline_decontaminate": _q_decontaminate,
        "decontaminate_fraction": _q_decontaminate_frac,
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_cluster_canonical": _q_dedup_cluster,
        # r4 late: quality-preferring cluster survivor — enters the r5 window
        "dedup_cluster_best": _q_cluster_best,
        "pipeline_clean_corpus": _q_clean_corpus,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding_cosine": _q_dedup_embedding,
        # --- similarity search ---
        "ann_cosine_topk": _q_ann_brute,
        "ann_cosine_topk_pandas": _q_ann_pandas,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_ivf_stored_topk": _q_ann_ivf_stored,
        "ann_ivf_trained_topk": _q_ann_ivf_trained,
        "ann_ivfpq_topk": _q_ann_ivfpq,
        # --- multimodal plumbing (decode stubbed; schema/batching real) ---
        "multimodal_features": _q_mm_features,
        "multimodal_frame_sample": _q_mm_frames,
        # --- text analysis ---
        "text_lang_id": _q_lang_id,
        "text_quality": _q_quality,
        "text_token_counts": _q_token_counts,
        "text_fingerprint": _q_fingerprint,
        "text_repetition": _q_repetition,
        "sample_stratified": _q_sample_stratified,
        "sample_stratum_cap": _q_sample_cap,
        # r4 late: domain-mixture resampling with fractional epochs —
        # enters the r5 window
        "sample_mixture": _q_sample_mixture,
        # r4 late: cursor deep-paging (search-after) — enters the r5 window
        "term_page2_topk": _q_term_page2,
        # r4 late: did-you-mean spell suggest from the term dictionary —
        # enters the r5 window
        "suggest_term": _q_suggest,
        # r4 late: field collapsing (one hit per source) — enters the r5
        # window
        "collapse_topk": _q_collapse,
        # r4 late: CCNet perplexity bucketing — enters the r5 window
        "text_ppl_buckets": _q_ppl_buckets,
        "text_pii_redact": _q_pii,
        "pack_sequences": _q_pack_sequences,
        "shard_assign": _q_shard_assign,
        "corpus_shuffle": _q_corpus_shuffle,
        "embed_quantize_int8": _q_quantize_int8,
        "ann_cosine_int8_topk": _q_ann_int8,
        "batch_term_topk": _q_batch_topk,
        # r4 late: span clauses inside BooleanQuery (SpanScoreQuery) with
        # two-pass queryNorm + coord — enters the r5 window
        "span_boolean_topk": _q_span_boolean,
        "stream_dedup_state": _q_stream_dedup,
        "stream_window_stats": _q_stream_window,
        "multimodal_wav_stats": _q_wav_stats,
        "multimodal_png_stats": _q_png_stats,
        "multimodal_jpeg_stats": _q_jpeg_stats,
        "text_lm_score": _q_lm_score,
        "sample_dsir": _q_sample_dsir,
        "index_fsck_stats": _q_index_fsck,
        "bm25f_topk": _q_bm25f,
        "mlt_topk": _q_mlt,
    }
    ordered = {k: q[k] for k in _GATE_WINDOW}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered


# ---------------------------------------------------------------------------
# training-data pipeline queries (SURVEY §2 extension set: dedup / ANN /
# text analysis over the documents + embeddings tables)
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/documents.parquet")


def _vecs(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _q_numeric_range_encoded(spark, sf):
    """Range search over the NumberTools sortable encoding: the STRING
    range [enc(100), enc(300)] must select exactly the docs with
    100 <= n_chars <= 300 (order-preservation is the whole point of the
    encoding; the oracle checks the numeric semantics directly)."""
    from clucene_spark.document.tools import long_to_string, long_to_string_col

    docs = _docs(spark, sf).withColumn(
        "enc", long_to_string_col(F.col("n_chars"))
    )
    lo, hi = long_to_string(100), long_to_string(300)
    return (
        docs.filter((F.col("enc") >= lo) & (F.col("enc") <= hi))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


_SPAN_CACHE: dict[str, object] = {}


def _span_searcher(spark, sf):
    from clucene_spark.search.spans import SpanSearcher

    if sf not in _SPAN_CACHE:
        _SPAN_CACHE[sf] = SpanSearcher(_index(spark, sf))
    return _SPAN_CACHE[sf]


def _q_span_near(spark, sf):
    from clucene_spark.search.spans import SpanNear, SpanTerm

    q = SpanNear([SpanTerm("key"), SpanTerm("value")], slop=3, in_order=True)
    return _span_searcher(spark, sf).topk(q, 10, round_to=4)


def _q_span_first(spark, sf):
    from clucene_spark.search.spans import SpanFirst, SpanTerm

    return _span_searcher(spark, sf).topk(
        SpanFirst(SpanTerm("spark"), end=10), 10, round_to=4
    )


def _q_span_or(spark, sf):
    from clucene_spark.search.spans import SpanOr, SpanTerm

    q = SpanOr([SpanTerm("key"), SpanTerm("vector")])
    return _span_searcher(spark, sf).topk(q, 10, round_to=4)


def _q_span_not(spark, sf):
    """key-spans NOT inside a 'key value' bigram (SpanNotQuery model)."""
    from clucene_spark.search.spans import SpanNear, SpanNot, SpanTerm

    q = SpanNot(
        include=SpanTerm("key"),
        exclude=SpanNear([SpanTerm("key"), SpanTerm("value")], slop=0,
                         in_order=True),
    )
    return _span_searcher(spark, sf).topk(q, 10, round_to=4)


def _q_span_boolean(spark, sf):
    """Span clauses composed into a BooleanQuery (the reference's
    SpanQuery-extends-Query contract, spans/SpanQuery.h; golden semantics
    pinned by TestSpansAdvanced.cpp:71-93): classic similarity with
    two-pass queryNorm over both span leaves (SpanWeight::
    sumOfSquaredWeights, spans/SpanWeight.cpp:49-53) and coord.
    MUST near(key,value,slop3) + SHOULD span(spark)."""
    from clucene_spark.search.engine import SpanScoreQuery
    from clucene_spark.search.spans import SpanNear, SpanTerm

    s = _searcher(spark, sf, similarity="classic")
    q = (
        BooleanQuery()
        .add(SpanScoreQuery(span=SpanNear([SpanTerm("key"), SpanTerm("value")],
                                          slop=3, in_order=True)), MUST)
        .add(SpanScoreQuery(span=SpanTerm("spark")), SHOULD)
    )
    return s.topk(q, 10, round_to=4)


def _q_wand_fielded(spark, sf):
    """Fielded WAND over the composite-key segment store: title-field BM25
    with per-field avgdl + global n_docs."""
    import hashlib
    import tempfile

    from clucene_spark.index.segments import SegmentStore, build_segments_fused
    from clucene_spark.search.wand import wand_query_direct

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    d = f"{tempfile.gettempdir()}/clucene_idx_{tag}_fielded"
    try:
        store = SegmentStore(spark, d)
    except FileNotFoundError:
        docs = _docs(spark, sf)
        toks = F.split(F.col("text"), " ")
        two = docs.select(
            "doc_id",
            F.array_join(F.slice(toks, 1, 4), " ").alias("title"),
            "text",
        )
        build_segments_fused(
            two, d, docs_per_segment=256,
            fields=[("text", "text", "whitespace"),
                    ("title", "title", "whitespace")],
        )
        store = SegmentStore(spark, d)
    return wand_query_direct(store, ["join"], k=10, field="title")


def _q_wand_delete(spark, sf):
    """deleteDocuments filtering through the WAND path: a dedicated store
    with docs 10/20/30 deleted; stats keep counting them until purge
    (Lucene docFreq model), so the oracle only filters candidates."""
    import hashlib
    import tempfile

    from clucene_spark.index.segments import (
        SegmentStore,
        build_segments_fused,
        delete_docs,
    )
    from clucene_spark.search.wand import wand_query_direct

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    d = f"{tempfile.gettempdir()}/clucene_idx_{tag}_del"
    try:
        store = SegmentStore(spark, d)
    except FileNotFoundError:
        build_segments_fused(
            _docs(spark, sf).select("doc_id", "text"), d,
            docs_per_segment=256, analyzer="whitespace",
        )
        store = SegmentStore(spark, d)
    delete_docs(d, [10, 20, 30])  # idempotent (set union)
    store = SegmentStore(spark, d)
    return wand_query_direct(store, ["spark", "vector", "window"], k=10)


_DATE_CACHE: dict[str, tuple] = {}


def _date_index(spark, sf):
    """Index over orders where each doc's single term is the DateTools
    day-encoded o_orderdate (document/tools.py date_to_string_col) — the
    encoded-term range-search model of the reference's date handling."""
    if sf not in _DATE_CACHE:
        from clucene_spark.document.tools import date_to_string_col

        orders = spark.read.parquet(f"{sf}/orders.parquet")
        docs = orders.select(
            F.col("o_orderkey").alias("doc_id"),
            date_to_string_col(F.col("o_orderdate"), "day").alias("text"),
        )
        idx = InvertedIndex(docs).cache()
        _DATE_CACHE[sf] = (idx, Searcher(idx, similarity="bm25"))
    return _DATE_CACHE[sf]


def _q_date_range(spark, sf):
    """Parsed date range: QueryParser date detection encodes the ISO bounds
    with DateTools at the field's resolution (QueryParser.cpp:428-489),
    producing a term-range query over the encoded dictionary."""
    _, s = _date_index(spark, sf)
    q = _parse("[1996-03-01 TO 1996-06-30]", date_fields={"text": "day"})
    return s.topk(q, 10, round_to=4)


_STD_CACHE: dict[str, tuple] = {}


def _std_searcher(spark, sf):
    """StandardAnalyzer-built index (the DFA chain, not the whitespace fast
    path). On this clean lowercase corpus the DFA's output equals
    split-minus-stopwords, which the DuckDB oracle replays exactly — the
    gate that pins the analyzer actually driving an oracle-checked index."""
    if sf not in _STD_CACHE:
        idx = InvertedIndex(_docs(spark, sf), analyzer="standard").cache()
        _STD_CACHE[sf] = (idx, Searcher(idx, similarity="bm25"))
    return _STD_CACHE[sf]


def _q_term_topk_std(spark, sf):
    _, s = _std_searcher(spark, sf)
    return s.topk(TermQuery(term="spark"), 10, round_to=4)


def _q_phrase_topk_std(spark, sf):
    from clucene_spark.search.engine import PhraseQuery as _PQ

    _, s = _std_searcher(spark, sf)
    return s.topk(_PQ(terms=["key", "value"]), 10, round_to=4)


_FIELDED_CACHE: dict[str, tuple] = {}


def _fielded_index(spark, sf):
    """Two-field corpus (title = first 4 tokens, text = full body) indexed
    with the multi-field model: postings/doc_lens/term_dict keyed by field,
    per-field analyzer dispatch in InvertedIndex(fields=...)."""
    if sf not in _FIELDED_CACHE:
        docs = _docs(spark, sf)
        toks = F.split(F.col("text"), " ")
        two = docs.select(
            "doc_id",
            F.array_join(F.slice(toks, 1, 4), " ").alias("title"),
            "text",
        )
        idx = InvertedIndex(
            two,
            fields=[("text", "text", "whitespace"), ("title", "title", "whitespace")],
        ).cache()
        _FIELDED_CACHE[sf] = (idx, Searcher(idx, similarity="bm25"))
    return _FIELDED_CACHE[sf]


def _q_fielded_tf(spark, sf):
    from clucene_spark.search.engine import SHOULD, BooleanQuery, TermQuery

    _, s = _fielded_index(spark, sf)
    q = (
        BooleanQuery()
        .add(TermQuery(term="join", field="title"), SHOULD)
        .add(TermQuery(term="spark", field="text"), SHOULD)
    )
    return s.topk(q, 10, round_to=4)


def _q_fielded_parsed(spark, sf):
    _, s = _fielded_index(spark, sf)
    q = _parse("title:join OR spark", indexed_fields={"title", "text"})
    return s.topk(q, 10, round_to=4)


_SNOWBALL_FR_VOCAB = (
    "continuations majestueusement nationalité indulgences évidemment "
    "finalement heureuse royaux châteaux traditionnelle questionnons "
    "propositions immobilière logiquement archéologie confusion solutions "
    "créateur activités vraiment"
).split()
# stems via the reference-verified french stemmer (goldens in
# tests/test_snowball_langs.py run the reference C for these words); the
# oracle embeds them as constants, so the gate proves the full Spark
# tokenize->stem->index->BM25 pipeline against an independently-stemmed
# DuckDB replay
_SNOWBALL_FR_STEMS = (
    "continu majestu national indulgent évident final heureux royal "
    "château traditionnel questionnon proposit immobili logiqu archéolog "
    "confus solut créateur activ vrai"
).split()


def _q_snowball_fr(spark, sf):
    """SnowballAnalyzer(french) end-to-end: a deterministic French corpus
    derived from the documents table (12 vocab words per doc selected by
    (doc_id*7+i) mod 20), indexed through StandardTokenizer->LowerCase->
    FrenchStemmer, BM25 top-10 for the stem of 'nationalité'."""
    docs = _docs(spark, sf).select("doc_id")
    vocab_arr = F.array(*[F.lit(v) for v in _SNOWBALL_FR_VOCAB])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda i: F.element_at(
                vocab_arr, ((F.col("doc_id") * 7 + i) % 20 + 1).cast("int")
            ),
        ),
    )
    corpus = docs.select("doc_id", text.alias("text"))
    idx = InvertedIndex(corpus, analyzer="snowball:french")
    return Searcher(idx, similarity="bm25").topk(
        TermQuery(term="national"), 10, round_to=4
    )


# UTF-16 term-order gates: vocab straddling every divergent region —
# supplementary plane (U+1D54A, U+1F600, U+10FFFF) vs U+E000..U+FFFF
# (private-use, ligature FB00, fullwidth FF21, replacement FFFD). The
# reference's Term order is UTF-16 code units (index/TermInfosWriter.cpp:
# 108-140); code-point engines (Spark/DuckDB/Python) sort supplementary
# ABOVE U+E000.., so these gates fail unless the index applies the
# utf16.py order key on the divergent region.
_U16_VOCAB = [
    "apple", "a\U0001f600", "a", "aﬀ", "a�", "ab",
    "zeta", "m\U0010ffff", "中文", "Ａz", "\U0001d54ax", "box",
]


def _u16_corpus(spark, sf):
    """Deterministic 5-token docs over _U16_VOCAB, replayed 1:1 in SQL."""
    docs = _docs(spark, sf).select("doc_id")
    vocab_arr = F.array(*[F.lit(v) for v in _U16_VOCAB])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda i: F.element_at(
                vocab_arr, ((F.col("doc_id") * 5 + i * 3) % 12 + 1).cast("int")
            ),
        ),
    )
    return docs.select("doc_id", text.alias("text"))


def _q_term_dict_utf16(spark, sf):
    """Term dictionary enumerated in the reference's UTF-16 code-unit
    order (TermInfosWriter.cpp:108-140 / Term.cpp compareTo): rank over
    encode(term,'UTF-16BE') — binary comparison is unsigned lexicographic
    == code-unit order. The planted vocab makes this order provably
    different from Spark's native code-point string order."""
    from pyspark.sql import Window

    from clucene_spark.index.utf16 import spark_utf16_key

    idx = InvertedIndex(_u16_corpus(spark, sf), analyzer="whitespace")
    w = Window.orderBy(spark_utf16_key(F.col("term")))
    return (
        idx.term_dict.withColumn("rank", F.row_number().over(w))
        .select("rank", "term", "df")
        .orderBy("rank")
    )


def _q_range_utf16(spark, sf):
    """RangeQuery whose bounds reach the divergent region: [a\U0001f600 TO
    aﬀ] — empty under code-point comparison (0x1F600 > 0xFB00) but
    matching the supplementary and private-use terms under UTF-16 units
    (lead surrogate 0xD83D < 0xE000 < 0xFB00). Exercises the conditional
    encoded-key comparison in Searcher._expand_terms."""
    idx = InvertedIndex(_u16_corpus(spark, sf), analyzer="whitespace")
    return Searcher(idx, similarity="bm25").topk(
        RangeQuery(lower="a\U0001f600", upper="aﬀ", inclusive=True),
        10,
        round_to=4,
    )


def _q_multifield_parsed(spark, sf):
    """MultiFieldQueryParser over the two-field index: 'spark join' parsed
    once per field, SHOULD-combined, title boosted 2x (reference
    queryParser/MultiFieldQueryParser.cpp:40-76)."""
    from clucene_spark.queryparser.parser import MultiFieldQueryParser

    _, s = _fielded_index(spark, sf)
    q = MultiFieldQueryParser(["title", "text"], boosts={"title": 2.0}).parse(
        "spark join"
    )
    return s.topk(q, 10, round_to=4)


def _q_span_fielded(spark, sf):
    """SpanScoreQuery compiled inside the 'title' field of the two-field
    index (SpanQuery::getField contract, spans/SpanQuery.h): unordered
    near(value, table, slop=2) scored BM25 with title-field dl/avgdl/df
    and global n_docs — the fielded form the r3 engine still refused."""
    from clucene_spark.search.engine import SpanScoreQuery
    from clucene_spark.search.spans import SpanNear, SpanTerm

    _, s = _fielded_index(spark, sf)
    q = SpanScoreQuery(
        span=SpanNear([SpanTerm("value"), SpanTerm("table")], slop=2,
                      in_order=False),
        field="title",
    )
    return s.topk(q, 10, round_to=4)


_SPAN_FIELDED_SQL = """
WITH raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ttok AS (
  SELECT doc_id, i - 1 AS pos, term FROM (
    SELECT doc_id, unnest(toks[1:4]) AS term,
           unnest(generate_series(1, len(toks[1:4]))) AS i
    FROM raw)
  WHERE term <> ''),
-- title fields are <= 4 tokens and carry each term at most once, so the
-- unordered NearSpans iterator reduces exactly to this single-pair form
-- (one configuration, slack = max-min-1 <= 2 <=> abs diff <= 3)
sp AS (SELECT DISTINCT a.doc_id, least(a.pos, b.pos) AS s,
              greatest(a.pos, b.pos) + 1 AS e
       FROM ttok a JOIN ttok b ON a.doc_id = b.doc_id
       WHERE a.term = 'value' AND b.term = 'table'
         AND abs(a.pos - b.pos) <= 3),
pf AS (SELECT doc_id, SUM(1.0 / (e - s + 1.0)) AS pfreq FROM sp GROUP BY doc_id),
dl_t AS (SELECT doc_id, count(*) AS dl FROM ttok GROUP BY doc_id),
st AS (SELECT avg(dl) AS avgdl FROM dl_t),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
td AS (SELECT term, count(DISTINCT doc_id) AS df FROM ttok
       WHERE term IN ('value', 'table') GROUP BY term),
idf AS (SELECT SUM(ln(1.0 + (n.n_docs - t.df + 0.5) / (t.df + 0.5))) AS idf_sum
        FROM td t CROSS JOIN nd n)
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pfreq * 2.2)
             / (p.pfreq + 1.2 * (0.25 + 0.75 * d.dl / s2.avgdl)), 4) AS score
FROM pf p JOIN dl_t d USING (doc_id)
CROSS JOIN idf i CROSS JOIN st s2
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


_HL_TERMS = ["spark", "join"]
_HL_FSIZE = 80


def _q_highlight(spark, sf):
    """Highlighter gate (contrib highlighter/Highlighter.cpp +
    SimpleFragmenter + QueryScorer + SimpleHTMLFormatter): best-fragment
    extraction with <b>term</b> markup over the BM25 top-10 page for
    {spark OR join}. Whitespace analyzer so the oracle can replay the
    token offsets; fragment walk = SimpleFragmenter's greedy char-budget
    split; n_matches = QueryScorer fragment score (Σ tf of query terms,
    weight 1)."""
    from clucene_spark.search.highlight import highlight

    s = _searcher(spark, sf)
    q = (
        BooleanQuery()
        .add(TermQuery(term=_HL_TERMS[0]), SHOULD)
        .add(TermQuery(term=_HL_TERMS[1]), SHOULD)
    )
    # round_to=4 like every topk gate: the oracle ranks the page by
    # ROUND(score,4) with doc_id tiebreak, so an unrounded Spark page
    # could flip membership on a 4-decimal tie
    page = s.topk(q, 10, round_to=4).select("doc_id")
    docs = _docs(spark, sf).join(page, "doc_id")
    return highlight(
        docs, _HL_TERMS, fragment_size=_HL_FSIZE, analyzer="whitespace"
    )


def _highlight_sql(terms: list[str], k: int = 10, fsize: int = 80) -> str:
    """DuckDB replay of the highlighter: same BM25 page, whitespace tokens
    with character offsets via a prefix sum, the greedy fragmenter as a
    recursive-CTE state machine (frag breaks when a token's end exceeds
    frag_start + fsize), best fragment by (score DESC, frag_id ASC), and
    the <b> markup rebuilt from substr pieces folded in token order."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return (
        _PRELUDE.replace("WITH tokens", "WITH RECURSIVE tokens")
        + f"""
, page AS (
  SELECT doc_id FROM (
    SELECT doc_id, ROUND(SUM(sc), 4) AS score
    FROM bm25 WHERE term IN ({tl})
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT {k}
  )
),
rawtok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS ri
  FROM documents WHERE doc_id IN (SELECT doc_id FROM page)
),
offs AS (
  SELECT doc_id, term, ri,
         CAST(SUM(length(term) + 1) OVER (
             PARTITION BY doc_id ORDER BY ri
         ) - length(term) - 1 AS INT) AS s
  FROM rawtok
),
wtok AS (
  SELECT doc_id, term, s, s + length(term) AS e,
         row_number() OVER (PARTITION BY doc_id ORDER BY ri) AS rn
  FROM offs WHERE term <> ''
),
walk(doc_id, rn, frag_id, frag_start) AS (
  SELECT doc_id, rn, 0, s FROM wtok WHERE rn = 1
  UNION ALL
  SELECT t.doc_id, t.rn,
         CASE WHEN t.e - w.frag_start > {fsize}
              THEN w.frag_id + 1 ELSE w.frag_id END,
         CASE WHEN t.e - w.frag_start > {fsize}
              THEN t.s ELSE w.frag_start END
  FROM walk w JOIN wtok t ON t.doc_id = w.doc_id AND t.rn = w.rn + 1
),
ftok AS (
  SELECT t.doc_id, t.term, t.s, t.e, t.rn, w.frag_id
  FROM wtok t JOIN walk w ON t.doc_id = w.doc_id AND t.rn = w.rn
),
fscore AS (
  SELECT doc_id, frag_id,
         SUM(CASE WHEN term IN ({tl}) THEN 1.0 ELSE 0.0 END) AS score
  FROM ftok GROUP BY doc_id, frag_id
),
best AS (
  SELECT doc_id, frag_id, score,
         row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, frag_id ASC
         ) AS rk
  FROM fscore
),
bft AS (
  SELECT f.doc_id, f.term, f.s, f.e, f.rn, b.score,
         MIN(f.s) OVER (PARTITION BY f.doc_id) AS lo,
         LAG(f.e, 1) OVER (PARTITION BY f.doc_id ORDER BY f.rn) AS prev_e
  FROM ftok f
  JOIN best b ON f.doc_id = b.doc_id AND f.frag_id = b.frag_id AND b.rk = 1
),
pieces AS (
  SELECT bft.doc_id, bft.rn, bft.score,
         substr(d.text, COALESCE(bft.prev_e, bft.lo) + 1,
                bft.s - COALESCE(bft.prev_e, bft.lo))
         || CASE WHEN bft.term IN ({tl})
                 THEN '<b>' || substr(d.text, bft.s + 1, bft.e - bft.s)
                      || '</b>'
                 ELSE substr(d.text, bft.s + 1, bft.e - bft.s) END AS piece
  FROM bft JOIN documents d USING (doc_id)
)
SELECT doc_id,
       string_agg(piece, '' ORDER BY rn) AS fragment,
       CAST(any_value(score) AS DOUBLE) AS n_matches
FROM pieces GROUP BY doc_id
"""
    )


def _q_clean_corpus(spark, sf):
    """End-to-end curation pass over docs + planted exact twins (+1M ids)
    + planted truncated twins (+2M ids): quality gate -> exact dedup ->
    LSH near-dup removal, every doc labeled with its fate."""
    from clucene_spark.pipeline.clean import clean_corpus

    docs = _docs(spark, sf).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    trunc = F.array_join(
        F.slice(
            toks, 1,
            F.greatest(F.lit(1), F.floor(F.size(toks) * 0.8)).cast("int"),
        ),
        " ",
    )
    exact = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), trunc.alias("text")
    )
    corpus = docs.unionByName(exact).unionByName(near)
    # min_quality 0.05 ~ the corpus's 25th percentile: all four fates occur
    return clean_corpus(
        corpus, min_quality=0.05, bands=32, min_shingles=1
    ).orderBy("doc_id")


def _q_window_dedup(spark, sf):
    """Exact-substring (sliding 16-token-window) duplication stats over
    docs + planted partial copies: doc_id%10==0 docs get a twin (+1M id)
    carrying their first 21 tokens, so the twin's windows all collide
    with the source's prefix windows at stride-1 alignments — the
    passage-copy shape chunk-level dedup misses."""
    from clucene_spark.pipeline.dedup import window_dedup_stats

    docs = _docs(spark, sf).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    plant = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, 21), " ").alias("text"),
    )
    return window_dedup_stats(docs.unionByName(plant), w=16)


_WINDOW_DEDUP_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:21], ' ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
eligible AS (SELECT doc_id, t, len(t) AS n FROM tk WHERE len(t) >= 16),
idx AS (
  SELECT doc_id, t, unnest(generate_series(1, n - 15)) AS i FROM eligible
),
wins AS (
  SELECT doc_id,
         ('0x' || substr(md5(array_to_string(t[i:i+15], ' ')), 1, 15))::BIGINT AS h
  FROM idx
),
per_dh AS (SELECT doc_id, h, count(*) AS c FROM wins GROUP BY doc_id, h),
per_h AS (SELECT h, (min(doc_id) < max(doc_id)) AS is_dup FROM per_dh GROUP BY h)
SELECT d.doc_id,
       CAST(SUM(d.c) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN p.is_dup THEN d.c ELSE 0 END) AS BIGINT)
         AS n_dup_windows,
       ROUND(CAST(SUM(CASE WHEN p.is_dup THEN d.c ELSE 0 END) AS DOUBLE)
             / SUM(d.c), 4) AS dup_frac
FROM per_dh d JOIN per_h p USING (h)
GROUP BY d.doc_id
"""


def _q_dedup_exact(spark, sf):
    from clucene_spark.pipeline.dedup import exact_dedup, with_planted_dups

    corpus = with_planted_dups(_docs(spark, sf), every=10, keep_frac=1.0)
    return exact_dedup(corpus).select(
        "keep_id", "n_copies", F.element_at("doc_ids", -1).alias("max_id")
    ).orderBy("keep_id")


def _q_dedup_chunk(spark, sf):
    """Chunk-level (paragraph) exact dedup over docs + planted truncated
    twins: identical 10-token windows across docs (boilerplate model)."""
    from clucene_spark.pipeline.dedup import chunk_dedup, with_planted_dups

    corpus = with_planted_dups(_docs(spark, sf), every=10, keep_frac=0.8)
    return chunk_dedup(corpus, chunk_tokens=10).orderBy("chunk_hash")


def _url_pages(spark, sf):
    """Synthetic crawl-URL table derived deterministically from doc_id:
    every URL-noise axis the canonicalizer handles — scheme (http vs
    https), www., explicit default port, trailing slash, fragment,
    tracking params, param order — over page keys (doc_id%7 host,
    doc_id%25 path), so ~3 raw URLs collapse per canonical page. Capture
    ts = (doc_id*211) % 1009 — non-monotonic in doc_id and unique below
    1009 docs, so latest-wins picks a non-trivial survivor."""
    d = F.col("doc_id")
    return _docs(spark, sf).select(
        "doc_id",
        ((d * 211) % 1009).alias("ts"),
        F.concat(
            F.when(d % 3 == 0, F.lit("http://")).otherwise(F.lit("https://")),
            F.when(d % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.concat_ws("", F.lit("site"), (d % 7).cast("string"),
                        F.lit(".example")),
            F.when(d % 11 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/p/"),
            (d % 25).cast("string"),
            F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(d % 4 == 0, F.lit("?utm_source=feed&b=2&a=1"))
            .when(d % 4 == 1, F.lit("?b=2&a=1"))
            .when(d % 4 == 2, F.lit("?a=1&b=2&gclid=XYZ"))
            .otherwise(F.lit("")),
            F.when(d % 13 == 0, F.lit("#sec2")).otherwise(F.lit("")),
        ).alias("url"),
    )


def _q_url_dedup(spark, sf):
    """URL-level dedup: canonicalize crawl URLs (scheme/www/port/slash/
    fragment/tracking-param/param-order noise) and keep the latest
    capture per canonical page — the first pass of every Common-Crawl
    pipeline (BASELINE input is keyed (url, warc_ts))."""
    from clucene_spark.pipeline.urls import url_dedup

    return url_dedup(_url_pages(spark, sf), ts_col="ts").orderBy("canon_url")


def _q_domain_stats(spark, sf):
    """Docs-per-domain rollup over the same synthetic crawl URLs — the
    stratification input for per-domain caps over webtext."""
    from clucene_spark.pipeline.urls import domain_stats

    return domain_stats(_url_pages(spark, sf)).orderBy("domain")


# shared URL-noise construction for the url_dedup / web_domain_stats
# oracles (mirrors _url_pages exactly)
_URL_PAGES_SQL = """
WITH pages AS (
  SELECT doc_id, (doc_id * 211) % 1009 AS ts,
    (CASE WHEN doc_id % 3 = 0 THEN 'http://' ELSE 'https://' END)
    || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
    || 'site' || (doc_id % 7) || '.example'
    || (CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END)
    || '/p/' || (doc_id % 25)
    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
    || (CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&b=2&a=1'
         WHEN 1 THEN '?b=2&a=1'
         WHEN 2 THEN '?a=1&b=2&gclid=XYZ' ELSE '' END)
    || (CASE WHEN doc_id % 13 = 0 THEN '#sec2' ELSE '' END) AS url
  FROM documents
)
"""

_URL_DEDUP_SQL = _URL_PAGES_SQL + """
, c0 AS (SELECT doc_id, ts,
           regexp_replace(regexp_replace(url, '#.*$', ''),
                          '^[Hh][Tt][Tt][Pp][Ss]?://', '') AS u
         FROM pages),
c1 AS (SELECT doc_id, ts,
         regexp_replace(regexp_replace(
           lower(regexp_extract(u, '^([^/?]+)', 1)), '^www\\.', ''),
           ':(80|443)$', '') AS host,
         regexp_replace(u, '^[^/?]+', '') AS rest
       FROM c0),
c2 AS (SELECT doc_id, ts, host,
         regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
         CASE WHEN contains(rest, '?')
              THEN regexp_extract(rest, '\\?(.*)$', 1) ELSE '' END AS q
       FROM c1),
c3 AS (SELECT doc_id, ts, host, path,
         array_to_string(list_sort(list_filter(string_split(q, '&'),
           p -> p <> '' AND NOT (starts_with(p, 'utm_')
             OR starts_with(p, 'gclid=') OR starts_with(p, 'fbclid=')
             OR starts_with(p, 'msclkid=') OR starts_with(p, 'ref=')))),
           '&') AS qc
       FROM c2),
canon AS (SELECT doc_id, ts,
            host || path
            || (CASE WHEN qc <> '' THEN '?' || qc ELSE '' END) AS canon_url
          FROM c3),
ranked AS (SELECT canon_url, doc_id,
             row_number() OVER (PARTITION BY canon_url
                                ORDER BY ts DESC, doc_id DESC) AS rn,
             count(*) OVER (PARTITION BY canon_url) AS n_copies
           FROM canon)
SELECT canon_url, n_copies, doc_id AS keep_doc
FROM ranked WHERE rn = 1 AND n_copies > 1
ORDER BY canon_url
"""

_DOMAIN_STATS_SQL = _URL_PAGES_SQL + """
, d AS (SELECT doc_id,
          regexp_replace(regexp_replace(
            lower(regexp_extract(
              regexp_replace(url, '^[Hh][Tt][Tt][Pp][Ss]?://', ''),
              '^([^/?#]+)', 1)), '^www\\.', ''), ':[0-9]+$', '') AS domain
        FROM pages)
SELECT domain, count(*) AS n_docs,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM d GROUP BY domain ORDER BY domain
"""


def _q_extract_text(spark, sf):
    """Distributed HTML->text extraction (the webtext ingest front door):
    build a full page around each doc's text — a head title and a script
    block that must NOT leak (outside body / stripped), a nav div whose
    visible text legitimately stays (boilerplate removal is line_dedup's
    job downstream), the body split across TWO <p> blocks, entities
    escaped (incl. a planted 'AT&T 5>4' segment) — then extract with the
    Arrow-batched UDF. The oracle states what extraction must recover;
    any tag leak, entity mistake, or whitespace drift breaks the hash."""
    from clucene_spark.pipeline.extract import extract_text_col

    docs = _docs(spark, sf).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    half = (F.size(toks) / 2).cast("int")
    p1 = F.array_join(F.slice(toks, 1, half), " ")
    p2 = F.concat(
        F.array_join(F.slice(toks, half + 1, F.size(toks) - half), " "),
        F.lit(" brand AT&T cmp 5>4"),
    )
    esc = lambda c: F.regexp_replace(  # noqa: E731 — & first, then < >
        F.regexp_replace(F.regexp_replace(c, "&", "&amp;"), "<", "&lt;"),
        ">", "&gt;",
    )
    html = F.concat(
        F.lit("<html><head><title>LEAKMARK title</title>"
              "<script>var LEAKMARK=1;</script></head>"
              "<body><div class=\"nav\">LEAKMARK nav</div><p>"),
        esc(p1),
        F.lit("</p>\n<p>"),
        esc(p2),
        F.lit("</p></body></html>"),
    )
    pages = docs.select("doc_id", html.alias("html"))
    return pages.select(
        "doc_id", extract_text_col(F.col("html")).alias("extracted")
    ).orderBy("doc_id")


_EXTRACT_TEXT_SQL = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
SELECT doc_id,
       'LEAKMARK nav' || chr(10)
       || array_to_string(t[1 : len(t) // 2], ' ') || chr(10)
       || array_to_string(t[len(t) // 2 + 1 : len(t)], ' ')
       || ' brand AT&T cmp 5>4' AS extracted
FROM base ORDER BY doc_id
"""


def _q_text_normalize(spark, sf):
    """Unicode/whitespace normalization over deterministically dirtied
    docs: NBSP, a combining acute (NFC must compose it), a control char,
    space runs, a tab, CRLF, edge whitespace. The oracle re-implements
    the 7-step spec independently in DuckDB (nfc_normalize + RE2) — two
    independent implementations of the spec must agree byte-for-byte."""
    from clucene_spark.pipeline.extract import normalize_text_col

    docs = _docs(spark, sf).select("doc_id", "text")
    dirty = F.concat(
        F.lit("A\u00a0e\u0301\u0001  x\t\r\n "),
        F.col("text"),
        F.lit("  "),
    )
    return docs.select(
        "doc_id", normalize_text_col(dirty).alias("clean")
    ).orderBy("doc_id")


_TEXT_NORMALIZE_SQL = r"""
WITH dirty AS (SELECT doc_id,
    'A' || chr(160) || 'e' || chr(769) || chr(1) || '  x' || chr(9)
    || chr(13) || chr(10) || ' ' || text || '  ' AS t
  FROM documents),
n1 AS (SELECT doc_id, nfc_normalize(t) AS t FROM dirty),
n2 AS (SELECT doc_id,
         regexp_replace(t, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS t
       FROM n1),
n3 AS (SELECT doc_id, replace(t, chr(160), ' ') AS t FROM n2),
n4 AS (SELECT doc_id, regexp_replace(t, '\r\n?', chr(10), 'g') AS t FROM n3),
n5 AS (SELECT doc_id, regexp_replace(t, '[ \t]+', ' ', 'g') AS t FROM n4),
n6 AS (SELECT doc_id, regexp_replace(t, ' ?\n ?', chr(10), 'g') AS t FROM n5)
SELECT doc_id,
       regexp_replace(t, '^[ \n]+|[ \n]+$', '', 'g') AS clean
FROM n6 ORDER BY doc_id
"""


def _q_anchor_text(spark, sf):
    """Link-graph anchor-text aggregation (the extra searchable field a
    web index attaches to each page): build a deterministic page per doc
    — anchor 1 relative href with an entity-escaped query (&amp; must
    unescape before URL resolution) and a nested <b> tag in the anchor
    body, anchor 2 absolute with www./:80/trailing-slash/utm_ noise the
    canonicalizer must strip, a self-link that the aggregator must drop,
    and a javascript: href the extractor must skip — then run the full
    extract_links -> anchor_text_agg path. The oracle states the
    expected link set directly from the construction formula and
    re-aggregates it in SQL."""
    from clucene_spark.pipeline.links import anchor_text_agg, extract_links

    docs = _docs(spark, sf).select("doc_id")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = F.concat(
        F.lit("https://site"), s(d % 7), F.lit(".example/p/"), s(d)
    )
    html = F.concat(
        F.lit('<p>intro <a href="/p/'), s((d * 3 + 1) % 97),
        F.lit('?b=2&amp;a=1"><b>Top</b> pick '), s(d % 5),
        F.lit("</a> mid <a href='http://www.site"), s((d + 1) % 7),
        F.lit(".example:80/p/"), s((d * 5 + 2) % 97),
        F.lit("/?utm_source=feed'>read &amp; More</a>"),
        F.lit(' <a href="/p/'), s(d), F.lit('">self</a>'),
        F.lit(' <a href="javascript:void(0)">js</a></p>'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return (
        anchor_text_agg(extract_links(pages))
        .select("dst", "n_inlinks", "n_src_domains", "anchor_terms")
        .orderBy("dst")
    )


_ANCHOR_TEXT_SQL = """
WITH docs AS (SELECT doc_id AS d FROM documents),
l1 AS (SELECT
    'site' || (d % 7) || '.example/p/' || d AS src,
    'site' || (d % 7) || '.example' AS src_domain,
    'site' || (d % 7) || '.example/p/' || ((d*3+1) % 97) || '?a=1&b=2' AS dst,
    'top pick ' || (d % 5) AS anchor
  FROM docs),
l2 AS (SELECT
    'site' || (d % 7) || '.example/p/' || d AS src,
    'site' || (d % 7) || '.example' AS src_domain,
    'site' || ((d+1) % 7) || '.example/p/' || ((d*5+2) % 97) AS dst,
    'read & more' AS anchor
  FROM docs),
links AS (SELECT * FROM l1 UNION ALL SELECT * FROM l2),
terms AS (SELECT dst, src, src_domain,
          unnest(string_split(anchor, ' ')) AS term FROM links)
SELECT dst, count(DISTINCT src) AS n_inlinks,
       count(DISTINCT src_domain) AS n_src_domains,
       array_to_string(list_sort(list(DISTINCT term)), ' ') AS anchor_terms
FROM terms GROUP BY dst ORDER BY dst
"""


def _q_pagerank(spark, sf):
    """Fixed-iteration PageRank (3 rounds, d=0.85) over a deterministic
    link graph derived from doc_ids: docs with doc_id % 4 != 0 each emit
    two edges into the low-97 node range, so the % 4 == 0 nodes under 97
    are pure sinks — the dangling-mass redistribution path is exercised,
    as are duplicate-edge collapse and self-loop drop. The oracle
    unrolls the identical power iteration in SQL (3 CTE rounds with a
    scalar dangling aggregate per round)."""
    from clucene_spark.pipeline.links import pagerank

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    srcs = _docs(spark, sf).select("doc_id").where(d % 4 != 0)
    e1 = srcs.select(
        F.concat(F.lit("u"), s(d)).alias("src"),
        F.concat(F.lit("u"), s((d * 3 + 1) % 97)).alias("dst"),
    )
    e2 = srcs.select(
        F.concat(F.lit("u"), s(d)).alias("src"),
        F.concat(F.lit("u"), s((d * 5 + 2) % 97)).alias("dst"),
    )
    pr = pagerank(e1.unionAll(e2), iters=3, damping=0.85)
    return pr.select("url", F.round("rank", 6).alias("rank")).orderBy("url")


_PAGERANK_SQL = """
WITH srcs AS (SELECT doc_id AS d FROM documents WHERE doc_id % 4 <> 0),
raw_edges AS (
  SELECT 'u' || d AS src, 'u' || ((d*3+1) % 97) AS dst FROM srcs
  UNION ALL
  SELECT 'u' || d, 'u' || ((d*5+2) % 97) FROM srcs),
edges AS (SELECT DISTINCT src, dst FROM raw_edges WHERE src <> dst),
nodes AS (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
outd AS (SELECT src, count(*)::DOUBLE AS od FROM edges GROUP BY src),
r0 AS (SELECT url, 1.0/(SELECT n FROM nn) AS rank FROM nodes),
d0 AS (SELECT coalesce(sum(r.rank), 0) AS dmass FROM r0 r
       LEFT JOIN outd o ON r.url = o.src WHERE o.src IS NULL),
c0 AS (SELECT e.dst AS url, sum(r.rank / o.od) AS inflow
       FROM r0 r JOIN outd o ON r.url = o.src
       JOIN edges e ON e.src = r.url GROUP BY e.dst),
r1 AS (SELECT n.url, 0.15/(SELECT n FROM nn)
         + 0.85*(coalesce(c.inflow, 0)
                 + (SELECT dmass FROM d0)/(SELECT n FROM nn)) AS rank
       FROM nodes n LEFT JOIN c0 c ON n.url = c.url),
d1 AS (SELECT coalesce(sum(r.rank), 0) AS dmass FROM r1 r
       LEFT JOIN outd o ON r.url = o.src WHERE o.src IS NULL),
c1 AS (SELECT e.dst AS url, sum(r.rank / o.od) AS inflow
       FROM r1 r JOIN outd o ON r.url = o.src
       JOIN edges e ON e.src = r.url GROUP BY e.dst),
r2 AS (SELECT n.url, 0.15/(SELECT n FROM nn)
         + 0.85*(coalesce(c.inflow, 0)
                 + (SELECT dmass FROM d1)/(SELECT n FROM nn)) AS rank
       FROM nodes n LEFT JOIN c1 c ON n.url = c.url),
d2 AS (SELECT coalesce(sum(r.rank), 0) AS dmass FROM r2 r
       LEFT JOIN outd o ON r.url = o.src WHERE o.src IS NULL),
c2 AS (SELECT e.dst AS url, sum(r.rank / o.od) AS inflow
       FROM r2 r JOIN outd o ON r.url = o.src
       JOIN edges e ON e.src = r.url GROUP BY e.dst),
r3 AS (SELECT n.url, 0.15/(SELECT n FROM nn)
         + 0.85*(coalesce(c.inflow, 0)
                 + (SELECT dmass FROM d2)/(SELECT n FROM nn)) AS rank
       FROM nodes n LEFT JOIN c2 c ON n.url = c.url)
SELECT url, round(rank, 6) AS rank FROM r3 ORDER BY url
"""


def _q_warc_roundtrip(spark, sf):
    """WARC source reader end-to-end (`data/warc.py`, ISO 28500 / the
    Common-Crawl *.warc.gz convention): per doc, serialize a genuine
    3-record WARC blob — warcinfo, then an HTTP 'response' record whose
    body is the doc's text wrapped in minimal HTML, then a metadata
    record — per-record-gzipped for even doc_ids and uncompressed for odd
    (both decode paths in one gate), and parse it back through the
    streaming record cutter + HTTP splitter. The oracle restates every
    output column from the construction formula: a single corrupted byte
    in framing, Content-Length accounting, gzip membering, or the HTTP
    split shifts n_bytes/text_out for some doc."""
    import datetime as dt

    import pandas as pd

    from clucene_spark.data import warc as W
    from clucene_spark.data.webtext import _escape

    docs = _docs(spark, sf).select("doc_id", "text")

    def _mk(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                html = (
                    "<html><body><p>" + _escape(text) + "</p></body></html>"
                ).encode("utf-8")
                url = f"https://warc{did % 13}.example/item/{did}"
                ts = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=did * 7)
                recs = [
                    W._warcinfo(did),
                    W.build_record(
                        "response",
                        W.http_response(
                            html,
                            status=200 + did % 3,
                            reason="OK",
                            extra=[("X-Crawl-Shard", str(did % 5))],
                        ),
                        url=url,
                        date=ts,
                        record_id=f"doc-{did}",
                        content_type="application/http; msgtype=response",
                    ),
                    W.build_record("metadata", b"fetch: ok", url=url),
                ]
                wrap = W.gzip_member if did % 2 == 0 else (lambda x: x)
                ids.append(did)
                blobs.append(b"".join(wrap(r) for r in recs))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "warc": blobs})

    blobs = docs.mapInPandas(_mk, "doc_id long, warc binary")
    parsed = W.records_from_col(blobs, "warc")

    # inverse of the builder's wrap+escape, pure Catalyst (the wrappers
    # are fixed ASCII: 15 chars of <html><body><p>, 18 of the closer);
    # entity order matters — &amp; must unescape LAST
    s = F.col("html").cast("string")
    inner = F.substring(s, F.lit(16), F.length(s) - 33)
    text_out = F.replace(
        F.replace(
            F.replace(inner, F.lit("&gt;"), F.lit(">")),
            F.lit("&lt;"), F.lit("<"),
        ),
        F.lit("&amp;"), F.lit("&"),
    )

    return parsed.select(
        "doc_id", "url", "warc_date",
        F.col("http_status").cast("int").alias("http_status"),
        "content_type",
        F.octet_length("html").cast("long").alias("n_bytes"),
        text_out.alias("text_out"),
    ).orderBy("doc_id")


_WARC_ROUNDTRIP_SQL = """
SELECT doc_id,
  'https://warc' || (doc_id % 13) || '.example/item/' || doc_id AS url,
  strftime(TIMESTAMP '2024-01-01' + to_seconds(doc_id * 7),
           '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
  (200 + doc_id % 3)::INT AS http_status,
  'text/html; charset=UTF-8' AS content_type,
  strlen('<html><body><p>'
         || replace(replace(replace(text, '&', '&amp;'),
                            '<', '&lt;'), '>', '&gt;')
         || '</p></body></html>')::BIGINT AS n_bytes,
  text AS text_out
FROM documents ORDER BY doc_id
"""


def _q_wet_records(spark, sf):
    """WET sidecar path (`data/warc.py`): 'conversion' records carry the
    already-extracted plain text with no HTTP envelope — the OTHER record
    shape the scan must handle. Per doc, build warcinfo + conversion
    (gzip members), parse with the type filter, and emit the text plus
    its byte length straight from the record payload."""
    import datetime as dt

    import pandas as pd

    from clucene_spark.data import warc as W

    docs = _docs(spark, sf).select("doc_id", "text")

    def _mk(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                url = f"https://warc{did % 13}.example/item/{did}"
                ts = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=did * 7)
                blob = W.gzip_member(W._warcinfo(did)) + W.gzip_member(
                    W.build_record(
                        "conversion",
                        text.encode("utf-8"),
                        url=url,
                        date=ts,
                        record_id=f"wet-{did}",
                        content_type="text/plain",
                    )
                )
                ids.append(did)
                blobs.append(blob)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "warc": blobs})

    blobs = docs.mapInPandas(_mk, "doc_id long, warc binary")
    parsed = W.records_from_col(blobs, "warc", warc_types=("conversion",))
    return parsed.select(
        "doc_id", "url", "warc_type", "content_type",
        F.octet_length("html").cast("long").alias("n_bytes"),
        F.col("html").cast("string").alias("text_out"),
    ).orderBy("doc_id")


_WET_RECORDS_SQL = """
SELECT doc_id,
  'https://warc' || (doc_id % 13) || '.example/item/' || doc_id AS url,
  'conversion' AS warc_type,
  'text/plain' AS content_type,
  strlen(text)::BIGINT AS n_bytes,
  text AS text_out
FROM documents ORDER BY doc_id
"""


def _q_warc_index_stats(spark, sf):
    """Full crawl->index composition in one gate (`index/warc_build.py`):
    the documents table is serialized as genuine per-record-gzip WARC
    files (range-partitioned, doc-ordered, HTML-embedded pages), then
    re-ingested by the zero-shuffle direct WARC build — each file task
    opens its .warc.gz, cuts records, splits HTTP, extracts text,
    tokenizes (whitespace), inverts and writes one segment — and the
    committed index's corpus statistics are read back from the store.
    The oracle recomputes all four stats from the raw text in SQL; a
    divergence ANYWHERE in the write -> gzip -> parse -> extract ->
    tokenize -> invert -> commit chain shifts at least one of them."""
    import hashlib
    import os
    import tempfile

    from clucene_spark.data.warc import list_warc_paths, warc_files_from_docs
    from clucene_spark.index.segments import SegmentStore
    from clucene_spark.index.warc_build import build_segments_from_warc

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    base = f"{tempfile.gettempdir()}/clucene_warcidx_{tag}"
    idx = os.path.join(base, "index")
    try:
        store = SegmentStore(spark, idx)
    except FileNotFoundError:
        crawl = os.path.join(base, "crawl")
        warc_files_from_docs(
            _docs(spark, sf).select("doc_id", "text"), crawl, n_files=4
        ).collect()
        build_segments_from_warc(
            spark,
            list_warc_paths(crawl),
            idx,
            analyzer="whitespace",
            normalize=False,
            resume=False,
        ).collect()
        store = SegmentStore(spark, idx)
    dl = store.doc_lens().agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("n_tokens"),
    )
    pt = store.postings().agg(
        F.sum("df").cast("long").alias("n_postings"),
        F.count_distinct("term").alias("n_terms"),
    )
    return dl.crossJoin(pt)


def _q_wand_anchor_field(spark, sf):
    """Anchor text as a SEARCHABLE INDEX FIELD — the classic web-index
    composition (navigational queries rank on what other pages call you,
    not your own body): formula-built inbound links (every doc anchors
    to target (doc_id*3+1)%97 with text mixing target- and source-
    derived words) aggregate per target into a sorted-distinct anchor
    term string, which is indexed as a second field next to the body in
    the composite-key segment store; BM25 OR-mode WAND then queries the
    anchor field alone. The oracle rebuilds the anchor field relationally
    and replays the fielded BM25 (per-field avgdl/df, global n_docs) in
    SQL."""
    import hashlib
    import tempfile

    from clucene_spark.index.segments import SegmentStore, build_segments_fused
    from clucene_spark.search.wand import wand_query_direct

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    d = f"{tempfile.gettempdir()}/clucene_idx_{tag}_anchor"
    try:
        store = SegmentStore(spark, d)
    except FileNotFoundError:
        docs = _docs(spark, sf).select("doc_id", "text")
        did = F.col("doc_id")
        dst = (did * 3 + 1) % 97
        links = docs.select(
            dst.alias("dst"),
            F.concat(
                F.lit("click doc "), (dst % 5).cast("string"),
                F.lit(" best "), (did % 7).cast("string"),
            ).alias("anchor_text"),
        )
        agg = (
            links.select(
                "dst", F.explode(F.split("anchor_text", " ")).alias("t")
            )
            .groupBy("dst")
            .agg(
                F.array_join(F.array_sort(F.collect_set("t")), " ").alias(
                    "anchor"
                )
            )
        )
        two = docs.join(agg, docs["doc_id"] == agg["dst"], "left").select(
            "doc_id", "text", F.coalesce("anchor", F.lit("")).alias("anchor")
        )
        build_segments_fused(
            two, d, docs_per_segment=256,
            fields=[("text", "text", "whitespace"),
                    ("anchor", "anchor", "whitespace")],
        )
        store = SegmentStore(spark, d)
    return wand_query_direct(store, ["click", "3"], k=10, field="anchor")


_ANCHOR_FIELD_SQL = """
WITH links AS (
  SELECT ((doc_id * 3 + 1) % 97) AS dst,
         'click doc ' || (((doc_id * 3 + 1) % 97) % 5)
           || ' best ' || (doc_id % 7) AS anchor
  FROM documents),
aterms AS (
  SELECT DISTINCT dst AS doc_id, unnest(string_split(anchor, ' ')) AS term
  FROM links),
btoks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
tok AS (
  SELECT doc_id, 'anchor' AS field, term FROM aterms
  UNION ALL
  SELECT doc_id, 'text' AS field, term FROM btoks),
postings AS (SELECT field, term, doc_id, count(*) AS tf
             FROM tok GROUP BY 1, 2, 3),
doc_lens AS (SELECT doc_id, field, count(*) AS dl FROM tok GROUP BY 1, 2),
fstats AS (SELECT field, avg(dl) AS avgdl FROM doc_lens GROUP BY field),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM doc_lens),
term_dict AS (SELECT field, term, count(*) AS df FROM postings GROUP BY 1, 2)
SELECT p.doc_id,
       ROUND(SUM(ln(1.0 + (n.n_docs - t.df + 0.5) / (t.df + 0.5))
             * (p.tf * 2.2)
             / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))), 4) AS score
FROM postings p
JOIN term_dict t ON t.field = p.field AND t.term = p.term
JOIN doc_lens d ON d.doc_id = p.doc_id AND d.field = p.field
JOIN fstats s ON s.field = p.field
CROSS JOIN nd n
WHERE p.field = 'anchor' AND p.term IN ('click', '3')
GROUP BY p.doc_id
ORDER BY score DESC, p.doc_id ASC LIMIT 10
"""


def _q_main_content(spark, sf):
    """Boilerplate removal (`pipeline/extract.py extract_main_text_py`,
    the jusText/readability-style block classifier): per doc, build a
    page whose body plants every boilerplate shape around the real text
    — a link-dense nav (drops on BOTH axes), the main <p> with the doc's
    text (long, link-light: kept), a >=10-word block that is 100% link
    text (drops on density alone), and a short footer (drops on length
    alone) — then extract. The oracle is exact: text_out must equal the
    raw text for every doc; ANY leaked boilerplate or lost prose breaks
    the hash."""
    from clucene_spark.pipeline.extract import extract_main_text_col

    esc = F.col("text")
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(a), F.lit(b))
    html = F.concat(
        F.lit(
            '<html><body><nav><a href="/">home</a> <a href="/a">about'
            '</a> <a href="/c">contact</a></nav><p>'
        ),
        esc,
        F.lit(
            '</p><div><a href="/t">one two three four five six seven '
            'eight nine ten eleven</a></div>'
            "<footer>copyright twenty twenty four</footer></body></html>"
        ),
    )
    return (
        _docs(spark, sf)
        .select("doc_id", html.alias("html"))
        .select(
            "doc_id", extract_main_text_col(F.col("html")).alias("text_out")
        )
        .orderBy("doc_id")
    )


_MAIN_CONTENT_SQL = """
SELECT doc_id, text AS text_out FROM documents ORDER BY doc_id
"""


def _q_ingest_crawl(spark, sf):
    """The composed crawl-admission cascade (`pipeline/clean.py
    ingest_crawl`): docs pair up on one canonical URL per (d - d%2);
    robots fully denies domains p%7 in {0,5} (Disallow: /), the
    blocklist bans site3.example (p%7==3), docs with d%13==0 serve
    boilerplate-only pages (nav+footer, no main block), and of each
    surviving pair the EARLIER capture (even d; ts grows with d) loses
    latest-wins. The oracle replays the cascade as one CASE over the
    residue formulas — any mis-ordered or leaking stage shifts some
    doc's fate."""
    from clucene_spark.pipeline.clean import ingest_crawl

    d = F.col("doc_id")
    p = d - d % 2
    s = lambda c: c.cast("string")  # noqa: E731
    boiler = (
        '<nav><a href="/">home</a> <a href="/a">about</a></nav>'
        "<footer>copyright twenty</footer>"
    )
    html = F.concat(
        F.lit("<html><body>"),
        F.lit(boiler.split("<footer>")[0]),
        F.when(
            d % 13 != 0,
            F.concat(F.lit("<p>"),
                     F.replace(
                         F.replace(
                             F.replace(F.col("text"), F.lit("&"),
                                       F.lit("&amp;")),
                             F.lit("<"), F.lit("&lt;")),
                         F.lit(">"), F.lit("&gt;")),
                     F.lit("</p>")),
        ).otherwise(F.lit("")),
        F.lit("<footer>" + boiler.split("<footer>")[1]),
        F.lit("</body></html>"),
    )
    pages = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("https://site"), s(p % 7), F.lit(".example/item/"), s(p)
        ).alias("url"),
        (F.lit("2024-01-01").cast("timestamp")
         + F.make_interval(secs=d * 7)).alias("warc_ts"),
        html.cast("binary").alias("html"),
        "text",
    )
    robots = spark.createDataFrame(
        [(f"site{k}.example",
          "User-agent: *\nDisallow: /\n" if k % 5 == 0
          else "User-agent: *\nDisallow: /never\n")
         for k in range(7)],
        "domain string, robots_txt string",
    )
    bl = spark.createDataFrame([("site3.example",)], "domain string")
    return ingest_crawl(
        pages.select("doc_id", "url", "warc_ts", "html"), robots, bl
    ).orderBy("doc_id")


_INGEST_CRAWL_SQL = """
WITH d AS (
  SELECT doc_id, text, doc_id - doc_id % 2 AS p,
         (doc_id - doc_id % 2) % 7 AS k
  FROM documents),
f AS (
  SELECT doc_id, text, p, k,
    CASE
      WHEN k IN (0, 5) THEN 'robots_denied'
      WHEN k = 3 THEN 'blocked_domain'
      WHEN doc_id % 13 = 0 THEN 'no_content'
      WHEN doc_id % 2 = 0
           AND (doc_id + 1) % 13 <> 0
           AND EXISTS (SELECT 1 FROM documents t2
                       WHERE t2.doc_id = d.doc_id + 1)
        THEN 'url_dup'
      ELSE 'kept'
    END AS fate
  FROM d)
SELECT doc_id, fate,
       CASE WHEN fate = 'kept' THEN text END AS text_out
FROM f ORDER BY doc_id
"""


def _q_time_travel(spark, sf):
    """Commit-point time travel (`index/segments.py` manifest
    generations — the reference's IndexReader-on-a-commit /
    segments_N MVCC model, Iceberg-snapshot analogue): commit #0 indexes
    only the even docs, commit #1 appends the odds; opening the store AT
    generation 0 must still see exactly the even-doc corpus while the
    latest sees everything — generations are immutable, so both reads
    run against one physical index. Oracle restates both corpus sizes
    and token totals from the parity formula."""
    import hashlib
    import os
    import tempfile

    from clucene_spark.index.segments import SegmentStore, build_segments_fused

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    d = f"{tempfile.gettempdir()}/clucene_idx_{tag}_ttravel"
    if not os.path.exists(os.path.join(d, "manifest", "segments_1.json")):
        # a crashed partial build (gen 0 committed, gen 1 missing) must
        # rebuild FROM SCRATCH: appending two more commits on top would
        # leave latest at generation 2 while the oracle pins 1
        import shutil as _sh

        _sh.rmtree(d, ignore_errors=True)
        docs = _docs(spark, sf).select("doc_id", "text")
        build_segments_fused(
            docs.where(F.col("doc_id") % 2 == 0), d,
            docs_per_segment=64, analyzer="whitespace",
        )
        build_segments_fused(
            docs, d, docs_per_segment=64, analyzer="whitespace",
        )
    past = SegmentStore(spark, d, generation=0)
    latest = SegmentStore(spark, d)
    a = past.doc_lens().agg(
        F.count("*").alias("gen0_docs"),
        F.sum("dl").cast("long").alias("gen0_tokens"),
    )
    b = latest.doc_lens().agg(
        F.count("*").alias("latest_docs"),
        F.sum("dl").cast("long").alias("latest_tokens"),
    )
    return a.crossJoin(b).select(
        "gen0_docs", "gen0_tokens", "latest_docs", "latest_tokens",
        F.lit(int(latest.manifest["generation"])).cast("long").alias(
            "latest_gen"
        ),
    )


_TIME_TRAVEL_SQL = """
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
  FROM documents)
SELECT
  (SELECT count(*) FROM toks WHERE doc_id % 2 = 0 AND n > 0)::BIGINT
      AS gen0_docs,
  (SELECT coalesce(sum(n), 0) FROM toks WHERE doc_id % 2 = 0)::BIGINT
      AS gen0_tokens,
  (SELECT count(*) FROM toks WHERE n > 0)::BIGINT AS latest_docs,
  (SELECT coalesce(sum(n), 0) FROM toks)::BIGINT AS latest_tokens,
  1::BIGINT AS latest_gen
"""


def _q_blocklist(spark, sf):
    """Domain blocklist filtering with suffix semantics
    (`pipeline/urls.py blocklist_filter`): pages live on
    sub{d%3}.host{d%50}.example; the blocklist bans host7.example (so
    EVERY subdomain of it must match via the suffix chain) and the
    single subdomain sub1.host11.example (which must NOT drag the other
    host11 subdomains). Annotated form; oracle replays the two formulas."""
    from clucene_spark.pipeline.urls import blocklist_filter

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    pages = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("https://sub"), s(d % 3), F.lit(".host"), s(d % 50),
            F.lit(".example/p/"), s(d),
        ).alias("url"),
    )
    bl = spark.createDataFrame(
        [("host7.example",), ("sub1.host11.example",)], "domain string"
    )
    return (
        blocklist_filter(pages, bl, keep_blocked=True)
        .select("doc_id", "blocked")
        .orderBy("doc_id")
    )


_BLOCKLIST_SQL = """
SELECT doc_id,
       (doc_id % 50 = 7)
       OR (doc_id % 50 = 11 AND doc_id % 3 = 1) AS blocked
FROM documents ORDER BY doc_id
"""


def _q_redirects(spark, sf):
    """HTTP redirect-chain resolution (`pipeline/links.py
    resolve_redirects`, pointer doubling in ceil(log2(max_hops))
    rounds): formula edges u(d) -> u(d-1) for d%4 != 0 form 3-hop
    chains ending at the d%4 == 0 terminals; every alias must resolve
    to its chain's end with the exact hop count and terminal=true
    (edges into absent docs can't occur by construction). Oracle states
    final/hops from the residue formula."""
    from clucene_spark.pipeline.links import resolve_redirects

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    edges = (
        _docs(spark, sf)
        .where(d % 4 != 0)
        .select(
            F.concat(F.lit("u"), s(d)).alias("src"),
            F.concat(F.lit("u"), s(d - 1)).alias("dst"),
        )
    )
    return (
        resolve_redirects(edges, max_hops=8)
        .select("src", "final", "n_hops", "terminal")
        .orderBy("src")
    )


_REDIRECTS_SQL = """
SELECT 'u' || doc_id AS src,
       'u' || (doc_id - doc_id % 4) AS final,
       (doc_id % 4)::INT AS n_hops,
       TRUE AS terminal
FROM documents WHERE doc_id % 4 <> 0 ORDER BY src
"""


def _q_fetch_plan(spark, sf):
    """Politeness fetch planning (`pipeline/robots.py fetch_plan`): per
    domain, page count x the robots Crawl-delay of the governing group
    (a decoy group declares delay 99 for a different agent; domains
    d%3==0 declare none and take the 1s default) -> the per-domain
    serial fetch time a crawl scheduler shards by. Oracle replays the
    count and delay formulas."""
    from clucene_spark.pipeline.robots import fetch_plan

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    pages = _docs(spark, sf).select(
        F.concat(
            F.lit("https://fp"), s(d % 7), F.lit(".example/p/"), s(d)
        ).alias("url")
    )
    i = F.col("id")
    doms = spark.range(7).select(
        F.concat(F.lit("fp"), s(i), F.lit(".example")).alias("domain"),
        F.concat(
            F.lit("User-agent: other\nCrawl-delay: 99\nUser-agent: *\n"),
            F.when(
                i % 3 != 0,
                F.concat(F.lit("Crawl-delay: "), s(i + 2), F.lit("\n")),
            ).otherwise(F.lit("")),
            F.lit("Disallow: /never\n"),
        ).alias("robots_txt"),
    )
    return fetch_plan(pages, doms).orderBy("domain")


_FETCH_PLAN_SQL = """
WITH c AS (
  SELECT 'fp' || (doc_id % 7) || '.example' AS domain, count(*) AS n_pages
  FROM documents GROUP BY 1),
dl AS (
  SELECT 'fp' || i || '.example' AS domain,
         CASE WHEN i % 3 <> 0 THEN (i + 2)::DOUBLE ELSE 1.0 END AS crawl_delay
  FROM range(7) t(i))
SELECT c.domain, c.n_pages, dl.crawl_delay,
       round(c.n_pages * dl.crawl_delay, 1) AS est_sec
FROM c JOIN dl USING (domain) ORDER BY c.domain
"""


def _q_url_dedup_hinted(spark, sf):
    """Canonical-hint URL dedup (`pipeline/urls.py url_dedup_hinted`):
    every doc is fetched from a syntactically UNIQUE url
    (?session={doc_id} — string canonicalization cannot collapse these),
    but docs declare `<link rel="canonical" href="/canon/{doc_id%97}">`
    (relative — must resolve against the page URL), so declared groups
    of ~n/97 docs collapse; every 5th doc declares nothing and falls
    back to its fetched url (singleton, filtered by n_copies>1). The
    oracle replays the grouping formula; keep_doc = max doc_id (ts
    increases with doc_id)."""
    from clucene_spark.pipeline.urls import url_dedup_hinted

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = F.concat(
        F.lit("https://h.example/p/"), s(d), F.lit("?session="), s(d)
    )
    html = F.concat(
        F.lit("<html><head>"),
        F.when(
            d % 5 != 0,
            F.concat(
                F.lit('<link rel="canonical" href="/canon/'),
                s(d % 97), F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head><body><p>x</p></body></html>"),
    )
    pages = _docs(spark, sf).select(
        "doc_id",
        url.alias("url"),
        html.cast("binary").alias("html"),
        (F.lit("2024-01-01").cast("timestamp")
         + F.make_interval(secs=d * 7)).alias("warc_ts"),
    )
    return url_dedup_hinted(pages).orderBy("canon_url")


_URL_DEDUP_HINTED_SQL = """
WITH e AS (
  SELECT doc_id, doc_id % 97 AS g FROM documents WHERE doc_id % 5 <> 0)
SELECT 'h.example/canon/' || g AS canon_url,
       count(*) AS n_copies,
       max(doc_id) AS keep_doc
FROM e GROUP BY g HAVING count(*) > 1 ORDER BY canon_url
"""


def _q_crawl_supersede(spark, sf):
    """Re-crawl supersedence (`index/warc_build.py supersede_recrawls`):
    write the documents table as WARC files where docs d and d+1 (even
    d) capture the SAME url — the later capture (higher warc_ts, i.e.
    the odd doc) must win — build the crawl index with URL sidecars,
    run the latest-capture-wins pass into the deletes sidecar, and
    return the LIVE docs (crawl metadata anti-joined against deletes).
    The oracle states the winners from the pairing formula."""
    import hashlib
    import os
    import tempfile

    from clucene_spark.data.warc import list_warc_paths, warc_files_from_docs
    from clucene_spark.index.segments import read_deletes
    from clucene_spark.index.warc_build import (
        build_segments_from_warc,
        crawl_urls,
        supersede_recrawls,
    )

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    base = f"{tempfile.gettempdir()}/clucene_recrawl_{tag}"
    idx = os.path.join(base, "index")
    d = F.col("doc_id")
    if not os.path.exists(os.path.join(idx, "deletes.json")):
        crawl = os.path.join(base, "crawl")
        docs = _docs(spark, sf).select(
            "doc_id", "text",
            F.concat(
                F.lit("https://d.example/p"), (d - d % 2).cast("string")
            ).alias("url"),
        )
        warc_files_from_docs(
            docs, crawl, n_files=4, url_col="url"
        ).collect()
        build_segments_from_warc(
            spark, list_warc_paths(crawl), idx,
            analyzer="whitespace", normalize=False, resume=False,
        ).collect()
        supersede_recrawls(spark, idx)
    dels = spark.createDataFrame(
        [(int(i),) for i in read_deletes(idx)] or [(-1,)], "doc_id long"
    )
    live = crawl_urls(spark, idx).join(
        F.broadcast(dels), "doc_id", "left_anti"
    )
    # the sidecar warc_ts carries the ORIGINAL capture identity (the
    # writer stamps base + orig_doc_id*7s), so the output proves WHICH
    # capture survived, not just how many
    return live.select("url", F.col("warc_ts").alias("live_ts")).orderBy(
        "url"
    )


_CRAWL_SUPERSEDE_SQL = """
SELECT 'https://d.example/p' || (doc_id - doc_id % 2) AS url,
       TIMESTAMP '2024-01-01' + to_seconds(doc_id * 7) AS live_ts
FROM documents
WHERE doc_id % 2 = 1
   OR NOT EXISTS (SELECT 1 FROM documents t2
                  WHERE t2.doc_id = documents.doc_id + 1)
ORDER BY url
"""


def _q_static_rank(spark, sf):
    """BM25 x PageRank static-rank blending — the other half of web
    ranking next to anchor text: textual relevance from the body index,
    authority from the link graph, final score a deterministic linear
    blend (relevance + 100·rank; rank mass is O(1/N) so the factor
    brings it to BM25 scale). The link graph is the `web_pagerank`
    gate's formula graph over doc_ids; the oracle chains the _PRELUDE
    BM25 with the 3-round power-iteration unroll and blends
    identically."""
    from clucene_spark.pipeline.links import pagerank

    d = F.col("doc_id")
    srcs = _docs(spark, sf).select("doc_id").where(d % 4 != 0)
    e1 = srcs.select(
        d.alias("src"), ((d * 3 + 1) % 97).alias("dst")
    )
    e2 = srcs.select(
        d.alias("src"), ((d * 5 + 2) % 97).alias("dst")
    )
    pr = pagerank(e1.unionAll(e2), iters=3, damping=0.85)
    rel = _searcher(spark, sf).topk(
        TermQuery(term="spark"), k=1_000_000, round_to=None
    )
    return (
        rel.join(pr, rel["doc_id"] == pr["url"], "left")
        .select(
            "doc_id",
            F.round(
                F.col("score")
                + 100.0 * F.coalesce(F.col("rank"), F.lit(0.0)),
                4,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


_STATIC_RANK_TAIL = """
, srcs AS (SELECT doc_id AS i FROM documents WHERE doc_id % 4 <> 0),
raw_edges AS (
  SELECT i AS src, (i*3+1) % 97 AS dst FROM srcs
  UNION ALL
  SELECT i, (i*5+2) % 97 FROM srcs),
edges AS (SELECT DISTINCT src, dst FROM raw_edges WHERE src <> dst),
nodes AS (SELECT src AS url FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
outd AS (SELECT src, count(*)::DOUBLE AS od FROM edges GROUP BY src),
r0 AS (SELECT url, 1.0/(SELECT n FROM nn) AS rank FROM nodes),
d0 AS (SELECT coalesce(sum(r.rank), 0) AS dmass FROM r0 r
       LEFT JOIN outd o ON r.url = o.src WHERE o.src IS NULL),
c0 AS (SELECT e.dst AS url, sum(r.rank / o.od) AS inflow
       FROM r0 r JOIN outd o ON r.url = o.src
       JOIN edges e ON e.src = r.url GROUP BY e.dst),
r1 AS (SELECT n2.url, 0.15/(SELECT n FROM nn)
         + 0.85*(coalesce(c.inflow, 0)
                 + (SELECT dmass FROM d0)/(SELECT n FROM nn)) AS rank
       FROM nodes n2 LEFT JOIN c0 c ON n2.url = c.url),
d1 AS (SELECT coalesce(sum(r.rank), 0) AS dmass FROM r1 r
       LEFT JOIN outd o ON r.url = o.src WHERE o.src IS NULL),
c1 AS (SELECT e.dst AS url, sum(r.rank / o.od) AS inflow
       FROM r1 r JOIN outd o ON r.url = o.src
       JOIN edges e ON e.src = r.url GROUP BY e.dst),
r2 AS (SELECT n2.url, 0.15/(SELECT n FROM nn)
         + 0.85*(coalesce(c.inflow, 0)
                 + (SELECT dmass FROM d1)/(SELECT n FROM nn)) AS rank
       FROM nodes n2 LEFT JOIN c1 c ON n2.url = c.url),
d2 AS (SELECT coalesce(sum(r.rank), 0) AS dmass FROM r2 r
       LEFT JOIN outd o ON r.url = o.src WHERE o.src IS NULL),
c2 AS (SELECT e.dst AS url, sum(r.rank / o.od) AS inflow
       FROM r2 r JOIN outd o ON r.url = o.src
       JOIN edges e ON e.src = r.url GROUP BY e.dst),
r3 AS (SELECT n2.url, 0.15/(SELECT n FROM nn)
         + 0.85*(coalesce(c.inflow, 0)
                 + (SELECT dmass FROM d2)/(SELECT n FROM nn)) AS rank
       FROM nodes n2 LEFT JOIN c2 c ON n2.url = c.url)
SELECT b.doc_id,
       round(b.sc + 100.0 * coalesce(r3.rank, 0), 4) AS score
FROM bm25 b LEFT JOIN r3 ON r3.url = b.doc_id
WHERE b.term = 'spark'
ORDER BY score DESC, b.doc_id ASC LIMIT 10
"""


def _q_stream_warc_stats(spark, sf):
    """Continuous crawl indexing (`streaming/crawl.py`): the documents
    table serialized as WARC files becomes a drop directory drained by a
    Structured Streaming binaryFile source at ONE FILE PER MICRO-BATCH —
    four batches grow the persistent file ledger, each batch runs the
    zero-shuffle per-file build through the exactly-once triple
    (stream checkpoint + ledger + segment checkpoints) — and the
    committed index's corpus statistics are read back. Same SQL oracle
    as `warc_index_stats`: the streaming path must converge to the
    identical index the batch path builds."""
    import hashlib
    import os
    import tempfile

    from clucene_spark.data.warc import warc_files_from_docs
    from clucene_spark.index.segments import SegmentStore
    from clucene_spark.streaming.crawl import stream_warc_ingest

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    base = f"{tempfile.gettempdir()}/clucene_swarc_{tag}"
    idx = os.path.join(base, "index")
    try:
        store = SegmentStore(spark, idx)
    except FileNotFoundError:
        crawl = os.path.join(base, "crawl")
        warc_files_from_docs(
            _docs(spark, sf).select("doc_id", "text"), crawl, n_files=4
        ).collect()
        stream_warc_ingest(
            spark,
            crawl,
            idx,
            analyzer="whitespace",
            normalize=False,
            checkpoint_dir=os.path.join(base, "ck"),
            max_files_per_trigger=1,
        )
        store = SegmentStore(spark, idx)
    dl = store.doc_lens().agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("n_tokens"),
    )
    pt = store.postings().agg(
        F.sum("df").cast("long").alias("n_postings"),
        F.count_distinct("term").alias("n_terms"),
    )
    return dl.crossJoin(pt)


def _q_sitemap_gap(spark, sf):
    """Sitemap crawl-freshness gap (`pipeline/sitemaps.py`): per doc,
    build a genuine sitemaps.org <urlset> blob (W3C date lastmod, an
    entity-escaped query for every 4th loc, a priority hint), parse it
    with the namespace-agnostic XML explode, and join against a
    formula-built captured-pages table through the canonical-URL
    pre-aggregated gap join. Docs with doc_id%3==0 are never crawled
    (missing); the rest are stale exactly when their capture day
    (doc_id%60) predates their declared lastmod day (doc_id%90). The
    oracle restates entries, captures and the status CASE in SQL."""
    from clucene_spark.pipeline.sitemaps import crawl_gap, sitemap_entries

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    base = F.lit("2024-01-01").cast("date")
    loc = F.concat(
        F.lit("https://sm"), s(d % 7), F.lit(".example/page/"), s(d),
        F.when(d % 4 == 0, F.lit("?a=1&b=2")).otherwise(F.lit("")),
    )
    xml = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
              "<url><loc>"),
        F.replace(loc, F.lit("&"), F.lit("&amp;")),
        F.lit("</loc><lastmod>"),
        F.date_format(F.date_add(base, (d % 90).cast("int")), "yyyy-MM-dd"),
        F.lit("</lastmod><priority>"),
        F.format_string("%.1f", F.lit(0.5) + (d % 5).cast("double") / 10),
        F.lit("</priority></url></urlset>"),
    )
    sitemaps = _docs(spark, sf).select(
        F.concat(F.lit("sm"), s(d % 7), F.lit(".example")).alias("site"),
        xml.alias("sitemap_xml"),
    )
    pages = (
        _docs(spark, sf)
        .where(d % 3 != 0)
        .select(
            loc.alias("url"),
            F.date_add(base, (d % 60).cast("int"))
            .cast("timestamp")
            .alias("warc_ts"),
        )
    )
    return crawl_gap(sitemap_entries(sitemaps), pages).select(
        "site", "loc", "lastmod", "latest_ts",
        F.round("priority", 1).alias("priority"), "status",
    ).orderBy("loc")


_SITEMAP_GAP_SQL = """
WITH d AS (SELECT doc_id AS i FROM documents),
e AS (SELECT i,
  'sm' || (i % 7) || '.example' AS site,
  'https://sm' || (i % 7) || '.example/page/' || i
    || CASE WHEN i % 4 = 0 THEN '?a=1&b=2' ELSE '' END AS loc,
  TIMESTAMP '2024-01-01' + to_days((i % 90)::INT) AS lastmod,
  round(0.5 + (i % 5) * 0.1, 1)::DOUBLE AS priority
 FROM d),
p AS (SELECT i,
  CASE WHEN i % 3 <> 0
       THEN TIMESTAMP '2024-01-01' + to_days((i % 60)::INT) END AS latest_ts
 FROM d)
SELECT e.site, e.loc, e.lastmod, p.latest_ts, e.priority,
  CASE WHEN p.latest_ts IS NULL THEN 'missing'
       WHEN p.latest_ts < e.lastmod THEN 'stale'
       ELSE 'fresh' END AS status
FROM e JOIN p USING (i) ORDER BY e.loc
"""


def _q_warc_charset(spark, sf):
    """Charset-aware page decode (`data/warc.py decode_html` — real
    crawls are not all UTF-8): per doc, serialize a WARC response whose
    page BYTES rotate through three encodings with three different
    charset signals — Latin-1 declared in the HTTP Content-Type (body
    carries a planted 0xE9 é), UTF-16-LE declared only by its BOM (every
    ASCII char becomes 2 bytes; a UTF-8 misread would shred it), and
    cp1252 declared only by an in-page <meta charset> (planted 0x80 €,
    an invalid UTF-8 lead byte) — then run parse -> decode -> extract.
    The oracle states the expected text per doc from the construction
    formula; any precedence or decode error corrupts text_out."""
    import datetime as dt

    import pandas as pd

    from clucene_spark.data import warc as W

    docs = _docs(spark, sf).select("doc_id", "text")

    def _mk(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                mode = did % 3
                if mode == 0:
                    page = f"<html><body><p>{text} café</p></body></html>"
                    body = page.encode("latin-1")
                    ctype = "text/html; charset=ISO-8859-1"
                elif mode == 1:
                    page = f"<html><body><p>{text} bom16</p></body></html>"
                    body = b"\xff\xfe" + page.encode("utf-16-le")
                    ctype = "text/html"
                else:
                    page = (
                        '<html><head><meta charset="windows-1252"></head>'
                        f"<body><p>{text} €</p></body></html>"
                    )
                    body = page.encode("cp1252")
                    ctype = "text/html"
                rec = W.build_record(
                    "response",
                    W.http_response(body, content_type=ctype),
                    url=f"https://cs{did % 5}.example/{did}",
                    date=dt.datetime(2024, 1, 1),
                    content_type="application/http; msgtype=response",
                )
                ids.append(did)
                blobs.append(W.gzip_member(rec))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "warc": blobs})

    blobs = docs.mapInPandas(_mk, "doc_id long, warc binary")
    parsed = W.records_from_col(blobs, "warc")

    @F.pandas_udf("string")
    def _decode_extract(html: pd.Series, ctype: pd.Series) -> pd.Series:
        from clucene_spark.data.warc import decode_html
        from clucene_spark.pipeline.extract import extract_text_py

        return pd.Series(
            [
                extract_text_py(decode_html(bytes(b), c))
                for b, c in zip(html, ctype)
            ]
        )

    return parsed.select(
        "doc_id",
        _decode_extract(F.col("html"), F.col("content_type")).alias(
            "text_out"
        ),
    ).orderBy("doc_id")


_WARC_CHARSET_SQL = """
SELECT doc_id,
  CASE doc_id % 3
    WHEN 0 THEN text || ' caf' || chr(233)
    WHEN 1 THEN text || ' bom16'
    ELSE text || ' ' || chr(8364)
  END AS text_out
FROM documents ORDER BY doc_id
"""


def _q_robots_filter(spark, sf):
    """robots.txt crawl-politeness filter (`pipeline/robots.py`, RFC
    9309): per domain build a robots file with a decoy group for a
    DIFFERENT agent (Disallow: / — group selection must skip it), a
    Disallow prefix for the domain's own category, an Allow exception
    under it, and a Disallow for the next category; run the full
    parse -> per-domain-rules -> broadcast-join -> longest-match path
    over formula-built page URLs. The gate restricts itself to prefix
    rules so the oracle can replay longest-match/tie-to-Allow in pure
    SQL (wildcard '*'/'$' semantics are pytest-golden territory)."""
    from clucene_spark.pipeline.robots import robots_filter

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    pages = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("https://site"), s(d % 7), F.lit(".example/cat"),
            s(d % 10), F.lit("/item"), s(d),
        ).alias("url"),
    )
    doms = spark.range(7).select(
        F.concat(F.lit("site"), s(F.col("id")), F.lit(".example")).alias(
            "domain"
        ),
        F.concat(
            F.lit("User-agent: other\nDisallow: /\nUser-agent: *\n"),
            F.lit("Disallow: /cat"), s(F.col("id")),
            F.lit("\nAllow: /cat"), s(F.col("id")),
            F.lit("/item"), s(F.col("id")),
            F.lit("\nDisallow: /cat"), s((F.col("id") + 1) % 10),
            F.lit("/\n"),
        ).alias("robots_txt"),
    )
    return (
        robots_filter(pages, doms, keep_denied=True)
        .select(
            "doc_id",
            F.col("robots_allowed").alias("allowed"),
            F.col("robots_rule").alias("rule"),
        )
        .orderBy("doc_id")
    )


_ROBOTS_FILTER_SQL = """
WITH p AS (
  SELECT doc_id, doc_id % 7 AS d,
         '/cat' || (doc_id % 10) || '/item' || doc_id AS path
  FROM documents),
r AS (
  SELECT doc_id, path,
         '/cat' || d AS r1,
         '/cat' || d || '/item' || d AS r2,
         '/cat' || ((d + 1) % 10) || '/' AS r3
  FROM p),
m AS (
  SELECT doc_id, r1, r2, r3,
         CASE WHEN path LIKE r1 || '%' THEN strlen(r1) ELSE -1 END AS l1,
         CASE WHEN path LIKE r2 || '%' THEN strlen(r2) ELSE -1 END AS l2,
         CASE WHEN path LIKE r3 || '%' THEN strlen(r3) ELSE -1 END AS l3
  FROM r)
SELECT doc_id,
  (l2 >= 0 AND l2 >= l1 AND l2 >= l3)
    OR (l1 < 0 AND l3 < 0) AS allowed,
  CASE WHEN l2 >= 0 AND l2 >= l1 AND l2 >= l3 THEN r2
       WHEN l1 >= l3 AND l1 >= 0 THEN r1
       WHEN l3 >= 0 THEN r3
       ELSE '' END AS rule
FROM m ORDER BY doc_id
"""


_WARC_INDEX_STATS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents)
SELECT
  (SELECT count(DISTINCT doc_id) FROM toks)::BIGINT AS n_docs,
  (SELECT count(*) FROM toks)::BIGINT AS n_tokens,
  (SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM toks))::BIGINT
      AS n_postings,
  (SELECT count(DISTINCT term) FROM toks)::BIGINT AS n_terms
"""


def _q_ingest_webtext(spark, sf):
    """End-to-end webtext ingest (the composed front door): full pages
    built around each doc's text — head title that must not leak, a
    corpus-wide nav header line carrying a DECOMPOSED accent (NFC must
    compose it before line hashing, or the header lines won't collide),
    escaped body — over the URL-noise fixture. extract -> normalize ->
    URL latest-wins -> corpus line dedup (nav header survives in exactly
    one doc) -> quality gate. The oracle composes the verified per-stage
    SQL forms."""
    from clucene_spark.pipeline.clean import ingest_webtext

    docs = _docs(spark, sf).select("doc_id", "text")
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">", "&gt;",
    )
    html = F.concat(
        F.lit("<html><head><title>SKIP</title></head>"
              "<body><div>SITE NAVe\u0301 HOME</div><p>"),
        esc,
        F.lit("</p></body></html>"),
    )
    pages = _url_pages(spark, sf).join(
        docs.select("doc_id", html.alias("html")), "doc_id"
    )
    return ingest_webtext(pages).orderBy("doc_id")


_INGEST_WEBTEXT_SQL = _URL_DEDUP_SQL[: _URL_DEDUP_SQL.index("ranked AS")] + """
ranked AS (SELECT canon_url, doc_id, ts,
             row_number() OVER (PARTITION BY canon_url
                                ORDER BY ts DESC, doc_id DESC) AS rn
           FROM canon),
surv AS (SELECT doc_id FROM ranked WHERE rn = 1),
udup AS (SELECT doc_id FROM ranked WHERE rn > 1),
ext AS (SELECT d.doc_id,
          'SITE NAV' || chr(233) || ' HOME' || chr(10) || d.text AS text
        FROM documents d JOIN surv USING (doc_id)),
ln AS (
  SELECT doc_id, i - 1 AS pos, l FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS l,
           unnest(generate_series(1, len(string_split(text, chr(10))))) AS i
    FROM ext) WHERE l <> ''),
per_dl AS (SELECT doc_id, l FROM ln GROUP BY doc_id, l),
per_l AS (SELECT l, count(*) AS nd, min(doc_id) AS owner
          FROM per_dl GROUP BY l),
kept AS (SELECT ln.doc_id, pos, ln.l FROM ln JOIN per_l ON ln.l = per_l.l
         WHERE nd <= 1 OR ln.doc_id = owner),
tot AS (SELECT doc_id, count(*) AS n_lines FROM ln GROUP BY doc_id),
ka AS (SELECT doc_id, count(*) AS n_kept,
              string_agg(l, chr(10) ORDER BY pos) AS text_clean
       FROM kept GROUP BY doc_id),
ldout AS (SELECT t.doc_id, t.n_lines, coalesce(ka.n_kept, 0) AS n_kept,
                 coalesce(ka.text_clean, '') AS text_clean
          FROM tot t LEFT JOIN ka USING (doc_id)),
qf AS (SELECT doc_id, n_lines, n_kept, text_clean,
         list_filter(string_split(text_clean, ' '), x -> x <> '') AS tk
       FROM ldout),
q AS (SELECT doc_id, n_lines, n_kept, text_clean,
        ROUND(least(CASE WHEN len(tk) > 0
                THEN CAST(len(list_filter(tk, x -> x IN __STOP33__)) AS DOUBLE)
                     / len(tk) ELSE 0.0 END * 2, 1.0)
              * least(len(tk) / 64.0, 1.0)
              * (1.0 - CASE WHEN length(text_clean) > 0
                  THEN CAST(length(text_clean)
                       - length(regexp_replace(text_clean, '[^a-z ]', '', 'g'))
                       AS DOUBLE) / length(text_clean) ELSE 0.0 END), 4)
          AS quality
      FROM qf)
SELECT doc_id,
       CASE WHEN n_kept = 0 THEN 'all_boilerplate'
            WHEN quality < 0.05 THEN 'low_quality'
            ELSE 'kept' END AS fate,
       quality, n_lines, n_kept,
       CASE WHEN n_kept > 0 AND quality >= 0.05 THEN text_clean
            ELSE '' END AS text_clean
FROM q
UNION ALL
SELECT doc_id, 'url_dup' AS fate, -1.0 AS quality,
       CAST(0 AS BIGINT) AS n_lines, CAST(0 AS BIGINT) AS n_kept,
       '' AS text_clean
FROM udup
ORDER BY doc_id
"""


def _q_stream_url_dedup(spark, sf):
    """Streaming URL-level dedup (applyInPandasWithState over canonical
    URLs): drain the synthetic crawl as a MULTI-batch file stream (one
    file per trigger), keyed merge-on-read sink, final table = one
    max_by(batch_id) aggregation. Equal to the batch latest-wins window
    because the per-key fold (pairwise max over (ts, doc_id), count) is
    order/batch invariant."""
    import hashlib
    import shutil
    import tempfile

    from clucene_spark.streaming.stateful import stream_url_dedup

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    base = f"{tempfile.gettempdir()}/clucene_surl_{tag}"
    src, ckpt, sink = f"{base}_src", f"{base}_ckpt", f"{base}_sink"
    for d in (src, ckpt, sink):
        shutil.rmtree(d, ignore_errors=True)
    _url_pages(spark, sf).repartition(2).write.parquet(src)
    out = stream_url_dedup(
        spark, src, checkpoint_dir=ckpt, max_files_per_trigger=1,
        sink_dir=sink,
    )
    return out.orderBy("canon_url")


_STREAM_URL_DEDUP_SQL = _URL_DEDUP_SQL.replace(
    """SELECT canon_url, n_copies, doc_id AS keep_doc
FROM ranked WHERE rn = 1 AND n_copies > 1
ORDER BY canon_url
""",
    """SELECT canon_url, doc_id AS keep_doc, ts AS keep_ts, n_copies
FROM ranked WHERE rn = 1
ORDER BY canon_url
""",
).replace(
    """ranked AS (SELECT canon_url, doc_id,
             row_number() OVER (PARTITION BY canon_url
                                ORDER BY ts DESC, doc_id DESC) AS rn,
             count(*) OVER (PARTITION BY canon_url) AS n_copies
           FROM canon)""",
    """ranked AS (SELECT canon_url, doc_id, ts,
             row_number() OVER (PARTITION BY canon_url
                                ORDER BY ts DESC, doc_id DESC) AS rn,
             count(*) OVER (PARTITION BY canon_url) AS n_copies
           FROM canon)""",
)


def _q_domain_cap(spark, sf):
    """Per-domain cap — the webtext corpus-mix pass (no one site may
    dominate the training mix): domain_of ∘ per_stratum_cap, at most 12
    docs per registrable host, deterministic-hash order."""
    from clucene_spark.pipeline.sampling import per_stratum_cap
    from clucene_spark.pipeline.urls import domain_of

    pages = _url_pages(spark, sf).select(
        "doc_id", domain_of(F.col("url")).alias("domain")
    )
    return per_stratum_cap(pages, cap=12, by="domain").orderBy("doc_id")


_DOMAIN_CAP_SQL = _URL_PAGES_SQL + """
, d AS (SELECT doc_id,
          regexp_replace(regexp_replace(
            lower(regexp_extract(
              regexp_replace(url, '^[Hh][Tt][Tt][Pp][Ss]?://', ''),
              '^([^/?#]+)', 1)), '^www\\.', ''), ':[0-9]+$', '') AS domain
        FROM pages),
s AS (SELECT doc_id, domain,
        ('0x'||substr(md5(domain || ':' || CAST(doc_id AS VARCHAR) || ':42'),
                      1, 7))::BIGINT AS h
      FROM d),
r AS (SELECT doc_id, domain,
             row_number() OVER (PARTITION BY domain
                                ORDER BY h ASC, doc_id ASC) AS rk
      FROM s)
SELECT doc_id, domain FROM r WHERE rk <= 12 ORDER BY doc_id
"""


def _q_line_dedup(spark, sf):
    """Corpus-level line dedup (CCNet/RefinedWeb pass) over docs
    restructured into 8-token lines, with two planted boilerplate axes:
    a 2-line site header prepended to every doc_id%3==0 doc, and full
    twin copies (+1M id) of every doc_id%10==0 doc. Policy max_docs=1:
    a line appearing in >1 doc survives only in its min-doc owner."""
    from clucene_spark.pipeline.dedup import line_dedup

    docs = _docs(spark, sf).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(toks) / 8).cast("int")
    lined = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
            ),
            "\n",
        ).alias("text"),
    )
    header = "nav home about contact\ncopyright example corp rights\n"
    lined = lined.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.lit(header), F.col("text"))
        ).otherwise(F.col("text")).alias("text"),
    )
    twins = lined.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return line_dedup(lined.unionByName(twins), max_docs=1).orderBy("doc_id")


_LINE_DEDUP_SQL = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
lined0 AS (
  SELECT doc_id,
    array_to_string(
      list_transform(
        generate_series(0, CAST(ceil(len(t) / 8.0) AS INT) - 1),
        i -> array_to_string(t[i*8+1 : i*8+8], ' ')),
      chr(10)) AS text
  FROM base),
lined AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
      THEN 'nav home about contact' || chr(10)
           || 'copyright example corp rights' || chr(10) || text
      ELSE text END AS text
  FROM lined0),
corpus AS (
  SELECT doc_id, text FROM lined
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM lined WHERE doc_id % 10 = 0),
ln AS (
  SELECT doc_id, i - 1 AS pos, l FROM (
    SELECT doc_id,
           unnest(string_split(text, chr(10))) AS l,
           unnest(generate_series(1, len(string_split(text, chr(10))))) AS i
    FROM corpus)
  WHERE l <> ''),
per_dl AS (SELECT doc_id, l FROM ln GROUP BY doc_id, l),
per_l AS (SELECT l, count(*) AS nd, min(doc_id) AS owner
          FROM per_dl GROUP BY l),
kept AS (SELECT ln.doc_id, pos, ln.l
         FROM ln JOIN per_l ON ln.l = per_l.l
         WHERE nd <= 1 OR ln.doc_id = owner),
tot AS (SELECT doc_id, count(*) AS n_lines FROM ln GROUP BY doc_id),
ka AS (SELECT doc_id, count(*) AS n_kept,
              string_agg(l, chr(10) ORDER BY pos) AS text_clean
       FROM kept GROUP BY doc_id)
SELECT t.doc_id, t.n_lines,
       coalesce(ka.n_kept, 0) AS n_kept,
       coalesce(ka.text_clean, '') AS text_clean
FROM tot t LEFT JOIN ka USING (doc_id)
ORDER BY doc_id
"""


def _q_span_dedup(spark, sf):
    """ExactSubstr rewrite (pipeline/dedup.py span_dedup, Lee et al. 2021
    semantics with line_dedup's min-doc owner rule) over docs with two
    planted duplication axes: a 10-token banner prepended to every
    doc_id%4==0 doc (cut from every copy but the owner, at any
    alignment) and full twin copies (+1M id) of every doc_id%10==0 doc
    (the twin rewrites to empty). w=8 so the banner spans 3 windows."""
    from clucene_spark.pipeline.dedup import span_dedup

    docs = _docs(spark, sf).select("doc_id", "text")
    banner = (
        "breaking news site menu search login subscribe share print trending"
    )
    docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(banner + " "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    twins = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return span_dedup(docs.unionByName(twins), w=8).orderBy("doc_id")


_SPAN_DEDUP_SQL = """
WITH docs0 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 4 = 0
      THEN 'breaking news site menu search login subscribe share print trending '
           || text
      ELSE text END AS text
  FROM documents),
corpus AS (
  SELECT doc_id, text FROM docs0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM docs0 WHERE doc_id % 10 = 0),
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
w AS (
  SELECT doc_id, i AS pos, md5(array_to_string(toks[i:i+7], ' ')) AS h
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, len(toks) - 7)) AS i
    FROM t WHERE len(toks) >= 8)),
ph AS (SELECT h, min(doc_id) AS owner,
              min(doc_id) < max(doc_id) AS crossd
       FROM w GROUP BY h),
cov AS (SELECT DISTINCT doc_id, p FROM (
        SELECT w.doc_id,
               unnest(generate_series(w.pos, w.pos + 7)) AS p
        FROM w JOIN ph USING (h)
        WHERE ph.crossd AND w.doc_id <> ph.owner)),
isl AS (SELECT doc_id, p,
               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        FROM cov),
sp AS (SELECT doc_id, count(*) AS dup_tokens, count(DISTINCT grp) AS n_spans
       FROM isl GROUP BY doc_id),
tok AS (SELECT doc_id, unnest(toks) AS tk,
               unnest(generate_series(1, len(toks))) AS p
        FROM t),
kept AS (SELECT tok.doc_id, string_agg(tk, ' ' ORDER BY tok.p) AS text_clean
         FROM tok LEFT JOIN cov
           ON tok.doc_id = cov.doc_id AND tok.p = cov.p
         WHERE cov.p IS NULL
         GROUP BY tok.doc_id)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(sp.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(sp.n_spans, 0) AS BIGINT) AS n_spans,
       coalesce(k.text_clean, '') AS text_clean
FROM t
LEFT JOIN sp USING (doc_id)
LEFT JOIN kept k ON t.doc_id = k.doc_id
ORDER BY doc_id
"""


def _q_decontaminate(spark, sf):
    """Benchmark decontamination: bench set = first 12 tokens of every
    50th doc; flag corpus docs sharing any 8-gram (broadcast semi-join)."""
    from clucene_spark.pipeline.dedup import decontaminate

    docs = _docs(spark, sf).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.array_join(F.slice(toks, 1, 12), " ").alias("text")
    )
    return decontaminate(docs, bench, n=8).orderBy("doc_id")


def _q_decontaminate_frac(spark, sf):
    """Per-doc contamination fraction (pipeline/dedup.py
    decontaminate_fraction): distinct-8-gram overlap ratio vs the same
    every-50th-doc bench set; bench hashes broadcast, one groupBy(doc_id)."""
    from clucene_spark.pipeline.dedup import decontaminate_fraction

    docs = _docs(spark, sf).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.array_join(F.slice(toks, 1, 12), " ").alias("text")
    )
    return decontaminate_fraction(docs, bench, n=8).orderBy("doc_id")


def _q_dedup_ngram(spark, sf):
    from clucene_spark.pipeline.dedup import ngram_jaccard_pairs, with_planted_dups

    corpus = with_planted_dups(_docs(spark, sf), every=10, keep_frac=0.8)
    return ngram_jaccard_pairs(corpus, n=3, threshold=0.5).orderBy("a", "b")


def _q_dedup_minhash(spark, sf):
    from clucene_spark.pipeline.dedup import minhash_lsh_pairs, with_planted_dups

    corpus = with_planted_dups(_docs(spark, sf), every=10, keep_frac=0.8)
    # bands=32 (1-row bands): provably-complete candidate recall so the
    # verified pairs equal the exact-Jaccard oracle; production default
    # is auto-banding (pick_bands) — see dedup.minhash_lsh_pairs
    return minhash_lsh_pairs(
        corpus, n=3, threshold=0.5, bands=32, min_shingles=1
    ).orderBy("a", "b")


def _q_dedup_cluster(spark, sf):
    """Pairs -> components -> one canonical survivor per duplicate cluster
    (large-star/small-star, pipeline/graph.py). The training-pipeline shape
    a pairwise drop policy can't express: transitive dups collapse to one."""
    from clucene_spark.pipeline.dedup import minhash_lsh_pairs, with_planted_dups
    from clucene_spark.pipeline.graph import cluster_canonical

    corpus = with_planted_dups(_docs(spark, sf), every=10, keep_frac=0.8)
    pairs = minhash_lsh_pairs(corpus, n=3, threshold=0.5, bands=32, min_shingles=1)
    return cluster_canonical(corpus, pairs).orderBy("doc_id")


def _q_cluster_best(spark, sf):
    """Quality-preferring cluster survivorship (pipeline/graph.py
    cluster_best): planted twins EXTEND the original (+4 appended
    tokens), so longest-survives must flip the keep flag to the twin in
    every 10th cluster — where min-id (cluster_canonical) would keep the
    original. Oracle: recursive-CTE closure + per-component rank over
    (n_tokens DESC, doc_id ASC)."""
    from clucene_spark.pipeline.dedup import minhash_lsh_pairs
    from clucene_spark.pipeline.graph import cluster_best

    docs = _docs(spark, sf).select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq1 zq2 zq3 zq4")).alias("text"),
    )
    corpus = docs.unionByName(twins)
    scored = corpus.withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    pairs = minhash_lsh_pairs(corpus, n=3, threshold=0.5, bands=32,
                              min_shingles=1)
    return cluster_best(scored, pairs, score_col="n_tokens").orderBy("doc_id")


def _q_dedup_simhash(spark, sf):
    from clucene_spark.pipeline.dedup import simhash_pairs, with_planted_dups

    corpus = with_planted_dups(_docs(spark, sf), every=10, keep_frac=0.8)
    return simhash_pairs(corpus, bits=32, max_hamming=4).orderBy("a", "b")


def _perturbed_vecs(spark, sf):
    """embeddings ∪ planted near-identical twins (vec_id+10000, dim0+0.05)."""
    v = _vecs(spark, sf).select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    twin_e = F.concat(
        F.array(F.element_at("embedding", 1) + F.lit(0.05)),
        F.slice("embedding", 2, 63),
    )
    twins = v.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), twin_e.alias("embedding")
    )
    return v.unionByName(twins)


def _q_dedup_embedding(spark, sf):
    from clucene_spark.pipeline.dedup import embedding_neardup_pairs

    # n_planes=8 pinned: the DuckDB oracle embeds exactly these 8 plane
    # constants (production default auto-sizes planes to the corpus)
    return embedding_neardup_pairs(
        _perturbed_vecs(spark, sf), threshold=0.99, n_planes=8
    ).orderBy("a", "b")


_MP_OVERLAP_PLANT = "hash key value hash table"
_PLANT_SEARCHER_CACHE: dict[tuple, "Searcher"] = {}


def _planted_searcher(spark, sf, plant_text):
    """Searcher over documents plus one planted doc_id=-1 row — the search
    twin of the dedup gates' planted-duplicate pattern: the planted row is
    the MINIMUM doc_id, so it is deterministically the first doc the
    SloppyPhraseScorer scores (where the reference's one-time repeat
    detection fires)."""
    key = (sf, plant_text)
    if key not in _PLANT_SEARCHER_CACHE:
        from clucene_spark.index.build import InvertedIndex

        docs = _docs(spark, sf).select("doc_id", "text")
        plant = spark.createDataFrame(
            [(-1, plant_text)], "doc_id long, text string"
        )
        _PLANT_SEARCHER_CACHE[key] = Searcher(
            InvertedIndex(docs.unionByName(plant)).cache()
        )
    return _PLANT_SEARCHER_CACHE[key]


def _q_mp_overlap(spark, sf):
    """Partially-overlapping slots over the natural corpus: at every
    shipped sf the first matching doc's slot unions start on DISTINCT
    positions (probed), so the reference's one-time detection
    (SloppyPhraseScorer.cpp:95-118) marks nothing and the unmarked union
    walk applies for every doc — including later docs where both slots sit
    on the same shared-term token."""
    from clucene_spark.search.engine import MultiPhraseQuery

    return _searcher(spark, sf).topk(
        MultiPhraseQuery(slots=[["key", "hash"], ["hash", "value"]], slop=2),
        10,
        round_to=4,
    )


def _q_mp_overlap_repeat(spark, sf):
    """Same overlapping slots, but the planted first doc starts BOTH slot
    unions on 'hash'@0 -> repeats are marked there and persist corpus-wide
    (checkedRepeats fires once); every doc then runs the value-based
    repeat init + termPositionsDiffer walk. Oracle: the marked recursive
    state machine (_sloppy_topk_marked_sql)."""
    from clucene_spark.search.engine import MultiPhraseQuery

    s = _planted_searcher(spark, sf, _MP_OVERLAP_PLANT)
    return s.topk(
        MultiPhraseQuery(slots=[["key", "hash"], ["hash", "value"]], slop=2),
        10,
        round_to=4,
    )


def _query_vec(spark, sf, vec_id=7):
    row = _vecs(spark, sf).filter(F.col("vec_id") == vec_id).first()
    return [float(x) for x in row["embedding"]]


def _q_ann_brute(spark, sf):
    from clucene_spark.pipeline.ann import cosine_topk

    return cosine_topk(_vecs(spark, sf), _query_vec(spark, sf), k=10)


def _q_ann_pandas(spark, sf):
    from clucene_spark.pipeline.ann import cosine_topk_pandas

    return cosine_topk_pandas(_vecs(spark, sf), _query_vec(spark, sf), k=10)


def _q_stream_ingest(spark, sf):
    """Structured Streaming end-to-end: micro-batch ingest (availableNow)
    of the documents parquet into a fresh segment store, then BM25 top-10
    through WAND. Exactly-once + the piece-resume rule make the streamed
    index logically identical to a batch build, so the ordinary batch SQL
    oracle applies."""
    import hashlib
    import tempfile

    from clucene_spark.index.segments import SegmentStore
    from clucene_spark.search.wand import wand_query_direct
    from clucene_spark.streaming.ingest import stream_ingest

    import os
    import shutil

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    d = f"{tempfile.gettempdir()}/clucene_idx_{tag}_stream"
    try:
        store = SegmentStore(spark, d)
    except FileNotFoundError:
        # fresh build: clear any half-finished stream state, then feed the
        # file-source a DIRECTORY of arriving files
        for p in (d, f"{d}_ckpt", f"{d}_src"):
            shutil.rmtree(p, ignore_errors=True)
        src_dir = f"{d}_src"
        os.makedirs(src_dir, exist_ok=True)
        shutil.copy(f"{sf}/documents.parquet", f"{src_dir}/part-0.parquet")
        stream_ingest(
            spark,
            src_dir,
            d,
            schema="doc_id long, text string",
            docs_per_segment=256,
            analyzer="whitespace",
            checkpoint_dir=f"{d}_ckpt",
            available_now=True,
        )
        store = SegmentStore(spark, d)
    return wand_query_direct(store, ["spark", "window"], k=10)


_WIN_BASE_EPOCH = 1_704_067_200  # 2024-01-01 00:00:00 UTC
_WIN_BARRIER_EPOCH = 1_893_456_000  # 2030-01-01 UTC — high-watermark barrier


def _q_stream_window(spark, sf):
    """Watermarked event-time windowed aggregation (the Structured
    Streaming windowed-agg surface): docs arrive with ts = base + doc_id
    minutes; 1-hour tumbling windows with a 30-min watermark aggregate
    (n_docs, n_tokens) in APPEND mode — each window emits exactly once,
    finalized. The source carries a far-future barrier row (doc_id=-1)
    so the bounded drain's trailing real windows all finalize; the
    barrier's own window never emits. Epochs (longs) cross the engine
    boundary instead of timestamps so the compare is timezone-proof."""
    import hashlib
    import os
    import shutil

    from clucene_spark.streaming.ingest import windowed_ingest_stats

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    import tempfile

    base = f"{tempfile.gettempdir()}/clucene_winstats_{tag}"
    src, sink, ckpt = f"{base}_src", f"{base}_sink", f"{base}_ckpt"
    # _spark_metadata is the file-sink's commit log — its presence marks a
    # completed drain (a half-built sink from a crashed run is rebuilt)
    if not os.path.isdir(f"{sink}/_spark_metadata"):
        for p in (src, sink, ckpt):
            shutil.rmtree(p, ignore_errors=True)
        docs = _docs(spark, sf).select(
            "doc_id",
            "text",
            F.timestamp_seconds(
                F.lit(_WIN_BASE_EPOCH) + F.col("doc_id") * 60
            ).alias("ts"),
        )
        barrier = spark.createDataFrame(
            [(-1, "x")], "doc_id long, text string"
        ).select(
            "doc_id", "text",
            F.timestamp_seconds(F.lit(_WIN_BARRIER_EPOCH)).alias("ts"),
        )
        docs.unionByName(barrier).coalesce(1).write.parquet(src)
        windowed_ingest_stats(
            spark, src, sink_dir=sink, checkpoint_dir=ckpt,
            window_dur="1 hour", watermark_delay="30 minutes",
        )
    out = spark.read.schema(
        "win_start timestamp, win_end timestamp, n_docs long, n_tokens long"
    ).parquet(sink)
    return out.select(
        F.unix_timestamp("win_start").alias("win_start_epoch"),
        F.unix_timestamp("win_end").alias("win_end_epoch"),
        "n_docs",
        "n_tokens",
    )


_STREAM_WINDOW_SQL = f"""
WITH src AS (
  SELECT doc_id, text, ({_WIN_BASE_EPOCH} + doc_id * 60) AS ev FROM documents
)
SELECT (ev // 3600) * 3600 AS win_start_epoch,
       (ev // 3600) * 3600 + 3600 AS win_end_epoch,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM src GROUP BY (ev // 3600) * 3600
"""


# 64 CJK ideographs shared by the Spark construction and the DuckDB oracle
_CJK_CHARS = [chr(0x4E00 + j) for j in range(64)]


def _q_lang_dispatch(spark, sf):
    """LanguageBasedAnalyzer dispatch driving a MIXED corpus build: every
    5th doc becomes a deterministic 6-ideograph zh string (CJK bigram
    analyzer), the rest stay English (StandardAnalyzer). Queries one
    bigram through the segment store; the oracle replays bigrams via
    substr and English via split-minus-stopwords."""
    import hashlib
    import tempfile

    from clucene_spark.index.segments import SegmentStore, build_segments_fused
    from clucene_spark.search.wand import wand_query_direct

    chars = F.array(*[F.lit(c) for c in _CJK_CHARS])
    cjk_text = F.concat(
        *[
            F.element_at(chars, ((F.col("doc_id") * 7 + i * 13) % 64 + 1).cast("int"))
            for i in range(6)
        ]
    )
    docs = _docs(spark, sf).select("doc_id", "text")
    mixed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, cjk_text).otherwise(F.col("text")).alias("text"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("zh")).otherwise(F.lit("en")).alias("lang"),
    )
    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    d = f"{tempfile.gettempdir()}/clucene_idx_{tag}_lang"
    try:
        store = SegmentStore(spark, d)
    except FileNotFoundError:
        build_segments_fused(mixed, d, docs_per_segment=256, analyzer="lang",
                             lang_col="lang")
        store = SegmentStore(spark, d)
    # doc 0's first bigram: chars[0] + chars[13]
    bigram = _CJK_CHARS[0] + _CJK_CHARS[13]
    return wand_query_direct(store, [bigram], k=10)


_IVF_FIXED_CACHE: dict[str, str] = {}


def _q_ann_ivf_stored(spark, sf):
    """Same IVF algorithm as ann_ivf_topk but probed against the
    cluster-PARTITIONED store (ivf_write): identical results, so the same
    SQL oracle applies — this gates the partition-pruned read path."""
    import hashlib
    import os
    import tempfile

    from clucene_spark.pipeline.ann import ivf_topk_stored, ivf_write

    cents = [
        [float(x) for x in r["embedding"]]
        for r in _vecs(spark, sf).filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    if sf not in _IVF_FIXED_CACHE:
        tag = hashlib.md5(sf.encode()).hexdigest()[:8]
        path = f"{tempfile.gettempdir()}/clucene_ivf_fixed_{tag}"
        if not os.path.isdir(path):
            ivf_write(_vecs(spark, sf).select("vec_id", "embedding"), cents, path)
        _IVF_FIXED_CACHE[sf] = path
    return ivf_topk_stored(
        spark, _IVF_FIXED_CACHE[sf], cents, _query_vec(spark, sf, vec_id=3),
        k=10, n_probe=3,
    )


def _q_ann_ivf(spark, sf):
    from clucene_spark.pipeline.ann import ivf_topk

    cents = [
        [float(x) for x in r["embedding"]]
        for r in _vecs(spark, sf).filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    return ivf_topk(_vecs(spark, sf), cents, _query_vec(spark, sf, vec_id=3),
                    k=10, n_probe=3)


_IVF_STORE_CACHE: dict[str, tuple] = {}


def _q_ann_ivf_trained(spark, sf):
    """k-means-trained IVF over cluster-partitioned storage: the trainer is
    a deterministic seeded Lloyd's over a bounded sample, the corpus is
    written partitionBy(cluster), and the probe reads only its clusters'
    partitions. FULL oracle since r4: the DuckDB side replays the identical
    seeded trainer on the same sample rows and freezes the centroids as SQL
    constants (_ivf_trained_sql); recall vs brute force additionally
    pytest-gated in tests/test_pipeline.py."""
    import hashlib
    import os
    import tempfile

    from clucene_spark.pipeline.ann import ivf_topk_stored, ivf_write, kmeans_train

    if sf not in _IVF_STORE_CACHE:
        vecs = _vecs(spark, sf)
        cents = kmeans_train(vecs, k=8, n_iter=8, seed=42)
        tag = hashlib.md5(sf.encode()).hexdigest()[:8]
        path = f"{tempfile.gettempdir()}/clucene_ivf_{tag}"
        if not os.path.isdir(path):
            ivf_write(vecs.select("vec_id", "embedding"), cents, path)
        _IVF_STORE_CACHE[sf] = (path, cents)
    path, cents = _IVF_STORE_CACHE[sf]
    q = _query_vec(spark, sf, vec_id=7)
    return ivf_topk_stored(spark, path, cents, q, k=10, n_probe=3)


_IVFPQ_STORE_CACHE: dict[str, tuple] = {}


def _q_ann_ivfpq(spark, sf):
    """IVF-PQ (Jegou et al. 2011 / FAISS IVFPQ layout): coarse k-means
    partitions + per-subspace product-quantization codes + two-stage query
    (partition-pruned ADC scan over the 8-byte codes column -> shortlist ->
    exact-cosine rerank reading original vectors for the shortlist alone).
    Both trainers are the deterministic seeded Lloyd's core, so the DuckDB
    oracle replays training on the same sample rows and freezes coarse
    centroids, codebooks AND the query's ADC lookup table as SQL constants
    (`_ivfpq_sql`) — the frozen-constant pattern of `ann_ivf_trained_topk`.
    Recall vs brute force is additionally pytest-gated."""
    import hashlib
    import os
    import tempfile

    from clucene_spark.pipeline.ann import (
        ivfpq_topk_stored,
        ivfpq_write,
        kmeans_train,
        pq_train,
    )

    if sf not in _IVFPQ_STORE_CACHE:
        vecs = _vecs(spark, sf)
        cents = kmeans_train(vecs, k=8, n_iter=8, seed=42)
        books = pq_train(vecs, n_sub=8, n_codes=16, n_iter=8, seed=7)
        tag = hashlib.md5(sf.encode()).hexdigest()[:8]
        path = f"{tempfile.gettempdir()}/clucene_ivfpq_{tag}"
        if not os.path.isdir(path):
            ivfpq_write(vecs.select("vec_id", "embedding"), cents, books, path)
        _IVFPQ_STORE_CACHE[sf] = (path, cents, books)
    path, cents, books = _IVFPQ_STORE_CACHE[sf]
    q = _query_vec(spark, sf, vec_id=11)
    return ivfpq_topk_stored(
        spark, path, cents, books, q, k=10, n_probe=3, shortlist=50
    )


def _q_mm_features(spark, sf):
    from clucene_spark.pipeline.multimodal import attach_media, extract_features

    feats = extract_features(attach_media(_docs(spark, sf)), fake=True)
    return feats.select("media_id", "n_bytes", "digest60").orderBy("media_id")


def _q_mm_frames(spark, sf):
    from clucene_spark.pipeline.multimodal import attach_media, frame_sample_stub

    return frame_sample_stub(attach_media(_docs(spark, sf)), every_n=10).orderBy(
        "media_id", "frame_no"
    )


def _q_lang_id(spark, sf):
    from clucene_spark.pipeline.textstats import lang_id

    return lang_id(_docs(spark, sf)).orderBy("doc_id")


def _q_quality(spark, sf):
    from clucene_spark.pipeline.textstats import quality_score

    return quality_score(_docs(spark, sf)).orderBy("doc_id")


def _q_token_counts(spark, sf):
    from clucene_spark.pipeline.textstats import token_counts

    return token_counts(_docs(spark, sf)).orderBy("doc_id")


def _q_fingerprint(spark, sf):
    from clucene_spark.pipeline.textstats import fingerprint

    return fingerprint(_docs(spark, sf)).orderBy("doc_id")


def _q_repetition(spark, sf):
    from clucene_spark.pipeline.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf)).orderBy("doc_id")


def _q_sample_stratified(spark, sf):
    from clucene_spark.pipeline.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (
        stratified_sample(docs, fraction=0.5,
                          fractions={"src3": 1.0, "src7": 0.1})
        .select("doc_id", "source", "u")
        .orderBy("doc_id")
    )


def _q_ppl_buckets(spark, sf):
    """CCNet-style perplexity bucketing: head/middle/tail terciles per
    language by the corpus-trained bigram LM score (pipeline/textstats.py
    ppl_buckets); the oracle chains the text_lm_score CTE with the same
    ntile window over (rounded avg_logp DESC, doc_id ASC)."""
    from clucene_spark.pipeline.textstats import ppl_buckets

    return ppl_buckets(_docs(spark, sf), by="lang").orderBy("doc_id")


def _q_collapse(spark, sf):
    """Field collapsing: BM25 'spark' top-10 with at most one hit per
    source — each source represented by its best (score DESC, doc_id
    ASC) hit; oracle replays the group-best with a rank window over the
    same rounded scores."""
    return _searcher(spark, sf).topk_collapse(
        TermQuery(term="spark"), "source", k=10, round_to=4
    )


def _q_suggest(spark, sf):
    """Did-you-mean: suggestions for the misspelling 'sport' — two
    corpus terms clear the cutoff with distinct sims ('sort' 0.75,
    'spark' 0.6 at prefixLength 1). Ranked (sim DESC, df DESC, term
    ASC); the oracle replays the FuzzyTermEnum suffix-Levenshtein
    similarity and the rw_boost round-trip arithmetic on the term
    dictionary."""
    return _searcher(spark, sf).suggest(
        "sport", k=5, prefix_length=1, min_similarity=0.5
    )


def _q_term_page2(spark, sf):
    """Cursor deep-paging: page 2 of the BM25 'spark' ranking via
    search-after (engine.topk_after) — the cursor is page 1's last
    (score, doc_id); the oracle states the same page as OFFSET 10 of
    the total (score DESC, doc_id ASC) order. Equivalent results, but
    the cursor form is the one that scales: offset n ships n+k rows
    per shard to the merger, strict-after filters before the
    per-partition bounded top-k."""
    s = _searcher(spark, sf)
    page1 = s.topk(TermQuery(term="spark"), 10, round_to=4).collect()
    last = page1[-1]
    return s.topk_after(
        TermQuery(term="spark"), 10,
        after=(last["score"], last["doc_id"]), round_to=4,
    )


def _q_sample_mixture(spark, sf):
    """Domain-mixture resampling with fractional epochs: src3 upsampled
    to 2.5 epochs (2 copies + a deterministic-hash half get a 3rd),
    src7 downsampled to 0.25, everything else passes through once.
    Expected copies == rate exactly; which docs get the fractional copy
    is the same (stratum, doc_id, seed) hash the oracle replays."""
    from clucene_spark.pipeline.sampling import mixture_sample

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (
        mixture_sample(docs, rates={"src3": 2.5, "src7": 0.25})
        .select("doc_id", "source", "epoch", "n_copies")
        .orderBy("doc_id", "epoch")
    )


def _q_mlt(spark, sf):
    """MoreLikeThis: doc 42's top-5 tf-idf terms (classic ln(N/(df+1))+1
    idf, reference Similarity.cpp:227-229) as a SHOULD query, seed doc
    excluded; the oracle replays term selection AND BM25 scoring."""
    from clucene_spark.search.mlt import more_like_this

    return more_like_this(
        _searcher(spark, sf), 42, max_terms=5, k=10, round_to=4
    )


def _q_bm25f(spark, sf):
    """BM25F (Zaragoza/Robertson) over the two-field corpus: title
    boosted 2x, per-field length normalization, ONE saturation over the
    combined weighted tf — the canonical web-search field-weighted
    scorer; oracle replays the exact formula over the fielded token
    CTE."""
    from clucene_spark.search.bm25f import bm25f_topk

    idx, _ = _fielded_index(spark, sf)
    return bm25f_topk(
        idx, ["spark", "join"], weights={"title": 2.0, "text": 1.0}, k=10
    )


def _q_index_fsck(spark, sf):
    """CheckIndex-style integrity audit over the compacted gate store:
    every structural invariant (UTF-16 term order, posting docID order,
    df/cf totals, inline-dl vs doc_lens, per-16-block WAND stats)
    re-verified from the raw segment files; the oracle recomputes the
    expected check cardinalities from the raw text (and demands
    n_bad == 0 everywhere)."""
    from clucene_spark.index.fsck import check_index

    store = _store(spark, sf, compacted=True)
    return (
        check_index(spark, store.index_dir)
        .filter(F.col("segment") != "_store")
        .groupBy("check")
        .agg(F.sum("n_checked").alias("n_checked"),
             F.sum("n_bad").alias("n_bad"))
        .orderBy("check")
    )


def _q_sample_dsir(spark, sf):
    """DSIR importance resampling (Xie et al. 2023): select 100 docs
    whose hashed unigram+bigram distribution looks most like the
    src0 target slice, via Gumbel-top-k over integer-micro-nat
    importance weights — every step (md5 buckets, Laplace log-ratio,
    exact int64 weight sum, hash-uniform Gumbel keys) is replayed
    verbatim by the oracle."""
    from clucene_spark.pipeline.dsir import dsir_resample

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    target = docs.filter(F.col("source") == "src0")
    return dsir_resample(docs, target, k=100, n_buckets=512, seed=42)


def _q_sample_cap(spark, sf):
    from clucene_spark.pipeline.sampling import per_stratum_cap

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (
        per_stratum_cap(docs, cap=10)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )



def _q_pii(spark, sf):
    """PII detect+redact over docs with deterministically planted PII
    (every 7th doc gets an email, an IPv4, and a phone number appended);
    the oracle replays the identical construction)."""
    from clucene_spark.pipeline.textstats import pii_stats

    docs = _docs(spark, sf)
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.format_string(
                    " contact user%d@example.com from 10.1.2.%d call +1 555 123 4567",
                    F.col("doc_id"),
                    F.col("doc_id") % 250,
                ),
            ),
        ).otherwise(F.col("text")),
    )
    return pii_stats(planted).orderBy("doc_id")


_BATCH_QUERIES = {
    "q1": ["spark"],
    "q2": ["spark", "join"],
    "q3": ["vector"],
    "q4": ["data", "stream", "window"],
}


def _q_batch_topk(spark, sf):
    """Batch query execution: the whole query set scored in ONE job (one
    postings scan amortized across queries, per-query rank window). Scores
    are the same BM25 sums as the single-query gates; the oracle joins the
    same VALUES query set against the shared bm25 prelude."""
    return _searcher(spark, sf).batch_topk(_BATCH_QUERIES, k=5)


def _q_quantize_int8(spark, sf):
    """Symmetric per-vector int8 quantization (ann.quantize_int8): gate
    digests the code vector as scalar reductions (sum, abs-sum, saturation
    count) plus the dequantized-vs-original cosine — the oracle evaluates
    the identical Catalyst arithmetic as SQL lambdas."""
    from clucene_spark.pipeline.ann import _dot, _norm, dequantize_col, quantize_int8

    qz = quantize_int8(_vecs(spark, sf))
    e = F.col("embedding").cast("array<double>")
    dq = dequantize_col(F.col("q"), F.col("scale"))
    return qz.select(
        "vec_id",
        F.round("scale", 9).alias("scale_r"),
        F.aggregate(F.col("q"), F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("sum_q"),
        F.aggregate(F.col("q"), F.lit(0).cast("long"),
                    lambda a, x: a + F.abs(x)).alias("sum_abs_q"),
        F.size(F.filter(F.col("q"), lambda x: F.abs(x) == 127))
        .cast("int").alias("n_sat"),
        F.round(_dot(e, dq) / (_norm(e) * _norm(dq)), 4).alias("cos_dq"),
    ).orderBy("vec_id")


def _q_ann_int8(spark, sf):
    """Cosine top-k over the int8-quantized corpus (4x scan compression;
    codes+scale reconstruct the vector in-plan). Oracle replays the
    quantization arithmetic in SQL lambdas and scores the dequantized
    vectors with the shared cosine template."""
    from clucene_spark.pipeline.ann import cosine_topk_quantized, quantize_int8

    qz = quantize_int8(_vecs(spark, sf))
    return cosine_topk_quantized(qz, _query_vec(spark, sf, vec_id=5), k=10)


def _q_shard_assign(spark, sf):
    """Deterministic training-shard assignment (pipeline/shards.py):
    shard = portable md5-60 of '{seed}:{doc_id}' mod n — stable under any
    reordering/repartitioning; the oracle recomputes it from the same
    md5 bytes."""
    from clucene_spark.pipeline.shards import shard_assign

    return (
        shard_assign(_docs(spark, sf), n_shards=8)
        .select("doc_id", "shard")
        .orderBy("doc_id")
    )


def _q_corpus_shuffle(spark, sf):
    """Deterministic training-order shuffle (pipeline/shards.py
    corpus_shuffle): seeded-hash rank WITHIN each shard — a per-shard
    window sort, never a global ORDER BY; the oracle replays the identical
    md5-60 shard + shuffle keys."""
    from clucene_spark.pipeline.shards import corpus_shuffle

    return (
        corpus_shuffle(_docs(spark, sf), n_shards=8)
        .select("doc_id", "shard", F.col("rank").cast("long").alias("rank"))
        .orderBy("doc_id")
    )


def _q_pack_sequences(spark, sf):
    """Concat-and-split sequence packing (seq_len 512) — distributed
    two-pass cumulative sum, never a single-partition window."""
    from clucene_spark.pipeline.sampling import pack_sequences

    return pack_sequences(_docs(spark, sf), seq_len=512, n_ranges=16).orderBy("doc_id")



def _q_stream_dedup(spark, sf):
    """Stateful-streaming exact dedup (applyInPandasWithState): drain the
    planted-dup corpus as a MULTI-batch file stream (one file per
    trigger), updates appended to a KEYED PARQUET SINK (batch_id-stamped
    merge-on-read log, r4 — no driver-side state), final table = one
    max_by(batch_id) aggregation over the log. Equal to the batch
    GROUP BY because the per-key fold is order/batch invariant."""
    import hashlib
    import shutil
    import tempfile

    from clucene_spark.pipeline.dedup import with_planted_dups
    from clucene_spark.streaming.stateful import stream_exact_dedup

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    base = f"{tempfile.gettempdir()}/clucene_sddp_{tag}"
    src_dir, ckpt, sink = f"{base}_src", f"{base}_ckpt", f"{base}_sink"
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink, ignore_errors=True)
    corpus = with_planted_dups(_docs(spark, sf), every=10, keep_frac=1.0)
    corpus.select("doc_id", "text").repartition(2).write.parquet(src_dir)
    out = stream_exact_dedup(
        spark, src_dir, checkpoint_dir=ckpt, max_files_per_trigger=1,
        sink_dir=sink,
    )
    return out.orderBy("h", "len")



def _q_wav_stats(spark, sf):
    """REAL multimodal decode end-to-end: per doc, build a genuine PCM WAV
    payload (samples from closed-form integer arithmetic, stdlib wave
    encoder), decode it back with the stdlib parser inside audio_stats,
    and emit exact-int clip statistics. The oracle replays the sample
    arithmetic in SQL — if the WAV encode/decode path corrupted a single
    sample, sum_sq/peak would mismatch."""
    import numpy as np
    import pandas as pd

    from clucene_spark.pipeline.multimodal import audio_stats, encode_wav

    docs = _docs(spark, sf).select("doc_id")

    def _mk(batches):
        for pdf in batches:
            ids, pays = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 50 + did % 20
                i = np.arange(n, dtype=np.int64)
                s = ((did * 7919 + i * 104729) % 65536 - 32768).astype("<i2")
                ids.append(did)
                pays.append(encode_wav(s, 8000))
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"), "payload": pays}
            )

    media = docs.mapInPandas(_mk, "media_id long, payload binary")
    return audio_stats(media).orderBy("media_id")



def _q_jpeg_stats(spark, sf):
    """REAL baseline-JPEG codec end-to-end (pipeline/jpeg.py, ITU T.81
    sequential DCT): per doc, build a smooth closed-form RGB gradient,
    encode it as a genuine JFIF payload (4:4:4 for even doc_ids, 4:2:0
    for odd — both MCU layouts exercised), decode it back through the
    marker-walk + Huffman + dequant + IDCT path, and emit exact dims plus
    a pixel-tolerance verdict (max abs error <= 2; measured worst over
    this corpus = 1 at q95). JPEG is lossy, so the oracle pins the
    SQL-computable facts — dims and the tolerance holding everywhere —
    rather than a pixel hash; any corrupted byte in either codec half
    breaks `ok` for some doc and flips the value hash."""
    import numpy as np
    import pandas as pd

    from clucene_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    docs = _docs(spark, sf).select("doc_id")

    def _roundtrip(batches):
        for pdf in batches:
            ids, ws, hs, oks = [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 10 + did % 7
                h = 9 + did % 5
                base = did % 97
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = (20 + base + 3 * y + 2 * x + 11 * c).astype(np.uint8)
                d = decode_jpeg(
                    encode_jpeg(px, quality=95, subsample=(did % 2 == 1))
                )
                err = int(np.abs(d["pixels"].astype(int) - px.astype(int)).max())
                ids.append(did)
                ws.append(d["width"])
                hs.append(d["height"])
                oks.append(err <= 2)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "ok": pd.Series(oks, dtype="bool"),
                }
            )

    return docs.mapInPandas(
        _roundtrip, "media_id long, width int, height int, ok boolean"
    ).orderBy("media_id")


def _q_png_stats(spark, sf):
    """REAL PNG decode end-to-end: per doc, build a genuine PNG payload
    (RGB pixels from closed-form integer arithmetic, filter-0 scanlines,
    stdlib zlib IDAT, CRC-correct chunks), decode it back with the stdlib
    inflate + scanline-unfilter parser inside image_stats, and emit
    exact-int pixel statistics. The oracle replays the pixel arithmetic in
    SQL — a single corrupted byte anywhere in the encode/decode path
    shifts sum_px."""
    import numpy as np
    import pandas as pd

    from clucene_spark.pipeline.multimodal import encode_png, image_stats

    docs = _docs(spark, sf).select("doc_id")

    def _mk(batches):
        for pdf in batches:
            ids, pays = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 6 + did % 5
                h = 4 + did % 4
                y, x, ch = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((did * 31 + y * 17 + x * 7 + ch * 3) % 256).astype(np.uint8)
                ids.append(did)
                pays.append(encode_png(px))
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"), "payload": pays}
            )

    media = docs.mapInPandas(_mk, "media_id long, payload binary")
    return image_stats(media).orderBy("media_id")


def _q_lm_score(spark, sf):
    """Corpus-trained bigram LM scoring (perplexity-filter stage); the
    per-doc log-prob sum is an ordered left fold so both engines add the
    same doubles in the same order."""
    from clucene_spark.pipeline.textstats import lm_score

    return lm_score(_docs(spark, sf)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# pipeline oracle SQL (DuckDB) — mirrors the Spark constructions exactly;
# hashes are md5-hex-prefix casts so both engines compute identical values
# ---------------------------------------------------------------------------

def _dup_corpus_sql(keep_frac: float) -> str:
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(toks[1:greatest(1, CAST(floor(len(toks) * {keep_frac}) AS INT))], ' ') AS text
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE doc_id % 10 = 0
)
"""


_SHINGLE_JPAIRS_CTE = """
, tokd AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
, sh AS (
    SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i
          FROM tokd)
)
, cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
, inter AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
    FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY 1, 2
)
, jp AS (
    SELECT i.a, i.b,
           ROUND(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
    FROM inter i JOIN cnt ca ON ca.doc_id = i.a JOIN cnt cb ON cb.doc_id = i.b
    WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.5
)
"""

_SHINGLE_JACCARD_SQL = _SHINGLE_JPAIRS_CTE + """
SELECT a, b, jaccard FROM jp ORDER BY a, b
"""

_CLUSTER_BEST_SQL = """
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' zq1 zq2 zq3 zq4' AS text
  FROM documents WHERE doc_id % 10 = 0
)
""" + _SHINGLE_JPAIRS_CTE + """
, edges AS (SELECT a AS u, b AS v FROM jp UNION SELECT b, a FROM jp)
, reach(node, comp) AS (
    SELECT doc_id, doc_id FROM corpus
  UNION
    SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node
)
, comps AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node)
, sc AS (SELECT c.node, c.component, len(string_split(t.text, ' ')) AS q
         FROM comps c JOIN corpus t ON t.doc_id = c.node)
, rk AS (SELECT node, component,
                row_number() OVER (PARTITION BY component
                                   ORDER BY q DESC, node ASC) AS rn
         FROM sc)
SELECT node AS doc_id, component,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS keep
FROM rk ORDER BY doc_id
"""

# Duplicate-cluster canonicalization: min reachable doc_id per node over the
# UNDIRECTED pair graph (recursive CTE = transitive closure; the Spark side
# computes the same fixpoint with large-star/small-star, pipeline/graph.py).
# MinHash banded pairs == exact-Jaccard pairs here (32x1 bands at J>=0.5:
# miss probability <= (1 - 0.5^1)^32 ~ 2e-10 per pair), so the exact-pairs
# closure is a valid oracle for the LSH-fed component labels.
_CLUSTER_CANONICAL_SQL = _SHINGLE_JPAIRS_CTE + """
, edges AS (SELECT a AS u, b AS v FROM jp UNION SELECT b, a FROM jp)
, reach(node, comp) AS (
    SELECT doc_id, doc_id FROM corpus
  UNION
    SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS doc_id, MIN(comp) AS component,
       CAST(CASE WHEN MIN(comp) = node THEN 1 ELSE 0 END AS INT) AS keep
FROM reach GROUP BY node ORDER BY doc_id
"""


def _simhash_sql(bits: int = 32, max_hamming: int = 4) -> str:
    sums = ", ".join(
        f"sum(tf * (CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) AS s{j}"
        for j in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(bits)
    )
    return (
        _dup_corpus_sql(0.8)
        + f"""
, tk AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM corpus)
    WHERE term <> '' GROUP BY doc_id, term)
, th AS (SELECT doc_id, tf, ('0x'||substr(md5(term),1,15))::BIGINT AS h FROM tk)
, sums AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id)
, sig AS (SELECT doc_id, {sig} AS simhash FROM sums)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM sig x JOIN sig y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
ORDER BY a, b
"""
    )


_VEC_CORPUS_SQL = """
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id,
         list_prepend(embedding[1]::DOUBLE + 0.05, (embedding[2:64])::DOUBLE[]) AS e
  FROM embeddings WHERE vec_id % 10 = 0
)
"""

_COS_SQL = "list_inner_product({a}, {b}) / (sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b})))"


def _lang_dispatch_sql() -> str:
    """Replays the mixed en/zh corpus + per-language tokenization: zh rows
    become character bigrams (substr is character-based in DuckDB), en rows
    split-minus-stopwords — the LanguageBasedAnalyzer dispatch."""
    lst = "[" + ",".join(f"'{c}'" for c in _CJK_CHARS) + "]"
    cjk_text = " || ".join(
        f"({lst})[((doc_id*7 + {i}*13) % 64) + 1]" for i in range(6)
    )
    bigram = _CJK_CHARS[0] + _CJK_CHARS[13]
    return f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN {cjk_text} ELSE text END AS text,
         CASE WHEN doc_id % 5 = 0 THEN 'zh' ELSE 'en' END AS lang
  FROM documents),
entok AS (
  SELECT doc_id,
         unnest(list_filter({_TOKS_SQL}, x -> x NOT IN {_STOP33_SQL})) AS term
  FROM corpus WHERE lang = 'en'),
zhtok AS (
  SELECT doc_id, substr(text, i, 2) AS term
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 1)) AS i
        FROM corpus WHERE lang = 'zh')),
tok AS (SELECT * FROM entok UNION ALL SELECT * FROM zhtok),
postings AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
doc_lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
term_dict AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM doc_lens)
SELECT p.doc_id,
       ROUND(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))
             * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)), 4) AS score
FROM postings p JOIN term_dict t USING (term) JOIN doc_lens d USING (doc_id)
CROSS JOIN stats s
WHERE p.term = '{bigram}'
ORDER BY score DESC, p.doc_id ASC LIMIT 10
"""


def _emb_neardup_sql(threshold: float = 0.99, n_planes: int = 8,
                     seed: int = 42, dim: int = 64) -> str:
    """Replays embedding_neardup_pairs exactly: the SAME hyperplane
    constants (ann.hyperplanes) embedded as literals, sign-bit bucket,
    flip-1 multi-probe, within-bucket cosine filter."""
    from clucene_spark.pipeline.ann import hyperplanes

    planes = hyperplanes(n_planes, seed, dim)
    bits = []
    for j in range(n_planes):
        lst = "[" + ", ".join(repr(float(x)) for x in planes[j]) + "]"
        bits.append(
            f"(CASE WHEN list_inner_product(e, {lst}) > 0 "
            f"THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        )
    bucket = " + ".join(bits)
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << j}::BIGINT)" for j in range(n_planes)]
    )
    return _VEC_CORPUS_SQL + f"""
, bk AS (SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS nrm,
                {bucket} AS bucket FROM corpus)
, pr AS (SELECT vec_id, e, nrm, unnest([{probes}]) AS pb FROM bk)
SELECT * FROM (
  SELECT x.vec_id AS a, y.vec_id AS b,
         ROUND(list_inner_product(x.e, y.e) / (x.nrm * y.nrm), 4) AS cosine
  FROM pr x JOIN bk y ON x.pb = y.bucket AND x.vec_id < y.vec_id) t
WHERE cosine >= {threshold}
ORDER BY a, b
"""


def _ann_brute_sql(qid: int = 7) -> str:
    cos = _COS_SQL.format(a="embedding::DOUBLE[]", b="qe")
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {qid})
SELECT vec_id, ROUND({cos}, 4) AS cosine
FROM embeddings, q
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


_D2_SQL = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1]-p[2])*(p[1]-p[2])))"

_IVF_SQL = f"""
WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < 8),
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 3),
probe AS (
  SELECT cid FROM c, q
  ORDER BY ROUND({_D2_SQL.format(a='qe', b='ce')}, 9) ASC, cid ASC
  LIMIT 3
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
assign AS (
  SELECT vec_id, e, cluster FROM (
    SELECT v.vec_id, v.e, c.cid AS cluster,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY ROUND({_D2_SQL.format(a='v.e', b='c.ce')}, 9) ASC, c.cid ASC
           ) AS rn
    FROM v CROSS JOIN c) t
  WHERE rn = 1
)
SELECT a.vec_id, ROUND({_COS_SQL.format(a='a.e', b='qe')}, 4) AS cosine
FROM assign a JOIN probe p ON a.cluster = p.cid, q
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


def _ivf_trained_sql(qid: int = 7, k: int = 8, n_iter: int = 8, seed: int = 42,
                     sample: int = 4096, n_probe: int = 3) -> str:
    """Oracle for the k-means-TRAINED IVF (`ann_ivf_trained_topk`).

    The trainer is deterministic (seeded Lloyd's over the first `sample`
    rows by vec_id — `ann.kmeans_fit`), so the oracle replays the IDENTICAL
    training on the same rows read straight from the oracle parquet (DuckDB
    fetch, no Spark; FLOAT storage widens to float64 exactly on both
    engines), freezes the trained centroids as DOUBLE[] constants via
    repr() (round-trip exact), and runs the same fixed-centroid IVF SQL as
    `ann_ivf_topk` with the constants in place of the `c` CTE — the pattern
    the 8-plane embedding gate established. The oracle reads the driver's
    compare scale (sf0.01 by default; SPARK_GRAFT_ORACLE_SF_DIR overrides
    for local checks at other scales)."""
    import os

    import duckdb

    from clucene_spark.pipeline.ann import kmeans_fit

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"ORDER BY vec_id LIMIT {sample}"
    ).fetchall()
    con.close()
    C = kmeans_fit([list(r[0]) for r in rows], k=k, n_iter=n_iter, seed=seed)
    vals = ",\n  ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(float(x)) for x in c))
        for i, c in enumerate(C)
    )
    return f"""
WITH c AS (SELECT * FROM (VALUES
  {vals}) AS t(cid, ce)),
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {qid}),
probe AS (
  SELECT cid FROM c, q
  ORDER BY ROUND({_D2_SQL.format(a='qe', b='ce')}, 9) ASC, cid ASC
  LIMIT {n_probe}
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
assign AS (
  SELECT vec_id, e, cluster FROM (
    SELECT v.vec_id, v.e, c.cid AS cluster,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY ROUND({_D2_SQL.format(a='v.e', b='c.ce')}, 9) ASC, c.cid ASC
           ) AS rn
    FROM v CROSS JOIN c) t
  WHERE rn = 1
)
SELECT a.vec_id, ROUND({_COS_SQL.format(a='a.e', b='qe')}, 4) AS cosine
FROM assign a JOIN probe p ON a.cluster = p.cid, q
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""

def _ivfpq_sql(qid: int = 11, k_coarse: int = 8, n_iter: int = 8,
               seed: int = 42, pq_seed: int = 7, n_sub: int = 8,
               n_codes: int = 16, sample: int = 4096, n_probe: int = 3,
               shortlist: int = 50, k: int = 10) -> str:
    """Oracle for IVF-PQ (`ann_ivfpq_topk`).

    Replays BOTH deterministic trainers (coarse `kmeans_fit`, subspace
    `pq_fit`) on the same sample rows read straight from the oracle parquet
    and freezes three constant sets into the SQL: coarse centroids, the
    n_sub x n_codes codebooks, and the query's ADC lookup table
    (`adc_lut` on the identical float64 inputs -> bit-identical literals on
    both engines). The SQL then recomputes, per probed vector, the PQ code
    per subspace (argmin of ROUND(d2, 9), ties to the lowest code — the
    `pq_encode` contract), sums the LUT entries in the same left-associative
    m=0..n_sub-1 order as `adc_score_col`, takes the `shortlist` by
    (adc DESC, vec_id ASC) and reranks by exact cosine — mirroring
    `ivfpq_topk_stored` end to end."""
    import os

    import duckdb

    from clucene_spark.pipeline.ann import adc_lut, kmeans_fit, pq_fit

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"ORDER BY vec_id LIMIT {sample}"
    ).fetchall()
    qrow = con.execute(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"WHERE vec_id = {qid}"
    ).fetchone()
    con.close()
    X = [list(r[0]) for r in rows]
    C = kmeans_fit(X, k=k_coarse, n_iter=n_iter, seed=seed)
    books = pq_fit(X, n_sub=n_sub, n_codes=n_codes, n_iter=n_iter, seed=pq_seed)
    lut = adc_lut(books, [float(x) for x in qrow[0]])
    dsub = len(books[0][0])

    cvals = ",\n  ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(float(x)) for x in c))
        for i, c in enumerate(C)
    )
    cbvals = ",\n  ".join(
        "({}, {}, [{}]::DOUBLE[])".format(
            m, j, ", ".join(repr(float(x)) for x in books[m][j])
        )
        for m in range(n_sub)
        for j in range(n_codes)
    )
    # left-associative ADC sum in the exact adc_score_col order m=0..n_sub-1
    adc_expr = " + ".join(
        "list_extract([{}]::DOUBLE[], c{} + 1)".format(
            ", ".join(repr(float(x)) for x in lut[m]), m
        )
        for m in range(n_sub)
    )
    code_cols = ",\n    ".join(
        f"MAX(CASE WHEN m = {m} THEN code END) AS c{m}" for m in range(n_sub)
    )
    sub_slice = f"list_slice(pv.e, cb.m*{dsub}+1, cb.m*{dsub}+{dsub})"
    return f"""
WITH c AS (SELECT * FROM (VALUES
  {cvals}) AS t(cid, ce)),
cb AS (SELECT * FROM (VALUES
  {cbvals}) AS t(m, code, ce)),
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {qid}),
probe AS (
  SELECT cid FROM c, q
  ORDER BY ROUND({_D2_SQL.format(a='qe', b='ce')}, 9) ASC, cid ASC
  LIMIT {n_probe}
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
assign AS (
  SELECT vec_id, e, cluster FROM (
    SELECT v.vec_id, v.e, c.cid AS cluster,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY ROUND({_D2_SQL.format(a='v.e', b='c.ce')}, 9) ASC, c.cid ASC
           ) AS rn
    FROM v CROSS JOIN c) t
  WHERE rn = 1
),
pv AS (SELECT a.vec_id, a.e FROM assign a JOIN probe p ON a.cluster = p.cid),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT pv.vec_id, cb.m, cb.code,
           ROW_NUMBER() OVER (
             PARTITION BY pv.vec_id, cb.m
             ORDER BY ROUND({_D2_SQL.format(a=sub_slice, b='cb.ce')}, 9) ASC,
                      cb.code ASC
           ) AS rn
    FROM pv CROSS JOIN cb) t
  WHERE rn = 1
),
cw AS (
  SELECT vec_id,
    {code_cols}
  FROM codes GROUP BY vec_id
),
adc AS (SELECT vec_id, ROUND({adc_expr}, 9) AS adc FROM cw),
short AS (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id ASC LIMIT {shortlist})
SELECT pv.vec_id, ROUND({_COS_SQL.format(a='pv.e', b='qe')}, 4) AS cosine
FROM pv JOIN short USING (vec_id), q
ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


# StandardAnalyzer prelude: split-minus-stopwords with DENSE post-stop
# positions (the DFA chain's output on this clean lowercase corpus)
def _prelude_std() -> str:
    return f"""
WITH tokens0 AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS rawpos
  FROM documents
),
tok0 AS (SELECT * FROM tokens0 WHERE term <> '' AND term NOT IN {_STOP33_SQL}),
tok AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) - 1 AS pos
  FROM tok0
),
postings AS (
  SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id
),
doc_lens AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
),
term_dict AS (
  SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
  FROM postings GROUP BY term
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM doc_lens
),
bm25 AS (
  SELECT p.doc_id, p.term,
         ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS sc,
         t.df, p.tf, d.dl, s.n_docs, s.avgdl
  FROM postings p
  JOIN term_dict t USING (term)
  JOIN doc_lens d USING (doc_id)
  CROSS JOIN stats s
)
"""


def _sloppy_topk_sql(terms: list[str], slop: int, k: int = 10) -> str:
    """DuckDB replay of the reference SloppyPhraseScorer window walk
    (search/SloppyPhraseScorer.cpp:35-171) as a recursive-CTE state
    machine, then BM25(tf=phrase_freq) top-k — the oracle twin of
    clucene_spark/search/sloppy.py.

    Per doc the state is (index per query slot, phase, window bookkeeping,
    freq); one recursion step = one PhraseQueue pop ('pop' phase) or one
    nextPosition() advance of the popped slot ('walk' phase). Two
    generation-time simplifications are exact for this engine: (a) slots
    repeat iff they share a term, and same-term slots share one position
    list, so "collides on an actual term position" reduces to index
    equality; (b) the repeat init (initPhrasePositions advancing higher
    offsets first) therefore has a closed form — within a repeat group in
    descending slot order, rank m takes index m+1 and the last (lowest)
    slot keeps 0, valid only when the doc has >= group-size occurrences.
    """
    # each element of `terms` is a single term (str) or a slot of term
    # ALTERNATIVES (list) — the MultiPhraseQuery model, whose sloppy
    # scorer walks the per-slot UNION of positions
    def _key(t):
        return (t,) if isinstance(t, str) else tuple(sorted(set(t)))

    n = len(terms)
    keys = [_key(t) for t in terms]
    dkeys = list(dict.fromkeys(keys))
    cte_of = {k: f"pt{j}" for j, k in enumerate(dkeys)}
    groups: dict[tuple, list[int]] = {}
    for i, kk in enumerate(keys):
        groups.setdefault(kk, []).append(i)
    init_idx = [0] * n
    siblings: list[list[int]] = [[] for _ in range(n)]
    for slots in groups.values():
        for s in slots:
            siblings[s] = [j for j in slots if j != s]
        if len(slots) > 1:
            desc = sorted(slots, reverse=True)
            for rank, s in enumerate(desc[:-1]):
                init_idx[s] = rank + 1

    # per-slot position CTEs (shared across duplicate slots; alternatives
    # of one slot never share a position, so the union list stays sorted
    # and distinct without a DISTINCT pass)
    def _term_pred(k: tuple) -> str:
        if len(k) == 1:
            return f"term = '{k[0]}'"
        return "term IN (" + ", ".join(f"'{t}'" for t in k) + ")"

    pts = ",\n".join(
        f"{cte_of[k]} AS (SELECT doc_id, list(pos ORDER BY pos) AS ps "
        f"FROM tok WHERE {_term_pred(k)} GROUP BY doc_id)"
        for k in dkeys
    )
    seed_lists = ", ".join(f"{cte_of[keys[i]]}.ps AS l{i}" for i in range(n))
    seed_joins = cte_of[dkeys[0]] + "".join(
        f" JOIN {cte_of[k]} USING (doc_id)" for k in dkeys[1:]
    )
    group_guards = [
        f"len({cte_of[k]}.ps) >= {len(slots)}"
        for k, slots in groups.items()
        if len(slots) > 1
    ]
    seed_where = ("WHERE " + " AND ".join(group_guards)) if group_guards else ""
    end0 = "greatest(" + ", ".join(
        f"l{i}[{init_idx[i] + 1}] - {i}" for i in range(n)
    ) + ")" if n > 1 else f"l0[{init_idx[0] + 1}]"
    seed_idx = ", ".join(f"{init_idx[i]} AS i{i}" for i in range(n))

    # level-1 derived: current pp positions q_i = l_i[idx+1] - offset
    qcols = ", ".join(f"l{i}[i{i} + 1] - {i} AS q{i}" for i in range(n))

    def case_by_popped(fmt: str) -> str:
        whens = " ".join(f"WHEN {m} THEN {fmt.format(m=m)}" for m in range(n))
        return f"CASE popped {whens} END"

    def least_others(m: int) -> str:
        others = [f"q{j}" for j in range(n) if j != m]
        return others[0] if len(others) == 1 else "least(" + ", ".join(others) + ")"

    # PhraseQueue pop: min (position, offset) — sequential <= keeps the
    # lowest offset on ties (_PhraseQueue.h:25-35)
    pm_whens = []
    for m in range(n - 1):
        pm_whens.append(f"WHEN q{m} <= {least_others(m)} THEN {m}")
    pm_expr = "CASE " + " ".join(pm_whens) + f" ELSE {n - 1} END"
    pnext_expr = "CASE pm " + " ".join(
        f"WHEN {m} THEN {least_others(m)}" for m in range(n)
    ) + " END"
    pstart_expr = "CASE pm " + " ".join(
        f"WHEN {m} THEN q{m}" for m in range(n)
    ) + " END"

    # walk intermediates for the popped slot
    cur_expr = case_by_popped("q{m}")
    ni_expr = case_by_popped("i{m}") + " + 1"
    lm_expr = case_by_popped("len(l{m})")
    np_expr = case_by_popped("l{m}[i{m} + 2] - {m}")

    def tdiff_of(m: int) -> str:
        if not siblings[m]:
            return "TRUE"
        # same-term lists are identical -> collision == index equality
        return "(" + " AND ".join(f"i{j} <> i{m} + 1" for j in siblings[m]) + ")"

    ntd_expr = "CASE popped " + " ".join(
        f"WHEN {m} THEN {tdiff_of(m)}" for m in range(n)
    ) + " END"

    iupd = ", ".join(
        f"CASE WHEN phase = 'walk' AND popped = {i} AND NOT exhausted "
        f"THEN ni ELSE i{i} END AS i{i}"
        for i in range(n)
    )
    lcols = ", ".join(f"l{i}" for i in range(n))

    walk = f"""
st AS (
  SELECT doc_id, {lcols}, {seed_idx},
         'pop' AS phase, -1 AS popped, 0 AS start_p, 0 AS next_p,
         TRUE AS tdiff, {end0} AS end_p, CAST(0.0 AS DOUBLE) AS freq
  FROM seed
  UNION ALL
  SELECT doc_id, {lcols},
         {iupd},
         CASE WHEN phase = 'pop' THEN 'walk'
              WHEN exhausted THEN 'done'
              WHEN cont THEN 'walk'
              ELSE 'pop' END AS phase,
         CASE WHEN phase = 'pop' THEN pm ELSE popped END AS popped,
         CASE WHEN phase = 'pop' THEN pstart ELSE new_start END AS start_p,
         CASE WHEN phase = 'pop' THEN pnext ELSE next_p END AS next_p,
         CASE WHEN phase = 'pop' THEN TRUE
              WHEN cont THEN ntd ELSE tdiff END AS tdiff,
         CASE WHEN exitw THEN greatest(end_p, np) ELSE end_p END AS end_p,
         freq + CASE WHEN exhausted OR exitw THEN payoff
                     ELSE CAST(0.0 AS DOUBLE) END AS freq
  FROM (
    SELECT *,
           {pm_expr} AS pm,
           {pnext_expr} AS pnext,
           {pstart_expr} AS pstart,
           {cur_expr} AS cur,
           {ni_expr} AS ni,
           {lm_expr} AS lm,
           {np_expr} AS np,
           {ntd_expr} AS ntd,
           CASE WHEN phase = 'walk' AND cur <= next_p AND tdiff
                THEN cur ELSE start_p END AS new_start,
           phase = 'walk' AND ni >= lm AS exhausted,
           phase = 'walk' AND ni < lm AND (np <= next_p OR NOT ntd) AS cont,
           phase = 'walk' AND ni < lm AND np > next_p AND ntd AS exitw,
           CASE WHEN end_p - (CASE WHEN phase = 'walk' AND cur <= next_p
                                        AND tdiff
                                   THEN cur ELSE start_p END) <= {slop}
                THEN 1.0 / (end_p - (CASE WHEN phase = 'walk'
                                               AND cur <= next_p AND tdiff
                                          THEN cur ELSE start_p END) + 1)
                ELSE CAST(0.0 AS DOUBLE) END AS payoff
    FROM (SELECT *, {qcols} FROM st WHERE phase <> 'done')
  )
)"""

    slot_terms = ", ".join(
        f"'{t}'" for k in keys for t in k
    )
    prelude = _PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1)
    return (
        prelude
        + f"""
, {pts},
seed AS (
  SELECT {cte_of[dkeys[0]]}.doc_id, {seed_lists}
  FROM {seed_joins}
  {seed_where}
),
{walk},
pf AS (SELECT doc_id, freq AS pfreq FROM st WHERE phase = 'done'),
idf AS (
    SELECT sum(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))) AS idf_sum,
           max(s.avgdl) AS avgdl
    FROM (SELECT unnest([{slot_terms}]) AS qt) q
    JOIN term_dict t ON t.term = q.qt CROSS JOIN stats s)
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pfreq * 2.2) / (p.pfreq + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pf p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
WHERE p.pfreq > 0
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""
    )


def _sloppy_topk_marked_sql(slots: list[list[str]], slop: int,
                            plant_text: str, k: int = 10) -> str:
    """DuckDB replay of the MARKED (repeats-detected) SloppyPhraseScorer
    walk over PARTIALLY-OVERLAPPING MultiPhraseQuery slots — the branch
    `_sloppy_topk_sql` cannot express, because here two pps collide on
    ACTUAL term positions of DIFFERENT union lists, so collision is value
    equality, not index equality, and the repeat-init becomes a per-doc
    simulation instead of a closed-form rank.

    The corpus is `documents` plus one PLANTED doc_id=-1 row (`plant_text`)
    — the gate's Spark side plants the identical row — so the FIRST
    matching doc is known at generation time and the reference's one-time
    repeat detection (checkedRepeats, SloppyPhraseScorer.cpp:95-118) is
    replayed here in Python over `plant_text` to freeze the marked-slot
    set; the flags then persist for every doc, exactly as in the
    reference. The walk itself is a recursive-CTE state machine with THREE
    phases: 'init' (advance marked pps, highest offset first, until all
    sit on distinct actual positions — running out kills the doc,
    initPhrasePositions returning -1), then the 'pop'/'walk' machine of
    `_sloppy_topk_sql` with termPositionsDiffer as value comparisons
    (SloppyPhraseScorer.cpp:153-171)."""
    n = len(slots)
    keys = [tuple(sorted(set(s))) for s in slots]
    dkeys = list(dict.fromkeys(keys))
    cte_of = {kk: f"pt{j}" for j, kk in enumerate(dkeys)}

    # replay the one-time repeat detection on the planted first doc
    ptoks = [t for t in plant_text.split(" ") if t]
    for kk in keys:
        assert any(t in ptoks for t in kk), \
            "plant_text must match every slot so doc -1 is the first doc"
    first_tp = [min(i for i, t in enumerate(ptoks) if t in kk) for kk in keys]
    marked = sorted({
        i for i in range(n)
        for j in range(n)
        if j != i and first_tp[i] == first_tp[j]
    })
    assert marked, "plant_text must make at least two slots collide"
    order = sorted(marked, reverse=True)  # higher offsets propagate first
    R = len(order)

    def _term_pred(kk: tuple) -> str:
        if len(kk) == 1:
            return f"term = '{kk[0]}'"
        return "term IN (" + ", ".join(f"'{t}'" for t in kk) + ")"

    pts = ",\n".join(
        f"{cte_of[kk]} AS (SELECT doc_id, list(pos ORDER BY pos) AS ps "
        f"FROM tok WHERE {_term_pred(kk)} GROUP BY doc_id)"
        for kk in dkeys
    )
    seed_lists = ", ".join(f"{cte_of[keys[i]]}.ps AS l{i}" for i in range(n))
    seed_joins = cte_of[dkeys[0]] + "".join(
        f" JOIN {cte_of[kk]} USING (doc_id)" for kk in dkeys[1:]
    )
    seed_idx = ", ".join(f"0 AS i{i}" for i in range(n))
    qcols = ", ".join(f"l{i}[i{i} + 1] - {i} AS q{i}" for i in range(n))
    lcols = ", ".join(f"l{i}" for i in range(n))

    def case_by_popped(fmt: str) -> str:
        whens = " ".join(f"WHEN {m} THEN {fmt.format(m=m)}" for m in range(n))
        return f"CASE popped {whens} END"

    def least_others(m: int) -> str:
        others = [f"q{j}" for j in range(n) if j != m]
        return others[0] if len(others) == 1 else "least(" + ", ".join(others) + ")"

    pm_whens = []
    for m in range(n - 1):
        pm_whens.append(f"WHEN q{m} <= {least_others(m)} THEN {m}")
    pm_expr = "CASE " + " ".join(pm_whens) + f" ELSE {n - 1} END"
    pnext_expr = "CASE pm " + " ".join(
        f"WHEN {m} THEN {least_others(m)}" for m in range(n)
    ) + " END"
    pstart_expr = "CASE pm " + " ".join(
        f"WHEN {m} THEN q{m}" for m in range(n)
    ) + " END"
    cur_expr = case_by_popped("q{m}")
    ni_expr = case_by_popped("i{m}") + " + 1"
    lm_expr = case_by_popped("len(l{m})")
    np_expr = case_by_popped("l{m}[i{m} + 2] - {m}")

    # termPositionsDiffer on ACTUAL tp values: popped slot m just advanced
    # to index i{m}+1 -> its tp is l{m}[i{m} + 2]
    def tdiff_of(m: int) -> str:
        if m not in marked:
            return "TRUE"
        return "(" + " AND ".join(
            f"l{m}[i{m} + 2] <> l{j}[i{j} + 1]" for j in marked if j != m
        ) + ")"

    ntd_expr = "CASE popped " + " ".join(
        f"WHEN {m} THEN {tdiff_of(m)}" for m in range(n)
    ) + " END"

    # init-phase expressions: ir indexes `order` (marked, offset desc)
    init_m_expr = "CASE ir " + " ".join(
        f"WHEN {r} THEN {order[r]}" for r in range(R)
    ) + " END"

    def coll_of(m: int) -> str:
        return "(" + " OR ".join(
            f"l{m}[i{m} + 1] = l{j}[i{j} + 1]" for j in marked if j != m
        ) + ")"

    init_coll_expr = "CASE ir " + " ".join(
        f"WHEN {r} THEN {coll_of(order[r])}" for r in range(R)
    ) + " END"
    init_out_expr = "CASE ir " + " ".join(
        f"WHEN {r} THEN i{order[r]} + 1 >= len(l{order[r]})" for r in range(R)
    ) + " END"
    end_init = "greatest(" + ", ".join(
        f"l{i}[i{i} + 1] - {i}" for i in range(n)
    ) + ")" if n > 1 else "l0[i0 + 1]"

    iupd = ", ".join(
        f"CASE WHEN phase = 'init' AND init_coll AND NOT init_out "
        f"AND init_m = {i} THEN i{i} + 1 "
        f"WHEN phase = 'walk' AND popped = {i} AND NOT exhausted "
        f"THEN ni ELSE i{i} END AS i{i}"
        for i in range(n)
    )

    walk = f"""
st AS (
  SELECT doc_id, {lcols}, {seed_idx},
         'init' AS phase, 0 AS ir, -1 AS popped, 0 AS start_p, 0 AS next_p,
         TRUE AS tdiff, 0 AS end_p, CAST(0.0 AS DOUBLE) AS freq
  FROM seed
  UNION ALL
  SELECT doc_id, {lcols},
         {iupd},
         CASE WHEN phase = 'init' AND init_coll AND init_out THEN 'done'
              WHEN phase = 'init' AND init_coll THEN 'init'
              WHEN phase = 'init' AND ir + 1 >= {R} THEN 'pop'
              WHEN phase = 'init' THEN 'init'
              WHEN phase = 'pop' THEN 'walk'
              WHEN exhausted THEN 'done'
              WHEN cont THEN 'walk'
              ELSE 'pop' END AS phase,
         CASE WHEN phase = 'init' AND NOT init_coll THEN ir + 1
              ELSE ir END AS ir,
         CASE WHEN phase = 'pop' THEN pm ELSE popped END AS popped,
         CASE WHEN phase = 'pop' THEN pstart
              WHEN phase = 'walk' THEN new_start ELSE start_p END AS start_p,
         CASE WHEN phase = 'pop' THEN pnext ELSE next_p END AS next_p,
         CASE WHEN phase = 'pop' THEN TRUE
              WHEN cont THEN ntd ELSE tdiff END AS tdiff,
         CASE WHEN phase = 'init' AND NOT init_coll AND ir + 1 >= {R}
              THEN {end_init}
              WHEN exitw THEN greatest(end_p, np) ELSE end_p END AS end_p,
         freq + CASE WHEN exhausted OR exitw THEN payoff
                     ELSE CAST(0.0 AS DOUBLE) END AS freq
  FROM (
    SELECT *,
           {pm_expr} AS pm,
           {pnext_expr} AS pnext,
           {pstart_expr} AS pstart,
           {cur_expr} AS cur,
           {ni_expr} AS ni,
           {lm_expr} AS lm,
           {np_expr} AS np,
           {ntd_expr} AS ntd,
           {init_m_expr} AS init_m,
           {init_coll_expr} AS init_coll,
           {init_out_expr} AS init_out,
           CASE WHEN phase = 'walk' AND cur <= next_p AND tdiff
                THEN cur ELSE start_p END AS new_start,
           phase = 'walk' AND ni >= lm AS exhausted,
           phase = 'walk' AND ni < lm AND (np <= next_p OR NOT ntd) AS cont,
           phase = 'walk' AND ni < lm AND np > next_p AND ntd AS exitw,
           CASE WHEN end_p - (CASE WHEN phase = 'walk' AND cur <= next_p
                                        AND tdiff
                                   THEN cur ELSE start_p END) <= {slop}
                THEN 1.0 / (end_p - (CASE WHEN phase = 'walk'
                                               AND cur <= next_p AND tdiff
                                          THEN cur ELSE start_p END) + 1)
                ELSE CAST(0.0 AS DOUBLE) END AS payoff
    FROM (SELECT *, {qcols} FROM st WHERE phase <> 'done')
  )
)"""

    slot_terms = ", ".join(f"'{t}'" for kk in keys for t in kk)
    plant_sql = plant_text.replace("'", "''")
    prelude = _PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1).replace(
        "FROM documents\n)",
        "FROM (SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT -1 AS doc_id, '{plant_sql}' AS text)\n)",
        1,
    )
    return (
        prelude
        + f"""
, {pts},
seed AS (
  SELECT {cte_of[dkeys[0]]}.doc_id, {seed_lists}
  FROM {seed_joins}
),
{walk},
pf AS (SELECT doc_id, freq AS pfreq FROM st WHERE phase = 'done'),
idf AS (
    SELECT sum(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))) AS idf_sum,
           max(s.avgdl) AS avgdl
    FROM (SELECT unnest([{slot_terms}]) AS qt) q
    JOIN term_dict t ON t.term = q.qt CROSS JOIN stats s)
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pfreq * 2.2) / (p.pfreq + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pf p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
WHERE p.pfreq > 0
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""
    )


_STOP33_SQL = "('" + "', '".join(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
) + "')"

_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"


def oracle_sql() -> dict[str, str]:
    d = {
        "term_topk_bm25": _bm25_topk_sql(["spark"]),
        "term_page2_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term IN ('spark')
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10 OFFSET 10
""",
        "collapse_topk": _PRELUDE
        + """
, hits AS (
  SELECT doc_id, ROUND(SUM(sc), 4) AS score
  FROM bm25 WHERE term IN ('spark') GROUP BY doc_id
),
lab AS (SELECT h.doc_id, d.source, h.score
        FROM hits h JOIN documents d USING (doc_id)),
best AS (
  SELECT source, doc_id, score,
         row_number() OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM lab)
SELECT doc_id, source, score FROM best WHERE rn = 1
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "suggest_term": _PRELUDE
        + """
, cand AS (
  SELECT term, df,
         CASE WHEN length(term) - 1 = 0
              THEN 1.0 - 4.0 / 1.0
              ELSE 1.0 - CAST(levenshtein(substring(term, 2), 'port') AS DOUBLE)
                   / (1.0 + least(4.0, CAST(length(term) - 1 AS DOUBLE)))
         END AS sim0
  FROM term_dict WHERE term LIKE 's%' AND term <> 'sport'
),
f AS (SELECT term, df, (sim0 - 0.5) * 2.0 AS rw FROM cand WHERE sim0 > 0.5)
SELECT term, CAST(df AS BIGINT) AS df, ROUND(rw * 0.5 + 0.5, 4) AS sim
FROM f ORDER BY sim DESC, df DESC, term ASC LIMIT 5
""",
        "term_topk_classic": _PRELUDE
        + """
, classic AS (
  SELECT p.doc_id,
         sqrt(p.tf) * pow(ln(s.n_docs / (t.df + 1.0)) + 1.0, 2)
           * (1.0 / sqrt(pow(ln(s.n_docs / (t.df + 1.0)) + 1.0, 2)))
           * (1.0 / sqrt(d.dl)) AS sc
  FROM postings p
  JOIN term_dict t USING (term)
  JOIN doc_lens d USING (doc_id)
  CROSS JOIN stats s
  WHERE p.term = 'spark'
)
SELECT doc_id, ROUND(sc, 4) AS score FROM classic
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bool_and_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term IN ('spark', 'join')
GROUP BY doc_id
HAVING count(*) = 2
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bool_or_topk": _bm25_topk_sql(["spark", "vector", "window"]),
        "bool_not_topk": _PRELUDE
        + """
SELECT b.doc_id, ROUND(SUM(b.sc), 4) AS score
FROM bm25 b
WHERE b.term = 'spark'
  AND b.doc_id NOT IN (SELECT doc_id FROM postings WHERE term = 'vector')
GROUP BY b.doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bool_minshould_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term IN ('spark', 'join', 'vector')
GROUP BY doc_id
HAVING count(*) >= 2
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "phrase_exact_topk": _PRELUDE
        + """
, pfreq AS (
  SELECT t1.doc_id, count(*) AS pf
  FROM tok t1 JOIN tok t2
    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  WHERE t1.term = 'batch' AND t2.term = 'batch'
  GROUP BY t1.doc_id
),
idf AS (
  SELECT 2.0 * ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5)) AS idf_sum,
         s.avgdl
  FROM term_dict t CROSS JOIN stats s WHERE t.term = 'batch'
)
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pf * 2.2) / (p.pf + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pfreq p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
WHERE p.pf > 0
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "prefix_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term LIKE 's%'
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "wildcard_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE regexp_matches(term, '^s.a.*$')
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # FuzzyQuery rewrite semantics (FuzzyQuery.cpp:377-425): strict
        # sim > minSim, each expanded term's score scaled by
        # (sim - minSim)/(1 - minSim). Expansion is far below the 1024 cap
        # at this corpus, so the cap needs no SQL mirror.
        "fuzzy_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc * rw), 4) AS score
FROM (
  SELECT b.doc_id, b.sc,
         ((1.0 - levenshtein(b.term, 'spark') / least(length(b.term), 5)) - 0.7)
           / 0.3 AS rw
  FROM bm25 b
  WHERE 1.0 - levenshtein(b.term, 'spark') / least(length(b.term), 5) > 0.7
) GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # prefixLength=2: suffix-only levenshtein over sp-prefixed terms,
        # denominator prefixLength + min(suffix lens) (FuzzyQuery.cpp:225-227)
        "fuzzy_prefix_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc * rw), 4) AS score
FROM (
  SELECT b.doc_id, b.sc,
         ((1.0 - levenshtein(substr(b.term, 3), 'ark')
            / (2.0 + least(length(b.term) - 2, 3))) - 0.5) / 0.5 AS rw
  FROM bm25 b
  WHERE b.term LIKE 'sp%' AND length(b.term) > 2
    AND 1.0 - levenshtein(substr(b.term, 3), 'ark')
          / (2.0 + least(length(b.term) - 2, 3)) > 0.5
  UNION ALL
  SELECT b.doc_id, b.sc, ((1.0 - 3.0 / 2.0) - 0.5) / 0.5 AS rw
  FROM bm25 b
  WHERE b.term = 'sp' AND (1.0 - 3.0 / 2.0) > 0.5
) GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "range_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term >= 'sm' AND term <= 'st'
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "multi_phrase_topk": _PRELUDE
        + """
, s0 AS (
    SELECT doc_id, list(pos ORDER BY pos) AS ps
    FROM (SELECT DISTINCT doc_id, pos FROM tok WHERE term IN ('key', 'hash'))
    GROUP BY doc_id)
, s1 AS (
    SELECT doc_id, list(pos ORDER BY pos) AS ps
    FROM (SELECT DISTINCT doc_id, pos FROM tok WHERE term = 'value')
    GROUP BY doc_id)
, pf AS (
    SELECT s0.doc_id,
           len(list_filter(s0.ps, a -> list_contains(s1.ps, a + 1))) AS pfreq
    FROM s0 JOIN s1 USING (doc_id))
, idf AS (
    SELECT sum(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))) AS idf_sum,
           max(s.avgdl) AS avgdl
    FROM term_dict t CROSS JOIN stats s WHERE t.term IN ('key', 'hash', 'value'))
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pfreq * 2.2) / (p.pfreq + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pf p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
WHERE p.pfreq > 0
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "explain_term": _PRELUDE
        + """
SELECT p.doc_id, p.tf, d.dl,
       ROUND(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5)), 4) AS idf,
       ROUND((p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)), 4) AS tf_norm,
       ROUND(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))
             * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)), 4) AS score
FROM postings p
JOIN term_dict t USING (term) JOIN doc_lens d USING (doc_id) CROSS JOIN stats s
WHERE p.term = 'spark'
ORDER BY doc_id
""",
        # PhraseWeight::explain components — the phrase_exact_topk pfreq
        # CTE extended with the idf/tf_norm breakdown
        "explain_phrase": _PRELUDE
        + """
, pfreq AS (
  SELECT t1.doc_id, count(*) AS pf
  FROM tok t1 JOIN tok t2
    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  WHERE t1.term = 'batch' AND t2.term = 'batch'
  GROUP BY t1.doc_id
),
idf AS (
  SELECT 2.0 * ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5)) AS idf_sum,
         s.avgdl
  FROM term_dict t CROSS JOIN stats s WHERE t.term = 'batch'
)
SELECT p.doc_id, p.pf AS pfreq, d.dl,
       ROUND(i.idf_sum, 4) AS idf,
       ROUND((p.pf * 2.2) / (p.pf + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS tf_norm,
       ROUND(i.idf_sum * (p.pf * 2.2) / (p.pf + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pfreq p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
WHERE p.pf > 0
ORDER BY doc_id
""",
        # reference SloppyPhraseScorer walk replayed as a recursive CTE
        "phrase_sloppy_topk": _sloppy_topk_sql(["key", "value"], 2),
        "phrase_sloppy3_topk": _sloppy_topk_sql(["key", "value", "table"], 4),
        "phrase_sloppy_repeat_topk": _sloppy_topk_sql(["batch", "batch"], 1),
        "multi_phrase_sloppy_topk": _sloppy_topk_sql([["key", "hash"], "value"], 2),
        "multi_phrase_overlap_topk": _sloppy_topk_sql(
            [["key", "hash"], ["hash", "value"]], 2
        ),
        "multi_phrase_overlap_repeat_topk": _sloppy_topk_marked_sql(
            [["key", "hash"], ["hash", "value"]], 2, _MP_OVERLAP_PLANT
        ),
        "boosted_or_topk": _PRELUDE
        + """
SELECT doc_id,
       ROUND(SUM(sc * CASE term WHEN 'spark' THEN 2.0 ELSE 1.0 END), 4) AS score
FROM bm25 WHERE term IN ('spark', 'join')
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "matchall_topk": _PRELUDE
        + """
SELECT doc_id, 1.0 AS score FROM doc_lens
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "constant_score_filter": """
SELECT doc_id, 2.5 AS score FROM documents WHERE source = 'src3'
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "filtered_term_topk": _PRELUDE
        + """
SELECT b.doc_id, ROUND(SUM(b.sc), 4) AS score
FROM bm25 b
WHERE b.term = 'spark'
  AND b.doc_id IN (SELECT doc_id FROM documents WHERE n_chars BETWEEN 100 AND 300)
GROUP BY b.doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "chained_filter_topk": _PRELUDE
        + """
SELECT b.doc_id, ROUND(SUM(b.sc), 4) AS score
FROM bm25 b
WHERE b.term = 'spark'
  AND ((b.doc_id IN (SELECT DISTINCT doc_id FROM tok WHERE term = 'join'))
       != (b.doc_id IN (SELECT doc_id FROM documents WHERE n_chars >= 300)))
GROUP BY b.doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "sort_by_field": _PRELUDE
        + """
SELECT d.doc_id, d.n_chars
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM postings WHERE term = 'spark')
ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT 10
""",
        "sort_multi_topk": _PRELUDE
        + """
, hits AS (
  SELECT doc_id, ROUND(SUM(sc), 4) AS score
  FROM bm25 WHERE term IN ('spark') GROUP BY doc_id
)
SELECT h.doc_id, d.lang, h.score
FROM hits h JOIN documents d USING (doc_id)
ORDER BY d.lang ASC, h.score DESC, h.doc_id ASC LIMIT 10
""",
        "numeric_range_encoded": """
SELECT doc_id, n_chars FROM documents
WHERE n_chars BETWEEN 100 AND 300
ORDER BY doc_id
""",
        "span_near_topk": _PRELUDE
        + """
-- NearSpansOrdered replay for two width-1 clauses
-- (NearSpansOrdered.cpp advanceAfterOrdered): each 'key' position pairs
-- with the NEAREST later 'value' (stretchToOrder), per value only the
-- CLOSEST key survives (shrinkToAfterShortestMatch consumes the rest),
-- and the slop test gates emission after consumption
, nearp AS (
    SELECT a.doc_id, a.pos AS s0, MIN(b.pos) AS s1
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id
    WHERE a.term = 'key' AND b.term = 'value' AND b.pos > a.pos
    GROUP BY a.doc_id, a.pos)
, sp AS (
    SELECT doc_id, MAX(s0) AS s0, s1
    FROM nearp GROUP BY doc_id, s1
    HAVING (s1 - MAX(s0) - 1) <= 3)
-- payoff 1/(matchLength+1) with RAW span width e-s = (s1+1)-s0
-- (SpanScorer.cpp:70-75): 1/(s1-s0+2)
, pf AS (SELECT doc_id, SUM(1.0 / (s1 - s0 + 2.0)) AS pfreq FROM sp GROUP BY doc_id)
, idf AS (
    SELECT sum(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))) AS idf_sum,
           max(s.avgdl) AS avgdl
    FROM term_dict t CROSS JOIN stats s WHERE t.term IN ('key', 'value'))
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pfreq * 2.2) / (p.pfreq + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pf p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "span_first_topk": _PRELUDE
        + """
-- each single-term span has raw matchLength 1 -> payoff 1/2
-- (SpanScorer.cpp:70-75, Similarity.cpp:223-225)
, pf AS (
    SELECT doc_id, count(*) / 2.0 AS pfreq
    FROM tok WHERE term = 'spark' AND pos + 1 <= 10
    GROUP BY doc_id)
, idf AS (
    SELECT ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5)) AS idf_sum,
           s.avgdl AS avgdl
    FROM term_dict t CROSS JOIN stats s WHERE t.term = 'spark')
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pfreq * 2.2) / (p.pfreq + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pf p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # classic Explanation: single-term query => queryNorm = 1/sqrt(idf^2),
        # weight = idf^2 * qn; float ops mirrored in the Spark order
        "explain_bool_topk": _PRELUDE
        + """
, m AS (
  SELECT doc_id, SUM(sc) AS must_sum FROM bm25
  WHERE term = 'spark' GROUP BY doc_id)
, sh AS (
  SELECT doc_id, SUM(sc) AS should_sum FROM bm25
  WHERE term = 'vector' GROUP BY doc_id)
SELECT m.doc_id,
       ROUND(m.must_sum, 4) AS must_sum,
       ROUND(COALESCE(sh.should_sum, 0.0), 4) AS should_sum,
       CAST(1 + CASE WHEN sh.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS overlap,
       CAST(2 AS BIGINT) AS max_overlap,
       1.0 AS coord,
       ROUND(m.must_sum + COALESCE(sh.should_sum, 0.0), 4) AS score
FROM m LEFT JOIN sh USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "explain_term_classic": _PRELUDE
        + """
, cidf AS (
    SELECT ln(s.n_docs / (t.df + 1.0)) + 1.0 AS idf
    FROM term_dict t CROSS JOIN stats s WHERE t.term = 'spark')
SELECT p.doc_id, p.tf, d.dl,
       ROUND(i.idf * i.idf * (1.0 / sqrt(i.idf * i.idf)), 4) AS weight,
       ROUND(sqrt(p.tf), 4) AS tf_sqrt,
       ROUND(1.0 / sqrt(d.dl), 4) AS length_norm,
       ROUND(sqrt(p.tf) * (i.idf * i.idf * (1.0 / sqrt(i.idf * i.idf)))
             * (1.0 / sqrt(d.dl)), 4) AS score
FROM postings p JOIN doc_lens d USING (doc_id) CROSS JOIN cidf i
WHERE p.term = 'spark' ORDER BY p.doc_id
""",
        "span_or_topk": _PRELUDE
        + """
-- single-term spans: raw matchLength 1 -> payoff 1/2 each
, pf AS (
    SELECT doc_id, count(*) / 2.0 AS pfreq
    FROM tok WHERE term IN ('key', 'vector')
    GROUP BY doc_id)
, idf AS (
    SELECT sum(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))) AS idf_sum,
           max(s.avgdl) AS avgdl
    FROM term_dict t CROSS JOIN stats s WHERE t.term IN ('key', 'vector'))
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pfreq * 2.2) / (p.pfreq + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pf p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "span_not_topk": _PRELUDE
        + """
-- single-term spans: raw matchLength 1 -> payoff 1/2 each
, pf AS (
    SELECT a.doc_id, count(*) / 2.0 AS pfreq
    FROM tok a
    WHERE a.term = 'key' AND NOT EXISTS (
        SELECT 1 FROM tok b
        WHERE b.doc_id = a.doc_id AND b.term = 'value' AND b.pos = a.pos + 1)
    GROUP BY a.doc_id)
, idf AS (
    SELECT ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5)) AS idf_sum,
           s.avgdl AS avgdl
    FROM term_dict t CROSS JOIN stats s WHERE t.term = 'key')
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pfreq * 2.2) / (p.pfreq + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pf p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
WHERE p.pfreq > 0
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # span clauses inside BooleanQuery: classic two-pass queryNorm over
        # both span leaves + coord(overlap, 2); pfreq = sum sloppyFreq(raw
        # span width) exactly as the engine computes it
        "span_boolean_topk": _PRELUDE
        + """
-- NearSpansOrdered replay for two width-1 clauses
-- (NearSpansOrdered.cpp advanceAfterOrdered): each 'key' position pairs
-- with the NEAREST later 'value' (stretchToOrder), per value only the
-- CLOSEST key survives (shrinkToAfterShortestMatch consumes the rest),
-- and the slop test gates emission after consumption
, nearp AS (
    SELECT a.doc_id, a.pos AS s0, MIN(b.pos) AS s1
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id
    WHERE a.term = 'key' AND b.term = 'value' AND b.pos > a.pos
    GROUP BY a.doc_id, a.pos)
, sp AS (
    SELECT doc_id, MAX(s0) AS s0, s1
    FROM nearp GROUP BY doc_id, s1
    HAVING (s1 - MAX(s0) - 1) <= 3)
, pfn AS (SELECT doc_id, SUM(1.0 / (s1 - s0 + 2.0)) AS pfreq
          FROM sp GROUP BY doc_id)
, pfs AS (SELECT doc_id, count(*) / 2.0 AS pfreq
          FROM tok WHERE term = 'spark' GROUP BY doc_id)
, idfs AS (
    SELECT
      (SELECT ln(s.n_docs / (t.df + 1.0)) + 1.0
       FROM term_dict t CROSS JOIN stats s WHERE t.term = 'key')
      + (SELECT ln(s.n_docs / (t.df + 1.0)) + 1.0
         FROM term_dict t CROSS JOIN stats s WHERE t.term = 'value') AS idf_n,
      (SELECT ln(s.n_docs / (t.df + 1.0)) + 1.0
       FROM term_dict t CROSS JOIN stats s WHERE t.term = 'spark') AS idf_s)
, w AS (SELECT idf_n, idf_s,
               1.0 / sqrt(idf_n * idf_n * 1.0 * 1.0 + idf_s * idf_s * 1.0 * 1.0) AS qn
        FROM idfs)
SELECT n.doc_id,
       ROUND((sqrt(n.pfreq) * (w.idf_n * w.idf_n * 1.0 * w.qn) * (1.0 / sqrt(d.dl))
              + COALESCE(sqrt(s.pfreq) * (w.idf_s * w.idf_s * 1.0 * w.qn)
                         * (1.0 / sqrt(d.dl)), 0.0))
             * ((1 + CASE WHEN s.doc_id IS NULL THEN 0 ELSE 1 END) / 2.0)
             * 1.0, 4) AS score
FROM pfn n LEFT JOIN pfs s USING (doc_id)
JOIN doc_lens d ON d.doc_id = n.doc_id
CROSS JOIN w
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "wand_fielded_topk": """
WITH raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
fieldtok AS (
  SELECT doc_id, 'title' AS field, unnest(toks[1:4]) AS term FROM raw
  UNION ALL
  SELECT doc_id, 'text' AS field, unnest(toks) AS term FROM raw
),
tok AS (SELECT * FROM fieldtok WHERE term <> ''),
postings AS (SELECT field, term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
doc_lens AS (SELECT doc_id, field, count(*) AS dl FROM tok GROUP BY 1, 2),
fstats AS (SELECT field, avg(dl) AS avgdl FROM doc_lens GROUP BY field),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM doc_lens),
term_dict AS (SELECT field, term, count(*) AS df FROM postings GROUP BY 1, 2)
SELECT p.doc_id,
       ROUND(ln(1.0 + (n.n_docs - t.df + 0.5) / (t.df + 0.5))
             * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)), 4) AS score
FROM postings p
JOIN term_dict t ON t.field = p.field AND t.term = p.term
JOIN doc_lens d ON d.doc_id = p.doc_id AND d.field = p.field
JOIN fstats s ON s.field = p.field
CROSS JOIN nd n
WHERE p.field = 'title' AND p.term = 'join'
ORDER BY score DESC, p.doc_id ASC LIMIT 10
""",
        "parsed_and_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term IN ('spark', 'join')
GROUP BY doc_id
HAVING count(*) = 2
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "parsed_nested_topk": _PRELUDE
        + """
, nested AS (
  SELECT doc_id, SUM(sc) AS sc FROM bm25 WHERE term IN ('spark', 'join')
  GROUP BY doc_id HAVING count(*) = 2
),
clauses AS (
  SELECT doc_id, sc FROM bm25 WHERE term = 'window'
  UNION ALL
  SELECT doc_id, sc FROM nested
)
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM clauses GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "highlight_fragments": _highlight_sql(_HL_TERMS, 10, _HL_FSIZE),
        "wand_or_topk": _bm25_topk_sql(["spark", "vector", "window"]),
        "wand_and_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term IN ('spark', 'join')
GROUP BY doc_id
HAVING count(*) = 2
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "wand_merged_topk": _bm25_topk_sql(["spark", "vector", "window"]),
        "wand_delete_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25
WHERE term IN ('spark', 'vector', 'window') AND doc_id NOT IN (10, 20, 30)
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "term_dict": _PRELUDE
        + "SELECT term, df, cf FROM term_dict ORDER BY term",
        "doc_lens": _PRELUDE
        + "SELECT doc_id, dl FROM doc_lens ORDER BY doc_id",
        "corpus_stats": _PRELUDE
        + "SELECT n_docs, ROUND(avgdl, 4) AS avgdl FROM stats",
        "top_df_terms": _PRELUDE
        + "SELECT term, df, cf FROM term_dict ORDER BY df DESC, term ASC LIMIT 10",
        # --- training-data pipeline oracles ---
        "dedup_window_stats": _WINDOW_DEDUP_SQL,
        "dedup_url": _URL_DEDUP_SQL,
        "web_domain_stats": _DOMAIN_STATS_SQL,
        "sample_domain_cap": _DOMAIN_CAP_SQL,
        "web_extract_text": _EXTRACT_TEXT_SQL,
        "text_normalize": _TEXT_NORMALIZE_SQL,
        "web_anchor_text": _ANCHOR_TEXT_SQL,
        "web_pagerank": _PAGERANK_SQL,
        "warc_roundtrip": _WARC_ROUNDTRIP_SQL,
        "wet_records": _WET_RECORDS_SQL,
        "warc_index_stats": _WARC_INDEX_STATS_SQL,
        "robots_filter": _ROBOTS_FILTER_SQL,
        "warc_charset": _WARC_CHARSET_SQL,
        "sitemap_gap": _SITEMAP_GAP_SQL,
        "stream_warc_stats": _WARC_INDEX_STATS_SQL,
        "wand_anchor_field_topk": _ANCHOR_FIELD_SQL,
        "static_rank_topk": _PRELUDE + _STATIC_RANK_TAIL,
        "crawl_supersede": _CRAWL_SUPERSEDE_SQL,
        "web_main_content": _MAIN_CONTENT_SQL,
        "dedup_url_hinted": _URL_DEDUP_HINTED_SQL,
        "crawl_fetch_plan": _FETCH_PLAN_SQL,
        "web_redirects": _REDIRECTS_SQL,
        "url_blocklist": _BLOCKLIST_SQL,
        "time_travel_stats": _TIME_TRAVEL_SQL,
        "pipeline_ingest_crawl": _INGEST_CRAWL_SQL,
        "pipeline_ingest_webtext": _INGEST_WEBTEXT_SQL.replace("__STOP33__", _STOP33_SQL),
        "stream_url_dedup": _STREAM_URL_DEDUP_SQL,
        "dedup_lines": _LINE_DEDUP_SQL,
        "dedup_spans": _SPAN_DEDUP_SQL,
        "dedup_exact": _dup_corpus_sql(1.0)
        + """
, h AS (SELECT doc_id, ('0x'||substr(md5(text),1,15))::BIGINT AS hh,
               length(text) AS len FROM corpus)
SELECT min(doc_id) AS keep_id, count(*) AS n_copies, max(doc_id) AS max_id
FROM h GROUP BY hh, len HAVING count(*) > 1
ORDER BY keep_id
""",
        "pipeline_clean_corpus": f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         array_to_string(toks[1:greatest(1, CAST(floor(len(toks) * 0.8) AS INT))], ' ') AS text
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE doc_id % 7 = 0
),
qf AS (
  SELECT doc_id, text,
         len({_TOKS_SQL}) AS n_tokens,
         CASE WHEN len({_TOKS_SQL}) > 0
              THEN CAST(len(list_filter({_TOKS_SQL}, x -> x IN {_STOP33_SQL})) AS DOUBLE)
                   / len({_TOKS_SQL}) ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0
              THEN CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                   / length(text) ELSE 0.0 END AS sym_ratio
  FROM corpus),
q AS (
  SELECT doc_id, text,
         ROUND(least(stop_ratio * 2, 1.0) * least(n_tokens / 64.0, 1.0)
               * (1.0 - sym_ratio), 4) AS quality
  FROM qf),
passq AS (SELECT * FROM q WHERE quality >= 0.05),
grp AS (
  SELECT doc_id, text,
         min(doc_id) OVER (
           PARTITION BY ('0x'||substr(md5(text),1,15))::BIGINT, length(text)
         ) AS keep_id
  FROM passq),
exact_dup AS (SELECT doc_id FROM grp WHERE doc_id <> keep_id),
rem AS (SELECT doc_id, text FROM grp WHERE doc_id = keep_id),
tokd AS (SELECT doc_id, string_split(text, ' ') AS toks FROM rem),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i
        FROM tokd)),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
near AS (
  SELECT DISTINCT p.b AS doc_id
  FROM pairs p JOIN cnt ca ON ca.doc_id = p.a JOIN cnt cb ON cb.doc_id = p.b
  WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.5)
SELECT q.doc_id, q.quality,
       CASE WHEN q.quality < 0.05 THEN 'low_quality'
            WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS reason
FROM q
LEFT JOIN exact_dup e ON e.doc_id = q.doc_id
LEFT JOIN near n ON n.doc_id = q.doc_id
ORDER BY q.doc_id
""",
        "dedup_ngram_jaccard": _dup_corpus_sql(0.8) + _SHINGLE_JACCARD_SQL,
        # chunk dedup: same planted corpus, 10-token windows; keep_idx is
        # recovered from a packed (doc_id, idx) min — equivalent to
        # Spark's min(struct(doc_id, chunk_idx)).chunk_idx for idx < 1e6
        "dedup_chunk": _dup_corpus_sql(0.8) + """
, tokd AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus)
, ch AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(toks[i*10+1 : i*10+10], ' ') AS chunk
  FROM (SELECT doc_id, toks,
               unnest(generate_series(0, CAST(ceil(len(toks) / 10.0) AS INT) - 1)) AS i
        FROM tokd)
  WHERE array_to_string(toks[i*10+1 : i*10+10], ' ') <> ''
)
SELECT ('0x'||substr(md5(chunk),1,15))::BIGINT AS chunk_hash,
       count(*) AS n_copies,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS keep_doc,
       min(doc_id * 1000000 + chunk_idx) % 1000000 AS keep_idx
FROM ch GROUP BY 1 HAVING count(*) > 1
ORDER BY chunk_hash
""",
        "pipeline_decontaminate": """
WITH bt AS (
  SELECT string_split(array_to_string(toks[1:12], ' '), ' ') AS toks
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE doc_id % 50 = 0
),
bg AS (
  SELECT DISTINCT
    ('0x'||substr(md5(array_to_string(toks[i:i+7], ' ')),1,15))::BIGINT AS g
  FROM (SELECT toks, unnest(generate_series(1, greatest(len(toks) - 7, 1))) AS i
        FROM bt)
),
dt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
dg AS (
  SELECT DISTINCT doc_id,
    ('0x'||substr(md5(array_to_string(toks[i:i+7], ' ')),1,15))::BIGINT AS g
  FROM (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 7, 1))) AS i
        FROM dt)
)
SELECT doc_id, count(*) AS n_hits, min(g) AS first_hit
FROM dg JOIN bg USING (g)
GROUP BY doc_id ORDER BY doc_id
""",
        "decontaminate_fraction": """
WITH bt AS (
  SELECT string_split(array_to_string(toks[1:12], ' '), ' ') AS toks
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE doc_id % 50 = 0
),
bg AS (
  SELECT DISTINCT
    ('0x'||substr(md5(array_to_string(toks[i:i+7], ' ')),1,15))::BIGINT AS g
  FROM (SELECT toks, unnest(generate_series(1, greatest(len(toks) - 7, 1))) AS i
        FROM bt)
),
dt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
dg AS (
  SELECT doc_id,
    ('0x'||substr(md5(array_to_string(toks[i:i+7], ' ')),1,15))::BIGINT AS g
  FROM (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 7, 1))) AS i
        FROM dt)
)
SELECT d.doc_id,
       count(DISTINCT d.g) AS n_grams,
       count(DISTINCT CASE WHEN b.g IS NOT NULL THEN d.g END) AS n_hits,
       ROUND(count(DISTINCT CASE WHEN b.g IS NOT NULL THEN d.g END)::DOUBLE
             / count(DISTINCT d.g), 4) AS frac
FROM dg d LEFT JOIN bg b ON d.g = b.g
GROUP BY d.doc_id ORDER BY d.doc_id
""",
        "dedup_minhash_lsh": _dup_corpus_sql(0.8) + _SHINGLE_JACCARD_SQL,
        "dedup_cluster_canonical": _dup_corpus_sql(0.8).replace(
            "WITH corpus", "WITH RECURSIVE corpus"
        ) + _CLUSTER_CANONICAL_SQL,
        "dedup_cluster_best": _CLUSTER_BEST_SQL,
        "dedup_simhash": _simhash_sql(32, 4),
        "dedup_embedding_cosine": _emb_neardup_sql(0.99),
        "ann_cosine_topk": _ann_brute_sql(7),
        "ann_cosine_topk_pandas": _ann_brute_sql(7),
        "ann_ivf_topk": _IVF_SQL,
        "ann_ivf_stored_topk": _IVF_SQL,  # same algorithm, pruned storage
        # trained variant: centroids frozen by replaying the deterministic
        # seeded trainer on the oracle parquet (see _ivf_trained_sql)
        "ann_ivf_trained_topk": _ivf_trained_sql(),
        "ann_ivfpq_topk": _ivfpq_sql(),
        "lang_dispatch_topk": _lang_dispatch_sql(),
        "stream_ingest_topk": _bm25_topk_sql(["spark", "window"]),
        "stream_window_stats": _STREAM_WINDOW_SQL,
        "multimodal_features": """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       ('0x'||substr(md5(text),1,15))::BIGINT AS digest60
FROM documents ORDER BY media_id
""",
        "multimodal_frame_sample": """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(floor(octet_length(encode(text)) / 100.0 + 1) AS INT) AS n_frames
  FROM documents)
SELECT media_id, CAST(i AS INT) AS frame_no
FROM (SELECT media_id, unnest(generate_series(0, n_frames - 1)) AS i FROM m)
WHERE i % 10 = 0
ORDER BY media_id, frame_no
""",
        "text_lang_id": f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
r AS (SELECT doc_id,
        CASE WHEN len(toks) > 0
             THEN CAST(len(list_filter(toks, x -> x IN {_STOP33_SQL})) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS ratio
      FROM t)
SELECT doc_id, ROUND(ratio, 4) AS stop_ratio,
       CASE WHEN ratio >= 0.04 THEN 'en' ELSE 'und' END AS pred_lang
FROM r ORDER BY doc_id
""",
        "text_quality": f"""
WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
f AS (SELECT doc_id,
        len(toks) AS n_tokens,
        CASE WHEN len(toks) > 0
             THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS mean_len,
        CASE WHEN len(toks) > 0
             THEN CAST(len(list_filter(toks, x -> x IN {_STOP33_SQL})) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS stop_ratio,
        CASE WHEN length(text) > 0
             THEN CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE) / length(text)
             ELSE 0.0 END AS sym_ratio
      FROM t)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       ROUND(mean_len, 4) AS mean_token_len,
       ROUND(stop_ratio, 4) AS stop_ratio,
       ROUND(sym_ratio, 4) AS symbol_ratio,
       ROUND(least(stop_ratio * 2, 1.0) * least(n_tokens / 64.0, 1.0) * (1.0 - sym_ratio), 4) AS quality
FROM f ORDER BY doc_id
""",
        "text_token_counts": f"""
SELECT doc_id,
       CAST(len({_TOKS_SQL}) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpe_tokens,
       ROUND(CASE WHEN len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) > 0
                  THEN CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                  ELSE 0.0 END, 4) AS chars_per_bpe_token
FROM documents ORDER BY doc_id
""",
        "text_fingerprint": f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform({_TOKS_SQL}, t -> ('0x'||substr(md5(t),1,7))::BIGINT)),
         (a, b) -> (a * 31 + b) % 9007199254740881) AS fp
FROM documents ORDER BY doc_id
""",
        "text_repetition": f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
base AS (SELECT doc_id, len(toks) AS n_tokens,
                len(list_distinct(toks)) AS n_distinct FROM t),
g2 AS (SELECT doc_id,
              unnest(list_transform(range(len(toks) - 1),
                                    i -> toks[i+1] || ' ' || toks[i+2])) AS gram
       FROM t WHERE len(toks) >= 2),
g3 AS (SELECT doc_id,
              unnest(list_transform(range(len(toks) - 2),
                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS gram
       FROM t WHERE len(toks) >= 3),
c2 AS (SELECT doc_id, max(cnt) AS max2 FROM
         (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2)
       GROUP BY 1),
c3 AS (SELECT doc_id, sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup3 FROM
         (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2)
       GROUP BY 1)
SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
       ROUND(CASE WHEN b.n_tokens > 0
                  THEN 1 - CAST(b.n_distinct AS DOUBLE) / b.n_tokens
                  ELSE 0.0 END, 4) AS dup_token_frac,
       ROUND(least(CASE WHEN b.n_tokens > 0
                        THEN COALESCE(c2.max2, 0) * 2.0 / b.n_tokens
                        ELSE 0.0 END, 1.0), 4) AS top_2gram_frac,
       ROUND(least(CASE WHEN b.n_tokens > 0
                        THEN COALESCE(c3.dup3, 0) * 3.0 / b.n_tokens
                        ELSE 0.0 END, 1.0), 4) AS dup_3gram_frac
FROM base b LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
ORDER BY b.doc_id
""",
        "sample_stratified": """
WITH s AS (SELECT doc_id, source,
        ROUND(('0x'||substr(md5(source || ':' || CAST(doc_id AS VARCHAR) || ':42'),
                            1, 7))::BIGINT / 268435456.0, 6) AS u
      FROM documents)
SELECT doc_id, source, u FROM s
WHERE u < CASE source WHEN 'src3' THEN 1.0 WHEN 'src7' THEN 0.1 ELSE 0.5 END
ORDER BY doc_id
""",
        "mlt_topk": _PRELUDE + """
, mltw AS (
  SELECT p.term,
         round(p.tf * (ln(CAST(s.n_docs AS DOUBLE) / (t.df + 1.0)) + 1.0), 6) AS w
  FROM postings p JOIN term_dict t USING (term) CROSS JOIN stats s
  WHERE p.doc_id = 42
),
mt AS (SELECT term FROM mltw ORDER BY w DESC, term ASC LIMIT 5)
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25
WHERE term IN (SELECT term FROM mt) AND doc_id <> 42
GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "bm25f_topk": """
WITH raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
fieldtok AS (
  SELECT doc_id, 'title' AS field, unnest(toks[1:4]) AS term FROM raw
  UNION ALL
  SELECT doc_id, 'text' AS field, unnest(toks) AS term FROM raw
),
tok AS (SELECT * FROM fieldtok WHERE term <> ''),
postings AS (SELECT field, term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
doc_lens AS (SELECT doc_id, field, count(*) AS dl FROM tok GROUP BY 1, 2),
fstats AS (SELECT field, avg(dl) AS avgdl FROM doc_lens GROUP BY field),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM doc_lens),
qdf AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM postings WHERE term IN ('spark', 'join') GROUP BY 1),
tfn AS (
  SELECT p.doc_id, p.term,
         (CASE p.field WHEN 'title' THEN 2.0 ELSE 1.0 END) * p.tf
           / (1.0 + 0.75 * (d.dl / s.avgdl - 1.0)) AS part
  FROM postings p
  JOIN doc_lens d ON d.doc_id = p.doc_id AND d.field = p.field
  JOIN fstats s ON s.field = p.field
  WHERE p.term IN ('spark', 'join')
),
wtf AS (SELECT doc_id, term, sum(part) AS wtf FROM tfn GROUP BY 1, 2),
sc AS (
  SELECT w.doc_id,
         sum(ln(1.0 + (n.n_docs - q.df + 0.5) / (q.df + 0.5))
             * w.wtf / (1.2 + w.wtf)) AS s
  FROM wtf w JOIN qdf q USING (term) CROSS JOIN nd n
  GROUP BY w.doc_id
)
SELECT doc_id, ROUND(s, 4) AS score
FROM sc ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        # COUPLING NOTE (ADVICE r4): the literal 16 below is
        # codec.BLOCK_SIZE (the per-16-doc WAND block carve) and the
        # literal 2 in 'files' is the per-segment file count of the
        # compacted store layout; fsck derives both from the live code,
        # so changing either constant there requires updating this
        # oracle in the same commit (exact-gate coupling, intentional).
        "index_fsck_stats": _PRELUDE + """
SELECT * FROM (
  SELECT 'block_stats' AS "check",
         (SELECT CAST(sum(CAST(ceil(df / 16.0) AS BIGINT)) AS BIGINT)
          FROM term_dict) AS n_checked,
         CAST(0 AS BIGINT) AS n_bad
  UNION ALL SELECT 'doc_lens',
         (SELECT CAST(count(*) AS BIGINT) FROM doc_lens), 0
  UNION ALL SELECT 'files', 2, 0
  UNION ALL SELECT 'positions',
         (SELECT CAST(count(*) AS BIGINT) FROM tok), 0
  UNION ALL SELECT 'postings',
         (SELECT CAST(count(*) AS BIGINT) FROM postings), 0
  UNION ALL SELECT 'term_order',
         (SELECT CAST(count(*) AS BIGINT) FROM term_dict), 0
) ORDER BY "check"
""",
        "sample_dsir": f"""
WITH rawt AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents
              WHERE len({_TOKS_SQL}) >= 1),
tgtt AS (SELECT doc_id, t FROM rawt
         WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src0')),
rg AS (
  SELECT doc_id, ('0x'||substr(md5(g),1,7))::BIGINT % 512 AS bucket
  FROM (
    SELECT doc_id, unnest(t) AS g FROM rawt
    UNION ALL
    SELECT doc_id, t[i] || ' ' || t[i+1] AS g
    FROM (SELECT doc_id, t,
                 unnest(generate_series(1, len(t) - 1)) AS i
          FROM rawt WHERE len(t) >= 2)
  )
),
tg AS (
  SELECT ('0x'||substr(md5(g),1,7))::BIGINT % 512 AS bucket
  FROM (
    SELECT unnest(t) AS g FROM tgtt
    UNION ALL
    SELECT t[i] || ' ' || t[i+1] AS g
    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
          FROM tgtt WHERE len(t) >= 2)
  )
),
db AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c
       FROM rg GROUP BY 1, 2),
rb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cr FROM db GROUP BY 1),
tb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM tg GROUP BY 1),
tot AS (SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM rb) AS tr,
               (SELECT CAST(count(*) AS DOUBLE) FROM tg) AS tt),
ratio AS (
  SELECT rb.bucket,
         CAST(round((ln((COALESCE(tb.ct, 0) + 1.0) / (tot.tt + 512.0))
                     - ln((rb.cr + 1.0) / (tot.tr + 512.0))) * 1000000.0)
              AS BIGINT) AS ri
  FROM rb LEFT JOIN tb USING (bucket), tot
),
w AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
             CAST(sum(c * ri) AS BIGINT) AS wm
      FROM db JOIN ratio USING (bucket) GROUP BY 1),
keyd AS (
  SELECT doc_id, n_grams, round(wm / 1000000.0, 6) AS logw,
         round(round(wm / 1000000.0, 6) / 1.0
               - ln(-ln((('0x'||substr(md5('dsir:' || CAST(doc_id AS VARCHAR)
                                             || ':42'), 1, 7))::BIGINT + 0.5)
                        / 268435456.0)), 6) AS key
  FROM w)
SELECT doc_id, n_grams, logw, key
FROM keyd ORDER BY key DESC, doc_id ASC LIMIT 100
""",
        "sample_mixture": """
WITH s AS (SELECT doc_id, source,
        ROUND(('0x'||substr(md5(source || ':' || CAST(doc_id AS VARCHAR) || ':42'),
                            1, 7))::BIGINT / 268435456.0, 6) AS u
      FROM documents),
r AS (SELECT doc_id, source, u,
        CASE source WHEN 'src3' THEN 2.5 WHEN 'src7' THEN 0.25
             ELSE 1.0 END AS rate
      FROM s),
n AS (SELECT doc_id, source,
        CAST(floor(rate) AS BIGINT)
          + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END AS n_copies
      FROM r)
SELECT doc_id, source,
       unnest(generate_series(0, n_copies - 1)) AS epoch,
       n_copies
FROM n WHERE n_copies > 0
ORDER BY doc_id, epoch
""",
        "text_pii_redact": """
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || doc_id || '@example.com from 10.1.2.'
                   || (doc_id % 250) || ' call +1 555 123 4567'
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(text, '\\+\\d{1,3}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}')) AS INT) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(text,
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
           '\\+\\d{1,3}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}', '<PHONE>', 'g') AS redacted
FROM corpus ORDER BY doc_id
""",
        "pack_sequences": f"""
WITH t AS (SELECT doc_id,
                  CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
      FROM t)
SELECT doc_id, n_tokens, start_tok,
       CAST(floor(start_tok / 512.0) AS BIGINT) AS pack_id,
       CAST(start_tok % 512 AS BIGINT) AS pack_offset,
       CASE WHEN n_tokens > 0
            THEN CAST(floor((start_tok + n_tokens - 1) / 512.0) AS BIGINT)
                 - CAST(floor(start_tok / 512.0) AS BIGINT) + 1
            ELSE 0 END AS n_packs
FROM c ORDER BY doc_id
""",
        "embed_quantize_int8": """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
s AS (SELECT vec_id, e,
             CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
      FROM (SELECT vec_id, e,
                   list_max(list_transform(e, x -> abs(x))) AS m FROM v)),
qz AS (SELECT vec_id, e, scale,
              list_transform(e, x -> CAST(ROUND(x / scale, 0) AS INT)) AS q
       FROM s),
dq AS (SELECT vec_id, e, scale, q,
              list_transform(q, c -> CAST(c AS DOUBLE) * scale) AS d
       FROM qz)
SELECT vec_id,
       ROUND(scale, 9) AS scale_r,
       CAST(list_sum(q) AS BIGINT) AS sum_q,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS sum_abs_q,
       CAST(len(list_filter(q, x -> abs(x) = 127)) AS INT) AS n_sat,
       ROUND(list_inner_product(e, d)
             / (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product(d, d))),
             4) AS cos_dq
FROM dq ORDER BY vec_id
""",
        "batch_term_topk": _PRELUDE
        + """
, qset AS (SELECT * FROM (VALUES
    ('q1','spark'),('q2','spark'),('q2','join'),('q3','vector'),
    ('q4','data'),('q4','stream'),('q4','window')) AS t(query_id, term)),
scores AS (
  SELECT q.query_id, b.doc_id, ROUND(SUM(b.sc), 4) AS score
  FROM bm25 b JOIN qset q USING (term)
  GROUP BY q.query_id, b.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM scores)
SELECT query_id, doc_id, score FROM ranked WHERE rn <= 5
ORDER BY query_id, score DESC, doc_id ASC
""",
        "ann_cosine_int8_topk": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 5),
s AS (SELECT vec_id, e,
             CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
      FROM (SELECT vec_id, e,
                   list_max(list_transform(e, x -> abs(x))) AS m FROM v)),
dq AS (SELECT vec_id,
              list_transform(
                list_transform(e, x -> CAST(ROUND(x / scale, 0) AS INT)),
                c -> CAST(c AS DOUBLE) * scale) AS d
       FROM s)
SELECT vec_id, ROUND({_COS_SQL.format(a='d', b='qe')}, 4) AS cosine
FROM dq, q
ORDER BY cosine DESC, vec_id ASC LIMIT 10
""",
        "shard_assign": """
SELECT doc_id,
       CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            % 8 AS INT) AS shard
FROM documents ORDER BY doc_id
""",
        "corpus_shuffle": """
WITH keyed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 8 AS INT) AS shard,
         ('0x' || substr(md5('shuffle:42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              AS shuffle_key
  FROM documents
)
SELECT doc_id, shard,
       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS rank
FROM keyed ORDER BY doc_id
""",
        "stream_dedup_state": _dup_corpus_sql(1.0) + """
SELECT ('0x'||substr(md5(text),1,15))::BIGINT AS h,
       CAST(length(text) AS BIGINT) AS len,
       MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM corpus GROUP BY 1, 2 ORDER BY h, len
""",
        "multimodal_wav_stats": """
WITH ids AS (SELECT doc_id FROM documents),
f AS (SELECT doc_id,
             unnest(generate_series(0, 49 + CAST(doc_id % 20 AS INT))) AS i
      FROM ids),
s AS (SELECT doc_id, (doc_id * 7919 + i * 104729) % 65536 - 32768 AS v FROM f)
SELECT doc_id AS media_id,
       8000 AS sample_rate, 1 AS n_channels,
       CAST(50 + doc_id % 20 AS BIGINT) AS n_frames,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS(v)) AS INT) AS peak
FROM s GROUP BY doc_id ORDER BY media_id
""",
        "multimodal_jpeg_stats": """
SELECT doc_id AS media_id,
       10 + CAST(doc_id % 7 AS INT) AS width,
       9 + CAST(doc_id % 5 AS INT) AS height,
       TRUE AS ok
FROM documents ORDER BY media_id
""",
        "multimodal_png_stats": """
WITH dims AS (
  SELECT doc_id, 6 + CAST(doc_id % 5 AS INT) AS w,
         4 + CAST(doc_id % 4 AS INT) AS h
  FROM documents),
ys AS (SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS y FROM dims),
xs AS (SELECT doc_id, w, h, y, unnest(generate_series(0, w - 1)) AS x FROM ys),
cs AS (SELECT doc_id, w, h, y, x, unnest(generate_series(0, 2)) AS ch FROM xs)
SELECT doc_id AS media_id, w AS width, h AS height,
       CAST(SUM((doc_id * 31 + y * 17 + x * 7 + ch * 3) % 256) AS BIGINT) AS sum_px
FROM cs GROUP BY doc_id, w, h ORDER BY media_id
""",
        "text_lm_score": f"""
WITH tokd AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
base AS (SELECT doc_id, t FROM tokd WHERE len(t) >= 2),
bi AS (
  SELECT doc_id, i AS pos, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM base)
),
uni AS (SELECT term, count(*) AS cu
        FROM (SELECT unnest(t) AS term FROM tokd) GROUP BY term),
big AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
vv AS (SELECT count(*) AS v FROM uni),
scored AS (
  SELECT b.doc_id, b.pos, ln((cb + 1.0) / (cu + (SELECT v FROM vv))) AS logp
  FROM bi b JOIN big ON b.w1 = big.w1 AND b.w2 = big.w2
            JOIN uni u ON u.term = b.w1
),
folded AS (
  SELECT doc_id, count(*) AS n_bigrams,
         list_reduce(list_prepend(0.0, list(logp ORDER BY pos)),
                     (a, x) -> a + x) AS sum_logp
  FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       ROUND(sum_logp / n_bigrams, 4) AS avg_logp
FROM folded ORDER BY doc_id
""",
        "text_ppl_buckets": f"""
WITH tokd AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
base AS (SELECT doc_id, t FROM tokd WHERE len(t) >= 2),
bi AS (
  SELECT doc_id, i AS pos, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM base)
),
uni AS (SELECT term, count(*) AS cu
        FROM (SELECT unnest(t) AS term FROM tokd) GROUP BY term),
big AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY w1, w2),
vv AS (SELECT count(*) AS v FROM uni),
scored AS (
  SELECT b.doc_id, b.pos, ln((cb + 1.0) / (cu + (SELECT v FROM vv))) AS logp
  FROM bi b JOIN big ON b.w1 = big.w1 AND b.w2 = big.w2
            JOIN uni u ON u.term = b.w1
),
folded AS (
  SELECT doc_id, count(*) AS n_bigrams,
         list_reduce(list_prepend(0.0, list(logp ORDER BY pos)),
                     (a, x) -> a + x) AS sum_logp
  FROM scored GROUP BY doc_id
),
lm AS (
  SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
         ROUND(sum_logp / n_bigrams, 4) AS avg_logp
  FROM folded
),
b AS (
  SELECT lm.doc_id, d.lang, lm.n_bigrams, lm.avg_logp,
         CAST(ntile(3) OVER (PARTITION BY d.lang
              ORDER BY lm.avg_logp DESC, lm.doc_id ASC) AS BIGINT) AS bucket_id
  FROM lm JOIN documents d ON lm.doc_id = d.doc_id
)
SELECT doc_id, lang, n_bigrams, avg_logp, bucket_id,
       CASE bucket_id WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM b ORDER BY doc_id
""",
        "sample_stratum_cap": """
WITH s AS (SELECT doc_id, source,
        ('0x'||substr(md5(source || ':' || CAST(doc_id AS VARCHAR) || ':42'),
                      1, 7))::BIGINT AS h
      FROM documents),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY h ASC, doc_id ASC) AS rk
      FROM s)
SELECT doc_id, source FROM r WHERE rk <= 10 ORDER BY doc_id
""",
    }
    # fielded keyword clause (source:src3) contributes constant 1.0 and
    # filters; the text clause contributes its bm25 score
    d["parsed_fielded_topk"] = _PRELUDE + """
SELECT b.doc_id, ROUND(SUM(b.sc) + 1.0, 4) AS score
FROM bm25 b
WHERE b.term = 'spark'
  AND b.doc_id IN (SELECT doc_id FROM documents WHERE source = 'src3')
GROUP BY b.doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    # keyword-field range: ConstantScore (+1.0) filter on the source
    # column, string-ordered bounds (src1 <= source <= src3 picks up
    # src1, src10..src19, src2, src3 — same collation both engines)
    d["parsed_keyword_range_topk"] = _PRELUDE + """
SELECT b.doc_id, ROUND(SUM(b.sc) + 1.0, 4) AS score
FROM bm25 b
WHERE b.term = 'spark'
  AND b.doc_id IN (SELECT doc_id FROM documents
                   WHERE source >= 'src1' AND source <= 'src3')
GROUP BY b.doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    # multi-field BM25: per-field df/dl/avgdl, global n_docs (maxDoc model)
    d["fielded_tf_topk"] = """
WITH raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
fieldtok AS (
  SELECT doc_id, 'title' AS field, unnest(toks[1:4]) AS term FROM raw
  UNION ALL
  SELECT doc_id, 'text' AS field, unnest(toks) AS term FROM raw
),
tok AS (SELECT * FROM fieldtok WHERE term <> ''),
postings AS (SELECT field, term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
doc_lens AS (SELECT doc_id, field, count(*) AS dl FROM tok GROUP BY 1, 2),
fstats AS (SELECT field, avg(dl) AS avgdl FROM doc_lens GROUP BY field),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM doc_lens),
term_dict AS (SELECT field, term, count(*) AS df FROM postings GROUP BY 1, 2),
bm25 AS (
  SELECT p.doc_id, p.field, p.term,
         ln(1.0 + (n.n_docs - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS sc
  FROM postings p
  JOIN term_dict t ON t.field = p.field AND t.term = p.term
  JOIN doc_lens d ON d.doc_id = p.doc_id AND d.field = p.field
  JOIN fstats s ON s.field = p.field
  CROSS JOIN nd n
)
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25
WHERE (field = 'title' AND term = 'join') OR (field = 'text' AND term = 'spark')
GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    # UTF-16 term-order gates: replay the planted vocab corpus, then order /
    # compare terms by the flattened UTF-16 code-unit list (DuckDB has no
    # UTF-16 codec; surrogate pairs are computed arithmetically — the list
    # comparison replicates Spark's encode(term,'UTF-16BE') binary order)
    from clucene_spark.index.utf16 import duckdb_utf16_key_sql as _u16k

    _u16_case = " ".join(
        f"WHEN {j} THEN '{s}'" for j, s in enumerate(_U16_VOCAB)
    )
    _u16_corpus_sql = f"""
WITH base AS (
  SELECT doc_id, unnest(generate_series(0, 4)) AS i FROM documents
),
tok AS (
  SELECT doc_id, CASE ((doc_id * 5 + i * 3) % 12) {_u16_case} END AS term
  FROM base
),
postings AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
doc_lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
term_dict AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM doc_lens)
"""
    d["term_dict_utf16"] = (
        _u16_corpus_sql
        + f"""
SELECT CAST(row_number() OVER (ORDER BY {_u16k('term')}) AS INT) AS rank,
       term, df
FROM term_dict ORDER BY rank
"""
    )
    _u16_term_k = _u16k("p.term")
    _u16_lo_k = _u16k("'a" + "\U0001f600" + "'")
    _u16_hi_k = _u16k("'a" + "ﬀ" + "'")
    d["range_utf16_topk"] = (
        _u16_corpus_sql
        + f"""
SELECT p.doc_id,
       ROUND(SUM(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))
             * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d2.dl / s.avgdl))), 4) AS score
FROM postings p
JOIN term_dict t USING (term) JOIN doc_lens d2 USING (doc_id) CROSS JOIN stats s
WHERE {_u16_term_k} >= {_u16_lo_k}
  AND NOT ({_u16_term_k} > {_u16_hi_k})
GROUP BY p.doc_id ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    )
    # SnowballAnalyzer(french): replay the deterministic vocab corpus with
    # the PRE-STEMMED constants (stems pinned to the reference C stemmer by
    # tests/test_snowball_langs.py), then plain BM25 — the gate checks the
    # whole Spark tokenize->stem->index->score pipeline
    _fr_case = " ".join(
        f"WHEN {j} THEN '{s}'" for j, s in enumerate(_SNOWBALL_FR_STEMS)
    )
    d["snowball_fr_topk"] = f"""
WITH base AS (
  SELECT doc_id, unnest(generate_series(0, 11)) AS i FROM documents
),
tok AS (
  SELECT doc_id, CASE ((doc_id * 7 + i) % 20) {_fr_case} END AS term
  FROM base
),
postings AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
doc_lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
term_dict AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM doc_lens)
SELECT p.doc_id,
       ROUND(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))
             * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)), 4) AS score
FROM postings p
JOIN term_dict t USING (term) JOIN doc_lens d USING (doc_id) CROSS JOIN stats s
WHERE p.term = 'national'
ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    d["parsed_fielded_tf_topk"] = d["fielded_tf_topk"]
    d["span_fielded_topk"] = _SPAN_FIELDED_SQL
    # MultiFieldQueryParser: 'spark join' per field, title clauses 2x
    d["parsed_multifield_topk"] = d["fielded_tf_topk"].replace(
        """SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25
WHERE (field = 'title' AND term = 'join') OR (field = 'text' AND term = 'spark')
GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""",
        """SELECT doc_id,
       ROUND(SUM(CASE WHEN field = 'title' THEN 2.0 * sc ELSE sc END), 4) AS score
FROM bm25
WHERE term IN ('spark', 'join') AND field IN ('title', 'text')
GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""",
    )
    # date terms: strftime == DateTools day resolution. The parsed range is
    # the reference-default ConstantScoreRangeQuery (constant boost per
    # matching doc; tie order = doc_id ASC)
    d["date_range_topk"] = """
WITH tok AS (
  SELECT o_orderkey AS doc_id, strftime(o_orderdate, '%Y%m%d') AS term
  FROM orders
)
SELECT doc_id, 1.0 AS score
FROM (SELECT DISTINCT doc_id FROM tok
      WHERE term >= '19960301' AND term <= '19960630')
ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    d["term_topk_bm25_std"] = _prelude_std() + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term = 'spark'
GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    d["phrase_topk_std"] = _prelude_std() + """
, pfreq AS (
  SELECT t1.doc_id, count(*) AS pf
  FROM tok t1 JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  WHERE t1.term = 'key' AND t2.term = 'value'
  GROUP BY t1.doc_id
),
idf AS (
  SELECT SUM(ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5))) AS idf_sum,
         any_value(s.avgdl) AS avgdl
  FROM term_dict t CROSS JOIN stats s WHERE t.term IN ('key', 'value')
)
SELECT p.doc_id,
       ROUND(i.idf_sum * (p.pf * 2.2)
             / (p.pf + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl)), 4) AS score
FROM pfreq p JOIN doc_lens d USING (doc_id) CROSS JOIN idf i
WHERE p.pf > 0
ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    # store-served phrase == relational phrase == the same SQL oracle
    d["wand_phrase_topk"] = d["phrase_exact_topk"]
    d["wand_sloppy_phrase_topk"] = d["phrase_sloppy_topk"]
    # parsed-path queries produce identical results to their programmatic
    # twins — same oracle SQL
    d["parsed_sloppy_phrase_topk"] = d["phrase_sloppy_topk"]
    d["parsed_boost_topk"] = d["boosted_or_topk"]
    # the parsed range is the reference's DEFAULT ConstantScoreRangeQuery
    # form (useOldRangeQuery=false, QueryParser.cpp:465-481): every doc
    # with a dictionary term in range scores the constant boost
    d["parsed_range_topk"] = _PRELUDE + """
SELECT doc_id, 1.0 AS score
FROM (SELECT DISTINCT doc_id FROM postings
      WHERE term >= 'sm' AND term <= 'st')
ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    # the exact two-level salted aggregation must equal the plain term dict
    d["term_dict_salted"] = d["term_dict"]
    return d
