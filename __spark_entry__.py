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

from pyspark.sql import DataFrame, SparkSession, functions as F

from clucene_spark.index.build import InvertedIndex
from clucene_spark.queryparser.parser import parse as _parse
from clucene_spark.search.engine import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    FuzzyQuery,
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

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
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
        "range_topk": lambda spark, sf: _searcher(spark, sf).topk(
            RangeQuery(lower="sm", upper="st", inclusive=True), 10, round_to=4
        ),
        # --- query parser path (SURVEY §3b: parse -> AST -> plan) ---
        "parsed_and_topk": lambda spark, sf: _searcher(spark, sf).topk(
            _parse("spark AND join"), 10, round_to=4
        ),
        "parsed_nested_topk": lambda spark, sf: _searcher(spark, sf).topk(
            _parse("window OR (spark AND join)"), 10, round_to=4
        ),
        # --- persistent segment store + block-max WAND (SURVEY §2b/2c/2d,
        #     north-star: varbyte segments, LSM merge, BMW top-k) ---
        "wand_or_topk": lambda spark, sf: __import__(
            "clucene_spark.search.wand", fromlist=["wand_query"]
        ).wand_query(_store(spark, sf), ["spark", "vector", "window"], k=10),
        "wand_and_topk": lambda spark, sf: __import__(
            "clucene_spark.search.wand", fromlist=["wand_query"]
        ).wand_query(_store(spark, sf), ["spark", "join"], k=10, mode="AND"),
        "wand_merged_topk": lambda spark, sf: __import__(
            "clucene_spark.search.wand", fromlist=["wand_query"]
        ).wand_query(_store(spark, sf, compacted=True), ["spark", "vector", "window"], k=10),
        # --- index-build aggregations (SURVEY §2b: term dict, norms) ---
        "term_dict": lambda spark, sf: _index(spark, sf).term_dict.orderBy("term"),
        "doc_lens": lambda spark, sf: _index(spark, sf).doc_lens.orderBy("doc_id"),
        "corpus_stats": lambda spark, sf: _index(spark, sf).doc_lens.agg(
            F.count("*").alias("n_docs"), F.round(F.avg("dl"), 4).alias("avgdl")
        ),
        "top_df_terms": lambda spark, sf: _index(spark, sf)
        .term_dict.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(10),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "term_topk_bm25": _bm25_topk_sql(["spark"]),
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
        "fuzzy_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25
WHERE 1.0 - levenshtein(term, 'spark') / least(length(term), 5) >= 0.7
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
        "range_topk": _PRELUDE
        + """
SELECT doc_id, ROUND(SUM(sc), 4) AS score
FROM bm25 WHERE term >= 'sm' AND term <= 'st'
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
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
        "term_dict": _PRELUDE
        + "SELECT term, df, cf FROM term_dict ORDER BY term",
        "doc_lens": _PRELUDE
        + "SELECT doc_id, dl FROM doc_lens ORDER BY doc_id",
        "corpus_stats": _PRELUDE
        + "SELECT n_docs, ROUND(avgdl, 4) AS avgdl FROM stats",
        "top_df_terms": _PRELUDE
        + "SELECT term, df, cf FROM term_dict ORDER BY df DESC, term ASC LIMIT 10",
    }
