"""MoreLikeThis — find-similar-documents (the Lucene `queries` contrib
MoreLikeThis, the classic "related articles" feature).

Select the seed doc's most informative terms by tf·idf — idf in the
reference's classic shape ln(N/(df+1))+1 (Similarity.cpp:227-229) —
and run them as a SHOULD query, excluding the seed doc. The interesting
query terms become an ordinary BooleanQuery, so scoring, top-k tiebreak
(score DESC, doc_id ASC) and the TakeOrderedAndProject plan are all the
engine's existing machinery.

Scale shape: term selection reads ONE doc's posting rows (a doc_id
point-filter pushed to the scan, joined to the term dictionary —
bounded by the doc's vocabulary, the only collect); the query itself is
the standard filtered Boolean path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from clucene_spark.search.engine import (
    SHOULD,
    BooleanQuery,
    FilteredQuery,
    TermQuery,
)


def interesting_terms(
    searcher,
    doc_id: int,
    max_terms: int = 25,
    min_tf: int = 1,
    min_df: int = 1,
) -> list[tuple[float, str]]:
    """The seed doc's top terms by tf·idf, (weight, term), weight rounded
    to 6 dp, ties broken term ASC — deterministic across engines."""
    idx = searcher.index
    n_docs = idx.doc_lens.select("doc_id").distinct().count()
    rows = (
        idx.postings.filter(F.col("doc_id") == int(doc_id))
        .join(idx.term_dict.select("term", "df"), "term")
        .select("term", "tf", "df")
        .collect()
    )
    scored = [
        (
            round(r["tf"] * (math.log(n_docs / (r["df"] + 1.0)) + 1.0), 6),
            r["term"],
        )
        for r in rows
        if r["tf"] >= min_tf and r["df"] >= min_df
    ]
    return sorted(scored, key=lambda x: (-x[0], x[1]))[:max_terms]


def more_like_this(
    searcher,
    doc_id: int,
    max_terms: int = 25,
    min_tf: int = 1,
    min_df: int = 1,
    k: int = 10,
    round_to: int | None = 4,
) -> DataFrame:
    """Top-k docs most similar to `doc_id` (the seed itself excluded)."""
    top = interesting_terms(searcher, doc_id, max_terms, min_tf, min_df)
    q = BooleanQuery()
    for _, t in top:
        q.add(TermQuery(term=t), SHOULD)
    fq = FilteredQuery(query=q, predicate=F.col("doc_id") != int(doc_id))
    return searcher.topk(fq, k, round_to=round_to)
