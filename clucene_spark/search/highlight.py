"""Highlighter: best-fragment extraction + term markup (contrib analogue).

Reference: src/contribs-lib/CLucene/highlighter/ — Highlighter drives a
Fragmenter (SimpleFragmenter: fixed ~N-char fragments) and a Scorer
(QueryScorer: fragment score = Σ weights of query terms it contains,
weight = idf-like per unique term) and a Formatter (SimpleHTMLFormatter:
<B>term</B>). This restates that pipeline over our analyzer's token
offsets; the Spark entry point is an Arrow-batched mapInPandas so
highlighting a result page is one small python stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from clucene_spark.analysis.analyzers import whitespace_analyze
from clucene_spark.analysis.standard import standard_analyze


def _analyze(text: str, analyzer: str) -> list[tuple]:
    """Token stream (term, pos, start, end, type) for the named analyzer —
    the same two analyzers the index builders accept."""
    if analyzer == "standard":
        return standard_analyze(text)
    if analyzer == "whitespace":
        return [(t, p, s, e, "") for (t, p, s, e) in whitespace_analyze(text)]
    raise ValueError(f"unknown analyzer: {analyzer!r}")


def best_fragment(
    text: str,
    query_terms: list[str],
    fragment_size: int = 100,
    pre: str = "<b>",
    post: str = "</b>",
    term_weights: dict[str, float] | None = None,
    tokens: list[tuple] | None = None,
    analyzer: str = "standard",
) -> tuple[str, float]:
    """-> (highlighted best fragment, fragment score).

    tokens: optional precomputed (term, pos, start, end, type) stream —
    the TokenSources-from-term-vectors path (no re-analysis); defaults to
    running the StandardAnalyzer over `text`.

    Fragments = consecutive token runs closed when the fragment exceeds
    fragment_size chars (SimpleFragmenter.getNewFragment semantics);
    fragment score = Σ tf-within-fragment × weight(term) over query terms
    (QueryScorer with default weights = 1, or per-term idf if provided);
    the best-scoring fragment's matched tokens are wrapped pre/post."""
    qset = set(query_terms)
    weights = term_weights or {}
    toks = tokens if tokens is not None else _analyze(text, analyzer)

    # split tokens into fragments by character budget
    fragments: list[list[tuple]] = [[]]
    frag_start = 0
    for tok in toks:
        term, pos, s, e, ty = tok
        if fragments[-1] and (e - frag_start) > fragment_size:
            fragments.append([])
            frag_start = s
        fragments[-1].append(tok)

    def frag_score(frag) -> float:
        return sum(weights.get(t[0], 1.0) for t in frag if t[0] in qset)

    best = max(fragments, key=frag_score)
    score = frag_score(best)
    if not best:
        return "", 0.0
    lo = best[0][2]
    hi = best[-1][3]
    # wrap matches back-to-front so offsets stay valid
    out = text[lo:hi]
    for term, pos, s, e, ty in reversed(best):
        if term in qset:
            out = out[: s - lo] + pre + out[s - lo : e - lo] + post + out[e - lo :]
    return out, float(score)


HL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fragment", T.StringType(), False),
        T.StructField("n_matches", T.DoubleType(), False),
    ]
)


def highlight_query(
    docs: DataFrame,
    query,
    searcher,
    fragment_size: int = 100,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    analyzer: str = "standard",
) -> DataFrame:
    """Highlight straight from a Query tree: extract (term, weight) pairs
    via Searcher.extract_terms (the QueryScorer(query) constructor path —
    reference QueryScorer.cpp:37-49 builds its WeightedTerm map exactly
    this way) and run the fragment pipeline with those weights."""
    pairs = searcher.extract_terms(query)
    return highlight(
        docs, [t for t, _ in pairs], fragment_size, text_col, doc_id_col,
        analyzer, term_weights=dict(pairs),
    )


def highlight(
    docs: DataFrame,
    query_terms: list[str],
    fragment_size: int = 100,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    analyzer: str = "standard",
    term_weights: dict | None = None,
) -> DataFrame:
    """(doc_id, fragment, n_matches) for every doc — apply after a top-k
    join so only the result page pays the python stage. ``term_weights``
    scores fragments by summed per-term weight (the QueryScorer
    WeightedTerm map); default weight 1."""
    terms = list(query_terms)
    tw = dict(term_weights or {})
    src = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frags, scores = [], []
            for text in pdf["text"]:
                f, s = best_fragment(
                    text or "", terms, fragment_size, analyzer=analyzer,
                    term_weights=tw,
                )
                frags.append(f)
                scores.append(s)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fragment": frags,
                    "n_matches": pd.Series(scores, dtype="float64"),
                }
            )

    return src.mapInPandas(_batch, HL_SCHEMA)


def highlight_from_vectors(
    store,
    docs: DataFrame,
    query_terms: list[str],
    fragment_size: int = 100,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Highlight a (small) result page using STORED term vectors with
    offsets — the reference's TokenSources::getTokenStream(TermPositionVector)
    path (highlighter reads .tvf offsets instead of re-running the
    analyzer; requires build_term_vectors_offsets). The vector scan is
    pruned to the page's doc_ids (pushed to parquet row groups)."""
    ids = [int(r[0]) for r in docs.select(doc_id_col).collect()]
    tv = store.term_vectors().filter(F.col("doc_id").isin(ids))
    if "starts" not in tv.columns:
        raise ValueError(
            "term vectors lack offsets — build with build_term_vectors_offsets"
        )
    toks = (
        tv.select(
            "doc_id", "term",
            F.explode(F.arrays_zip("positions", "starts", "ends")).alias("z"),
        )
        .select(
            "doc_id", "term",
            F.col("z.positions").alias("pos"),
            F.col("z.starts").alias("s"),
            F.col("z.ends").alias("e"),
        )
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "term", "s", "e"))
            ).alias("toks")
        )
    )
    # LEFT join: a page doc with no vector rows (zero tokens, vectors
    # not built for it) must still come back with an empty fragment —
    # an inner join would silently drop it and misalign callers zipping
    # the page with its highlights
    src = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    ).join(toks, "doc_id", "left")
    terms = list(query_terms)
    fsize = fragment_size

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frags, scores = [], []
            for text, tok_rows in zip(pdf["text"], pdf["toks"]):
                stream = [
                    (t["term"], t["pos"], t["s"], t["e"], "")
                    for t in (tok_rows if tok_rows is not None else [])
                ]
                f, sc = best_fragment(text or "", terms, fsize, tokens=stream)
                frags.append(f)
                scores.append(sc)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fragment": frags,
                    "n_matches": pd.Series(scores, dtype="float64"),
                }
            )

    return src.mapInPandas(_batch, HL_SCHEMA)
