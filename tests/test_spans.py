"""Span-query algebra tests (the reference's spans suite analogue:
src/test/search/spans/TestBasics.cpp / TestSpans.cpp golden semantics on a
hand-built mini corpus)."""

from __future__ import annotations

import pytest

from clucene_spark.index.build import InvertedIndex
from clucene_spark.search.spans import (
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanSearcher,
    SpanTerm,
)

DOCS = [
    (0, "alpha beta gamma delta"),
    (1, "beta alpha gamma"),
    (2, "alpha gamma beta"),
    (3, "alpha beta alpha beta"),
    (4, "gamma delta epsilon"),
    (5, "alpha x x x beta"),
]


@pytest.fixture(scope="module")
def s(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return SpanSearcher(InvertedIndex(df))


def _spans(s, q):
    return sorted(
        (r["doc_id"], r["s"], r["e"]) for r in s.spans(q).collect()
    )


def test_span_term(s):
    assert _spans(s, SpanTerm("delta")) == [(0, 3, 4), (4, 1, 2)]


def test_span_first(s):
    # alpha within the first 2 positions
    got = _spans(s, SpanFirst(SpanTerm("alpha"), end=2))
    assert got == [(0, 0, 1), (1, 1, 2), (2, 0, 1), (3, 0, 1), (5, 0, 1)]


def test_span_near_ordered_exact(s):
    # "alpha beta" adjacent in order
    q = SpanNear([SpanTerm("alpha"), SpanTerm("beta")], slop=0, in_order=True)
    got = _spans(s, q)
    assert got == [(0, 0, 2), (3, 0, 2), (3, 2, 4)]


def test_span_near_ordered_slop(s):
    # alpha ... beta within 3 unmatched positions, ordered
    q = SpanNear([SpanTerm("alpha"), SpanTerm("beta")], slop=3, in_order=True)
    got = _spans(s, q)
    # doc 5: alpha@0, beta@4 -> width 5, slack 3 -> matches
    assert (5, 0, 5) in got
    assert (0, 0, 2) in got
    # doc 3 'alpha beta alpha beta': the reference iterator emits the
    # SHRUNK minimal matches [0,2) and [2,4) only — the long pairing
    # alpha@0..beta@3 is a non-minimal combination NearSpansOrdered
    # never produces (shrinkToAfterShortestMatch consumes alpha@0 into
    # the [0,2) match)
    assert (3, 0, 2) in got and (3, 2, 4) in got
    assert (3, 0, 4) not in got


def test_span_near_unordered(s):
    # beta then alpha (doc 1) matches only when order is relaxed
    q_ord = SpanNear([SpanTerm("alpha"), SpanTerm("beta")], slop=0, in_order=True)
    q_un = SpanNear([SpanTerm("alpha"), SpanTerm("beta")], slop=0, in_order=False)
    assert (1, 0, 2) not in _spans(s, q_ord)
    assert (1, 0, 2) in _spans(s, q_un)


def test_span_or(s):
    got = _spans(s, SpanOr([SpanTerm("delta"), SpanTerm("epsilon")]))
    assert got == [(0, 3, 4), (4, 1, 2), (4, 2, 3)]


def test_span_not(s):
    # alpha spans not overlapping "alpha beta"-near spans: the standalone
    # alphas survive
    near = SpanNear([SpanTerm("alpha"), SpanTerm("beta")], slop=0, in_order=True)
    got = _spans(s, SpanNot(SpanTerm("alpha"), near))
    assert (1, 1, 2) in got          # doc 1 alpha not followed by beta
    assert (2, 0, 1) in got
    assert (0, 0, 1) not in got      # consumed by the near span
    assert (3, 0, 1) not in got and (3, 2, 3) not in got


def test_span_nested_composition(s):
    # near(or(delta, epsilon), gamma) unordered slop 1
    q = SpanNear(
        [SpanOr([SpanTerm("delta"), SpanTerm("epsilon")]), SpanTerm("gamma")],
        slop=1,
        in_order=False,
    )
    docs = {d for d, _, _ in _spans(s, q)}
    assert docs == {0, 4}


def test_span_scoring_orders_by_tightness(s):
    # tighter matches (smaller slack) outrank looser ones for equal tf
    q = SpanNear([SpanTerm("alpha"), SpanTerm("beta")], slop=3, in_order=True)
    rows = [(r["doc_id"], r["score"]) for r in s.topk(q, 10, round_to=6).collect()]
    by_doc = dict(rows)
    assert by_doc[0] > by_doc[5]  # adjacent beats slop-3 in same-ish length docs
    assert rows == sorted(rows, key=lambda t: (-t[1], t[0]))


# ---------------------------------------------------------------------------
# fielded span streams (SpanQuery::getField contract on a multi-field index)
# ---------------------------------------------------------------------------

def test_fielded_span_searcher_matches_single_field(spark):
    """A fielded index whose 'body' field carries the fixture text must
    produce byte-identical span streams and scores to the single-field
    index, and a disjoint 'tag' field must not leak into them."""
    single = SpanSearcher(InvertedIndex(
        spark.createDataFrame(DOCS, "doc_id long, text string")))
    two = spark.createDataFrame(
        [(i, t, f"tag{i} alpha") for i, t in DOCS],
        "doc_id long, text string, tag string",
    )
    idx = InvertedIndex(
        two, fields=[("body", "text", "whitespace"),
                     ("tag", "tag", "whitespace")]
    )
    fielded = SpanSearcher(idx, field="body")
    q = SpanNear([SpanTerm("alpha"), SpanTerm("beta")], slop=1, in_order=True)
    assert _spans(fielded, q) == _spans(single, q)
    got = sorted(
        (r["doc_id"], round(r["score"], 6)) for r in fielded.score(q).collect()
    )
    want = sorted(
        (r["doc_id"], round(r["score"], 6)) for r in single.score(q).collect()
    )
    assert got == want
    # the tag field sees only its own tokens
    tags = SpanSearcher(idx, field="tag")
    assert _spans(tags, SpanTerm("beta")) == []
    assert len(_spans(tags, SpanTerm("alpha"))) == len(DOCS)


def test_fielded_span_requires_field_or_default(spark):
    two = spark.createDataFrame(
        [(0, "a b", "x")], "doc_id long, text string, tag string"
    )
    idx = InvertedIndex(
        two, fields=[("text", "text", "whitespace"),
                     ("tag", "tag", "whitespace")]
    )
    # default_field fallback: first declared field
    assert SpanSearcher(idx).field == "text"


def test_fielded_span_score_query_through_engine(spark):
    """SpanScoreQuery on a fielded Searcher (the r3 NotImplementedError
    path): scores must equal the hand-built per-field BM25 fold."""
    from clucene_spark.search.engine import Searcher, SpanScoreQuery

    two = spark.createDataFrame(
        [(i, t, "alpha beta") for i, t in DOCS],
        "doc_id long, text string, title string",
    )
    idx = InvertedIndex(
        two, fields=[("text", "text", "whitespace"),
                     ("title", "title", "whitespace")]
    )
    eng = Searcher(idx)
    q = SpanScoreQuery(
        span=SpanNear([SpanTerm("alpha"), SpanTerm("beta")], slop=0,
                      in_order=True),
        field="title",
    )
    rows = eng.topk(q, 10).collect()
    # every doc's title is 'alpha beta': identical dl, identical pfreq ->
    # identical scores for all six docs, doc_id ascending tiebreak
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3, 4, 5]
    assert len({round(r["score"], 9) for r in rows}) == 1
    # and the text-field form differs (doc-dependent), proving routing
    q_text = SpanScoreQuery(
        span=SpanNear([SpanTerm("alpha"), SpanTerm("beta")], slop=0,
                      in_order=True),
        field="text",
    )
    text_rows = eng.topk(q_text, 10).collect()
    assert {r["doc_id"] for r in text_rows} == {0, 3}


def test_near_walk_kernels_reference_traces():
    """Hand-traced goldens for the per-doc NearSpans walks (reference
    NearSpansOrdered.cpp / NearSpansUnordered.cpp semantics)."""
    from clucene_spark.search.spans import (
        near_spans_ordered,
        near_spans_unordered,
    )

    a = [(0, 1), (2, 3)]
    b = [(1, 2), (3, 4)]
    # 'a b a b': minimal matches only — NOT the cross-join's (0,4)
    assert near_spans_ordered([a, b], 3) == [(0, 2), (2, 4)]
    # 'a a b': the closest key wins, the earlier one is consumed
    assert near_spans_ordered([[(0, 1), (1, 2)], [(2, 3)]], 3) == [(1, 3)]
    # 'a b b': one match; the second b has no remaining a
    assert near_spans_ordered([[(0, 1)], [(1, 2), (3, 4)]], 3) == [(0, 2)]
    # slop gates emission but consumption still advances
    assert near_spans_ordered([[(0, 1)], [(3, 4)]], 1) == []
    assert near_spans_ordered([[(0, 1)], [(3, 4)]], 2) == [(0, 4)]
    # ordered-ness is about STARTS (docSpansOrdered): containment with a
    # distinct start is ordered, overlap adds no slop, and the match end
    # is the LAST clause's end even when an earlier clause reaches
    # further (shrinkToAfterShortestMatch takes matchEnd before walking)
    assert near_spans_ordered([[(0, 3)], [(1, 2)]], 0) == [(0, 2)]
    # identical starts need a strictly SHORTER first span
    assert near_spans_ordered([[(0, 2)], [(0, 1)]], 3) == []
    assert near_spans_ordered([[(0, 1)], [(0, 2)]], 3) == [(0, 2)]
    # unordered: reversed adjacency matches; the overlapping middle
    # window (1,3) of 'a b a b' is a real reference configuration
    assert near_spans_unordered([[(1, 2)], [(0, 1)]], 0) == [(0, 2)]
    assert near_spans_unordered([a, b], 0) == [(0, 2), (1, 3), (2, 4)]
    # empty clause stream -> no matches
    assert near_spans_ordered([a, []], 3) == []
    assert near_spans_unordered([[], b], 3) == []
