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
    # doc 3 long pairing alpha@0..beta@3 (slack 2) also matches
    assert (3, 0, 4) in got


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
