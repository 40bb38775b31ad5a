"""Golden-corpus ports of the reference's span/boolean/duplicates suites.

The reference drives its span and scorer tests over two tiny fixed corpora
with hand-checked expected docID lists:

- `src/test/search/spans/TestBasics.cpp` — 1000 docs of
  English::IntToEnglish(i) (src/test/util/English.cpp) under SimpleAnalyzer;
  term/phrase/boolean/span-near/span-not/span-first/span-or golden doc lists.
- `src/test/search/spans/TestSpans.cpp` — a 12-doc w/u/t fixture exercising
  ordered-near slop grids, repeated equal clauses, and exact span tuples.
- `src/test/search/spans/TestNearSpansOrdered.cpp` — a 4-doc fixture with
  exact NearSpansOrdered (doc, start, end) enumeration.
- `src/test/search/TestForDuplicates.cpp` — result streams must never
  repeat a docID.
- `src/test/search/TestBoolean.cpp` — query equality, nested MUST/MUST_NOT
  hit counts, prefix-inside-boolean rewrite equivalence.

Every expected list below is transcribed verbatim from the reference test
source (golden data, not derived by our own code).
"""

from __future__ import annotations

import pytest

from clucene_spark.index.build import InvertedIndex
from clucene_spark.search.engine import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    Searcher,
    SpanScoreQuery,
    TermQuery,
)
from clucene_spark.search.spans import (
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanSearcher,
    SpanTerm,
)


# ---------------------------------------------------------------------------
# English::IntToEnglish (src/test/util/English.cpp:10-120), exact mirror.
# SimpleAnalyzer splits on non-letters and lowercases; the generator only
# emits lowercase words joined by space/hyphen/comma, so tokenization
# reduces to splitting on those separators.
# ---------------------------------------------------------------------------

_TENS = {9: "ninety", 8: "eighty", 7: "seventy", 6: "sixty", 5: "fifty",
         4: "forty", 3: "thirty", 2: "twenty"}
_ONES = {19: "nineteen", 18: "eighteen", 17: "seventeen", 16: "sixteen",
         15: "fifteen", 14: "fourteen", 13: "thirteen", 12: "twelve",
         11: "eleven", 10: "ten", 9: "nine", 8: "eight", 7: "seven",
         6: "six", 5: "five", 4: "four", 3: "three", 2: "two", 1: "one"}


def int_to_english(i: int) -> str:
    if i == 0:
        return "zero"
    out = []
    if i < 0:
        out.append("minus ")
        i = -i
    if i >= 1_000_000_000:
        out.append(int_to_english(i // 1_000_000_000))
        out.append("billion, ")
        i %= 1_000_000_000
    if i >= 1_000_000:
        out.append(int_to_english(i // 1_000_000))
        out.append("million, ")
        i %= 1_000_000
    if i >= 1000:
        out.append(int_to_english(i // 1000))
        out.append("thousand, ")
        i %= 1000
    if i >= 100:
        out.append(int_to_english(i // 100))
        out.append("hundred ")
        i %= 100
    if i >= 20:
        out.append(_TENS[i // 10])
        i %= 10
        out.append(" " if i == 0 else "-")
    if i > 0:
        out.append(_ONES[i] + " ")
    return "".join(out)


def eng_tokens(i: int) -> list[str]:
    return int_to_english(i).replace(",", " ").replace("-", " ").split()


def test_int_to_english_golden():
    # spot goldens from the English.cpp recursion
    assert eng_tokens(0) == ["zero"]
    assert eng_tokens(77) == ["seventy", "seven"]
    assert eng_tokens(605) == ["six", "hundred", "five"]
    assert eng_tokens(333) == ["three", "hundred", "thirty", "three"]
    assert eng_tokens(996) == ["nine", "hundred", "ninety", "six"]


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def eng_index(spark):
    rows = [(i, " ".join(eng_tokens(i))) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return InvertedIndex(df).cache()


@pytest.fixture(scope="module")
def eng_search(eng_index):
    return Searcher(eng_index)


@pytest.fixture(scope="module")
def eng_spans(eng_index):
    return SpanSearcher(eng_index)


def _docs(df) -> list[int]:
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def _span_tuples(searcher, q) -> list[tuple[int, int, int]]:
    return sorted(
        (r["doc_id"], r["s"], r["e"]) for r in searcher.spans(q).collect()
    )


# ---------------------------------------------------------------------------
# TestBasics.cpp golden doc lists (verbatim)
# ---------------------------------------------------------------------------

SEVENTY_DOCS = sorted(
    d for base in range(0, 1000, 100) for d in range(base + 70, base + 80)
)  # TestBasics.cpp:65-74 writes these 100 ids out longhand

SEVENTY_SEVEN = [77, 177, 277, 377, 477, 577, 677, 777, 877, 977]


def test_basics_term(eng_search):
    """testTerm/testTerm2 (TestBasics.cpp:63-92)."""
    assert _docs(eng_search.score(TermQuery(term="seventy"))) == SEVENTY_DOCS
    assert _docs(eng_search.score(TermQuery(term="seventish"))) == []


def test_basics_phrase(eng_search):
    """testPhrase/testPhrase2 (TestBasics.cpp:94-125)."""
    q = PhraseQuery(terms=["seventy", "seven"])
    assert _docs(eng_search.score(q)) == SEVENTY_SEVEN
    q = PhraseQuery(terms=["seventish", "sevenon"])
    assert _docs(eng_search.score(q)) == []


def test_basics_boolean(eng_search):
    """testBoolean/testBoolean2 (TestBasics.cpp:128-159)."""
    want = sorted([77, 777, 177, 277, 377, 477, 577, 677, 770, 771, 772,
                   773, 774, 775, 776, 778, 779, 877, 977])
    q = (BooleanQuery()
         .add(TermQuery(term="seventy"), MUST)
         .add(TermQuery(term="seven"), MUST))
    assert _docs(eng_search.score(q)) == want
    q = (BooleanQuery()
         .add(TermQuery(term="sevento"), MUST)
         .add(TermQuery(term="sevenly"), MUST))
    assert _docs(eng_search.score(q)) == []


def test_basics_span_near_exact(eng_spans):
    """testSpanNearExact (TestBasics.cpp:162-173)."""
    q = SpanNear(clauses=[SpanTerm(term="seventy"), SpanTerm(term="seven")],
                 slop=0, in_order=True)
    assert _docs(eng_spans.score(q)) == SEVENTY_SEVEN


def test_basics_span_near_unordered(eng_spans):
    """testSpanNearUnordered (TestBasics.cpp:192-208)."""
    want = sorted([609, 629, 639, 649, 659, 669, 679, 689, 699,
                   906, 926, 936, 946, 956, 966, 976, 986, 996])
    q = SpanNear(clauses=[SpanTerm(term="nine"), SpanTerm(term="six")],
                 slop=4, in_order=False)
    assert _docs(eng_spans.score(q)) == want


def test_basics_span_near_ordered(eng_spans):
    """testSpanNearOrdered (TestBasics.cpp:211-227)."""
    want = [906, 926, 936, 946, 956, 966, 976, 986, 996]
    q = SpanNear(clauses=[SpanTerm(term="nine"), SpanTerm(term="six")],
                 slop=4, in_order=True)
    assert _docs(eng_spans.score(q)) == want


NEAR_EIGHT_ONE = SpanNear(
    clauses=[SpanTerm(term="eight"), SpanTerm(term="one")],
    slop=4, in_order=True,
)


def test_basics_span_not(eng_spans):
    """testSpanNot (TestBasics.cpp:230-260): near(eight,one)~4 not forty."""
    want = [801, 821, 831, 851, 861, 871, 881, 891]
    q = SpanNot(include=NEAR_EIGHT_ONE, exclude=SpanTerm(term="forty"))
    assert _docs(eng_spans.score(q)) == want


def test_basics_span_not_or_single(eng_spans):
    """testSpanWithMultipleNotSingle (TestBasics.cpp:263-295)."""
    want = [801, 821, 831, 851, 861, 871, 881, 891]
    q = SpanNot(include=NEAR_EIGHT_ONE,
                exclude=SpanOr(clauses=[SpanTerm(term="forty")]))
    assert _docs(eng_spans.score(q)) == want


def test_basics_span_not_or_many(eng_spans):
    """testSpanWithMultipleNotMany (TestBasics.cpp:298-337)."""
    want = [801, 821, 831, 851, 871, 891]
    q = SpanNot(
        include=NEAR_EIGHT_ONE,
        exclude=SpanOr(clauses=[SpanTerm(term="forty"),
                                SpanTerm(term="sixty"),
                                SpanTerm(term="eighty")]),
    )
    assert _docs(eng_spans.score(q)) == want


def test_basics_span_not_with_near_exclude(eng_spans):
    """testNpeInSpanNearWithSpanNot (TestBasics.cpp:340-375)."""
    want = [801, 821, 831, 851, 861, 871, 881, 891]
    exclude = SpanNear(
        clauses=[SpanTerm(term="hundred"), SpanTerm(term="forty")],
        slop=1, in_order=True,
    )
    q = SpanNot(include=NEAR_EIGHT_ONE, exclude=exclude)
    assert _docs(eng_spans.score(q)) == want


def test_basics_span_first_nested_not(eng_spans):
    """testNpeInSpanNearInSpanFirstInSpanNot (TestBasics.cpp:378-400)."""
    want = list(range(40, 50))
    include = SpanFirst(query=SpanTerm(term="forty"), end=5)
    near = SpanNear(
        clauses=[SpanTerm(term="hundred"), SpanTerm(term="forty")],
        slop=4, in_order=True,
    )
    exclude = SpanFirst(query=near, end=4)
    q = SpanNot(include=include, exclude=exclude)
    assert _docs(eng_spans.score(q)) == want


def test_basics_span_first(eng_spans):
    """testSpanFirst (TestBasics.cpp:403-431): "five" at position 0."""
    want = sorted([5] + list(range(500, 600)))
    q = SpanFirst(query=SpanTerm(term="five"), end=1)
    assert _docs(eng_spans.score(q)) == want


def test_basics_span_or_of_nears(eng_spans):
    """testSpanOr (TestBasics.cpp:434-472)."""
    want = sorted([33, 47, 133, 147, 233, 247, 333, 347, 433, 447,
                   533, 547, 633, 647, 733, 747, 833, 847, 933, 947])
    near1 = SpanNear(clauses=[SpanTerm(term="thirty"), SpanTerm(term="three")],
                     slop=0, in_order=True)
    near2 = SpanNear(clauses=[SpanTerm(term="forty"), SpanTerm(term="seven")],
                     slop=0, in_order=True)
    q = SpanOr(clauses=[near1, near2])
    assert _docs(eng_spans.score(q)) == want


def test_basics_span_exact_nested(eng_spans):
    """testSpanExactNested (TestBasics.cpp:475-509): near of nears."""
    near1 = SpanNear(clauses=[SpanTerm(term="three"), SpanTerm(term="hundred")],
                     slop=0, in_order=True)
    near2 = SpanNear(clauses=[SpanTerm(term="thirty"), SpanTerm(term="three")],
                     slop=0, in_order=True)
    q = SpanNear(clauses=[near1, near2], slop=0, in_order=True)
    assert _docs(eng_spans.score(q)) == [333]


SIX_SEVEN_DOCS = sorted(
    [606, 607, 626, 627, 636, 637, 646, 647,
     656, 657, 666, 667, 676, 677, 686, 687, 696, 697,
     706, 707, 726, 727, 736, 737, 746, 747,
     756, 757, 766, 767, 776, 777, 786, 787, 796, 797]
)


def test_basics_span_near_or(eng_spans):
    """testSpanNearOr (TestBasics.cpp:512-547)."""
    to1 = SpanOr(clauses=[SpanTerm(term="six"), SpanTerm(term="seven")])
    to2 = SpanOr(clauses=[SpanTerm(term="seven"), SpanTerm(term="six")])
    q = SpanNear(clauses=[to1, to2], slop=10, in_order=True)
    assert _docs(eng_spans.score(q)) == SIX_SEVEN_DOCS


def test_basics_span_complex1(eng_spans):
    """testSpanComplex1 (TestBasics.cpp:550-583)."""
    tt1 = SpanNear(clauses=[SpanTerm(term="six"), SpanTerm(term="hundred")],
                   slop=0, in_order=True)
    tt2 = SpanNear(clauses=[SpanTerm(term="seven"), SpanTerm(term="hundred")],
                   slop=0, in_order=True)
    to1 = SpanOr(clauses=[tt1, tt2])
    to2 = SpanOr(clauses=[SpanTerm(term="seven"), SpanTerm(term="six")])
    q = SpanNear(clauses=[to1, to2], slop=100, in_order=True)
    assert _docs(eng_spans.score(q)) == SIX_SEVEN_DOCS


# ---------------------------------------------------------------------------
# TestSpans.cpp 12-doc fixture (docFields at TestSpans.cpp:14-28)
# ---------------------------------------------------------------------------

SPANS_DOCS = [
    (0, "w1 w2 w3 w4 w5"),
    (1, "w1 w3 w2 w3"),
    (2, "w1 xx w2 yy w3"),
    (3, "w1 w3 xx w2 yy w3"),
    (4, "u2 u2 u1"),
    (5, "u2 xx u2 u1"),
    (6, "u2 u2 xx u1"),
    (7, "u2 xx u2 yy u1"),
    (8, "u2 xx u1 u2"),
    (9, "u2 u1 xx u2"),
    (10, "u1 u2 xx u2"),
    (11, "t1 t2 t1 t3 t2 t3"),
]


@pytest.fixture(scope="module")
def spans12(spark):
    df = spark.createDataFrame(SPANS_DOCS, "doc_id long, text string")
    return SpanSearcher(InvertedIndex(df).cache())


def _near3(t1, t2, t3, slop, in_order=True):
    return SpanNear(
        clauses=[SpanTerm(term=t1), SpanTerm(term=t2), SpanTerm(term=t3)],
        slop=slop, in_order=in_order,
    )


def test_spans_near_ordered_grid(spans12):
    """testSpanNearOrdered (TestSpans.cpp:134-143): slop grid 0-4."""
    grid = {0: [0], 1: [0, 1], 2: [0, 1, 2], 3: [0, 1, 2, 3],
            4: [0, 1, 2, 3]}
    for slop, want in grid.items():
        q = _near3("w1", "w2", "w3", slop)
        assert _docs(spans12.score(q)) == want, f"slop={slop}"


def test_spans_near_ordered_equal_grid(spans12):
    """testSpanNearOrderedEqual (TestSpans.cpp:146-152): repeated w3."""
    grid = {0: [], 1: [1], 2: [1], 3: [1, 3]}
    for slop, want in grid.items():
        q = _near3("w1", "w3", "w3", slop)
        assert _docs(spans12.score(q)) == want, f"slop={slop}"


def test_spans_near_ordered_equal1_grid(spans12):
    """testSpanNearOrderedEqual1 (TestSpans.cpp:155-163): repeated u2."""
    grid = {0: [4], 1: [4, 5, 6], 2: [4, 5, 6, 7], 3: [4, 5, 6, 7]}
    for slop, want in grid.items():
        q = _near3("u2", "u2", "u1", slop)
        assert _docs(spans12.score(q)) == want, f"slop={slop}"


def test_spans_near_ordered_overlap_tuples(spans12):
    """testSpanNearOrderedOverlap (TestSpans.cpp:165-193): doc 11
    "t1 t2 t1 t3 t2 t3" yields exactly spans (0,4) and (2,6)."""
    q = _near3("t1", "t2", "t3", 1)
    assert _span_tuples(spans12, q) == [(11, 0, 4), (11, 2, 6)]


def test_spans_or_streams(spans12):
    """testSpanOrSingle/Double/Unused/TripleSameDoc (TestSpans.cpp:225-300):
    exact (doc, start, end) span streams."""
    single = SpanOr(clauses=[SpanTerm(term="w5")])
    assert _span_tuples(spans12, single) == [(0, 4, 5)]

    double = SpanOr(clauses=[SpanTerm(term="w5"), SpanTerm(term="yy")])
    assert _span_tuples(spans12, double) == [
        (0, 4, 5), (2, 3, 4), (3, 4, 5), (7, 3, 4)]

    unused = SpanOr(clauses=[SpanTerm(term="w5"), SpanTerm(term="unusedterm"),
                             SpanTerm(term="yy")])
    assert _span_tuples(spans12, unused) == [
        (0, 4, 5), (2, 3, 4), (3, 4, 5), (7, 3, 4)]

    triple = SpanOr(clauses=[SpanTerm(term="t1"), SpanTerm(term="t2"),
                             SpanTerm(term="t3")])
    assert _span_tuples(spans12, triple) == [
        (11, 0, 1), (11, 1, 2), (11, 2, 3), (11, 3, 4), (11, 4, 5),
        (11, 5, 6)]


def test_span_explanations(spans12):
    """TestSpanExplanations / CheckHits::checkExplanations contract
    (src/test/search/spans/TestSpanExplanations.cpp, CheckHits.cpp:399+):
    for every matching doc the explanation components multiply to the
    score, and the value is positive."""
    queries = [
        SpanTerm(term="w1"),
        SpanFirst(query=SpanTerm(term="w2"), end=2),
        _near3("w1", "w2", "w3", 2),
        SpanNear(clauses=[SpanTerm(term="u2"), SpanTerm(term="u1")],
                 slop=1, in_order=False),
        SpanOr(clauses=[SpanTerm(term="t1"), SpanTerm(term="w5")]),
        SpanNot(include=SpanTerm(term="u2"), exclude=SpanTerm(term="xx")),
    ]
    import math

    for sim_name in ("bm25", "classic"):
        s = SpanSearcher(spans12.index, similarity=sim_name)
        for q in queries:
            scores = {r["doc_id"]: r["score"] for r in s.score(q).collect()}
            exp = {r["doc_id"]: r for r in s.explain(q).collect()}
            assert set(exp) == set(scores), (sim_name, q)
            for d, r in exp.items():
                assert r["score"] > 0.0
                if sim_name == "bm25":
                    rebuilt = r["idf"] * r["tf_comp"]
                else:
                    rebuilt = r["tf_comp"] * r["idf"] * r["idf"] * r["norm"]
                assert math.isclose(rebuilt, scores[d], rel_tol=1e-9), (
                    sim_name, q, d)


# ---------------------------------------------------------------------------
# TestNearSpansOrdered.cpp 4-doc fixture
# ---------------------------------------------------------------------------

def test_near_spans_ordered_fixture(spark):
    """testSpanNearQuery + testNearSpansNext (TestNearSpansOrdered.cpp:19-116):
    near(w1,w2,w3, slop=1, ordered) matches docs {0,1} with exact spans
    (0,0,3) and (1,0,4)."""
    rows = [
        (0, "w1 w2 w3 w4 w5"),
        (1, "w1 w3 w2 w3 zz"),
        (2, "w1 xx w2 yy w3"),
        (3, "w1 w3 xx w2 yy w3 zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = SpanSearcher(InvertedIndex(df))
    q = _near3("w1", "w2", "w3", 1)
    assert _span_tuples(s, q) == [(0, 0, 3), (1, 0, 4)]
    assert _docs(s.score(q)) == [0, 1]


# ---------------------------------------------------------------------------
# TestForDuplicates.cpp: result streams never repeat a docID
# ---------------------------------------------------------------------------

def test_for_duplicates_raw(spark):
    """testSearchTestForDuplicatesRaw (TestForDuplicates.cpp:18-90):
    1500 docs, body cycling through 10 values; query "test" returns
    exactly MAX_DOCS/10 hits with no duplicated docID."""
    bodies = ["test", "value", "why not", "computer", "clucene",
              "sun", "program", "main", "database", "code"]
    rows = [(i, bodies[i % 10]) for i in range(1500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = Searcher(InvertedIndex(df))
    got = [r["doc_id"] for r in s.score(TermQuery(term="test")).collect()]
    assert len(got) == 150
    assert len(set(got)) == 150


def test_for_duplicates_or(spark):
    """testSearchTestForDuplicates (TestForDuplicates.cpp:92-155): every
    doc matches "high"; the OR form ("high OR medium") must return each
    doc exactly once too."""
    rows = [(j, "high") for j in range(255)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = Searcher(InvertedIndex(df))
    got = [r["doc_id"] for r in s.score(TermQuery(term="high")).collect()]
    assert sorted(got) == list(range(255))
    q = (BooleanQuery()
         .add(TermQuery(term="high"), SHOULD)
         .add(TermQuery(term="medium"), SHOULD))
    got = [r["doc_id"] for r in s.score(q).collect()]
    assert sorted(got) == list(range(255))


# ---------------------------------------------------------------------------
# TestDateFilter.cpp: DateFilter::Before/After over the legacy DateField
# base-36 encoding. "now" is pinned (Date.now is irrelevant to the
# semantics — the reference only uses it as an arbitrary anchor).
# ---------------------------------------------------------------------------

def test_date_field_codec():
    """DateField::timeToString round-trip + ordering (DateField.cpp:23-60)."""
    from clucene_spark.document.tools import (
        DATEFIELD_DATE_MAX, string_to_time, time_to_string)

    assert time_to_string(0) == "000000000"
    assert len(time_to_string(DATEFIELD_DATE_MAX)) == 9
    ts = [0, 1, 35, 36, 1_000_000_000, DATEFIELD_DATE_MAX]
    enc = [time_to_string(t) for t in ts]
    assert enc == sorted(enc)  # lexicographic == chronological
    assert [string_to_time(e) for e in enc] == ts
    with pytest.raises(ValueError):
        time_to_string(-1)
    with pytest.raises(ValueError):
        time_to_string(DATEFIELD_DATE_MAX + 1)


def test_date_filter_before_after(spark):
    """testBefore/testAfter (TestDateFilter.cpp:9-180): a doc dated in the
    past matches Before(now) but not Before(now-999999); dated in the
    future matches After(now) but not After(now+999999)."""
    from clucene_spark.document.tools import time_to_string
    from clucene_spark.search.engine import (
        FilteredQuery, date_field_after, date_field_before)

    now = 1_700_000_000  # pinned anchor (epoch seconds)

    def build(t):
        df = spark.createDataFrame(
            [(0, "today is a very sunny day in new york city",
              time_to_string(t))],
            "doc_id long, text string, datefield string")
        return Searcher(InvertedIndex(df))

    q_miss = TermQuery(term="nomatchforthis")
    q_hit = TermQuery(term="sunny")

    s = build(now - 1000)  # past doc
    assert s.score(q_miss).count() == 0
    assert s.score(q_hit).count() == 1
    keep = date_field_before(now)
    drop = date_field_before(now - 999999)
    assert s.score(FilteredQuery(query=q_miss, predicate=keep)).count() == 0
    assert s.score(FilteredQuery(query=q_miss, predicate=drop)).count() == 0
    assert s.score(FilteredQuery(query=q_hit, predicate=keep)).count() == 1
    assert s.score(FilteredQuery(query=q_hit, predicate=drop)).count() == 0

    s = build(now + 888888)  # future doc
    keep = date_field_after(now)
    drop = date_field_after(now + 999999)
    assert s.score(FilteredQuery(query=q_hit, predicate=keep)).count() == 1
    assert s.score(FilteredQuery(query=q_hit, predicate=drop)).count() == 0


# ---------------------------------------------------------------------------
# TestBoolean.cpp
# ---------------------------------------------------------------------------

def test_boolean_query_equality():
    """testEquality (TestBoolean.cpp:14-52): structurally identical nested
    boolean trees compare equal."""
    def build():
        nested = (BooleanQuery()
                  .add(TermQuery(term="nestedvalue1", field="field"), SHOULD)
                  .add(TermQuery(term="nestedvalue2", field="field"), SHOULD))
        return (BooleanQuery()
                .add(TermQuery(term="value1", field="field"), SHOULD)
                .add(TermQuery(term="value2", field="field"), SHOULD)
                .add(nested, SHOULD))

    assert build() == build()
    other = build().add(TermQuery(term="extra", field="field"), MUST_NOT)
    assert build() != other


def test_boolean_scorer_fixture(spark):
    """testBooleanScorer (TestBoolean.cpp:63-106): MUST(SHOULD(1,2)) with
    MUST_NOT(9) over docs {1,2,3,4} matches exactly 2 docs."""
    rows = [(0, "1"), (1, "2"), (2, "3"), (3, "4")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = Searcher(InvertedIndex(df))
    inner = (BooleanQuery()
             .add(TermQuery(term="1"), SHOULD)
             .add(TermQuery(term="2"), SHOULD))
    q = (BooleanQuery()
         .add(inner, MUST)
         .add(TermQuery(term="9"), MUST_NOT))
    assert s.score(q).count() == 2


# ---------------------------------------------------------------------------
# TestSort.cpp: golden tracer orders over the 11-doc typed-field fixture
# (data[][] at TestSort.cpp:32-45; queries x/y/a/f at :74-96). FieldCache
# parses a missing numeric field as 0 (testEmptyFieldSort expectations
# "IZJ"/"JZI"/"ZJI"); our forward columns ARE the FieldCache, so the load
# step encodes that default. A missing STRING sorts first ascending / last
# descending — Spark's native null ordering, same as the reference.
# ---------------------------------------------------------------------------

SORT_DATA = [
    # tracer, contents, int (0 = reference FieldCache default), float, string
    ("A", "x a",           5,           4.0,       "c"),
    ("B", "y a",           5,           3.4028235e38, "i"),
    ("C", "x a b c",       2147483647,  1.0,       "j"),
    ("D", "y a b c",       -1,          0.0,       "a"),
    ("E", "x a b c d",     5,           2.0,       "h"),
    ("F", "y a b c d",     2,           3.14159,   "g"),
    ("G", "x a b c d",     3,           -1.0,      "f"),
    ("H", "y a b c d",     0,           1.4e-45,   "e"),
    ("I", "x a b c d e f", -2147483648, 1.0,       "d"),
    ("J", "y a b c d e f", 4,           0.5,       "b"),
    ("Z", "f",             0,           0.0,       None),
]


@pytest.fixture(scope="module")
def sort_search(spark):
    rows = [(i, t, c, iv, fv, sv)
            for i, (t, c, iv, fv, sv) in enumerate(SORT_DATA)]
    df = spark.createDataFrame(
        rows,
        "doc_id long, tracer string, text string, int_f long, "
        "float_f double, str_f string",
    )
    return Searcher(InvertedIndex(df).cache())


def _tracers(s, df) -> str:
    ids = [r["doc_id"] for r in df.collect()]
    return "".join(SORT_DATA[i][0] for i in ids)


Q_X = TermQuery(term="x")
Q_Y = TermQuery(term="y")
Q_F = TermQuery(term="f")


def test_sort_built_in(sort_search):
    """testBuiltInSorts (TestSort.cpp:278-288): relevance and doc order."""
    s = sort_search
    assert _tracers(s, s.topk(Q_X, 20)) == "ACEGI"
    assert _tracers(s, s.topk(Q_Y, 20)) == "BDFHJ"
    assert _tracers(s, s.topk_sorted(Q_X, "doc_id", ascending=True, k=20)) == "ACEGI"
    assert _tracers(s, s.topk_sorted(Q_Y, "doc_id", ascending=True, k=20)) == "BDFHJ"


def test_sort_typed(sort_search):
    """testTypedSort/testAutoSort (TestSort.cpp:290-306, 334-348)."""
    s = sort_search
    assert _tracers(s, s.topk_sorted(Q_X, "int_f", ascending=True, k=20)) == "IGAEC"
    assert _tracers(s, s.topk_sorted(Q_Y, "int_f", ascending=True, k=20)) == "DHFJB"
    assert _tracers(s, s.topk_sorted(Q_X, "float_f", ascending=True, k=20)) == "GCIEA"
    assert _tracers(s, s.topk_sorted(Q_Y, "float_f", ascending=True, k=20)) == "DHJFB"
    assert _tracers(s, s.topk_sorted(Q_X, "str_f", ascending=True, k=20)) == "AIGEC"
    assert _tracers(s, s.topk_sorted(Q_Y, "str_f", ascending=True, k=20)) == "DJHFB"


def test_sort_reverse(sort_search):
    """testReverseSort (TestSort.cpp:349-371)."""
    s = sort_search
    assert _tracers(s, s.topk_sorted(Q_X, "doc_id", ascending=False, k=20)) == "IGECA"
    assert _tracers(s, s.topk_sorted(Q_Y, "doc_id", ascending=False, k=20)) == "JHFDB"
    assert _tracers(s, s.topk_sorted(Q_X, "int_f", ascending=False, k=20)) == "CAEGI"
    assert _tracers(s, s.topk_sorted(Q_Y, "int_f", ascending=False, k=20)) == "BJFHD"
    assert _tracers(s, s.topk_sorted(Q_X, "float_f", ascending=False, k=20)) == "AECIG"
    assert _tracers(s, s.topk_sorted(Q_Y, "float_f", ascending=False, k=20)) == "BFJHD"
    assert _tracers(s, s.topk_sorted(Q_X, "str_f", ascending=False, k=20)) == "CEGIA"
    assert _tracers(s, s.topk_sorted(Q_Y, "str_f", ascending=False, k=20)) == "BFHJD"


def test_sort_empty_field(sort_search):
    """testEmptyFieldSort (TestSort.cpp:372-393): doc Z carries no typed
    fields — numeric missing = 0 (FieldCache default), string missing
    sorts first asc / last desc."""
    s = sort_search
    assert _tracers(s, s.topk_sorted(Q_F, "str_f", ascending=True, k=20)) == "ZJI"
    assert _tracers(s, s.topk_sorted(Q_F, "str_f", ascending=False, k=20)) == "IJZ"
    assert _tracers(s, s.topk_sorted(Q_F, "int_f", ascending=True, k=20)) == "IZJ"
    assert _tracers(s, s.topk_sorted(Q_F, "int_f", ascending=False, k=20)) == "JZI"
    assert _tracers(s, s.topk_sorted(Q_F, "float_f", ascending=True, k=20)) == "ZJI"
    assert _tracers(s, s.topk_sorted(Q_F, "float_f", ascending=False, k=20)) == "IJZ"


def test_sort_combos(sort_search):
    """testSortCombos (TestSort.cpp:394-409): multi-key sorts."""
    s = sort_search
    got = s.topk_sorted(Q_X, k=20,
                        sort_fields=[("int_f", True), ("float_f", True)])
    assert _tracers(s, got) == "IGEAC"
    got = s.topk_sorted(Q_X, k=20,
                        sort_fields=[("int_f", False), ("doc_id", False)])
    assert _tracers(s, got) == "CEAGI"
    got = s.topk_sorted(Q_X, k=20,
                        sort_fields=[("float_f", True), ("str_f", True)])
    assert _tracers(s, got) == "GICEA"


def test_sort_empty_index(spark):
    """testEmptyIndex (TestSort.cpp:308-333): every sort flavour over an
    empty index returns cleanly with zero rows."""
    df = spark.createDataFrame(
        [], "doc_id long, tracer string, text string, int_f long, "
            "float_f double, str_f string")
    s = Searcher(InvertedIndex(df))
    assert s.topk(Q_X, 10).count() == 0
    assert s.topk_sorted(Q_X, "int_f", ascending=True, k=10).count() == 0
    assert s.topk_sorted(Q_X, "str_f", ascending=True, k=10).count() == 0


def test_boolean_prefix_query_fixture(spark):
    """testBooleanPrefixQuery (TestBoolean.cpp:109-169): a PrefixQuery
    nested under MUST must match the same docs as the bare prefix (the
    reference asserts equal rewrite clause counts; the observable contract
    is match-set equality)."""
    rows = [(0, "food"), (1, "foodanddrink"),
            (2, "foodanddrinkandgoodtimes"), (3, "food and drink")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = Searcher(InvertedIndex(df))
    bare = {r["doc_id"] for r in s.score(PrefixQuery(prefix="foo")).collect()}
    wrapped = (BooleanQuery().add(PrefixQuery(prefix="foo"), MUST))
    got = {r["doc_id"] for r in s.score(wrapped).collect()}
    assert got == bare == {0, 1, 2, 3}


# ---------------------------------------------------------------------------
# TestSpansAdvanced.cpp / TestSpansAdvanced2.cpp — exact golden SCORES for
# span queries under classic similarity with byte norms, including span
# clauses composed into BooleanQuery (SpanQuery extends Query in the
# reference, so it participates in two-pass weight normalization).
# Corpus: StandardAnalyzer over the TEXT field (TestSpansAdvanced.cpp:39-69;
# TestSpansAdvanced2.cpp:21-28 appends docs A-D). Expected scores are
# transcribed verbatim from the reference test source.
# ---------------------------------------------------------------------------

ADV_DOCS_1 = [
    (1, "I think it should work."),
    (2, "I think it should work."),
    (3, "I think it should work."),
    (4, "I think it should work."),
]
# Advanced2 ids: A=5, B=6, C=7, D=8 (insertion order preserved)
ADV_DOCS_2 = ADV_DOCS_1 + [
    (5, "Should we, could we, would we?"),
    (6, "It should.  Should it?"),
    (7, "It shouldn't."),
    (8, "Should we, should we, should we."),
]


@pytest.fixture(scope="module")
def adv_search(spark):
    df = spark.createDataFrame(ADV_DOCS_1, "doc_id long, text string")
    return Searcher(InvertedIndex(df, analyzer="standard").cache(),
                    similarity="classic", norm_bytes=True)


@pytest.fixture(scope="module")
def adv2_search(spark):
    df = spark.createDataFrame(ADV_DOCS_2, "doc_id long, text string")
    return Searcher(InvertedIndex(df, analyzer="standard").cache(),
                    similarity="classic", norm_bytes=True)


def _hits(searcher, query, k=20):
    return [(r["doc_id"], r["score"])
            for r in searcher.topk(query, k).collect()]


def _assert_scores(got, want_ids, want_scores, tol=1e-5):
    assert [d for d, _ in got] == want_ids
    for (_, s), w in zip(got, want_scores):
        assert abs(s - w) < tol, (got, want_scores)


def test_spans_advanced_boolean_duplicate_clauses(adv_search):
    """testBooleanQueryWithSpanQueries (TestSpansAdvanced.cpp:71-93): the
    SAME SpanTermQuery("work") added twice as MUST; all four docs score
    exactly 0.3884282 = idf(4,4)/2 * byteNorm(dl=4). The /2 decomposes as
    sloppyFreq(1)=1/2 per single-term span (tf=sqrt(1/2)) times
    queryNorm over BOTH duplicate clauses (1/sqrt(2*idf^2))."""
    span = SpanScoreQuery(span=SpanTerm(term="work"))
    q = BooleanQuery().add(span, MUST).add(span, MUST)
    _assert_scores(_hits(adv_search, q), [1, 2, 3, 4], [0.3884282] * 4)


def test_spans_advanced2_single_span_query(adv2_search):
    """testSingleSpanQuery (TestSpansAdvanced2.cpp:44-53): a bare
    SpanTermQuery("should") on the 8-doc corpus; idf(df=7,N=8)=1 so each
    score is sqrt(pfreq) * byteNorm(dl), pfreq = spans/2."""
    q = SpanScoreQuery(span=SpanTerm(term="should"))
    _assert_scores(
        _hits(adv2_search, q),
        [6, 8, 1, 2, 3, 4, 5],
        [0.625, 0.45927936, 0.35355338, 0.35355338, 0.35355338,
         0.35355338, 0.26516503],
    )


def test_spans_advanced2_multiple_different_span_queries(adv2_search):
    """testMultipleDifferentSpanQueries (TestSpansAdvanced2.cpp:58-77),
    post-LUCENE-413 constants: MUST should + MUST we."""
    q = (BooleanQuery()
         .add(SpanScoreQuery(span=SpanTerm(term="should")), MUST)
         .add(SpanScoreQuery(span=SpanTerm(term="we")), MUST))
    _assert_scores(_hits(adv2_search, q), [8, 5], [1.0191123, 0.93163157])


def test_spans_advanced2_boolean_duplicate_clauses(adv2_search):
    """testBooleanQueryWithSpanQueries at N=8 (TestSpansAdvanced2.cpp:82-85):
    same duplicate-MUST query, higher idf — 0.73500174 for docs 1-4."""
    span = SpanScoreQuery(span=SpanTerm(term="work"))
    q = BooleanQuery().add(span, MUST).add(span, MUST)
    _assert_scores(_hits(adv2_search, q), [1, 2, 3, 4], [0.73500174] * 4)


def test_spans_advanced_explained_score_matches(adv_search):
    """assertHits also checks Explanation.getDetail(0) == score
    (TestSpansAdvanced.cpp:127-129): our explain_boolean invariant."""
    span = SpanScoreQuery(span=SpanTerm(term="work"))
    q = BooleanQuery().add(span, MUST).add(span, MUST)
    scores = dict(_hits(adv_search, q))
    for r in adv_search.explain_boolean(q).collect():
        assert abs(r["score"] - scores[r["doc_id"]]) < 1e-9


# ---------------------------------------------------------------------------
# TestConstantScoreRangeQuery.cpp — the 8-doc "small" fixture
# (TestConstantScoreRangeQuery.cpp:36-47; docs 2 and 5 have NO data field)
# ---------------------------------------------------------------------------

CSRQ_DOCS = [
    (0, "A 1 2 3 4 5 6"),
    (1, "Z       4 5 6"),
    (2, ""),
    (3, "B   2   4 5 6"),
    (4, "Y     3   5 6"),
    (5, ""),
    (6, "C     3     6"),
    (7, "X       4 5 6"),
]


@pytest.fixture(scope="module")
def csrq_search(spark):
    df = spark.createDataFrame(CSRQ_DOCS, "doc_id long, text string")
    return Searcher(InvertedIndex(df).cache())


def test_csrq_equal_scores(csrq_search):
    """testEqualScores (TestConstantScoreRangeQuery.cpp:94-120): docs
    matching MORE terms in the range score exactly the SAME constant —
    6 hits, one score."""
    from clucene_spark.search.engine import ConstantScoreRangeQuery

    rows = csrq_search.score(
        ConstantScoreRangeQuery(lower="1", upper="6")).collect()
    assert {r["doc_id"] for r in rows} == {0, 1, 3, 4, 6, 7}
    assert len({r["score"] for r in rows}) == 1


def test_csrq_boost_orders_clauses(csrq_search):
    """testBoost (TestConstantScoreRangeQuery.cpp:125-180): in a
    coord-disabled boolean, per-clause boosts alone decide the order of
    two single-doc csrq clauses."""
    from clucene_spark.search.engine import ConstantScoreRangeQuery

    def bq(b1):
        q = BooleanQuery(coord_disabled=True)
        q.add(ConstantScoreRangeQuery(lower="A", upper="A", boost=b1), SHOULD)
        q.add(ConstantScoreRangeQuery(lower="Z", upper="Z"), SHOULD)
        return q

    low = [(r["doc_id"], r["score"])
           for r in csrq_search.topk(bq(0.1), 2).collect()]
    assert [d for d, _ in low] == [1, 0] and low[0][1] > low[1][1]
    high = [(r["doc_id"], r["score"])
            for r in csrq_search.topk(bq(10.0), 2).collect()]
    assert [d for d, _ in high] == [0, 1] and high[0][1] > high[1][1]


def test_csrq_boolean_order_unaffected(csrq_search):
    """testBooleanOrderUnAffected (TestConstantScoreRangeQuery.cpp:187-218):
    MUST-ing a constant-score range clause onto a scored RangeQuery must
    not change the ranked order of the scored hits."""
    from clucene_spark.search.engine import ConstantScoreRangeQuery, RangeQuery

    rq = RangeQuery(lower="1", upper="4")
    expected = [r["doc_id"] for r in csrq_search.topk(rq, 20).collect()]
    q = (BooleanQuery()
         .add(rq, MUST)
         .add(ConstantScoreRangeQuery(lower="1", upper="6"), MUST))
    got = [r["doc_id"] for r in csrq_search.topk(q, 20).collect()]
    assert got == expected and len(got) > 0


# ---------------------------------------------------------------------------
# TestTermVector.cpp testKnownSetOfDocuments (:123-255) — term-vector /
# postings consistency and the byte-norm ranked order it asserts
# ---------------------------------------------------------------------------

TV_DOCS = [
    (0, "eating chocolate in a computer lab"),                       # 6 terms
    (1, "computer in a computer lab"),                               # 5 terms
    (2, "a chocolate lab grows old"),                                # 5 terms
    (3, "eating chocolate with a chocolate lab in an old chocolate "
        "colored computer lab"),                                     # 13 terms
]

TEST4_FREQS = {"chocolate": 3, "lab": 2, "eating": 1, "computer": 1,
               "with": 1, "a": 1, "colored": 1, "in": 1, "an": 1, "old": 1}


def test_term_vector_known_set(spark, tmp_path):
    """The enum walk invariant (TestTermVector.cpp:166-213): every
    (term, doc, freq) posting agrees with that doc's stored term vector,
    in both directions; doc 3's vector is exactly the hand-built
    10-term frequency map (:128-142, 235-252)."""
    from clucene_spark.index.segments import SegmentStore, build_segments_fused

    docs = spark.createDataFrame(TV_DOCS, "doc_id long, text string")
    d = str(tmp_path / "tv_known")
    build_segments_fused(docs, d, docs_per_segment=2, analyzer="whitespace",
                         term_vectors=True)
    store = SegmentStore(spark, d)

    got = dict((t, f) for t, f, _ in store.term_vector(3))
    assert got == TEST4_FREQS

    # postings <-> vectors bijection via the distributed surfaces
    from pyspark.sql import functions as F2

    tv = store.term_vectors().select("doc_id", "term", F2.col("tf").alias("vf"))
    post = (
        docs.select("doc_id", F2.explode(F2.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term").agg(F2.count("*").alias("pf"))
    )
    joined = tv.join(post, ["doc_id", "term"], "full_outer")
    assert joined.filter(
        F2.col("vf").isNull() | F2.col("pf").isNull()
        | (F2.col("vf") != F2.col("pf"))
    ).count() == 0


def test_term_vector_ranked_order_byte_norms(spark):
    """TermQuery("chocolate") must rank ids [2, 3, 0] (:221-231): doc 2
    wins because byte-norm(5)=0.4375 beats sqrt(3)*byte-norm(13)=0.433 —
    with EXACT norms doc 3 would win (sqrt(3)/sqrt(13)=0.480 > 0.447), so
    this golden pins the lossy codec's effect on ranking."""
    docs = spark.createDataFrame(TV_DOCS, "doc_id long, text string")
    s = Searcher(InvertedIndex(docs), similarity="classic", norm_bytes=True)
    hits = [r["doc_id"] for r in s.topk(TermQuery(term="chocolate"), 5).collect()]
    assert hits == [2, 3, 0]


def test_span_explanations_of_non_matches(spans12):
    """TestSpanExplanationsOfNonMatches / CheckHits::checkNoMatchExplanations
    (src/test/search/spans/TestSpanExplanationsOfNonMatches.cpp:19-22,
    CheckHits.cpp): for every indexed doc OUTSIDE a query's match set the
    explanation must claim nothing — in the DataFrame model explain()
    simply has no row for it, and the complement of the explained set
    against the corpus is exactly the non-matching docs."""
    queries = [
        SpanTerm(term="w1"),
        SpanFirst(query=SpanTerm(term="w2"), end=2),
        _near3("w1", "w2", "w3", 2),
        SpanNear(clauses=[SpanTerm(term="u2"), SpanTerm(term="u1")],
                 slop=1, in_order=False),
        SpanOr(clauses=[SpanTerm(term="t1"), SpanTerm(term="w5")]),
        SpanNot(include=SpanTerm(term="u2"), exclude=SpanTerm(term="xx")),
        # a query matching nothing at all: every doc is a non-match
        SpanNear(clauses=[SpanTerm(term="w1"), SpanTerm(term="zz")],
                 slop=0, in_order=True),
    ]
    all_docs = {
        r["doc_id"] for r in spans12._doc_lens.select("doc_id").collect()
    }
    for sim_name in ("bm25", "classic"):
        s = SpanSearcher(spans12.index, similarity=sim_name)
        for q in queries:
            matched = {r["doc_id"] for r in s.spans(q).select("doc_id")
                       .distinct().collect()}
            explained = {r["doc_id"] for r in s.explain(q).collect()}
            assert explained == matched, (sim_name, q)
            for d in all_docs - matched:
                assert d not in explained  # zero contribution, no row
