"""Parser golden tests — the TestQueryParser pattern (assertQueryEquals:
parse -> canonical str must equal expected; reference
src/test/queryParser/TestQueryParser.cpp:119+). Canonical form is our
Query.__str__ (single-field engine: field prefixes accepted, not printed).
"""

import pytest

from clucene_spark.queryparser.parser import QueryParserError, parse
from clucene_spark.search.engine import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    TermQuery,
    WildcardQuery,
)

GOLDENS = [
    # (query string, expected canonical form)
    ("spark", "spark"),
    ("spark join", "spark join"),
    ("spark AND join", "+spark +join"),
    ("spark && join", "+spark +join"),
    ("spark OR join", "spark join"),
    ("spark || join", "spark join"),
    ("+spark -join", "+spark -join"),
    ("spark AND NOT join", "+spark -join"),
    ("spark && !join", "+spark -join"),
    ("NOT join", "-join"),
    ("z OR (x AND y)", "z (+x +y)"),
    ("(x AND y) OR z", "(+x +y) z"),
    ('"data stream"', '"data stream"'),
    ('"data stream"~2', '"data stream"~2'),
    ('"single"', "single"),  # 1-token phrase collapses to term
    ("spar*", "spar*"),
    ("sp?rk", "sp?rk"),
    ("spark~", "spark~0.5"),
    ("spark~0.7", "spark~0.7"),
    ("[aaa TO mmm]", "[aaa TO mmm]"),
    ("{aaa TO mmm}", "{aaa TO mmm}"),
    ("[* TO mmm]", "[* TO mmm]"),
    ("spark^2", "spark^2"),
    ('"data stream"^3 other', '"data stream"^3 other'),
    ("the", None),  # stopword analyzes to nothing
    ("the AND of", None),
    ("spark the join", "spark join"),  # stopword clause dropped
    ("x AND the AND y", "+x +y"),  # stopword clause dropped
    ("*:*", "*:*"),
    ("ab-cd", '"ab cd"'),  # analyzer splits -> phrase (Lucene behavior)
    ("U.S.A.", "usa"),
    ("AT&T", "at&t"),
    ("text:spark", "spark"),
    ("text:(a* b*)", "a* b*"),
    ('text:"data stream"', '"data stream"'),
    ("+spark -vector window", "+spark -vector window"),
]


@pytest.mark.parametrize("qs,want", GOLDENS, ids=[g[0][:30] for g in GOLDENS])
def test_parser_goldens(qs, want):
    q = parse(qs)
    if want is None:
        assert q is None
    else:
        assert str(q) == want


def test_ast_types():
    assert isinstance(parse("spark"), TermQuery)
    assert isinstance(parse("spark join"), BooleanQuery)
    assert isinstance(parse('"a b c d"'), PhraseQuery)
    assert isinstance(parse("sp*"), PrefixQuery)
    assert isinstance(parse("s?x"), WildcardQuery)
    assert isinstance(parse("spark~"), FuzzyQuery)
    assert isinstance(parse("[a TO b]"), RangeQuery)
    assert isinstance(parse("*:*"), MatchAllQuery)


def test_boost_propagation():
    q = parse("spark^2")
    assert q.boost == 2.0
    q = parse("(spark join)^3")
    assert q.boost == 3.0
    q = parse('"a phrase query"^1.5')
    assert q.boost == 1.5


def test_negative_number_not_negation():
    q = parse("-1.5")
    assert isinstance(q, TermQuery) and q.term == "-1.5"


def test_wildcard_lowercased():
    assert parse("SPAr*").prefix == "spar"
    assert parse("S?ARK").pattern == "s?ark"
    assert parse("SPARK~").term == "spark"
    r = parse("[AAA TO MMM]")
    assert r.lower == "aaa" and r.upper == "mmm"


def test_errors():
    with pytest.raises(QueryParserError):
        parse('"unterminated')
    with pytest.raises(QueryParserError):
        parse("[a TO")
    with pytest.raises(QueryParserError):
        parse("(a b")


def test_parse_and_execute(index):
    """Parsed queries execute identically to hand-built ASTs."""
    from clucene_spark.search.engine import MUST, Searcher

    s = Searcher(index)
    got = {r["doc_id"] for r in s.topk(parse("spark AND join"), 10).collect()}
    manual = (
        BooleanQuery()
        .add(TermQuery(term="spark"), MUST)
        .add(TermQuery(term="join"), MUST)
    )
    want = {r["doc_id"] for r in s.topk(manual, 10).collect()}
    assert got == want and len(got) == 10


def test_parser_fielded_routing_and_unknown_fields(spark):
    """indexed fields -> fielded analyzed queries; keyword fields ->
    KeywordQuery; unknown fields -> matches nothing (never an
    AnalysisException at plan time)."""
    from clucene_spark.index.build import InvertedIndex
    from clucene_spark.queryparser.parser import QueryParser
    from clucene_spark.search.engine import (
        KeywordQuery,
        PrefixQuery,
        Searcher,
        TermQuery,
    )

    p = QueryParser(default_field="text", indexed_fields={"title", "text"},
                    keyword_fields={"source"})
    q = p.parse("title:Spark")
    assert isinstance(q, TermQuery) and q.field == "title" and q.term == "spark"
    q = p.parse("title:spar*")
    assert isinstance(q, PrefixQuery) and q.field == "title"
    q = p.parse("source:src3")
    assert isinstance(q, KeywordQuery) and q.field == "source"
    # unknown field: parses, and MATCHES NOTHING against a real index
    q = p.parse("bogus:foo")
    docs = spark.createDataFrame(
        [(0, "t", "foo bar")], "doc_id long, title string, text string"
    )
    idx = InvertedIndex(
        docs, fields=[("text", "text", "whitespace"), ("title", "title", "whitespace")]
    )
    s = Searcher(idx)
    assert s.topk(q, 10).count() == 0
    # ...including under MUST in a boolean
    q2 = p.parse("foo AND bogus:bar")
    assert s.topk(q2, 10).count() == 0


def test_multifield_query_parser(spark):
    """MultiFieldQueryParser: unfielded terms expand to OR over all fields
    with per-field boosts; explicit fields still win."""
    from clucene_spark.index.build import InvertedIndex
    from clucene_spark.queryparser.parser import MultiFieldQueryParser
    from clucene_spark.search.engine import Searcher

    rows = [
        (0, "spark guide", "engine details"),
        (1, "sql tuning", "spark joins"),
        (2, "unrelated", "nothing"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    idx = InvertedIndex(
        docs, fields=[("text", "text", "whitespace"), ("title", "title", "whitespace")]
    )
    s = Searcher(idx, similarity="bm25")
    mp = MultiFieldQueryParser(["title", "text"], boosts={"title": 2.0})
    q = mp.parse("spark")
    hits = {r["doc_id"]: r["score"] for r in s.topk(q, 10).collect()}
    assert set(hits) == {0, 1}
    assert hits[0] > hits[1]  # title match boosted 2x
    q2 = mp.parse("text:joins")
    assert {r["doc_id"] for r in s.topk(q2, 10).collect()} == {1}


# Additional TestQueryParser.cpp parity cases (reference
# src/test/queryParser/TestQueryParser.cpp:238-420; boosts print as {:g},
# so the reference's "2.0" is our "2")
PARITY_GOLDENS = [
    ("(spark)^2", "spark^2"),
    ("(germ term)^2", "(germ term)^2"),
    ('"germ term"^2', '"germ term"^2'),
    ("spark^2~", "spark~0.5^2"),       # suffixes in either order
    ("spark~^2", "spark~0.5^2"),
    ("term*germ", "term*germ"),
    ("term*germ^3", "term*germ^3"),
    ('" "~2 germ', "germ"),            # empty phrase clause vanishes
    ("Te?m", "te?m"),                  # wildcards lowercased
    ("TERM*", "term*"),
    ("Term~", "term~0.5"),
    ("[A TO C]", "[a TO c]"),
    ("z OR (x AND y)", "z (+x +y)"),  # dup of core golden, kept for the block
    ("((x OR y) AND NOT z) OR w", "(+(x y) -z) w"),
    ('+(apple "steve jobs") -(foo bar baz)',
     '+(apple "steve jobs") -(foo bar baz)'),
]


@pytest.mark.parametrize("qs,want", PARITY_GOLDENS,
                         ids=[g[0][:30] for g in PARITY_GOLDENS])
def test_parser_reference_parity(qs, want):
    assert str(parse(qs)) == want


# Escape / unicode-escape / TO-less-range parity (reference
# src/test/queryParser/TestQueryParser.cpp testEscaped:634-693 and
# testRange 495-508; whitespace-lowercase analyzer like the reference's,
# because escapes must reach the analyzer as literal chars)
_WS = lambda t: [w.lower() for w in t.split()]  # noqa: E731

ESCAPE_GOLDENS = [
    (r"\*", "*"),                   # escaped star is a literal TERM
    ("\\\\", "\\"),                 # escaped backslash
    (r"a\-b", "a-b"),
    (r"a\+b", "a+b"),
    (r"a\:b", "a:b"),               # escaped colon never splits a field
    (r"a\\b", "a\\b"),
    (r"a\u0062c", "abc"),           # \uXXXX unicode escapes
    (r"XY\u005a", "xyz"),
    (r"XY\u005A", "xyz"),
    (r"te\?m", "te?m"),             # escaped ? -> literal term, not wildcard
    (r"term\~", "term~"),
    (r"a\-b\:c", "a-b:c"),
    (r"c\:\\temp\\\~foo.txt", "c:\\temp\\~foo.txt"),
    (r"a \"b c\" d", 'a "b c" d'),
    ('"a \\"b c\\" d"', '"a "b c" d"'),
    (r'"a \+b c d"', '"a +b c d"'),
    ("[ a z ]", "[a TO z]"),        # TO is optional in range syntax
    ("{ a z }", "{a TO z}"),
    ("{ a z }^2.0", "{a TO z}^2"),
    ("[050 -070]", "[050 TO -070]"),
    (r"[ a\- TO a\+ ]", "[a- TO a+]"),
    (r"[ a\: TO a\~ ]", "[a: TO a~]"),
    (r"[ a\\ TO a\* ]", "[a\\ TO a*]"),
]


@pytest.mark.parametrize("qs,want", ESCAPE_GOLDENS,
                         ids=[g[0][:30] for g in ESCAPE_GOLDENS])
def test_parser_escape_parity(qs, want):
    assert str(parse(qs, analyzer=_WS)) == want


def test_escaped_wildcards_are_literal_terms():
    assert isinstance(parse(r"te\?m", analyzer=_WS), TermQuery)
    assert isinstance(parse(r"te\*m", analyzer=_WS), TermQuery)
    assert isinstance(parse(r"\*", analyzer=_WS), TermQuery)  # not MatchAll
    assert isinstance(parse("te?m"), WildcardQuery)
    assert isinstance(parse("te*m"), WildcardQuery)


def test_escaped_colon_in_field_name():
    from clucene_spark.queryparser.parser import QueryParser

    p = QueryParser(default_field="text", indexed_fields={"a:b"},
                    analyzer=_WS)
    q = p.parse(r"a\:b:c")
    assert isinstance(q, TermQuery) and q.field == "a:b" and q.term == "c"


def test_escape_static_roundtrip():
    # reference assertEscapedQueryEquals (TestQueryParser.cpp:701-708)
    from clucene_spark.queryparser.parser import QueryParser

    assert QueryParser.escape("a-b:c") == r"a\-b\:c"
    assert QueryParser.escape("a+b:c") == r"a\+b\:c"
    assert QueryParser.escape("a:b:c") == r"a\:b\:c"
    assert QueryParser.escape("a\\b:c") == "a\\\\b\\:c"
    # escape -> parse yields the original text as a literal term
    for raw in ["a-b:c", "a+*?b", "x~y^z", '["\\]']:
        q = parse(QueryParser.escape(raw), analyzer=lambda t: t.split())
        assert isinstance(q, TermQuery) and q.term == raw


def test_leading_wildcard_guard():
    # getWildcardQuery rejects a leading * / ? unless
    # setAllowLeadingWildcard(true) (TestQueryParser.cpp:425-426)
    with pytest.raises(QueryParserError):
        parse("*term")
    with pytest.raises(QueryParserError):
        parse("?term")
    q = parse("*term", allow_leading_wildcard=True)
    assert isinstance(q, WildcardQuery) and q.pattern == "*term"
    assert parse("*:*").__class__ is MatchAllQuery  # still MatchAll


def test_lowercase_expanded_terms_off():
    # setLowercaseExpandedTerms(false): Term* keeps case
    # (assertWildcardQueryEquals lowercase=false block)
    assert parse("Term*", lowercase_expanded_terms=False).prefix == "Term"
    assert parse("Te?m*gerM", lowercase_expanded_terms=False).pattern == "Te?m*gerM"
    assert parse("Term~", lowercase_expanded_terms=False).term == "Term"
    r = parse("[A TO C]", lowercase_expanded_terms=False)
    assert r.lower == "A" and r.upper == "C"


# Default-operator-AND parity (reference assertQueryEqualsDOA,
# TestQueryParser.cpp:764-777) and stopword-group cases (444-467)
DOA_GOLDENS = [
    ("term term term", "+term +term +term"),
    ("term +term term", "+term +term +term"),
    ("term term +term", "+term +term +term"),
    ("term +term +term", "+term +term +term"),
    ("-term term term", "-term +term +term"),
    ("+weltbank\t+worlbank", "+weltbank +worlbank"),
    ("weltbank \t+worlbank", "+weltbank +worlbank"),
    ("weltbank \t +worlbank", "+weltbank +worlbank"),
]


@pytest.mark.parametrize("qs,want", DOA_GOLDENS,
                         ids=[g[0][:30] for g in DOA_GOLDENS])
def test_parser_default_operator_and(qs, want):
    assert str(parse(qs, analyzer=_WS, default_operator="AND")) == want


STOPGROUP_GOLDENS = [
    ("term +(the) term", "term term"),
    ("term -(the) term", "term term"),
    ("x AND (the) AND y", "+x +y"),
    ("(the)^3", None),
    ("((the))^3", None),
    ("(the)", None),
    ("((the))", None),
]


@pytest.mark.parametrize("qs,want", STOPGROUP_GOLDENS,
                         ids=[g[0][:30] for g in STOPGROUP_GOLDENS])
def test_parser_stopword_groups(qs, want):
    q = parse(qs)
    assert (None if q is None else str(q)) == want


def test_range_parses_to_constant_score_by_default():
    # reference default useOldRangeQuery=false (QueryParser.cpp:97,465-481):
    # ranges parse to ConstantScoreRangeQuery; the old scored form is the
    # opt-in
    from clucene_spark.search.engine import ConstantScoreRangeQuery

    q = parse("[aaa TO mmm]")
    assert type(q) is ConstantScoreRangeQuery
    assert q.lower == "aaa" and q.upper == "mmm" and q.inclusive
    assert str(q) == "[aaa TO mmm]"
    q = parse("[aaa TO mmm]", use_old_range_query=True)
    assert type(q) is RangeQuery


def test_wildcard_rewrite_types():
    # assertWildcardQueryEquals (TestQueryParser.cpp:357-426): trailing-*
    # only -> PrefixQuery; interior wildcards -> WildcardQuery; suffixes
    # compose with boosts
    assert isinstance(parse("term*"), PrefixQuery)
    assert isinstance(parse("term*germ"), WildcardQuery)
    q = parse("term*^2")
    assert isinstance(q, PrefixQuery) and q.boost == 2.0
    q = parse("term*germ^3")
    assert isinstance(q, WildcardQuery) and q.boost == 3.0
    q = parse("sp?rk*")
    assert isinstance(q, WildcardQuery) and q.pattern == "sp?rk*"


def test_truncated_unicode_escape_is_parse_error():
    with pytest.raises(QueryParserError):
        parse(r"ab\u00")
    with pytest.raises(QueryParserError):
        parse(r"ab\u00zz")


def test_fuzzy_min_sim_ge_one_rejected():
    # reference: assertParseException("term~1.1") — FuzzyTermEnum requires
    # minSim < 1
    with pytest.raises(QueryParserError):
        parse("term~1.1")
    with pytest.raises(QueryParserError):
        parse("term~1.0")


# ---------------------------------------------------------------------------
# TestMultiFieldQueryParser.cpp port (reference
# src/test/queryParser/TestMultiFieldQueryParser.cpp:107-171 testMFQPSimple,
# :95-105 tesStopwordsParsing). Boost format delta: the reference prints
# Java-style "^2.0", our _boosted prints "{:g}" -> "^2" — _j normalizes the
# literal reference expectations to our format so the strings below stay
# copy-checkable against the .cpp.
# ---------------------------------------------------------------------------

import re as _re


def _j(s: str) -> str:
    return _re.sub(r"\^(\d+)\.0\b", r"^\1", s)


def _mfqp(**kw):
    from clucene_spark.queryparser.parser import MultiFieldQueryParser

    return MultiFieldQueryParser(["b", "t"], **kw)


MFQP_SIMPLE_GOLDENS = [
    ("one", "b:one t:one"),
    ("one two", "(b:one t:one) (b:two t:two)"),
    ("+one +two", "+(b:one t:one) +(b:two t:two)"),
    ("+one -two -three", "+(b:one t:one) -(b:two t:two) -(b:three t:three)"),
    ("one^2 two", "((b:one t:one)^2.0) (b:two t:two)"),
    ("one~ two", "(b:one~0.5 t:one~0.5) (b:two t:two)"),
    ("one~0.8 two^2", "(b:one~0.8 t:one~0.8) ((b:two t:two)^2.0)"),
    ("one* two*", "(b:one* t:one*) (b:two* t:two*)"),
    ("[a TO c] two", "(b:[a TO c] t:[a TO c]) (b:two t:two)"),
    ("w?ldcard", "b:w?ldcard t:w?ldcard"),
    ('"foo bar"', 'b:"foo bar" t:"foo bar"'),
    ('"aa bb cc" "dd ee"', '(b:"aa bb cc" t:"aa bb cc") (b:"dd ee" t:"dd ee")'),
    ('"foo bar"~4', 'b:"foo bar"~4 t:"foo bar"~4'),
]


@pytest.mark.parametrize("qtxt,expected", MFQP_SIMPLE_GOLDENS)
def test_mfqp_simple_goldens(qtxt, expected):
    assert str(_mfqp().parse(qtxt)) == _j(expected)


def test_mfqp_explicit_field_not_touched():
    # reference: mfqp.parse("one f:two") -> "(b:one t:one) f:two". Field f
    # is not a member field; the reference emits a TermQuery on the absent
    # field (zero postings), we emit the documented match-nothing form —
    # same hit set, different print, so assert structure not string.
    from clucene_spark.search.engine import BooleanQuery, ConstantScoreQuery

    q = _mfqp().parse("one f:two")
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2
    assert str(q.clauses[0].query) == "b:one t:one"
    assert isinstance(q.clauses[1].query, ConstantScoreQuery)


MFQP_AND_GOLDENS = [
    ("one two", "+(b:one t:one) +(b:two t:two)"),
    ('"aa bb cc" "dd ee"',
     '+(b:"aa bb cc" t:"aa bb cc") +(b:"dd ee" t:"dd ee")'),
]


@pytest.mark.parametrize("qtxt,expected", MFQP_AND_GOLDENS)
def test_mfqp_and_mode_goldens(qtxt, expected):
    # mfqp.setDefaultOperator(QueryParser::AND_OPERATOR)
    assert str(_mfqp(default_operator="AND").parse(qtxt)) == _j(expected)


def _stop_analyzer(text: str) -> list[str]:
    # MQPTestFilter over LowerCaseTokenizer: discards the token 'stop'
    # (TestMultiFieldQueryParser.cpp:10-48; the phrase1/phrase2 expansion
    # half of the filter is exercised only by tests not ported here)
    return [t for t in _re.findall(r"[a-z]+", text.lower()) if t != "stop"]


MFQP_STOP_GOLDENS = [
    ("one", "b:one t:one"),
    ("one stop", "b:one t:one"),
    ("one (stop)", "b:one t:one"),
    ("one ((stop))", "b:one t:one"),
    ("stop", None),
    ("(stop)", None),
    ("((stop))", None),
]


@pytest.mark.parametrize("qtxt,expected", MFQP_STOP_GOLDENS)
def test_mfqp_stopwords_parsing(qtxt, expected):
    # tesStopwordsParsing: instance form AND the static flagged form
    # (parse(qtxt, fields, occur=SHOULD…)) must agree (the reference's
    # assertStopQueryEquals runs both)
    from clucene_spark.queryparser.parser import MultiFieldQueryParser

    q = _mfqp(analyzer=_stop_analyzer).parse(qtxt)
    if expected is None:
        assert q is None  # reference toString "" — empty BooleanQuery
    else:
        assert str(q) == expected
    q2 = MultiFieldQueryParser.parse_flags(
        qtxt, ["b", "t"], ["SHOULD", "SHOULD"], analyzer=_stop_analyzer
    )
    if expected is None:
        assert q2 is None
    else:
        assert str(q2) == expected


def test_r5_parser_edge_fixes():
    """Round-5 review fixes: explicit ~0 similarity, calendar-invalid
    date bounds, fielded '*', empty-string range bound, quoted ']' in a
    range body, keyword fields in the static multi-field form."""
    from clucene_spark.queryparser.parser import MultiFieldQueryParser, QueryParser
    from clucene_spark.search.engine import KeywordQuery, RangeQuery

    # explicit '~0' is minSim 0.0, not the 0.5 default
    q = parse("spark~0")
    assert isinstance(q, FuzzyQuery) and q.min_similarity == 0.0
    assert parse("spark~").min_similarity == 0.5

    # calendar-invalid date bounds fall back to a plain term range
    p = QueryParser("text", indexed_fields={"date"},
                    date_fields={"date": "day"})
    q = p.parse("date:[2020-13-01 TO 2020-14-01]")
    assert q is not None  # no raw ValueError
    # a valid date still encodes
    assert p.parse("date:[2020-01-01 TO 2020-02-01]") is not None

    # '*' is MatchAll ONLY as '*:*' (QueryParser.cpp:505-509); bare and
    # fielded forms hit the leading-wildcard error like the reference
    assert isinstance(parse("*:*"), MatchAllQuery)
    with pytest.raises(QueryParserError):
        parse("*")
    with pytest.raises(QueryParserError):
        QueryParser("text", indexed_fields={"title"}).parse("title:(*)")

    # explicit empty-string bound is a bound, not '*'
    q = parse('["" TO b]', use_old_range_query=True)
    assert isinstance(q, RangeQuery) and q.lower == "" and q.upper == "b"

    # quoted ']' inside a range body parses (RANGEIN_QUOTED)
    q = parse('["a]b" TO c]', use_old_range_query=True)
    assert q.lower == "a]b" and q.upper == "c"

    # static multi-field form routes keyword fields to KeywordQuery like
    # the instance form
    q = MultiFieldQueryParser.parse_flags(
        "tag:foo", ["title", "tag"], ["SHOULD", "SHOULD"],
        keyword_fields={"tag"},
    )
    flat = [c.query for c in q.clauses] if isinstance(q, BooleanQuery) else [q]
    inner = []
    for sub in flat:
        if isinstance(sub, BooleanQuery):
            inner.extend(c.query for c in sub.clauses)
        else:
            inner.append(sub)
    assert any(isinstance(s, KeywordQuery) for s in flat + inner), (flat, inner)


def test_parse_without_spark_session_builds_unknown_field_query():
    """_match_nothing must not require a live SparkContext at parse time
    (the predicate is the SQL string 'false', resolved by df.filter at
    execution)."""
    from clucene_spark.queryparser.parser import QueryParser
    from clucene_spark.search.engine import ConstantScoreQuery

    q = QueryParser("text").parse("nosuchfield:x")
    assert isinstance(q, ConstantScoreQuery)
    assert q.predicate == "false"
