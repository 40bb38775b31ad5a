"""Token-golden tests for the StandardAnalyzer chain.

Analogue of the reference's TestAnalysis/TestAnalyzers token-sequence
assertions (src/test/analysis/TestAnalysis.cpp, TestAnalyzers.cpp): each
case pins (term, type) and offsets. The goldens encode the DFA's quirks:
trailing-dot shave (StandardTokenizer.cpp:244-249,362-365), acronym even/odd
check (:374-396), double dot/dash break (:328-341), the constant-true
conditional at :408-409 (alpha hosts carry <UNKNOWN>), numeric-host
recursion (:170-257).
"""

import pytest

from clucene_spark.analysis.standard import (
    ENGLISH_STOP_WORDS,
    MAX_WORD_LEN,
    standard_analyze,
    tokenize_only,
)

GOLDENS = [
    # (input, [(term, type), ...])
    ("U.S.A.", [("U.S.A.", "<ACRONYM>")]),
    ("windowsupdate.microsoft.com", [("windowsupdate.microsoft.com", "<UNKNOWN>")]),
    ("192.168.1.3", [("192.168.1.3", "<HOST>")]),
    ("O'Reilly's", [("O'Reilly", "<APOSTROPHE>"), ("s", "<ALPHANUM>")]),
    ("AT&T", [("AT&T", "<COMPANY>")]),
    ("bob@example.com", [("bob@example.com", "<EMAIL>")]),
    ("x@y", [("x@y", "<COMPANY>")]),  # no dots/digits -> COMPANY (ReadAt rule)
    ("-1.5", [("-1.5", "<NUM>")]),
    ("3.14159", [("3.14159", "<NUM>")]),
    (".5", [(".5", "<NUM>")]),
    ("5.", [("5", "<NUM>")]),
    ("x_y_z", [("x_y_z", "<ALPHANUM>")]),
    ("abc.--def", [("abc", "<ALPHANUM>"), ("def", "<ALPHANUM>")]),
    ("ab-cd", [("ab", "<ALPHANUM>"), ("cd", "<ALPHANUM>")]),
    ("don't", [("don't", "<APOSTROPHE>")]),
    ("end.", [("end", "<ALPHANUM>")]),
    ("a.b.c", [("a.b.c", "<UNKNOWN>")]),
    ("1.2.3.4.5", [("1.2.3.4.5", "<HOST>")]),
    ("你好世界", [("你好世界", "<CJK>")]),
    ("abc你好", [("abc", "<ALPHANUM>"), ("好", "<CJK>")]),  # breaking char dropped
    (
        "Visit windowsupdate.microsoft.com--update today!",
        [
            ("Visit", "<ALPHANUM>"),
            ("windowsupdate.microsoft.com", "<UNKNOWN>"),
            ("update", "<ALPHANUM>"),
            ("today", "<ALPHANUM>"),
        ],
    ),
    (
        "In the U.S.A.--yes",
        [
            ("In", "<ALPHANUM>"),
            ("the", "<ALPHANUM>"),
            ("U.S.A.", "<ACRONYM>"),
            ("yes", "<ALPHANUM>"),
        ],
    ),
    ("", []),
    ("   ", []),
    ("...", []),
    ("- - -", []),
    # digit-first "5a": ReadNumber takes "5" and unreads 'a' — but at
    # end-of-stream the unread is guarded by !EOS (StandardTokenizer.cpp:212),
    # so a trailing 'a' is swallowed. Reference quirk, faithfully replicated.
    ("a5 5a", [("a5", "<ALPHANUM>"), ("5", "<NUM>")]),
    ("a5 5a x", [("a5", "<ALPHANUM>"), ("5", "<NUM>"), ("a", "<ALPHANUM>"), ("x", "<ALPHANUM>")]),
    ("so's", [("so's", "<APOSTROPHE>")]),
    ("it'", [("it", "<ALPHANUM>")]),  # bare trailing apostrophe shaved
]


@pytest.mark.parametrize("text,expected", GOLDENS, ids=[g[0][:25] or "empty" for g in GOLDENS])
def test_tokenizer_goldens(text, expected):
    got = [(t.term, t.type) for t in tokenize_only(text)]
    assert got == expected


def test_offsets():
    toks = tokenize_only("The U.S.A. word")
    assert [(t.term, t.start, t.end) for t in toks] == [
        ("The", 0, 3),
        ("U.S.A.", 4, 10),
        ("word", 11, 15),
    ]


def test_max_word_len_truncation():
    # 255-char cap (CLConfig.h:169): a 300-char word is truncated
    w = "a" * 300
    toks = tokenize_only(w)
    assert len(toks[0].term) == MAX_WORD_LEN


def test_standard_analyze_chain():
    # filter chain: acronym dots stripped, 's stripped, lowercased, stopwords out
    # NB: "AT&T's" -> COMPANY "at&t" + bare "s" (ReadCompany stops at the
    # apostrophe; the 's is not an APOSTROPHE token so StandardFilter keeps it)
    got = standard_analyze("The U.S.A. isn't AT&T's domain")
    assert got == [
        ("usa", 0, 4, 10, "<ACRONYM>"),
        ("isn't", 1, 11, 16, "<APOSTROPHE>"),
        ("at&t", 2, 17, 21, "<COMPANY>"),
        ("s", 3, 22, 23, "<ALPHANUM>"),
        ("domain", 4, 24, 30, "<ALPHANUM>"),
    ]


def test_stopwords_list():
    # the 33-word list at Analyzers.cpp:293-300, verbatim
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert standard_analyze("the of and to") == []


def test_positions_dense_over_survivors():
    got = standard_analyze("alpha the beta of gamma")
    assert [(t[0], t[1]) for t in got] == [("alpha", 0), ("beta", 1), ("gamma", 2)]


# ---------------------------------------------------------------------------
# fast-path equivalence (standard_analyze split-on-space vs the full DFA)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from clucene_spark.analysis.standard import (
    ENGLISH_STOP_WORDS,
    StandardTokenizer,
    lower_case_filter,
    standard_analyze,
    standard_filter,
)


def _dfa_analyze(text):
    out = []
    pos = 0
    for tok in StandardTokenizer(text).tokens():
        tok = lower_case_filter(standard_filter(tok))
        if tok.term in ENGLISH_STOP_WORDS:
            continue
        out.append((tok.term, pos, tok.start, tok.end, tok.type))
        pos += 1
    return out


@given(st.text(alphabet="abcz019 ", max_size=80))
@settings(max_examples=300, deadline=None)
def test_fast_path_equivalent_to_dfa(text):
    assert standard_analyze(text) == _dfa_analyze(text)


@given(st.text(alphabet="aZ3.' @&-_一 ", max_size=60))
@settings(max_examples=200, deadline=None)
def test_mixed_text_same_with_or_without_fast_path(text):
    # messy text never takes the fast path; result must equal the DFA
    assert standard_analyze(text) == _dfa_analyze(text)


def test_fast_path_examples():
    assert standard_analyze("3x y3 the") == _dfa_analyze("3x y3 the")
    assert standard_analyze("a" * 300) == _dfa_analyze("a" * 300)
    assert standard_analyze("33 x3 abc") == [
        ("33", 0, 0, 2, "<NUM>"),
        ("x3", 1, 3, 5, "<ALPHANUM>"),
        ("abc", 2, 6, 9, "<ALPHANUM>"),
    ]


# ---------------------------------------------------------------------------
# analyzer family (Analyzers.cpp) — token goldens per TestAnalyzers.cpp
# ---------------------------------------------------------------------------

from clucene_spark.analysis.analyzers import (
    PerFieldAnalyzer,
    accent_filter,
    iso_latin1_accent_fold,
    keyword_analyze,
    length_filter,
    simple_analyze,
    stop_analyze,
    whitespace_analyze,
)


def test_whitespace_analyzer_golden():
    # TestAnalyzers.cpp whitespace cases: splits, case preserved
    got = [(t, p, s, e) for t, p, s, e in whitespace_analyze("FOO bar  Baz-2 ")]
    assert got == [("FOO", 0, 0, 3), ("bar", 1, 4, 7), ("Baz-2", 2, 9, 14)]


def test_simple_analyzer_golden():
    # letter runs only, lowercased: "foo2bar" -> foo, bar
    assert [t for t, *_ in simple_analyze("Foo2Bar baz's")] == ["foo", "bar", "baz", "s"]
    assert [t for t, *_ in simple_analyze("U.S.A.")] == ["u", "s", "a"]


def test_stop_analyzer_drops_stopwords_dense_positions():
    got = stop_analyze("the quick and the dead")
    assert [(t, p) for t, p, *_ in got] == [("quick", 0), ("dead", 1)]


def test_keyword_analyzer_single_token():
    assert keyword_analyze("Hello World!") == [("Hello World!", 0, 0, 12)]
    assert keyword_analyze("") == []


def test_length_filter():
    toks = whitespace_analyze("a bb ccc dddd")
    kept = [t for t, *_ in length_filter(toks, 2, 3)]
    assert kept == ["bb", "ccc"]


def test_iso_latin1_accent_fold_golden():
    # reference switch cases (Analyzers.cpp:371-507)
    assert iso_latin1_accent_fold("été") == "ete"          # été
    assert iso_latin1_accent_fold("Æon") == "AEon"              # Æon
    assert iso_latin1_accent_fold("straße") == "strasse"        # straße
    assert iso_latin1_accent_fold("Œuvre") == "OEuvre"          # Œuvre
    assert iso_latin1_accent_fold("Ðþ") == "Dth"           # Ðþ
    assert iso_latin1_accent_fold("naïve") == "naive"
    assert iso_latin1_accent_fold("plain") == "plain"
    got = accent_filter(whitespace_analyze("déjà vu"))
    assert [t for t, *_ in got] == ["deja", "vu"]


def test_per_field_analyzer_dispatch():
    pfa = PerFieldAnalyzer(default="standard", overrides={"url": "keyword", "tags": "simple"})
    assert pfa.for_field("url")("A B") == [("A B", 0, 0, 3)]
    assert [t for t, *_ in pfa.for_field("tags")("Big-Data")] == ["big", "data"]
    assert [t for t, *_ in pfa.for_field("text")("The Quick FOX")] == ["quick", "fox"]


# ---------------------------------------------------------------------------
# Porter stemmer (contrib PorterStemmer.cpp) — classic published pairs
# ---------------------------------------------------------------------------

def test_porter_stemmer_classic_pairs():
    from clucene_spark.analysis.porter import porter_stem

    pairs = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun", "activate": "activ",
        "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
        "rate": "rate", "controlling": "control", "rolling": "roll",
    }
    for word, want in pairs.items():
        assert porter_stem(word) == want, (word, porter_stem(word), want)


def test_porter_analyze_chain():
    from clucene_spark.analysis.porter import porter_analyze

    got = [t for t, *_ in porter_analyze("The Motoring caresses were effective")]
    assert got == ["motor", "caress", "were", "effect"]


def test_cjk_bigram_analyzer():
    from clucene_spark.analysis.analyzers import cjk_bigram_analyze

    got = [(t, p) for t, p, *_ in cjk_bigram_analyze("Hello 你好世界 OK 中 x")]
    assert got == [
        ("hello", 0),
        ("你好", 1), ("好世", 2), ("世界", 3),
        ("ok", 4), ("中", 5), ("x", 6),
    ]
    # offsets cover the source slice
    toks = cjk_bigram_analyze("你好")
    assert toks == [("你好", 0, 0, 2)]


@given(st.text(alphabet="aZ3.' @&-_一z09 \t", max_size=100))
@settings(max_examples=400, deadline=None)
def test_hybrid_chunk_path_equivalent_to_whole_text_dfa(text):
    """The per-whitespace-chunk dispatch must equal running the DFA over
    the whole text (tokens never span whitespace)."""
    assert standard_analyze(text) == _dfa_analyze(text)
    from clucene_spark.analysis.standard import standard_analyze_terms

    assert standard_analyze_terms(text) == [t for t, *_ in _dfa_analyze(text)]


@given(st.text(alphabet="ab3Z.,.. ,\t\n é90", max_size=120))
@settings(max_examples=400, deadline=None)
def test_piecewise_bad_chunk_scan_equivalent_to_dfa(text):
    """The terms-only piecewise scan (_BAD_CHUNK partitions text into
    DFA-needing chunks vs C-path clean spans) must be term-identical to
    the whole-text DFA. Alphabet is punctuation/digit-heavy to stress
    the chunk-boundary cases: doubled punct, punct-led chunks, digit-led
    alnum, mixed whitespace (tab/newline/NBSP), non-ASCII letters."""
    from clucene_spark.analysis.standard import standard_analyze_terms

    assert standard_analyze_terms(text) == [t for t, *_ in _dfa_analyze(text)]


@given(st.text(alphabet="ab3Z.,.. ,\t\n é90", max_size=120))
@settings(max_examples=400, deadline=None)
def test_nostop_variant_equivalent(text):
    """standard_analyze_terms_nostop (code-level stopword drop, memoized
    DFA chunks) must equal the whole-text DFA chain PRE-StopFilter, and
    filter down to standard_analyze_terms exactly."""
    from clucene_spark.analysis.standard import (
        ENGLISH_STOP_WORDS, standard_analyze_terms,
        standard_analyze_terms_nostop)

    cache: dict = {}
    nostop = standard_analyze_terms_nostop(text, cache)
    # run again THROUGH the warm cache: hits must not change output
    assert standard_analyze_terms_nostop(text, cache) == nostop
    assert [t for t in nostop if t not in ENGLISH_STOP_WORDS] == \
        standard_analyze_terms(text)


def test_piecewise_bad_chunk_scan_edges():
    """Deterministic edge pins for the piecewise scan: 256-char alnum
    runs (MAX_WORD_LEN split), digit-led-with-letter chunks, and
    bad-chunk-at-EOS (the DFA lookahead distinguishes EOS from space)."""
    from clucene_spark.analysis.standard import standard_analyze_terms

    for text in [
        "",
        " ",
        "a" * 255,
        "a" * 256,
        "a" * 256 + " ok",
        "3x end",
        "end 3x",
        "a.. b",
        ",lead trail,",
        "dot.inside",
        "1,000.5",
        "tab\tsep nl\nsep",
    ]:
        assert standard_analyze_terms(text) == [
            t for t, *_ in _dfa_analyze(text)
        ], repr(text)


GERMAN_GOLDENS = [
    # reference src/test/data/contribs-lib/analysis/de/data.txt (behavior
    # goldens of TestGermanStemFilter.cpp, embedded so the repo stands alone)
    ("häufig", "haufig"),
    ("abschließen", "abschliess"),
    ("abschließender", "abschliess"),
    ("abschließendes", "abschliess"),
    ("abschließenden", "abschliess"),
    ("tisch", "tisch"),
    ("tische", "tisch"),
    ("tischen", "tisch"),
    ("haus", "hau"),
    ("hauses", "hau"),
    ("häuser", "hau"),
    ("häusern", "hau"),
    ("hauen", "hau"),
    ("drama", "drama"),
    ("dramen", "dram"),
    ("ausmaß", "ausmass"),
    ("xxxxxe", "xxxxx"),
    ("xxxxxs", "xxxxx"),
    ("xxxxxn", "xxxxx"),
    ("xxxxxt", "xxxxx"),
    ("xxxxxem", "xxxxx"),
    ("xxxxxer", "xxxxx"),
    ("xxxxxnd", "xxxxx"),
    ("xxxxxetende", "xxxxx"),
]


def test_german_stemmer_reference_goldens():
    from clucene_spark.analysis.german import german_stem

    for word, want in GERMAN_GOLDENS:
        assert german_stem(word) == want, word


def test_german_analyzer_chain():
    from clucene_spark.analysis.german import german_analyze

    got = german_analyze("Der abschließende Häuser und die Tische")
    assert [t for t, *_ in got] == ["abschliess", "hau", "tisch"]
    # dense positions after the German stop filter
    assert [p for _, p, *_ in got] == [0, 1, 2]
    # exclusion set bypasses the stemmer (GermanStemFilter exclusion table)
    got2 = german_analyze("Häuser", exclusions={"häuser"})
    assert [t for t, *_ in got2] == ["häuser"]


def test_snowball_dispatch():
    import pytest as _pytest

    from clucene_spark.analysis.german import snowball_analyze, snowball_stem

    assert snowball_stem("connections", "english") == "connect"
    assert snowball_stem("häuser", "german") == "hau"
    with _pytest.raises(ValueError):
        snowball_stem("x", "klingon")
    toks = snowball_analyze("running quickly", "english")
    # snowball 'english' is Porter2 (reference stem_*_english.c):
    # 'quickly' -> 'quick' (Porter1/'porter' would give 'quickli')
    assert [t for t, *_ in toks] == ["run", "quick"]
    assert snowball_stem("quickly", "porter") == "quickli"


@given(st.lists(
    st.tuples(
        st.text(alphabet="abcdefgABQZ", min_size=1, max_size=12),
        st.sampled_from(["", ".", ",", "..", ".,"]),
    ),
    min_size=1, max_size=20,
))
@settings(max_examples=300, deadline=None)
def test_terms_fast_alpha_chunk_equivalent_to_dfa(chunks):
    """The widened terms-only fast path (ASCII alpha run + at most one
    trailing '.'/',' — the dominant messy-webtext chunk shapes) must be
    term-identical to the whole-text DFA; double-punct chunks fall back
    to the DFA inside the same text."""
    from clucene_spark.analysis.standard import standard_analyze_terms

    text = " ".join(w + p for w, p in chunks)
    assert standard_analyze_terms(text) == [t for t, *_ in _dfa_analyze(text)]
    # the offsets flavor of the same widening (r4: single-pass term
    # vectors) must match the DFA on the FULL tuple — term, position,
    # start/end offsets, and type
    assert standard_analyze(text) == _dfa_analyze(text)
