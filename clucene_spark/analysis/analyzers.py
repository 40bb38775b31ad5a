"""The non-standard analyzer family (reference analysis/Analyzers.cpp).

Python token-level implementations (behavior replicated, not code) plus
Spark column-expression equivalents where the semantics allow. Used for
per-field pipelines (PerFieldAnalyzer) and as parity targets for the
token-golden tests (the TestAnalyzers.cpp pattern).

Reference map (all file:line into /root/reference):
  WhitespaceTokenizer/Analyzer  analysis/Analyzers.cpp:98-124
  SimpleAnalyzer (LowerCaseTokenizer = letter runs, lowercased)
                                analysis/Analyzers.cpp:77-141
  StopAnalyzer (LowerCaseTokenizer + StopFilter)
                                analysis/Analyzers.cpp:144-300
  KeywordAnalyzer/Tokenizer (whole value = one token)
                                analysis/Analyzers.cpp:510-570
  LengthFilter (min <= len <= max)
                                analysis/Analyzers.cpp:573-592
  ISOLatin1AccentFilter (Latin-1 + OE/oe/Y folding)
                                analysis/Analyzers.cpp:344-507
  PerFieldAnalyzerWrapper (analyzer dispatch by field name)
                                analysis/Analyzers.cpp:302-340
"""

from __future__ import annotations

from clucene_spark.analysis.standard import ENGLISH_STOP_WORDS, Token

# ---------------------------------------------------------------------------
# tokenizers / analyzers — each returns [(term, pos, start, end)]
# ---------------------------------------------------------------------------

def whitespace_analyze(text: str) -> list[tuple[str, int, int, int]]:
    """Split on whitespace runs, offsets preserved (Analyzers.cpp:98-124)."""
    out = []
    pos = 0
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i].isspace():
            i += 1
        if i >= n:
            break
        s = i
        while i < n and not text[i].isspace():
            i += 1
        out.append((text[s:i], pos, s, i))
        pos += 1
    return out


def simple_analyze(text: str) -> list[tuple[str, int, int, int]]:
    """Letter-run tokenizer + lowercase (Analyzers.cpp:77-141)."""
    out = []
    pos = 0
    i, n = 0, len(text)
    while i < n:
        while i < n and not text[i].isalpha():
            i += 1
        if i >= n:
            break
        s = i
        while i < n and text[i].isalpha():
            i += 1
        out.append((text[s:i].lower(), pos, s, i))
        pos += 1
    return out


def stop_analyze(
    text: str, stop_words: frozenset[str] = ENGLISH_STOP_WORDS
) -> list[tuple[str, int, int, int]]:
    """SimpleAnalyzer + StopFilter; positions dense over survivors
    (enablePositionIncrements defaults OFF, Analyzers.cpp:157)."""
    out = []
    pos = 0
    for term, _, s, e in simple_analyze(text):
        if term in stop_words:
            continue
        out.append((term, pos, s, e))
        pos += 1
    return out


def keyword_analyze(text: str) -> list[tuple[str, int, int, int]]:
    """Whole value as a single untokenized term (Analyzers.cpp:510-570)."""
    return [(text, 0, 0, len(text))] if text else []


def cjk_bigram_analyze(text: str) -> list[tuple[str, int, int, int]]:
    """CJK overlapping bigrams, non-CJK alnum runs lowercased — the contrib
    CJKAnalyzer behaviour (src/contribs-lib/CLucene/analysis/cjk/
    CJKAnalyzer.cpp): a run of N CJK chars yields N-1 bigrams (a single
    isolated CJK char yields itself)."""
    from clucene_spark.analysis.standard import _is_cjk

    out = []
    pos = 0
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if _is_cjk(c):
            s = i
            while i < n and _is_cjk(text[i]):
                i += 1
            run = text[s:i]
            if len(run) == 1:
                out.append((run, pos, s, s + 1))
                pos += 1
            else:
                for j in range(len(run) - 1):
                    out.append((run[j : j + 2], pos, s + j, s + j + 2))
                    pos += 1
        elif c.isalnum():
            s = i
            while i < n and text[i].isalnum() and not _is_cjk(text[i]):
                i += 1
            out.append((text[s:i].lower(), pos, s, i))
            pos += 1
        else:
            i += 1
    return out


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------

def length_filter(tokens, min_len: int, max_len: int):
    """Keep terms with min <= len <= max (Analyzers.cpp:573-592); positions
    are NOT re-densified (the reference keeps original increments here)."""
    return [t for t in tokens if min_len <= len(t[0]) <= max_len]


# Latin-1 folding exactly as the reference's switch (Analyzers.cpp:371-507):
# A-ring family -> A, AE ligature -> "AE", eth -> D, thorn -> "TH",
# sharp-s -> "ss", plus the UCS2 OE/oe/Y-diaeresis cases.
_ACCENT_MAP: dict[int, str] = {}
for cps, rep in [
    (range(0xC0, 0xC6), "A"), ([0xC6], "AE"), ([0xC7], "C"),
    (range(0xC8, 0xCC), "E"), (range(0xCC, 0xD0), "I"), ([0xD0], "D"),
    ([0xD1], "N"), ([0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD8], "O"),
    ([0xDE], "TH"), (range(0xD9, 0xDD), "U"), ([0xDD], "Y"),
    (range(0xE0, 0xE6), "a"), ([0xE6], "ae"), ([0xE7], "c"),
    (range(0xE8, 0xEC), "e"), (range(0xEC, 0xF0), "i"), ([0xF0], "d"),
    ([0xF1], "n"), ([0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF8], "o"),
    ([0xDF], "ss"), ([0xFE], "th"), (range(0xF9, 0xFD), "u"),
    ([0xFD, 0xFF], "y"), ([0x152], "OE"), ([0x153], "oe"), ([0x178], "Y"),
]:
    for cp in cps:
        _ACCENT_MAP[cp] = rep


def iso_latin1_accent_fold(term: str) -> str:
    """ISOLatin1AccentFilter::next (Analyzers.cpp:350-507). Characters in
    [0xC0, 0x178] fold per the table; everything else passes through."""
    if not any(0xC0 <= ord(c) <= 0x178 for c in term):
        return term
    return "".join(_ACCENT_MAP.get(ord(c), c) for c in term)


def accent_filter(tokens):
    return [(iso_latin1_accent_fold(t[0]), *t[1:]) for t in tokens]


# ---------------------------------------------------------------------------
# per-field dispatch
# ---------------------------------------------------------------------------

def _german_analyze(text):
    from clucene_spark.analysis.german import german_analyze

    return german_analyze(text)


def _snowball_analyze(text):
    from clucene_spark.analysis.german import snowball_analyze

    return snowball_analyze(text, "english")


ANALYZERS = {
    "whitespace": whitespace_analyze,
    "simple": simple_analyze,
    "stop": stop_analyze,
    "keyword": keyword_analyze,
    "german": _german_analyze,
    "snowball": _snowball_analyze,
}


class PerFieldAnalyzer:
    """Analyzer dispatch by field name (Analyzers.cpp:302-340): a default
    analyzer plus per-field overrides. In the Spark design this configures
    which analyze callable each column's token pipeline uses."""

    def __init__(self, default: str = "standard", overrides: dict[str, str] | None = None):
        self.default = default
        self.overrides = dict(overrides or {})

    def for_field(self, field: str):
        name = self.overrides.get(field, self.default)
        if name == "standard":
            from clucene_spark.analysis.standard import standard_analyze

            return lambda text: [(t, p, s, e) for t, p, s, e, _ in standard_analyze(text)]
        return ANALYZERS[name]
