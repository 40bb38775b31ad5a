"""German analyzer pack + Snowball dispatch (contribs-lib parity).

GermanStemmer is a semantics port of the reference's algorithm
(reference src/contribs-lib/CLucene/analysis/de/GermanStemmer.cpp:18-213):
substitute (umlaut folding, double-char masking, digraph tokens) -> strip
(e/s/n/t and nd/em/er suffix loop gated on length+substCount) -> optimize
(erin*, z->x) -> resubstitute -> removeParticleDenotion (gege). The port is
BUG-COMPATIBLE where the reference deviates from the published algorithm:
`substCount =+ 2` in the 'sch' branch ASSIGNS 2 instead of adding
(GermanStemmer.cpp:150), and the double-char mask reads the pre-mutation
character for the digraph checks in the same iteration — both replicated,
because index-time and query-time terms must agree with an index built by
the reference.

GermanAnalyzer chain (reference de/GermanAnalyzer.cpp:85-149):
StandardTokenizer -> StandardFilter -> LowerCaseFilter -> StopFilter
(GERMAN_STOP_WORDS, GermanAnalyzer.cpp:23-37) -> GermanStemFilter with an
optional exclusion set (de/GermanStemFilter.cpp:28-55).

SnowballAnalyzer (reference src/contribs-lib/CLucene/snowball/) dispatches
by language name; this build ships 'english' (Porter2, the snowball
english algorithm — distinct from 'porter', which IS the original Porter
algorithm, analysis/porter.py), 'german' (the stemmer above), and the
snowball_stem.py language pack (May-2005 ports fuzz-verified against the
reference's generated C). Remaining libstemmer languages raise
ValueError rather than silently degrading.
"""

from __future__ import annotations

from clucene_spark.analysis.standard import standard_analyze

# reference de/GermanAnalyzer.cpp:23-37 (48 entries, duplicates included)
GERMAN_STOP_WORDS = frozenset(
    [
        "einer", "eine", "eines", "einem", "einen",
        "der", "die", "das", "dass", "daß",
        "du", "er", "sie", "es",
        "was", "wer", "wie", "wir",
        "und", "oder", "ohne", "mit",
        "am", "im", "in", "aus", "auf",
        "ist", "sein", "war", "wird",
        "ihr", "ihre", "ihres",
        "als", "für", "von",
        "dich", "dir", "mich", "mir",
        "mein", "kein",
        "durch", "wegen",
    ]
)

_SECTION = "§"  # the 'ch' mask token (GermanStemmer.cpp:153)


def _substitute(buf: list[str]) -> int:
    """GermanStemmer::substitute (GermanStemmer.cpp:115-178)."""
    subst = 0
    i = 0
    while i < len(buf):
        c = buf[i]
        if i > 0 and c == buf[i - 1]:
            buf[i] = "*"
        elif c == "ä":
            buf[i] = "a"
        elif c == "ö":
            buf[i] = "o"
        elif c == "ü":
            buf[i] = "u"
        elif c == "ß":
            buf[i] = "s"
            buf.insert(i + 1, "s")
            subst += 1
        if i < len(buf) - 1:
            if i < len(buf) - 2 and c == "s" and buf[i + 1] == "c" and buf[i + 2] == "h":
                buf[i] = "$"
                del buf[i + 1 : i + 3]
                subst = 2  # sic: `substCount =+ 2` (GermanStemmer.cpp:150)
            elif c == "c" and buf[i + 1] == "h":
                buf[i] = _SECTION
                del buf[i + 1]
                subst += 1
            elif c == "e" and buf[i + 1] == "i":
                buf[i] = "%"
                del buf[i + 1]
                subst += 1
            elif c == "i" and buf[i + 1] == "e":
                buf[i] = "&"
                del buf[i + 1]
                subst += 1
            elif c == "i" and buf[i + 1] == "g":
                buf[i] = "#"
                del buf[i + 1]
                subst += 1
            elif c == "s" and buf[i + 1] == "t":
                buf[i] = "!"
                del buf[i + 1]
                subst += 1
        i += 1
    return subst


def _strip(buf: list[str], subst: int) -> None:
    """GermanStemmer::strip (GermanStemmer.cpp:51-86)."""
    do_more = True
    while do_more and len(buf) > 3:
        n = len(buf)
        if n + subst > 5 and buf[n - 2 : n] == ["n", "d"]:
            del buf[n - 2 : n]
        elif n + subst > 4 and buf[n - 2 : n] == ["e", "m"]:
            del buf[n - 2 : n]
        elif n + subst > 4 and buf[n - 2 : n] == ["e", "r"]:
            del buf[n - 2 : n]
        elif buf[-1] == "e":
            del buf[-1]
        elif buf[-1] == "s":
            del buf[-1]
        elif buf[-1] == "n":
            del buf[-1]
        elif buf[-1] == "t":  # "t" occurs only as suffix of verbs
            del buf[-1]
        else:
            do_more = False


def _optimize(buf: list[str], subst: int) -> None:
    """GermanStemmer::optimize (GermanStemmer.cpp:88-99)."""
    if len(buf) > 5 and buf[-5:] == list("erin*"):
        del buf[-1]
        _strip(buf, subst)
    if buf and buf[-1] == "z":
        buf[-1] = "x"


def _resubstitute(buf: list[str]) -> None:
    """GermanStemmer::resubstitute (GermanStemmer.cpp:181-213)."""
    i = 0
    while i < len(buf):
        c = buf[i]
        if c == "*":
            buf[i] = buf[i - 1]
        elif c == "$":
            buf[i] = "s"
            buf[i + 1 : i + 1] = ["c", "h"]
        elif c == _SECTION:
            buf[i] = "c"
            buf.insert(i + 1, "h")
        elif c == "%":
            buf[i] = "e"
            buf.insert(i + 1, "i")
        elif c == "&":
            buf[i] = "i"
            buf.insert(i + 1, "e")
        elif c == "#":
            buf[i] = "i"
            buf.insert(i + 1, "g")
        elif c == "!":
            buf[i] = "s"
            buf.insert(i + 1, "t")
        i += 1


def _remove_particle_denotion(buf: list[str]) -> None:
    """GermanStemmer::removeParticleDenotion (GermanStemmer.cpp:101-110)."""
    if len(buf) > 4:
        for c in range(len(buf) - 3):
            if buf[c : c + 4] == ["g", "e", "g", "e"]:
                del buf[c : c + 2]
                return


def german_stem(term: str) -> str:
    """GermanStemmer::stem (GermanStemmer.cpp:18-48)."""
    if not term or not term.isalpha():  # isStemmable
        return term
    buf = list(term)
    subst = _substitute(buf)
    _strip(buf, subst)
    _optimize(buf, subst)
    _resubstitute(buf)
    _remove_particle_denotion(buf)
    return "".join(buf)


def german_analyze(
    text: str, stop_words=GERMAN_STOP_WORDS, exclusions=frozenset()
) -> list[tuple[str, int, int, int]]:
    """GermanAnalyzer chain: standard tokenize+filter+lowercase, German
    stops, stem everything not in the exclusion set (GermanStemFilter)."""
    out = []
    pos = -1
    # chain runs WITHOUT the English stop list — only the German stops
    # filter here (GermanAnalyzer.cpp:131-141)
    for term, _pos, start, end, _typ in standard_analyze(text, stop_words=frozenset()):
        if term in stop_words:
            continue
        pos += 1
        if term not in exclusions:
            term = german_stem(term)
        out.append((term, pos, start, end))
    return out


def snowball_stem(term: str, language: str = "english") -> str:
    lang = language.lower()
    if lang == "porter":
        # the snowball 'porter' variant IS the original Porter algorithm
        # (reference src_c/stem_*_porter.c)
        from clucene_spark.analysis.porter import porter_stem

        return porter_stem(term)
    if lang == "german":
        return german_stem(term)
    from clucene_spark.analysis.snowball_stem import SNOWBALL_STEMMERS

    if lang in SNOWBALL_STEMMERS:
        return SNOWBALL_STEMMERS[lang](term)
    raise ValueError(
        f"snowball language {language!r} not shipped (have: porter, "
        f"german, {', '.join(sorted(SNOWBALL_STEMMERS))})"
    )


def snowball_analyze(
    text: str, language: str = "english", stop_words=None
) -> list[tuple[str, int, int, int]]:
    """SnowballAnalyzer: StandardTokenizer -> StandardFilter -> LowerCase ->
    [StopFilter] -> SnowballFilter (reference snowball/SnowballAnalyzer)."""
    stops = stop_words if stop_words is not None else frozenset()
    out = []
    pos = -1
    for term, _pos, start, end, _typ in standard_analyze(text, stop_words=frozenset()):
        if term in stops:
            continue
        pos += 1
        out.append((snowball_stem(term, language), pos, start, end))
    return out
