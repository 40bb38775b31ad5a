"""StandardAnalyzer-equivalent: tokenizer DFA + filters, replicated from the
reference's behavior (NOT its code) for byte-identical token output.

Reference semantics (all file:line into /root/reference):
  * StandardTokenizer DFA     src/core/CLucene/analysis/standard/StandardTokenizer.cpp:96-464
      - token types ALPHANUM/APOSTROPHE/ACRONYM/COMPANY/EMAIL/HOST/NUM/CJK
        (StandardTokenizerConstants.h:12-23)
      - max token length 255 (CLConfig.h:169 LUCENE_MAX_WORD_LEN)
      - trailing-dot shaving (:244-249, :362-365), acronym even/odd check
        (:374-396), double dot/dash break (:328-341), '@'/'&'/'\''/'.'
        dispatch (:268-282), numeric-host recursion (:170-257), CJK
        char-range consumption (:41-46, :288-298)
      - the constant-true conditional at :408-409 means ReadDotted always
        returns forcedType — alpha hosts carry type <UNKNOWN>, and HOST
        typing flows only through ReadNumber's recursion. Replicated.
  * StandardFilter            analysis/standard/StandardFilter.cpp:26-56
      - APOSTROPHE ending in 's (case-insensitive) -> strip "'s"
      - ACRONYM -> remove all dots
  * LowerCaseFilter           analysis/Analyzers.cpp:150-155
  * StopFilter                analysis/Analyzers.cpp:215-234 — position
      increments default OFF (Analyzers.cpp:157), so positions are dense
      over surviving tokens
  * ENGLISH_STOP_WORDS (33)   analysis/Analyzers.cpp:293-300

Char classes: the reference uses GLib-derived wide-char tables
(src/shared/CLucene/config/repl_wctype.h:15-30). We use Python's str
predicates with two pins: DIGIT is Unicode Nd only (isdecimal), and ALPHA
excludes the CJK ranges so CJK input reaches ReadCJK per-char as the DFA
intends (the C macro order tests ALPHA first, but the CJK branch is dead
unless iswalpha(CJK) is false on the platform — we pin the behavior the
reference's CJK machinery and CJKAnalyzer contrib clearly intend).

This is per-string Python (the DFA cannot be expressed as Spark column
ops); the Spark entry points batch it through Arrow (mapInPandas /
pandas UDF) so the per-row work stays off the driver and scales with
executors — tokenization is embarrassingly parallel at any corpus size.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

MAX_WORD_LEN = 255  # CLConfig.h:169

ALPHANUM = "<ALPHANUM>"
APOSTROPHE = "<APOSTROPHE>"
ACRONYM = "<ACRONYM>"
COMPANY = "<COMPANY>"
EMAIL = "<EMAIL>"
HOST = "<HOST>"
NUM = "<NUM>"
CJK = "<CJK>"
UNKNOWN = "<UNKNOWN>"

# Analyzers.cpp:293-300, verbatim 33-word list
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


class Token(NamedTuple):
    term: str
    start: int
    end: int
    type: str


def _is_cjk(ch: str) -> bool:
    # StandardTokenizer.cpp:41-46
    o = ord(ch)
    return (
        0x3040 <= o <= 0x318F
        or 0x3300 <= o <= 0x337F
        or 0x3400 <= o <= 0x3D2D
        or 0x4E00 <= o <= 0x9FFF
        or 0xF900 <= o <= 0xFAFF
        or 0xAC00 <= o <= 0xD7AF
    )


def _is_alpha(ch: str) -> bool:
    return ch.isalpha() and not _is_cjk(ch)


def _is_digit(ch: str) -> bool:
    return ch.isdecimal()


def _is_alnum(ch: str) -> bool:
    return _is_alpha(ch) or _is_digit(ch)


class StandardTokenizer:
    """Streaming tokenizer over one string; ``tokens()`` yields Tokens.

    State machine with explicit read/unread over a character index —
    the same read-head discipline as the reference's FastCharStream so
    offsets and shaving behavior match exactly.
    """

    def __init__(self, text: str):
        self.s = text
        self.n = len(text)
        self.p = 0  # index of next char to read
        self.token_start = -1

    # -- stream primitives --------------------------------------------------

    def _read(self) -> str | None:
        if self.p >= self.n:
            self.p += 1
            return None
        ch = self.s[self.p]
        self.p += 1
        return ch

    def _unread(self) -> None:
        self.p -= 1

    def _peek(self) -> str | None:
        return self.s[self.p] if self.p < self.n else None

    def _eos(self, ch: str | None) -> bool:
        return ch is None or self.p >= self.n

    @property
    def _rd_pos(self) -> int:
        return self.p - 1  # 0-based position of the last-read char

    # -- public API -----------------------------------------------------------

    def tokens(self) -> Iterator[Token]:
        while True:
            t = self.next_token()
            if t is None:
                return
            yield t

    def next_token(self) -> Token | None:
        # while (!EOS) { ch = readChar(); ... }  (StandardTokenizer.cpp:145)
        ch: str | None = ""
        while not self._eos(ch):
            ch = self._read()
            if ch is None:
                continue
            if ch.isspace() or ch == "\x00":
                continue
            if _is_alpha(ch) or ch == "_":
                self.token_start = self._rd_pos
                return self._read_alphanum(ch)
            if _is_digit(ch) or ch == "-" or ch == ".":
                self.token_start = self._rd_pos
                t = self._read_number(None, ch)
                if t is not None:
                    return t
            elif _is_cjk(ch):
                self.token_start = self._rd_pos
                return self._read_cjk(ch)
        return None

    # -- helpers --------------------------------------------------------------

    def _make(self, buf: list[str], type_: str) -> Token:
        term = "".join(buf)
        return Token(term, self.token_start, self.token_start + len(term), type_)

    def _consume_while(self, buf: list[str], pred) -> str | None:
        """_CONSUME_AS_LONG_AS (StandardTokenizer.cpp:59): read until the
        predicate fails, EOS, or the buffer is full; the stopping char is
        consumed and NOT unread (the caller decides)."""
        while True:
            ch = self._read()
            if ch is None or not pred(ch) or len(buf) >= MAX_WORD_LEN:
                return ch

            buf.append(ch)

    def _consumed_nothing_of_value(self, special_pos: int, ch: str | None) -> bool:
        # StandardTokenizer.cpp:82
        if self._rd_pos == special_pos:
            return True
        if self._rd_pos == special_pos + 1:
            if ch is None:
                return True
            return ch.isspace() or not (
                _is_alnum(ch) or ch in "._-"
            )
        return False

    # -- DFA states -------------------------------------------------------------

    def _read_alphanum(self, prev: str) -> Token:
        # StandardTokenizer.cpp:259-286
        buf = [prev]
        ch = self._consume_while(buf, lambda c: _is_alnum(c) or c == "_")
        if not self._eos(ch) and len(buf) < MAX_WORD_LEN - 1:
            if ch == ".":
                buf.append(".")
                return self._read_dotted(buf, UNKNOWN)
            if ch == "'":
                buf.append("'")
                return self._read_apostrophe(buf)
            if ch == "@":
                buf.append("@")
                return self._read_at(buf)
            if ch == "&":
                buf.append("&")
                return self._read_company(buf)
        return self._make(buf, ALPHANUM)

    def _read_cjk(self, prev: str) -> Token:
        # StandardTokenizer.cpp:288-298
        buf = [prev]
        self._consume_while(buf, _is_cjk)
        return self._make(buf, CJK)

    def _read_number(self, previous: str | None, prev: str) -> Token | None:
        # StandardTokenizer.cpp:170-257
        if previous is not None:
            buf = list(previous)
            token_type = HOST
            dec_exhausted = False
        else:
            buf = []
            token_type = NUM
            dec_exhausted = prev == "."
        if len(buf) >= MAX_WORD_LEN:
            return None
        buf.append(prev)
        sign_exhausted = prev == "-"

        ch = self._consume_while(buf, _is_digit)

        if len(buf) < 2 and (
            (sign_exhausted and ch != ".") or dec_exhausted
        ):
            # a negative sign or decimal not followed by digits: not a number
            if not self._eos(ch):
                self._unread()
            return None

        if not self._eos(ch):
            if ch == ".":
                if len(buf) >= MAX_WORD_LEN:
                    return None
                buf.append(ch)
                ch = self._consume_while(buf, _is_digit)
                if not (ch is not None and (_is_digit(ch) or ch == ".")):
                    self._unread()
                elif (
                    not self._eos(ch)
                    and ch == "."
                    and (pk := self._peek()) is not None
                    and _is_digit(pk)
                ):
                    # fractional group followed by ".<digit>": numeric HOST
                    # recursion (StandardTokenizer.cpp:234-238)
                    return self._read_number("".join(buf), ".")
            else:
                self._unread()

        # SUCCESSFULLY_EXTRACTED_NUMBER (:242-256)
        if buf and buf[-1] == ".":
            buf.pop()
            self._unread()
        if buf and buf[-1] == "-":
            return None
        return self._make(buf, token_type)

    def _read_dotted(self, buf: list[str], forced_type: str) -> Token:
        # StandardTokenizer.cpp:301-410
        special_pos = self._rd_pos
        ch = self._peek()

        if not (ch == "." or ch == "-"):
            prev_was_dot = buf[-1] == "." if buf else False
            prev_was_dash = buf[-1] == "-" if buf else False
            while not self._eos(ch) and len(buf) < MAX_WORD_LEN - 1:
                ch = self._read()
                if ch is None:
                    break
                dot = ch == "."
                dash = ch == "-"
                if not (_is_alnum(ch) or ch == "_" or dot or dash):
                    break
                # doubled dot/dash ends the token (:328-341)
                if (dot or dash) and (prev_was_dot or prev_was_dash):
                    if not prev_was_dot:
                        buf.pop()
                    break
                buf.append(ch)
                prev_was_dot = dot
                prev_was_dash = dash

        rightmost_is_dot = bool(buf) and buf[-1] == "."
        if self._consumed_nothing_of_value(special_pos, ch):
            if rightmost_is_dot:
                buf.pop()
            if "." not in buf:
                forced_type = ALPHANUM
        elif rightmost_is_dot:
            # acronym: letter in every even slot, dot in every odd slot
            # including the last (:374-396)
            is_acronym = True
            for i in range(len(buf) - 1):
                c = buf[i]
                if (i % 2 == 0 and not _is_alpha(c)) or (i % 2 == 1 and c != "."):
                    is_acronym = False
                    break
            if is_acronym:
                forced_type = ACRONYM
            else:
                buf.pop()
                if "." not in buf:
                    forced_type = ALPHANUM

        if not self._eos(ch):
            if ch == "@" and len(buf) < MAX_WORD_LEN - 1:
                buf.append("@")
                return self._read_at(buf)
            self._unread()

        # reference :408-409 — constant-true conditional: always forcedType
        return self._make(buf, forced_type)

    def _read_apostrophe(self, buf: list[str]) -> Token:
        # StandardTokenizer.cpp:412-431
        token_type = APOSTROPHE
        special_pos = self._rd_pos
        ch = self._consume_while(buf, _is_alpha)
        if (buf and buf[-1] == "'") or self._consumed_nothing_of_value(
            special_pos, ch
        ):
            buf.pop()
            token_type = ALPHANUM
        if not self._eos(ch):
            self._unread()
        return self._make(buf, token_type)

    def _read_at(self, buf: list[str]) -> Token:
        # StandardTokenizer.cpp:433-440
        t = self._read_dotted(buf, EMAIL)
        if not any(c in ".0123456789" for c in t.term):
            t = Token(t.term, t.start, t.end, COMPANY)
        return t

    def _read_company(self, buf: list[str]) -> Token:
        # StandardTokenizer.cpp:442-462
        special_pos = self._rd_pos
        ch = self._consume_while(buf, lambda c: _is_alnum(c) or c == "_")
        if self._consumed_nothing_of_value(special_pos, ch):
            buf.pop()  # shave the '&'
            return self._make(buf, ALPHANUM)
        if not self._eos(ch):
            self._unread()
        return self._make(buf, COMPANY)


# ---------------------------------------------------------------------------
# Filters (StandardFilter -> LowerCaseFilter -> StopFilter)
# ---------------------------------------------------------------------------

def standard_filter(tok: Token) -> Token:
    """StandardFilter.cpp:26-56: strip 's from APOSTROPHE, dots from ACRONYM."""
    if tok.type == APOSTROPHE and len(tok.term) >= 2 and tok.term[-2:].lower() == "'s":
        return Token(tok.term[:-2], tok.start, tok.end, tok.type)
    if tok.type == ACRONYM:
        return Token(tok.term.replace(".", ""), tok.start, tok.end, tok.type)
    return tok


def lower_case_filter(tok: Token) -> Token:
    return Token(tok.term.lower(), tok.start, tok.end, tok.type)


import re as _re

_PUNCT_DEL = str.maketrans("", "", ".,")
# Piecewise scan: ONE finditer pass yields exactly the chunks the DFA
# must see — a whitespace-delimited chunk is "bad" iff it has a 256+
# alnum run (LUCENE_MAX_WORD_LEN+1 splits it), is digit-led with a
# letter in the run (the DFA splits "3x" -> "3","x" via ReadNumber,
# while letter-led "x3" stays one ALPHANUM token), or its
# post-alnum-prefix remainder is anything but "" / one final '.'/','
# (internal punct, doubled punct, or a non-[A-Za-z0-9.,] char). In the
# clean spans between bad chunks the DFA provably emits one token per
# alnum run: case never splits an alpha run, a final '.' is dot-shaved
# (single-letter acronyms: StandardFilter strips the dot, type
# normalizes to ALPHANUM), a final ',' is discarded as a non-token
# char, token type is NUM iff the run is digit-led (then all digits) —
# so the terms-only path degenerates to lower().translate(drop
# .,).split() in C, and the offsets path to one [A-Za-z0-9]+ finditer.
# Anchored at chunk starts with possessive quantifiers so a clean chunk
# is rejected in one linear scan, no backtracking — the pass replaces
# both whole-text prechecks AND the per-chunk Python dispatch.
# Fuzz-pinned to the DFA in tests/test_analysis.py.
_BAD_CHUNK = _re.compile(
    r"(?:(?<=\s)|^)"
    r"(?:[A-Za-z0-9]{256}"
    r"|[0-9]++[A-Za-z]"
    r"|[A-Za-z0-9]*+(?:[.,]\S|[^A-Za-z0-9.,\s]))"
    r"\S*"
)
# within a clean span every token is exactly an alnum run (offsets path)
_ALNUM_RUN = _re.compile(r"[A-Za-z0-9]+")


def standard_analyze(
    text: str, stop_words: frozenset[str] = ENGLISH_STOP_WORDS
) -> list[tuple[str, int, int, int, str]]:
    """Full StandardAnalyzer chain (StandardAnalyzer.cpp:68-82):
    StandardTokenizer -> StandardFilter -> LowerCaseFilter -> StopFilter.

    Returns [(term, pos, start_off, end_off, type)], positions dense over
    surviving tokens (position increments default OFF, Analyzers.cpp:157).

    Offsets flavor of the terms-only piecewise scan: _BAD_CHUNK yields
    the chunks the DFA must see; in the clean spans between them every
    token is an alnum run, so one [A-Za-z0-9]+ finditer gives term,
    start and end directly — the DFA's end offset excludes a clean
    chunk's shaved '.'/dropped ',' (single-letter acronyms 'I.'
    identically: StandardFilter strips the dot, type normalizes to
    ALPHANUM), which is exactly the alnum-run end. Fuzz-pinned to the
    DFA incl. offsets/types in tests/test_analysis.py.
    """
    out = []
    pos = 0
    last = 0
    n = len(text)
    for m in _BAD_CHUNK.finditer(text):
        if last < m.start():
            for mm in _ALNUM_RUN.finditer(text, last, m.start()):
                w = mm.group()
                t = w.lower()
                if t not in stop_words:
                    out.append((t, pos, mm.start(), mm.end(),
                                NUM if w[0].isdigit() else ALPHANUM))
                    pos += 1
        chunk = m.group()
        base = m.start()
        # the DFA's lookahead distinguishes EOS from a following space
        # (e.g. "0_" vs "0_ "): feed the real next char class
        piece = chunk if m.end() == n else chunk + " "
        for tok in StandardTokenizer(piece).tokens():
            tok = lower_case_filter(standard_filter(tok))
            if tok.term in stop_words:
                continue
            out.append((tok.term, pos, tok.start + base, tok.end + base, tok.type))
            pos += 1
        last = m.end()
    if last < n:
        for mm in _ALNUM_RUN.finditer(text, last, n):
            w = mm.group()
            t = w.lower()
            if t not in stop_words:
                out.append((t, pos, mm.start(), mm.end(),
                            NUM if w[0].isdigit() else ALPHANUM))
                pos += 1
    return out


def standard_analyze_terms(
    text: str, stop_words: frozenset[str] = ENGLISH_STOP_WORDS
) -> list[str]:
    """Terms-only variant for the indexing hot path: same output terms in
    the same order as standard_analyze (positions are dense 0..n-1, so the
    caller derives them with arange) but without building a tuple per
    token — the allocation cost dominates the fused segment build.

    One _BAD_CHUNK scan partitions the text: DFA only on the bad chunks,
    C string ops on the (dominant) clean spans between them."""
    out = []
    last = 0
    n = len(text)
    for m in _BAD_CHUNK.finditer(text):
        span = text[last:m.start()]
        if span:
            out.extend(
                w
                for w in span.lower().translate(_PUNCT_DEL).split()
                if w not in stop_words
            )
        chunk = m.group()
        # the DFA's lookahead distinguishes EOS from a following space
        # (e.g. "0_" vs "0_ "): feed the real next char class
        piece = chunk if m.end() == n else chunk + " "
        for tok in StandardTokenizer(piece).tokens():
            tok = lower_case_filter(standard_filter(tok))
            if tok.term not in stop_words:
                out.append(tok.term)
        last = m.end()
    span = text[last:]
    if span:
        out.extend(
            w
            for w in span.lower().translate(_PUNCT_DEL).split()
            if w not in stop_words
        )
    return out


def standard_analyze_terms_nostop(
    text: str, chunk_cache: dict | None = None
) -> list[str]:
    """Piecewise terms WITHOUT the StopFilter — for callers that drop
    stopwords at the dictionary-code level (segments._analyze_docs_codes):
    filtering once per VOCAB entry beats a per-token set probe.

    chunk_cache memoizes the DFA output per bad-chunk piece: bad chunks
    are Zipf-distributed in real text (and a tiny fixed set in the bench
    corpus), so the DFA runs once per distinct chunk per task instead of
    once per occurrence. The cache key is the exact DFA input (chunk +
    the one-char lookahead), so hits are trivially equivalent. Equality
    `[t for t in this if t not in stops] == standard_analyze_terms(text)`
    is fuzz-pinned in tests/test_analysis.py."""
    out: list[str] = []
    last = 0
    n = len(text)
    for m in _BAD_CHUNK.finditer(text):
        span = text[last:m.start()]
        if span:
            out.extend(span.lower().translate(_PUNCT_DEL).split())
        chunk = m.group()
        # the DFA's lookahead distinguishes EOS from a following space
        piece = chunk if m.end() == n else chunk + " "
        toks = None if chunk_cache is None else chunk_cache.get(piece)
        if toks is None:
            toks = tuple(
                lower_case_filter(standard_filter(tok)).term
                for tok in StandardTokenizer(piece).tokens()
            )
            if chunk_cache is not None and len(chunk_cache) < 65536:
                chunk_cache[piece] = toks
        out.extend(toks)
        last = m.end()
    span = text[last:]
    if span:
        out.extend(span.lower().translate(_PUNCT_DEL).split())
    return out


def tokenize_only(text: str) -> list[Token]:
    """Raw tokenizer output (no filters) — for token-golden tests."""
    return list(StandardTokenizer(text).tokens())
