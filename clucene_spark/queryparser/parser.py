r"""Lucene-classic query parser -> Query AST.

Fresh recursive-descent implementation of the grammar the reference's
JavaCC-generated parser implements (reference:
src/core/CLucene/queryParser/QueryParser.h:47-51):

    Query  ::= ( Clause )*
    Clause ::= ["+", "-", "NOT", "AND", "OR", "&&", "||", "!"]
               [<field> ":"] ( <term> | "(" Query ")" )

with phrase ("..."[~slop]), fuzzy (term~[minSim]), wildcard (*, ?), prefix
(term*), ranges ([a TO b] / {a TO b}), boosts (^f), and escapes (\c).
Default operator OR (QueryParser.h:103-113). Query-side analysis runs the
same analyzer as indexing (getFieldQuery: 0 tokens -> None, 1 -> TermQuery,
n -> PhraseQuery; QueryParser.cpp:313-413); range/prefix/wildcard/fuzzy
terms are lowercased, not analyzed (QueryParser.h:115).

Clause-occur resolution replicates addClause: an AND conjunction promotes
the PRECEDING clause to MUST unless prohibited, and the current clause to
MUST unless prohibited (QueryParser.cpp addClause semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from clucene_spark.analysis.standard import standard_analyze
from clucene_spark.search.engine import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    ConstantScoreRangeQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RangeQuery,
    TermQuery,
    WildcardQuery,
)

_SPECIALS = set('+-!():^[]"{}~*?\\&|')

CONJ_NONE, CONJ_AND, CONJ_OR = 0, 1, 2
MOD_NONE, MOD_REQ, MOD_NOT = 0, 1, 2

_HEX = set("0123456789abcdefABCDEF")


def _unescape(s: str) -> str:
    """discardEscapeChar (reference QueryParser.cpp:552-615): drop the
    backslash before an escaped char; `\\uXXXX` decodes a unicode escape
    (truncated sequences are a parse error, as in the reference)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u":
                hexs = s[i + 2:i + 6]
                if len(hexs) < 4 or any(h not in _HEX for h in hexs):
                    raise QueryParserError(
                        f"truncated unicode escape sequence in {s!r}"
                    )
                out.append(chr(int(hexs, 16)))
                i += 6
                continue
            out.append(nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _unescaped_positions(s: str, chars: str) -> list[int]:
    """Positions of unescaped occurrences of `chars` (escape-aware scan —
    structural decisions look at the RAW text, exactly like the JavaCC
    lexer's _ESCAPED_CHAR vs wildcard-marker distinction)."""
    pos, i, n = [], 0, len(s)
    while i < n:
        if s[i] == "\\" and i + 1 < n:
            i += 2
            continue
        if s[i] in chars:
            pos.append(i)
        i += 1
    return pos


@dataclass
class _Tok:
    kind: str  # AND OR NOT PLUS MINUS LPAREN RPAREN QUOTED TERM RANGE EOF
    text: str = ""
    field: str | None = None
    boost: float | None = None
    fuzzy: float | None = None  # min similarity, None = not fuzzy
    slop: int = 0
    lower: str | None = None
    upper: str | None = None
    inclusive: bool = True


class QueryParserError(ValueError):
    pass


class QueryParser:
    """Field routing (reference QueryParser::GetFieldQuery dispatches every
    leaf to the named field's analyzer+postings):

      * field is the default field / absent / '*'  -> analyzed query on the
        default field
      * field in `indexed_fields`  -> analyzed query carrying field=... so
        the engine scores it against that field's postings (per-field
        tf/idf)
      * field in `keyword_fields`  -> KeywordQuery equality on the
        untokenized docs-table column (the INDEX_UNTOKENIZED model)
      * anything else -> matches NOTHING (the reference searches a field
        absent from the index and finds no postings) — never an
        AnalysisException from treating an unknown name as a docs column.
    """

    def __init__(self, default_field: str = "text", analyzer=None,
                 default_operator: str = "OR",
                 indexed_fields=None, keyword_fields=None,
                 date_fields: dict | None = None,
                 lowercase_expanded_terms: bool = True,
                 allow_leading_wildcard: bool = False,
                 use_old_range_query: bool = False):
        self.default_field = default_field
        self.analyze = analyzer or (lambda t: [x[0] for x in standard_analyze(t)])
        self.default_operator = default_operator
        self.indexed_fields = set(indexed_fields or ()) | {default_field}
        self.keyword_fields = set(keyword_fields or ())
        # setLowercaseExpandedTerms / setAllowLeadingWildcard (reference
        # QueryParser.h; wildcard/prefix/fuzzy/range terms bypass the
        # analyzer, so case folding is the parser's job, and a leading
        # wildcard is rejected by default exactly as getWildcardQuery does)
        self.lowercase_expanded_terms = lowercase_expanded_terms
        self.allow_leading_wildcard = allow_leading_wildcard
        # setUseOldRangeQuery (QueryParser.cpp:223-227; default false since
        # Lucene 2.x): ranges parse to ConstantScoreRangeQuery unless the
        # old scored RangeQuery form is requested
        self.use_old_range_query = use_old_range_query
        # setDateResolution analogue (reference QueryParser.cpp:229-256):
        # field -> DateTools resolution; range bounds that parse as dates on
        # these fields are encoded to sortable DateTools term strings
        # (QueryParser::GetRangeQuery date detection, QueryParser.cpp:428-489)
        self.date_fields = dict(date_fields or {})

    _DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$")

    def _maybe_date_bounds(self, field: str, lo: str | None, hi: str | None,
                           inclusive: bool):
        """If the field has a date resolution and both present bounds parse
        as ISO dates, return DateTools-encoded bounds; else None. The upper
        bound of an inclusive range is pushed to end-of-day first — 'the
        user can only specify the date, not the time' (QueryParser.cpp:445)."""
        res = self.date_fields.get(field)
        if res is None:
            return None
        import datetime as _dt

        from clucene_spark.document.tools import date_to_string

        def enc(s: str | None, end: bool):
            if s is None:
                return None, True
            m = self._DATE_RE.match(s)
            if not m:
                return None, False
            y, mo, dd = (int(g) for g in m.groups())
            try:
                if end and inclusive:
                    dt = _dt.datetime(y, mo, dd, 23, 59, 59, 999000)
                else:
                    dt = _dt.datetime(y, mo, dd)
            except ValueError:
                # calendar-invalid (2020-13-01): not a date — fall back
                # to a plain term range, the reference's behavior when
                # DateTools parsing fails
                return None, False
            return date_to_string(dt, res), True

        lo_e, ok_lo = enc(lo, end=False)
        hi_e, ok_hi = enc(hi, end=True)
        if not (ok_lo and ok_hi):
            return None
        return lo_e, hi_e

    # -- lexer ---------------------------------------------------------------

    def _lex(self, s: str) -> list[_Tok]:
        toks: list[_Tok] = []
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c.isspace():
                i += 1
                continue
            if c == "+":
                toks.append(_Tok("PLUS"))
                i += 1
            elif c == "-" and (i + 1 < n and not (s[i + 1].isdigit() or s[i + 1] == ".")):
                toks.append(_Tok("MINUS"))
                i += 1
            elif c == "!":
                toks.append(_Tok("NOT"))
                i += 1
            elif c == "&" and s[i : i + 2] == "&&":
                toks.append(_Tok("AND"))
                i += 2
            elif c == "|" and s[i : i + 2] == "||":
                toks.append(_Tok("OR"))
                i += 2
            elif c == "(":
                toks.append(_Tok("LPAREN"))
                i += 1
            elif c == ")":
                tok = _Tok("RPAREN")
                i += 1
                i = self._suffix(s, i, tok)
                toks.append(tok)
            elif c == '"':
                j = i + 1
                buf = []
                while j < n and s[j] != '"':
                    if s[j] == "\\" and j + 1 < n:
                        buf.append(s[j])      # keep raw; _unescape resolves
                        buf.append(s[j + 1])  # (incl. \uXXXX) after lexing
                        j += 2
                    else:
                        buf.append(s[j])
                        j += 1
                if j >= n:
                    raise QueryParserError(f"unterminated phrase in {s!r}")
                tok = _Tok("QUOTED", _unescape("".join(buf)))
                i = j + 1
                i = self._suffix(s, i, tok, phrase=True)
                toks.append(tok)
            elif c in "[{":
                inclusive = c == "["
                close = "]" if inclusive else "}"
                # quote-aware scan for the closing bracket: the bound
                # grammar allows quoted goop containing ']' (RANGEIN_QUOTED
                # accepts any escaped/quoted characters), so a plain find()
                # would truncate '["a]b" TO c]'
                j = i + 1
                while j < n and s[j] != close:
                    if s[j] == '"':
                        j += 1
                        while j < n and s[j] != '"':
                            j += 2 if s[j] == "\\" and j + 1 < n else 1
                    j += 1
                if j >= n:
                    raise QueryParserError(f"unterminated range in {s!r}")
                body = s[i + 1 : j]
                # bound ::= "quoted goop" | bare goop; TO is optional
                # ("[a z]" == "[a TO z]", reference RangeQuery grammar)
                bound = r'"(?:\\.|[^"])*"|\S+'
                m = re.match(rf"\s*({bound})\s+TO\s+({bound})\s*$", body)
                if m is None:
                    m = re.match(rf"\s*({bound})\s+({bound})\s*$", body)
                    if m is not None and m.group(2) == "TO":
                        m = None  # "[a TO]" — missing upper goop
                if not m:
                    raise QueryParserError(f"bad range {body!r}")

                def _bound(g: str):
                    if g == "*":
                        return None
                    if len(g) >= 2 and g[0] == '"' and g[-1] == '"':
                        g = g[1:-1]
                    return _unescape(g)

                tok = _Tok("RANGE", lower=_bound(m.group(1)),
                           upper=_bound(m.group(2)), inclusive=inclusive)
                i = j + 1
                i = self._suffix(s, i, tok)
                toks.append(tok)
            else:
                # bare term (possibly field:..., wildcard, fuzzy, boost)
                j = i
                buf = []
                while j < n:
                    cj = s[j]
                    if cj == "\\" and j + 1 < n:
                        buf.append(cj)        # keep RAW — structural
                        buf.append(s[j + 1])  # decisions are escape-aware
                        j += 2
                        continue
                    if cj.isspace() or cj in '+()"[]{}^~!':
                        break
                    if cj in "&|" and s[j : j + 2] in ("&&", "||"):
                        break
                    buf.append(cj)
                    j += 1
                word = "".join(buf)
                i = j
                if word == "AND":
                    toks.append(_Tok("AND"))
                    continue
                if word == "OR":
                    toks.append(_Tok("OR"))
                    continue
                if word == "NOT":
                    toks.append(_Tok("NOT"))
                    continue
                # split field on the first UNESCAPED colon (escaped colons
                # belong to the field name / term: a\:b:c -> field "a:b")
                field = None
                colons = _unescaped_positions(word, ":")
                if colons:
                    f, rest = word[: colons[0]], word[colons[0] + 1:]
                    if f:
                        field = _unescape(f)
                    word = rest
                if word == "" and field is not None:
                    # field applies to a following group/phrase/range
                    toks.append(_Tok("FIELD", field=field))
                    continue
                tok = _Tok("TERM", word, field=field)
                i = self._suffix(s, i, tok)
                toks.append(tok)
        toks.append(_Tok("EOF"))
        return toks

    def _suffix(self, s: str, i: int, tok: _Tok, phrase: bool = False) -> int:
        """Consume ~fuzz/slop and ^boost suffixes (in either order)."""
        n = len(s)
        while i < n and s[i] in "~^":
            if s[i] == "~":
                i += 1
                m = re.match(r"\d+(\.\d+)?", s[i:])
                val = None
                if m:
                    val = m.group(0)
                    i += len(val)
                if phrase:
                    tok.slop = int(float(val)) if val else 0
                else:
                    tok.fuzzy = float(val) if val else 0.5
                    if tok.fuzzy >= 1.0:
                        # FuzzyTermEnum rejects minSim >= 1 (FuzzyQuery.cpp:
                        # IllegalArgument); the reference's parser test
                        # asserts a parse failure for term~1.1
                        raise QueryParserError(
                            f"fuzzy minimum similarity must be < 1: {tok.fuzzy}"
                        )
            else:
                i += 1
                m = re.match(r"\d+(\.\d+)?", s[i:])
                if not m:
                    raise QueryParserError("boost needs a number")
                tok.boost = float(m.group(0))
                i += len(m.group(0))
        return i

    @staticmethod
    def escape(s: str) -> str:
        """Backslash-escape every query-syntax character (reference
        QueryParser::escape, QueryParser.cpp:642-660) so arbitrary user
        text round-trips through parse() as literal terms."""
        return "".join(
            ("\\" + c) if c in _SPECIALS else c for c in s
        )

    # -- parser --------------------------------------------------------------

    def parse(self, s: str) -> Query | None:
        toks = self._lex(s)
        q, pos = self._parse_query(toks, 0, self.default_field)
        if toks[pos].kind != "EOF":
            raise QueryParserError(f"unexpected {toks[pos].kind} in {s!r}")
        return q

    def _parse_query(self, toks: list[_Tok], pos: int, field: str):
        clauses: list[tuple[int, int, Query]] = []  # (conj, mods, query)
        conj, mods = CONJ_NONE, MOD_NONE
        pending_field = field
        while True:
            t = toks[pos]
            if t.kind in ("EOF", "RPAREN"):
                break
            if t.kind == "AND":
                conj = CONJ_AND
                pos += 1
                continue
            if t.kind == "OR":
                conj = CONJ_OR
                pos += 1
                continue
            if t.kind == "PLUS":
                mods = MOD_REQ
                pos += 1
                continue
            if t.kind in ("MINUS", "NOT"):
                mods = MOD_NOT
                pos += 1
                continue
            if t.kind == "FIELD":
                pending_field = t.field
                pos += 1
                continue
            if t.kind == "LPAREN":
                sub, pos2 = self._parse_query(toks, pos + 1, pending_field)
                if toks[pos2].kind != "RPAREN":
                    raise QueryParserError("missing )")
                rp = toks[pos2]
                if sub is not None and rp.boost is not None:
                    sub.boost *= rp.boost
                pos = pos2 + 1
                if sub is not None:
                    clauses.append((conj, mods, sub))
                conj, mods = CONJ_NONE, MOD_NONE
                pending_field = field
                continue
            # leaf (q may be None when analysis eats it — e.g. a stopword;
            # kept in the clause list so a following AND still promotes the
            # preceding clause, as the reference's addClause does before its
            # null check)
            q = self._leaf_query(t, t.field or pending_field)
            pos += 1
            clauses.append((conj, mods, q))
            conj, mods = CONJ_NONE, MOD_NONE
            pending_field = field
        return self._assemble(clauses), pos

    def _assemble(self, clauses) -> Query | None:
        # addClause occur resolution: AND promotes the preceding KEPT clause
        # (null clauses were never added to the reference's vector)
        kept: list[list] = []  # [occur, query]
        for conj, mods, q in clauses:
            if conj == CONJ_AND and kept and kept[-1][0] != MUST_NOT:
                kept[-1][0] = MUST
            if self.default_operator == "AND" and conj == CONJ_OR and kept and kept[-1][0] == MUST:
                kept[-1][0] = SHOULD
            if q is None:
                continue
            if self.default_operator == "AND":
                if mods == MOD_NOT:
                    occur = MUST_NOT
                elif mods == MOD_REQ or conj != CONJ_OR:
                    occur = MUST
                else:
                    occur = SHOULD
            else:
                if mods == MOD_NOT:
                    occur = MUST_NOT
                elif mods == MOD_REQ or conj == CONJ_AND:
                    occur = MUST
                else:
                    occur = SHOULD
            kept.append([occur, q])
        if not kept:
            return None
        if len(kept) == 1 and kept[0][0] == SHOULD:
            return kept[0][1]
        bq = BooleanQuery()
        for occur, q in kept:
            bq.add(q, occur)
        return bq

    def _match_nothing(self, boost: float) -> Query:
        """Query over an unknown field: zero hits (the reference would scan
        an absent field's postings and find none). The predicate is the SQL
        string 'false' (df.filter accepts SQL text), not F.lit(False) — a
        Column literal would need a live SparkContext AT PARSE TIME and die
        in pyspark internals when none exists."""
        from clucene_spark.search.engine import ConstantScoreQuery

        return ConstantScoreQuery(boost=boost, predicate="false")

    def _leaf_query(self, t: _Tok, field: str) -> Query | None:
        boost = t.boost if t.boost is not None else 1.0
        explicit = field not in (None, self.default_field, "*")
        qfield: str | None = None
        if explicit:
            if field in self.indexed_fields:
                qfield = field
            elif field in self.keyword_fields:
                from clucene_spark.search.engine import KeywordQuery

                if t.kind == "TERM":
                    return KeywordQuery(boost=boost, field=field,
                                        value=_unescape(t.text))
                if t.kind == "QUOTED":  # keyword fields are untokenized
                    return KeywordQuery(boost=boost, field=field, value=t.text)
                if t.kind == "RANGE":
                    # the reference evaluates ranges over untokenized
                    # fields via the term dictionary; the untokenized
                    # field here IS a docs-table column, so the range is a
                    # ConstantScore column predicate (bounds untouched —
                    # keyword values are not case-folded)
                    from pyspark.sql import functions as F

                    from clucene_spark.search.engine import ConstantScoreQuery

                    col = F.col(field)
                    preds = []
                    if t.lower is not None:
                        preds.append(
                            col >= t.lower if t.inclusive else col > t.lower
                        )
                    if t.upper is not None:
                        preds.append(
                            col <= t.upper if t.inclusive else col < t.upper
                        )
                    pred = preds[0] if preds else col.isNotNull()
                    for p in preds[1:]:
                        pred = pred & p
                    return ConstantScoreQuery(boost=boost, predicate=pred)
                return self._match_nothing(boost)
            else:
                return self._match_nothing(boost)
        if t.kind == "RANGE":
            fold = str.lower if self.lowercase_expanded_terms else str
            # 'is not None': an explicit empty-string bound ('[\"\" TO b]')
            # is a real bound, only the '*' sentinel (lexed to None) is
            # unbounded — truthiness would conflate the two
            lo = fold(t.lower) if t.lower is not None else None
            hi = fold(t.upper) if t.upper is not None else None
            dated = self._maybe_date_bounds(field or self.default_field,
                                            lo, hi, t.inclusive)
            if dated is not None:
                lo, hi = dated
            cls = RangeQuery if self.use_old_range_query else ConstantScoreRangeQuery
            return cls(boost=boost, lower=lo, upper=hi,
                       inclusive=t.inclusive, field=qfield)
        if t.kind == "QUOTED":
            terms = self.analyze(t.text)
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(boost=boost, term=terms[0], field=qfield)
            return PhraseQuery(boost=boost, terms=terms, slop=t.slop, field=qfield)
        if t.kind == "TERM":
            word = t.text  # RAW — escapes still present; structure first
            fold = str.lower if self.lowercase_expanded_terms else str
            if word == "*" and field == "*":
                # getWildcardQuery: MatchAllDocs ONLY for '*:*'
                # (QueryParser.cpp:505-509); a bare or fielded '*' falls
                # through to the leading-wildcard error like the reference
                return MatchAllQuery(boost=boost)
            if t.fuzzy is not None:
                # an explicit '~0' is a valid minSim of 0.0 (the lexer
                # already defaulted a bare '~' to 0.5) — a falsy-zero
                # check here would silently replace it with the default
                return FuzzyQuery(
                    boost=boost, term=fold(_unescape(word)),
                    min_similarity=t.fuzzy, field=qfield,
                )
            wild = _unescaped_positions(word, "*?")
            if wild:
                if wild[0] == 0 and not self.allow_leading_wildcard:
                    # getWildcardQuery: '*' or '?' not allowed as first
                    # character unless setAllowLeadingWildcard(true)
                    raise QueryParserError(
                        f"leading wildcard not allowed: {word!r}"
                    )
                if (len(wild) == 1 and wild[0] == len(word) - 1
                        and word[-1] == "*"):
                    return PrefixQuery(boost=boost,
                                       prefix=fold(_unescape(word[:-1])),
                                       field=qfield)
                return WildcardQuery(boost=boost, pattern=fold(_unescape(word)),
                                     field=qfield)
            terms = self.analyze(_unescape(word))
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(boost=boost, term=terms[0], field=qfield)
            return PhraseQuery(boost=boost, terms=terms, slop=0, field=qfield)
        raise QueryParserError(f"unexpected leaf {t.kind}")


def parse(s: str, default_field: str = "text", **kw) -> Query | None:
    return QueryParser(default_field, **kw).parse(s)


class MultiFieldQueryParser(QueryParser):
    """QueryParser whose UNFIELDED leaves expand per field — the
    reference's MultiFieldQueryParser instance form (reference
    queryParser/MultiFieldQueryParser.cpp:32-113: getFieldQuery /
    getFuzzyQuery / getPrefixQuery / getWildcardQuery / getRangeQuery
    with field==NULL build one sub-query per member field and combine
    them SHOULD with coord DISABLED, getBooleanQuery(clauses, true)).
    So `one two` parses to `(b:one t:one) (b:two t:two)` — each TERM
    is a cross-field group — not one tree per field; under AND mode
    `+one +two` requires both terms in ANY field rather than both in
    the SAME field. Explicit `field:term` clauses bypass the expansion
    (getFieldQuery's else branch). The per-field boost map applies only
    to term/phrase leaves, exactly where the reference consults it
    (MultiFieldQueryParser.cpp:38-46 — getFieldQuery only); the `^x`
    suffix boosts the GROUP, as the grammar boosts whatever the
    expansion returned."""

    def __init__(self, fields: list[str], analyzer=None,
                 default_operator: str = "OR", boosts: dict | None = None,
                 keyword_fields=None):
        super().__init__(
            default_field=None,
            analyzer=analyzer,
            default_operator=default_operator,
            indexed_fields=set(fields) - set(keyword_fields or ()),
            keyword_fields=keyword_fields,
        )
        self.fields = list(fields)
        self.boosts = dict(boosts or {})

    def _leaf_query(self, t: _Tok, field: str | None) -> Query | None:
        if field is not None:
            return super()._leaf_query(t, field)
        if t.kind == "TERM" and t.text == "*":
            return super()._leaf_query(t, field)  # bare * / *:* — MatchAll once
        group = BooleanQuery(coord_disabled=True)
        for f in self.fields:
            q = super()._leaf_query(t, f)
            if q is None:  # analysis ate the token on this field (stopword)
                continue
            from clucene_spark.search.engine import (MultiPhraseQuery,
                                                     PhraseQuery, TermQuery)

            if isinstance(q, (TermQuery, PhraseQuery, MultiPhraseQuery)):
                q.boost = self.boosts.get(f, 1.0)
            else:
                q.boost = 1.0
            group.add(q, SHOULD)
        if not group.clauses:
            return None  # stopword on every field — clauses.size()==0 -> NULL
        group.boost = t.boost if t.boost is not None else 1.0
        return group

    @staticmethod
    def _bind(q: Query, f: str) -> None:
        """Pin unfielded leaves to field f (used by the static flagged
        form, which parses the whole string once per field)."""
        if isinstance(q, BooleanQuery):
            for c in q.clauses:
                MultiFieldQueryParser._bind(c.query, f)
        elif hasattr(q, "field") and getattr(q, "field") is None:
            q.field = f

    @classmethod
    def parse_flags(cls, s: str, fields: list[str], flags: list[str],
                    analyzer=None, keyword_fields=None) -> Query | None:
        """The STATIC parse(query, fields[], flags[]) form (reference
        MultiFieldQueryParser.cpp:139-169): the whole string is parsed
        once per field and each per-field tree joins the top BooleanQuery
        with that field's occur flag (MUST/SHOULD/MUST_NOT)."""
        bq = BooleanQuery()
        for f, occur in zip(fields, flags):
            q = QueryParser(
                default_field=f,
                analyzer=analyzer,
                # keyword fields route to KeywordQuery, never analyzed
                # TermQuery — same subtraction the instance ctor does
                indexed_fields=set(fields) - set(keyword_fields or ()),
                keyword_fields=keyword_fields,
            ).parse(s)
            if q is None:
                continue
            cls._bind(q, f)
            bq.add(q, occur)
        if not bq.clauses:
            return None
        return bq
