"""Snowball stemmers: french / dutch / spanish / danish / norwegian /
swedish / italian / portuguese / finnish (ISO-8859-1) + russian
(KOI8-R), May-2005.

Algorithm ports matching the reference's generated stemmers at
`src/contribs-lib/CLucene/snowball/src_c/stem_ISO_8859_1_*.c`
(Snowball "May 2005" revision per snowball.version). Suffix
tables were transcribed from the generated among-tables; control flow
follows the generated routines (NOT the current published algorithm pages
— the 2005 revision differs, e.g. French runs plain
`standard OR i_verb OR verb` with no amment/emment re-entry). Semantics
replicated from the C:

* among = longest suffix match, then its action; a failed region
  condition fails the whole routine (no backtracking to shorter).
* verb/residual routines run under `setlimit tomark pV`: the match AND
  any in-scope context test must lie inside RV.
* preludes mark vowels sequentially over the mutating buffer (a just-
  uppercased Y/I/U no longer counts as a vowel for the next position).

Fuzz-verified against the compiled reference stemmers on randomized
suffix-rich vocabularies (tests/test_snowball_langs.py carries goldens
produced by running the reference C through a harness).

Pure Python string functions — called inside the analyzer's Arrow-batched
UDFs, never per-row through a scalar F.udf.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _r1_r2(w: str, vowels: frozenset) -> tuple[int, int]:
    """Standard R1/R2: region after the first non-vowel following a vowel
    (then again for R2, continuing from R1's unadjusted position)."""
    n = len(w)

    def _after(start: int) -> int:
        for i in range(start, n - 1):
            if w[i] in vowels and w[i + 1] not in vowels:
                return i + 2
        return n

    r1 = _after(0)
    r2 = _after(r1)
    return r1, r2


def _longest_in_rv(w: str, table, rv: int):
    """among under `setlimit tomark pV`: longest suffix of w that starts
    at or after rv. Returns (suffix, payload) or (None, None)."""
    best = None
    payload = None
    for entry in table:
        suf = entry[0] if isinstance(entry, tuple) else entry
        if (len(w) - len(suf)) >= rv and w.endswith(suf):
            if best is None or len(suf) > len(best):
                best = suf
                payload = entry[1] if isinstance(entry, tuple) else None
    return best, payload


# ---------------------------------------------------------------------------
# spanish
# ---------------------------------------------------------------------------

_ES_V = frozenset("aeiouáéíóúü")

_ES_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
            "la", "le", "lo", "me", "se")
# (verb ending before the pronoun, replacement or None=delete, needs u)
_ES_PRE = (("iéndo", "iendo", False), ("ándo", "ando", False),
           ("yendo", None, True), ("iendo", None, False),
           ("ando", None, False), ("ár", "ar", False), ("ér", "er", False),
           ("ír", "ir", False), ("ar", None, False), ("er", None, False),
           ("ir", None, False))

_ES_STEP1 = []
for _s in ("amientos imientos amiento imiento anzas anza icos icas ico ica "
           "ismos ismo ables ibles able ible istas ista osos osas oso osa").split():
    _ES_STEP1.append((_s, "del_r2"))
for _s in "adoras adores aciones ancias adora ación ante antes ancia ador".split():
    _ES_STEP1.append((_s, "del_r2_ic"))
_ES_STEP1 += [("logías", "log"), ("logía", "log"),
              ("uciones", "u"), ("ución", "u"),
              ("encias", "ente"), ("encia", "ente"),
              ("amente", "amente"), ("mente", "mente"),
              ("idades", "idad"), ("idad", "idad"),
              ("ivas", "iv"), ("ivos", "iv"), ("iva", "iv"), ("ivo", "iv")]
_ES_STEP1.sort(key=lambda p: -len(p[0]))

_ES_Y = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
         "ya", "ye", "yo", "yó")

# a_8 of stem_ISO_8859_1_spanish.c — case 1 entries may absorb 'gu''s u
_ES_VERB_E = frozenset(("en", "es", "éis", "emos"))
_ES_VERB = tuple("""aba ada ida ara iera ía aría ería iría ad ed id ase iese
    aste iste an aban aran ieran ían arían erían irían en asen iesen aron
    ieron arán erán irán ado ido ando iendo ar er ir as abas adas idas aras
    ieras ías arías erías irías es ases ieses abais arais ierais íais
    aríais eríais iríais aseis ieseis asteis isteis áis éis aréis eréis
    iréis ados idos amos ábamos áramos iéramos íamos aríamos eríamos
    iríamos emos aremos eremos iremos ásemos iésemos imos arás erás irás ís
    ará erá irá aré eré iré ió""".split())

_ES_RESID = ("os", "a", "o", "á", "í", "ó", "e", "é")
_ES_ACCENT = str.maketrans("áéíóú", "aeiou")


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_V:
        for i in range(2, n):
            if w[i] in _ES_V:
                return i + 1
        return n
    if w[0] in _ES_V and w[1] in _ES_V:
        for i in range(2, n):
            if w[i] not in _ES_V:
                return i + 1
        return n
    return 3


def spanish_stem(word: str) -> str:
    w = word
    rv = _es_rv(w)
    r1, r2 = _r1_r2(w, _ES_V)

    # ---- step 0: attached pronoun
    for p in _ES_PRON:
        if w.endswith(p):
            base = len(w) - len(p)
            for pre, repl, needs_u in _ES_PRE:
                if w.endswith(pre, 0, base) and (base - len(pre)) >= rv:
                    if needs_u and not w.endswith("u", 0, base - len(pre)):
                        continue
                    if repl is None:
                        w = w[:base]
                    else:
                        w = w[: base - len(pre)] + repl
                    break
            break

    # ---- step 1 OR step 2a OR step 2b (or-chain like the C main)
    step1_ok = False
    for suf, action in _ES_STEP1:
        if not w.endswith(suf):
            continue
        s = len(w) - len(suf)
        if action == "del_r2":
            if s >= r2:
                w = w[:s]
                step1_ok = True
        elif action == "del_r2_ic":
            if s >= r2:
                w = w[:s]
                step1_ok = True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif action in ("log", "u", "ente"):
            if s >= r2:
                w = w[:s] + action
                step1_ok = True
        elif action == "amente":
            if s >= r1:
                w = w[:s]
                step1_ok = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for p2 in ("os", "ic", "ad"):
                        if w.endswith(p2) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif action == "mente":
            if s >= r2:
                w = w[:s]
                step1_ok = True
                for p2 in ("ante", "able", "ible"):
                    if w.endswith(p2) and len(w) - len(p2) >= r2:
                        w = w[: -len(p2)]
                        break
        elif action == "idad":
            if s >= r2:
                w = w[:s]
                step1_ok = True
                for p2 in ("abil", "ic", "iv"):
                    if w.endswith(p2) and len(w) - len(p2) >= r2:
                        w = w[: -len(p2)]
                        break
        elif action == "iv":
            if s >= r2:
                w = w[:s]
                step1_ok = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        break  # among: longest match only, no backtracking

    if not step1_ok:
        # step 2a: y-verb suffixes (match confined to RV; the preceding u
        # is tested after the limit is lifted, so it may sit before RV)
        suf, _ = _longest_in_rv(w, _ES_Y, rv)
        done2a = suf is not None and w.endswith("u", 0, len(w) - len(suf))
        if done2a:
            w = w[: -len(suf)]
        else:
            # step 2b: other verb suffixes (match confined to RV)
            suf, _ = _longest_in_rv(w, _ES_VERB, rv)
            if suf is not None:
                s = len(w) - len(suf)
                if suf in _ES_VERB_E and w.endswith("gu", 0, s):
                    w = w[: s - 1]  # drop the u of a preceding gu too
                else:
                    w = w[:s]

    # ---- step 3: residual (no limit on the match; RV per case)
    best = None
    for suf in _ES_RESID:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None and len(w) - len(best) >= rv:
        w = w[: -len(best)]
        if best in ("e", "é") and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]

    return w.translate(_ES_ACCENT)


# ---------------------------------------------------------------------------
# dutch
# ---------------------------------------------------------------------------

_NL_V = frozenset("aeiouyè")
_NL_FOLD = str.maketrans("äáëéïíöóüú", "aaeeiioouu")


def _nl_prelude(w: str) -> str:
    w = w.translate(_NL_FOLD)
    out = []
    n = len(w)
    for i, c in enumerate(w):
        prev_v = i > 0 and out[i - 1] in _NL_V  # sequential: marked chars
        if c == "y" and (i == 0 or prev_v):     # no longer count as vowels
            out.append("Y")
        elif c == "i" and prev_v and i < n - 1 and w[i + 1] in _NL_V:
            out.append("I")
        else:
            out.append(c)
    return "".join(out)


def _nl_undouble(w: str) -> str:
    for d in ("kk", "dd", "tt"):
        if w.endswith(d):
            return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    w = _nl_prelude(word)
    r1, r2 = _r1_r2(w, _NL_V)
    if len(w) >= 3:
        r1 = max(r1, 3)  # region before R1 must hold >= 3 letters

    def valid_s_end(upto: int) -> bool:
        return upto > 0 and w[upto - 1] not in _NL_V and w[upto - 1] != "j"

    def valid_en_end(upto: int) -> bool:
        return (upto > 0 and w[upto - 1] not in _NL_V
                and not w.endswith("gem", 0, upto))

    # step 1 (among: longest of heden/ene/en/se/s, no backtracking)
    if w.endswith("heden"):
        if len(w) - 5 >= r1:
            w = w[:-5] + "heid"
    else:
        matched = False
        for suf in ("ene", "en"):
            if w.endswith(suf):
                s = len(w) - len(suf)
                if s >= r1 and valid_en_end(s):
                    w = _nl_undouble(w[:s])
                matched = True
                break
        if not matched:
            for suf in ("se", "s"):
                if w.endswith(suf):
                    s = len(w) - len(suf)
                    if s >= r1 and valid_s_end(s):
                        w = w[:s]
                    break

    # step 2: final e after a non-vowel
    e_found = False
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 and w[-2] not in _NL_V:
        e_found = True
        w = _nl_undouble(w[:-1])

    # step 3a: heid
    if w.endswith("heid") and len(w) - 4 >= r2 and not w.endswith("cheid"):
        w = w[:-4]
        if w.endswith("en"):
            s = len(w) - 2
            if s >= r1 and valid_en_end(s):
                w = _nl_undouble(w[:s])

    # step 3b: d-suffixes (among: longest of end/ing/lijk/baar/bar/ig)
    for suf, code in (("lijk", 3), ("baar", 4), ("end", 1), ("ing", 1),
                      ("bar", 5), ("ig", 2)):
        if not w.endswith(suf):
            continue
        s = len(w) - len(suf)
        if code == 1:
            if s >= r2:
                w = w[:s]
                if w.endswith("ig") and len(w) - 2 >= r2 and not w.endswith("eig"):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif code == 2:
            if s >= r2 and not w.endswith("eig"):
                w = w[:s]
        elif code == 3:
            if s >= r2:
                w = w[:s]
                # repeat step 2
                if (w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2
                        and w[-2] not in _NL_V):
                    w = _nl_undouble(w[:-1])
        elif code == 4:
            if s >= r2:
                w = w[:s]
        elif code == 5:
            if s >= r2 and e_found:
                w = w[:s]
        break

    # step 4: undouble vowel in C-VV-D endings
    if (len(w) >= 4 and w[-1] not in _NL_V and w[-1] != "I"
            and w[-2] == w[-3] and w[-2] in "aeou"
            and w[-4] not in _NL_V):
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# ---------------------------------------------------------------------------
# french
# ---------------------------------------------------------------------------

_FR_V = frozenset("aeiouyâàëéêèïîôûù")
_FR_KEEP_S = frozenset("aiouès")  # g_keep_with_s


def _fr_prelude(w: str) -> str:
    """Scanner replica of the generated r_prelude: at each position try
    (vowel + ['u'|'i' followed by vowel -> upper, or 'y' -> 'Y']), else
    ('y' followed by vowel -> 'Y'), else ('q' ['u'] -> 'U'); on a match
    rescan from the same position (the marked char, now uppercase, is no
    longer in the vowel grouping). Note the asymmetry the published
    description hides: a y AFTER a vowel is marked unconditionally, u/i
    need a vowel on both sides."""
    buf = list(w)
    n = len(buf)
    i = 0
    while i < n:
        c = buf[i]
        if c in _FR_V and i + 1 < n:
            nxt = buf[i + 1]
            if nxt == "u" and i + 2 < n and buf[i + 2] in _FR_V:
                buf[i + 1] = "U"
                continue
            if nxt == "i" and i + 2 < n and buf[i + 2] in _FR_V:
                buf[i + 1] = "I"
                continue
            if nxt == "y":
                buf[i + 1] = "Y"
                continue
        if c == "y" and i + 1 < n and buf[i + 1] in _FR_V:
            buf[i] = "Y"
            continue
        if c == "q" and i + 1 < n and buf[i + 1] == "u":
            buf[i + 1] = "U"
            continue
        i += 1
    return "".join(buf)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and w[0] in _FR_V and w[1] in _FR_V:
        return 3
    for i in range(1, n):
        if w[i] in _FR_V:
            return i + 1
    return n


_FR_STEP1 = sorted(
    [
        ("issements", 12), ("issement", 12), ("atrices", 2), ("atrice", 2),
        ("iqUes", 1), ("iqUe", 1), ("logies", 3), ("logie", 3),
        ("usions", 4), ("usion", 4), ("utions", 4), ("ution", 4),
        ("ations", 2), ("ation", 2), ("ateurs", 2), ("ateur", 2),
        ("ances", 1), ("ance", 1), ("ences", 5), ("ence", 5),
        ("ables", 1), ("able", 1), ("ismes", 1), ("isme", 1),
        ("euses", 11), ("euse", 11), ("istes", 1), ("iste", 1),
        ("ives", 8), ("ive", 8), ("ifs", 8), ("if", 8),
        ("ements", 6), ("ement", 6), ("amment", 13), ("emment", 14),
        ("ments", 15), ("ment", 15),
        ("ités", 7), ("ité", 7), ("eaux", 9), ("aux", 10), ("eux", 1),
    ],
    key=lambda p: -len(p[0]),
)

# a_4: all delete-if-preceded-by-non-vowel (match + test inside RV)
_FR_I_VERB = tuple("""issaIent iraIent issantes issement issions issante
    issants irions issais issait issant issent issiez issons irais irait
    irent isses issez îmes îtes irai iras irez iriez irons iront isse ira
    ies ir is it ie ît i""".split())

# a_5: 1=ions(R2), 2=delete in RV, 3=delete in RV (+ absorb preceding e)
_FR_STEP2B = (
    [("ions", 1)]
    + [(s, 2) for s in """era erai er eras ées erais erions erons ez és
         erait eraIent èrent eront eriez erez iez ée é""".split()]
    + [(s, 3) for s in """a asse ante ai as âmes asses antes âtes ais
         assions ants ait ant aIent assent ât assiez""".split()]
)

_FR_RESID = (("Ière", 2), ("ière", 2), ("Ier", 2), ("ier", 2),
             ("ion", 1), ("ë", 4), ("e", 3))


def french_stem(word: str) -> str:
    w = _fr_prelude(word)
    rv = _fr_rv(w)
    r1, r2 = _r1_r2(w, _FR_V)

    def _standard(w: str):
        for suf, code in _FR_STEP1:
            if not w.endswith(suf):
                continue
            s = len(w) - len(suf)
            if code == 1:
                if s >= r2:
                    return w[:s], True
            elif code == 2:
                if s >= r2:
                    w = w[:s]
                    if w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
                    return w, True
            elif code == 3:
                if s >= r2:
                    return w[:s] + "log", True
            elif code == 4:
                if s >= r2:
                    return w[:s] + "u", True
            elif code == 5:
                if s >= r2:
                    return w[:s] + "ent", True
            elif code == 6:
                if s >= rv:
                    w = w[:s]
                    if w.endswith("iv") and len(w) - 2 >= r2:
                        w = w[:-2]
                        if w.endswith("at") and len(w) - 2 >= r2:
                            w = w[:-2]
                    elif w.endswith("eus"):
                        if len(w) - 3 >= r2:
                            w = w[:-3]
                        elif len(w) - 3 >= r1:
                            w = w[:-3] + "eux"
                    elif w.endswith("abl") and len(w) - 3 >= r2:
                        w = w[:-3]
                    elif w.endswith("iqU") and len(w) - 3 >= r2:
                        w = w[:-3]
                    elif w.endswith("ièr") and len(w) - 3 >= rv:
                        w = w[:-3] + "i"
                    elif w.endswith("Ièr") and len(w) - 3 >= rv:
                        w = w[:-3] + "i"
                    return w, True
            elif code == 7:
                if s >= r2:
                    w = w[:s]
                    if w.endswith("abil"):
                        if len(w) - 4 >= r2:
                            w = w[:-4]
                        else:
                            w = w[:-4] + "abl"
                    elif w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
                    elif w.endswith("iv") and len(w) - 2 >= r2:
                        w = w[:-2]
                    return w, True
            elif code == 8:
                if s >= r2:
                    w = w[:s]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                        if w.endswith("ic"):
                            if len(w) - 2 >= r2:
                                w = w[:-2]
                            else:
                                w = w[:-2] + "iqU"
                    return w, True
            elif code == 9:
                return w[:s] + "eau", True
            elif code == 10:
                if s >= r1:
                    return w[:s] + "al", True
            elif code == 11:
                if s >= r2:
                    return w[:s], True
                if s >= r1:
                    return w[:s] + "eux", True
            elif code == 12:
                if s >= r1 and s > 0 and w[s - 1] not in _FR_V:
                    return w[:s], True
            elif code == 13:
                # snowball `fail`: commit the rewrite but report failure,
                # so the verb steps continue on the modified word
                if s >= rv:
                    return w[:s] + "ant", False
            elif code == 14:
                if s >= rv:
                    return w[:s] + "ent", False
            elif code == 15:
                if s - 1 >= rv and s > 0 and w[s - 1] in _FR_V:
                    return w[:s], False
            break  # among: longest match only
        return w, False

    def _i_verb(w: str):
        suf, _ = _longest_in_rv(w, _FR_I_VERB, rv)
        if suf is not None:
            s = len(w) - len(suf)
            if s - 1 >= rv and s > 0 and w[s - 1] not in _FR_V:
                return w[:s], True
        return w, False

    def _verb(w: str):
        suf, code = _longest_in_rv(w, _FR_STEP2B, rv)
        if suf is None:
            return w, False
        s = len(w) - len(suf)
        if code == 1:
            if s >= r2:
                return w[:s], True
            return w, False
        w = w[:s]
        if code == 3 and w.endswith("e") and len(w) - 1 >= rv:
            w = w[:-1]
        return w, True

    def _residual(w: str):
        # try: drop a final s not preceded by {a,i,o,u,è,s} — committed
        # even if the following among fails (snowball try-before-among)
        if w.endswith("s") and len(w) >= 2 and w[-2] not in _FR_KEEP_S:
            w = w[:-1]
        suf, code = _longest_in_rv(w, _FR_RESID, rv)
        if suf is None:
            return w
        s = len(w) - len(suf)
        if code == 1:
            if s >= r2 and s - 1 >= rv and s > 0 and w[s - 1] in "st":
                w = w[:s]
        elif code == 2:
            w = w[:s] + "i"
        elif code == 3:
            w = w[:s]
        elif code == 4:
            if s - 2 >= rv and w.endswith("gu", 0, s):
                w = w[:s]
        return w

    # main: (standard OR i_verb OR verb) and try(Y->i | ç->c), else residual
    # — a `fail`-committed ment-rewrite threads its mutation into the verb
    # steps, and if those also fail, into residual_suffix
    w, ok = _standard(w)
    if not ok:
        w, ok = _i_verb(w)
    if not ok:
        w, ok = _verb(w)
    if ok:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        w = _residual(w)

    # un_double
    for suf in ("eill", "ell", "enn", "onn", "ett"):
        if w.endswith(suf):
            w = w[:-1]
            break

    # un_accent: >=1 final non-vowels immediately preceded by é/è -> e
    i = len(w) - 1
    seen_cons = False
    while i >= 0 and w[i] not in _FR_V:
        seen_cons = True
        i -= 1
    if seen_cons and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


SNOWBALL_STEMMERS = {
    "french": french_stem,
    "dutch": dutch_stem,
    "spanish": spanish_stem,
}


# ---------------------------------------------------------------------------
# danish / norwegian / swedish (shared Scandinavian template:
# R1 with a 3-letter floor, suffix among under `setlimit` R1, a
# consonant-pair shortening, and an other-suffix pass)
# ---------------------------------------------------------------------------

_DA_V = frozenset("aeiouyåæø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_NO_V = frozenset("aeiouyåæø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_SV_V = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")


def _scand_r1(w: str, vowels: frozenset) -> int:
    """p1 = after the first non-vowel following the first vowel, floored
    at position 3 (setmark x = hop 3); no region -> end of word."""
    n = len(w)
    r1 = n
    for i in range(n - 1):
        if w[i] in vowels and w[i + 1] not in vowels:
            r1 = i + 2
            break
    if r1 < 3:
        r1 = 3 if n >= 3 else n
    return min(r1, n)


def _scand_main(w: str, r1: int, table, s_codes, s_pred) -> str:
    """Longest suffix within R1 from `table`; code 1 deletes, code 's'
    deletes when s_pred(preceding char position) holds (the predicate is
    checked after the limit lifts, so it may look before R1), code tuples
    replace."""
    suf, code = _longest_in_rv(w, table, r1)
    if suf is None:
        return w
    s = len(w) - len(suf)
    if code == 1:
        return w[:s]
    if code == "s":
        if s_pred(w, s):
            return w[:s]
        return w
    return w[:s] + code  # replacement string


def _scand_consonant_pair(w: str, r1: int, pairs) -> str:
    """If the word ends with one of `pairs` matched inside R1, drop the
    final letter."""
    suf, _ = _longest_in_rv(w, pairs, r1)
    if suf is not None:
        return w[:-1]
    return w


_DA_MAIN = tuple((s, 1) for s in """hed ethed ered e erede ende erende ene
    erne ere en heden eren er heder erer heds es endes erendes enes ernes
    eres ens hedens erens ers ets erets et eret""".split()) + (("s", "s"),)
_DA_OTHER = tuple((s, 1) for s in ("ig", "lig", "elig", "els")) + (("løst", "løs"),)


def danish_stem(word: str) -> str:
    """Reference stem_ISO_8859_1_danish.c: main_suffix -> consonant_pair
    -> other_suffix (igst pre-strip + R1 among + consonant_pair rerun) ->
    undouble (double consonant ending in R1 loses one)."""
    w = word
    r1 = _scand_r1(w, _DA_V)
    w = _scand_main(w, r1, _DA_MAIN, None,
                    lambda w, s: s > 0 and w[s - 1] in _DA_S_END)
    w = _scand_consonant_pair(w, r1, ("gd", "dt", "gt", "kt"))
    # other_suffix: unconditional igst -> ig, then R1 among
    if w.endswith("igst"):
        w = w[:-2]
    suf, code = _longest_in_rv(w, _DA_OTHER, r1)
    if suf is not None:
        if code == 1:
            w = w[: -len(suf)]
            w = _scand_consonant_pair(w, r1, ("gd", "dt", "gt", "kt"))
        else:
            w = w[: -len(suf)] + code
    # undouble: final char inside R1, non-vowel, equal to its predecessor
    if (len(w) >= 2 and len(w) - 1 >= r1 and w[-1] not in _DA_V
            and w[-2] == w[-1]):
        w = w[:-1]
    return w


_NO_MAIN = tuple((s, 1) for s in """a e ede ande ende ane ene hetene en
    heten ar er heter as es edes endes enes hetenes ens hetens ers ets et
    het ast""".split()) + (("s", "s"), ("erte", "er"), ("ert", "er"))
_NO_OTHER = tuple((s, 1) for s in """leg eleg ig eig lig elig els lov elov
    slov hetslov""".split())


def _no_s_pred(w: str, s: int) -> bool:
    # g_s_ending char, or 'k' not preceded by a vowel
    if s > 0 and w[s - 1] in _NO_S_END:
        return True
    return s > 0 and w[s - 1] == "k" and (s < 2 or w[s - 2] not in _NO_V)


def norwegian_stem(word: str) -> str:
    """Reference stem_ISO_8859_1_norwegian.c: main_suffix (incl.
    erte/ert -> er and the k-s-ending rule) -> consonant_pair ->
    other_suffix."""
    w = word
    r1 = _scand_r1(w, _NO_V)
    w = _scand_main(w, r1, _NO_MAIN, None, _no_s_pred)
    w = _scand_consonant_pair(w, r1, ("dt", "vt"))
    suf, _ = _longest_in_rv(w, _NO_OTHER, r1)
    if suf is not None:
        w = w[: -len(suf)]
    return w


_SV_MAIN = tuple((s, 1) for s in """a arna erna heterna orna ad e ade ande
    arne are aste en anden aren heten ern ar er heter or as arnas ernas
    ornas es ades andes ens arens hetens erns at andet het ast""".split()) \
    + (("s", "s"),)
_SV_OTHER = (("ig", 1), ("lig", 1), ("els", 1), ("löst", "lös"),
             ("fullt", "full"))


def swedish_stem(word: str) -> str:
    """Reference stem_ISO_8859_1_swedish.c: main_suffix -> consonant_pair
    -> other_suffix (löst->lös, fullt->full)."""
    w = word
    r1 = _scand_r1(w, _SV_V)
    w = _scand_main(w, r1, _SV_MAIN, None,
                    lambda w, s: s > 0 and w[s - 1] in _SV_S_END)
    w = _scand_consonant_pair(w, r1, ("dd", "gd", "nn", "dt", "gt", "kt", "tt"))
    suf, code = _longest_in_rv(w, _SV_OTHER, r1)
    if suf is not None:
        if code == 1:
            w = w[: -len(suf)]
        else:
            w = w[: -len(suf)] + code
    return w


SNOWBALL_STEMMERS.update(
    danish=danish_stem, norwegian=norwegian_stem, swedish=swedish_stem
)


# ---------------------------------------------------------------------------
# italian
# ---------------------------------------------------------------------------

_IT_V = frozenset("aeiouàèìòù")
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRON = tuple(sorted("""la cela gliela mela tela vela le cele gliele mele
    tele vele ne cene gliene mene sene tene vene ci li celi glieli meli teli
    veli gli mi si ti vi lo celo glielo melo telo velo""".split(),
    key=len, reverse=True))

_IT_STEP1 = sorted(
    [(s, 1) for s in """ica osa ista anza ice atrice iche abile ibile ose
        ante mente iste anze ici atrici ichi abili ibili ismi osi anti isti
        ico ismo oso istà istè istì""".split()]
    + [(s, 2) for s in ("azione", "azioni", "atore", "atori")]
    + [("logia", 3), ("logie", 3), ("usione", 4), ("uzione", 4),
       ("usioni", 4), ("uzioni", 4), ("enza", 5), ("enze", 5),
       ("amento", 6), ("amenti", 6), ("imento", 6), ("imenti", 6),
       ("amente", 7), ("ità", 8),
       ("iva", 9), ("ive", 9), ("ivi", 9), ("ivo", 9)],
    key=lambda p: -len(p[0]),
)

_IT_VERB = tuple("""isca enda ata ita uta ava eva iva erebbe irebbe isce
    ende are ere ire asse ate avate evate ivate ete erete irete ite ereste
    ireste ute erai irai isci endi erei irei assi ati iti eresti iresti uti
    avi evi ivi isco ando endo Yamo iamo avamo evamo ivamo eremo iremo
    assimo ammo emmo eremmo iremmo immo ano iscano avano evano ivano
    eranno iranno ono iscono arono erono irono erebbero irebbero assero
    essero issero ato ito uto avo evo ivo ar ir erà irà erò irò""".split())


def _it_prelude(w: str) -> str:
    """Pass 1: acute accents -> grave, 'qu' -> 'qU'. Pass 2 (scanner like
    the french prelude): u/i between vowels -> upper."""
    w = w.translate(_IT_ACUTE).replace("qu", "qU")
    buf = list(w)
    n = len(buf)
    i = 0
    while i < n:
        if buf[i] in _IT_V and i + 1 < n:
            nxt = buf[i + 1]
            if nxt in "ui" and i + 2 < n and buf[i + 2] in _IT_V:
                buf[i + 1] = nxt.upper()
                continue
        i += 1
    return "".join(buf)


def _rv_es_like(w: str, vowels: frozenset) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        for i in range(2, n):
            if w[i] in vowels:
                return i + 1
        return n
    if w[0] in vowels and w[1] in vowels:
        for i in range(2, n):
            if w[i] not in vowels:
                return i + 1
        return n
    return 3


def italian_stem(word: str) -> str:
    """Reference stem_ISO_8859_1_italian.c: prelude (acute->grave, qu->qU,
    u/i marking) -> attached_pronoun -> (standard_suffix OR verb_suffix)
    -> vowel_suffix -> postlude."""
    w = _it_prelude(word)
    rv = _rv_es_like(w, _IT_V)
    r1, r2 = _r1_r2(w, _IT_V)

    # attached pronoun: pronoun directly preceded by ando/endo (delete) or
    # ar/er/ir (pronoun -> 'e'), the verb ending starting in RV
    for p in _IT_PRON:
        if w.endswith(p):
            base = len(w) - len(p)
            for pre, repl in (("ando", None), ("endo", None),
                              ("ar", "e"), ("er", "e"), ("ir", "e")):
                if w.endswith(pre, 0, base) and (base - len(pre)) >= rv:
                    w = w[:base] + (repl or "")
                    break
            break

    ok = False
    for suf, code in _IT_STEP1:
        if not w.endswith(suf):
            continue
        s = len(w) - len(suf)
        if code == 1:
            if s >= r2:
                w = w[:s]
                ok = True
        elif code == 2:
            if s >= r2:
                w = w[:s]
                ok = True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif code == 3:
            if s >= r2:
                w = w[:s] + "log"
                ok = True
        elif code == 4:
            if s >= r2:
                w = w[:s] + "u"
                ok = True
        elif code == 5:
            if s >= r2:
                w = w[:s] + "ente"
                ok = True
        elif code == 6:
            if s >= rv:
                w = w[:s]
                ok = True
        elif code == 7:
            if s >= r1:
                w = w[:s]
                ok = True
                suf2, c2 = _longest_in_rv(
                    w, (("ic", -1), ("abil", -1), ("os", -1), ("iv", 1)),
                    0)
                if suf2 is not None and len(w) - len(suf2) >= r2:
                    w = w[: -len(suf2)]
                    if c2 == 1 and w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
        elif code == 8:
            if s >= r2:
                w = w[:s]
                ok = True
                for p2 in ("abil", "ic", "iv"):
                    if w.endswith(p2) and len(w) - len(p2) >= r2:
                        w = w[: -len(p2)]
                        break
        elif code == 9:
            if s >= r2:
                w = w[:s]
                ok = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]
        break

    if not ok:
        suf, _ = _longest_in_rv(w, _IT_VERB, rv)
        if suf is not None:
            w = w[: -len(suf)]

    # vowel_suffix: final a/e/i/o/à/è/ì/ò in RV, then a following final i
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # final h after c/g — the RV test sits on the position BEFORE the c/g
    # (in_grouping_b consumes it before the RV call)
    if (w.endswith("h") and len(w) >= 2 and w[-2] in "cg"
            and len(w) - 2 >= rv):
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# portuguese
# ---------------------------------------------------------------------------

_PT_V = frozenset("aeiouáâéêíóôú")

_PT_STEP1 = sorted(
    [(s, 1) for s in """ica ância adora osa ista eza ante ável ível ico
        ismo oso amento imento ivo aça~o ador icas adoras osas istas ezas
        uciones adores antes aço~es icos ismos osos amentos imentos
        ivos""".split()]
    + [("ência", 4), ("ências", 4), ("logía", 2), ("logías", 2),
       ("ución", 3), ("amente", 5), ("mente", 6),
       ("idade", 7), ("idades", 7),
       ("iva", 8), ("ivo", 8), ("ivas", 8), ("ivos", 8),
       ("ira", 9), ("iras", 9)],
    key=lambda p: -len(p[0]),
)

_PT_VERB = tuple("""ada ida ia aria eria iria ara era ira ava asse esse
    isse aste este iste ei arei erei irei am iam ariam eriam iriam aram
    eram iram avam em arem erem irem assem essem issem ado ido ando endo
    indo ara~o era~o ira~o ar er ir as adas idas ias arias erias irias
    aras eras iras avas es ardes erdes irdes ares eres ires asses esses
    isses astes estes istes is ais eis areis ereis ireis áreis éreis
    íreis ásseis ésseis ísseis áveis íeis aríeis eríeis iríeis ados idos
    amos áramos éramos íramos ávamos íamos aríamos eríamos iríamos emos
    aremos eremos iremos ássemos êssemos íssemos imos armos ermos irmos
    ámos arás erás irás eu iu ou ará erá irá""".split())


def portuguese_stem(word: str) -> str:
    """Reference stem_ISO_8859_1_portuguese.c: prelude (ã->a~, õ->o~) ->
    (standard_suffix OR verb_suffix, then a final ci->c i-drop in RV) OR
    residual_suffix -> residual_form -> postlude (a~->ã, o~->õ)."""
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_es_like(w, _PT_V)
    r1, r2 = _r1_r2(w, _PT_V)

    ok = False
    for suf, code in _PT_STEP1:
        if not w.endswith(suf):
            continue
        s = len(w) - len(suf)
        if code == 1:
            if s >= r2:
                w = w[:s]
                ok = True
        elif code == 2:
            if s >= r2:
                w = w[:s] + "log"
                ok = True
        elif code == 3:
            if s >= r2:
                w = w[:s] + "u"
                ok = True
        elif code == 4:
            if s >= r2:
                w = w[:s] + "ente"
                ok = True
        elif code == 5:
            if s >= r1:
                w = w[:s]
                ok = True
                suf2, c2 = _longest_in_rv(
                    w, (("ic", -1), ("ad", -1), ("os", -1), ("iv", 1)), 0)
                if suf2 is not None and len(w) - len(suf2) >= r2:
                    w = w[: -len(suf2)]
                    if c2 == 1 and w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
        elif code == 6:
            if s >= r2:
                w = w[:s]
                ok = True
                for p2 in ("ante", "avel", "ível"):
                    if w.endswith(p2) and len(w) - len(p2) >= r2:
                        w = w[: -len(p2)]
                        break
        elif code == 7:
            if s >= r2:
                w = w[:s]
                ok = True
                for p2 in ("abil", "ic", "iv"):
                    if w.endswith(p2) and len(w) - len(p2) >= r2:
                        w = w[: -len(p2)]
                        break
        elif code == 8:
            if s >= r2:
                w = w[:s]
                ok = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif code == 9:
            if s >= rv and w.endswith("e", 0, s):
                w = w[:s] + "ir"
                ok = True
        break

    if not ok:
        suf, _ = _longest_in_rv(w, _PT_VERB, rv)
        if suf is not None:
            w = w[: -len(suf)]
            ok = True

    if ok:
        # final 'i' preceded by 'c', i in RV
        if (w.endswith("i") and len(w) >= 2 and w[-2] == "c"
                and len(w) - 1 >= rv):
            w = w[:-1]
    else:
        # residual_suffix: a i o os á í ó in RV
        best = None
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf) and (best is None or len(suf) > len(best)):
                best = suf
        if best is not None and len(w) - len(best) >= rv:
            w = w[: -len(best)]

    # residual_form
    best = None
    for suf in ("e", "é", "ê", "ç"):
        if w.endswith(suf):
            best = suf
            break
    if best == "ç":
        w = w[:-1] + "c"
    elif best is not None:
        if len(w) - 1 >= rv:
            w = w[:-1]
            if ((w.endswith("u") and len(w) >= 2 and w[-2] == "g")
                    or (w.endswith("i") and len(w) >= 2 and w[-2] == "c")):
                if len(w) - 1 >= rv:
                    w = w[:-1]

    return w.replace("a~", "ã").replace("o~", "õ")


SNOWBALL_STEMMERS.update(italian=italian_stem, portuguese=portuguese_stem)


# ---------------------------------------------------------------------------
# finnish (stem_ISO_8859_1_finnish.c, May-2005) — agglutinative pipeline:
# particle -> possessive -> case_ending -> other_endings -> i/t_plural ->
# tidy, over p1/p2 regions. Among semantics: longest suffix first, an
# entry whose attached test (VI/LONG) fails falls back to the next
# shorter candidate; a failed CASE condition fails the whole routine.
# ---------------------------------------------------------------------------

_FI_V1 = frozenset("aeiouyäö")
_FI_V2 = frozenset("aeiouäö")
_FI_AEI = frozenset("aeiä")
_FI_PARTICLE_END = frozenset("aeinotuyäö")
_FI_LONG = frozenset(("aa", "ee", "ii", "oo", "uu", "ää", "öö"))


def _fi_long(w: str, pos: int, lb: int) -> bool:
    """r_LONG under the active limit: double vowel ending at pos."""
    return pos - 2 >= lb and w[pos - 2:pos] in _FI_LONG


def _fi_vi(w: str, pos: int, lb: int) -> bool:
    """r_VI: 'i' preceded by a V2 vowel, both inside the limit."""
    return (pos - 2 >= lb and w[pos - 1] == "i" and w[pos - 2] in _FI_V2)


# (suffix, result, guard fn or None) — guard failure falls back to the
# next (shorter) candidate, exactly like the generated among trees.
_FI_A0 = [("kään", 1, None), ("kaan", 1, None), ("sti", 2, None),
          ("han", 1, None), ("hän", 1, None), ("kin", 1, None),
          ("pa", 1, None), ("pä", 1, None), ("ko", 1, None), ("kö", 1, None)]

_FI_A4 = [("nsa", 3, None), ("nsä", 3, None), ("mme", 3, None),
          ("nne", 3, None), ("ni", 2, None), ("si", 1, None),
          ("an", 4, None), ("en", 6, None), ("än", 5, None)]

_FI_A6 = [
    ("seen", -1, _fi_long), ("tten", -1, _fi_vi), ("siin", -1, _fi_vi),
    ("den", -1, _fi_vi),
    ("lla", -1, None), ("ssa", -1, None), ("lta", -1, None),
    ("sta", -1, None), ("tta", 9, None), ("llä", -1, None),
    ("ssä", -1, None), ("ltä", -1, None), ("stä", -1, None),
    ("ttä", 9, None), ("lle", -1, None), ("ine", -1, None),
    ("ksi", -1, None), ("han", 1, None), ("hen", 2, None),
    ("hin", 3, None), ("hon", 4, None), ("hän", 5, None), ("hön", 6, None),
    ("na", -1, None), ("ta", -1, None), ("nä", -1, None), ("tä", -1, None),
    ("n", 7, None), ("a", 8, None), ("ä", 8, None),
]

_FI_A7 = [
    ("imma", -1, None), ("impa", -1, None), ("immi", -1, None),
    ("impi", -1, None), ("immä", -1, None), ("impä", -1, None),
    ("eja", -1, None), ("ejä", -1, None),
    ("mma", 1, None), ("mpa", 1, None), ("mmi", 1, None),
    ("mpi", 1, None), ("mmä", 1, None), ("mpä", 1, None),
]

_FI_A9 = [("imma", -1, None), ("mma", 1, None)]


def _fi_among(w: str, table, lb: int):
    """Longest matching suffix starting at or after lb whose guard passes.
    Returns (cut_position, result) or (None, None)."""
    for suf, res, fn in table:
        i = len(w) - len(suf)
        if i >= lb and w.endswith(suf):
            if fn is None or fn(w, i, lb):
                return i, res
    return None, None


def finnish_stem(word: str) -> str:
    w = word
    p1, p2 = _r1_r2(w, _FI_V1)

    # particle_etc (limit p1)
    i, res = _fi_among(w, _FI_A0, p1)
    if i is not None:
        if res == 1:
            if i > 0 and w[i - 1] in _FI_PARTICLE_END:
                w = w[:i]
        elif res == 2:
            if i >= p2:
                w = w[:i]

    # possessive (limit p1; context checks below run unlimited)
    i, res = _fi_among(w, _FI_A4, p1)
    if i is not None:
        if res == 1:  # si, unless preceded by k
            if not (i > 0 and w[i - 1] == "k"):
                w = w[:i]
        elif res == 2:  # ni; then kse -> ksi
            w = w[:i]
            if w.endswith("kse"):
                w = w[:-1] + "i"
        elif res == 3:  # nsa/nsä/mme/nne
            w = w[:i]
        elif res == 4:  # an after lla/na/ssa/ta/lta/sta
            if any(w[:i].endswith(s) for s in
                   ("lla", "na", "ssa", "ta", "lta", "sta")):
                w = w[:i]
        elif res == 5:  # än after llä/nä/ssä/tä/ltä/stä
            if any(w[:i].endswith(s) for s in
                   ("llä", "nä", "ssä", "tä", "ltä", "stä")):
                w = w[:i]
        elif res == 6:  # en after lle/ine
            if any(w[:i].endswith(s) for s in ("lle", "ine")):
                w = w[:i]

    # case_ending (limit p1) — a failed case condition removes nothing
    ending_removed = False
    i, res = _fi_among(w, _FI_A6, p1)
    if i is not None:
        ok = True
        if res == 1:
            ok = i > 0 and w[i - 1] == "a"
        elif res == 2:
            ok = i > 0 and w[i - 1] == "e"
        elif res == 3:
            ok = i > 0 and w[i - 1] == "i"
        elif res == 4:
            ok = i > 0 and w[i - 1] == "o"
        elif res == 5:
            ok = i > 0 and w[i - 1] == "ä"
        elif res == 6:
            ok = i > 0 and w[i - 1] == "ö"
        elif res == 7:  # n: try absorbing the 2nd char of LONG / the e of ie
            if ((_fi_long(w, i, 0) or w[i - 2:i] == "ie") and i > 0):
                i -= 1
        elif res == 8:  # a/ä after vowel+consonant... (consonant then vowel)
            ok = i >= 2 and w[i - 1] in _FI_V1 and w[i - 2] not in _FI_V1
        elif res == 9:  # tta/ttä after e
            ok = i > 0 and w[i - 1] == "e"
        if ok:
            w = w[:i]
            ending_removed = True

    # other_endings (limit p2)
    i, res = _fi_among(w, _FI_A7, p2)
    if i is not None:
        if res == 1:  # comparative, unless po precedes
            if w[:i].endswith("po"):
                i = None
        if i is not None:
            w = w[:i]

    if ending_removed:
        # i_plural (limit p1)
        if w and w[-1] in "ij" and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        # t_plural: final t after a vowel (both inside p1), then mma/imma
        n = len(w)
        if (n >= 2 and w[-1] == "t" and n - 1 >= p1
                and n - 2 >= p1 and w[-2] in _FI_V1):
            w = w[:-1]
            i, res = _fi_among(w, _FI_A9, p2)
            if i is not None:
                if res == 1 and w[:i].endswith("po"):
                    i = None
                if i is not None:
                    w = w[:i]

    # tidy (first four steps limited to p1)
    if _fi_long(w, len(w), p1) and len(w) - 1 >= 0:
        w = w[:-1]
    n = len(w)
    if (n - 1 >= p1 and n - 2 >= p1 and w[n - 1] in _FI_AEI
            and w[n - 2] not in _FI_V1):
        w = w[:-1]
    n = len(w)
    if n - 1 >= p1 and n - 2 >= p1 and w[n - 1] == "j" and w[n - 2] in "ou":
        w = w[:-1]
    n = len(w)
    if n - 1 >= p1 and n - 2 >= p1 and w[n - 1] == "o" and w[n - 2] == "j":
        w = w[:-1]
    # final consonant un-doubling (unlimited)
    c0 = len(w)
    while c0 > 0 and w[c0 - 1] in _FI_V1:
        c0 -= 1
    if c0 >= 2 and w[c0 - 2] == w[c0 - 1]:
        w = w[:c0 - 1] + w[c0:]
    return w


SNOWBALL_STEMMERS.update(finnish=finnish_stem)


# ---------------------------------------------------------------------------
# russian (stem_KOI8_R_russian.c, May-2005) — KOI8-R bytes transcribed to
# Cyrillic: perfective_gerund OR (try reflexive; adjectival OR verb OR
# noun), then try -и, derivational (R2), tidy_up. The ENTIRE backward
# section runs under `setlimit tomark pV`, so every context test (the
# preceding-а/я guards, the нн checks) must also sit inside RV — unlike
# Finnish, where the limit lifts before the case conditions.
# ---------------------------------------------------------------------------

_RU_V = frozenset("аеиоуыэюя")

_RU_PERF = [("ившись", 2), ("ывшись", 2), ("вшись", 1), ("ивши", 2),
            ("ывши", 2), ("вши", 1), ("ив", 2), ("ыв", 2), ("в", 1)]

_RU_ADJ = [(s, 1) for s in
           ("ими ыми его ого ему ому юю ею ою ую ее ие ое ые их ых ей ий "
            "ой ый ем им ом ым ая яя").split()]

_RU_PART = [("ующ", 2), ("ивш", 2), ("ывш", 2), ("ем", 1), ("нн", 1),
            ("вш", 1), ("ющ", 1), ("щ", 1)]

_RU_REFLEX = [("ся", 1), ("сь", 1)]

_RU_VERB = [("ейте", 2), ("уйте", 2), ("ила", 2), ("ыла", 2), ("ена", 2),
            ("ете", 1), ("ите", 2), ("йте", 1), ("или", 2), ("ыли", 2),
            ("ило", 2), ("ыло", 2), ("ено", 2), ("нно", 1), ("уют", 2),
            ("ует", 2), ("ить", 2), ("ыть", 2), ("ешь", 1), ("ишь", 2),
            ("ены", 2),
            ("ла", 1), ("на", 1), ("ли", 1), ("ей", 2), ("уй", 2),
            ("ил", 2), ("ыл", 2), ("ем", 1), ("им", 2), ("ым", 2),
            ("ен", 2), ("ло", 1), ("но", 1), ("ют", 1),
            ("ет", 1), ("ит", 2), ("ят", 2), ("ыт", 2), ("ть", 1),
            ("ны", 1), ("ую", 2),
            ("ю", 2), ("й", 1), ("л", 1), ("н", 1)]

_RU_NOUN = [(s, 1) for s in
            ("иями ами ями иях ией ием иям ию ью ие ье ах ях еи ии ей ий "
             "ой ам ем ом ям ия ья ев ов ю а е и й о я у ь ы").split()]

_RU_DERIV = [("ость", 1), ("ост", 1)]

_RU_TIDY = [("ейше", 1), ("ейш", 1), ("н", 2), ("ь", 3)]


def _ru_among(w: str, table, lb: int):
    """Longest suffix (table pre-sorted longest-first) starting >= lb."""
    for suf, res in table:
        i = len(w) - len(suf)
        if i >= lb and w.endswith(suf):
            return i, res
    return None, None


def _ru_regions(w: str):
    """pV = after the first vowel; p2 = after the second
    vowel->non-vowel transition (gopast chains of mark_regions)."""
    n = len(w)
    i = 0
    while i < n and w[i] not in _RU_V:
        i += 1
    if i >= n:
        return n, n
    pv = i + 1
    j = pv
    while j < n and w[j] in _RU_V:
        j += 1
    if j >= n:
        return pv, n
    j += 1
    while j < n and w[j] not in _RU_V:
        j += 1
    if j >= n:
        return pv, n
    j += 1
    while j < n and w[j] in _RU_V:
        j += 1
    if j >= n:
        return pv, n
    return pv, j + 1


def russian_stem(word: str) -> str:
    w = word
    pv, p2 = _ru_regions(w)

    def _precede_ay(i: int) -> bool:
        return i - 1 >= pv and w[i - 1] in "ая"

    # step 1: perfective_gerund OR (try reflexive; adj OR verb OR noun)
    done = False
    i, res = _ru_among(w, _RU_PERF, pv)
    if i is not None:
        if res == 2 or _precede_ay(i):
            w = w[:i]
            done = True
    if not done:
        i, _ = _ru_among(w, _RU_REFLEX, pv)
        if i is not None:
            w = w[:i]
        i, _ = _ru_among(w, _RU_ADJ, pv)
        if i is not None:
            w = w[:i]
            j, pres = _ru_among(w, _RU_PART, pv)
            if j is not None and (pres == 2 or
                                  (j - 1 >= pv and w[j - 1] in "ая")):
                w = w[:j]
        else:
            i, res = _ru_among(w, _RU_VERB, pv)
            if i is not None and (res == 2 or _precede_ay(i)):
                w = w[:i]
            else:
                i, _ = _ru_among(w, _RU_NOUN, pv)
                if i is not None:
                    w = w[:i]

    # step 2: try final -и
    if w.endswith("и") and len(w) - 1 >= pv:
        w = w[:-1]

    # step 3: derivational (needs R2)
    i, _ = _ru_among(w, _RU_DERIV, pv)
    if i is not None and i >= p2:
        w = w[:i]

    # step 4: tidy_up
    i, res = _ru_among(w, _RU_TIDY, pv)
    if i is not None:
        if res == 1:  # ейше/ейш, then нн -> н
            w = w[:i]
            n = len(w)
            if n - 2 >= pv and w[n - 2:] == "нн":
                w = w[:-1]
        elif res == 2:  # нн -> н
            if i - 1 >= pv and i >= 1 and w[i - 1] == "н":
                w = w[:i]
        elif res == 3:  # -ь
            w = w[:i]
    return w


SNOWBALL_STEMMERS.update(russian=russian_stem)


# ---------------------------------------------------------------------------
# english (Porter2) — the snowball 'english' algorithm, distinct from the
# 'porter' variant (analysis/porter.py). Port of the reference's generated
# stemmer `src/contribs-lib/CLucene/snowball/src_c/stem_UTF_8_english.c`
# (May-2005 revision): exception lists a_9/a_10, gener/commun R1 prefixes
# (no 'arsen' in this revision), Y-marking prelude, and the six steps with
# their among-tables transcribed from the C. Fuzz-verified against the
# compiled reference stemmer (tests/test_snowball_langs.py).
# ---------------------------------------------------------------------------

_EN_V = frozenset("aeiouy")              # g_v (lowercase y only; marked
                                         # consonant-y becomes 'Y', not in g_v)
_EN_V_WXY = frozenset("aeiouywxY")       # g_v_WXY
_EN_LI = frozenset("cdeghkmnrt")         # g_valid_LI

_EN_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXC2 = frozenset((
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
))

_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_EN_STEP2 = (  # (suffix, replacement, condition) — longest match wins
    ("ational", "ate", None), ("fulness", "ful", None),
    ("iveness", "ive", None), ("ization", "ize", None),
    ("ousness", "ous", None), ("biliti", "ble", None),
    ("lessli", "less", None), ("tional", "tion", None),
    ("alism", "al", None), ("aliti", "al", None), ("ation", "ate", None),
    ("entli", "ent", None), ("fulli", "ful", None), ("ousli", "ous", None),
    ("abli", "able", None), ("alli", "al", None), ("anci", "ance", None),
    ("ator", "ate", None), ("enci", "ence", None), ("iviti", "ive", None),
    ("izer", "ize", None), ("bli", "ble", None),
    ("ogi", "og", "l"), ("li", "", "li"),
)
_EN_STEP3 = (
    ("ational", "ate", None), ("tional", "tion", None),
    ("alize", "al", None), ("icate", "ic", None), ("iciti", "ic", None),
    ("ative", "", "R2"), ("ical", "ic", None), ("ness", "", None),
    ("ful", "", None),
)
_EN_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ate", "ent", "ion", "ism", "iti", "ive", "ize", "ous",
    "al", "er", "ic",
)


def _en_shortv(w: str, c: int) -> bool:
    """r_shortv at backward cursor c (the limit lb is the word start):
    non-(v|wxY), vowel, non-vowel — or word-initial non-vowel, vowel."""
    if c >= 3 and w[c - 1] not in _EN_V_WXY and w[c - 2] in _EN_V \
            and w[c - 3] not in _EN_V:
        return True
    return c == 2 and w[1] not in _EN_V and w[0] in _EN_V


def english_stem(word: str) -> str:
    """Snowball english (Porter2), May-2005 revision, reference parity."""
    if word in _EN_EXC1:
        return _EN_EXC1[word]
    if len(word) < 3:
        return word

    # prelude: strip one leading apostrophe; mark consonant-y as 'Y'
    w = word
    if w.startswith("'"):
        w = w[1:]
    y_found = False
    # initial y is consonant-marked ONLY when followed by a vowel (the
    # in_grouping test after the ket in r_prelude — 'yes'->'Yes' but
    # 'ybs' keeps its vowel-y)
    if w.startswith("y") and len(w) > 1 and w[1] in _EN_V:
        w = "Y" + w[1:]
        y_found = True
    i = 1
    while i < len(w):
        if w[i] == "y" and w[i - 1] in _EN_V:
            w = w[:i] + "Y" + w[i + 1:]
            y_found = True
        i += 1

    # mark_regions: gener/commun prefixes pin p1 (this revision has no
    # 'arsen'); else standard gopast v, gopast non-v
    def _after_vc(s: str, start: int) -> int:
        # gopast v; gopast non-v: past the FIRST vowel, then past the
        # first non-vowel after it (not merely past the vowel run)
        n = len(s)
        j = start
        while j < n and s[j] not in _EN_V:
            j += 1
        if j >= n:
            return n
        j += 1
        while j < n and s[j] in _EN_V:
            j += 1
        if j >= n:
            return n
        return j + 1

    if w.startswith("gener"):
        p1 = 5
    elif w.startswith("commun"):
        p1 = 6
    else:
        p1 = _after_vc(w, 0)
    p2 = _after_vc(w, p1)

    # Step 0: longest of 's' / 's / ' removed
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-4] + "ss"
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("ie" if len(w) == 4 else "i")
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        # delete if a vowel exists before the char preceding the s
        if any(ch in _EN_V for ch in w[: -2]):
            w = w[:-1]

    if w in _EN_EXC2:
        return w

    # Step 1b
    if w.endswith("eedly"):
        if len(w) - 5 >= p1:
            w = w[:-5] + "ee"
    elif w.endswith("eed"):
        if len(w) - 3 >= p1:
            w = w[:-3] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(ch in _EN_V for ch in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_EN_DOUBLES):
                        w = w[:-1]
                    elif len(w) == p1 and _en_shortv(w, len(w)):
                        w += "e"
                break

    # Step 1c: y/Y -> i after a non-vowel that isn't word-initial
    if len(w) >= 3 and w[-1] in "yY" and w[-2] not in _EN_V:
        w = w[:-1] + "i"

    # Step 2 (in R1)
    for suf, rep, cond in _EN_STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                if cond == "l":
                    if len(w) > len(suf) and w[-len(suf) - 1] == "l":
                        w = w[: -len(suf)] + rep
                elif cond == "li":
                    if len(w) > len(suf) and w[-len(suf) - 1] in _EN_LI:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break  # longest match owns the step, even if R1/cond fails

    # Step 3 (in R1; 'ative' additionally needs R2)
    for suf, rep, cond in _EN_STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                if cond == "R2":
                    if len(w) - len(suf) >= p2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 4 (in R2; 'ion' only after s/t)
    for suf in _EN_STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= p2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # Step 5
    if w.endswith("e"):
        if len(w) - 1 >= p2 or (
            len(w) - 1 >= p1 and not _en_shortv(w, len(w) - 1)
        ):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= p2:
        w = w[:-1]

    if y_found:
        w = w.replace("Y", "y")
    return w


SNOWBALL_STEMMERS["english"] = english_stem
