"""UTF-16 code-unit term ordering — reference Term-order parity.

CLucene compares terms by UTF-16 code units: the term dictionary is
written in ``_tcscmp`` order over ``TCHAR*`` (reference
index/TermInfosWriter.cpp:108-140, index/Term.cpp compareTo), i.e. the
order of the term's UTF-16 code-unit sequence. Python, Spark SQL and
DuckDB all compare strings by Unicode *code point* (UTF-8 byte order).
The two orders differ in exactly one region: a supplementary-plane char
(U+10000..U+10FFFF — encoded in UTF-16 as a surrogate pair whose lead
unit is 0xD800..0xDBFF) sorts BELOW every BMP char in U+E000..U+FFFF
under UTF-16 rules, but ABOVE them under code-point rules.

Strategy (zero cost on the common path): code-point order == UTF-16
order whenever no term contains a char >= U+E000, so every sort site
runs a C-speed regex probe over the (joined) term set and only switches
to an encoded-bytes sort key when a term actually needs it. ASCII,
Latin, Greek, Cyrillic, Hebrew, Arabic, Devanagari, Hangul and the CJK
Unified block (U+4E00..U+9FFF) are all below U+E000, so real webtext
corpora take the fast path unless they contain emoji, compatibility
ligatures (U+FB00+), fullwidth forms (U+FF00+) or private-use chars.

Order keys per engine:
 - python/numpy/pandas: ``s.encode("utf-16-be")`` — bytes compare
   lexicographically unsigned == code-unit order.
 - Spark: ``F.encode(col, 'UTF-16BE')`` — BinaryType comparison is
   unsigned lexicographic; no BOM is emitted for the BE variant.
 - DuckDB (oracle side — no UTF-16 codec): the flattened code-unit
   INT list (lead/trail surrogates computed arithmetically); DuckDB
   orders LIST columns lexicographically.
"""
from __future__ import annotations

import re

import numpy as np

# any char at/above U+E000 can reorder vs a surrogate pair
_NEEDS_RE = re.compile("[\ue000-\U0010ffff]")


def needs_utf16(s: str | None) -> bool:
    """True if `s` contains a char whose UTF-16 rank differs region-wise
    from its code-point rank (>= U+E000, including supplementary)."""
    return bool(s) and _NEEDS_RE.search(s) is not None


def any_needs_utf16(strings) -> bool:
    """C-speed probe over a term collection (joins once, one regex scan)."""
    try:
        joined = "".join(strings)
    except TypeError:  # mixed/np.str_ sequence fallback
        joined = "".join(str(s) for s in strings)
    return _NEEDS_RE.search(joined) is not None


def utf16_key(s: str) -> bytes:
    """Sort key: comparing keys bytewise == comparing UTF-16 code units."""
    return s.encode("utf-16-be")


def utf16_sorted(strings) -> list[str]:
    """Sorted copy in UTF-16 code-unit order (fast path: plain sort)."""
    strings = list(strings)
    if not any_needs_utf16(strings):
        return sorted(strings)
    return sorted(strings, key=utf16_key)


def utf16_argsort(arr) -> np.ndarray:
    """np.argsort in UTF-16 code-unit order. `arr` is a 1-D array/sequence
    of str. Fast path (no char >= U+E000): code-point order suffices, and
    Arrow's UTF-8 byte sort IS code-point order — C-speed instead of
    python-object comparisons (the object-array mergesort was ~40% of a
    100k-doc invert's fixed cost)."""
    a = np.asarray(arr, dtype=object)
    if not any_needs_utf16(a.tolist()):
        try:
            import pyarrow as pa
            import pyarrow.compute as pc

            return (
                pc.sort_indices(pa.array(a, type=pa.string()))
                .to_numpy()
                .astype(np.int64)
            )
        except Exception:
            return np.argsort(a, kind="stable")
    keys = np.empty(len(a), dtype=object)
    keys[:] = [s.encode("utf-16-be") for s in a.tolist()]
    return np.argsort(keys, kind="stable")


def sort_terms_pdf(pdf, cols, term_col: str = "term", kind: str = "mergesort"):
    """pandas sort_values(cols) but with `term_col` compared in UTF-16
    code-unit order. Fast path: plain sort_values when no term needs the
    transform (probe over the unique term set)."""
    import pandas as pd

    uniq = pd.unique(pdf[term_col])
    if not any_needs_utf16(uniq.tolist()):
        return pdf.sort_values(cols, kind=kind)
    keymap = {t: t.encode("utf-16-be") for t in uniq.tolist()}
    tmp = "__u16_" + term_col
    pdf = pdf.assign(**{tmp: pdf[term_col].map(keymap)})
    out = pdf.sort_values([tmp if c == term_col else c for c in cols], kind=kind)
    return out.drop(columns=[tmp])


def spark_utf16_key(col):
    """Spark Column order key (BinaryType, unsigned lexicographic)."""
    from pyspark.sql import functions as F

    return F.encode(col, "UTF-16BE")


def duckdb_utf16_key_sql(expr: str) -> str:
    """DuckDB SQL fragment computing a UTF-16 order key for a string
    expression — ORDER BY / range comparisons on it replicate the Spark
    encode('UTF-16BE') binary order. The key is the code-unit sequence as
    fixed-width (4 hex digits per unit) uppercase hex, so plain VARCHAR
    comparison == numeric unit comparison; a VARCHAR key also survives
    DuckDB's x>=lo AND x<=hi -> BETWEEN rewrite, which rejects LIST
    operands. Surrogate pairs are computed arithmetically (DuckDB has no
    UTF-16 codec)."""
    return (
        "coalesce(array_to_string(list_transform(flatten(list_transform("
        "list_filter(string_split({e}, ''), c -> c <> ''), c -> "
        "CASE WHEN unicode(c) < 65536 THEN [unicode(c)] "
        "ELSE [55296 + ((unicode(c) - 65536) // 1024), "
        "56320 + ((unicode(c) - 65536) % 1024)] END)), "
        "u -> lpad(hex(u), 4, '0')), ''), '')"
    ).format(e=expr)
