"""Pins for the Arrow-native analyze/invert codes kernel
(`segments._analyze_docs_codes` / `_invert_encode_codes`).

The fast path must be TOKEN-FOR-TOKEN identical to the python piecewise
path (`_analyze_docs` + `_invert_encode`), which is itself fuzz-pinned
to the StandardTokenizer DFA. Routing is per doc: regex-clean docs take
the Arrow path, everything else the python path — so the tests force
both routes and their interleavings.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from clucene_spark.data.webtext import PLANTED, make_doc
from clucene_spark.index.segments import (
    _analyze_docs,
    _analyze_docs_codes,
    _invert_encode,
    _invert_encode_codes,
)

EDGES = [
    "", " ", "...", ",", ".", "a.b", "3x", "x3", "a,b", "foo ,bar",
    "foo,, bar", "the and of", "THE The, the.", "don't stop,", None,
    "nb\xa0sp the", "U.S.A. the U.S.A.", "tab\tsep\nnl words",
    "z" * 255, "z" * 256, ("z" * 255) + ".", "ends with dot.",
    "ends with comma,", " leading space", "trailing space ",
    "digit 42 only", "42, 43. 44", "mixed 3x then plain words",
]


def _both(texts):
    texts = np.array(texts, dtype=object)
    per_doc, p0, c0 = _analyze_docs(texts, "standard")
    codes, uniq, p1, c1 = _analyze_docs_codes(texts, "standard")
    return per_doc, p0, c0, codes, uniq, p1, c1


def _assert_equal(texts):
    per_doc, p0, c0, codes, uniq, p1, c1 = _both(texts)
    assert (c0 == c1).all()
    assert (p0 == p1).all()
    assert [w for ws in per_doc for w in ws] == [uniq[c] for c in codes]


def test_edge_docs_token_identical():
    _assert_equal(EDGES)


def test_planted_corpus_token_identical():
    # every 4th doc carries a planted bad chunk -> both routes interleave
    _assert_equal([make_doc(i, messy=True)[4] for i in range(400)])


def test_all_clean_and_all_bad_batches():
    _assert_equal(["plain words only", "more plain words"])  # all arrow
    _assert_equal(["a.b c.d", "don't"])  # all python
    _assert_equal([])  # empty batch


def test_invert_identical_segment_table():
    texts = np.array(
        [make_doc(i, messy=True)[4] for i in range(300)] + EDGES,
        dtype=object)
    ids = np.arange(len(texts), dtype=np.int64)
    per_doc, p0, c0 = _analyze_docs(texts, "standard")
    old = _invert_encode(ids, per_doc, p0, c0, True, build_tv=True)
    codes, uniq, p1, c1 = _analyze_docs_codes(texts, "standard")
    new = _invert_encode_codes(ids, codes, uniq, p1, c1, True, build_tv=True)
    assert old[0].equals(new[0])
    assert (old[1] == new[1]).all() and (old[2] == new[2]).all()
    assert old[3] == new[3] and old[4] == new[4]
    assert old[5].reset_index(drop=True).equals(new[5].reset_index(drop=True))


def test_invert_fielded_prefix_identical():
    texts = np.array(["plain words", "a.b bad", "the stop"], dtype=object)
    ids = np.arange(3, dtype=np.int64)
    per_doc, p0, c0 = _analyze_docs(texts, "standard")
    old = _invert_encode(ids, per_doc, p0, c0, True, term_prefix="f\x1f")
    codes, uniq, p1, c1 = _analyze_docs_codes(texts, "standard")
    new = _invert_encode_codes(ids, codes, uniq, p1, c1, True,
                               term_prefix="f\x1f")
    assert old[0].equals(new[0])


# alphabet exercises every routing rule: case, digits, '.'/',', a bad
# punct char, unicode, ascii + exotic whitespace, long-run potential,
# and the chunk-routing hazard chars: \x1c-\x1f (python isspace() but
# NOT Unicode White_Space — must route whole-doc), DEL, CJK, emoji
_ALPHA = st.text(
    alphabet="aB3.,'&é \t\n\x0b\x85\xa0\x1c\x1e\x7f二\U0001f600"
             + "z" * 8,
    max_size=120)


@settings(max_examples=300, deadline=None)
@given(st.lists(_ALPHA, max_size=8))
def test_fuzz_token_identical(texts):
    _assert_equal(texts)


def test_split_divergence_chars_route_whole_doc():
    """\\x1c-\\x1f are whitespace to python str.split but not to Arrow's
    utf8_split_whitespace; any doc containing one must take the whole-doc
    python path (and the outputs must still agree end-to-end)."""
    docs = ["a\x1cb c", "x\x1dy", "p\x1eq r,s", "m\x1fn.", "del\x7fchar"]
    import pyarrow as pa
    import pyarrow.compute as pc

    from clucene_spark.index.segments import _ARROW_HARD_DOC

    flags = pc.match_substring_regex(pa.array(docs), _ARROW_HARD_DOC)
    assert all(flags.to_pylist())
    _assert_equal(docs)


def test_all_16_planted_cases_route_python():
    # every reference edge token must be regex-flagged (never the arrow
    # formula): guards the eligibility regex against loosening
    import pyarrow as pa
    import pyarrow.compute as pc

    from clucene_spark.index.segments import _ARROW_BAD_DOC

    arr = pa.array([f"words {tok} words" for tok in PLANTED])
    flags = pc.match_substring_regex(arr, _ARROW_BAD_DOC).to_pylist()
    assert all(flags), [t for t, f in zip(PLANTED, flags) if not f]
