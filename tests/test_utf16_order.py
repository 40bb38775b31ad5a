"""UTF-16 code-unit term order (reference TermInfosWriter.cpp:108-140
parity): key arithmetic, fast-path equivalence, DuckDB oracle fragment,
and end-to-end segment-dictionary / RangeQuery semantics."""
import random

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from clucene_spark.index.utf16 import (
    any_needs_utf16,
    duckdb_utf16_key_sql,
    needs_utf16,
    sort_terms_pdf,
    utf16_argsort,
    utf16_key,
    utf16_sorted,
)

# chars straddling every interesting region: ascii, accents, CJK,
# Hangul, just-below-surrogate, private-use (U+E000+), ligature,
# fullwidth, replacement, max BMP, and four supplementary-plane chars
ALPHABET = list("abz09") + [
    "é", "中", "퟿", "", "ﬀ",
    "Ａ", "�", "￿", "\U00010000", "\U0001d54a",
    "\U0001f600", "\U0010ffff",
]


def _manual_units(s: str) -> list[int]:
    out = []
    for ch in s:
        c = ord(ch)
        if c < 0x10000:
            out.append(c)
        else:
            out.append(0xD800 + ((c - 0x10000) >> 10))
            out.append(0xDC00 + ((c - 0x10000) & 0x3FF))
    return out


@given(st.lists(st.text(alphabet=ALPHABET, max_size=6), max_size=30))
@settings(max_examples=200, deadline=None)
def test_key_matches_manual_unit_order(strings):
    by_key = sorted(strings, key=utf16_key)
    by_units = sorted(strings, key=_manual_units)
    assert by_key == by_units


def test_needs_probe_regions():
    assert not needs_utf16("ascii")
    assert not needs_utf16("é中퟿")  # accents/CJK/below-surrogate
    assert not needs_utf16(None) and not needs_utf16("")
    for ch in ("", "ﬀ", "Ａ", "￿", "\U0001f600"):
        assert needs_utf16("x" + ch)
    assert not any_needs_utf16(["plain", "café", "検索"])
    assert any_needs_utf16(["plain", "a\U0001f600"])


def test_divergence_from_code_point_order():
    # supplementary sorts BELOW U+E000.. under UTF-16 but ABOVE under
    # code points — the exact region the reference orders differently
    terms = ["a�", "a\U0001f600", "ab", "a", "a", "aﬀ"]
    assert utf16_sorted(terms) == [
        "a", "ab", "a\U0001f600", "a", "aﬀ", "a�",
    ]
    assert sorted(terms) == [
        "a", "ab", "a", "aﬀ", "a�", "a\U0001f600",
    ]


@given(st.lists(st.text(alphabet=list("abcé中"), max_size=5), max_size=20))
@settings(max_examples=100, deadline=None)
def test_fast_path_identical_below_e000(strings):
    # fast path (plain sort) must equal the keyed sort for BMP-below-E000
    assert utf16_sorted(strings) == sorted(strings)
    arr = np.asarray(strings, dtype=object)
    keys = [s.encode("utf-16-be") for s in strings]
    order = utf16_argsort(arr)
    assert [strings[i] for i in order] == [
        strings[i] for i in np.argsort(np.array(keys, dtype=object), kind="stable")
    ]


def test_argsort_and_pdf_sort_with_exotic_terms():
    terms = ["a\U0001f600", "aﬀ", "a", "b", "a"]
    order = utf16_argsort(np.asarray(terms, dtype=object))
    assert [terms[i] for i in order] == utf16_sorted(terms)

    pdf = pd.DataFrame(
        {"term": terms * 2, "doc_id": list(range(5)) + list(range(5)), "pos": range(10)}
    )
    out = sort_terms_pdf(pdf, ["term", "doc_id", "pos"])
    assert list(out["term"].iloc[::2]) == utf16_sorted(terms)
    assert list(out.columns) == ["term", "doc_id", "pos"]  # no key residue


@given(st.lists(st.text(alphabet=ALPHABET, max_size=5), min_size=1, max_size=25))
@settings(max_examples=50, deadline=None)
def test_duckdb_fragment_matches_python_key(strings):
    import duckdb

    con = duckdb.connect()
    try:
        df = pd.DataFrame({"s": strings, "i": range(len(strings))})
        con.register("t", df)
        got = [
            r[0]
            for r in con.execute(
                f"SELECT s FROM t ORDER BY {duckdb_utf16_key_sql('s')}, i"
            ).fetchall()
        ]
    finally:
        con.close()
    # stable by insertion index on ties == python stable sort
    assert got == sorted(strings, key=utf16_key)


def test_segment_dictionary_comes_out_in_utf16_order(spark, tmp_path):
    from clucene_spark.index.segments import (
        SegmentStore,
        build_segments_fused,
        read_term_index,
    )

    rows = [
        (0, "apple a\U0001f600 zebra"),
        (1, "aﬀ apple a"),
        (2, "a\U0001f600 a� mango"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx_dir = str(tmp_path / "u16idx")
    build_segments_fused(docs, idx_dir, docs_per_segment=10, analyzer="whitespace")
    store = SegmentStore(spark, idx_dir)
    seg = store.manifest["segments"][0]["name"]
    terms = read_term_index(idx_dir, seg)
    assert terms == utf16_sorted(terms)
    assert "a\U0001f600" in terms and "a�" in terms
    # postings file rows are in the same (UTF-16) term order
    file_terms = [
        r["term"] for r in store.postings().select("term").collect()
    ]
    # one segment -> file order == dictionary order
    assert file_terms == terms


def test_range_query_uses_utf16_comparison(spark):
    from clucene_spark.index.build import InvertedIndex
    from clucene_spark.search.engine import RangeQuery, Searcher

    rows = [
        (0, "apple"),
        (1, "a\U0001f600x"),   # supplementary: inside [😀 TO ﬀ] under UTF-16
        (2, "ay"),       # private use: inside under UTF-16 only
        (3, "aﬀz"),       # above the upper bound either way
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s = Searcher(InvertedIndex(docs, analyzer="whitespace"))
    q = RangeQuery(lower="a\U0001f600", upper="aﬀ", inclusive=True)
    got = {r["doc_id"] for r in s.topk(q, 10).collect()}
    # code-point comparison would return ∅ (0x1F600 > 0xFB00); UTF-16
    # (lead surrogate 0xD83D < 0xE000 < 0xFB00) admits docs 1 and 2
    assert got == {1, 2}
    # bounds below U+E000 keep the push-down string predicate and agree
    q2 = RangeQuery(lower="a", upper="az", inclusive=True)
    assert {r["doc_id"] for r in s.topk(q2, 10).collect()} == {0}


def test_merged_segments_order_utf16(spark, tmp_path):
    from clucene_spark.index.merge import merge_segments
    from clucene_spark.index.segments import (
        SegmentStore,
        build_segments_fused,
        read_term_index,
    )

    random.seed(7)
    vocab = ["apple", "a\U0001f600", "aﬀ", "a", "zeta", "m\U0010ffff"]
    rows = [
        (i, " ".join(random.choice(vocab) for _ in range(6))) for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx_dir = str(tmp_path / "u16merge")
    build_segments_fused(docs, idx_dir, docs_per_segment=8, analyzer="whitespace")
    store = SegmentStore(spark, idx_dir)
    assert len(store.manifest["segments"]) > 1
    merge_segments(spark, idx_dir, [s["name"] for s in store.manifest["segments"]])
    store2 = SegmentStore(spark, idx_dir)
    names = [s["name"] for s in store2.manifest["segments"]]
    assert len(names) == 1
    terms = read_term_index(idx_dir, names[0])
    assert terms == utf16_sorted(terms)
    assert set(terms) == set(vocab)
