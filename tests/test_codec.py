"""Round-trip tests for the segment codecs (codec.py).

Mirrors the reference's encoding unit coverage (store/IndexOutput VInt
round-trips exercised by src/test/store/* and TestUtf8.cpp) plus
hypothesis property tests over random posting shapes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from clucene_spark.index.codec import (
    BLOCK_SIZE,
    build_term_index,
    decode_positions,
    decode_postings,
    decode_term_block,
    delta_decode,
    delta_encode,
    encode_postings,
    encode_term_block,
    vbyte_decode,
    vbyte_encode,
)


def test_vbyte_known_values():
    # LEB128: 0->00, 127->7f, 128->80 01, 300->ac 02
    assert vbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert vbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert vbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert vbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert vbyte_decode(b"\xac\x02\x7f").tolist() == [300, 127]


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert vbyte_decode(vbyte_encode(arr)).tolist() == vals


@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_delta_roundtrip(vals):
    v = np.array(sorted(vals), dtype=np.int64)
    assert delta_decode(delta_encode(v)).tolist() == sorted(vals)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # doc_id
            st.integers(min_value=1, max_value=500),  # tf
            st.integers(min_value=1, max_value=10_000),  # dl
        ),
        min_size=1,
        max_size=300,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=40, deadline=None)
def test_postings_roundtrip(rows):
    rows.sort()
    docs = np.array([r[0] for r in rows], dtype=np.int64)
    tfs = np.array([r[1] for r in rows], dtype=np.int64)
    dls = np.array([r[2] for r in rows], dtype=np.int64)
    enc = encode_postings(docs, tfs, dls)
    d2, t2 = decode_postings(enc["doc_blob"], enc["tf_blob"])
    assert d2.tolist() == docs.tolist()
    assert t2.tolist() == tfs.tolist()
    assert enc["df"] == len(rows)
    # block invariants
    n_blocks = (len(rows) + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["blk_min_doc"]) == n_blocks
    assert enc["blk_min_doc"][0] == docs[0]
    assert enc["blk_max_doc"][-1] == docs[-1]
    assert enc["blk_max_tf"].max() == tfs.max()
    assert enc["blk_min_dl"].min() == dls.min()


def test_positions_roundtrip():
    docs = np.array([3, 7, 20], dtype=np.int64)
    tfs = np.array([2, 1, 3], dtype=np.int64)
    dls = np.array([10, 10, 10], dtype=np.int64)
    positions = [np.array([1, 5]), np.array([0]), np.array([2, 3, 9])]
    enc = encode_postings(docs, tfs, dls, positions)
    got = decode_positions(enc["pos_blob"], tfs)
    for g, want in zip(got, positions):
        assert g.tolist() == want.tolist()


def test_postings_unsorted_input_sorted_on_encode():
    docs = np.array([20, 3, 7], dtype=np.int64)
    tfs = np.array([3, 2, 1], dtype=np.int64)
    dls = np.array([9, 10, 11], dtype=np.int64)
    positions = [np.array([2, 3, 9]), np.array([1, 5]), np.array([0])]
    enc = encode_postings(docs, tfs, dls, positions)
    d2, t2 = decode_postings(enc["doc_blob"], enc["tf_blob"])
    assert d2.tolist() == [3, 7, 20]
    assert t2.tolist() == [2, 1, 3]
    got = decode_positions(enc["pos_blob"], t2)
    assert [g.tolist() for g in got] == [[1, 5], [0], [2, 3, 9]]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FFF),
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=300,
        unique=True,
    )
)
@settings(max_examples=40, deadline=None)
def test_term_block_roundtrip(terms):
    terms = sorted(terms)
    assert decode_term_block(encode_term_block(terms)) == terms


def test_term_block_prefix_compression_shrinks():
    terms = sorted(f"prefixsharedlongword{i:05d}" for i in range(500))
    blob = encode_term_block(terms)
    raw = sum(len(t.encode()) for t in terms)
    assert len(blob) < raw * 0.5  # shared prefixes actually compressed


def test_term_index_interval():
    terms = [f"t{i:04d}" for i in range(300)]
    idx = build_term_index(terms)
    assert idx[0] == ("t0000", 0)
    assert idx[1] == ("t0128", 128)
    assert len(idx) == 3


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),      # term code
            st.integers(min_value=0, max_value=10**6),   # doc_id
            st.integers(min_value=1, max_value=40),      # tf
            st.integers(min_value=1, max_value=500),     # dl
        ),
        min_size=1,
        max_size=400,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@settings(max_examples=30, deadline=None)
def test_frame_encoder_matches_per_term(rows):
    from clucene_spark.index.codec import encode_postings_frame

    rows.sort()
    tc = np.array([rows[0][0]] + [r[0] for r in rows[1:]])
    prev = np.array([rows[0][0] - 1] + [r[0] for r in rows[:-1]])
    term_change = tc != prev
    docs = np.array([r[1] for r in rows], dtype=np.int64)
    tfs = np.array([r[2] for r in rows], dtype=np.int64)
    dls = np.array([r[3] for r in rows], dtype=np.int64)
    rng = np.random.RandomState(7)
    positions = [np.sort(rng.choice(10**6, size=t, replace=False)) for t in tfs]
    got = encode_postings_frame(term_change, docs, tfs, dls, positions)

    starts = np.flatnonzero(term_change)
    ends = np.concatenate([starts[1:], [len(rows)]])
    for i, (s, e) in enumerate(zip(starts, ends)):
        want = encode_postings(docs[s:e], tfs[s:e], dls[s:e], positions[s:e])
        assert got["doc_blob"][i] == want["doc_blob"]
        assert got["tf_blob"][i] == want["tf_blob"]
        assert got["dl_blob"][i] == want["dl_blob"]
        assert got["pos_blob"][i] == want["pos_blob"]
        assert got["df"][i] == want["df"]
        assert got["blk_min_doc"][i] == want["blk_min_doc"].tolist()
        assert got["blk_max_doc"][i] == want["blk_max_doc"].tolist()
        assert got["blk_max_tf"][i] == want["blk_max_tf"].tolist()
        assert got["blk_min_dl"][i] == want["blk_min_dl"].tolist()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),      # term code
            st.integers(min_value=0, max_value=10**6),   # doc_id
            st.integers(min_value=1, max_value=40),      # tf
            st.integers(min_value=1, max_value=500),     # dl
        ),
        min_size=0,
        max_size=400,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_arrow_encoder_matches_frame_encoder(rows, with_pos):
    """encode_postings_table (zero-copy Arrow buffers) must be value-
    identical to encode_postings_frame on every column, with and without
    positions, including the empty segment."""
    from clucene_spark.index.codec import (
        encode_postings_frame,
        encode_postings_table,
    )

    rows.sort()
    n = len(rows)
    terms = np.array([f"term{r[0]:03d}" for r in rows], dtype=object)
    term_change = np.ones(n, dtype=bool)
    if n > 1:
        term_change[1:] = terms[1:] != terms[:-1]
    docs = np.array([r[1] for r in rows], dtype=np.int64)
    tfs = np.array([r[2] for r in rows], dtype=np.int64)
    dls = np.array([r[3] for r in rows], dtype=np.int64)
    total = int(tfs.sum())
    pos = (np.arange(total, dtype=np.int64) * 13) % 997 if with_pos else None

    ref = encode_postings_frame(term_change, docs, tfs, dls, positions_flat=pos)
    tab = encode_postings_table(terms, term_change, docs, tfs, dls,
                                positions_flat=pos)
    got = tab.to_pydict()
    assert got["term"] == [str(t) for t in terms[term_change]]
    for k in ("df", "cf", "doc_blob", "tf_blob", "dl_blob", "pos_blob",
              "blk_min_doc", "blk_max_doc", "blk_max_tf", "blk_min_dl"):
        assert got[k] == ref[k], k
