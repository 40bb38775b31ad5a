"""Posting-list and term-dictionary codecs for the segment format.

Re-expresses CLucene's on-disk encodings with numpy-vectorized batch codecs
(no per-row Python in the hot path — the encoder runs over whole posting
arrays inside Arrow-batched pandas UDFs):

  * VByte (LEB128 varint)      — reference store/IndexOutput.cpp:103-110
    (writeVInt: 7 data bits per byte, high bit = continuation).
  * delta-gap docIDs           — reference index/DocumentsWriter.cpp:762-798
    (docs are written as deltas from the previous docID; we keep the plain
    delta rather than CLucene's (delta<<1|freq==1) packing so tf lives in
    its own stream, mirroring the .frq/.prx split).
  * positions as per-doc delta varints — DocumentsWriter.cpp:770-791.
  * 16-doc blocks with skip/max-score metadata — the skip interval is 16
    (reference index/_TermInfosWriter.h:58, SkipListWriter.cpp:56-67); each
    block stores (min_doc, max_doc, max_tf, min_dl) so the query side can
    compute a BM25 upper bound per block (block-max WAND).
  * prefix-compressed term-dictionary blocks, index every 128th term —
    reference index/TermInfosWriter.cpp:224-241 (shared-prefix length +
    suffix), term index interval 128 (index/IndexWriter.h:416).

All codecs are pure functions over numpy arrays / bytes, unit-tested by
round-trip; the segment writer (segments.py) calls them per term.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# VByte (LEB128) — vectorized over uint64 arrays
# ---------------------------------------------------------------------------

def vbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """vbyte_encode + the per-value encoded byte length (for slicing a
    concatenated stream back into sub-blobs).

    Index streams are gap/tf/dl/position-delta values, overwhelmingly
    < 128: the all-1-byte case is a straight uint8 cast, and the general
    case writes byte position k only for the values that still need it
    (the active set shrinks geometrically), instead of carrying
    rem/idx/left state over every value each pass."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int32)
    if int(v.max()) < 128:
        return v.astype(np.uint8).tobytes(), np.ones(v.shape, dtype=np.int32)
    # int32 lengths: a single stream is capped at 2 GB anyway by Arrow's
    # binary offsets, and halving this array halves the cumsum traffic
    nbytes = np.ones(v.shape, dtype=np.int32)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int32)
        tmp >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out[starts] = (v & np.uint64(0x7F)).astype(np.uint8) | (
        (nbytes > 1).astype(np.uint8) << 7
    )
    k = 1
    idx = np.flatnonzero(nbytes > 1)
    while idx.size:
        vk = ((v[idx] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        more = nbytes[idx] > k + 1
        out[starts[idx] + k] = vk | (more.astype(np.uint8) << 7)
        idx = idx[more]
        k += 1
    return out.tobytes(), nbytes


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as LEB128 varints (7 bits/byte, msb=more)."""
    return vbyte_encode_with_lengths(values)[0]


def vbyte_decode(blob: bytes) -> np.ndarray:
    """Decode LEB128 varints to a uint64 array (vectorized)."""
    b = np.frombuffer(blob, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # group id for each byte = index of the value it belongs to
    group = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    n_vals = int(is_last.sum())
    # position of the byte within its group
    group_start = np.zeros(b.size, dtype=np.int64)
    val_starts = np.flatnonzero(np.concatenate(([True], is_last[:-1])))
    group_start[val_starts] = val_starts
    group_start = np.maximum.accumulate(group_start)
    shift = ((np.arange(b.size) - group_start) * 7).astype(np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << shift
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, group, contrib)
    return out


# ---------------------------------------------------------------------------
# delta-gap helpers
# ---------------------------------------------------------------------------

def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly/weakly increasing int array -> gaps (first kept absolute)."""
    v = np.asarray(sorted_vals, dtype=np.int64)
    if v.size == 0:
        return v.astype(np.uint64)
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out.astype(np.uint64)


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64)).astype(np.int64)


# ---------------------------------------------------------------------------
# posting-list codec: one term -> (doc_blob, tf_blob, pos_blob, blocks)
# ---------------------------------------------------------------------------

BLOCK_SIZE = 16  # skip interval, reference index/_TermInfosWriter.h:58


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    positions: list | None = None,
) -> dict:
    """Encode one term's postings (doc-sorted) into compressed blobs + block stats.

    positions: optional list of per-doc position arrays (ascending); encoded
    as per-doc delta varints concatenated (tf gives the per-doc count, as in
    the reference .prx stream).
    Returns dict with doc_blob, tf_blob, dl_blob, pos_blob, df and per-block
    arrays (min_doc, max_doc, max_tf, min_dl). dl_blob carries the posting
    doc's field length (the exact-length analogue of the .nrm byte,
    reference DocumentsWriterThreadState.cpp:148-158) inline so scoring and
    merging never need a doc-table join — an impact-style denormalization
    that keeps segment merge and WAND self-contained per term.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doc_lens = np.asarray(doc_lens, dtype=np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids, tfs, doc_lens = doc_ids[order], tfs[order], doc_lens[order]
    df = int(doc_ids.size)

    doc_blob = vbyte_encode(delta_encode(doc_ids))
    tf_blob = vbyte_encode(tfs.astype(np.uint64))
    dl_blob = vbyte_encode(doc_lens.astype(np.uint64))

    pos_blob = b""
    if positions is not None:
        parts = []
        for i in order:
            p = np.asarray(positions[i], dtype=np.int64)
            parts.append(delta_encode(p))
        if parts:
            pos_blob = vbyte_encode(np.concatenate(parts))

    # block stats every BLOCK_SIZE postings
    n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    pad = n_blocks * BLOCK_SIZE - df
    def _blk(arr, fn):
        a = np.concatenate([arr, np.full(pad, arr[-1], dtype=arr.dtype)]) if pad else arr
        return fn(a.reshape(n_blocks, BLOCK_SIZE), axis=1)

    return {
        "df": df,
        "doc_blob": doc_blob,
        "tf_blob": tf_blob,
        "dl_blob": dl_blob,
        "pos_blob": pos_blob,
        "blk_min_doc": _blk(doc_ids, np.min).astype(np.int64),
        "blk_max_doc": _blk(doc_ids, np.max).astype(np.int64),
        "blk_max_tf": _blk(tfs, np.max).astype(np.int64),
        "blk_min_dl": _blk(doc_lens, np.min).astype(np.int64),
    }


def decode_postings(doc_blob: bytes, tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_ids int64 ascending, tfs int64)."""
    doc_ids = delta_decode(vbyte_decode(doc_blob))
    tfs = vbyte_decode(tf_blob).astype(np.int64)
    return doc_ids, tfs


def decode_positions(pos_blob: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """-> per-doc absolute position arrays (lengths given by tfs)."""
    flat = vbyte_decode(pos_blob)
    out = []
    off = 0
    for tf in np.asarray(tfs, dtype=np.int64):
        seg = flat[off : off + tf]
        out.append(np.cumsum(seg).astype(np.int64))
        off += int(tf)
    return out


# ---------------------------------------------------------------------------
# prefix-compressed term dictionary blocks (the .tis/.tii analogue)
# ---------------------------------------------------------------------------

TERM_INDEX_INTERVAL = 128  # reference index/IndexWriter.h:416


def encode_term_block(terms: list[str]) -> bytes:
    """Sorted terms -> prefix-compressed block.

    Per term: VInt(shared_prefix_len), VInt(suffix_byte_len), suffix utf-8
    bytes — the TermInfosWriter layout (reference TermInfosWriter.cpp:224-241).
    """
    out = bytearray()
    prev = b""
    header: list[int] = []
    bodies: list[bytes] = []
    for t in terms:
        cur = t.encode("utf-8")
        p = 0
        m = min(len(prev), len(cur))
        while p < m and prev[p] == cur[p]:
            p += 1
        suffix = cur[p:]
        header.extend((p, len(suffix)))
        bodies.append(suffix)
        prev = cur
    out += vbyte_encode(np.array([len(terms)], dtype=np.uint64))
    out += vbyte_encode(np.array(header, dtype=np.uint64))
    for b in bodies:
        out += b
    return bytes(out)


def decode_term_block(blob: bytes) -> list[str]:
    b = np.frombuffer(blob, dtype=np.uint8)
    # first varint = n_terms
    is_last = (b & 0x80) == 0
    first_end = int(np.flatnonzero(is_last)[0])
    n_terms = int(vbyte_decode(b[: first_end + 1].tobytes())[0])
    # next 2*n_terms varints = header
    ends = np.flatnonzero(is_last)
    header_end = int(ends[2 * n_terms])  # varint #0 is n_terms
    header = vbyte_decode(b[first_end + 1 : header_end + 1].tobytes())
    body = b[header_end + 1 :].tobytes()
    terms = []
    prev = b""
    off = 0
    for i in range(n_terms):
        p, slen = int(header[2 * i]), int(header[2 * i + 1])
        cur = prev[:p] + body[off : off + slen]
        off += slen
        terms.append(cur.decode("utf-8"))
        prev = cur
    return terms


# ---------------------------------------------------------------------------
# whole-segment vectorized encoder (the hot write path)
# ---------------------------------------------------------------------------

def encode_postings_frame(
    term_change: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    positions: list | None = None,
    positions_flat: np.ndarray | None = None,
) -> dict:
    """Encode ALL terms of a segment in one numpy pass (no per-term loop).

    Input rows must be sorted by (term, doc_id); `term_change` is a bool
    array marking the first row of each term run. Returns per-term python
    lists (aligned with the term runs, in order): doc_blob, tf_blob,
    dl_blob, pos_blob, df, cf, blk_min_doc, blk_max_doc, blk_max_tf,
    blk_min_dl. Semantically identical to calling encode_postings per term
    (property-tested in tests/test_codec.py).
    """
    n = len(doc_ids)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doc_lens = np.asarray(doc_lens, dtype=np.int64)
    term_starts = np.flatnonzero(term_change)
    term_ends = (
        np.concatenate([term_starts[1:], [n]]) if len(term_starts) else term_starts
    )
    df = term_ends - term_starts

    def _slice_all(big: bytes, nbytes: np.ndarray) -> list[bytes]:
        cum = np.concatenate(([0], np.cumsum(nbytes)))
        return [big[cum[s] : cum[e]] for s, e in zip(term_starts, term_ends)]

    # delta-gap docIDs (reset at each term run start)
    gaps = doc_ids.copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[term_starts] = doc_ids[term_starts]
    doc_big, doc_nb = vbyte_encode_with_lengths(gaps.astype(np.uint64))
    tf_big, tf_nb = vbyte_encode_with_lengths(tfs.astype(np.uint64))
    dl_big, dl_nb = vbyte_encode_with_lengths(doc_lens.astype(np.uint64))

    out = {
        "df": df.tolist(),
        "doc_blob": _slice_all(doc_big, doc_nb),
        "tf_blob": _slice_all(tf_big, tf_nb),
        "dl_blob": _slice_all(dl_big, dl_nb),
    }

    # per-term cf
    tf_cum = np.concatenate(([0], np.cumsum(tfs)))
    out["cf"] = (tf_cum[term_ends] - tf_cum[term_starts]).tolist()

    # positions: flatten all rows, delta within each row, one vbyte pass.
    # positions_flat skips the concat when the caller already holds the
    # positions as one contiguous array in (term, doc, pos) order.
    if positions is not None or positions_flat is not None:
        if positions_flat is not None:
            flat = np.asarray(positions_flat, dtype=np.int64)
        else:
            flat = (
                np.concatenate([np.asarray(p, dtype=np.int64) for p in positions])
                if n
                else np.zeros(0, dtype=np.int64)
            )
        row_starts = tf_cum[:-1]
        fd = flat.copy()
        if flat.size:
            fd[1:] -= flat[:-1]
            fd[row_starts] = flat[row_starts]
        pos_big, pos_nb = vbyte_encode_with_lengths(fd.astype(np.uint64))
        bcum = np.concatenate(([0], np.cumsum(pos_nb)))
        out["pos_blob"] = [
            pos_big[bcum[tf_cum[s]] : bcum[tf_cum[e]]]
            for s, e in zip(term_starts, term_ends)
        ]
    else:
        out["pos_blob"] = [None] * len(term_starts)

    # 16-doc block stats: global block-start indices across all terms
    n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_cum = np.concatenate(([0], np.cumsum(n_blocks)))
    total_blocks = int(blk_cum[-1])
    rep_start = np.repeat(term_starts, n_blocks)
    within = (np.arange(total_blocks) - np.repeat(blk_cum[:-1], n_blocks)) * BLOCK_SIZE
    bstarts = rep_start + within
    bends = np.minimum(bstarts + BLOCK_SIZE, np.repeat(term_ends, n_blocks))
    blk_min_doc = doc_ids[bstarts]          # docs ascend within a term run
    blk_max_doc = doc_ids[bends - 1]
    blk_max_tf = np.maximum.reduceat(tfs, bstarts) if total_blocks else np.zeros(0, np.int64)
    blk_min_dl = np.minimum.reduceat(doc_lens, bstarts) if total_blocks else np.zeros(0, np.int64)

    def _split_blocks(arr):
        return [arr[blk_cum[i] : blk_cum[i + 1]].tolist() for i in range(len(term_starts))]

    out["blk_min_doc"] = _split_blocks(blk_min_doc)
    out["blk_max_doc"] = _split_blocks(blk_max_doc)
    out["blk_max_tf"] = _split_blocks(blk_max_tf)
    out["blk_min_dl"] = _split_blocks(blk_min_dl)
    return out


def encode_postings_table(
    terms_per_run: np.ndarray | None,
    term_change: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    positions_flat: np.ndarray | None = None,
    terms_at_starts: np.ndarray | None = None,
):
    """Arrow-native twin of :func:`encode_postings_frame`: encode ALL terms
    of a segment and return a ``pyarrow.Table`` in the postings schema
    (term, df, cf, doc_blob, tf_blob, dl_blob, pos_blob, blk_*) with ZERO
    per-term Python objects.

    The concatenated vbyte streams plus their cumulative byte offsets at
    term-run boundaries ARE Arrow's variable-binary layout (one data buffer
    + an int32 offsets buffer), and the flat block-stat arrays plus the
    per-term block counts ARE Arrow's list layout — so the per-term
    `bytes` slicing and `.tolist()` materialization that
    encode_postings_frame pays for a pandas DataFrame disappear entirely
    (measured ~35% of the invert+encode kernel at 4k docs/segment).
    Property-tested equal to encode_postings_frame in tests/test_codec.py.

    terms_per_run: per-posting term array (sorted runs); only rows where
    ``term_change`` is True are emitted as the term column. Callers that
    already hold the boundary terms (the int-code invert kernel) pass
    ``terms_at_starts`` instead — vocab-sized, skipping the per-posting
    object gather — and may pass terms_per_run=None.
    """
    import pyarrow as pa

    n = len(doc_ids)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doc_lens = np.asarray(doc_lens, dtype=np.int64)
    term_starts = np.flatnonzero(term_change)
    n_terms = len(term_starts)
    term_ends = np.concatenate([term_starts[1:], [n]]) if n_terms else term_starts
    df = term_ends - term_starts
    bounds = np.append(term_starts, n)  # n_terms+1 run boundaries

    def _binary_col(big: bytes, nb: np.ndarray) -> pa.Array:
        # offsets[k] = byte offset of term k's first value in the stream
        cum = np.concatenate(([0], np.cumsum(nb)))
        offs = cum[bounds].astype(np.int32)
        return pa.Array.from_buffers(
            pa.binary(), n_terms,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(big)],
        )

    gaps = doc_ids.copy()
    if n:
        gaps[1:] -= doc_ids[:-1]
        gaps[term_starts] = doc_ids[term_starts]
    doc_big, doc_nb = vbyte_encode_with_lengths(gaps.astype(np.uint64))
    tf_big, tf_nb = vbyte_encode_with_lengths(tfs.astype(np.uint64))
    dl_big, dl_nb = vbyte_encode_with_lengths(doc_lens.astype(np.uint64))

    tf_cum = np.concatenate(([0], np.cumsum(tfs)))
    cf = tf_cum[term_ends] - tf_cum[term_starts]

    if positions_flat is not None:
        flat = np.asarray(positions_flat, dtype=np.int64)
        row_starts = tf_cum[:-1]
        fd = flat.copy()
        if flat.size:
            fd[1:] -= flat[:-1]
            fd[row_starts] = flat[row_starts]
        pos_big, pos_nb = vbyte_encode_with_lengths(fd.astype(np.uint64))
        bcum = np.concatenate(([0], np.cumsum(pos_nb)))
        pos_offs = bcum[tf_cum[bounds]].astype(np.int32)
        pos_col = pa.Array.from_buffers(
            pa.binary(), n_terms,
            [None, pa.py_buffer(pos_offs.tobytes()), pa.py_buffer(pos_big)],
        )
    else:
        pos_col = pa.nulls(n_terms, pa.binary())

    # 16-doc block stats, flat across all terms + per-term list offsets
    n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_cum = np.concatenate(([0], np.cumsum(n_blocks)))
    total_blocks = int(blk_cum[-1])
    rep_start = np.repeat(term_starts, n_blocks)
    within = (np.arange(total_blocks) - np.repeat(blk_cum[:-1], n_blocks)) * BLOCK_SIZE
    bstarts = rep_start + within
    bends = np.minimum(bstarts + BLOCK_SIZE, np.repeat(term_ends, n_blocks))
    if total_blocks:
        blk_min_doc = doc_ids[bstarts]
        blk_max_doc = doc_ids[bends - 1]
        blk_max_tf = np.maximum.reduceat(tfs, bstarts)
        blk_min_dl = np.minimum.reduceat(doc_lens, bstarts)
    else:
        blk_min_doc = blk_max_doc = blk_max_tf = blk_min_dl = np.zeros(0, np.int64)
    blk_offs = pa.array(blk_cum.astype(np.int32))

    def _list_col(vals: np.ndarray) -> pa.Array:
        return pa.ListArray.from_arrays(blk_offs, pa.array(vals, pa.int64()))

    if terms_at_starts is not None:
        terms_out = np.asarray(terms_at_starts, dtype=object)
    elif n_terms:
        terms_out = np.asarray(terms_per_run, dtype=object)[term_starts]
    else:
        terms_out = np.zeros(0, dtype=object)
    return pa.table(
        {
            "term": pa.array(terms_out, pa.string()),
            "df": pa.array(df, pa.int64()),
            "cf": pa.array(cf, pa.int64()),
            "doc_blob": _binary_col(doc_big, doc_nb),
            "tf_blob": _binary_col(tf_big, tf_nb),
            "dl_blob": _binary_col(dl_big, dl_nb),
            "pos_blob": pos_col,
            "blk_min_doc": _list_col(blk_min_doc),
            "blk_max_doc": _list_col(blk_max_doc),
            "blk_max_tf": _list_col(blk_max_tf),
            "blk_min_dl": _list_col(blk_min_dl),
        }
    )


def build_term_index(terms: list[str]) -> list[tuple[str, int]]:
    """Every TERM_INDEX_INTERVAL-th term with its ordinal — the in-RAM .tii
    analogue (reference TermInfosWriter.cpp:167-170): binary-search this,
    then scan ≤interval terms in the block."""
    return [(t, i) for i, t in enumerate(terms) if i % TERM_INDEX_INTERVAL == 0]
