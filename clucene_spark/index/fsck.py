"""Index integrity checker — the CheckIndex of this engine.

Lucene ships ``CheckIndex`` to certify an index's on-disk invariants
before trusting it (or after a crash / a suspect copy); CLucene users
get the same guarantees implicitly from the format contracts
(reference index/TermInfosWriter.cpp term order, SegmentMerger posting
order, DocumentsWriter norms). This module makes those contracts
*checkable*: every structural invariant the codec and manifest protocol
promise is re-verified from the raw segment files.

Per-segment checks (each segment is independent — the job is
embarrassingly parallel, one task per segment, no shuffle; at 10^12
docs this is a full-scan maintenance job you run on the cluster, not
the driver):

  files       postings.parquet + doc_lens.parquet present and readable
  term_order  term dictionary strictly ascending in UTF-16 code-unit
              order (the reference _tcscmp contract) and duplicate-free
  postings    every posting list decodes; docIDs strictly ascending and
              inside the manifest's [min_doc, max_doc]; df == list
              length; cf == Σtf; every tf >= 1
  positions   per-doc position count == tf; positions strictly
              ascending and non-negative
  doc_lens    doc_id unique, inside the manifest range; n_docs and
              Σdl == the manifest's n_docs / n_tokens metrics; every
              posting's inline dl matches the doc_lens table (and
              tf <= dl)
  block_stats per-16-posting block min/max doc, max tf, min dl equal a
              recompute from the decoded lists (WAND correctness rests
              on these: a stale max would silently drop true top-k
              hits, an inflated one only costs pruning)

Store-level checks (driver-side, bounded metadata):

  manifest    every manifest generation parses; the live generation's
              segment dirs all exist; doc ranges don't overlap
  deletes     deletes sidecar doc_ids fall inside some live segment's
              range
  orphans     segment dirs referenced by NO manifest generation
              (informational — gc_segments' job, not corruption)

`check_index` returns a DataFrame (segment, check, n_checked, n_bad,
detail) — one row per (segment, check) plus store-level rows under
segment='_store'. An intact index has n_bad == 0 everywhere.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from clucene_spark.index.codec import (
    BLOCK_SIZE,
    decode_positions,
    decode_postings,
    vbyte_decode,
)
from clucene_spark.index.segments import FIELD_SEP, read_manifest
from clucene_spark.index.utf16 import any_needs_utf16, utf16_key

_SCHEMA = "segment string, check string, n_checked long, n_bad long, detail string"


def _check_segment(index_dir: str, name: str, min_doc: int, max_doc: int,
                   n_docs: int, n_tokens: int) -> list[tuple]:
    """All per-segment checks; returns (segment, check, n_checked, n_bad,
    detail) rows. Pure function of the segment files — safe to run in
    any executor."""
    import pyarrow.parquet as pq

    seg_dir = os.path.join(index_dir, "segments", name)
    rows: list[tuple] = []
    post_path = os.path.join(seg_dir, "postings.parquet")
    dl_path = os.path.join(seg_dir, "doc_lens.parquet")
    missing = [p for p in (post_path, dl_path) if not os.path.exists(p)]
    if missing:
        return [(name, "files", 2, len(missing),
                 "missing: " + ", ".join(os.path.basename(p) for p in missing))]
    try:
        post = pq.read_table(post_path)
        dls = pq.read_table(dl_path)
    except Exception as e:  # unreadable parquet IS the finding
        return [(name, "files", 2, 1, f"unreadable: {e}")]
    rows.append((name, "files", 2, 0, ""))

    terms = post["term"].to_pylist()
    # --- term_order: strictly ascending UTF-16 code-unit order ---
    if any_needs_utf16(terms):
        keys = [utf16_key(t) for t in terms]
    else:  # code-point order == code-unit order below U+E000
        keys = terms
    n_disorder = sum(1 for a, b in zip(keys, keys[1:]) if not a < b)
    rows.append((name, "term_order", len(terms), n_disorder,
                 "" if not n_disorder else "non-ascending or duplicate terms"))

    # --- doc_lens table ---
    dl_ids = np.asarray(dls["doc_id"].to_pylist(), dtype=np.int64)
    dl_vals = np.asarray(dls["dl"].to_pylist(), dtype=np.int64)
    fielded = "field" in dls.schema.names
    if fielded:
        dl_fields = dls["field"].to_pylist()
        dl_map = {(f, int(d)): int(v)
                  for f, d, v in zip(dl_fields, dl_ids, dl_vals)}
        n_dl_dups = len(dl_ids) - len(dl_map)
        seg_docs = len({int(d) for d in dl_ids})
    else:
        dl_map = {int(d): int(v) for d, v in zip(dl_ids, dl_vals)}
        n_dl_dups = len(dl_ids) - len(dl_map)
        seg_docs = len(dl_map)
    bad_dl = n_dl_dups
    detail = []
    if n_dl_dups:
        detail.append(f"{n_dl_dups} duplicate doc_len rows")
    out_of_range = int(((dl_ids < min_doc) | (dl_ids > max_doc)).sum())
    if out_of_range:
        bad_dl += out_of_range
        detail.append(f"{out_of_range} doc_ids outside [{min_doc},{max_doc}]")
    if seg_docs != n_docs:
        bad_dl += 1
        detail.append(f"n_docs {seg_docs} != manifest {n_docs}")
    if int(dl_vals.sum()) != n_tokens:
        bad_dl += 1
        detail.append(f"sum(dl) {int(dl_vals.sum())} != manifest n_tokens {n_tokens}")
    rows.append((name, "doc_lens", len(dl_ids), bad_dl, "; ".join(detail)))

    # --- postings / positions / block stats ---
    n_post = n_post_bad = 0
    n_pos = n_pos_bad = 0
    n_blk = n_blk_bad = 0
    post_detail: list[str] = []
    pos_detail: list[str] = []
    blk_detail: list[str] = []

    def _note(lst, msg):
        if len(lst) < 3:
            lst.append(msg)

    # column-at-a-time materialization: per-cell .as_py() in a
    # many-million-term loop is the difference between a minutes-long
    # maintenance job and an hours-long one
    dfs_l = post["df"].to_pylist()
    cfs_l = post["cf"].to_pylist()
    doc_blobs = post["doc_blob"].to_pylist()
    tf_blobs = post["tf_blob"].to_pylist()
    dl_blobs = post["dl_blob"].to_pylist()
    pos_blobs = post["pos_blob"].to_pylist()
    blk_cols = {k: post[k].to_pylist()
                for k in ("blk_min_doc", "blk_max_doc", "blk_max_tf",
                          "blk_min_dl")}

    for i in range(post.num_rows):
        term = terms[i]
        df = int(dfs_l[i])
        cf = int(cfs_l[i])
        try:
            doc_ids, tfs = decode_postings(doc_blobs[i], tf_blobs[i])
            dl_arr = vbyte_decode(dl_blobs[i]).astype(np.int64)
            if not (len(doc_ids) == len(tfs) == len(dl_arr)):
                raise ValueError("parallel posting arrays disagree in length")
        except Exception as e:  # a blob that won't decode IS the finding
            n_post += max(df, 1)
            n_post_bad += 1
            _note(post_detail, f"{term!r}: undecodable postings ({e})")
            continue
        n_post += df
        bad = 0
        if len(doc_ids) != df:
            bad += 1; _note(post_detail, f"{term!r}: df {df} != {len(doc_ids)} docs")
        if int(tfs.sum()) != cf:
            bad += 1; _note(post_detail, f"{term!r}: cf {cf} != sum(tf)")
        if len(doc_ids) and (np.diff(doc_ids) <= 0).any():
            bad += 1; _note(post_detail, f"{term!r}: docIDs not strictly ascending")
        if len(doc_ids) and (int(doc_ids[0]) < min_doc or int(doc_ids[-1]) > max_doc):
            bad += 1; _note(post_detail, f"{term!r}: docID outside manifest range")
        if (tfs < 1).any():
            bad += 1; _note(post_detail, f"{term!r}: tf < 1")
        if (tfs > dl_arr).any():
            bad += 1; _note(post_detail, f"{term!r}: tf > dl")
        # inline dl must agree with the doc_lens table
        if fielded and FIELD_SEP in term:
            fld = term.split(FIELD_SEP, 1)[0]
            expect = [dl_map.get((fld, int(d)), -1) for d in doc_ids]
        else:
            expect = [dl_map.get(int(d), -1) for d in doc_ids]
        if list(dl_arr) != expect:
            bad += 1; _note(post_detail, f"{term!r}: inline dl != doc_lens table")
        n_post_bad += bad

        if pos_blobs[i]:
            try:
                pos = decode_positions(pos_blobs[i], tfs)
            except Exception as e:
                n_pos_bad += 1
                _note(pos_detail, f"{term!r}: undecodable positions ({e})")
                pos = []
            for j, p in enumerate(pos):
                n_pos += len(p)
                pbad = 0
                if len(p) != int(tfs[j]):
                    pbad += 1
                    _note(pos_detail, f"{term!r}: position count != tf")
                if len(p) and (int(p[0]) < 0 or (np.diff(p) <= 0).any()):
                    pbad += 1
                    _note(pos_detail, f"{term!r}: positions not strictly ascending")
                n_pos_bad += pbad

        # block stats recompute (the WAND safety contract) — shape from
        # the DECODED list, never the stored df (which may be the lie)
        n_decoded = len(doc_ids)
        n_blocks = (n_decoded + BLOCK_SIZE - 1) // BLOCK_SIZE
        n_blk += n_blocks
        pad = n_blocks * BLOCK_SIZE - n_decoded

        def _blk(arr, fn):
            a = (np.concatenate([arr, np.full(pad, arr[-1], dtype=arr.dtype)])
                 if pad else arr)
            return fn(a.reshape(n_blocks, BLOCK_SIZE), axis=1)

        if n_decoded:
            stored = {k: np.asarray(blk_cols[k][i]) for k in blk_cols}
            recomputed = {
                "blk_min_doc": _blk(doc_ids, np.min),
                "blk_max_doc": _blk(doc_ids, np.max),
                "blk_max_tf": _blk(tfs, np.max),
                "blk_min_dl": _blk(dl_arr, np.min),
            }
            for k in stored:
                if (len(stored[k]) != n_blocks
                        or (stored[k] != recomputed[k]).any()):
                    n_blk_bad += 1
                    _note(blk_detail, f"{term!r}: {k} mismatch")

    rows.append((name, "postings", n_post, n_post_bad, "; ".join(post_detail)))
    rows.append((name, "positions", n_pos, n_pos_bad, "; ".join(pos_detail)))
    rows.append((name, "block_stats", n_blk, n_blk_bad, "; ".join(blk_detail)))
    return rows


def _store_checks(index_dir: str, manifest: dict) -> list[tuple]:
    """Driver-side metadata checks — all bounded (manifests, deletes
    sidecar, directory listing), never corpus-sized."""
    rows: list[tuple] = []
    mdir = os.path.join(index_dir, "manifest")
    # match the manifest protocol's own listing (segments_<gen>.json) —
    # a stray temp/partial file in manifest/ must not read as corruption
    gens = sorted(
        f for f in os.listdir(mdir)
        if f.startswith("segments_") and f.endswith(".json")
    )
    n_bad = 0
    referenced: set[str] = set()
    for g in gens:
        try:
            m = json.load(open(os.path.join(mdir, g)))
            referenced.update(s["name"] for s in m["segments"])
        except Exception:
            n_bad += 1
    live = manifest["segments"]
    missing_dirs = [s["name"] for s in live
                    if not os.path.isdir(os.path.join(index_dir, "segments", s["name"]))]
    n_bad += len(missing_dirs)
    spans = sorted((s["min_doc"], s["max_doc"], s["name"]) for s in live)
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if b[0] <= a[1])
    n_bad += overlaps
    detail = []
    if missing_dirs:
        detail.append("missing dirs: " + ", ".join(missing_dirs[:3]))
    if overlaps:
        detail.append(f"{overlaps} overlapping doc ranges")
    rows.append(("_store", "manifest", len(gens) + len(live), n_bad,
                 "; ".join(detail)))

    del_path = os.path.join(index_dir, "deletes.json")
    if os.path.exists(del_path):
        try:
            dels = json.load(open(del_path))
            ids = dels if isinstance(dels, list) else dels.get("doc_ids", [])
            inside = sum(
                1 for d in ids
                if any(s["min_doc"] <= d <= s["max_doc"] for s in live)
            )
            rows.append(("_store", "deletes", len(ids), len(ids) - inside,
                         "" if inside == len(ids) else "doc_ids outside all segments"))
        except Exception as e:
            rows.append(("_store", "deletes", 1, 1, f"unreadable: {e}"))

    seg_root = os.path.join(index_dir, "segments")
    on_disk = set(os.listdir(seg_root)) if os.path.isdir(seg_root) else set()
    orphans = sorted(on_disk - referenced)
    rows.append(("_store", "orphans", len(on_disk), 0,
                 "" if not orphans else
                 f"{len(orphans)} unreferenced (gc candidates): "
                 + ", ".join(orphans[:3])))
    return rows


def check_index(
    spark: SparkSession, index_dir: str, generation: int | None = None
) -> DataFrame:
    """Verify every on-disk invariant of a committed index.

    Returns (segment, check, n_checked, n_bad, detail); an intact index
    has n_bad == 0 on every row. Segments are checked in parallel (one
    task each, no shuffle); store-level metadata checks run on the
    driver over bounded inputs."""
    manifest = read_manifest(index_dir, generation)
    segs = [(s["name"], int(s["min_doc"]), int(s["max_doc"]),
             int(s["n_docs"]), int(s["n_tokens"]))
            for s in manifest["segments"]]
    idir = index_dir

    def _run(iterator: Iterator) -> Iterator:
        import pandas as pd

        for pdf in iterator:
            out = []
            for r in pdf.itertuples(index=False):
                out.extend(_check_segment(idir, r.name, r.min_doc, r.max_doc,
                                          r.n_docs, r.n_tokens))
            yield pd.DataFrame(
                out, columns=["segment", "check", "n_checked", "n_bad", "detail"]
            )

    seg_df = spark.createDataFrame(
        segs, "name string, min_doc long, max_doc long, n_docs long, n_tokens long"
    ).repartition(max(1, len(segs)))
    per_seg = seg_df.mapInPandas(_run, _SCHEMA)
    store_rows = _store_checks(index_dir, manifest)
    return per_seg.unionByName(spark.createDataFrame(store_rows, _SCHEMA))
