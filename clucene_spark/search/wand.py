"""Block-max WAND top-k BM25 over the persistent segment store.

The distributed plan mirrors MultiSearcher's scatter-gather (reference
search/MultiSearcher.cpp:122-152) with the global-statistics first pass
(MultiSearcher.cpp:72-74):

  1. stats pass   : global df per query term + (n_docs, avgdl) — one tiny
                    aggregation over the segment dictionaries.
  2. segment scan : postings rows for ONLY the query terms (term predicate
                    pushed into the parquet scan; terms are sorted within a
                    segment so row-group stats prune like the .tii index).
  3. per-segment  : applyInPandas group per segment runs doc-at-a-time
                    block-max WAND (decode varbyte blobs -> numpy; pivot on
                    term upper bounds; skip blocks whose block-max BM25
                    bound can't beat the running threshold — the skip-list
                    skipTo of SegmentTermDocs.cpp:128-155 plus the
                    max-score metadata the north star names).
  4. global merge : ORDER BY score DESC, doc_id ASC LIMIT k — Spark's
                    TakeOrderedAndProject, i.e. per-partition bounded PQ +
                    driver merge (HitQueue semantics, HitQueue.cpp:100-105).

WAND returns the EXACT top-k (pruning is safe: a block is skipped only when
its upper bound cannot enter the heap), so results are rank-identical to
the naive full-scoring plan — asserted in tests/test_wand.py.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from clucene_spark.index.codec import decode_postings, vbyte_decode
from clucene_spark.index.segments import SegmentStore

K1 = 1.2
B = 0.75

HIT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def bm25_idf(df: int, n_docs: int) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def _bm25(tf, dl, idf: float, avgdl: float):
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


class _TermCursor:
    """Decoded posting list + block metadata + a moving pointer."""

    __slots__ = ("docs", "tfs", "dls", "idf", "blk_max_doc", "blk_ub", "ub", "i", "n")

    def __init__(self, docs, tfs, dls, idf, blk_max_doc, blk_max_tf, blk_min_dl, avgdl):
        self.docs = docs
        self.tfs = tfs
        self.dls = dls
        self.idf = idf
        self.blk_max_doc = np.asarray(blk_max_doc, dtype=np.int64)
        # block-max BM25 upper bound: score is increasing in tf, decreasing
        # in dl, so score(max_tf, min_dl) bounds every posting in the block
        self.blk_ub = _bm25(
            np.asarray(blk_max_tf, dtype=np.float64),
            np.asarray(blk_min_dl, dtype=np.float64),
            idf,
            avgdl,
        )
        self.ub = float(self.blk_ub.max()) if len(self.blk_ub) else 0.0
        self.i = 0
        self.n = len(docs)

    @property
    def doc(self) -> int:
        return int(self.docs[self.i]) if self.i < self.n else 2**62

    def skip_to(self, target: int) -> None:
        if self.i < self.n and self.docs[self.i] < target:
            self.i += int(np.searchsorted(self.docs[self.i :], target, side="left"))

    def block_ub_at(self, doc: int) -> float:
        """Upper bound of the block containing the first posting >= doc."""
        b = int(np.searchsorted(self.blk_max_doc, doc, side="left"))
        if b >= len(self.blk_ub):
            return 0.0
        return float(self.blk_ub[b])

    def block_end_at(self, doc: int) -> int:
        b = int(np.searchsorted(self.blk_max_doc, doc, side="left"))
        if b >= len(self.blk_max_doc):
            return 2**62
        return int(self.blk_max_doc[b])


def wand_topk_segment(
    cursors: list[_TermCursor],
    avgdl: float,
    k: int,
    required: int = 1,
    deleted: frozenset = frozenset(),
) -> list[tuple[int, float]]:
    """Doc-at-a-time block-max WAND over one segment's cursors.

    required=1   -> OR semantics (classic WAND top-k)
    required=len -> AND semantics (conjunction; pivot must align all terms)
    Returns exact top-k [(doc_id, score)] with (score desc, doc asc) order.
    """
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of size k
    theta = 0.0

    def push(doc: int, score: float):
        nonlocal theta
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
            if len(heap) == k:
                theta = heap[0][0]
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
            theta = heap[0][0]

    n_terms = len(cursors)
    required = max(1, min(required, n_terms))

    while True:
        live = [c for c in cursors if c.i < c.n]
        if len(live) < required:
            break
        live.sort(key=lambda c: c.doc)
        # pivot: smallest index where cumulative UB sum could beat theta,
        # and (for AND) at least `required` terms are at or before it
        acc = 0.0
        pivot = -1
        for j, c in enumerate(live):
            acc += c.ub
            if j + 1 >= required and (acc > theta or len(heap) < k):
                pivot = j
                break
        if pivot < 0:
            break
        pivot_doc = live[pivot].doc
        if required == n_terms:
            pivot_doc = live[-1].doc  # conjunction: align on the max doc
            pivot = len(live) - 1

        if live[0].doc == pivot_doc:
            # all cursors [0..pivot] are on pivot_doc candidates — check the
            # block-max refinement before full scoring (the BMW step)
            block_sum = sum(c.block_ub_at(pivot_doc) for c in live[: pivot + 1])
            rest_ub = sum(c.ub for c in live[pivot + 1 :])
            if len(heap) == k and block_sum + rest_ub <= theta:
                # skip to the nearest block boundary past pivot_doc
                next_doc = min(c.block_end_at(pivot_doc) for c in live[: pivot + 1]) + 1
                for c in live[: pivot + 1]:
                    c.skip_to(max(next_doc, pivot_doc + 1))
                continue
            # score pivot_doc fully (dl rides inline in the posting — no
            # doc-table lookup on the scoring hot path)
            matched = 0
            score = 0.0
            for c in cursors:
                c.skip_to(pivot_doc)
                if c.i < c.n and int(c.docs[c.i]) == pivot_doc:
                    matched += 1
                    score += _bm25(float(c.tfs[c.i]), float(c.dls[c.i]), c.idf, avgdl)
                    c.i += 1
            # deletions filter results without touching statistics — the
            # .del check during posting iteration (SegmentTermDocs.cpp:98-100)
            if matched >= required and pivot_doc not in deleted:
                push(pivot_doc, score)
        else:
            # advance the lagging cursors up to the pivot document
            for c in live[: pivot + 1]:
                if c.doc < pivot_doc:
                    c.skip_to(pivot_doc)

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-d, s) for s, d in out]


def wand_query(
    store: SegmentStore,
    terms: list[str],
    k: int = 10,
    mode: str = "OR",
    round_to: int | None = 4,
) -> DataFrame:
    """Distributed block-max WAND top-k over the segment store."""
    terms = list(dict.fromkeys(terms))
    n_docs, avgdl = store.stats()
    # global df pass (MultiSearcher.cpp:72-74 pattern)
    df_rows = (
        store.postings()
        .filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .collect()
    )
    idf_by_term = {r["term"]: bm25_idf(int(r["df"]), n_docs) for r in df_rows}
    live_terms = [t for t in terms if t in idf_by_term]
    required = len(terms) if mode == "AND" else 1
    if (mode == "AND" and len(live_terms) < len(terms)) or not live_terms:
        return store.spark.createDataFrame([], HIT_SCHEMA)
    deleted = frozenset(store.deleted_ids())

    def _wand_one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cursors = []
        for row in pdf.itertuples():
            docs, tfs = decode_postings(row.doc_blob, row.tf_blob)
            dls = vbyte_decode(row.dl_blob).astype(np.int64)
            cursors.append(
                _TermCursor(
                    docs, tfs, dls, idf_by_term[row.term],
                    row.blk_max_doc, row.blk_max_tf, row.blk_min_dl, avgdl,
                )
            )
        if len(cursors) < required:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
        hits = wand_topk_segment(cursors, avgdl, k, required, deleted)
        return pd.DataFrame(
            {"doc_id": [h[0] for h in hits], "score": [h[1] for h in hits]}
        ).astype({"doc_id": "int64", "score": "float64"})

    p = store.postings().filter(F.col("term").isin(live_terms)).select(
        "segment", "term", "doc_blob", "tf_blob", "dl_blob",
        "blk_max_doc", "blk_max_tf", "blk_min_dl",
    )
    hits = p.groupBy("segment").applyInPandas(_wand_one, HIT_SCHEMA)
    if round_to is not None:
        hits = hits.select("doc_id", F.round("score", round_to).alias("score"))
    return hits.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
