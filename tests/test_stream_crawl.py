"""Continuous crawl indexing (`streaming/crawl.py`): a WARC drop
directory drained in micro-batches must converge to the SAME index as
the batch build over the same files — across waves, and under replay."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from clucene_spark.data import warc as W
from clucene_spark.index.segments import SegmentStore, read_checkpoints
from clucene_spark.index.warc_build import build_segments_from_warc
from clucene_spark.search.wand import wand_query_direct
from clucene_spark.streaming.crawl import (
    assign_file_indices,
    read_file_ledger,
    stream_warc_ingest,
)

N, K = 180, 30  # 6 files of 30 docs


def test_two_wave_stream_equals_batch_build(spark, tmp_path):
    staging = tmp_path / "staging"
    W.webtext_warc_files(spark, N, str(staging), docs_per_file=K).collect()
    all_files = W.list_warc_paths(str(staging))
    assert len(all_files) == 6

    source = tmp_path / "drop"
    source.mkdir()
    idx = str(tmp_path / "sidx")
    ck = str(tmp_path / "ck")

    for f in all_files[:4]:
        shutil.copy(f, source)
    stream_warc_ingest(spark, str(source), idx, stride=K, checkpoint_dir=ck)
    assert len(read_checkpoints(idx)) == 4
    assert sorted(read_file_ledger(idx).values()) == [0, 1, 2, 3]

    for f in all_files[4:]:
        shutil.copy(f, source)
    stream_warc_ingest(spark, str(source), idx, stride=K, checkpoint_dir=ck)
    cks = read_checkpoints(idx)
    assert len(cks) == 6
    assert sorted(c["min_doc"] for c in cks) == [0, 30, 60, 90, 120, 150]

    batch_idx = str(tmp_path / "bidx")
    build_segments_from_warc(spark, all_files, batch_idx, stride=K).collect()

    sa, sb = SegmentStore(spark, idx), SegmentStore(spark, batch_idx)
    assert sa.doc_lens().count() == sb.doc_lens().count()
    top = [
        r["term"]
        for r in sa.postings().groupBy("term")
        .agg(F.sum("df").alias("df")).orderBy(F.desc("df"), "term")
        .limit(3).collect()
    ]
    a = wand_query_direct(sa, top, k=10).collect()
    b = wand_query_direct(sb, top, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_replay_is_idempotent(spark, tmp_path):
    W.webtext_warc_files(spark, 60, str(tmp_path / "drop"),
                         docs_per_file=30).collect()
    idx = str(tmp_path / "sidx")
    stream_warc_ingest(spark, str(tmp_path / "drop"), idx, stride=30,
                       checkpoint_dir=str(tmp_path / "ck"))
    first = sorted(
        (c["segment"], c["n_docs"]) for c in read_checkpoints(idx)
    )
    # a fresh checkpoint dir replays every file: the ledger hands back the
    # same indices, the segment checkpoints skip the rebuild
    stream_warc_ingest(spark, str(tmp_path / "drop"), idx, stride=30,
                       checkpoint_dir=str(tmp_path / "ck2"))
    assert sorted(
        (c["segment"], c["n_docs"]) for c in read_checkpoints(idx)
    ) == first
    assert sorted(read_file_ledger(idx).values()) == [0, 1]


def test_ledger_assignment_stable_and_growing(tmp_path):
    d = str(tmp_path)
    m1 = assign_file_indices(d, ["b.warc.gz", "a.warc.gz"])
    assert m1 == {"a.warc.gz": 0, "b.warc.gz": 1}
    m2 = assign_file_indices(d, ["c.warc.gz", "a.warc.gz"])
    assert m2 == {"a.warc.gz": 0, "b.warc.gz": 1, "c.warc.gz": 2}
