"""Structured Streaming micro-batch ingestion into the segment store."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from clucene_spark.index.segments import SegmentStore, build_segments_fused
from clucene_spark.search.wand import wand_query_local
from clucene_spark.streaming.ingest import stream_ingest

SF = "/root/testdata/sf0.001"


def test_stream_ingest_matches_batch_build(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two arriving FILES (flat — the file source doesn't recurse) =
    # two micro-batch candidates, range-ordered
    import glob
    import shutil

    for i, cond in enumerate([F.col("doc_id") < 256, F.col("doc_id") >= 256]):
        staging = str(tmp_path / f"stage{i}")
        docs.filter(cond).coalesce(1).write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(part, os.path.join(src, f"b{i}.parquet"))

    d_stream = str(tmp_path / "stream_idx")
    q = stream_ingest(
        spark,
        src,
        d_stream,
        docs_per_segment=128,
        analyzer="standard",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert q.lastProgress is not None

    d_batch = str(tmp_path / "batch_idx")
    build_segments_fused(docs, d_batch, docs_per_segment=128, analyzer="standard")

    s1 = SegmentStore(spark, d_stream)
    s2 = SegmentStore(spark, d_batch)
    assert s1.stats() == s2.stats()
    td1 = {r["term"]: (r["df"], r["cf"]) for r in s1.term_dict().collect()}
    td2 = {r["term"]: (r["df"], r["cf"]) for r in s2.term_dict().collect()}
    assert td1 == td2
    assert wand_query_local(s1, ["spark", "table"], k=10) == wand_query_local(
        s2, ["spark", "table"], k=10
    )

    # restart with the same checkpoint: no new data -> no change
    gen_before = s1.manifest["generation"]
    stream_ingest(
        spark, src, d_stream, docs_per_segment=128,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    s1b = SegmentStore(spark, d_stream)
    assert s1b.stats() == s2.stats()


def test_stateful_stream_dedup_batch_invariant(spark, tmp_path):
    """applyInPandasWithState exact-dedup: the final per-key table equals
    the batch GROUP BY, and is IDENTICAL whether the source arrives as
    one micro-batch or one-file-at-a-time (the fold is commutative/
    associative, so batch boundaries can't change the fixpoint)."""
    import pyspark.sql.functions as F

    from clucene_spark.streaming.stateful import stream_exact_dedup

    rows = [(i, ["aa bb", "cc dd ee", "ff"][i % 3]) for i in range(30)]
    rows += [(100 + i, f"unique text {i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    src = str(tmp_path / "src")
    # several files so maxFilesPerTrigger=1 forces several micro-batches
    docs.repartition(4).write.parquet(src)

    one = stream_exact_dedup(
        spark, src, checkpoint_dir=str(tmp_path / "ck1")
    )
    many = stream_exact_dedup(
        spark, src, checkpoint_dir=str(tmp_path / "ck2"),
        max_files_per_trigger=1, sink_dir=str(tmp_path / "sink2"),
    )
    # the keyed sink is a genuine multi-batch merge-on-read log: several
    # batch_ids present, and keys touched by >1 batch carry >1 log row —
    # the final table is the max_by(batch_id) compaction, never a driver
    # dict (stream_exact_dedup holds no per-key python state)
    log = spark.read.parquet(str(tmp_path / "sink2"))
    assert log.select("batch_id").distinct().count() > 1
    assert log.count() > log.select("h", "len").distinct().count()
    want = sorted(
        tuple(r)
        for r in docs.groupBy(
            F.expr("conv(substring(md5(text),1,15),16,10)").cast("long").alias("h"),
            F.length("text").cast("long").alias("len"),
        )
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .collect()
    )
    got_one = sorted(tuple(r) for r in one.collect())
    got_many = sorted(tuple(r) for r in many.collect())
    assert got_one == want
    assert got_many == want


def test_windowed_stats_watermark_late_row_semantics(spark, tmp_path):
    """Watermark contract of windowed_ingest_stats, driven batch by batch
    (maxFilesPerTrigger=1): a late row still inside the delay is counted;
    a row whose window already closed is dropped; an un-finalized trailing
    window never emits in append mode."""
    import glob
    import shutil
    import time as _time

    from clucene_spark.streaming.ingest import windowed_ingest_stats

    BASE = 1_704_067_200  # 2024-01-01 00:00 UTC
    M = 60

    def mk(rows):  # (doc_id, minutes-offset)
        return spark.createDataFrame(
            [(i, "a b c", ) + (m,) for i, m in rows],
            "doc_id long, text string, off long",
        ).select(
            "doc_id", "text",
            F.timestamp_seconds(F.lit(BASE) + F.col("off") * M).alias("ts"),
        ).drop("off")

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_file(df, name):
        staging = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.parquet(staging)
        part = glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(part, os.path.join(src, name))
        _time.sleep(0.05)  # distinct mtimes -> deterministic batch order

    # 10-min windows, 5-min watermark delay. Spark splits the watermark:
    # late-event FILTERING in batch N uses the watermark computed after
    # batch N-1 (one batch of grace), while state EVICTION/emission uses
    # the current one — so a too-late row must arrive two batches after
    # the rows that advanced the watermark past its window.
    # batch 0: rows at :10 and :17 -> watermark :12 after the batch
    write_file(mk([(1, 10), (2, 17)]), "b0.parquet")
    # batch 1 (late-filter wm :12): :11 is late-but-open (window end :20
    # > :12 -> counted); :30 advances the watermark to :25, and eviction
    # at batch end finalizes [:10,:20)
    write_file(mk([(4, 11), (5, 30)]), "b1.parquet")
    # batch 2 (late-filter wm :25): :08's window [:00,:10) closed long
    # ago -> DROPPED (no [:00,:10) row may appear in the sink)
    write_file(mk([(3, 8)]), "b2.parquet")

    out = windowed_ingest_stats(
        spark, src,
        window_dur="10 minutes", watermark_delay="5 minutes",
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    rows = {
        int(r["win_start"].timestamp()): (r["n_docs"], r["n_tokens"])
        for r in out.collect()
    }
    # ONLY the closed [:10,:20) window emitted: rows 1, 2, 4 (the late-ok
    # :11 row counted; the too-late :08 row dropped, so no [:00,:10) row;
    # the :30 row's window is still open -> absent)
    assert rows == {BASE + 10 * M: (3, 9)}, rows


def test_stateful_stream_url_dedup_batch_invariant(spark, tmp_path):
    """Streaming URL dedup: the final per-canonical-URL table equals the
    batch latest-wins window, and is identical whether the crawl arrives
    as one micro-batch or one file per trigger — out-of-order captures
    (later ts in an earlier batch) must still win."""
    import pyspark.sql.functions as F

    from clucene_spark.pipeline.urls import canonicalize_url
    from clucene_spark.streaming.stateful import stream_url_dedup

    # 3 captures of page p{k} under noisy variants; ts NOT aligned with
    # doc_id so later batches can carry older captures
    rows = []
    for k in range(8):
        rows.append((k, (k * 7 + 3) % 11, f"https://www.s{k}.example/p?b=2&a=1"))
        rows.append((100 + k, (k * 5) % 11, f"http://s{k}.example/p/?a=1&b=2"))
        rows.append((200 + k, (k * 3 + 1) % 11,
                     f"https://s{k}.example/p?utm_source=x&a=1&b=2"))
    crawl = spark.createDataFrame(rows, "doc_id long, ts long, url string")
    src = str(tmp_path / "usrc")
    crawl.repartition(4).write.parquet(src)

    one = stream_url_dedup(spark, src, checkpoint_dir=str(tmp_path / "uck1"))
    many = stream_url_dedup(
        spark, src, checkpoint_dir=str(tmp_path / "uck2"),
        max_files_per_trigger=1, sink_dir=str(tmp_path / "usink2"),
    )
    want = sorted(
        tuple(r)
        for r in crawl.select(
            canonicalize_url(F.col("url")).alias("canon_url"), "ts", "doc_id"
        )
        .groupBy("canon_url")
        .agg(
            F.max(F.struct("ts", "doc_id"))["doc_id"].alias("keep_doc"),
            F.max(F.struct("ts", "doc_id"))["ts"].alias("keep_ts"),
            F.count("*").alias("n_copies"),
        )
        .collect()
    )
    assert len(want) == 8  # all three variants of a page collapse
    got_one = sorted(tuple(r) for r in one.collect())
    got_many = sorted(tuple(r) for r in many.collect())
    assert got_one == want
    assert got_many == want


def test_stateful_url_dedup_tolerates_null_ts(spark, tmp_path):
    """Regression (r5): a capture with a missing WARC-Date (null ts)
    arrived in pandas as NaN and astype(int) killed the streaming query.
    Null-ts captures must lose to any dated capture (the batch
    max(struct) ordering) and a key with only undated captures must
    yield a null keep_ts."""
    from clucene_spark.streaming.stateful import stream_url_dedup

    rows = [
        (1, None, "https://a.example/p"),   # undated
        (2, 50, "https://a.example/p"),     # dated -> wins
        (3, None, "https://b.example/q"),   # only undated captures
        (4, None, "https://b.example/q"),
    ]
    crawl = spark.createDataFrame(rows, "doc_id long, ts long, url string")
    src = str(tmp_path / "nsrc")
    crawl.write.parquet(src)
    out = stream_url_dedup(spark, src, checkpoint_dir=str(tmp_path / "nck"))
    got = {r["canon_url"]: (r["keep_doc"], r["keep_ts"], r["n_copies"])
           for r in out.collect()}
    assert got["a.example/p"] == (2, 50, 2)
    keep_doc, keep_ts, n = got["b.example/q"]
    assert keep_doc == 4 and keep_ts is None and n == 2
