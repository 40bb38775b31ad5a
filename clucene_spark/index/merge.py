"""Log-structured segment merging (the IndexWriter merge path).

Ports the *policy* of CLucene's LogDocMergePolicy (reference
index/MergePolicy.cpp:288-370: geometric leveling, mergeFactor=10 adjacent
same-level segments, LEVEL_LOG_SPAN=0.75 at MergePolicy.cpp:114) and
restates the *mechanism* of SegmentMerger::merge (SegmentMerger.cpp:119-467)
as a Spark job:

    read N segments' postings (compressed blobs, NOT exploded rows)
      -> repartitionByRange(term)                      [the one shuffle]
      -> per term-range: k-way merge each term's per-segment posting lists
         sorted by doc_id, re-encode (delta-gap + varbyte + block stats)
      -> executors write the merged segment's parquet parts directly
      -> driver commits the next manifest generation, GCs inputs

This is the north rule's "log-structured multi-way segment merge expressed
as repartition-by-term-range + sort-merge". Shuffle volume ≈ compressed
index bytes (blobs travel encoded); nothing is collected to the driver.

docID rebase: our doc_ids are corpus-global so same-corpus compaction needs
no rebase; `doc_base` shifts a FOREIGN index being bulk-added (the
IndexWriter::addIndexes pattern, reference IndexWriter.cpp:1157-1315, base
arithmetic SegmentMerger.cpp:478-506).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession, functions as F, types as T

from clucene_spark.index.codec import (
    decode_positions,
    decode_postings,
    encode_postings,
    vbyte_decode,
)
from clucene_spark.index.segments import (
    clear_deletes,
    commit_manifest,
    gc_segments,
    read_deletes,
    read_manifest,
)

MERGE_FACTOR = 10       # reference index/MergePolicy.h:238
LEVEL_LOG_SPAN = 0.75   # reference index/MergePolicy.cpp:114


def find_merges(segments: list[dict], merge_factor: int = MERGE_FACTOR) -> list[list[str]]:
    """LogDocMergePolicy::findMerges port: bucket segments into geometric
    levels by log_mergeFactor(n_docs); each run of merge_factor adjacent
    segments within LEVEL_LOG_SPAN below the window's top level merges.

    Returns lists of segment names (each list = one merge job).
    """
    if not segments:
        return []
    logs = [math.log(max(s["n_docs"], 1)) / math.log(merge_factor) for s in segments]
    merges: list[list[str]] = []
    start, n = 0, len(segments)
    while start < n:
        max_level = max(logs[start:])
        level_bottom = max(0.0, max_level - LEVEL_LOG_SPAN)
        # rightmost segment still inside this level band
        upto = n - 1
        while upto >= start and logs[upto] < level_bottom:
            upto -= 1
        # full merge_factor windows inside [start, upto]
        end = start + merge_factor
        while end <= upto + 1:
            merges.append([s["name"] for s in segments[start:end]])
            start = end
            end = start + merge_factor
        start = max(start, upto + 1)
    return merges


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    names: list[str],
    with_positions: bool = True,
    doc_base: int = 0,
    gc: bool = True,
    extra_entries: dict[str, dict] | None = None,
) -> str:
    """Merge the named segments into one new segment; commit + GC.

    doc_base shifts every docID (the addIndexes rebase); 0 for same-corpus
    compaction. Returns the new segment name.

    extra_entries supplies manifest-style metadata (min_doc/max_doc/...)
    for input names that are NOT in the live manifest — the addIndexes
    staging path, which must never commit its unrebased foreign ranges
    where a reader could see them."""
    seg_root = os.path.join(index_dir, "segments")
    new_name = "seg_m_" + uuid.uuid4().hex[:12]
    tmp_root = os.path.join(seg_root, new_name + ".tmp")
    os.makedirs(os.path.join(tmp_root, "postings.parquet"), exist_ok=True)

    post_paths = [os.path.join(seg_root, n, "postings.parquet") for n in names]
    dl_paths = [os.path.join(seg_root, n, "doc_lens.parquet") for n in names]

    posts = spark.read.parquet(*post_paths)
    wp = with_positions
    base = int(doc_base)
    # merge physically purges buffered deletions from the segments it
    # rewrites (SegmentMerger skips deleted docs, SegmentMerger.cpp merge
    # loop); the deletes file stays until optimize() has rewritten ALL
    # segments, after which surviving entries are no-ops anyway.
    deleted = np.array(sorted(read_deletes(index_dir)), dtype=np.int64)
    out_dir = os.path.join(tmp_root, "postings.parquet")

    n_part = max(2, spark.sparkContext.defaultParallelism // 2)
    # range-partition THEN sort, so the reducer sees each term as one
    # contiguous run and never holds more than one term's postings (plus a
    # small output buffer) in memory — the same bound the reference's
    # priority-queue merge has (SegmentMerger::mergeTermInfos). A dict of
    # the whole term-range partition would OOM at a 100x index. The range
    # key is encode(term,'UTF-16BE') so the merged dictionary comes out in
    # the reference's UTF-16 code-unit order (TermInfosWriter.cpp:108-140;
    # binary comparison is unsigned lexicographic == code-unit order).
    ranged = (
        posts.withColumn("__u16", F.encode("term", "UTF-16BE"))
        .repartitionByRange(n_part, "__u16")
        .sortWithinPartitions("__u16")
        .drop("__u16")
    )

    stat_schema = T.StructType(
        [
            T.StructField("n_terms", T.LongType(), False),
            T.StructField("n_postings", T.LongType(), False),
        ]
    )
    FLUSH_TERMS = 512  # encoded rows buffered before a ParquetWriter flush

    def _merge_part(pdfs):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        out_schema = pa.schema(
            [
                ("term", pa.string()), ("df", pa.int64()), ("cf", pa.int64()),
                ("doc_blob", pa.binary()), ("tf_blob", pa.binary()),
                ("dl_blob", pa.binary()), ("pos_blob", pa.binary()),
                ("blk_min_doc", pa.list_(pa.int64())),
                ("blk_max_doc", pa.list_(pa.int64())),
                ("blk_max_tf", pa.list_(pa.int64())),
                ("blk_min_dl", pa.list_(pa.int64())),
            ]
        )
        tc = TaskContext.get()
        part_id = tc.partitionId() if tc else 0
        out_path = os.path.join(out_dir, f"part_{part_id:05d}.parquet")
        writer = None
        buf_rows: list[tuple] = []
        all_terms: list[str] = []
        n_terms = 0
        n_postings = 0
        cur_term = None
        cur_rows: list = []

        def _flush_buf():
            nonlocal writer
            if not buf_rows:
                return
            cols = list(zip(*buf_rows))
            tab = pa.table(
                {
                    name: pa.array(list(cols[i]), out_schema.field(i).type)
                    for i, name in enumerate(out_schema.names)
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out_path, out_schema)
            writer.write_table(tab)
            buf_rows.clear()

        def _encode_current():
            nonlocal n_terms, n_postings
            docs_list, tfs_list, dls_list, pos_rows = [], [], [], []
            # positions are all-or-none PER TERM: if any merged input row
            # lacks pos_blob (e.g. addIndexes of a positions-free index),
            # the merged term drops positions rather than misaligning them.
            have_pos = wp
            for r in cur_rows:
                d, t = decode_postings(bytes(r.doc_blob), bytes(r.tf_blob))
                dls = vbyte_decode(bytes(r.dl_blob)).astype(np.int64)
                if base:
                    d = d + base
                docs_list.append(d)
                tfs_list.append(t)
                dls_list.append(dls)
                if wp:
                    pb = r.pos_blob
                    # Arrow nulls surface as None OR NaN through pandas
                    if not isinstance(pb, (bytes, bytearray)):
                        have_pos = False
                    else:
                        pos_rows.append(decode_positions(bytes(pb), t))
            docs = np.concatenate(docs_list)
            tfs = np.concatenate(tfs_list)
            dls = np.concatenate(dls_list)
            order = np.argsort(docs, kind="stable")
            if deleted.size:
                order = order[~np.isin(docs[order], deleted)]
                if not order.size:
                    return
            poss = None
            if have_pos and pos_rows:
                flat = [p for row_ps in pos_rows for p in row_ps]
                poss = [flat[i] for i in order]
            enc = encode_postings(docs[order], tfs[order], dls[order], poss)
            buf_rows.append(
                (
                    cur_term, enc["df"], int(tfs[order].sum()),
                    enc["doc_blob"], enc["tf_blob"], enc["dl_blob"],
                    enc["pos_blob"] if poss is not None else None,
                    enc["blk_min_doc"].tolist(), enc["blk_max_doc"].tolist(),
                    enc["blk_max_tf"].tolist(), enc["blk_min_dl"].tolist(),
                )
            )
            all_terms.append(cur_term)
            n_terms += 1
            n_postings += enc["df"]

        for pdf in pdfs:
            for row in pdf.itertuples():
                if row.term != cur_term:
                    if cur_term is not None and cur_rows:
                        _encode_current()
                        if len(buf_rows) >= FLUSH_TERMS:
                            _flush_buf()
                    cur_term = row.term
                    cur_rows = []
                cur_rows.append(row)
        if cur_term is not None and cur_rows:
            _encode_current()
        _flush_buf()
        if writer is not None:
            writer.close()
            from clucene_spark.index.segments import _write_term_index

            _write_term_index(
                tmp_root, all_terms, part_file=f"part_{part_id:05d}.parquet"
            )
        yield pd.DataFrame({"n_terms": [n_terms], "n_postings": [n_postings]})

    stats = ranged.mapInPandas(_merge_part, stat_schema).agg(
        F.sum("n_terms").alias("n_terms"), F.sum("n_postings").alias("n_postings")
    ).collect()[0]

    # merged doc_lens: executor-written union (rebased if foreign, purged
    # of deletions via anti-join — never a driver-side isin list)
    dl_all = spark.read.parquet(*dl_paths)
    if base:
        # rebase in place: fielded stores carry extra columns (field)
        dl_all = dl_all.withColumn("doc_id", F.col("doc_id") + base)
    if deleted.size:
        del_df = spark.createDataFrame(
            [(int(x),) for x in deleted], "doc_id long"
        )
        dl_all = dl_all.join(F.broadcast(del_df), "doc_id", "left_anti")
    # exact post-purge manifest stats from the rows actually written:
    # summing the gone entries' n_tokens would keep deleted docs' tokens,
    # and count() on a fielded store counts (doc, field) rows, not docs —
    # either way fsck would then flag the healthy merged segment
    dl_stats = dl_all.agg(
        F.countDistinct("doc_id").alias("nd"), F.sum("dl").alias("nt")
    ).collect()[0]
    n_docs_merged = int(dl_stats["nd"] or 0)
    n_tokens_merged = int(dl_stats["nt"] or 0)
    dl_all.repartitionByRange(max(1, n_part // 4), "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.mode("overwrite").parquet(os.path.join(tmp_root, "doc_lens.parquet"))

    # term vectors merge (SegmentMerger::mergeVectors): the forward index
    # is per-doc rows, so merging = union + rebase + delete-purge; doc-sorted
    # so per-doc reads prune row groups
    tv_paths = [os.path.join(seg_root, n, "term_vectors.parquet") for n in names]
    if all(os.path.exists(p) for p in tv_paths):
        tv_all = spark.read.parquet(*tv_paths)
        if base:
            tv_all = tv_all.withColumn("doc_id", F.col("doc_id") + base)
        if deleted.size:
            del_df2 = spark.createDataFrame(
                [(int(x),) for x in deleted], "doc_id long"
            )
            tv_all = tv_all.join(F.broadcast(del_df2), "doc_id", "left_anti")
        tv_all.withColumn("__u16", F.encode("term", "UTF-16BE")).repartitionByRange(
            max(1, n_part // 4), "doc_id"
        ).sortWithinPartitions("doc_id", "__u16").drop("__u16").write.mode(
            "overwrite"
        ).parquet(
            os.path.join(tmp_root, "term_vectors.parquet")
        )

    # crawl-urls sidecar (re-crawl supersedence metadata): union + rebase
    # + delete-purge like any per-doc forward data; merged for whichever
    # inputs carry it, so compaction never destroys capture metadata
    url_paths = [os.path.join(seg_root, n, "urls.parquet") for n in names]
    have_urls = [p for p in url_paths if os.path.exists(p)]
    if have_urls:
        u_all = spark.read.parquet(*have_urls)
        if base:
            u_all = u_all.withColumn("doc_id", F.col("doc_id") + base)
        if deleted.size:
            del_df3 = spark.createDataFrame(
                [(int(x),) for x in deleted], "doc_id long"
            )
            u_all = u_all.join(F.broadcast(del_df3), "doc_id", "left_anti")
        u_all.repartitionByRange(
            max(1, n_part // 4), "doc_id"
        ).sortWithinPartitions("doc_id").write.mode("overwrite").parquet(
            os.path.join(tmp_root, "urls.parquet")
        )

    final_dir = os.path.join(seg_root, new_name)
    os.rename(tmp_root, final_dir)  # atomic publish

    # commit: replace merged inputs with the new segment
    manifest = read_manifest(index_dir)
    merged_away = set(names)
    kept = [s for s in manifest["segments"] if s["name"] not in merged_away]
    gone = [s for s in manifest["segments"] if s["name"] in merged_away]
    if extra_entries:
        # staged inputs (addIndexes) are intentionally NOT in the live
        # manifest; their metadata arrives via this parameter
        listed = {s["name"] for s in gone}
        gone += [extra_entries[n] for n in names
                 if n in extra_entries and n not in listed]
    new_entry = {
        "name": new_name,
        "min_doc": min(s["min_doc"] for s in gone) + base,
        "max_doc": max(s["max_doc"] for s in gone) + base,
        "n_docs": n_docs_merged,
        "n_tokens": n_tokens_merged,
        "n_terms": int(stats["n_terms"]),
    }
    segments = sorted(kept + [new_entry], key=lambda s: s["min_doc"])
    commit_manifest(index_dir, segments, extra={"merged": names, "into": new_name})
    # checkpoints of merged-away ranges stay (resume bookkeeping is by doc
    # range, still covered by the merged segment); GC removes old dirs
    if gc:
        gc_segments(index_dir)
    return new_name


def maybe_merge(
    spark: SparkSession, index_dir: str, merge_factor: int = MERGE_FACTOR
) -> list[str]:
    """Run the merge policy to fixpoint (the ConcurrentMergeScheduler loop,
    executed synchronously as a scheduled compaction job)."""
    created: list[str] = []
    while True:
        manifest = read_manifest(index_dir)
        merges = find_merges(manifest["segments"], merge_factor)
        if not merges:
            return created
        for names in merges:
            created.append(merge_segments(spark, index_dir, names))


def optimize(spark: SparkSession, index_dir: str) -> str:
    """Merge everything into one segment (IndexWriter::optimize,
    reference IndexWriter.cpp:802-874)."""
    manifest = read_manifest(index_dir)
    names = [s["name"] for s in manifest["segments"]]
    if len(names) == 1 and not read_deletes(index_dir):
        return names[0]
    out = merge_segments(spark, index_dir, names)
    # every live segment was rewritten -> all buffered deletes are purged
    clear_deletes(index_dir)
    return out


def add_indexes(
    spark: SparkSession,
    index_dir: str,
    foreign_dir: str,
    doc_base: int,
) -> str:
    """Bulk-union a foreign index with docID rebase (IndexWriter::addIndexes,
    reference IndexWriter.cpp:1157-1315): merge ALL foreign segments into one
    rebased segment registered in THIS index's manifest."""
    foreign = read_manifest(foreign_dir)
    f_names = [s["name"] for s in foreign["segments"]]
    seg_root = os.path.join(index_dir, "segments")
    os.makedirs(seg_root, exist_ok=True)
    # stage foreign segment dirs under this index so merge_segments can read
    staged = []
    for n in f_names:
        dst = os.path.join(seg_root, f"staged_{n}")
        if not os.path.exists(dst):
            shutil.copytree(os.path.join(foreign_dir, "segments", n), dst)
        staged.append(f"staged_{n}")
    # the staged dirs are NEVER committed to the manifest: their doc
    # ranges are unrebased (they'd collide with the host index's), so a
    # reader — or a crash before the merge commit — must not see them.
    # merge_segments gets their metadata out-of-band; the only commit is
    # the post-merge one, which lists the rebased product atomically.
    fseg = {s["name"]: s for s in foreign["segments"]}
    staged_entries = {f"staged_{n}": {**fseg[n], "name": f"staged_{n}"}
                      for n in f_names}
    return merge_segments(spark, index_dir, staged, doc_base=doc_base,
                          extra_entries=staged_entries)
