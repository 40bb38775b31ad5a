"""Continuous crawl indexing: a WARC drop directory streamed into the
segment store.

The batch crawl build (`index/warc_build.py`) indexes a fixed file list;
a live crawl DELIVERS files continuously. This module drives the same
zero-shuffle per-file build from a Structured Streaming file source:

    readStream(binaryFile, paths only) -> foreachBatch:
        assign stable file indices from a persistent ledger ->
        build_segments_from_warc(batch files) -> optional merge

Exactly-once composes three idempotent layers exactly like
`streaming/ingest.py`: the stream checkpoint replays at-least-once, the
files LEDGER (files.json next to the manifest, atomic rename) hands a
replayed file the same docID base it had, and the per-file segment
checkpoint makes the rebuild a no-op. The ledger is driver-side but
bounded by file COUNT (a 64k-file crawl is a 64k-entry dict), never by
corpus size.

The binaryFile source is used for its file discovery/offset tracking
only — the plan selects just `path`, so content bytes are pruned at the
source and the page data still enters exactly one process: the python
task that indexes the file.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

from pyspark.sql import SparkSession

from clucene_spark.index.merge import maybe_merge
from clucene_spark.index.warc_build import DEFAULT_STRIDE, build_segments_from_warc


def _ledger_path(index_dir: str) -> str:
    return os.path.join(index_dir, "files.json")


def read_file_ledger(index_dir: str) -> dict[str, int]:
    p = _ledger_path(index_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as fh:
        return {k: int(v) for k, v in json.load(fh).items()}


def assign_file_indices(
    index_dir: str, names: Iterable[str]
) -> dict[str, int]:
    """Grow the persistent name->index ledger with any new basenames
    (sorted, so one batch's assignment is deterministic) and return the
    full mapping. Atomic rename keeps a crash from corrupting it; a
    replayed batch re-reads the same indices and assigns nothing."""
    ledger = read_file_ledger(index_dir)
    nxt = max(ledger.values(), default=-1) + 1
    for name in sorted(set(names)):
        if name not in ledger:
            ledger[name] = nxt
            nxt += 1
    tmp = _ledger_path(index_dir) + ".tmp"
    os.makedirs(index_dir, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(ledger, fh, sort_keys=True)
    os.replace(tmp, _ledger_path(index_dir))
    return ledger


def _strip_scheme(p: str) -> str:
    """Spark's file-source path column is a URI: strip the scheme AND
    percent-decoding ('my%20crawl.warc.gz' is really 'my crawl.warc.gz'
    on disk — open() on the encoded form is FileNotFoundError and a
    permanently wedged stream on replay)."""
    from urllib.parse import unquote

    if p.startswith("file:"):
        p = p[len("file:"):]
        return unquote(p)
    return p


def stream_warc_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    glob: str = "*.warc*",
    analyzer: str = "standard",
    stride: int = DEFAULT_STRIDE,
    wet: bool = False,
    checkpoint_dir: str | None = None,
    merge_every_batch: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    normalize: bool = True,
):
    """Start (and with available_now=True, drain) the crawl-directory
    stream into the segment store. Returns the StreamingQuery.
    ``max_files_per_trigger`` bounds each micro-batch (availableNow
    still drains everything, in several batches)."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(source_dir).select("path")

    def _ingest(batch_df, batch_id: int) -> None:
        paths = [_strip_scheme(r["path"]) for r in batch_df.collect()]
        if not paths:
            return
        ledger = assign_file_indices(
            index_dir, (os.path.basename(p) for p in paths)
        )
        build_segments_from_warc(
            spark,
            paths,
            index_dir,
            analyzer=analyzer,
            stride=stride,
            wet=wet,
            normalize=normalize,
            resume=True,
            file_indices={p: ledger[os.path.basename(p)] for p in paths},
        )
        if merge_every_batch:
            maybe_merge(spark, index_dir)

    writer = stream.writeStream.foreachBatch(_ingest).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
