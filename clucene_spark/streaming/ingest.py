"""Structured Streaming ingestion: micro-batch append into the segment store.

The reference's incremental model is buffered addDocument -> flush ->
background merge (the LSM pipeline, SURVEY §2b); its streaming analogue in
Spark is a readStream source driving `foreachBatch`, where every
micro-batch appends new doc-range segments (build_segments_fused is
idempotent per range via checkpoints) and the merge policy compacts
between batches. Exactly-once comes from the pairing of Structured
Streaming's own checkpoint (source offsets) with our per-range segment
checkpoints: a replayed batch re-encounters its checkpoints and skips.

Ingest contract: each doc_id is delivered with its final text (replays
deliver identical rows). Ranges split across micro-batches are safe: a
partial range keeps its existing piece segment(s); the next batch's rows
are anti-joined against the range's already-indexed doc_ids and only the
remainder builds an additional piece (seg_X_p1, …) — re-delivered rows
vanish in the anti-join, so nothing is double-indexed and nothing is
ever deleted. Merges compact pieces away like any other segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clucene_spark.index.merge import maybe_merge
from clucene_spark.index.segments import build_segments_fused


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    schema: str = "doc_id long, text string",
    docs_per_segment: int = 4096,
    analyzer: str = "standard",
    checkpoint_dir: str | None = None,
    merge_every_batch: bool = False,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) a file-source stream into
    the segment store. Returns the StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        build_segments_fused(
            batch_df,
            index_dir,
            docs_per_segment=docs_per_segment,
            analyzer=analyzer,
            resume=True,
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
