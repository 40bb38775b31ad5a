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

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def windowed_ingest_stats(
    spark: SparkSession,
    source_dir: str,
    schema: str = "doc_id long, text string, ts timestamp",
    window_dur: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    sink_dir: str | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Event-time tumbling-window ingest stats with a late-data watermark —
    the windowed-aggregation half of the Structured Streaming surface
    (stateful.py carries the applyInPandasWithState half): per window,
    (n_docs, n_tokens) over the arriving corpus.

    APPEND output mode: a window emits EXACTLY ONCE, when the watermark
    (max event time seen − delay) passes its end — finalized aggregates a
    downstream consumer (merge scheduler, corpus dashboard) can act on
    without retraction. Late rows inside the delay still count; rows whose
    window already closed are dropped. (Spark splits the watermark since
    3.4: late-event filtering in batch N uses the watermark computed after
    batch N-1 — one batch of grace — while state eviction/emission uses
    the current one; both sides are asserted batch-by-batch in
    tests/test_streaming.py.) A bounded backfill (availableNow drain)
    finalizes its trailing windows the standard way: the producer appends
    a high-watermark barrier row (far-future ts, e.g. doc_id=-1) whose own
    window never emits — the streaming analogue of a Kafka high-watermark
    marker.

    Scale shape: window state is hash-partitioned by window key across
    executors (RocksDB-backed on a real cluster); per micro-batch the
    aggregation shuffles exactly like the equivalent batch groupBy, with
    map-side partial aggregation.
    """
    import tempfile

    if sink_dir is None:
        sink_dir = tempfile.mkdtemp(prefix="clucene_winstats_")
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="clucene_winstats_ckpt_")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    agg = (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_dur).alias("win"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_docs",
            "n_tokens",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(
        "win_start timestamp, win_end timestamp, n_docs long, n_tokens long"
    ).parquet(sink_dir)
