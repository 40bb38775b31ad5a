"""Custom stateful streaming operators via applyInPandasWithState.

The reference engine has no streaming (SURVEY §2e: its incremental path
is the LSM add/flush/merge pipeline, mapped in streaming/ingest.py). This
module covers the other half of the Spark streaming surface the project
brief mandates: arbitrary per-key state with `applyInPandasWithState` —
here, streaming exact-dedup bookkeeping, the stateful form of
pipeline/dedup.exact_dedup for a corpus that arrives as a stream.

Per content key (60-bit md5, byte length) the state holds
(keeper doc_id = min seen, n_copies). Both reducers are commutative and
associative, so the final value per key is independent of batch
boundaries and arrival order — which is what makes the operator
deterministic and lets the batch GROUP BY oracle gate it exactly.

Scale shape: state is hash-partitioned by key across executors (one
shuffle per micro-batch, same as the batch groupBy); state size is one
(long, long) pair per distinct document — the streaming-state analogue
of the dedup hash table, RocksDB-backed on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from clucene_spark.pipeline.dedup import md5_60


def dedup_state_stream(
    docs_stream: DataFrame,
) -> DataFrame:
    """(streaming df with doc_id, text) -> streaming (h, len, keep_id,
    n_copies) updates; one row per content key per batch in which the key
    was touched. Compose with .writeStream (update mode)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = docs_stream.select(
        md5_60(F.col("text")).alias("h"),
        F.length("text").cast("long").alias("len"),
        "doc_id",
    )

    def _fold(key, pdfs, state):
        mn, cnt = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = int(pdf["doc_id"].min())
            mn = m if mn is None or m < mn else mn
            cnt += len(pdf)
        state.update((int(mn), int(cnt)))
        yield pd.DataFrame(
            {"h": [key[0]], "len": [key[1]], "keep_id": [mn], "n_copies": [cnt]}
        )

    return keyed.groupBy("h", "len").applyInPandasWithState(
        _fold,
        outputStructType="h long, len long, keep_id long, n_copies long",
        stateStructType="mn long, cnt long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str = "doc_id long, text string",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    sink_dir: str | None = None,
) -> DataFrame:
    """Drain a file-source stream through the stateful dedup operator
    (availableNow) and return the FINAL per-key table as a batch
    DataFrame: (h, len, keep_id, n_copies).

    KEYED SINK (merge-on-read log): each micro-batch's update rows are
    APPENDED to `sink_dir` as parquet stamped with batch_id — never
    collected to the driver. Because update mode emits, per touched key,
    the complete state so far, the final value for a key is simply its
    row from the LAST batch that touched it: one distributed
    `max_by(struct(...), batch_id)` hash aggregation over the log (the
    same merge-on-read compaction Hudi/Iceberg run, expressed as a
    groupBy). Nothing key-shaped ever materializes on the driver; the
    log is bounded by sum(touched keys per batch) and can be compacted
    with the identical aggregation at any checkpoint."""
    import tempfile

    if sink_dir is None:
        sink_dir = tempfile.mkdtemp(prefix="clucene_dedup_sink_")

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(sink_dir)
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = dedup_state_stream(stream).writeStream.foreachBatch(_append).outputMode(
        "update"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    try:
        log = spark.read.parquet(sink_dir)
    except Exception:  # empty source -> no batches ever written
        return spark.createDataFrame(
            [], "h long, len long, keep_id long, n_copies long"
        )
    return (
        log.groupBy("h", "len")
        .agg(F.max_by(F.struct("keep_id", "n_copies"), "batch_id").alias("s"))
        .select("h", "len", "s.keep_id", "s.n_copies")
    )


def url_dedup_state_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming URL-level dedup: per canonical URL the state holds the
    latest capture (pairwise max over (ts, doc_id)) and the capture
    count — the stateful form of pipeline/urls.url_dedup for a crawl
    that arrives as a stream, which is how Common-Crawl-style input
    actually lands (WARC batches over time). Both reducers (max, count)
    are commutative and associative, so the final per-key value is
    batch-boundary and arrival-order invariant — gateable by the batch
    window oracle exactly.

    Scale shape: canonicalization is Catalyst column math BEFORE the
    state shuffle; state is three longs per canonical URL (the page
    payload never enters state), hash-partitioned across executors,
    RocksDB-backed on a real cluster."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from clucene_spark.pipeline.urls import canonicalize_url

    keyed = pages_stream.select(
        canonicalize_url(F.col("url")).alias("canon_url"),
        F.col("ts").cast("long").alias("ts"),
        "doc_id",
    )

    # a missing WARC-Date arrives as a null ts (pandas: NaN in a float
    # column); treat it as smaller than any real capture time — the
    # batch analogue's max(struct(ts, doc_id)) sorts a null field first,
    # so a dated capture always wins and among undated ones the higher
    # doc_id wins. astype(int) on NaN would kill the whole stream.
    _NULL_TS = -(1 << 62)

    def _fold(key, pdfs, state):
        ts, doc, cnt = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            pdf = pdf.dropna(subset=["doc_id"])
            if len(pdf) == 0:
                continue
            b_ts, b_doc = max(
                zip(pdf["ts"].fillna(_NULL_TS).astype("int64"),
                    pdf["doc_id"].astype("int64"))
            )
            if ts is None or (b_ts, b_doc) > (ts, doc):
                ts, doc = int(b_ts), int(b_doc)
            cnt += len(pdf)
        state.update((int(ts), int(doc), int(cnt)))
        yield pd.DataFrame(
            {
                "canon_url": [key[0]],
                "keep_doc": [doc],
                # surface the no-dated-capture sentinel as a null, the
                # shape the batch analogue produces
                "keep_ts": [None if ts == _NULL_TS else ts],
                "n_copies": [cnt],
            }
        )

    return keyed.groupBy("canon_url").applyInPandasWithState(
        _fold,
        outputStructType=(
            "canon_url string, keep_doc long, keep_ts long, n_copies long"
        ),
        stateStructType="ts long, doc long, cnt long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_url_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str = "doc_id long, ts long, url string",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    sink_dir: str | None = None,
) -> DataFrame:
    """Drain a file-source crawl stream through the stateful URL dedup
    and return the FINAL per-canonical-URL table as a batch DataFrame:
    (canon_url, keep_doc, keep_ts, n_copies). Same keyed merge-on-read
    sink protocol as stream_exact_dedup: update rows append to a
    batch_id-stamped parquet log, final value per key = its row from the
    last batch that touched it (one max_by aggregation, nothing on the
    driver)."""
    import tempfile

    if sink_dir is None:
        sink_dir = tempfile.mkdtemp(prefix="clucene_urldedup_sink_")

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(sink_dir)
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = (
        url_dedup_state_stream(stream)
        .writeStream.foreachBatch(_append)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    try:
        log = spark.read.parquet(sink_dir)
    except Exception:  # empty source -> no batches ever written
        return spark.createDataFrame(
            [], "canon_url string, keep_doc long, keep_ts long, n_copies long"
        )
    return (
        log.groupBy("canon_url")
        .agg(
            F.max_by(
                F.struct("keep_doc", "keep_ts", "n_copies"), "batch_id"
            ).alias("s")
        )
        .select("canon_url", "s.keep_doc", "s.keep_ts", "s.n_copies")
    )
