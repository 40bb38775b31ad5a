"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a metadata struct, the
standard large-scale layout (payload bytes stay columnar/compressed in
parquet; metadata prunes without touching bytes). Decode / feature-extract
/ resize / frame-sample run as Arrow-batched pandas stages over
mapInPandas — the Spark-side plumbing (schema, batching, partitioning) is
real and tested; the actual codec call is STUBBED deterministically
because no image/audio library ships in this container (each stub raises
NotImplementedError when a real decode is requested, or produces a
deterministic fake when `fake=True`, so pipelines are testable
end-to-end).

At 100 TB: payload columns dominate IO — always select metadata columns
first and filter before touching `payload`; Parquet column pruning means
a metadata-only query never reads the bytes. Feature extraction is
embarrassingly parallel; batch size is bounded by Arrow batch bytes, so
set spark.sql.execution.arrow.maxRecordsPerBatch low (e.g. 64) for
multi-MB payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),   # image | audio | video
        T.StructField("mime", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def attach_media(docs: DataFrame, payload_col: str = "text") -> DataFrame:
    """Demo adapter: wrap a column's bytes as a media table (the testdata
    has no real media, so text bytes stand in as the opaque payload)."""
    payload = F.encode(F.col(payload_col), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/x-fake").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        payload.alias("payload"),
    )


def _decode_real(payload: bytes, kind: str):
    """The real decoder hook. Plug Pillow / torchaudio / pyav here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "run with fake=True or install a decoder"
    )


def _fake_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature vector: md5-seeded bytes -> [0,1).

    Stable across processes/executors (hashlib, not hash()), so tests and
    oracles can replay it."""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((dim * 8) // len(h) + 1))[: dim * 8], dtype=np.uint64)
    return (raw >> np.uint64(11)).astype(np.float64) / float(1 << 53)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("first_byte", T.IntegerType(), False),
        T.StructField("digest60", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """media -> (media_id, n_bytes, first_byte, digest60, features[dim]).

    Arrow-batched; payload bytes never leave the executor. digest60 is the
    same md5-prefix hash the dedup family uses, so media exact-dedup joins
    against the text pipeline for free."""

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, fb, dg, feats = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if not fake:
                    _decode_real(b, "image")
                ids.append(int(mid))
                nbytes.append(len(b))
                fb.append(b[0] if b else -1)
                dg.append(int(hashlib.md5(b).hexdigest()[:15], 16))
                feats.append(_fake_features(b, dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "first_byte": pd.Series(fb, dtype="int32"),
                    "digest60": pd.Series(dg, dtype="int64"),
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(_batch, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: same batching shape as extract_features; the
    pixel work is stubbed (metadata records the intended size)."""

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id"]].copy()
            out["resized_w"] = np.int32(width)
            out["resized_h"] = np.int32(height)
            # real pixel decode+resample goes here (Pillow); payload is
            # passed through untouched in the stub
            out["payload"] = pdf["payload"]
            yield out

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("resized_w", T.IntegerType(), False),
            T.StructField("resized_h", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(_batch, schema)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame. The frame
    count derives deterministically from payload length (stub for a real
    container parse); the explode shape and schema are production-real."""
    n_frames = (F.col("n_bytes") / 100 + 1).cast("int")
    frames = F.sequence(F.lit(0), n_frames - 1)
    sampled = F.filter(frames, lambda i: i % every_n == 0)
    return media.select(
        "media_id",
        F.explode(sampled).alias("frame_no"),
    )
