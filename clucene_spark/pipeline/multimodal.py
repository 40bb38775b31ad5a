"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a metadata struct, the
standard large-scale layout (payload bytes stay columnar/compressed in
parquet; metadata prunes without touching bytes). Decode / feature-extract
/ resize / frame-sample run as Arrow-batched pandas stages over
mapInPandas — the Spark-side plumbing (schema, batching, partitioning) is
real and tested.

Decode itself is REAL for the formats pure stdlib+numpy arithmetic can
parse — PCM WAV (`wave`), 24-bit uncompressed BMP (struct header parse),
PNG (zlib inflate + scanline unfilter + palette expansion; bit depth 8,
color types 0/2/3/6), and baseline JPEG (ITU T.81 sequential DCT:
Huffman + dequant + IDCT + 4:2:0 upsample, `pipeline/jpeg.py`) — with
matching encoders so tests/gates build genuine payloads — and STUBBED
(NotImplementedError, or a deterministic fake when `fake=True`) for
formats that need external codec libraries (MP3/MP4, progressive JPEG;
none ship in this container).

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
    """Real decoder for the formats stdlib+numpy can parse — WAV (PCM,
    via `wave`), uncompressed BMP (struct header parse), PNG (zlib
    inflate + filter arithmetic, _decode_png), and baseline JPEG (T.81
    sequential DCT, pipeline/jpeg.py). Formats that need external codec
    libraries (MP3/MP4 — none ship in this container) still raise
    NotImplementedError; plug torchaudio / pyav into the dispatch below
    to widen it.

    Returns a dict:
      WAV -> {kind: 'audio', sample_rate, n_channels, sample_width,
              n_frames, samples: np.int16/int32 array (interleaved)}
      BMP -> {kind: 'image', width, height, bpp,
              pixels: np.uint8 array (h, w, 3) BGR, 24-bit only}
      PNG -> {kind: 'image', width, height, channels,
              pixels: np.uint8 array (h, w, c)}
    """
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave as _wave

        with _wave.open(io.BytesIO(payload), "rb") as w:
            sw = w.getsampwidth()
            nf = w.getnframes()
            raw = w.readframes(nf)
            dt = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
            if dt is None:
                raise NotImplementedError(f"WAV sample width {sw}")
            return {
                "kind": "audio",
                "sample_rate": w.getframerate(),
                "n_channels": w.getnchannels(),
                "sample_width": sw,
                "n_frames": nf,
                "samples": np.frombuffer(raw, dtype=dt),
            }
    if payload[:2] == b"BM":
        import struct

        off, = struct.unpack_from("<I", payload, 10)
        hdr_sz, width, height, _planes, bpp, compression = struct.unpack_from(
            "<IiihHI", payload, 14
        )
        if bpp != 24 or compression != 0:
            raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
        row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
        rows = []
        for y in range(abs(height)):
            start = off + y * row_bytes
            rows.append(
                np.frombuffer(payload, dtype=np.uint8, count=width * 3, offset=start)
                .reshape(width, 3)
            )
        px = np.stack(rows)
        if height > 0:  # positive height = bottom-up storage
            px = px[::-1]
        return {
            "kind": "image",
            "width": width,
            "height": abs(height),
            "bpp": bpp,
            "pixels": px,
        }
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from clucene_spark.pipeline.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "no stdlib decoder for this payload (MP3/MP4/... need external "
        "codec libraries); run with fake=True or install a decoder"
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # gray, RGB, palette, RGBA


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6 / RFC 2083)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(payload: bytes) -> dict:
    """PNG is zlib + filter arithmetic, both stdlib: chunk walk -> IHDR
    dims -> concatenated IDAT zlib stream -> per-scanline unfilter (all 5
    filter types) -> palette expansion for color type 3. Supports bit
    depth 8, color types 0/2/3/6, no interlace (the overwhelmingly common
    web shapes); anything else raises NotImplementedError honestly."""
    import struct
    import zlib

    pos = 8
    width = height = None
    bitdepth = ct = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # skip CRC
        if typ == b"IHDR":
            width, height, bitdepth, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bitdepth != 8 or ct not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG bitdepth={bitdepth} colortype={ct} interlace={interlace} "
            "not supported (bit depth 8, color types 0/2/3/6, no interlace)"
        )
    channels = _PNG_CHANNELS[ct]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    rp = 0
    for y in range(height):
        ft = raw[rp]
        rp += 1
        line = np.frombuffer(raw, np.uint8, stride, rp).astype(np.int32)
        rp += stride
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 255
        else:  # Sub / Average / Paeth depend on the left pixel -> sequential
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = prev[i]
                if ft == 1:  # Sub
                    cur[i] = (line[i] + a) & 255
                elif ft == 3:  # Average
                    cur[i] = (line[i] + (a + b) // 2) & 255
                elif ft == 4:  # Paeth
                    c = prev[i - channels] if i >= channels else 0
                    cur[i] = (line[i] + _paeth(a, b, c)) & 255
                else:
                    raise ValueError(f"PNG filter type {ft}")
        prev = cur
        out[y] = cur.astype(np.uint8)
    px = out.reshape(height, width, channels)
    if ct == 3:
        if plte is None:
            raise ValueError("PNG palette image missing PLTE")
        px = plte[px[:, :, 0]]
        channels = 3
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "bpp": 8 * channels,
        "channels": channels,
        "pixels": px,
    }


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, c) uint8 (c = 1 gray / 3 RGB / 4 RGBA) -> PNG bytes: filter-0
    scanlines, one zlib IDAT, CRC-correct chunks — the encode twin of
    _decode_png, used by resize_media and by gates to build real
    payloads deterministically."""
    import struct
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    ct = {1: 0, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
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


def _real_features(dec: dict, dim: int) -> list[float]:
    """Deterministic content-derived feature vector from a real decode:
    normalized moments of the pixel/sample array, zero-padded to dim.
    Every component lies in [0, 1) like the fake features, so downstream
    consumers (cosine near-dup, quantizers) treat both uniformly."""
    if dec["kind"] == "image":
        px = dec["pixels"].astype(np.float64)
        flat = px.reshape(-1, px.shape[-1]) if px.ndim == 3 else \
            px.reshape(-1, 1)
        vals = [float(px.mean()) / 256.0, float(px.std()) / 256.0]
        vals += [float(flat[:, c].mean()) / 256.0
                 for c in range(flat.shape[1])]
        vals += [dec["width"] / (dec["width"] + dec["height"] + 1.0)]
    else:  # audio
        s = dec["samples"].astype(np.float64)
        scale = float(1 << (8 * int(dec.get("sample_width", 2)) - 1))
        vals = [
            min(abs(float(s.mean())) / scale, 1.0 - 1e-9),
            min(float(np.sqrt((s * s).mean() if s.size else 0.0)) / scale,
                1.0 - 1e-9),
            dec["n_channels"] / 16.0,
        ]
    vals = [min(max(v, 0.0), 1.0 - 1e-9) for v in vals]
    return (vals + [0.0] * dim)[:dim]


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
                if fake:
                    f = _fake_features(b, dim).tolist()
                else:
                    # content-derived features from the REAL decode (the
                    # r4 form decoded and then discarded the result,
                    # silently returning the hash-based fake either way)
                    f = _real_features(_decode_real(b, "image"), dim)
                ids.append(int(mid))
                nbytes.append(len(b))
                fb.append(b[0] if b else -1)
                dg.append(int(hashlib.md5(b).hexdigest()[:15], 16))
                feats.append(f)
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


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("sum_sq", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode (stdlib `wave`, PCM) -> per-clip stats:
    (media_id, sample_rate, n_channels, n_frames, sum_sq, peak).
    sum_sq/peak stay in exact int64 so cross-engine oracles replay them
    bit-for-bit. Arrow-batched mapInPandas; payload bytes never reach the
    driver. Raises NotImplementedError for non-WAV payloads — this is the
    real decode path, not the fake."""

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "sample_rate", "n_channels", "n_frames",
                    "sum_sq", "peak")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = _decode_real(bytes(payload), "audio")
                s = d["samples"].astype(np.int64)
                out["media_id"].append(int(mid))
                out["sample_rate"].append(d["sample_rate"])
                out["n_channels"].append(d["n_channels"])
                out["n_frames"].append(d["n_frames"])
                out["sum_sq"].append(int((s * s).sum()))
                out["peak"].append(int(np.abs(s).max()) if len(s) else 0)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(_batch, AUDIO_STATS_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("sum_px", T.LongType(), False),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL image decode (24-bit uncompressed BMP, struct parse) ->
    (media_id, width, height, sum_px) with sum_px the exact int sum of
    all channel bytes."""

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "sum_px")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = _decode_real(bytes(payload), "image")
                out["media_id"].append(int(mid))
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["sum_px"].append(int(d["pixels"].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(_batch, IMAGE_STATS_SCHEMA)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 BGR -> 24-bit uncompressed BMP bytes (bottom-up,
    4-byte row padding). The encode twin of the BMP branch in
    _decode_real; used by resize_media and by tests/gates to build real
    payloads deterministically."""
    import struct

    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img = bytearray()
    pad = b"\x00" * (row_bytes - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        img += pixels[y].tobytes() + pad
    off = 14 + 40
    size = off + len(img)
    head = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return bytes(head + info + img)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: REAL nearest-neighbor resample + re-encode for BMP
    payloads (decoded=true in the output); passthrough with decoded=false
    for formats without a stdlib codec (the prior stub behaviour, kept so
    mixed-format tables flow through)."""

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, payloads, decoded = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                ids.append(int(mid))
                ws.append(np.int32(width))
                hs.append(np.int32(height))
                if b[:2] == b"BM" or b[:8] == _PNG_SIG or b[:2] == b"\xff\xd8":
                    d = _decode_real(b, "image")
                    yi = (np.arange(height) * d["height"]) // height
                    xi = (np.arange(width) * d["width"]) // width
                    px = np.ascontiguousarray(d["pixels"][yi][:, xi])
                    if b[:8] == _PNG_SIG:
                        enc = encode_png
                    elif b[:2] == b"\xff\xd8":
                        from clucene_spark.pipeline.jpeg import encode_jpeg

                        def enc(p):
                            return encode_jpeg(
                                p[:, :, 0] if p.shape[2] == 1 else p, quality=90
                            )
                    else:
                        enc = encode_bmp
                    payloads.append(enc(px))
                    decoded.append(True)
                else:
                    payloads.append(b)
                    decoded.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "resized_w": pd.Series(ws, dtype="int32"),
                    "resized_h": pd.Series(hs, dtype="int32"),
                    "payload": payloads,
                    "decoded": pd.Series(decoded, dtype="bool"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("resized_w", T.IntegerType(), False),
            T.StructField("resized_h", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("decoded", T.BooleanType(), False),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(_batch, schema)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> PCM WAV bytes (stdlib wave writer); the
    encode twin of the WAV branch in _decode_real."""
    import io
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


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
