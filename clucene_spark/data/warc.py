"""WARC 1.0 source reader/writer — the on-disk format of Common-Crawl crawls.

The engine's input table (url, warc_ts, html, text, lang) is what a crawl
DELIVERS; what a crawl SHIPS is WARC: a sequence of records, each a
``WARC/1.0`` header block + Content-Length-delimited payload, each record
its own gzip member so a reader can stream the file without decompressing
it whole (ISO 28500; Common Crawl's ``*.warc.gz`` / WET ``*.warc.wet.gz``).
This module is the ingest front door that turns those files into the
engine's pages DataFrame:

  * ``warc_scan(spark, paths)``   -> (path, url, warc_ts, warc_type,
    http_status, content_type, html) for 'response' records (WARC proper);
  * ``wet_scan(spark, paths)``    -> (path, url, warc_ts, text) for
    'conversion' records (WET extracted-text sidecars);
  * ``records_from_col(df, col)`` -> same parse over an in-memory binary
    column (hermetic gates, message-bus payloads);
  * ``webtext_warc_files`` / ``webtext_wet_files`` -> deterministic
    distributed writers over the synthetic webtext corpus (fixtures,
    audits; no external data).

Scale notes (100 TB):
  * Paths, not bytes, are distributed: ``warc_scan`` ships one row per
    file and each python task ``open()``s its own file — the payload never
    crosses the JVM, the exact pattern of the direct-read bulk index load
    (``index/segments.py``). One Common-Crawl segment file (~1 GB gzip) =
    one task; a crawl is ~64k files, so the scan parallelizes to any
    cluster width with zero shuffle.
  * The parser is STREAMING: multi-member gzip is inflated through one
    ``zlib.decompressobj`` chain with ``unused_data`` handoff and records
    are cut from a rolling buffer, so peak memory is O(largest record),
    not O(file).
  * Writers emit one file per task directly from the generator (no
    exchange), mirroring how the corpus generator scales.

Record framing and the per-record-gzip convention follow the public WARC
spec and Common Crawl's published format docs; nothing here reads the
reference engine (CLucene has no crawl layer — this sits upstream of
`document/Document.cpp`'s field model, producing the rows it indexes).
"""

from __future__ import annotations

import datetime as _dt
import io
import os
import re
import zlib
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


# ---------------------------------------------------------------------------
# record building (writer side)
# ---------------------------------------------------------------------------

def build_record(
    rec_type: str,
    payload: bytes,
    url: str | None = None,
    date: _dt.datetime | None = None,
    record_id: str | None = None,
    content_type: str | None = None,
    extra: list[tuple[str, str]] | None = None,
) -> bytes:
    """Serialize ONE uncompressed WARC 1.0 record (header block +
    Content-Length payload + the spec's two trailing CRLFs)."""
    h: list[tuple[str, str]] = [("WARC-Type", rec_type)]
    if date is not None:
        h.append(("WARC-Date", date.strftime("%Y-%m-%dT%H:%M:%SZ")))
    if record_id is not None:
        h.append(("WARC-Record-ID", f"<urn:uuid:{record_id}>"))
    if url is not None:
        h.append(("WARC-Target-URI", url))
    if content_type is not None:
        h.append(("Content-Type", content_type))
    h.extend(extra or [])
    h.append(("Content-Length", str(len(payload))))
    head = b"WARC/1.0" + CRLF + CRLF.join(
        f"{k}: {v}".encode("utf-8") for k, v in h
    ) + _HDR_END
    return head + payload + CRLF + CRLF


def gzip_member(raw: bytes) -> bytes:
    """One record -> one deterministic gzip member (mtime 0, the
    per-record-member convention that makes `.warc.gz` streamable)."""
    c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return c.compress(raw) + c.flush()


def http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html; charset=UTF-8",
    extra: list[tuple[str, str]] | None = None,
) -> bytes:
    """Wrap a page body as the HTTP/1.1 response block a 'response'
    record carries (status line + headers + CRLFCRLF + body)."""
    h = [("Content-Type", content_type), ("Content-Length", str(len(body)))]
    h.extend(extra or [])
    head = f"HTTP/1.1 {status} {reason}".encode() + CRLF + CRLF.join(
        f"{k}: {v}".encode("utf-8") for k, v in h
    ) + _HDR_END
    return head + body


def split_http_payload(block: bytes) -> tuple[int | None, dict, bytes]:
    """(status, headers, body) from an HTTP response block. Binary-safe:
    splits at the FIRST CRLFCRLF only; a body containing CRLFCRLF or
    'WARC/1.0' is never re-interpreted."""
    cut = block.find(_HDR_END)
    if cut < 0 or not block.startswith(b"HTTP/"):
        return None, {}, block
    head, body = block[:cut], block[cut + 4:]
    lines = head.split(CRLF)
    try:
        status = int(lines[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        status = None
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if _:
            headers[k.decode("latin-1").strip().lower()] = (
                v.decode("latin-1").strip()
            )
    return status, headers, body


_CT_CHARSET_RE = re.compile(r"(?i)charset\s*=\s*\"?([A-Za-z0-9_\-]+)")
_META_CHARSET_RE = re.compile(
    rb"(?i)<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)"
)


def decode_html(body, content_type: str | None = None) -> str:
    """Charset-aware page decode — real crawls are NOT all UTF-8.
    Precedence (the WHATWG sniffing order, trimmed to its deterministic
    core): byte-order mark > charset= in the HTTP Content-Type > <meta
    charset> in the first 2 KiB > UTF-8, falling back to Latin-1 when
    the bytes are not valid UTF-8 (Latin-1 decodes any byte, so the
    fallback is total). Unknown declared charsets fall through rather
    than raise."""
    body = bytes(body)
    if body.startswith(b"\xef\xbb\xbf"):
        return body[3:].decode("utf-8", "replace")
    if body.startswith(b"\xff\xfe"):
        return body[2:].decode("utf-16-le", "replace")
    if body.startswith(b"\xfe\xff"):
        return body[2:].decode("utf-16-be", "replace")
    enc = None
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            enc = m.group(1)
    if enc is None:
        m = _META_CHARSET_RE.search(body[:2048])
        if m:
            enc = m.group(1).decode("ascii")
    if enc:
        import codecs

        try:
            return body.decode(codecs.lookup(enc).name, "replace")
        except LookupError:
            pass
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return body.decode("latin-1")


# ---------------------------------------------------------------------------
# streaming parser (reader side)
# ---------------------------------------------------------------------------

# max bytes handed to decompressobj per call. zlib copies everything
# past a member's end into `unused_data` (a fresh bytes object) — feed
# it a whole 1 MiB read chunk and a per-record-member WARC (the Common
# Crawl convention, ~100k members in a 1 GB file) pays
# members x chunk/2 of allocation+memmove per file: ~50 GB for that
# 1 GB file. Bounding the feed caps the over-read copy at _FEED bytes
# per member; the 1M-doc audit measured inflate 0.54s -> 0.12s per
# 15.6k-record file.
_FEED = 1 << 13


def _gzip_chunks(fileobj, chunk: int) -> Iterator[bytes]:
    """Inflate a possibly multi-member gzip stream incrementally; plain
    (uncompressed) input passes through untouched. Constant memory: one
    decompressobj at a time, one read chunk, ``_FEED``-bounded handoff
    at member boundaries (over-read bytes stay in the chunk — the
    cursor rewinds instead of copying ``unused_data`` forward)."""
    first = fileobj.read(2)
    if first[:2] != b"\x1f\x8b":
        if first:
            yield first
        while True:
            buf = fileobj.read(chunk)
            if not buf:
                return
            yield buf
        return
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    pending = first
    while True:
        buf = pending or fileobj.read(chunk)
        pending = b""
        if not buf:
            return
        mv = memoryview(buf)  # bytes: zero-copy slices, nothing resizes
        pos, n = 0, len(buf)
        while pos < n:
            fed = min(_FEED, n - pos)
            out = d.decompress(mv[pos : pos + fed])
            if out:
                yield out
            if d.eof:  # member boundary: rewind past the over-read
                pos += fed - len(d.unused_data)
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            else:
                pos += fed


def parse_warc_stream(fileobj, chunk: int = 1 << 20) -> Iterator[dict]:
    """Stream records out of a WARC file object (gzipped or plain):
    yields ``{"headers": {lowercased-name: value}, "payload": bytes}``
    per record. The rolling buffer holds at most one record + one chunk.

    Consumed bytes advance a cursor instead of being deleted per record
    (``del buf[:n]`` memmoves the whole tail — O(bytes²) across a file's
    records; the 1M-doc audit measured it as the dominant parse cost);
    the buffer compacts only when the dead prefix outgrows the live
    tail, which amortizes to O(bytes) total."""
    buf = bytearray()
    pos = 0
    feed = _gzip_chunks(fileobj, chunk)

    def fill() -> bool:
        nonlocal pos
        if pos > chunk and pos > len(buf) - pos:
            del buf[:pos]
            pos = 0
        try:
            buf.extend(next(feed))
            return True
        except StopIteration:
            return False

    while True:
        # skip inter-record CRLFs, then demand a full header block
        while True:
            while buf[pos:pos + 2] == CRLF:
                pos += 2
            cut = buf.find(_HDR_END, pos)
            if cut >= 0 or not fill():
                break
        if cut < 0:
            if buf[pos:].strip(b"\r\n"):
                raise ValueError("truncated WARC header block")
            return
        head = bytes(buf[pos:cut])
        pos = cut + 4
        lines = head.split(CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {lines[0][:40]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.decode("utf-8").strip().lower()] = (
                    v.decode("utf-8").strip()
                )
        n = int(headers["content-length"])
        while len(buf) - pos < n:
            if not fill():
                raise ValueError("truncated WARC payload")
        payload = bytes(buf[pos:pos + n])
        pos += n
        yield {"headers": headers, "payload": payload}


def _gzip_members(fileobj, chunk: int = 1 << 20) -> Iterator[bytes | None]:
    """Iterate a multi-member gzip stream ONE MEMBER at a time, yielding
    each member's decompressed bytes — or ``None`` for a member that
    fails to inflate, after resyncing to the next gzip magic. The
    per-record-member convention makes WARC self-healing: one flipped
    bit costs one record, not the file. Constant memory (one member +
    one chunk)."""
    buf = bytearray()
    pos = 0
    in_member = False

    base = 0  # absolute offset of buf[0] in the file: fill() compaction
    #           shifts buffer coordinates, so resync scans save absolute
    #           positions (base + i) across fills — a stale pre-fill
    #           offset would skip magics landing in the compacted region

    def fill() -> bool:
        nonlocal pos, base
        # never compact while inside a member: the error-resync path
        # needs the member's START offset to stay valid (memory bound
        # becomes one member + one chunk, same as the payload itself)
        if not in_member and pos > chunk and pos > len(buf) - pos:
            base += pos
            del buf[:pos]
            pos = 0
        b = fileobj.read(chunk)
        if not b:
            return False
        buf.extend(b)
        return True

    def resync(scan_from: int):
        """Advance pos to the next gzip magic at/after scan_from,
        discarding scanned garbage as it goes (keeps the memory bound on
        a magic-free tail at one chunk, not the whole remaining file).
        Returns True when found, False at EOF."""
        nonlocal pos
        pos = min(scan_from, len(buf))
        while True:
            nxt = buf.find(b"\x1f\x8b", pos)
            if nxt >= 0:
                pos = nxt
                return True
            # all but the last byte is garbage (a magic may straddle the
            # fill boundary); consuming it lets fill() discard it
            pos = max(pos, len(buf) - 1)
            a = base + pos
            if not fill():
                return False
            pos = a - base

    while True:
        while len(buf) - pos < 2:
            if not fill():
                if len(buf) - pos > 0:
                    yield None  # trailing garbage / truncated magic
                return
        if buf[pos:pos + 2] != b"\x1f\x8b":
            if not resync(pos + 1):
                yield None
                return
            yield None  # bytes between members were garbage
            continue
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = bytearray()
        if pos > chunk and pos > len(buf) - pos:  # compact BEFORE pinning
            del buf[:pos]
            pos = 0
        start = pos
        in_member = True
        try:
            while not d.eof:
                if len(buf) - pos == 0 and not fill():
                    raise zlib.error("truncated member")
                # feed _FEED-bounded slices: handing the whole tail makes
                # zlib copy everything past the member end into
                # unused_data — members x tail/2 of memmove per file
                # (bytes() not memoryview: fill() resizes the bytearray)
                while pos < len(buf) and not d.eof:
                    fed = min(_FEED, len(buf) - pos)
                    out.extend(d.decompress(bytes(buf[pos : pos + fed])))
                    pos += fed
            # hand back the next member's bytes the decompressor over-read
            pos -= len(d.unused_data)
            in_member = False
            yield bytes(out)
        except zlib.error:
            # corrupt member: resync at the next magic AFTER this one
            # (the failed member's bytes are garbage now — in_member
            # drops first so resync/fill may discard them)
            in_member = False
            if not resync(start + 2):
                yield None
                return
            yield None


def parse_warc_stream_tolerant(
    fileobj, chunk: int = 1 << 20
) -> Iterator[dict]:
    """Corruption-tolerant record iterator for per-record-gzip WARC:
    each gzip member parses independently; members that fail to inflate
    OR whose framing is malformed are counted and skipped, and parsing
    continues at the next member. Yields the same dicts as
    `parse_warc_stream`, each with an extra ``"skipped_before"`` count
    (corrupt members encountered since the previous good record).
    Requires the gzip convention (first bytes must be the magic) —
    falls back to the strict parser for uncompressed input."""
    head = fileobj.read(2)
    if head[:2] != b"\x1f\x8b":
        # no member boundaries to resync on: strict parse
        yield from (
            {**r, "skipped_before": 0}
            for r in parse_warc_stream(_Prepend(head, fileobj), chunk)
        )
        return
    skipped = 0
    for member in _gzip_members(_Prepend(head, fileobj), chunk):
        if member is None:
            skipped += 1
            continue
        try:
            for rec in parse_warc_stream(io.BytesIO(member), chunk):
                rec["skipped_before"] = skipped
                skipped = 0
                yield rec
        except (ValueError, KeyError):
            # ValueError: malformed version line / lengths; KeyError: a
            # header block missing Content-Length — both are the
            # malformed framing this parser promises to count and skip
            skipped += 1


class _Prepend:
    """Tiny read-wrapper pushing peeked bytes back onto a stream."""

    def __init__(self, head: bytes, fileobj):
        self._head = head
        self._f = fileobj

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n is None or n < 0:  # read-all must include the stream
                h, self._head = self._head, b""
                return h + self._f.read()
            if n <= len(self._head):  # never return more than n bytes
                h = self._head[:n]
                self._head = self._head[n:]
                return h
            h, self._head = self._head, b""
            return h + self._f.read(n - len(h))
        return self._f.read(n)


def parse_warc_date(s: str | None):
    """WARC-Date (RFC 3339 'YYYY-MM-DDTHH:MM:SSZ') -> datetime | None.
    Fast path slices the fixed-width form directly (strptime compiles a
    format regex per call family and costs ~6us; the slice parse is
    ~2us and fuzz-pinned equal); anything shaped differently falls back
    to strptime, so lenient/invalid inputs keep strptime's verdict."""
    if not s:
        return None
    if (
        len(s) == 20 and s.isascii()
        and s[4] == "-" and s[7] == "-" and s[10] == "T"
        and s[13] == ":" and s[16] == ":" and s[19] == "Z"
        and s[0:4].isdigit() and s[5:7].isdigit() and s[8:10].isdigit()
        and s[11:13].isdigit() and s[14:16].isdigit() and s[17:19].isdigit()
    ):
        try:
            return _dt.datetime(
                int(s[0:4]), int(s[5:7]), int(s[8:10]),
                int(s[11:13]), int(s[14:16]), int(s[17:19]),
            )
        except ValueError:  # out-of-range field, e.g. month 13
            return None
    try:
        return _dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# DataFrame scan (paths -> pages)
# ---------------------------------------------------------------------------

_SCAN_SCHEMA = (
    "path string, url string, warc_ts timestamp, warc_type string, "
    "http_status int, content_type string, location string, html binary"
)


def list_warc_paths(directory: str) -> list[str]:
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if ".warc" in f
    )


def warc_scan(
    spark: SparkSession,
    paths: list[str],
    warc_types: tuple[str, ...] = ("response",),
    tolerant: bool = False,
) -> DataFrame:
    """Distributed WARC scan: one row per path shipped, each task opens
    and stream-parses its own files (payload never crosses the JVM).
    'response' payloads are split into HTTP headers + body; the body is
    the ``html`` column, matching the engine's input_hint schema."""
    want = set(warc_types)
    # pre-sliced parallelize packs ~2 tasks/core WITHOUT the extra
    # repartition Exchange stage a local relation would need (hash-by-path
    # would leave empty partitions on collisions; slicing is exact)
    n_tasks = max(
        1, min(len(paths), spark.sparkContext.defaultParallelism * 2)
    )
    pdf = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in paths], n_tasks),
        "path string",
    )

    parse = parse_warc_stream_tolerant if tolerant else parse_warc_stream

    cols = [
        "path", "url", "warc_ts", "warc_type",
        "http_status", "content_type", "location", "html",
    ]
    # emit Arrow batches incrementally: buffering a whole file's records
    # before yielding would make task memory O(decompressed file) — a
    # 1 GB crawl segment is several GB of HTML — instead of the streaming
    # parser's O(largest record) bound the module advertises
    flush_rows = 512
    flush_bytes = 32 << 20

    def scan(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path in b["path"]:
                rows: list = []
                n_bytes = 0
                with open(path, "rb") as fh:
                    for rec in parse(fh):
                        h = rec["headers"]
                        rtype = h.get("warc-type", "")
                        if rtype not in want:
                            continue
                        if rtype == "response":
                            status, hh, body = split_http_payload(
                                rec["payload"]
                            )
                            ctype = hh.get("content-type")
                            loc = hh.get("location")
                        else:
                            status, body = None, rec["payload"]
                            ctype = h.get("content-type")
                            loc = None
                        rows.append(
                            (
                                path,
                                h.get("warc-target-uri"),
                                parse_warc_date(h.get("warc-date")),
                                rtype,
                                status,
                                ctype,
                                loc,
                                body,
                            )
                        )
                        n_bytes += len(body) if body is not None else 0
                        if len(rows) >= flush_rows or n_bytes >= flush_bytes:
                            yield pd.DataFrame(rows, columns=cols)
                            rows, n_bytes = [], 0
                yield pd.DataFrame(rows, columns=cols)

    return pdf.mapInPandas(scan, _SCAN_SCHEMA)


def wet_scan(spark: SparkSession, paths: list[str]) -> DataFrame:
    """WET sidecar scan: 'conversion' records carry already-extracted
    plain text -> (path, url, warc_ts, text)."""
    df = warc_scan(spark, paths, warc_types=("conversion",))
    return df.select(
        "path", "url", "warc_ts",
        F.col("html").cast("string").alias("text"),
    )


def records_from_col(
    df: DataFrame,
    bin_col: str = "warc",
    id_col: str = "doc_id",
    warc_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Same parse over an in-memory binary column (each cell one WARC
    blob, possibly multi-record and/or gzipped). Map-only."""
    want = set(warc_types)
    src = df.select(id_col, bin_col)

    def scan(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rid, blob in zip(b[id_col], b[bin_col]):
                for rec in parse_warc_stream(io.BytesIO(bytes(blob))):
                    h = rec["headers"]
                    rtype = h.get("warc-type", "")
                    if rtype not in want:
                        continue
                    if rtype == "response":
                        status, hh, body = split_http_payload(rec["payload"])
                        ctype = hh.get("content-type")
                    else:
                        status, body = None, rec["payload"]
                        ctype = h.get("content-type")
                    rows.append(
                        (
                            int(rid),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            rtype,
                            status,
                            ctype,
                            body,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "url", "warc_date", "warc_type",
                    "http_status", "content_type", "html",
                ],
            )

    return src.mapInPandas(
        scan,
        f"{id_col} long, url string, warc_date string, warc_type string, "
        "http_status int, content_type string, html binary",
    )


# ---------------------------------------------------------------------------
# deterministic distributed writers (fixtures / audits; no external data)
# ---------------------------------------------------------------------------

def _warcinfo(file_idx: int) -> bytes:
    body = (
        b"software: clucene_spark.data.warc\r\n"
        b"format: WARC File Format 1.0\r\n"
    )
    return build_record(
        "warcinfo",
        body,
        date=_dt.datetime(2024, 1, 1),
        record_id=f"warcinfo-{file_idx}",
        content_type="application/warc-fields",
    )


def webtext_warc_files(
    spark: SparkSession,
    n_docs: int,
    out_dir: str,
    docs_per_file: int = 1000,
    compress: bool = True,
) -> DataFrame:
    """Write the synthetic webtext corpus as Common-Crawl-shaped
    ``*.warc(.gz)`` files — warcinfo head record then one HTTP 'response'
    record per page, each record its own gzip member. One file per task,
    written straight from the generator (no shuffle, no driver data).
    Returns the (path, n_records) manifest."""
    from .webtext import make_doc

    os.makedirs(out_dir, exist_ok=True)
    n_files = (n_docs + docs_per_file - 1) // docs_per_file
    files = spark.createDataFrame(
        [(i,) for i in range(n_files)], "file_idx int"
    ).repartition(max(1, n_files), "file_idx")  # n_docs=0 -> no rows, 1 task

    def write(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for fi in b["file_idx"]:
                fi = int(fi)
                lo, hi = fi * docs_per_file, min((fi + 1) * docs_per_file, n_docs)
                ext = ".warc.gz" if compress else ".warc"
                path = os.path.join(out_dir, f"webtext-{fi:05d}{ext}")
                wrap = gzip_member if compress else (lambda x: x)
                n = 0
                with open(path, "wb") as fh:
                    fh.write(wrap(_warcinfo(fi)))
                    for did in range(lo, hi):
                        doc_id, url, ts, html, _text, _lang = make_doc(
                            did, messy=True
                        )
                        rec = build_record(
                            "response",
                            http_response(html),
                            url=url,
                            date=ts,
                            record_id=f"doc-{doc_id}",
                            content_type=(
                                "application/http; msgtype=response"
                            ),
                        )
                        fh.write(wrap(rec))
                        n += 1
                rows.append((path, n))
            yield pd.DataFrame(rows, columns=["path", "n_records"])

    return files.mapInPandas(write, "path string, n_records long")


def warc_files_from_docs(
    docs: DataFrame,
    out_dir: str,
    n_files: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    compress: bool = True,
    url_col: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Write ANY (doc_id, text) DataFrame as response-record WARC files:
    range-partitioned on doc_id into `n_files` doc-ordered files (one per
    task, written directly from the partition — no driver data), each
    page the minimal-HTML embedding of its text. Inverse of
    `warc_scan` + extract for round-trip fixtures over real tables.
    Returns the (path, n_records, min_doc, max_doc) manifest."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        (F.col(url_col) if url_col else F.lit(None).cast("string"))
        .alias("url_in"),
        (F.col(ts_col) if ts_col else F.lit(None).cast("timestamp"))
        .alias("ts_in"),
    ]
    part = (
        docs.select(*cols)
        .repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id")
    )
    ext = ".warc.gz" if compress else ".warc"

    def write(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wrap = gzip_member if compress else (lambda x: x)
        fh = None
        path = None
        n = 0
        lo = hi = None
        for b in batches:
            for did, text, u_in, t_in in zip(
                b["doc_id"], b["text"], b["url_in"], b["ts_in"]
            ):
                did = int(did)
                if fh is None:
                    path = os.path.join(out_dir, f"part-{did:012d}{ext}")
                    fh = open(path, "wb")
                    fh.write(wrap(_warcinfo(did)))
                    lo = did
                esc = (
                    (text or "")
                    .replace("&", "&amp;")
                    .replace("<", "&lt;")
                    .replace(">", "&gt;")
                )
                html = (
                    "<html><body><p>" + esc + "</p></body></html>"
                ).encode("utf-8")
                rec = build_record(
                    "response",
                    http_response(html),
                    url=(
                        u_in if u_in is not None and not pd.isna(u_in)
                        else f"https://docs.example/{did}"
                    ),
                    date=(
                        t_in.to_pydatetime()
                        if t_in is not None and not pd.isna(t_in)
                        else _dt.datetime(2024, 1, 1)
                        + _dt.timedelta(seconds=did * 7)
                    ),
                    record_id=f"doc-{did}",
                    content_type="application/http; msgtype=response",
                )
                fh.write(wrap(rec))
                n += 1
                hi = did
        if fh is not None:
            fh.close()
            yield pd.DataFrame(
                [(path, n, lo, hi)],
                columns=["path", "n_records", "min_doc", "max_doc"],
            )

    return part.mapInPandas(
        write, "path string, n_records long, min_doc long, max_doc long"
    )


def webtext_wet_files(
    spark: SparkSession,
    n_docs: int,
    out_dir: str,
    docs_per_file: int = 1000,
    compress: bool = True,
) -> DataFrame:
    """WET sidecars for the same corpus: 'conversion' records whose
    payload is the page's extracted plain text."""
    from .webtext import make_doc

    os.makedirs(out_dir, exist_ok=True)
    n_files = (n_docs + docs_per_file - 1) // docs_per_file
    files = spark.createDataFrame(
        [(i,) for i in range(n_files)], "file_idx int"
    ).repartition(max(1, n_files), "file_idx")  # n_docs=0 -> no rows, 1 task

    def write(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for fi in b["file_idx"]:
                fi = int(fi)
                lo, hi = fi * docs_per_file, min((fi + 1) * docs_per_file, n_docs)
                ext = ".warc.wet.gz" if compress else ".warc.wet"
                path = os.path.join(out_dir, f"webtext-{fi:05d}{ext}")
                wrap = gzip_member if compress else (lambda x: x)
                n = 0
                with open(path, "wb") as fh:
                    fh.write(wrap(_warcinfo(fi)))
                    for did in range(lo, hi):
                        doc_id, url, ts, _html, text, _lang = make_doc(
                            did, messy=True
                        )
                        rec = build_record(
                            "conversion",
                            text.encode("utf-8"),
                            url=url,
                            date=ts,
                            record_id=f"wet-{doc_id}",
                            content_type="text/plain",
                        )
                        fh.write(wrap(rec))
                        n += 1
                rows.append((path, n))
            yield pd.DataFrame(rows, columns=["path", "n_records"])

    return files.mapInPandas(write, "path string, n_records long")
