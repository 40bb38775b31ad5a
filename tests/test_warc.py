"""WARC 1.0 source reader/writer (`clucene_spark/data/warc.py`).

The format is external (ISO 28500 / Common Crawl's *.warc.gz convention),
so the oracle here is construction: files written by the deterministic
writer must parse back byte-identically to the generator's rows, under
both compressions, at any read-chunk size, and with adversarial payloads
(bodies containing record framing bytes)."""

from __future__ import annotations

import datetime as dt
import io

import pytest

from clucene_spark.data import warc as W
from clucene_spark.data.webtext import make_doc, webtext_df


def _parse_all(blob: bytes, chunk: int = 1 << 20):
    return list(W.parse_warc_stream(io.BytesIO(blob), chunk=chunk))


def test_record_roundtrip_plain_and_gzip():
    rec = W.build_record(
        "response",
        W.http_response(b"<html>x</html>"),
        url="https://a.example/p",
        date=dt.datetime(2024, 1, 2, 3, 4, 5),
        record_id="r1",
        content_type="application/http; msgtype=response",
    )
    for blob in (rec, W.gzip_member(rec)):
        (r,) = _parse_all(blob)
        assert r["headers"]["warc-type"] == "response"
        assert r["headers"]["warc-target-uri"] == "https://a.example/p"
        assert r["headers"]["warc-date"] == "2024-01-02T03:04:05Z"
        status, hh, body = W.split_http_payload(r["payload"])
        assert status == 200
        assert hh["content-type"] == "text/html; charset=UTF-8"
        assert body == b"<html>x</html>"


def test_payload_containing_framing_bytes_is_not_resplit():
    # a body that embeds both the WARC magic and the header terminator:
    # Content-Length framing must win over any content sniffing
    evil = b"pre\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\npost"
    rec = W.build_record("resource", evil, url="https://e.example/")
    follow = W.build_record("resource", b"tail", url="https://t.example/")
    got = _parse_all(rec + follow)
    assert [r["payload"] for r in got] == [evil, b"tail"]


@pytest.mark.parametrize("chunk", [7, 64, 1 << 20])
def test_chunk_size_invariance_multi_member(chunk):
    recs = [
        W.build_record("resource", bytes([i]) * (50 + i * 37), url=f"u{i}")
        for i in range(8)
    ]
    blob = b"".join(W.gzip_member(r) for r in recs)
    got = _parse_all(blob, chunk=chunk)
    assert [r["payload"] for r in got] == [
        bytes([i]) * (50 + i * 37) for i in range(8)
    ]


def test_truncated_payload_raises():
    rec = W.build_record("resource", b"x" * 100)
    with pytest.raises(ValueError, match="truncated"):
        _parse_all(rec[:-60])


def test_warc_scan_matches_generator(spark, tmp_path):
    n = 120
    man = W.webtext_warc_files(
        spark, n, str(tmp_path), docs_per_file=50
    ).collect()
    assert sorted(r["n_records"] for r in man) == [20, 50, 50]
    paths = W.list_warc_paths(str(tmp_path))
    got = W.warc_scan(spark, paths).select(
        "url", "warc_ts", "http_status", "content_type", "html"
    )
    exp = webtext_df(spark, n, messy=True).select("url", "warc_ts", "html")
    j = got.join(exp.withColumnRenamed("html", "want"), ["url", "warc_ts"])
    rows = j.collect()
    assert len(rows) == n and got.count() == n
    assert all(bytes(r["html"]) == bytes(r["want"]) for r in rows)
    assert all(r["http_status"] == 200 for r in rows)
    assert all(r["content_type"] == "text/html; charset=UTF-8" for r in rows)


def test_wet_scan_matches_generator(spark, tmp_path):
    n = 90
    W.webtext_wet_files(spark, n, str(tmp_path), docs_per_file=40).collect()
    paths = W.list_warc_paths(str(tmp_path))
    got = {
        r["url"]: r["text"]
        for r in W.wet_scan(spark, paths).collect()
    }
    for did in range(n):
        _, url, _ts, _html, text, _lang = make_doc(did, messy=True)
        assert got[url] == text
    assert len(got) == n


def test_uncompressed_files_parse_identically(spark, tmp_path):
    n = 30
    W.webtext_warc_files(
        spark, n, str(tmp_path / "gz"), docs_per_file=30, compress=True
    ).collect()
    W.webtext_warc_files(
        spark, n, str(tmp_path / "plain"), docs_per_file=30, compress=False
    ).collect()
    a = W.warc_scan(spark, W.list_warc_paths(str(tmp_path / "gz")))
    b = W.warc_scan(spark, W.list_warc_paths(str(tmp_path / "plain")))
    ka = sorted((r["url"], bytes(r["html"])) for r in a.collect())
    kb = sorted((r["url"], bytes(r["html"])) for r in b.collect())
    assert ka == kb and len(ka) == n


def test_roundtrip_property_random_payloads():
    """Property: ANY payload bytes (including framing look-alikes) and
    any mix of per-record gzip/plain survive build->parse byte-exactly,
    at adversarial chunk sizes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        payloads=st.lists(st.binary(min_size=0, max_size=400), min_size=1,
                          max_size=6),
        gz=st.booleans(),  # per-file, like real WARCs: all members or none
        chunk=st.sampled_from([5, 37, 1 << 20]),
    )
    def run(payloads, gz, chunk):
        wrap = W.gzip_member if gz else (lambda r: r)
        blob = b"".join(
            wrap(W.build_record("resource", p, url=f"u{i}"))
            for i, p in enumerate(payloads)
        )
        got = _parse_all(blob, chunk=chunk)
        assert [r["payload"] for r in got] == payloads
        assert [r["headers"]["warc-target-uri"] for r in got] == [
            f"u{i}" for i in range(len(payloads))
        ]

    run()


def test_decode_html_precedence_and_fallback():
    page = "<p>café №</p>"
    # BOM wins over a (wrong) declared charset
    assert (
        W.decode_html(b"\xff\xfe" + page.encode("utf-16-le"),
                      "text/html; charset=latin-1")
        == page
    )
    assert W.decode_html(b"\xfe\xff" + page.encode("utf-16-be")) == page
    assert W.decode_html(b"\xef\xbb\xbf" + page.encode("utf-8")) == page
    # HTTP charset param
    assert (
        W.decode_html("<p>café</p>".encode("latin-1"),
                      'text/html; charset="ISO-8859-1"')
        == "<p>café</p>"
    )
    # meta tag sniff (0x80 is an invalid UTF-8 lead byte; cp1252 €)
    meta = '<meta charset="windows-1252"><p>€</p>'.encode("cp1252")
    assert W.decode_html(meta) == '<meta charset="windows-1252"><p>€</p>'
    # unknown declared charset falls through to utf-8
    assert W.decode_html("ok é".encode("utf-8"),
                         "text/html; charset=not-a-charset") == "ok é"
    # no signal: valid utf-8 as utf-8, else total latin-1 fallback
    assert W.decode_html("é".encode("utf-8")) == "é"
    assert W.decode_html(b"caf\xe9") == "café"


def test_warc_files_from_docs_roundtrip(spark, tmp_path):
    rows = [(i, f"text {i} with <tag> & amp {'x' * (i % 5)}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    man = W.warc_files_from_docs(docs, str(tmp_path), n_files=3).collect()
    assert sum(r["n_records"] for r in man) == 40
    # range partitioning keeps files doc-ordered and disjoint
    spans = sorted((r["min_doc"], r["max_doc"]) for r in man)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))

    from clucene_spark.pipeline.extract import extract_text_py

    got = {
        int(r["url"].rsplit("/", 1)[1]): extract_text_py(bytes(r["html"]))
        for r in W.warc_scan(spark, W.list_warc_paths(str(tmp_path))).collect()
    }
    # extract_text_py collapses edge whitespace by spec, so compare the
    # whitespace-normalized form (the i%5==0 rows end in a space)
    assert got == {i: " ".join(t.split()) for i, t in rows}


def test_records_from_col_filters_types(spark):
    def blob(did: int) -> bytes:
        info = W._warcinfo(0)
        resp = W.build_record(
            "response",
            W.http_response(f"<p>{did}</p>".encode(), status=200 + did % 2),
            url=f"https://x.example/{did}",
            date=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=did),
            content_type="application/http; msgtype=response",
        )
        meta = W.build_record("metadata", b"k: v", url=f"https://x.example/{did}")
        return W.gzip_member(info) + W.gzip_member(resp) + W.gzip_member(meta)

    df = spark.createDataFrame(
        [(i, blob(i)) for i in range(6)], "doc_id long, warc binary"
    )
    out = W.records_from_col(df, "warc").orderBy("doc_id").collect()
    assert len(out) == 6  # warcinfo + metadata filtered out
    for i, r in enumerate(out):
        assert r["warc_type"] == "response"
        assert r["http_status"] == 200 + i % 2
        assert bytes(r["html"]) == f"<p>{i}</p>".encode()
        assert r["warc_date"] == (
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)
        ).strftime("%Y-%m-%dT%H:%M:%SZ")


def test_tolerant_parse_survives_corrupt_members(spark, tmp_path):
    recs = [
        W.build_record("resource", f"payload {i}".encode() * 40, url=f"u{i}")
        for i in range(6)
    ]
    members = [bytearray(W.gzip_member(r)) for r in recs]
    # flip a deflate byte mid-member 1 and truncate member 3's tail
    members[1][len(members[1]) // 2] ^= 0xFF
    members[3] = members[3][:-6]
    blob = b"".join(bytes(m) for m in members)

    import io as _io

    from clucene_spark.data.warc import parse_warc_stream_tolerant

    got = list(parse_warc_stream_tolerant(_io.BytesIO(blob), chunk=64))
    assert [r["headers"]["warc-target-uri"] for r in got] == [
        "u0", "u2", "u4", "u5"
    ]
    # the skip counter attributes the two corrupt members to the records
    # that follow them
    assert [r["skipped_before"] for r in got] == [0, 1, 1, 0]
    # strict parser refuses the same blob
    with pytest.raises(Exception):
        list(W.parse_warc_stream(_io.BytesIO(blob)))

    # end-to-end: a corrupt file still scans in tolerant mode
    p = tmp_path / "c.warc.gz"
    p.write_bytes(blob)
    rows = W.warc_scan(
        spark, [str(p)], warc_types=("resource",), tolerant=True
    ).collect()
    assert len(rows) == 4


def test_tolerant_parse_clean_file_identical(tmp_path):
    import io as _io

    from clucene_spark.data.warc import parse_warc_stream_tolerant

    recs = [W.build_record("resource", bytes([i]) * 99, url=f"u{i}")
            for i in range(5)]
    blob = b"".join(W.gzip_member(r) for r in recs)
    a = list(W.parse_warc_stream(_io.BytesIO(blob)))
    b = list(parse_warc_stream_tolerant(_io.BytesIO(blob)))
    assert [r["payload"] for r in b] == [r["payload"] for r in a]
    assert all(r["skipped_before"] == 0 for r in b)
    # uncompressed input falls back to the strict parser transparently
    plain = b"".join(recs)
    c = list(parse_warc_stream_tolerant(_io.BytesIO(plain)))
    assert [r["payload"] for r in c] == [r["payload"] for r in a]


def test_feed_bounded_inflate_member_shapes():
    # members around the _FEED handoff bound: many tiny members inside
    # one feed slice, one straddling the bound, one many times larger —
    # inflate must equal gzip.decompress and both parsers must cut the
    # same records (regression for the unbounded unused_data copy: the
    # old loop fed whole read chunks, so every member boundary copied
    # the rest of the chunk — members x chunk/2 memmove per file)
    import gzip

    sizes = [1, 17, W._FEED - 3, W._FEED, W._FEED + 3, 5 * W._FEED, 2, 9]
    recs = [
        W.build_record("resource", bytes([65 + i % 26]) * n, url=f"u{i}")
        for i, n in enumerate(sizes)
    ]
    blob = b"".join(W.gzip_member(r) for r in recs)
    assert b"".join(
        W._gzip_chunks(io.BytesIO(blob), 1 << 20)
    ) == gzip.decompress(blob)
    for chunk in (W._FEED - 1, 1 << 20):
        for fn in (W.parse_warc_stream, W.parse_warc_stream_tolerant):
            got = list(fn(io.BytesIO(blob), chunk=chunk))
            assert [r["payload"] for r in got] == [
                bytes([65 + i % 26]) * n for i, n in enumerate(sizes)
            ], (fn.__name__, chunk)


def test_tolerant_parse_member_missing_content_length():
    """Regression (r5): a member whose record lacks Content-Length raised
    KeyError through the 'corruption-tolerant' parser; it must be counted
    and skipped like any malformed framing."""
    import io as _io

    from clucene_spark.data.warc import parse_warc_stream_tolerant

    good = W.build_record("resource", b"fine " * 30, url="ok")
    # record with the Content-Length header line removed
    broken = good.replace(b"Content-Length", b"X-Not-Length", 1)
    blob = (W.gzip_member(good) + W.gzip_member(broken)
            + W.gzip_member(good))
    got = list(parse_warc_stream_tolerant(_io.BytesIO(blob), chunk=64))
    assert [r["headers"]["warc-target-uri"] for r in got] == ["ok", "ok"]
    assert [r["skipped_before"] for r in got] == [0, 1]


def test_tolerant_resync_across_compaction_boundary():
    """Regression (r5): the garbage-resync scan computed its restart
    offset BEFORE fill() compacted the buffer, so a magic just past a
    compaction was skipped and valid members silently dropped. Large
    (multi-chunk) garbage runs between members must still recover every
    valid member, and a magic-free garbage tail must terminate without
    buffering the whole remainder."""
    import io as _io

    from clucene_spark.data.warc import parse_warc_stream_tolerant

    recs = [W.build_record("resource", f"pay {i} ".encode() * 50,
                           url=f"u{i}") for i in range(3)]
    # garbage stretches far beyond the 64-byte chunk; 0x00 avoids fake
    # gzip magics
    garbage = b"\x00" * 1500
    blob = (W.gzip_member(recs[0]) + garbage + W.gzip_member(recs[1])
            + garbage + W.gzip_member(recs[2]) + garbage)
    got = list(parse_warc_stream_tolerant(_io.BytesIO(blob), chunk=64))
    assert [r["headers"]["warc-target-uri"] for r in got] == [
        "u0", "u1", "u2"]
    # the garbage runs register as skips on the following record
    assert got[1]["skipped_before"] >= 1
    assert got[2]["skipped_before"] >= 1

    # corrupt member followed by multi-chunk garbage then a valid member
    m1 = bytearray(W.gzip_member(recs[0]))
    m1[len(m1) // 2] ^= 0xFF
    blob2 = bytes(m1) + garbage + W.gzip_member(recs[2])
    got2 = list(parse_warc_stream_tolerant(_io.BytesIO(blob2), chunk=64))
    assert [r["headers"]["warc-target-uri"] for r in got2] == ["u2"]


def test_prepend_read_contract():
    """Regression (r5): _Prepend.read(-1) dropped the underlying stream
    and read(n) could return more than n bytes."""
    import io as _io

    from clucene_spark.data.warc import _Prepend

    p = _Prepend(b"ab", _io.BytesIO(b"cdef"))
    assert p.read() == b"abcdef"
    p = _Prepend(b"ab", _io.BytesIO(b"cdef"))
    assert p.read(1) == b"a"
    assert p.read(1) == b"b"
    assert p.read(2) == b"cd"
    p = _Prepend(b"ab", _io.BytesIO(b"cdef"))
    assert p.read(3) == b"abc"
    assert p.read(-1) == b"def"


def test_warc_scan_empty_paths(spark):
    """Regression (r5): warc_scan([]) crashed on repartition(0)."""
    assert W.warc_scan(spark, []).count() == 0
