"""Crawl-to-index direct build (`index/warc_build.py`).

Oracle is cross-path equality: the index built straight from WARC files
(open -> cut records -> HTTP split -> extract -> normalize -> tokenize ->
invert) must be logically identical to the index built from the
already-materialized webtext parquet over the same docs — same corpus
stats, same postings multiset, same BM25 top-k — because the generator
guarantees extract_text(html) == text per row."""

from __future__ import annotations

import pandas as pd
import pytest

from clucene_spark.data import warc as W
from clucene_spark.data.webtext import webtext_df
from clucene_spark.index.segments import (
    SegmentStore,
    build_segments_aligned,
    read_checkpoints,
)
from clucene_spark.index.warc_build import build_segments_from_warc
from clucene_spark.search.wand import wand_query_direct

N, PER_FILE = 120, 40


@pytest.fixture(scope="module")
def warc_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("warcidx")
    W.webtext_warc_files(
        spark, N, str(root / "crawl"), docs_per_file=PER_FILE
    ).collect()
    idx = str(root / "index")
    built = build_segments_from_warc(
        spark,
        W.list_warc_paths(str(root / "crawl")),
        idx,
        stride=PER_FILE,
    ).collect()
    return idx, built


@pytest.fixture(scope="module")
def parquet_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pqidx")
    docs = (
        webtext_df(spark, N, messy=True)
        .select("doc_id", "text")
        .repartitionByRange(3, "doc_id")
        .sortWithinPartitions("doc_id")
    )
    idx = str(root / "index")
    build_segments_aligned(docs, idx, resume=False).collect()
    return idx


def _postings_multiset(spark, idx):
    store = SegmentStore(spark, idx)
    rows = store.postings().select("term", "df").collect()
    return sorted((r["term"], r["df"]) for r in rows)


def test_warc_build_segments_and_ranges(spark, warc_index):
    idx, built = warc_index
    assert len(built) == 3
    assert sorted(r["min_doc"] for r in built) == [0, 40, 80]
    assert sorted(r["max_doc"] for r in built) == [39, 79, 119]
    assert sum(r["n_docs"] for r in built) == N


def test_warc_index_matches_parquet_index(spark, warc_index, parquet_index):
    idx_w, _ = warc_index
    # term -> df multisets aggregate the whole inverted index; any
    # extract/normalize/tokenize divergence between the two paths shifts
    # some term's df
    assert _postings_multiset(spark, idx_w) == _postings_multiset(
        spark, parquet_index
    )


def test_warc_index_query_rank_identity(spark, warc_index, parquet_index):
    from pyspark.sql import functions as F

    idx_w, _ = warc_index
    top2 = [
        r["term"]
        for r in SegmentStore(spark, idx_w)
        .postings()
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(2)
        .collect()
    ]
    for terms in (top2[:1], top2, ["usa"]):
        a = wand_query_direct(
            SegmentStore(spark, idx_w), terms, k=10
        ).collect()
        b = wand_query_direct(
            SegmentStore(spark, parquet_index), terms, k=10
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]


def test_warc_build_resume_skips_done_files(spark, warc_index):
    idx, _ = warc_index
    crawl = idx.replace("/index", "/crawl")
    again = build_segments_from_warc(
        spark, W.list_warc_paths(crawl), idx, stride=PER_FILE
    ).collect()
    assert again == []  # every file's range already checkpointed
    assert len(read_checkpoints(idx)) == 3


def test_wet_build_equals_warc_build(spark, tmp_path):
    W.webtext_wet_files(
        spark, 60, str(tmp_path / "wet"), docs_per_file=30
    ).collect()
    idx = str(tmp_path / "wetindex")
    built = build_segments_from_warc(
        spark,
        W.list_warc_paths(str(tmp_path / "wet")),
        idx,
        stride=30,
        wet=True,
    ).collect()
    assert sum(r["n_docs"] for r in built) == 60
    # WET conversion payload == extracted html text for this corpus, so
    # the index serves queries like any other; pick a real high-df term
    # (stopwords are stripped at index time, so "the" would return empty)
    store = SegmentStore(spark, idx)
    import pyspark.sql.functions as F

    term = (
        store.postings()
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .orderBy(F.desc("df"), "term")
        .first()["term"]
    )
    got = wand_query_direct(store, [term], k=5).collect()
    assert len(got) == 5


def test_title_field_crawl_build_matches_fused(spark, tmp_path):
    """title_field=True: the crawl build writes the composite-key
    multi-field format, and fielded WAND over it is rank-identical to a
    fused multi-field build over the same (text, title) columns — the
    generator's pages carry <title>doc N</title>."""
    from pyspark.sql import functions as F

    from clucene_spark.index.segments import build_segments_fused

    n, k = 80, 40
    W.webtext_warc_files(
        spark, n, str(tmp_path / "crawl"), docs_per_file=k
    ).collect()
    idx_w = str(tmp_path / "widx")
    build_segments_from_warc(
        spark, W.list_warc_paths(str(tmp_path / "crawl")), idx_w,
        stride=k, title_field=True,
    ).collect()

    docs = webtext_df(spark, n, messy=True).select(
        "doc_id", "text",
        F.concat(F.lit("doc "), F.col("doc_id")).alias("title"),
    )
    idx_f = str(tmp_path / "fidx")
    build_segments_fused(
        docs, idx_f, docs_per_segment=k,
        fields=[("text", "text", "standard"),
                ("title", "title", "standard")],
    )

    for field, terms in (("title", ["doc"]), ("text", ["usa"]),
                         (None, None)):
        if field is None:
            continue
        a = wand_query_direct(
            SegmentStore(spark, idx_w), terms, k=10, field=field
        ).collect()
        b = wand_query_direct(
            SegmentStore(spark, idx_f), terms, k=10, field=field
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ], field
    # the title query actually matched (every page has "doc" in title)
    assert len(
        wand_query_direct(
            SegmentStore(spark, idx_w), ["doc"], k=10, field="title"
        ).collect()
    ) == 10


def test_lang_routed_crawl_build(spark, tmp_path):
    """analyzer='lang' on the crawl path: CJK-heavy pages route through
    the bigram chain (script detection — no lang column exists in a
    crawl), ASCII pages through the StandardAnalyzer."""
    from clucene_spark.index.warc_build import detect_lang

    assert detect_lang("plain english words") == "en"
    assert detect_lang("你好世界欢迎光临") == "zh"
    assert detect_lang("mostly english 你") == "en"

    docs = spark.createDataFrame(
        [
            (0, "Quick brown foxes JUMPED over it"),
            (1, "你好世界欢迎光临这里很好"),
            (2, "plain words again here"),
        ],
        "doc_id long, text string",
    )
    crawl = str(tmp_path / "crawl")
    W.warc_files_from_docs(docs, crawl, n_files=1).collect()
    idx = str(tmp_path / "idx")
    build_segments_from_warc(
        spark, W.list_warc_paths(crawl), idx, analyzer="lang", stride=10
    ).collect()
    terms = {
        r["term"] for r in SegmentStore(spark, idx).postings()
        .select("term").collect()
    }
    assert "你好" in terms and "世界" in terms   # CJK bigrams
    assert "quick" in terms and "jumped" in terms  # standard chain
    assert "你好世界欢迎光临这里很好" not in terms  # not one whitespace token


def test_supersede_recrawls_latest_capture_wins(spark, tmp_path):
    """Incremental crawl waves: a later capture of the same canonical
    URL (www./utm noise included) supersedes the earlier doc via the
    deletes sidecar; queries stop returning superseded docs; the pass is
    idempotent."""
    import datetime as dt

    from pyspark.sql import functions as F

    from clucene_spark.index.warc_build import (
        crawl_urls,
        supersede_recrawls,
    )

    t0 = dt.datetime(2024, 1, 1)
    wave1 = spark.createDataFrame(
        [(i, f"wave one body {i}", f"https://s.example/p{i}", t0)
         for i in range(20)],
        "doc_id long, text string, url string, ts timestamp",
    )
    # re-crawl p0..p4 a day later under noisy variants of the same URLs
    wave2 = spark.createDataFrame(
        [(100 + i, f"wave two body {i}",
          f"http://www.s.example/p{i}?utm_source=feed",
          t0 + dt.timedelta(days=1))
         for i in range(5)],
        "doc_id long, text string, url string, ts timestamp",
    )
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    W.warc_files_from_docs(wave1, d1, 1, url_col="url", ts_col="ts").collect()
    W.warc_files_from_docs(wave2, d2, 1, url_col="url", ts_col="ts").collect()
    idx = str(tmp_path / "idx")
    p1, p2 = W.list_warc_paths(d1)[0], W.list_warc_paths(d2)[0]
    build_segments_from_warc(
        spark, [p1, p2], idx, stride=100,
        file_indices={p1: 0, p2: 1},
    ).collect()

    assert crawl_urls(spark, idx).count() == 25
    deleted = supersede_recrawls(spark, idx)
    assert deleted == [0, 1, 2, 3, 4]
    # wave-one bodies of the superseded docs no longer surface
    got = wand_query_direct(SegmentStore(spark, idx), ["one"], k=25).collect()
    assert {r["doc_id"] for r in got} == set(range(5, 20))
    got2 = wand_query_direct(SegmentStore(spark, idx), ["two"], k=25).collect()
    assert {r["doc_id"] for r in got2} == {100, 101, 102, 103, 104}
    assert supersede_recrawls(spark, idx) == []  # idempotent


def test_normalize_py_matches_column_form(spark):
    from pyspark.sql import functions as F

    from clucene_spark.pipeline.extract import (
        normalize_text_col,
        normalize_text_py,
    )

    cases = [
        "a\u0301bc  def",          # combining accent -> NFC composes
        "x\x00y\x07z",            # control strip
        "a\u00a0b",                # NBSP
        "l1\r\nl2\rl3",          # CRLF / CR
        "a \t  b",                 # run collapse
        "a \n b",                  # newline-adjacent
        "  lead and trail \n ",
        "",
        " \t\r\n mixe\u0301d \x1f all \r\n",
    ]
    df = spark.createDataFrame(pd.DataFrame({"t": cases}))
    got = [
        r["n"]
        for r in df.select(
            normalize_text_col(F.col("t")).alias("n")
        ).collect()
    ]
    assert got == [normalize_text_py(c) for c in cases]


def test_crawl_urls_survive_compaction_and_supersede(spark, tmp_path):
    """Regression (r5): merge dropped the urls.parquet sidecar, so after
    the first compaction crawl_urls raised (all segments merged) and
    re-crawl supersedence went blind. After optimize() the full capture
    metadata must survive (minus purged docs) and a later wave must
    still supersede compacted captures. Also pins that crawl_urls reads
    COMMITTED segments only — an uncommitted .tmp leftover from a
    crashed build must not feed the supersedence pass."""
    import datetime as dt
    import os
    import shutil

    from clucene_spark.index.merge import optimize
    from clucene_spark.index.warc_build import crawl_urls, supersede_recrawls

    t0 = dt.datetime(2024, 1, 1)
    wave1 = spark.createDataFrame(
        [(i, f"wave one body {i}", f"https://s.example/p{i}", t0)
         for i in range(20)],
        "doc_id long, text string, url string, ts timestamp",
    )
    d1 = str(tmp_path / "w1")
    W.warc_files_from_docs(wave1, d1, 2, url_col="url", ts_col="ts").collect()
    idx = str(tmp_path / "idx")
    p1 = W.list_warc_paths(d1)
    build_segments_from_warc(
        spark, p1, idx, stride=100,
        file_indices={p: i for i, p in enumerate(p1)},
    ).collect()
    assert crawl_urls(spark, idx).count() == 20

    optimize(spark, idx)  # compaction must carry the sidecar
    urls_after = crawl_urls(spark, idx)
    assert urls_after.count() == 20
    # 2 files x 10 docs at stride 100: ids 0-9 and 100-109
    wave1_ids = set(range(10)) | set(range(100, 110))
    assert {r["doc_id"]
            for r in urls_after.select("doc_id").collect()} == wave1_ids

    # uncommitted leftover: a fake .tmp segment with a urls sidecar must
    # be invisible to crawl_urls (manifest-resolved, not globbed)
    seg_root = os.path.join(idx, "segments")
    live = next(n for n in os.listdir(seg_root) if n.startswith("seg_m_"))
    ghost = os.path.join(seg_root, "seg_a_999.deadbeef.tmp")
    shutil.copytree(os.path.join(seg_root, live), ghost)
    assert crawl_urls(spark, idx).count() == 20
    shutil.rmtree(ghost)

    # wave 2 re-crawls p0..p4 a day later — supersedence must still work
    wave2 = spark.createDataFrame(
        [(200 + i, f"wave two body {i}",
          f"http://www.s.example/p{i}?utm_source=feed",
          t0 + dt.timedelta(days=1))
         for i in range(5)],
        "doc_id long, text string, url string, ts timestamp",
    )
    d2 = str(tmp_path / "w2")
    W.warc_files_from_docs(wave2, d2, 1, url_col="url", ts_col="ts").collect()
    p2 = W.list_warc_paths(d2)[0]
    build_segments_from_warc(
        spark, [p2], idx, stride=100, file_indices={p2: 2},
    ).collect()
    assert supersede_recrawls(spark, idx) == [0, 1, 2, 3, 4]
    got = wand_query_direct(SegmentStore(spark, idx), ["one"], k=25).collect()
    assert {r["doc_id"] for r in got} == wave1_ids - {0, 1, 2, 3, 4}


def test_title_field_lang_analyzer_build(spark, tmp_path):
    """Regression (r5): analyzer='lang' with title_field=True crashed the
    task (zip over langs=None for the title pass). The build must
    succeed, route CJK body text to bigrams, and serve fielded title
    queries."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    docs = spark.createDataFrame(
        [(0, "plain english body text", "https://s.example/a", t0),
         (1, "中文的文本内容也很多",
          "https://s.example/b", t0)],
        "doc_id long, text string, url string, ts timestamp",
    )
    d = str(tmp_path / "w")
    W.warc_files_from_docs(docs, d, 1, url_col="url", ts_col="ts").collect()
    idx = str(tmp_path / "idx")
    p = W.list_warc_paths(d)[0]
    build_segments_from_warc(
        spark, [p], idx, stride=100, file_indices={p: 0},
        analyzer="lang", title_field=True,
    ).collect()
    store = SegmentStore(spark, idx)
    got = wand_query_direct(store, ["english"], k=5, field="text").collect()
    assert [r["doc_id"] for r in got] == [0]
    # CJK body routed through the bigram chain
    got_zh = wand_query_direct(
        store, ["中文"], k=5, field="text"
    ).collect()
    assert [r["doc_id"] for r in got_zh] == [1]
