"""Webtext generator invariants + Spark standard-tokenizer parity.

Asserts (a) deterministic generation, (b) the per-row north-star invariant
extract_text(html) == text byte-identical, (c) the Arrow-batched Spark
tokenizer emits exactly what the single-node analyzer emits, (d) an index
built with the standard analyzer over webtext matches the Python oracle.
"""

import pytest

from clucene_spark.analysis.standard import standard_analyze
from clucene_spark.data.webtext import extract_text, make_doc, webtext_df

N_DOCS = 300


@pytest.fixture(scope="module")
def webtext(spark):
    return webtext_df(spark, N_DOCS, partitions=4).cache()


def test_deterministic_generation():
    a = make_doc(17)
    b = make_doc(17)
    assert a == b
    assert make_doc(18) != a


def test_extract_text_roundtrip_local():
    for doc_id in range(0, 200, 7):
        row = make_doc(doc_id)
        html, text = row[3], row[4]
        assert extract_text(html) == text  # byte-identical per url (north star)


def test_webtext_df_matches_local(spark, webtext):
    rows = {r["doc_id"]: r for r in webtext.collect()}
    assert len(rows) == N_DOCS
    for doc_id in [0, 1, 42, 137, 299]:
        local = make_doc(doc_id)
        got = rows[doc_id]
        assert got["url"] == local[1]
        assert bytes(got["html"]) == local[3]
        assert got["text"] == local[4]
        assert extract_text(bytes(got["html"])) == got["text"]


def test_spark_tokenizer_parity(spark, webtext):
    """mapInPandas tokens == single-node standard_analyze, every doc."""
    from clucene_spark.analysis.spark import tokenize_standard

    got = {}
    for r in tokenize_standard(webtext, full=True).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["pos"], r["term"], r["start_off"], r["end_off"], r["type"])
        )
    # slim indexing path agrees with the full path
    slim = {}
    for r in tokenize_standard(webtext).collect():
        slim.setdefault(r["doc_id"], []).append((r["pos"], r["term"]))
    assert {k: sorted(v) for k, v in slim.items()} == {
        k: sorted((p, t) for p, t, _, _, _ in v) for k, v in got.items()
    }
    for doc_id in range(N_DOCS):
        want = [
            (pos, term, s, e, ty)
            for term, pos, s, e, ty in standard_analyze(make_doc(doc_id)[4])
        ]
        assert sorted(got.get(doc_id, [])) == want, f"doc {doc_id}"


def test_standard_index_topk_matches_oracle(spark, webtext):
    from clucene_spark.index.build import InvertedIndex
    from clucene_spark.search.engine import Searcher, TermQuery

    from .oracle import PyIndex, PySearcher, topk

    index = InvertedIndex(webtext, analyzer="standard").cache()
    rows = [(doc_id, make_doc(doc_id)[4]) for doc_id in range(N_DOCS)]
    py = PyIndex(rows, tokenizer=lambda t: [x[0] for x in standard_analyze(t)])

    s = Searcher(index)
    ps = PySearcher(py)
    # pick a few real terms from the corpus (mid-frequency + planted)
    terms = ["usa", "at&t", "192.168.1.3", "bob@example.com"]
    for term in terms:
        want = topk(ps.term_scores(term), 10)
        got = [(r["doc_id"], r["score"]) for r in s.topk(TermQuery(term=term), 10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], term
        for (gd, gs), (od, os_) in zip(got, want):
            assert abs(gs - os_) < 1e-6


def test_distributed_extract_matches_generator(spark):
    """The DISTRIBUTED extractor (pipeline/extract.py, Arrow-batched)
    upholds the north-star invariant over the generator table:
    extract(html) == text byte-identical for every row, computed
    entirely JVM->Arrow->pandas, no driver loop."""
    from clucene_spark.pipeline.extract import extract_pages

    pages = webtext_df(spark, 200)
    mism = (
        extract_pages(pages.select("doc_id", "html", "text"
                                   ).withColumnRenamed("text", "want"),
                      out_col="got")
        .filter("got <> want")
        .count()
    )
    assert mism == 0


def test_extract_text_py_page_anatomy():
    """Script/style bodies and head content never leak; block tags become
    line breaks; full stdlib entity table applies (numeric refs too);
    dirty bytes degrade, never raise."""
    from clucene_spark.pipeline.extract import extract_text_py

    page = (b"<html><head><title>SKIP</title><style>p{color:red}</style>"
            b"<script>var SKIP=1;</script></head>"
            b"<body><h1>Head&nbsp;line</h1><ul><li>a&#38;b</li><li>c</li></ul>"
            b"<p>x &lt;tag&gt; y</p><span>in</span><span>line</span></body>")
    got = extract_text_py(page)
    assert got == "Head line\na&b\nc\nx <tag> y\ninline"
    assert "SKIP" not in got
    # invalid utf-8: replacement char, no exception
    assert "�" in extract_text_py(b"<body><p>a\xffb</p></body>")


def test_normalize_text_spec(spark):
    """Each normalization step observable: NFC composition, control
    strip, NBSP, CRLF, run collapse, newline-adjacent strip, edge trim;
    nfc=False variant is pure Catalyst (no Python stage in the plan)."""
    from pyspark.sql import functions as F

    from clucene_spark.pipeline.extract import normalize_text_col

    dirty = "A\u00a0B\u0001C  D\tE\r\nF \n G\re\u0301  "
    df = spark.createDataFrame([(1, dirty)], ["doc_id", "text"])
    got = df.select(
        normalize_text_col(F.col("text")).alias("c")
    ).first()["c"]
    assert got == "A BC D E\nF\nG\n\u00e9"  # the CR became a line break
    plan = df.select(
        normalize_text_col(F.col("text"), nfc=False).alias("c")
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# boilerplate removal (extract_main_text_py) — r4 late
# ---------------------------------------------------------------------------

def test_main_text_keeps_prose_drops_boilerplate():
    from clucene_spark.pipeline.extract import extract_main_text_py

    page = (
        "<html><body>"
        '<nav><a href="/">home</a> <a href="/x">about</a></nav>'
        "<p>this paragraph has clearly more than ten plain words of real "
        "prose content</p>"
        '<div><a href="/t">one two three four five six seven eight nine '
        "ten eleven</a></div>"
        "<footer>copyright</footer>"
        "</body></html>"
    )
    assert extract_main_text_py(page) == (
        "this paragraph has clearly more than ten plain words of real "
        "prose content"
    )


def test_main_text_thresholds_and_mixed_blocks():
    from clucene_spark.pipeline.extract import extract_main_text_py

    nine = "a b c d e f g h i"
    ten = nine + " j"
    # word threshold is inclusive at min_words
    assert extract_main_text_py(f"<p>{nine}</p>") == ""
    assert extract_main_text_py(f"<p>{ten}</p>") == ten
    # a long block with a minority link is kept; link chars count toward
    # density but the prose dominates
    mixed = (
        "<p>plenty of ordinary words surround "
        '<a href="/l">a link</a> '
        "in this long paragraph of honest text</p>"
    )
    assert extract_main_text_py(mixed) == (
        "plenty of ordinary words surround a link in this long "
        "paragraph of honest text"
    )
    # density >= max drops even long blocks
    linky = '<p><a href="/l">' + ten + "</a></p>"
    assert extract_main_text_py(linky) == ""
    # multiple kept blocks join in document order
    two = f"<p>{ten}</p><div>{ten} extra words here now</div>"
    assert extract_main_text_py(two) == f"{ten}\n{ten} extra words here now"


def test_main_text_entities_and_bytes():
    from clucene_spark.pipeline.extract import extract_main_text_py

    page = (
        "<p>entity &amp; test with enough plain words to pass the "
        "threshold fine</p>"
    ).encode("utf-8")
    assert extract_main_text_py(page) == (
        "entity & test with enough plain words to pass the threshold fine"
    )


def test_extract_canonical_hint():
    from clucene_spark.pipeline.extract import extract_canonical_py

    page = (
        '<html><head><link rel="canonical" '
        'href="/real?b=2&amp;a=1"></head><body/></html>'
    )
    # relative resolves against the page url; entity unescaped first
    assert extract_canonical_py(page, "https://w.example/p?session=9") == (
        "https://w.example/real?b=2&a=1"
    )
    assert extract_canonical_py(
        "<link rel='canonical' href='https://abs.example/x'>", "https://b/"
    ) == "https://abs.example/x"
    assert extract_canonical_py("<p>no link</p>", "https://b/") is None
    assert extract_canonical_py(
        '<link rel="canonical">', "https://b/"
    ) is None
    assert extract_canonical_py(
        b'<LINK REL="CANONICAL" HREF="/up">', "https://b.example/d/e"
    ) == "https://b.example/up"


def test_blocklist_filter_suffix_semantics(spark):
    from clucene_spark.pipeline.urls import blocklist_filter

    pages = spark.createDataFrame(
        [
            (0, "https://ads.bad.example/x"),
            (1, "https://bad.example/y"),
            (2, "https://notbad.example/z"),     # NOT a suffix match
            (3, "https://good.example/w"),
            (4, "https://deep.sub.bad.example/v"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("bad.example",)], "domain string")
    kept = sorted(
        r["doc_id"] for r in blocklist_filter(pages, bl).collect()
    )
    assert kept == [2, 3]
    marked = {
        r["doc_id"]: r["blocked"]
        for r in blocklist_filter(pages, bl, keep_blocked=True).collect()
    }
    assert marked == {0: True, 1: True, 2: False, 3: False, 4: True}


def test_blocklist_filter_null_fields_and_caller_columns(spark):
    """Regression (r5): the join-back on ALL page columns let any row
    with a NULL field (failed fetch -> html NULL) escape the blocklist,
    and shuffled the full payload as a join key. NULL-field rows must
    filter/annotate exactly like complete rows."""
    from clucene_spark.pipeline.urls import blocklist_filter

    pages = spark.createDataFrame(
        [
            (1, "https://ads.bad.example/x", None),
            (2, "https://ok.example/y", "<html>fine</html>"),
            (3, "https://sub.ads.bad.example/z", "<html>b</html>"),
        ],
        "doc_id long, url string, html string",
    )
    bl = spark.createDataFrame([("bad.example",)], "domain string")
    kept = {r["doc_id"] for r in blocklist_filter(pages, bl).collect()}
    assert kept == {2}
    marked = {r["doc_id"]: r["blocked"]
              for r in blocklist_filter(pages, bl, keep_blocked=True).collect()}
    assert marked == {1: True, 2: False, 3: True}
    # caller columns come back unchanged (no synthetic columns leak)
    out = blocklist_filter(pages, bl)
    assert out.columns == pages.columns


def test_extract_text_null_html(spark):
    """Regression (r5): a NULL html cell crashed the whole extract stage
    (re.sub on None); it must map to empty text / no links."""
    from pyspark.sql import functions as F

    from clucene_spark.pipeline.extract import extract_pages
    from clucene_spark.pipeline.links import extract_links

    pages = spark.createDataFrame(
        [(1, "https://a.example/", None),
         (2, "https://b.example/", "<html><body><a href='/x'>x</a> hi</body></html>")],
        "doc_id long, url string, html string",
    )
    texts = {r["doc_id"]: r["text"]
             for r in extract_pages(pages).select("doc_id", "text").collect()}
    assert texts[1] == "" and "hi" in texts[2]
    links = extract_links(pages)
    assert links.filter(F.col("src_url") == "https://a.example/").count() == 0
    assert links.filter(F.col("src_url") == "https://b.example/").count() == 1
    # mixed-case pseudo-schemes are dropped like lowercase ones
    from clucene_spark.pipeline.links import extract_links_py

    got = extract_links_py(
        "https://c.example/",
        "<a href='JavaScript:void(0)'>j</a><a href='Mailto:a@b'>m</a>"
        "<a href='/real'>r</a>",
    )
    assert [d for d, _ in got] == ["https://c.example/real"]
