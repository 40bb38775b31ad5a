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
