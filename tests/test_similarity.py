"""Norm codec + similarity math parity (reference Similarity.cpp:99-235)."""

import math

from clucene_spark.search import similarity as sim


def test_norm_codec_roundtrip():
    # decode(encode(x)) within one quantum — 3-bit mantissa codec
    for dl in [1, 2, 3, 7, 10, 100, 1000, 10000]:
        b = sim.encode_norm(dl)
        decoded = sim.decode_norm(b)
        exact = 1.0 / math.sqrt(dl)
        # truncating codec (floatToByte315 shifts bits away, no rounding):
        # decoded <= exact, relative error bounded by one mantissa quantum
        assert decoded <= exact + 1e-9, (dl, b, decoded, exact)
        assert abs(decoded - exact) / exact < 0.25, (dl, b, decoded, exact)


def test_norm_codec_known_values():
    # encode(1.0) must round-trip to exactly 1.0 (Similarity.cpp table)
    assert sim.decode_norm(sim.encode_norm(1)) == 1.0
    assert sim.encode_norm(0) == 0
    assert sim.decode_norm(0) == 0.0
    # monotonic: longer docs -> smaller norms
    norms = [sim.decode_norm(sim.encode_norm(dl)) for dl in [1, 4, 16, 64, 256]]
    assert norms == sorted(norms, reverse=True)


def test_norm_table_structure():
    assert len(sim.NORM_TABLE) == 256
    assert sim.NORM_TABLE[0] == 0.0
    # table is monotonically nondecreasing after 0
    assert all(
        sim.NORM_TABLE[i] <= sim.NORM_TABLE[i + 1] for i in range(1, 255)
    )


def test_bm25_math():
    # idf decreasing in df, tf saturating in f
    assert sim.bm25_idf_py(1, 1000) > sim.bm25_idf_py(100, 1000)
    s1 = sim.bm25_score_py(1, 10, 50, 1000, 50.0)
    s2 = sim.bm25_score_py(2, 10, 50, 1000, 50.0)
    s100 = sim.bm25_score_py(100, 10, 50, 1000, 50.0)
    assert s1 < s2 < s100 < s1 * (sim.K1 + 1.0)


def test_classic_math():
    assert sim.classic_idf_py(0, 1000) == math.log(1000.0) + 1.0
    assert sim.classic_tf_py(4) == 2.0
    assert sim.classic_query_norm_py(4.0) == 0.5


def test_byte_norm_codec_roundtrip_monotone():
    """The 8-bit norm codec (Similarity.cpp:99-160): decode(encode(x)) is a
    lossy but monotone quantization, and known fixed points hold."""
    from clucene_spark.search.similarity import (
        decode_norm,
        encode_norm,
        _byte_to_float,
        _float_to_byte,
    )

    assert _float_to_byte(0.0) == 0
    assert _byte_to_float(0) == 0.0
    assert abs(_byte_to_float(_float_to_byte(1.0)) - 1.0) < 1e-6
    prev = None
    for dl in [1, 2, 3, 5, 10, 50, 100, 1000, 10_000]:
        n = decode_norm(encode_norm(dl))
        assert 0.0 < n <= 1.0
        if prev is not None:
            assert n <= prev  # longer doc -> smaller norm
        prev = n


def test_lnorm_column_matches_python_codec(spark):
    """The closed-form Catalyst lnorm expression equals
    decode_norm(encode_norm(dl)) bit-for-bit over a wide dl sweep —
    every mantissa/exponent boundary in the practical range, plus the
    dl=0 sentinel (VERDICT r4: zero-job norm setup must not change a
    single quantized value)."""
    from pyspark.sql import functions as F

    from clucene_spark.search.similarity import (
        decode_norm,
        encode_norm,
        lnorm_column,
    )

    dls = (
        list(range(0, 2050))
        + [2 ** k + d for k in range(11, 40) for d in (-1, 0, 1)]
        + [10 ** k for k in range(3, 12)]
    )
    df = spark.createDataFrame([(dl,) for dl in dls], "dl long")
    got = {
        r["dl"]: r["n"]
        for r in df.select("dl", lnorm_column(F.col("dl")).alias("n")).collect()
    }
    for dl in dls:
        want = decode_norm(encode_norm(dl)) if dl > 0 else 0.0
        assert got[dl] == want, (dl, got[dl], want)


def test_classic_byte_norm_rank_parity(spark, sf_dir, docs_rows):
    """Spark classic scoring with norm_bytes=True is rank-identical to the
    python oracle using the same lossy codec."""
    from clucene_spark.index.build import InvertedIndex
    from clucene_spark.search.engine import Searcher, TermQuery

    from .oracle import PyIndex, PySearcher, topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = InvertedIndex(docs)
    s = Searcher(index, similarity="classic", norm_bytes=True)
    py = PySearcher(PyIndex(docs_rows), similarity="classic", norm_bytes=True)
    from clucene_spark.search import similarity as simm

    for term in ["spark", "table", "the"]:
        got = [(r["doc_id"], r["score"])
               for r in s.topk(TermQuery(term=term), 10, round_to=4).collect()]
        idf = simm.classic_idf_py(py.ix.df(term), py.ix.n_docs)
        qn = simm.classic_query_norm_py(idf * idf)
        want = [(d, round(v, 4))
                for d, v in topk(py.term_scores(term, query_norm=qn), 10)]
        assert got == want, term
