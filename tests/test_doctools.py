"""NumberTools / DateTools sortable-encoding tests (reference
src/test/document/TestNumberTools.cpp / TestDateTools.cpp patterns)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from clucene_spark.document.tools import (
    I64_MAX,
    I64_MIN,
    MAX_STRING_VALUE,
    MIN_STRING_VALUE,
    date_to_string,
    long_to_string,
    string_to_date,
    string_to_long,
)


def test_reference_constants():
    # MIN/MAX strings match the reference (NumberTools.cpp:14-15)
    assert long_to_string(I64_MIN) == MIN_STRING_VALUE
    assert long_to_string(I64_MAX) == MAX_STRING_VALUE
    assert string_to_long(MIN_STRING_VALUE) == I64_MIN
    assert string_to_long(MAX_STRING_VALUE) == I64_MAX


@given(st.integers(min_value=I64_MIN, max_value=I64_MAX))
@settings(max_examples=300, deadline=None)
def test_long_roundtrip(l):
    assert string_to_long(long_to_string(l)) == l


@given(
    st.integers(min_value=I64_MIN, max_value=I64_MAX),
    st.integers(min_value=I64_MIN, max_value=I64_MAX),
)
@settings(max_examples=300, deadline=None)
def test_long_encoding_is_order_preserving(a, b):
    assert (a < b) == (long_to_string(a) < long_to_string(b)) or a == b


def test_date_resolutions():
    d = dt.datetime(2004, 2, 3, 22, 8, 56, 333000)
    assert date_to_string(d, "year") == "2004"
    assert date_to_string(d, "month") == "200402"
    assert date_to_string(d, "day") == "20040203"
    assert date_to_string(d, "hour") == "2004020322"
    assert date_to_string(d, "minute") == "200402032208"
    assert date_to_string(d, "second") == "20040203220856"
    assert date_to_string(d, "millisecond") == "20040203220856333"
    assert string_to_date("20040203") == dt.datetime(2004, 2, 3)
    assert string_to_date("20040203220856333") == d


def test_date_encoding_order_preserving():
    a = dt.datetime(2020, 5, 1, 12, 0, 0)
    b = dt.datetime(2020, 5, 1, 12, 0, 1)
    assert date_to_string(a, "second") < date_to_string(b, "second")


def test_column_encode_matches_scalar(spark):
    from pyspark.sql import functions as F

    from clucene_spark.document.tools import long_to_string_col

    vals = [0, 1, 35, 36, 12345, 10**15, I64_MAX]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["enc"] for r in df.select(
        "v", long_to_string_col(F.col("v")).alias("enc")).collect()}
    for v in vals:
        assert got[v] == long_to_string(v), v
