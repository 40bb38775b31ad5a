"""Sortable string encodings for numerics and dates.

The reference has no type system — range-searchable numbers and dates are
encoded as strings whose LEXICOGRAPHIC order equals numeric/chronological
order:

  * NumberTools (reference document/NumberTools.cpp:17-42, .h:29-50):
    prefix '-' (negative) / '0' (non-negative) + 13 base-36 digits of
    (value), negatives biased by MAX+1 so they sort below positives;
    STR_SIZE = 14, MIN_STRING "-0000000000000", MAX "01y2p0ij32e8e7".
  * DateTools (reference document/DateTools.cpp:15-140, .h:30-49):
    "yyyyMMddHHmmssSSS" truncated at the chosen Resolution.

Spark usage: keep real column types for storage and math; apply these only
when a reference-compatible TERM STRING is needed (mixed term dictionary,
term-range queries over encoded values). Column variants are provided as
expressions so the encode stays JVM-side.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, functions as F

RADIX = 36
STR_SIZE = 14
_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"
I64_MAX = (1 << 63) - 1
I64_MIN = -(1 << 63)
MIN_STRING_VALUE = "-0000000000000"
MAX_STRING_VALUE = "01y2p0ij32e8e7"


def long_to_string(l: int) -> str:
    """NumberTools::longToString — 14-char sortable base-36 encoding."""
    if l == I64_MIN:
        return MIN_STRING_VALUE
    if l < 0:
        prefix = "-"
        l = I64_MAX + l + 1
    else:
        prefix = "0"
    digits = ""
    v = l
    if v == 0:
        digits = "0"
    while v:
        digits = _DIGITS[v % RADIX] + digits
        v //= RADIX
    return prefix + digits.rjust(STR_SIZE - 1, "0")


def string_to_long(s: str) -> int:
    """NumberTools::stringToLong — inverse decode with validation."""
    if len(s) != STR_SIZE:
        raise ValueError("string is the wrong size")
    if s == MIN_STRING_VALUE:
        return I64_MIN
    l = int(s[1:], RADIX)
    if s[0] == "0":
        return l
    if s[0] == "-":
        return l - I64_MAX - 1
    raise ValueError("string does not begin with the correct prefix")


# ---------------------------------------------------------------------------
# DateField — the LEGACY date encoding (reference document/DateField.cpp:
# 20-60, .h): base-36 seconds/millis zero-padded to 9 chars, lexicographic
# order == chronological order. DateFilter::Before/After build term ranges
# over it; DateTools (below) superseded it but the reference keeps both.
# ---------------------------------------------------------------------------

DATEFIELD_DATE_LEN = 9
DATEFIELD_DATE_MAX = RADIX ** DATEFIELD_DATE_LEN - 1  # "zzzzzzzzz"
MIN_DATE_STRING = "0" * DATEFIELD_DATE_LEN
MAX_DATE_STRING = "z" * DATEFIELD_DATE_LEN


def time_to_string(time: int) -> str:
    """DateField::timeToString (DateField.cpp:23-55): base-36, left-padded
    with '0' to exactly 9 chars; rejects negatives and overflow."""
    if time < 0:
        raise ValueError("time too early")
    if time > DATEFIELD_DATE_MAX:
        raise ValueError("time too late (past DATEFIELD_DATE_MAX)")
    digits = ""
    v = time
    if v == 0:
        digits = "0"
    while v:
        digits = _DIGITS[v % RADIX] + digits
        v //= RADIX
    return digits.rjust(DATEFIELD_DATE_LEN, "0")


def string_to_time(s: str) -> int:
    """DateField::stringToTime (DateField.cpp:57-60)."""
    return int(s, RADIX)


def time_to_string_col(c: Column) -> Column:
    """Column variant of DateField::timeToString (JVM-side encode)."""
    return F.lpad(F.lower(F.conv(c.cast("string"), 10, 36)),
                  DATEFIELD_DATE_LEN, "0")


# resolution name -> truncation length of yyyyMMddHHmmssSSS
RESOLUTIONS = {
    "year": 4, "month": 6, "day": 8, "hour": 10,
    "minute": 12, "second": 14, "millisecond": 17,
}


def date_to_string(dt: _dt.datetime, resolution: str = "millisecond") -> str:
    """DateTools::timeToString — truncated yyyyMMddHHmmssSSS."""
    full = f"{dt.year:04d}{dt.month:02d}{dt.day:02d}{dt.hour:02d}{dt.minute:02d}{dt.second:02d}{dt.microsecond // 1000:03d}"
    return full[: RESOLUTIONS[resolution]]


def string_to_date(s: str) -> _dt.datetime:
    pad = s + "19700101000000000"[len(s):]
    return _dt.datetime(
        int(pad[0:4]), int(pad[4:6]), int(pad[6:8]),
        int(pad[8:10]), int(pad[10:12]), int(pad[12:14]),
        int(pad[14:17]) * 1000,
    )


# ---------------------------------------------------------------------------
# column expressions (JVM-side)
# ---------------------------------------------------------------------------

def long_to_string_col(c: Column) -> Column:
    """Column variant of longToString for non-negative longs (the common
    encode path for sizes/timestamps; negatives go through the scalar)."""
    # conv() emits uppercase base-36; the reference (and our scalar) use
    # lowercase digits
    return F.concat(
        F.lit("0"), F.lpad(F.lower(F.conv(c.cast("string"), 10, 36)), 13, "0")
    )


def date_to_string_col(c: Column, resolution: str = "second") -> Column:
    fmt = "yyyyMMddHHmmssSSS"[: RESOLUTIONS[resolution]]
    # Spark date patterns: SSS needs explicit handling; up to seconds the
    # pattern maps 1:1
    return F.date_format(c, fmt.replace("SSS", "")) if resolution != "millisecond" else F.concat(
        F.date_format(c, "yyyyMMddHHmmss"),
        F.lpad((F.millisecond(c) if hasattr(F, "millisecond") else F.lit(0)).cast("string"), 3, "0"),
    )
