"""Pin the crawl-path fast paths byte-equal to their reference forms.

Three hot per-record functions were rewritten for speed (profiled at
10-14us/doc each on real 15.6k-record WARC files); each rewrite must be
DECISION- and BYTE-identical to the slow form it replaced, so the slow
form lives here as the oracle and hypothesis drives both.
"""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import given, settings, strategies as st

from clucene_spark.data.warc import parse_warc_date
from clucene_spark.pipeline.extract import (
    _norm_needed,
    extract_text_py,
    normalize_text_py,
)

# --- reference (pre-optimization) forms -----------------------------------

_BODY_LAZY_RE = re.compile(r"(?is)<body[^>]*>(.*?)</body>")
_NORM_NEEDED_OLD_RE = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\xa0\r\t]|  | \n|\n "
)
_SCRIPT_RE = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1>")
_BLOCK_RE = re.compile(r"(?i)</?(?:p|div|li|ul|ol|h[1-6]|table|tr|br)\b[^>]*>")
_TAG_RE = re.compile(r"<[^>]*>")


def _extract_text_reference(raw) -> str:
    import html as _html

    s = raw.decode("utf-8", "replace") if isinstance(raw, (bytes, bytearray)) else raw
    s = _SCRIPT_RE.sub(" ", s)
    m = _BODY_LAZY_RE.search(s)
    if m:
        s = m.group(1)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    lines = (" ".join(ln.split()) for ln in s.split("\n"))
    return "\n".join(ln for ln in lines if ln)


def _parse_warc_date_reference(s):
    if not s:
        return None
    try:
        return dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


# --- fuzz: body isolation inside full extraction ---------------------------

_page_frags = st.lists(
    st.sampled_from(
        [
            "<body>", "</body>", "<BODY class=x>", "</BODY>", "<Body >",
            "<bodyx>", "< body>", "<p>", "</p>", "<div id=a>", "<br/>",
            "<script>var x=1;</script>", "<style>.a{}</style>",
            "text &amp; more", "x  y", "\n", "\t", "&#65;", "plain",
        ]
    ),
    max_size=12,
)


@settings(max_examples=400, deadline=None)
@given(_page_frags)
def test_extract_text_matches_lazy_regex_reference(frags):
    page = "".join(frags)
    assert extract_text_py(page) == _extract_text_reference(page)


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet=" \t\r\n\x0b\x1c\x85\xa0\x01\x7fabA.&<>/bodyscript=", max_size=120))
def test_extract_text_matches_reference_charsoup(s):
    assert extract_text_py(s) == _extract_text_reference(s)


# --- fuzz: needs-rewrite guard decision ------------------------------------

@settings(max_examples=600, deadline=None)
@given(st.text(alphabet=" \t\r\n\x0b\x0c\x1c\x1d\x85\xa0\x01\x08\x0e\x7fabcX. ", max_size=80))
def test_norm_needed_matches_old_regex_decision(s):
    assert _norm_needed(s) == (_NORM_NEEDED_OLD_RE.search(s) is not None)
    # and the full op stays self-consistent: clean text is a fixpoint
    out = normalize_text_py(s)
    assert normalize_text_py(out) == out


# --- fuzz: WARC-Date slice parse vs strptime --------------------------------

_datey = st.one_of(
    st.text(alphabet="0123456789-T:Z +.٢", max_size=24),
    st.from_regex(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z", fullmatch=True),
    st.sampled_from(
        [
            "2024-01-02T03:04:05Z", "2024-13-02T03:04:05Z",
            "2024-01-02T24:04:05Z", "2024-01-02T03:04:61Z",
            "2024-02-30T00:00:00Z", "0000-01-01T00:00:00Z",
            "2024-01-02T03:04:05z", " 2024-01-02T03:04:05Z",
            "2024-01-02T03:04:05Z ", "٢024-01-02T03:04:05Z",
        ]
    ),
)


@settings(max_examples=600, deadline=None)
@given(_datey)
def test_parse_warc_date_matches_strptime(s):
    assert parse_warc_date(s) == _parse_warc_date_reference(s)
