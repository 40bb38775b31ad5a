"""Deterministic synthetic Common-Crawl-style webtext generator (FIXTURES.md §A).

Schema per BASELINE.json input_hint:
    (doc_id long, url string, warc_ts timestamp, html binary, text string,
     lang string)

Everything about a row derives deterministically from (seed, doc_id), so the
table can be generated distributed (mapInPandas over spark.range) at any
scale with no driver bottleneck and no shuffle, and regenerated identically
for oracles. Planted tokenizer edge cases land at known doc_id slots.

Per-row invariant: ``extract_text(html) == text`` byte-identical — the
generator embeds text into a minimal html page; the pipeline re-extracts it
(the reference analogue is byte-identical text per url, north_star).
"""

from __future__ import annotations

import datetime as _dt
import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

SEED = 42
N_VOCAB = 30_000

# planted tokenizer edge cases (FIXTURES.md §A), cycled by doc_id % 16
PLANTED = [
    "U.S.A.",
    "windowsupdate.microsoft.com",
    "192.168.1.3",
    "O'Reilly's",
    "AT&T",
    "bob@example.com",
    "-1.5",
    "3.14159",
    "x_y_z",
    "abc.--def",
    "你好世界",
    "don't",
    "x&y",
    "a.b.c",
    "1.2.3.4.5",
    "quick-brown",
]

STOP33 = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()


def _vocab() -> list[str]:
    """~30k deterministic pseudo-English words."""
    rng = np.random.RandomState(SEED)
    cons = list("bcdfghjklmnpqrstvwz")
    vow = list("aeiou")
    words = set(STOP33)
    out = list(STOP33)
    while len(out) < N_VOCAB:
        n_syl = rng.randint(1, 4)
        w = "".join(
            cons[rng.randint(len(cons))] + vow[rng.randint(len(vow))]
            for _ in range(n_syl)
        )
        if rng.rand() < 0.3:
            w += cons[rng.randint(len(cons))]
        if w not in words:
            words.add(w)
            out.append(w)
    return out


_VOCAB_CACHE: list[str] | None = None
_VOCAB_ARR: np.ndarray | None = None


def vocab() -> list[str]:
    global _VOCAB_CACHE
    if _VOCAB_CACHE is None:
        _VOCAB_CACHE = _vocab()
    return _VOCAB_CACHE


def _vocab_arr() -> np.ndarray:
    global _VOCAB_ARR
    if _VOCAB_ARR is None:
        _VOCAB_ARR = np.array(vocab(), dtype=object)
    return _VOCAB_ARR


# One worker-resident RandomState, re-seeded per doc: rs.seed(n) restores
# the EXACT MT19937 state RandomState(n) constructs (both go through the
# legacy init_by_array seeding; equality is pinned in
# tests/test_webtext_determinism), but skips the ~160 us SeedSequence
# machinery a fresh constructor pays — which profiling showed was the
# single largest cost of corpus synthesis (make_doc 269 us/doc, seeding
# 60% of it). Python workers run one task at a time, so a module global
# needs no locking; re-seeding before every doc makes it stateless.
_DOC_RNG = np.random.RandomState(0)


def make_doc(
    doc_id: int, messy: bool = False
) -> tuple[int, str, _dt.datetime, bytes, str, str]:
    """One deterministic row. Zipf-distributed vocab; ~lognormal length.

    messy=True produces realistic Common-Crawl-grade text: ~12% of words
    sentence-cased or UPPER, ~15% carrying trailing punctuation, commas and
    periods between clauses — the shape real web text has, where the
    analyzer DFA actually earns its keep (benchmarks should not run on
    artificially pristine lowercase)."""
    v = _vocab_arr()
    rng = _DOC_RNG
    rng.seed((SEED * 1_000_003 + doc_id) % (2**31 - 1))
    n_words = max(5, int(rng.lognormal(mean=4.6, sigma=0.6)))  # ~100 tokens
    # Zipf over the vocab (a=1.3), clipped into range
    idx = np.minimum(rng.zipf(1.3, size=n_words) - 1, len(v) - 1)
    wa = v[idx]  # fancy indexing: fresh object array, safe to mutate
    if messy:
        r = rng.rand(len(wa))
        # touch only the ~12% cased and ~8% punctuated words instead of
        # branching per word (draw order identical: one rand(n) as before)
        for i in np.flatnonzero(r < 0.12):
            w = wa[i]
            wa[i] = w.capitalize() if r[i] < 0.08 else w.upper()
        for i in np.flatnonzero(r > 0.92):
            wa[i] += "." if r[i] > 0.96 else ","
    words = wa.tolist()
    planted = None
    if doc_id % 4 == 0:
        # plant an edge-case token at a deterministic position; (doc_id//4)
        # cycles through ALL 16 planted cases (doc_id%16 would only ever hit
        # the multiples of 4)
        planted = PLANTED[(doc_id // 4) % 16]
        words.insert(int(rng.randint(0, len(words))), planted)
    text = " ".join(words)
    lang = "zh" if planted == "你好世界" else (
        "de" if doc_id % 37 == 0 else "en"
    )
    title = f"doc {doc_id}"
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{_escape(text)}</p></body></html>"
    ).encode("utf-8")
    url = f"https://site{doc_id % 97}.example/{hashlib.md5(str(doc_id).encode()).hexdigest()[:12]}"
    ts = _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=int(doc_id) * 7)
    return (doc_id, url, ts, html, text, lang)


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unescape(s: str) -> str:
    return s.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


def extract_text(html: bytes) -> str:
    """Deterministic text extraction — inverse of the generator's embedding.
    The per-row invariant extract_text(html) == text is asserted in tests
    (north_star: byte-identical extracted text per url)."""
    s = html.decode("utf-8")
    start = s.index("<p>") + 3
    end = s.rindex("</p>")
    return _unescape(s[start:end])


WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def webtext_df(spark: SparkSession, n_docs: int, partitions: int | None = None,
               messy: bool = False) -> DataFrame:
    """Distributed deterministic generation: spark.range -> mapInPandas.
    No shuffle; each partition generates its id range independently, so the
    same code generates 2k docs for pytest or 10^9+ on a cluster."""
    n_part = partitions or max(
        spark.sparkContext.defaultParallelism, n_docs // 5000 + 1
    )
    rng_df = spark.range(0, n_docs, numPartitions=n_part)

    def gen(batches):
        for pdf in batches:
            rows = [make_doc(int(i), messy=messy) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["doc_id", "url", "warc_ts", "html", "text", "lang"]
            )

    return rng_df.mapInPandas(gen, schema=WEBTEXT_SCHEMA)
