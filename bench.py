"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>, ...extras}

Measures:
  * index_build: full inverted-index materialization (tokenize -> postings
    + doc_lens + term_dict, cached) over the documents table
  * headline query latencies (BM25 term / boolean AND / OR / phrase /
    prefix / fuzzy top-10) against the warm index
Extras reported (not part of the driver contract but used by BASELINE.md):
  docs_per_sec for the index build.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clucene_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")

    from clucene_spark.index.build import InvertedIndex
    from clucene_spark.search.engine import (
        MUST,
        SHOULD,
        BooleanQuery,
        FuzzyQuery,
        PhraseQuery,
        PrefixQuery,
        Searcher,
        TermQuery,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    index = InvertedIndex(docs).cache()
    # force materialization of all cached index tables
    index.postings.count()
    index.doc_lens.count()
    index.term_dict.count()
    t1 = time.perf_counter()
    timings["index_build"] = round(t1 - t0, 4)

    searcher = Searcher(index)

    headline = {
        "q_term": TermQuery(term="spark"),
        "q_and": BooleanQuery()
        .add(TermQuery(term="spark"), MUST)
        .add(TermQuery(term="join"), MUST),
        "q_or": BooleanQuery()
        .add(TermQuery(term="spark"), SHOULD)
        .add(TermQuery(term="vector"), SHOULD)
        .add(TermQuery(term="window"), SHOULD),
        "q_phrase": PhraseQuery(terms=["batch", "batch"]),
        "q_prefix": PrefixQuery(prefix="s"),
        "q_fuzzy": FuzzyQuery(term="spark", min_similarity=0.7),
    }
    for name, q in headline.items():
        t0 = time.perf_counter()
        searcher.topk(q, 10).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "index_build_plus_topk_latency",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / timings["index_build"], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
