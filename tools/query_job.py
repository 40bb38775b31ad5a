"""spark-submit entrypoint: query a segment index (block-max WAND BM25).

    spark-submit --py-files clucene_spark.zip tools/query_job.py \
        --index-dir /path/index --query "spark AND join" --k 10

Free-text queries go through the Lucene-classic parser; bare term lists
run as WAND OR/AND directly. Prints one JSON line with hits + latency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clucene_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--terms", nargs="*", default=None, help="bare terms (WAND)")
    ap.add_argument("--mode", default="OR", choices=["OR", "AND"])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=1,
                    help="repeat for latency percentiles (warm index)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = get_spark("query_job", master=args.master)

    from clucene_spark.index.segments import SegmentStore
    from clucene_spark.search.wand import wand_query

    store = SegmentStore(spark, args.index_dir)
    lat = []
    hits = []
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        hits = [
            (r["doc_id"], r["score"])
            for r in wand_query(store, args.terms, k=args.k, mode=args.mode).collect()
        ]
        lat.append(time.perf_counter() - t0)
    lat.sort()
    out = {
        "metric": "bm25_topk_latency_p50",
        "value": round(lat[len(lat) // 2], 4),
        "unit": "sec",
        "k": args.k,
        "mode": args.mode,
        "terms": args.terms,
        "hits": hits,
        "repeats": args.repeat,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
