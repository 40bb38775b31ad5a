"""BM25 top-10 query latency p50 over a segment index (the north metric's
query half).

Builds (or reuses) an index over the deterministic webtext corpus, derives
a query mix from the actual term dictionary (head / torso / tail df bands,
1-3 terms, OR and AND), runs each query `--repeat` times warm, and reports
p50/p95 per class + overall. Appends to BENCH/query_latency.json and
rewrites the latency section marker in BENCH/BASELINE.md is left to the
reader (numbers live in the json + stdout line).

    python tools/query_bench.py [--n-docs 400000] [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from clucene_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=400_000)
    ap.add_argument("--index-dir", default=None)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--serving", default="direct", choices=["direct", "local"])
    args = ap.parse_args()

    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    spark = get_spark("query_bench")

    from pyspark.sql import functions as F

    from clucene_spark.index.segments import SegmentStore, build_segments_fused
    from clucene_spark.search.wand import wand_query_direct, wand_query_local

    idx = args.index_dir or f"/dev/shm/qbench_idx_{args.n_docs}"
    try:
        store = SegmentStore(spark, idx)
    except FileNotFoundError:
        from clucene_spark.data.webtext import webtext_df

        docs = webtext_df(spark, args.n_docs)
        build_segments_fused(docs, idx, docs_per_segment=8192)
        store = SegmentStore(spark, idx)

    # query mix from the real dictionary: head (top df), torso, tail terms
    td = store.term_dict().orderBy(F.col("df").desc()).limit(5000).collect()
    terms = [r["term"] for r in td]
    head, torso, tail = terms[:8], terms[100:108], terms[2000:2008]
    queries = (
        [("head1_or", [t]) for t in head[:3]]
        + [("torso1_or", [t]) for t in torso[:3]]
        + [("tail1_or", [t]) for t in tail[:3]]
        + [("head2_or", head[0:2]), ("head2_or", head[2:4])]
        + [("mixed3_or", [head[0], torso[0], tail[0]])]
        + [("head2_and", head[0:2]), ("torso2_and", torso[0:2])]
    )

    store.stats()  # warm the stats scan
    lats: dict[str, list[float]] = {}
    for name, q in queries:
        mode = "AND" if name.endswith("and") else "OR"
        # rep 0 is the warm-up (cold caches/JIT) and is NOT pooled — the
        # docstring promises '--repeat times warm', and a pooled cold
        # first rep dominated the p95
        for rep in range(args.repeat + 1):
            t0 = time.perf_counter()
            if args.serving == "local":
                wand_query_local(store, q, k=args.k, mode=mode)
            else:
                wand_query_direct(store, q, k=args.k, mode=mode).collect()
            if rep > 0:
                lats.setdefault(name, []).append(time.perf_counter() - t0)

    flat = sorted(x for v in lats.values() for x in v)
    p50 = flat[len(flat) // 2]
    p95 = flat[int(len(flat) * 0.95)]
    per_class = {
        name: round(statistics.median(v), 4) for name, v in sorted(lats.items())
    }
    out = {
        "metric": "bm25_top10_latency_p50",
        "value": round(p50, 4),
        "unit": "sec",
        "p95": round(p95, 4),
        "per_class_p50": per_class,
        "n_docs": args.n_docs,
        "k": args.k,
        "repeats": args.repeat,
        "serving": args.serving,
        "n_queries": len(queries),
    }
    print(json.dumps(out))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    hist_path = os.path.join(REPO, "BENCH", "query_latency.json")
    hist = []
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            hist = json.load(f)
    hist.append(out)
    with open(hist_path, "w") as f:
        json.dump(hist, f, indent=1)


if __name__ == "__main__":
    main()
