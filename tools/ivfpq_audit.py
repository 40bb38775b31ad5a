"""IVF-PQ large-corpus audit (the 10x-scale habit: run every new operator
well past gate scale before calling it done).

Builds an IVF-PQ index over N deterministic synthetic vectors
(data/vectors.py) at PRODUCTION shape — 256 coarse clusters, M=8
subspaces x K=256 codes (one uint8-range code per subspace, FAISS IVFPQ
layout) — then measures:

  * train + build wall time,
  * on-disk size of the codes column vs the raw embedding column
    (the compression that makes the ADC scan cheap at 100 TB),
  * per-query latency of the two-stage IVF-PQ search vs full brute-force
    cosine over the same stored parquet,
  * recall@10 vs brute force (uniform random vectors are PQ's worst
    case — no cluster structure — so this is a floor, not a headline).

Prints one JSON line; merge the result into BENCH/large_corpus.json.

Usage: python tools/ivfpq_audit.py --n-vecs 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clucene_spark.data.vectors import make_vectors, vectors_df  # noqa: E402
from clucene_spark.pipeline.ann import (  # noqa: E402
    cosine_topk,
    ivfpq_topk_stored,
    ivfpq_write,
    kmeans_fit,
    pq_fit,
)
from clucene_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vecs", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=256)
    ap.add_argument("--n-sub", type=int, default=8)
    ap.add_argument("--n-codes", type=int, default=256)
    ap.add_argument("--probe", type=int, default=8)
    ap.add_argument("--shortlist", type=int, default=200)
    ap.add_argument("--n-queries", type=int, default=5)
    ap.add_argument("--sample", type=int, default=4096)
    ap.add_argument("--path", default=None)
    args = ap.parse_args()

    spark = get_spark("ivfpq-audit")
    vecs = vectors_df(spark, args.n_vecs, args.dim)

    # trainers run on the driver over the deterministic prefix — identical
    # to collecting the first `sample` rows of the distributed frame
    X = make_vectors(np.arange(args.sample), args.dim).astype(np.float64)
    t0 = time.monotonic()
    cents = [c.tolist() for c in kmeans_fit(X, args.clusters, 8, 42)]
    books = pq_fit(X, args.n_sub, args.n_codes, 8, 7)
    train_sec = time.monotonic() - t0

    path = args.path or tempfile.mkdtemp(prefix="ivfpq_audit_")
    t0 = time.monotonic()
    ivfpq_write(vecs, cents, books, path)
    build_sec = time.monotonic() - t0

    # column footprint from the parquet metadata (what the ADC scan reads
    # vs what brute force reads)
    import pyarrow.parquet as pq

    codes_bytes = vec_bytes = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema.split(".")[0]
                    if name == "codes":
                        codes_bytes += col.total_compressed_size
                    elif name == "embedding":
                        vec_bytes += col.total_compressed_size

    store = spark.read.parquet(path)
    qids = [int(args.n_vecs // (i + 2) + 7 * i) for i in range(args.n_queries)]
    pq_lat, brute_lat, recalls = [], [], []
    for qid in qids:
        qv = [float(x) for x in make_vectors(np.array([qid]), args.dim)[0]]
        best_b = best_p = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            brute = [r["vec_id"] for r in cosine_topk(store, qv, k=10).collect()]
            best_b = min(best_b, time.monotonic() - t0)
            t0 = time.monotonic()
            got = [
                r["vec_id"]
                for r in ivfpq_topk_stored(
                    spark, path, cents, books, qv,
                    k=10, n_probe=args.probe, shortlist=args.shortlist,
                    store=store,
                ).collect()
            ]
            best_p = min(best_p, time.monotonic() - t0)
        brute_lat.append(best_b)
        pq_lat.append(best_p)
        recalls.append(len(set(got) & set(brute)) / 10.0)

    out = {
        "n_vecs": args.n_vecs,
        "dim": args.dim,
        "clusters": args.clusters,
        "pq": f"{args.n_sub}x{args.n_codes}",
        "n_probe": args.probe,
        "shortlist": args.shortlist,
        "train_sec": round(train_sec, 2),
        "build_sec": round(build_sec, 2),
        "codes_col_mb": round(codes_bytes / 1e6, 2),
        "embedding_col_mb": round(vec_bytes / 1e6, 2),
        "scan_compression_x": round(vec_bytes / max(codes_bytes, 1), 1),
        "query_p50_brute_sec": round(sorted(brute_lat)[len(brute_lat) // 2], 3),
        "query_p50_ivfpq_sec": round(sorted(pq_lat)[len(pq_lat) // 2], 3),
        "recall_at_10_vs_brute": round(sum(recalls) / len(recalls), 2),
    }
    print(json.dumps(out))
    if not args.path:
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
