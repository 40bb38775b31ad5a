"""spark-submit entrypoint: build a compressed segment index.

Usage (spark-submit or plain python — session config comes from
clucene_spark.session unless spark-submit overrides master/memory):

    spark-submit --py-files clucene_spark.zip tools/index_job.py \
        --input /path/docs.parquet --index-dir /path/index \
        --analyzer standard --docs-per-segment 4096 [--merge] [--fresh]

    # or generate a deterministic webtext corpus instead of reading one:
    python tools/index_job.py --gen-docs 100000 --index-dir /tmp/idx

Prints ONE JSON line with docs/sec throughput + per-phase seconds, and the
lineage/metrics summary from the per-partition checkpoints. Re-running with
the same --index-dir resumes from checkpoints (add --fresh to wipe).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clucene_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet of documents")
    ap.add_argument("--gen-docs", type=int, default=0,
                    help="generate N deterministic webtext docs instead of --input")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--analyzer", default="standard",
                    choices=["standard", "whitespace"])
    ap.add_argument("--docs-per-segment", type=int, default=4096)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--aligned", action="store_true",
                    help="zero-shuffle bulk load: one segment per input "
                         "split (requires doc-sorted input)")
    ap.add_argument("--direct", action="store_true",
                    help="aligned bulk load with python-side parquet reads "
                         "(file paths distributed, pyarrow opens each split "
                         "in the worker; JVM does scheduling only)")
    ap.add_argument("--vectors", action="store_true",
                    help="with --direct: also write offsets-bearing term "
                         "vectors in the same single read of each file")
    ap.add_argument("--input-shard", default=None, metavar="I:K",
                    help="index only every Kth input part-file starting at "
                         "I (node i of a K-node fleet working one shared "
                         "corpus; doc ranges stay disjoint because files "
                         "are range-partitioned)")
    ap.add_argument("--merge", action="store_true",
                    help="run the log-structured merge policy after build")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the index dir first (no resume)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    if args.direct and args.gen_docs:
        ap.error("--direct reads parquet files; use --input, not --gen-docs")
    if args.direct:
        # the JVM is pure orchestration in this plan: C1-only JIT removes
        # the C2 compiler's per-node CPU burn (profiled ~11s/4-core node)
        # without touching any data-path code — the data path is python
        os.environ.setdefault("SPARK_GRAFT_JVM_OPTS",
                              "-XX:TieredStopAtLevel=1")
    if args.fresh and os.path.isdir(args.index_dir):
        shutil.rmtree(args.index_dir)

    spark = get_spark("index_job", master=args.master)

    from clucene_spark.index.merge import maybe_merge
    from clucene_spark.index.segments import build_segments_fused, read_checkpoints

    # warm the Python workers (module imports + Arrow init) before the timed
    # section — steady-state throughput excludes cold start, exactly as a
    # long-lived cluster amortizes it. The warm job imports the same modules
    # the build stage uses so no import cost lands in the measurement.
    def _warm(batches):
        import numpy, pandas, pyarrow, pyarrow.parquet  # noqa: F401
        from clucene_spark.analysis.standard import standard_analyze_terms
        from clucene_spark.index.codec import encode_postings_table  # noqa: F401

        standard_analyze_terms("warm up text tokens")
        for pdf in batches:
            yield pdf

    spark.range(spark.sparkContext.defaultParallelism * 4).mapInPandas(
        _warm, "id long"
    ).count()

    t0 = time.perf_counter()  # (re-set below after input warm)
    files: list[str] | None = None
    docs = None
    if args.gen_docs:
        from clucene_spark.data.webtext import webtext_df

        docs = webtext_df(spark, args.gen_docs)
    else:
        if args.input_shard:
            i, k = (int(x) for x in args.input_shard.split(":"))
            files = sorted(
                os.path.join(args.input, f)
                for f in os.listdir(args.input)
                if f.startswith("part-")
            )[i::k]
        elif args.direct and os.path.isdir(args.input):
            files = sorted(
                os.path.join(args.input, f)
                for f in os.listdir(args.input)
                if f.startswith("part-") and f.endswith(".parquet")
            )
        if not args.direct:
            if files is not None:
                docs = spark.read.parquet(*files).select(args.id_col, args.text_col)
            else:
                docs = spark.read.parquet(args.input).select(args.id_col, args.text_col)
        if not args.aligned and not args.direct:
            # ensure the tokenizer stage parallelizes even over few input
            # files; only (id, text) travel through this shuffle
            min_parts = spark.sparkContext.defaultParallelism * 2
            if docs.rdd.getNumPartitions() < min_parts:
                docs = docs.repartition(min_parts)

    # warm the FULL pipeline (parquet scan -> Arrow -> python build ->
    # parquet write) outside the measurement — JIT/codegen of the exact
    # code path, identical at every parallelism level. A tiny throwaway
    # build compiles what a row-count warm-up cannot.
    if not args.gen_docs:
        import tempfile as _tf

        _wdir = _tf.mkdtemp(prefix="warm_idx_")
        try:
            if args.direct:
                from clucene_spark.index.segments import build_segments_direct as _bd

                _bd(spark, files[:1] if files else args.input, _wdir,
                    analyzer=args.analyzer, text_col=args.text_col,
                    doc_id_col=args.id_col, resume=False)
            else:
                from clucene_spark.index.segments import build_segments_aligned as _ba

                _ba(docs.limit(2000), _wdir, analyzer=args.analyzer,
                    text_col=args.text_col, doc_id_col=args.id_col, resume=False)
        finally:
            shutil.rmtree(_wdir, ignore_errors=True)
    t0 = time.perf_counter()
    if args.direct:
        from clucene_spark.index.segments import build_segments_direct

        built_rows = build_segments_direct(
            spark,
            files if files is not None else args.input,
            args.index_dir,
            analyzer=args.analyzer,
            text_col=args.text_col,
            doc_id_col=args.id_col,
            with_positions=not args.no_positions,
            with_vectors=args.vectors,
            resume=not args.fresh,
        ).collect()
    elif args.aligned:
        from clucene_spark.index.segments import build_segments_aligned

        built_rows = build_segments_aligned(
            docs,
            args.index_dir,
            analyzer=args.analyzer,
            text_col=args.text_col,
            doc_id_col=args.id_col,
            with_positions=not args.no_positions,
            resume=not args.fresh,
        ).collect()
    else:
        built_rows = build_segments_fused(
            docs,
            args.index_dir,
            docs_per_segment=args.docs_per_segment,
            analyzer=args.analyzer,
            text_col=args.text_col,
            doc_id_col=args.id_col,
            with_positions=not args.no_positions,
            resume=not args.fresh,
        ).collect()
    t_build = time.perf_counter() - t0
    n_built = len(built_rows)
    n_docs = sum(r["n_docs"] for r in built_rows)  # docs indexed THIS run

    t_merge = 0.0
    merged = []
    if args.merge:
        tm = time.perf_counter()
        merged = maybe_merge(spark, args.index_dir)
        t_merge = time.perf_counter() - tm

    cks = read_checkpoints(args.index_dir)
    out = {
        "metric": "indexing_throughput",
        "value": round(n_docs / t_build, 2),
        "unit": "docs/sec",
        "n_docs": n_docs,
        "build_sec": round(t_build, 3),
        "merge_sec": round(t_merge, 3),
        "segments_built": n_built,
        "segments_merged_into": len(merged),
        "n_tokens": sum(c["n_tokens"] for c in cks),
        "n_postings": sum(c["n_postings"] for c in cks),
        "analyzer": args.analyzer,
        "master": spark.sparkContext.master,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
