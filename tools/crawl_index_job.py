"""spark-submit entrypoint: crawl files in, queryable index out.

The production shape of the engine's front door — WARC (or WET) files
ingested by the zero-shuffle direct build (`index/warc_build.py`): one
python task per crawl file runs open -> cut records -> split HTTP ->
extract text -> normalize -> tokenize -> invert -> write segment, with
Spark owning distribution/retries and the manifest commit. Resumable:
re-running skips files whose segment checkpoint exists.

    spark-submit --py-files clucene_spark.zip tools/crawl_index_job.py \
        --warc-dir /path/crawl --index-dir /path/index [--wet] [--fresh]

    # or synthesize a deterministic crawl first (fixtures/benchmarks):
    python tools/crawl_index_job.py --gen-docs 100000 \
        --warc-dir /tmp/crawl --index-dir /tmp/idx

Prints ONE JSON line: docs/sec, per-phase seconds, segment/lineage
summary from the per-file checkpoints.
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
    ap.add_argument("--warc-dir", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--gen-docs", type=int, default=0,
                    help="write N deterministic webtext docs as .warc.gz "
                         "into --warc-dir first (refuses a non-empty dir)")
    ap.add_argument("--docs-per-file", type=int, default=10_000,
                    help="with --gen-docs: records per generated file")
    ap.add_argument("--wet", action="store_true",
                    help="read WET 'conversion' records (pre-extracted "
                         "text) instead of HTTP 'response' records")
    ap.add_argument("--analyzer", default="standard",
                    choices=["standard", "whitespace", "lang"],
                    help="'lang' routes CJK-heavy pages (script "
                         "detection) through the CJK bigram chain")
    ap.add_argument("--no-normalize", action="store_true")
    ap.add_argument("--title-field", action="store_true",
                    help="also index each page's <title> as a second "
                         "field (composite-key store; fielded queries)")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--stride", type=int, default=10_000_000,
                    help="docID stride per file (max records per file)")
    ap.add_argument("--merge", action="store_true",
                    help="run the log-structured merge policy after build")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the index dir first (no resume)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    if args.fresh and os.path.isdir(args.index_dir):
        shutil.rmtree(args.index_dir)

    spark = get_spark("crawl_index_job", master=args.master)

    from clucene_spark.data.warc import (
        list_warc_paths,
        webtext_warc_files,
        webtext_wet_files,
    )
    from clucene_spark.index.merge import maybe_merge
    from clucene_spark.index.segments import read_checkpoints
    from clucene_spark.index.warc_build import build_segments_from_warc

    t_gen = 0.0
    if args.gen_docs:
        if os.path.isdir(args.warc_dir) and list_warc_paths(args.warc_dir):
            ap.error(f"--gen-docs into non-empty {args.warc_dir}")
        tg = time.perf_counter()
        writer = webtext_wet_files if args.wet else webtext_warc_files
        writer(
            spark, args.gen_docs, args.warc_dir,
            docs_per_file=args.docs_per_file,
        ).collect()
        t_gen = time.perf_counter() - tg

    paths = list_warc_paths(args.warc_dir)

    # warm the python workers on the exact code path (imports + Arrow +
    # analyzer JIT) so steady-state throughput is what's measured —
    # identical to index_job's warm-up contract
    def _warm(batches):
        from clucene_spark.analysis.standard import standard_analyze_terms
        from clucene_spark.data.warc import parse_warc_stream  # noqa: F401
        from clucene_spark.index.codec import encode_postings_table  # noqa: F401

        standard_analyze_terms("warm up text tokens")
        for pdf in batches:
            yield pdf

    spark.range(spark.sparkContext.defaultParallelism * 4).mapInPandas(
        _warm, "id long"
    ).count()

    t0 = time.perf_counter()
    built = build_segments_from_warc(
        spark,
        paths,
        args.index_dir,
        analyzer=args.analyzer,
        stride=args.stride,
        wet=args.wet,
        normalize=not args.no_normalize,
        with_positions=not args.no_positions,
        resume=not args.fresh,
        title_field=args.title_field,
    ).collect()
    t_build = time.perf_counter() - t0
    n_docs = sum(r["n_docs"] for r in built)

    t_merge = 0.0
    merged = []
    if args.merge:
        tm = time.perf_counter()
        merged = maybe_merge(spark, args.index_dir)
        t_merge = time.perf_counter() - tm

    cks = read_checkpoints(args.index_dir)
    print(json.dumps({
        "metric": "crawl_indexing_throughput",
        "value": round(n_docs / t_build, 2) if t_build else None,
        "unit": "docs/sec",
        "n_docs": n_docs,
        "n_files": len(paths),
        "segments_built": len(built),
        "segments_total": len(cks),
        "gen_sec": round(t_gen, 3),
        "build_sec": round(t_build, 3),
        "merge_sec": round(t_merge, 3),
        "merged": len(merged) if merged else 0,
        "wet": args.wet,
        "analyzer": args.analyzer,
        "master": spark.sparkContext.master,
        "lineage": {
            "n_tokens": sum(c["n_tokens"] for c in cks),
            "n_postings": sum(c["n_postings"] for c in cks),
            "n_terms": sum(c["n_terms"] for c in cks),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
