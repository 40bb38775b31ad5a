"""Round-5 10x audits (VERDICT r4 'Next round #7'): the r4-late operator
families that never had their large-corpus turn — PageRank at 1M pages /
10M edges, robots+blocklist at 1.25M pages, ExactSubstr span dedup at
1M docs, and the crawl build on a single GB-scale multi-record WARC
(the per-file task's memory ceiling). Each subcommand prints ONE JSON
line; results are folded into BENCH/large_corpus.json by --record.

    python tools/audit_r5.py pagerank [--nodes 1000000 --edges 10000000]
    python tools/audit_r5.py robots   [--pages 1250000 --domains 20000]
    python tools/audit_r5.py spans    [--docs 1000000]
    python tools/audit_r5.py warcgb   [--docs 500000]

Every corpus is deterministic (hash-derived, no RNG state), so reruns
are comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from clucene_spark.session import get_spark  # noqa: E402


def _shm(name: str) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    return os.path.join(base, name)


def audit_pagerank(args) -> dict:
    """1M nodes / 10M edges: Zipf-ish in-degree via modular hashing.
    Scale shape under test: edges repartitioned on src ONCE + persisted;
    per-round one groupBy(dst) shuffle; dangling scalar broadcast."""
    from pyspark.sql import functions as F

    from clucene_spark.pipeline.links import pagerank

    spark = get_spark("audit_pagerank")
    n, m = args.nodes, args.edges
    e = (
        spark.range(m)
        .select(
            F.concat(F.lit("https://h"), (F.xxhash64("id") % n).cast("string"))
            .alias("src"),
            # dst skewed: quadratic residue concentrates mass on low ids
            F.concat(
                F.lit("https://h"),
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n))
                 * F.pmod(F.xxhash64("id", F.lit(1)), F.lit(997)) % n
                 ).cast("string"),
            ).alias("dst"),
        )
    )
    t0 = time.perf_counter()
    pr = pagerank(e, iters=3)
    stats = pr.agg(
        F.count("*").alias("n_nodes"),
        F.sum("rank").alias("mass"),
        F.max("rank").alias("max_rank"),
    ).collect()[0]
    sec = round(time.perf_counter() - t0, 2)
    return {
        "op": "pagerank_1m",
        "secs": sec,
        "n_edges": m,
        "n_nodes": int(stats["n_nodes"]),
        "rank_mass": round(float(stats["mass"]), 6),
        "max_rank": round(float(stats["max_rank"]), 8),
        "note": "3 power iterations; mass must be ~1.0 (dangling "
                "redistribution exact); edges persisted once, one "
                "shuffle per round",
    }


def audit_robots(args) -> dict:
    """1.25M pages vs a 20k-domain robots table + 2k-domain blocklist.
    Scale shape: rules broadcast (one row per domain), page side never
    shuffles; blocklist suffix-chain explode is bounded by label count."""
    from pyspark.sql import functions as F

    from clucene_spark.pipeline.robots import robots_filter
    from clucene_spark.pipeline.urls import blocklist_filter

    spark = get_spark("audit_robots")
    n, nd = args.pages, args.domains
    # robots.txt governs a HOST exactly (no subdomain inheritance — the
    # filter joins on the full host), so pages live directly on the
    # robots-bearing domains; the blocklist stage then exercises the
    # suffix-chain semantics instead
    pages = spark.range(n).select(
        F.concat(
            F.lit("https://dom"),
            F.pmod(F.xxhash64("id"), F.lit(nd)).cast("string"),
            F.lit(".example"),
            # robots rules are PATH-PREFIX matches: 1/5 of pages sit
            # under /private/ so the Disallow actually fires
            F.when(F.col("id") % 5 == 0, F.lit("/private/x")).otherwise(
                F.lit("/path")
            ),
            F.lit("/"), F.col("id").cast("string"),
        ).alias("url"),
        F.col("id").alias("doc_id"),
    )
    # robots: half the domains disallow /private/, a tenth disallow all
    robots = spark.range(nd).select(
        F.concat(F.lit("dom"), F.col("id").cast("string"),
                 F.lit(".example")).alias("domain"),
        F.when(F.col("id") % 10 == 0,
               F.lit("User-agent: *\nDisallow: /"))
        .when(F.col("id") % 2 == 0,
              F.lit("User-agent: *\nDisallow: /private/"))
        .otherwise(F.lit("User-agent: *\nAllow: /")).alias("robots_txt"),
    )
    blocklist = spark.range(nd // 10).select(
        F.concat(F.lit("dom"), (F.col("id") * 7 % nd).cast("string"),
                 F.lit(".example")).alias("domain")
    )
    t0 = time.perf_counter()
    allowed = robots_filter(pages, robots)
    n_allowed = allowed.count()
    t_rb = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    survivors = blocklist_filter(allowed, blocklist)
    n_surv = survivors.count()
    t_bl = round(time.perf_counter() - t0, 2)
    return {
        "op": "robots_blocklist_1m",
        "n_pages": n,
        "n_domains": nd,
        "robots_filter_secs": t_rb,
        "n_allowed": int(n_allowed),
        "blocklist_secs": t_bl,
        "n_survivors": int(n_surv),
        "note": "rules parsed once per domain then broadcast; page table "
                "never shuffles in either op (suffix explode + broadcast "
                "semi-join)",
    }


def audit_spans(args) -> dict:
    """ExactSubstr span dedup at 1M docs with planted cross-doc passages:
    every 4th doc shares a 40-token boilerplate prefix (one owner keeps
    it), plus unique tails. Audits the SMJ-pinned flag join + map-side
    rewrite at corpus scale."""
    from pyspark.sql import functions as F

    from clucene_spark.pipeline.dedup import span_dedup
    from clucene_spark.data.webtext import webtext_df

    spark = get_spark("audit_spans")
    n = args.docs
    docs = webtext_df(spark, n).select("doc_id", "text")
    boiler = " ".join(f"bp{i}" for i in range(40))
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit(boiler + " "), F.col("text")))
        .otherwise(F.col("text")),
    )
    t0 = time.perf_counter()
    out = span_dedup(docs, w=16)
    stats = out.agg(
        F.count("*").alias("n_docs"),
        F.sum("dup_tokens").alias("dup_tokens"),
        F.sum(F.when(F.col("n_spans") > 0, 1).otherwise(0)).alias(
            "docs_rewritten"
        ),
    ).collect()[0]
    sec = round(time.perf_counter() - t0, 2)
    return {
        "op": "span_dedup_1m",
        "secs": sec,
        "n_docs": int(stats["n_docs"]),
        "docs_rewritten": int(stats["docs_rewritten"]),
        "dup_tokens_cut": int(stats["dup_tokens"]),
        "expected_rewritten_about": n // 4 - 1,
        "note": "w=16 windows; planted 40-token boilerplate on every 4th "
                "doc -> ~250k docs rewritten, one owner keeps its copy; "
                "flag join SMJ-pinned, rewrite map-side",
    }


def _rss_sampler(stop, peak):
    """Sample peak RSS of pyspark worker processes (the per-file task)."""
    import glob

    while not stop.is_set():
        mx = 0
        for sf in glob.glob("/proc/[0-9]*/status"):
            try:
                txt = open(sf).read()
                if "pyspark.daemon" not in open(
                    sf.replace("status", "cmdline")
                ).read().replace("\x00", " "):
                    continue
                for line in txt.splitlines():
                    if line.startswith("VmRSS:"):
                        mx = max(mx, int(line.split()[1]))
            except OSError:
                continue
        peak[0] = max(peak[0], mx)
        time.sleep(0.5)


def audit_warcgb(args) -> dict:
    """One GB-scale multi-record WARC file through the crawl build — the
    memory ceiling of the one-file-one-task contract. The record cutter
    streams (1 MB gzip chunks), but the invert needs the whole file's
    token stream, so peak worker RSS ~ extracted text + int32 codes, NOT
    raw html. Measures both wall time and that ceiling."""
    from clucene_spark.data.warc import list_warc_paths, webtext_warc_files
    from clucene_spark.index.warc_build import build_segments_from_warc

    spark = get_spark("audit_warcgb", master="local[4]")
    warc_dir = _shm("audit_warcgb_crawl")
    idx_dir = _shm("audit_warcgb_idx")
    shutil.rmtree(idx_dir, ignore_errors=True)
    n = args.docs
    t_gen = 0.0
    if not (os.path.isdir(warc_dir) and list_warc_paths(warc_dir)):
        shutil.rmtree(warc_dir, ignore_errors=True)
        tg = time.perf_counter()
        webtext_warc_files(
            spark, n, warc_dir, docs_per_file=n  # ONE file
        ).collect()
        t_gen = round(time.perf_counter() - tg, 2)
    paths = list_warc_paths(warc_dir)
    fsize = sum(os.path.getsize(p) for p in paths)
    stop = threading.Event()
    peak = [0]
    smp = threading.Thread(target=_rss_sampler, args=(stop, peak),
                           daemon=True)
    smp.start()
    t0 = time.perf_counter()
    built = build_segments_from_warc(
        spark, paths, idx_dir, analyzer="standard", stride=10_000_000,
        resume=False,
    )
    rows = built.collect()
    sec = round(time.perf_counter() - t0, 2)
    stop.set()
    smp.join(2)
    n_docs = sum(r["n_docs"] for r in rows)
    out = {
        "op": "warc_gb_file",
        "file_gz_bytes": int(fsize),
        "n_files": len(paths),
        "n_docs": int(n_docs),
        "gen_secs": t_gen,
        "build_secs": sec,
        "docs_per_sec": round(n_docs / sec, 1) if sec else None,
        "peak_worker_rss_mb": round(peak[0] / 1024, 1),
        "note": "single multi-record .warc.gz through one python task: "
                "gzip-member streaming cut, whole-file token stream "
                "inverted once; peak RSS is the per-file ceiling that "
                "sets max safe WARC size per task",
    }
    shutil.rmtree(idx_dir, ignore_errors=True)
    return out


def audit_spannear(args) -> dict:
    """SpanNear at 1M docs through the r5 ITERATOR walk (the per-doc
    near_spans_ordered/unordered pandas UDF that replaced the cross-join
    form). Scale shape under test: per-clause span streams aggregate to
    per-doc sorted lists (memory bounded by a doc's own positions, never
    a cross join), the walk is Arrow-batched, and the top-k is
    TakeOrderedAndProject."""
    from pyspark.sql import functions as F

    from clucene_spark.data.webtext import webtext_df
    from clucene_spark.index.build import InvertedIndex
    from clucene_spark.search.spans import SpanNear, SpanSearcher, SpanTerm

    spark = get_spark("audit_spannear")
    docs = webtext_df(spark, args.docs).select("doc_id", "text")
    idx = InvertedIndex(docs, analyzer="whitespace")
    s = SpanSearcher(idx)
    out = {"op": "span_near_1m", "n_docs": args.docs}
    for name, q in (
        # 'a'/'an' are the webtext head terms (~30%/12% of tokens) — the
        # worst case for the walk: every doc matches with many spans
        ("ordered_slop3", SpanNear([SpanTerm("a"), SpanTerm("an")],
                                   slop=3, in_order=True)),
        ("unordered_slop2", SpanNear([SpanTerm("and"), SpanTerm("are")],
                                     slop=2, in_order=False)),
    ):
        t0 = time.time()
        rows = s.topk(q, 10, round_to=4).collect()
        out[name + "_sec"] = round(time.time() - t0, 2)
        out[name + "_hits"] = len(rows)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["pagerank", "robots", "spans", "warcgb", "spannear"])
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--pages", type=int, default=1_250_000)
    ap.add_argument("--domains", type=int, default=20_000)
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--record", action="store_true",
                    help="fold the result into BENCH/large_corpus.json "
                         "under r5_audits")
    args = ap.parse_args()
    fn = {"pagerank": audit_pagerank, "robots": audit_robots,
          "spans": audit_spans, "warcgb": audit_warcgb,
          "spannear": audit_spannear}[args.cmd]
    out = fn(args)
    out["round"] = 5
    print(json.dumps(out))
    if args.record:
        path = os.path.join(REPO, "BENCH", "large_corpus.json")
        d = json.load(open(path))
        d.setdefault("r5_audits", {})[out["op"]] = out
        with open(path, "w") as f:
            json.dump(d, f, indent=1)


if __name__ == "__main__":
    main()
