"""Per-operator profiling harness for the optimization round (r6).

bench.py is FROZEN for measurement; this file holds the guide-§1 style
isolation benches: each section times one operator's sub-stages with the
noop sink (so we time computation, not collect/sink), labels jobs, and can
dump .explain("formatted") to plans/r06/.

Usage: python bench_extra.py <section> [reps]
Sections: minhash, dsir, linededup, queries, wand, build, plans, urldedup
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clucene_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, reps=1):
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        spark.sparkContext.setJobDescription(None)
    print(f"  {label:45s} {best:8.3f}s", flush=True)
    return best


def main():
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    arg2 = sys.argv[2] if len(sys.argv) > 2 else "1"
    reps = int(arg2) if arg2.isdigit() else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    spark = get_spark("bench_extra")
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(f"== section={section} sf={sf_dir} reps={reps}", flush=True)

    # warm python workers like bench.py does
    def _warm(batches):
        import numpy, pandas, pyarrow, pyarrow.dataset, pyarrow.parquet  # noqa
        from clucene_spark.analysis.standard import standard_analyze_terms
        standard_analyze_terms("warm up text")
        for pdf in batches:
            yield pdf

    spark.range(spark.sparkContext.defaultParallelism * 4).mapInPandas(
        _warm, "id long").count()

    if section in ("minhash", "all"):
        from clucene_spark.pipeline.dedup import (
            minhash_doc_state, minhash_lsh_pairs, with_planted_dups)
        corpus = with_planted_dups(docs.select("doc_id", "text"))
        print("-- minhash_lsh (bands=32, bench config)", flush=True)
        for r in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            minhash_lsh_pairs(corpus, bands=32).count()
            print(f"  e2e rep{r}: {time.perf_counter()-t0:.3f}s", flush=True)
        # stage isolation (fresh cache)
        spark.catalog.clearCache()
        state = minhash_doc_state(corpus, 3, 32).filter(F.size("S") >= 64)
        timed(spark, "minhash: doc_state (noop, uncached)", lambda: noop(state))
        state = state.persist()
        timed(spark, "minhash: doc_state persist+count", state.count)
        from pyspark.sql import Window
        bands, rpb = 32, 1
        band_cols = [
            F.md5(F.concat_ws(":", F.lit(str(bi)),
                              *[F.col(f"m{bi}").cast("string")]))
            for bi in range(bands)
        ]
        banded = state.select(
            "doc_id", F.explode(F.array(*band_cols)).alias("band_key"))
        bandedw = (
            banded.withColumn("bsz", F.count("*").over(
                Window.partitionBy("band_key")))
            .filter(F.col("bsz") <= 1000).select("doc_id", "band_key"))
        timed(spark, "minhash: banded+windowcap (noop)", lambda: noop(bandedw))
        cands = (
            bandedw.alias("x").join(bandedw.alias("y"), "band_key")
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
            .distinct())
        timed(spark, "minhash: candidates distinct (noop)", lambda: noop(cands))
        sizes = state.select("doc_id", F.size("S").alias("n_sh"))
        pre = (
            cands.join(sizes.select(F.col("doc_id").alias("a"),
                                    F.col("n_sh").alias("na")), "a")
            .join(sizes.select(F.col("doc_id").alias("b"),
                               F.col("n_sh").alias("nb")), "b")
            .filter(F.least("na", "nb") >= F.greatest("na", "nb") * F.lit(0.5))
            .select("a", "b", "na", "nb"))
        t0 = time.perf_counter()
        pre = pre.localCheckpoint(eager=True)
        print(f"  minhash: prefilter+localCheckpoint {time.perf_counter()-t0:8.3f}s",
              flush=True)
        sets = state.select("doc_id", "S")
        jj = (
            pre.join(sets.select(F.col("doc_id").alias("a"),
                                 F.col("S").alias("sa")), "a")
            .join(sets.select(F.col("doc_id").alias("b"),
                              F.col("S").alias("sb")), "b")
            .select("a", "b",
                    F.size(F.array_intersect("sa", "sb")).alias("n_inter"),
                    "na", "nb")
            .withColumn("jaccard", F.col("n_inter") /
                        (F.col("na") + F.col("nb") - F.col("n_inter")))
            .filter(F.col("jaccard") >= 0.5))
        timed(spark, "minhash: verify join (noop)", lambda: noop(jj))
        state.unpersist()

    if section in ("dsir", "all"):
        from clucene_spark.pipeline.dsir import dsir_resample, dsir_unpersist
        from clucene_spark.pipeline.dsir import _gram_buckets
        from clucene_spark.pipeline.dedup import ensure_parallelism
        print("-- dsir_select", flush=True)
        tgt = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
        for r in range(reps):
            dsir_unpersist()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            dsir_resample(docs.select("doc_id", "text"), tgt,
                          k=100, n_buckets=4096).collect()
            print(f"  e2e rep{r}: {time.perf_counter()-t0:.3f}s", flush=True)
        dsir_unpersist()
        spark.catalog.clearCache()
        d2 = ensure_parallelism(docs.select("doc_id", "text"))
        gb = _gram_buckets(d2, 4096, "text").groupBy("doc_id", "bucket").agg(
            F.count("*").alias("c"))
        timed(spark, "dsir: docb grambuckets+agg (noop)", lambda: noop(gb))
        tb = _gram_buckets(tgt, 4096, "text").groupBy("bucket").agg(
            F.count("*").alias("ct"))
        timed(spark, "dsir: target buckets (noop)", lambda: noop(tb))

    if section in ("linededup", "all"):
        from clucene_spark.pipeline.dedup import line_dedup
        import tempfile, shutil
        from clucene_spark.data.webtext import webtext_df
        bench_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
        corpus = webtext_df(spark, bench_docs)
        toks = F.split(F.col("text"), " ")
        n_l = F.ceil(F.size(toks) / 8).cast("int")
        lined_dir = tempfile.mkdtemp(prefix="bx_lined_", dir="/dev/shm")
        corpus.select(
            "doc_id",
            F.array_join(
                F.transform(F.sequence(F.lit(0), n_l - 1),
                            lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " ")),
                "\n").alias("text"),
        ).write.mode("overwrite").parquet(lined_dir)
        lined = spark.read.parquet(lined_dir)
        print("-- line_dedup", flush=True)
        for r in range(reps):
            t0 = time.perf_counter()
            line_dedup(lined).agg(F.sum("n_kept")).collect()
            print(f"  e2e rep{r}: {time.perf_counter()-t0:.3f}s", flush=True)
        # stages
        lines = F.filter(F.split(F.col("text"), "\n"), lambda x: x != "")
        from clucene_spark.pipeline.dedup import ensure_parallelism, md5_60
        base = ensure_parallelism(lined).select("doc_id", "text").filter(
            F.size(lines) > 0)
        per_dh = base.select(
            "doc_id",
            F.explode(F.transform(lines, lambda x: md5_60(x))).alias("h"),
        ).distinct()
        timed(spark, "linededup: per_dh distinct (noop)", lambda: noop(per_dh))
        per_h = per_dh.groupBy("h").agg(
            F.count("*").alias("nd"), F.min("doc_id").alias("owner"))
        keep_sets = (
            per_dh.join(per_h.hint("merge"), "h")
            .filter((F.col("nd") <= 1) | (F.col("doc_id") == F.col("owner")))
            .groupBy("doc_id").agg(F.collect_set("h").alias("keep_hs")))
        timed(spark, "linededup: keep_sets (noop)", lambda: noop(keep_sets))
        shutil.rmtree(lined_dir, ignore_errors=True)

    if section in ("queries", "all"):
        from clucene_spark.index.build import InvertedIndex
        from clucene_spark.search.engine import (
            MUST, SHOULD, BooleanQuery, FuzzyQuery, PhraseQuery, PrefixQuery,
            Searcher, TermQuery)
        index = InvertedIndex(docs).cache()
        index.postings.count(); index.doc_lens.count(); index.term_dict.count()
        searcher = Searcher(index)
        qs = {
            "q_term": TermQuery(term="spark"),
            "q_and": BooleanQuery().add(TermQuery(term="spark"), MUST)
                     .add(TermQuery(term="join"), MUST),
            "q_or": BooleanQuery().add(TermQuery(term="spark"), SHOULD)
                    .add(TermQuery(term="vector"), SHOULD)
                    .add(TermQuery(term="window"), SHOULD),
            "q_phrase": PhraseQuery(terms=["batch", "batch"]),
            "q_prefix": PrefixQuery(prefix="s"),
            "q_fuzzy": FuzzyQuery(term="spark", min_similarity=0.7),
        }
        print("-- relational queries (best-of-5 warm)", flush=True)
        for name, q in qs.items():
            timed(spark, name, lambda q=q: searcher.topk(q, 10).collect(),
                  reps=max(reps, 5))

    if section in ("plans",):
        # dump explain(formatted) for bench-relevant operators
        os.makedirs("plans/r06", exist_ok=True)
        tag = sys.argv[2] if len(sys.argv) > 2 else "before"
        from clucene_spark.pipeline.dedup import (
            minhash_lsh_pairs, with_planted_dups, line_dedup)
        from clucene_spark.pipeline.dsir import dsir_resample, dsir_unpersist
        from clucene_spark.index.build import InvertedIndex
        from clucene_spark.search.engine import (
            MUST, SHOULD, BooleanQuery, Searcher, TermQuery, PrefixQuery,
            FuzzyQuery, PhraseQuery)

        def dump(name, df):
            p = f"plans/r06/{name}_{tag}.txt"
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
            print(f"  wrote {p}", flush=True)

        corpus = with_planted_dups(docs.select("doc_id", "text"))
        dump("dedup_minhash_lsh", minhash_lsh_pairs(corpus, bands=32))
        dsir_unpersist()
        dump("dsir_select", dsir_resample(
            docs.select("doc_id", "text"),
            docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text"),
            k=100, n_buckets=4096))
        dsir_unpersist()
        index = InvertedIndex(docs).cache()
        searcher = Searcher(index)
        dump("q_term", searcher.topk(TermQuery(term="spark"), 10))
        dump("q_and", searcher.topk(
            BooleanQuery().add(TermQuery(term="spark"), MUST)
            .add(TermQuery(term="join"), MUST), 10))
        dump("q_or", searcher.topk(
            BooleanQuery().add(TermQuery(term="spark"), SHOULD)
            .add(TermQuery(term="vector"), SHOULD)
            .add(TermQuery(term="window"), SHOULD), 10))
        dump("q_prefix", searcher.topk(PrefixQuery(prefix="s"), 10))
        dump("q_fuzzy", searcher.topk(FuzzyQuery(term="spark",
                                                 min_similarity=0.7), 10))
        dump("q_phrase", searcher.topk(PhraseQuery(terms=["batch", "batch"]), 10))

    print("done", flush=True)


if __name__ == "__main__":
    main()
