"""DSIR-style data selection: importance resampling of a raw corpus
toward a target distribution (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling") over hashed n-gram
features — the principled form of the "make the crawl look like
wikipedia" curation step, sitting between the quality heuristics
(textstats.quality_score) and the mixture recipe (sampling.
mixture_sample).

Method: featurize every doc as a bag of hashed unigrams+bigrams
(`n_buckets` buckets); fit two Laplace-smoothed bag-of-words models —
p from the TARGET corpus, q from the RAW corpus — and weight each raw
doc by its log importance ratio  log w(x) = Σ_grams log(p_b / q_b).
Resampling then draws docs with probability ∝ exp(log w / T) via the
deterministic Gumbel-top-k trick, so the selected set is a pure
function of (corpus, target, seed) — reproducible across runs and
engines, resumable at 100 TB (never ``rand()``).

Determinism across engines (the DuckDB oracle replays every step):
  * bucket hash = md5-hex-prefix (dedup.md5_31) mod n_buckets — no
    engine-specific hash;
  * per-bucket log-ratios are rounded to 1e-6 and scaled to INTEGER
    micro-nats, so the per-doc weight is an exact int64 sum —
    associative, immune to float summation order (the problem
    textstats.lm_score solves with an ordered fold is avoided
    entirely here);
  * the Gumbel noise is -ln(-ln(u)) with u a (doc_id, seed) hash
    uniform — replayable arithmetic, not a RNG stream.

Scale shape: one tokenize+explode scan of the raw corpus feeding ONE
(doc_id, bucket) partial-count aggregation (the per-bucket corpus
counts derive from it by a second, bounded re-aggregation — with the
default cache=True the corpus is never scanned twice); the target side
is a separate scan of the
(by definition small, curated) target set; the per-bucket log-ratio
table is ≤ n_buckets rows and joins back BROADCAST; the final per-doc
sum is one doc-keyed shuffle with map-side partials. The bounded
(≤ n_buckets-row) aggregates are the only driver collects.
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

from clucene_spark.pipeline.dedup import ensure_parallelism, md5_31
from clucene_spark.pipeline.sampling import _HASH_SPACE
from clucene_spark.pipeline.textstats import _tokens

# LRU-1 registry of the persisted (doc_id, bucket, c) relation: repeated
# dsir_weights/dsir_resample calls in one session must not accumulate cached
# RDDs (ADVICE r4), so registering a new cache releases the previous one.
# Callers that interleave two live dsir pipelines should either consume the
# first before starting the second or pass cache=False (the evicted plan
# recomputes — correctness is unaffected, only the reuse is lost).
_docb_cache: list[DataFrame] = []
_docb_lock = threading.Lock()


def _register_docb(docb: DataFrame) -> None:
    with _docb_lock:  # check-then-pop must be atomic across threads
        while _docb_cache:
            prev = _docb_cache.pop()
            try:
                # Spark's CacheManager keys on the LOGICAL PLAN: a repeat
                # call over the same input produces the same plan and
                # shares the cache entry, so unpersisting the old handle
                # would wipe the new one too — keep shared-plan entries
                # alive.
                if not prev.sameSemantics(docb):
                    prev.unpersist()
            except Exception:
                # comparison failed (e.g. stale session handle): the entry
                # is leaving the registry either way, so it must be
                # unpersisted — dropping it silently is exactly the cache
                # accumulation this registry exists to prevent
                try:
                    prev.unpersist()
                except Exception:
                    pass
        _docb_cache.append(docb)


def dsir_unpersist() -> None:
    """Release the cached (doc_id, bucket, c) relation of the most recent
    dsir_weights call. Safe to call any time; idempotent."""
    with _docb_lock:
        while _docb_cache:
            try:
                _docb_cache.pop().unpersist()
            except Exception:
                pass


def _gram_buckets(docs: DataFrame, n_buckets: int, text_col: str) -> DataFrame:
    """(doc_id, bucket) — one row per gram OCCURRENCE."""
    d = docs.select("doc_id", F.col(text_col).alias("_text"))
    d = d.withColumn("t", _tokens(F.col("_text"))).filter(F.size("t") >= 1)
    grams = d.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("t"),
                F.expr(
                    "transform(slice(t, 1, size(t) - 1),"
                    " (w, i) -> concat(w, ' ', t[i + 1]))"
                ),
            )
        ).alias("gram"),
    )
    return grams.select(
        "doc_id", (md5_31(F.col("gram")) % F.lit(n_buckets)).alias("bucket")
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    cache: bool = True,
) -> DataFrame:
    """Per-doc importance log-weight of `docs` (raw) toward `target`.

    Returns (doc_id, n_grams, logw) where
      logw = Σ_b count_b(doc) · round(ln p_b − ln q_b, 6)
      p_b = (ct_b + 1) / (T_t + B),  q_b = (cr_b + 1) / (T_r + B)
    summed exactly in integer micro-nats (see module docstring), then
    divided back to a float once. Docs with no tokens carry no evidence
    and are omitted.

    With ``cache=True`` (default) the returned frame's lineage holds a
    persisted narrow (doc_id, bucket, c) relation (the corpus is
    tokenized once, not once per aggregation) — at 100 TB it is
    n_docs × ~20 B, disk-spillable. Its lifecycle is session-managed:
    an LRU-1 registry unpersists the previous dsir cache whenever a new
    one is created, so repeated calls never accumulate cached RDDs;
    call :func:`dsir_unpersist` (or `.unpersist()` on the
    ``df._dsir_docb`` handle) to release it early. ``cache=False``
    skips persistence entirely — but note the relation then recomputes
    PER DAG BRANCH: the eager totals scan here plus the two branches of
    the returned plan (docb directly, and rawb→ratio on the broadcast
    side) cost ~3 full tokenize passes per action, so cache=False is
    for small corpora or memory-starved sessions only.
    """
    docs = ensure_parallelism(docs)
    docb = (
        _gram_buckets(docs, n_buckets, text_col)
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
    )
    if cache:
        docb = docb.persist(StorageLevel.MEMORY_AND_DISK)
        _register_docb(docb)
    rawb = docb.groupBy("bucket").agg(F.sum("c").alias("cr"))
    tgtb = (
        _gram_buckets(target, n_buckets, text_col)
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )
    # collect BOTH per-bucket tables once (bounded: <= n_buckets rows each,
    # the same driver collects the totals already implied). r5 recomputed
    # tgtb twice — once for t_tgt, once inside the broadcast-ratio branch
    # of the output plan — i.e. a second full tokenize of the target
    # corpus per action (guide §1.2: don't compute things twice). The
    # ratio table is rebuilt below as a local relation from these rows,
    # through the identical log/round expressions. r6: the two collects
    # run as ONE union action — one driver job instead of two, and the
    # corpus and target tokenize branches execute concurrently inside it
    # (guide §1.2/§5.4: fewer, fatter jobs); rows are identical, split by
    # tag locally.
    both = (
        rawb.select(F.lit("r").alias("side"), "bucket", F.col("cr").alias("n"))
        .unionByName(
            tgtb.select(F.lit("t").alias("side"), "bucket", F.col("ct").alias("n"))
        )
        .collect()
    )
    raw_rows = [{"bucket": r["bucket"], "cr": r["n"]} for r in both
                if r["side"] == "r"]
    tgt_rows = [{"bucket": r["bucket"], "ct": r["n"]} for r in both
                if r["side"] == "t"]
    t_raw = sum(r["cr"] for r in raw_rows)
    t_tgt = sum(r["ct"] for r in tgt_rows)
    if t_tgt == 0:
        # an empty target (typo'd filter, wrong path) would silently turn
        # the weights into an inverse-rarity score — the docs with the
        # RAREST grams win, the opposite of target-likeness
        raise ValueError(
            "dsir_weights: target corpus has no grams "
            f"({text_col!r} empty or all-null) — check the target filter"
        )
    b = float(n_buckets)
    spark = docs.sparkSession
    ct_by_bucket = {r["bucket"]: r["ct"] for r in tgt_rows}
    joined = spark.createDataFrame(
        [(r["bucket"], r["cr"], ct_by_bucket.get(r["bucket"]))
         for r in raw_rows],
        "bucket long, cr long, ct long",
    )
    ratio = (
        joined
        .select(
            "bucket",
            # round-to-nearest INTEGER micro-nats (never round-then-cast,
            # which truncates in Spark and would drift from the oracle)
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                        / F.lit(float(t_tgt) + b)
                    )
                    - F.log((F.col("cr") + F.lit(1.0)) / F.lit(float(t_raw) + b))
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("ri"),
        )
    )
    out = (
        docb.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("ri")).alias("wm"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.round(F.col("wm") / F.lit(1_000_000.0), 6).alias("logw"),
        )
    )
    out._dsir_docb = docb  # cache handle for caller-owned lifecycle
    return out


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    k: int = 100,
    n_buckets: int = 4096,
    temperature: float = 1.0,
    seed: int = 42,
    text_col: str = "text",
    cache: bool = True,
) -> DataFrame:
    """Select `k` docs from `docs` with probability ∝ exp(logw / T) by
    deterministic Gumbel-top-k: key = logw/T − ln(−ln(u)) with
    u = (md5_31("dsir:" doc_id ":" seed) + 0.5) / 2^28 — sampling
    without replacement under the importance distribution, reproducible
    across engines. T→0 degenerates to hard top-k by weight; large T
    approaches uniform. Returns (doc_id, n_grams, logw, key) ordered
    (key DESC, doc_id ASC), exactly k rows (or fewer if the corpus has
    fewer docs with evidence).

    Scale shape: dsir_weights (above) + a map-only key column + a
    global top-k (TakeOrderedAndProject — per-partition heaps, never a
    full sort)."""
    if temperature < 0:
        raise ValueError("dsir_resample: temperature must be >= 0")
    w = dsir_weights(
        docs, target, n_buckets=n_buckets, text_col=text_col, cache=cache
    )
    if temperature == 0:
        # the T->0 limit the docstring promises: hard top-k by weight
        # (Spark's non-ANSI divide-by-zero would otherwise NULL every
        # key and silently select the k smallest doc_ids)
        key = F.col("logw").alias("key")
    else:
        # null-PROPAGATING concat (not concat_ws, which skips nulls):
        # the DuckDB oracle's '||' nulls the key for a null doc_id, so
        # the Spark side must too or the engines select different rows
        u = (
            md5_31(
                F.concat(
                    F.lit("dsir:"), F.col("doc_id").cast("string"),
                    F.lit(":" + str(seed)),
                )
            )
            + F.lit(0.5)
        ) / F.lit(_HASH_SPACE)
        gumbel = -F.log(-F.log(u))
        key = F.round(
            F.col("logw") / F.lit(float(temperature)) + gumbel, 6
        ).alias("key")
    return (
        w.select("doc_id", "n_grams", "logw", key)
        .orderBy(F.col("key").desc_nulls_last(), F.col("doc_id").asc())
        .limit(int(k))
    )
