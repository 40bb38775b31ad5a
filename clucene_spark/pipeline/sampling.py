"""Deterministic corpus-mix operators: stratified sampling and
per-stratum caps — the "data recipe" stage of a training pipeline
(sample Common-Crawl-like sources down, keep curated sources whole,
cap any single domain's share).

Both are driven by a content-independent 31-bit md5 over
(stratum, doc_id, seed), so results are reproducible run-to-run and
engine-to-engine (the DuckDB oracles replay the identical arithmetic) —
never `rand()`, which would make the 100 TB job non-resumable.

Scale shape: stratified_sample is map-only (a filter on a hash
expression — no shuffle, fully pushed into the scan stage);
per_stratum_cap is one shuffle keyed by the stratum column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from clucene_spark.pipeline.dedup import md5_31

# md5_31 yields 28 effective bits (7 hex digits); uniform in [0, 2^28)
_HASH_SPACE = float(1 << 28)


def _u(by_col, seed: int):
    """Deterministic uniform [0,1) per (stratum, doc_id, seed)."""
    h = md5_31(
        F.concat_ws(":", by_col, F.col("doc_id").cast("string"),
                    F.lit(str(seed)))
    )
    return h / F.lit(_HASH_SPACE)


def stratified_sample(
    docs: DataFrame,
    fraction: float = 0.5,
    by: str = "source",
    fractions: dict | None = None,
    seed: int = 42,
) -> DataFrame:
    """Keep each doc iff its deterministic uniform draw < the fraction
    for its stratum. `fractions` overrides the default per stratum
    (e.g. {"crawl": 0.1, "wiki": 1.0}). Returns the surviving rows of
    `docs` plus the draw as `u` for audit."""
    frac = F.lit(float(fraction))
    if fractions:
        mapping = F.create_map(
            *[F.lit(x) for kv in fractions.items() for x in
              (kv[0], float(kv[1]))]
        )
        frac = F.coalesce(mapping.getItem(F.col(by)), frac)
    u = F.round(_u(F.col(by), seed), 6)
    return docs.withColumn("u", u).filter(F.col("u") < frac)


def per_stratum_cap(
    docs: DataFrame,
    cap: int = 1000,
    by: str = "source",
    seed: int = 42,
) -> DataFrame:
    """At most `cap` docs per stratum, chosen by deterministic-hash order
    (a uniform random-without-replacement sample per stratum, stable
    across runs). Ties broken by doc_id. One shuffle on the stratum key;
    at 100 TB a skewed mega-stratum is the classic salting candidate,
    but rank-based capping requires a total order per stratum, so the
    production form pre-filters with stratified_sample (map-only) down
    to ~cap-scale before the exact rank."""
    w = Window.partitionBy(by).orderBy(_u(F.col(by), seed).asc(),
                                       F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .drop("rk")
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict | None = None,
    by: str = "source",
    default_rate: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Domain-mixture resampling with fractional epochs — the "data
    recipe" reweighting step of a training pipeline (Pile/DoReMi-style
    static mixing): a stratum with rate r contributes every doc
    floor(r) times plus one more iff the doc's deterministic uniform
    draw < frac(r), so expected copies == r exactly. r < 1 downsamples
    (crawl), r > 1 upsamples with repetition (curated sources run for
    multiple epochs), and which docs get the extra fractional copy is a
    pure function of (stratum, doc_id, seed) — reproducible across runs
    and engines, resumable at 100 TB (never ``rand()``).

    Output: one row per COPY — (doc_id, stratum col, epoch, n_copies)
    with epoch = 0-based copy index, so a downstream
    ``corpus_shuffle`` spreads the repeats across the training stream
    instead of emitting them back to back.

    Scale shape: map-only — a literal-map rate lookup, one md5 per doc,
    one bounded explode (array length <= ceil(max rate)); no shuffle,
    and the rate filter pushes into the scan. Output size is
    sum(r_d * n_d) rows of a few columns; the text column is carried
    through untouched (select it upstream if not needed)."""
    rate = F.lit(float(default_rate))
    if rates:
        mapping = F.create_map(
            *[F.lit(x) for kv in rates.items() for x in (kv[0], float(kv[1]))]
        )
        rate = F.coalesce(mapping.getItem(F.col(by)), rate)
    u = F.round(_u(F.col(by), seed), 6)
    n_copies = (
        F.floor(rate) + F.when(u < rate - F.floor(rate), 1).otherwise(0)
    ).cast("long")
    base = docs.withColumn("n_copies", n_copies).filter(F.col("n_copies") > 0)
    epochs = F.sequence(
        F.lit(0).cast("long"), F.col("n_copies") - F.lit(1).cast("long")
    )
    return base.withColumn("epoch", F.explode(epochs))


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    order_col: str = "doc_id",
    count_col: str | None = None,
    n_ranges: int = 64,
) -> DataFrame:
    """Concat-and-split sequence packing: lay every doc's tokens head to
    tail in `order_col` order and cut the stream into fixed `seq_len`
    training sequences. Per doc: (doc_id, n_tokens, start_tok, pack_id,
    pack_offset, n_packs) — pack_id/pack_offset locate the doc's first
    token in the packed stream; n_packs counts the sequences it spans.
    The standard pretraining batch-assembly step (every doc's placement
    is a pure function of the corpus prefix sums, so the 100 TB job is
    deterministic and resumable).

    The global running sum is NOT a single-partition window (that
    serializes the corpus through one task — the classic cumsum scale
    killer). Two-pass distributed form:
      1. range-partition by `order_col` (n_ranges ascending ranges);
         per-partition token totals -> driver (n_ranges rows, bounded);
      2. prefix-offset per partition joined back (broadcast), plus a
         WITHIN-partition running sum — windows only ever see one
         range's rows.
    Plan note: the totals pass and the placement pass are separate JOBS
    (the prefix offsets must reach the driver between them), so the
    narrow (doc_id, ord, count) frame is persisted — the text is scanned
    and tokenized exactly once; the second job reads the ~24 B/row
    cached relation. Catalyst can't prove range-partitioning by
    `order_col` already co-locates `_pid`, so the window re-exchanges —
    but only those narrow cached rows, never the corpus. The caller may
    `.unpersist()` the returned frame's source when done; at 100 TB the
    cached frame is n_docs × 24 B (disk-spillable MEMORY_AND_DISK).
    """
    if count_col is None:
        d = docs.select(
            "doc_id",
            F.col(order_col).alias("_ord"),
            F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
            .cast("long")
            .alias("n_tokens"),
        )
    else:
        d = docs.select(
            "doc_id", F.col(order_col).alias("_ord"),
            F.col(count_col).cast("long").alias("n_tokens"),
        )
    from pyspark import StorageLevel

    d = (
        d.repartitionByRange(n_ranges, "_ord")
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = {
        r["_pid"]: r["tot"]
        for r in d.groupBy("_pid").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.coalesce(
        off_map.getItem(F.col("_pid")), F.lit(0)
    )
    sl = F.lit(int(seq_len))
    out = d.withColumn("start_tok", start).select(
        "doc_id",
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / sl).alias("pack_id"),
        (F.col("start_tok") % sl).alias("pack_offset"),
        F.when(
            F.col("n_tokens") > 0,
            F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / sl)
            - F.floor(F.col("start_tok") / sl)
            + 1,
        )
        .otherwise(F.lit(0))
        .alias("n_packs"),
    )
    return out
