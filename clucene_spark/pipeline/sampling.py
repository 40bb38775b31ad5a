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
