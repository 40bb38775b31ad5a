"""Distributed connected components over near-duplicate pair graphs.

Duplicate detectors (exact, MinHash, SimHash, embedding-LSH — pipeline/
dedup.py) emit PAIRS; a production curation pass needs CLUSTERS, because
transitive duplicates (a~b, b~c, a!~c) must collapse to one survivor per
component, not one per pair. This module closes that gap with the
alternating large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014): each round is two
neighborhood-min aggregations + edge rewrites, converging in O(log^2 n)
rounds regardless of component diameter — unlike naive min-label
propagation, whose round count is the graph diameter (a 1M-link chain of
boilerplate pages would need 1M rounds; large-star/small-star needs ~40).

Scale shape per round: one groupBy per star (shuffle keyed by node id),
edge set never grows beyond the input edge multiset after dedup, and
lineage is truncated every round with localCheckpoint so the plan stays
O(1) deep (on a real cluster set a checkpoint dir and use checkpoint();
local mode keeps blocks in executor storage which is the same JVM here).

The reference engine has no graph operators — this is part of the
training-data-pipeline extension mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """(u,v) ∪ (v,u), self-loops dropped."""
    return (
        edges.select(F.col("u"), F.col("v"))
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min({u} ∪ N(u)); connect every strictly larger
    neighbor v > u to m. (Kiveris et al. §3, Algorithm 2.)"""
    sym = _symmetrize(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("mn"), F.col("u")).alias("m")
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge large→small, then for each node u: m = min of its
    (all ≤ u) neighborhood ∪ {u}; connect u and every neighbor to m.
    (Kiveris et al. §3, Algorithm 3.)"""
    directed = edges.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    nbr = directed.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return nbr.union(self_edge).filter(F.col("u") != F.col("v")).distinct()


def _edge_fingerprint(edges: DataFrame):
    """(count, xor-ish sum of row hashes) — cheap convergence check."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("h"),
    ).first()
    return row["n"], row["h"]


def connected_components(
    pairs: DataFrame, a: str = "a", b: str = "b", max_iter: int = 30
) -> DataFrame:
    """-> (node, component) for every node appearing in `pairs`, where
    component = the minimum node id reachable from node (the canonical
    representative). Alternates large-star/small-star until the edge set
    is a fixed point (then the graph is a forest of stars rooted at each
    component's min) or max_iter rounds — O(log^2 n) suffices, so 30
    rounds covers any graph this engine will meet.
    """
    edges = (
        pairs.select(F.col(a).cast("long").alias("u"), F.col(b).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _edge_fingerprint(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _edge_fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    # stars point every non-root at its component min; roots are the mins
    comp = _symmetrize(edges).groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("component")
    )
    return comp.select(F.col("u").alias("node"), "component")


def cluster_canonical(
    docs: DataFrame, pairs: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Label every doc with its duplicate-cluster id and survivor flag:
    (doc_id, component, keep) — keep=1 iff doc_id is its component's min
    (singletons are their own component and always kept). The join is left
    on doc_id: the components frame holds only docs appearing in some
    duplicate pair, so AQE broadcasts it when the dup rate is low and
    falls back to a shuffle join on heavily-duplicated web crawls."""
    comp = connected_components(pairs, a=a, b=b)
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
        .withColumn(
            "keep", (F.col("doc_id") == F.col("component")).cast("int")
        )
    )


def cluster_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    a: str = "a",
    b: str = "b",
    ascending: bool = False,
) -> DataFrame:
    """Quality-preferring cluster survivorship: like cluster_canonical,
    but the survivor of each duplicate cluster is the doc with the BEST
    `score_col` (highest by default; `ascending=True` keeps the lowest,
    e.g. perplexity), ties broken doc_id ASC — the production dedup
    policy (keep the longest / cleanest / most-fluent copy), where
    min-id keeps an arbitrary one. Singletons are their own component
    and always kept. Returns (doc_id, component, keep).

    Scale shape: connected_components (O(log^2 n) star rounds) + ONE
    per-component struct-max aggregation (map-side partial — never a
    per-component window sort) joined back on component; AQE broadcasts
    the winners frame when the dup rate is low."""
    comp = connected_components(pairs, a=a, b=b)
    sign = F.lit(-1.0) if ascending else F.lit(1.0)
    labeled = (
        docs.select("doc_id", score_col)
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("component", F.coalesce("component", F.col("doc_id")))
    )
    key = F.struct(
        (F.col(score_col).cast("double") * sign).alias("s"),
        (-F.col("doc_id")).alias("nd"),
    )
    winners = (
        labeled.groupBy("component")
        .agg(F.max(key).alias("w"))
        .select("component", (-F.col("w.nd")).alias("_win_doc"))
    )
    return labeled.join(winners, "component").select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("_win_doc")).cast("int").alias("keep"),
    )
