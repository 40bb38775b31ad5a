"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one JVM-side pass, no Python, no
shuffle except the final TakeOrderedAndProject. Scale path: IVF-style
bucketing (assign every vector to its nearest of C coarse centroids; probe
the P closest centroids at query time) — the scan shrinks to P/C of the
corpus and buckets are independent partitions. An LSH variant buckets by
random-hyperplane sign bits for the pair-generation use case.

All plans keep the vector math in pyspark.sql.functions (zip_with /
aggregate fold to Catalyst expressions, whole-stage codegen) — a Pandas UDF
alternative is provided for wide batches where Arrow+numpy beats codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from clucene_spark.pipeline.dedup import md5_31


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    vecs: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Brute-force cosine top-k: ORDER BY cosine DESC, id ASC LIMIT k."""
    qn = float(np.sqrt(np.dot(query, query)))
    q = F.array(*[F.lit(float(x)) for x in query])
    e = F.col(vec_col).cast("array<double>")
    cos = _dot(e, q) / (_norm(e) * F.lit(qn))
    return (
        vecs.select(F.col(id_col), F.round(cos, round_to).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_assign(
    vecs: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2).

    Centroids are a small broadcast list (driver-side constant folded into
    the plan). Returns (id, cluster). At scale, write the corpus
    partitioned by `cluster` so queries scan only probed buckets."""
    e = F.col(vec_col).cast("array<double>")
    d2s = []
    for ci, c in enumerate(centroids):
        cc = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(e, cc, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        d2s.append(F.struct(F.round(d2, 9).alias("d2"), F.lit(ci).alias("c")))
    best = F.array_min(F.array(*d2s))
    return vecs.select(F.col(id_col), F.col(vec_col), best["c"].alias("cluster"))


def ivf_topk(
    vecs: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF search: probe the n_probe nearest centroids, brute-force inside.

    Deterministic given centroids; the oracle replays the same algorithm,
    so results compare exactly (IVF is approximate vs global brute force —
    the recall tradeoff is the point of the structure)."""
    qa = np.asarray(query, dtype=np.float64)
    cd = [(float(((np.asarray(c) - qa) ** 2).sum()), i) for i, c in enumerate(centroids)]
    probe = [i for _, i in sorted(cd)[:n_probe]]
    assigned = ivf_assign(vecs, centroids, id_col, vec_col)
    return cosine_topk(
        assigned.filter(F.col("cluster").isin(probe)), query, k, id_col, vec_col, round_to
    )


def hyperplanes(n_planes: int = 8, seed: int = 42, dim: int = 64) -> np.ndarray:
    """Deterministic random hyperplanes for sign-bit LSH. Exposed so the
    DuckDB oracle can embed the IDENTICAL constants and replay bucketing."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def kmeans_fit(X: np.ndarray, k: int, n_iter: int, seed: int) -> np.ndarray:
    """Pure-numpy deterministic Lloyd's iteration — the shared trainer core.

    Exposed separately from the Spark-facing ``kmeans_train`` so the DuckDB
    oracle can replay the IDENTICAL training on the same sample rows (read
    straight from parquet, no Spark) and freeze the resulting centroids as
    SQL constants. Deterministic given (X row order, seed): init = seeded
    choice without replacement, ties in argmin resolve to the lowest
    centroid id (numpy argmin semantics)."""
    X = np.asarray(X, dtype=np.float64)
    k = min(k, len(X))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def kmeans_train(
    vecs: DataFrame,
    k: int = 16,
    n_iter: int = 10,
    seed: int = 42,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over a bounded driver-side sample —
    the IVF coarse-quantizer trainer. Sampling is the standard practice at
    corpus scale (FAISS-style IVF trains centroids on ~10^5 vectors even
    for 10^9-vector indexes); the full-corpus pass is the ASSIGNMENT
    (ivf_assign / ivf_write), which stays distributed. Deterministic given
    (input order, seed): sample = first `sample` rows by id; the numpy
    core (``kmeans_fit``) is shared with the DuckDB oracle replay."""
    rows = vecs.orderBy(id_col).limit(sample).select(vec_col).collect()
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    return [c.tolist() for c in kmeans_fit(X, k, n_iter, seed)]


def ivf_write(
    vecs: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus PARTITIONED BY cluster — the IVF inverted
    file. A probe query then reads only its probed clusters' directories
    (Spark partition pruning on the `cluster` filter), so query cost is
    n_probe/n_clusters of the corpus instead of a full scan — the piece
    round 1 lacked (every query re-assigned the whole corpus)."""
    assigned = ivf_assign(vecs, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)


def ivf_topk_stored(
    spark,
    path: str,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Probe the stored IVF: nearest n_probe centroids picked driver-side,
    cluster filter prunes partitions at the parquet scan, brute-force
    cosine inside the probed buckets only."""
    qa = np.asarray(query, dtype=np.float64)
    cd = [(float(((np.asarray(c) - qa) ** 2).sum()), i) for i, c in enumerate(centroids)]
    probe = [i for _, i in sorted(cd)[:n_probe]]
    df = spark.read.parquet(path).filter(F.col("cluster").isin(probe))
    return cosine_topk(df, query, k, id_col, vec_col, round_to)


def lsh_bucketed(
    vecs: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign-bit signature).

    Planes derive deterministically from (seed, plane, dim) so executors
    regenerate them without broadcast. Vectors whose cosine is high agree
    on most sign bits, landing in the same bucket with high probability —
    the pre-grouping for embedding near-dup at scale."""
    planes = hyperplanes(n_planes, seed, dim)
    e = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        pj = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = F.when(_dot(e, pj) > 0, F.lit(1 << j).cast("long")).otherwise(0)
        bucket = bucket + bit
    return vecs.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def cosine_topk_pandas(
    vecs: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Arrow-batched numpy variant: per-partition top-k inside mapInPandas,
    then global merge — the plan shape that wins when vectors are wide
    (matrix-vector product per batch instead of per-element codegen)."""
    import pyspark.sql.types as T

    q = np.asarray(query, dtype=np.float64)
    qn = np.sqrt(q @ q)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def _batch(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cos = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            top = np.argsort(-cos, kind="stable")[: k]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[top], "cosine": np.round(cos[top], round_to)}
            )

    parts = vecs.select(id_col, vec_col).mapInPandas(_batch, schema)
    return parts.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)
