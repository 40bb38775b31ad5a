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
            cos = np.round(
                (m @ q) / (np.linalg.norm(m, axis=1) * qn), round_to
            )
            ids = pdf[id_col].to_numpy().astype(np.int64)
            # batch-local selection under the GLOBAL contract's key
            # (rounded cosine DESC, id ASC): truncating on raw scores
            # could drop a lower-id row that ties after rounding,
            # diverging from cosine_topk on ties
            top = np.lexsort((ids, -cos))[:k]
            yield pd.DataFrame({id_col: ids[top], "cosine": cos[top]})

    parts = vecs.select(id_col, vec_col).mapInPandas(_batch, schema)
    return parts.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# IVF-PQ: product quantization (Jegou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"; the FAISS IVFPQ layout). The 100-TB ANN path:
# vectors compress to M uint8 codes (64 float32 = 256 B -> 8 B at M=8), the
# ADC scan reads ONLY the codes column (parquet column pruning), and the
# exact-cosine rerank touches original embeddings for the shortlist alone.
# Combined with the IVF coarse partitioning above, a query reads
# n_probe/n_clusters of an 8-byte-per-vector column — four orders of
# magnitude less IO than a brute-force float scan.
# ---------------------------------------------------------------------------


def pq_train(
    vecs: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    n_iter: int = 8,
    seed: int = 42,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: split the dimension into `n_sub`
    contiguous subspaces and run the shared deterministic Lloyd's core
    (``kmeans_fit``, seed+m per subspace) on a bounded driver-side sample —
    the same bounded-trainer practice as ``kmeans_train`` (FAISS trains PQ
    codebooks on ~10^5 vectors for 10^9-vector indexes). Returns
    codebooks[m][k] = centroid (len dim/n_sub); deterministic given (input
    order, seed), so a DuckDB oracle can replay it and freeze constants."""
    rows = vecs.orderBy(id_col).limit(sample).select(vec_col).collect()
    return pq_fit([list(r[0]) for r in rows], n_sub, n_codes, n_iter, seed)


def pq_fit(
    X, n_sub: int = 8, n_codes: int = 16, n_iter: int = 8, seed: int = 42
) -> list[list[list[float]]]:
    """Pure-numpy PQ trainer core (shared with the DuckDB oracle replay,
    the ``kmeans_fit`` pattern): codebooks[m] = Lloyd's over subspace m with
    seed+m. Deterministic given (X row order, seed)."""
    X = np.asarray(X, dtype=np.float64)
    dim = X.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    dsub = dim // n_sub
    return [
        [c.tolist() for c in kmeans_fit(X[:, m * dsub:(m + 1) * dsub],
                                        n_codes, n_iter, seed + m)]
        for m in range(n_sub)
    ]


def pq_encode(
    vecs: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = True,
) -> DataFrame:
    """Distributed PQ encoder: per subspace, the code is the argmin-distance
    codebook entry. Arrow-batched numpy kernel (a (rows, M, K, dsub)
    distance tensor, row-chunked to a ~32 MB ceiling so production code
    sizes like K=256 stay in bounded memory — chunking never changes a
    per-row result). Distances round to 9 dp before argmin and ties take
    the LOWEST code, the same cross-engine contract as ``ivf_assign``, so
    a SQL oracle reproduces codes bit-for-bit. Output: (id, codes
    array<int>[, vec]) — at scale the codes column is what the ADC scan
    reads; parquet prunes the embedding column away."""
    import pyspark.sql.types as T

    CB = np.asarray(codebooks, dtype=np.float64)        # (M, K, dsub)
    n_sub, n_codes, dsub = CB.shape
    chunk = max(1, (1 << 22) // (n_sub * n_codes * dsub))

    fields = [
        T.StructField(id_col, T.LongType(), False),
        T.StructField("codes", T.ArrayType(T.IntegerType(), False), False),
    ]
    if keep_vec:
        fields.append(T.StructField(vec_col, T.ArrayType(T.FloatType()), True))
    schema = T.StructType(fields)

    def _batch(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            parts = []
            for lo in range(0, len(m), chunk):
                sub = m[lo:lo + chunk].reshape(-1, n_sub, 1, dsub)
                d2 = ((sub - CB[None]) ** 2).sum(axis=3)   # (rows, M, K)
                parts.append(np.round(d2, 9).argmin(axis=2))  # first-min tie
            codes = np.concatenate(parts) if parts else np.empty((0, n_sub), int)
            out = {
                id_col: pdf[id_col].to_numpy(),
                "codes": list(codes.astype(np.int32)),
            }
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    return vecs.select(id_col, vec_col).mapInPandas(_batch, schema)


def ivfpq_encode(
    vecs: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fused single-pass coarse-assign + PQ-encode kernel: ONE Arrow batch
    scan yields (id, cluster, codes, vec) — no second corpus pass, no
    corpus-sized join (the r1 minhash lesson applied here from the start).
    Both argmins share the round-9/lowest-index contract of ``ivf_assign``
    and ``pq_encode``, so the same SQL oracle replays them."""
    import pyspark.sql.types as T

    C = np.asarray(centroids, dtype=np.float64)         # (Kc, dim)
    CB = np.asarray(codebooks, dtype=np.float64)        # (M, K, dsub)
    n_sub, n_codes, dsub = CB.shape
    chunk = max(
        1,
        (1 << 22) // max(n_sub * n_codes * dsub, C.shape[0] * C.shape[1]),
    )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("cluster", T.IntegerType(), False),
            T.StructField("codes", T.ArrayType(T.IntegerType(), False), False),
            T.StructField(vec_col, T.ArrayType(T.FloatType()), True),
        ]
    )

    def _batch(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cls, cds = [], []
            for lo in range(0, len(m), chunk):
                mm = m[lo:lo + chunk]
                d2c = ((mm[:, None, :] - C[None]) ** 2).sum(axis=2)
                cls.append(np.round(d2c, 9).argmin(axis=1))
                sub = mm.reshape(-1, n_sub, 1, dsub)
                d2 = ((sub - CB[None]) ** 2).sum(axis=3)
                cds.append(np.round(d2, 9).argmin(axis=2))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": np.concatenate(cls).astype(np.int32)
                    if cls else np.empty(0, np.int32),
                    "codes": list(np.concatenate(cds).astype(np.int32))
                    if cds else [],
                    vec_col: pdf[vec_col],
                }
            )

    return vecs.select(id_col, vec_col).mapInPandas(_batch, schema)


def ivfpq_write(
    vecs: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coalesce_clusters: bool = True,
) -> None:
    """Materialize the IVF-PQ index: one fused encode pass, stored
    (id, codes, vec) PARTITIONED BY cluster. The original vector rides
    along in its own parquet column purely for the rerank stage — the ADC
    scan never reads it (parquet column pruning). `coalesce_clusters`
    shuffles once on cluster before the write so each cluster lands in one
    file instead of (tasks x clusters) shards; at true 100-TB scale flip
    it off (or pre-bucket) when clusters are larger than a task anyway."""
    coded = ivfpq_encode(vecs, centroids, codebooks, id_col, vec_col)
    if coalesce_clusters:
        coded = coded.repartition("cluster")
    coded.write.mode("overwrite").partitionBy("cluster").parquet(path)


def quantize_int8(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the standard 4x
    embedding compression (scale = max|x|/127, q_i = round(x_i/scale)).
    Pure Catalyst expression tree (aggregate fold for max-abs, transform
    for the codes — 1-arg lambdas only), so a DuckDB oracle evaluates the
    identical arithmetic: same max (exact), same division, same
    round-half-away. Output: (id, scale, q array<int>, vec). Use
    `dequantize_col` to reconstruct q_i * scale for scoring."""
    e = F.col(vec_col).cast("array<double>")
    maxabs = F.aggregate(
        e, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = F.when(maxabs == 0.0, F.lit(1.0)).otherwise(maxabs / F.lit(127.0))
    q = F.transform(e, lambda x: F.round(x / scale, 0).cast("int"))
    return vecs.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("q"),
        F.col(vec_col),
    )


def dequantize_col(q_col, scale_col):
    """Reconstructed vector: q_i * scale (array<double>)."""
    return F.transform(q_col, lambda c: c.cast("double") * scale_col)


def cosine_topk_quantized(
    qz: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Brute-force cosine top-k over the int8-quantized form (output of
    ``quantize_int8``): score = cos(q_i * scale, query) — all Catalyst,
    reading only (id, scale, q). Same ordering contract as cosine_topk."""
    qn = float(np.sqrt(np.dot(query, query)))
    qc = F.array(*[F.lit(float(x)) for x in query])
    dq = dequantize_col(F.col("q"), F.col("scale"))
    cos = _dot(dq, qc) / (_norm(dq) * F.lit(qn))
    return (
        qz.select(F.col(id_col), F.round(cos, round_to).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def quantized_pack(
    qz: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Pack the int8 codes into a BINARY column (1 byte/dim — the real 4x
    over float32; parquet array<int> alone wouldn't shrink). Arrow kernel;
    unpacked scoring (`cosine_topk_int8_packed`) is bit-equal to the
    array form (pytest-pinned)."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("scale", T.DoubleType(), False),
            T.StructField("qb", T.BinaryType(), False),
        ]
    )

    def _batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "scale": pdf["scale"].to_numpy(),
                    "qb": [
                        np.asarray(q, dtype=np.int8).tobytes()
                        for q in pdf["q"]
                    ],
                }
            )

    return qz.select(id_col, "scale", "q").mapInPandas(_batch, schema)


def cosine_topk_int8_packed(
    packed: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Cosine top-k over the packed BINARY codes: per batch, one
    (B, dim) int8 matrix from the raw bytes, float64 matvec against the
    query, per-partition candidates then a global TakeOrdered — the
    cosine_topk_pandas plan shape at a quarter of the scan bytes."""
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
            m = np.frombuffer(
                b"".join(pdf["qb"]), dtype=np.int8
            ).reshape(len(pdf), -1).astype(np.float64)
            m = m * pdf["scale"].to_numpy()[:, None]
            cos = np.round(
                (m @ q) / (np.linalg.norm(m, axis=1) * qn), round_to
            )
            ids = pdf[id_col].to_numpy().astype(np.int64)
            # select under the global (rounded DESC, id ASC) key — see
            # cosine_topk_pandas
            top = np.lexsort((ids, -cos))[:k]
            yield pd.DataFrame({id_col: ids[top], "cosine": cos[top]})

    parts = packed.select(id_col, "scale", "qb").mapInPandas(_batch, schema)
    return parts.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def adc_lut(
    codebooks: list[list[list[float]]], query: list[float]
) -> list[list[float]]:
    """Asymmetric-distance lookup table: lut[m][k] = <query_sub_m, cb[m][k]>.
    Driver-side float64 constants — both the Spark plan and the SQL oracle
    embed these exact values, so ADC scores compare bit-for-bit."""
    CB = np.asarray(codebooks, dtype=np.float64)
    n_sub, _, dsub = CB.shape
    q = np.asarray(query, dtype=np.float64).reshape(n_sub, dsub)
    return [(CB[m] @ q[m]).tolist() for m in range(n_sub)]


def adc_score_col(codes_col, lut: list[list[float]]):
    """ADC approximate inner product as a Catalyst expression: a left-
    associative sum of element_at(literal lut_m, code_m + 1) — whole-stage
    codegen over the 8-byte codes column, no UDF, no shuffle."""
    total = None
    for m, row in enumerate(lut):
        lm = F.array(*[F.lit(float(x)) for x in row])
        term = F.element_at(lm, codes_col[m] + F.lit(1))
        total = term if total is None else total + term
    return total


def adc_scores(
    coded: DataFrame, lut: list[list[float]], id_col: str = "vec_id"
) -> DataFrame:
    """ADC approximate inner product over the codes column as an Arrow
    kernel: per batch, one numpy gather per subspace and a left-associative
    m=0..M-1 sum — the SAME float64 additions, in the same order, as
    ``adc_score_col``/the SQL oracle (bit-identical scores), but one table
    lookup per (row, m) instead of a 2048-literal Catalyst expression."""
    import pyspark.sql.types as T

    L = np.asarray(lut, dtype=np.float64)               # (M, K)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("adc", T.DoubleType(), False),
        ]
    )

    def _batch(batches):
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy())   # (B, M)
            tot = L[0][codes[:, 0]]
            for m in range(1, L.shape[0]):
                tot = tot + L[m][codes[:, m]]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "adc": np.round(tot, 9)}
            )

    return coded.select(id_col, "codes").mapInPandas(_batch, schema)


def ivfpq_topk_stored(
    spark,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    store: DataFrame | None = None,
) -> DataFrame:
    """Two-stage IVF-PQ query (FAISS IVFPQ + refine):

      1. probe the n_probe nearest coarse clusters (driver-side constants
         -> partition pruning at the parquet scan);
      2. ADC scan over the CODES column only (column pruning keeps the
         embedding bytes on disk) -> `shortlist` candidates by approximate
         inner product (rounded 9 dp, ties by id — cross-engine stable);
      3. exact-cosine rerank of the shortlist, reading original vectors
         for those ids alone (bounded-id In filter pushed into the probed
         partitions) -> top-k.

    Recall is governed by (n_probe, shortlist); correctness of the
    plumbing is oracle-gated end-to-end with frozen codebook constants.
    Pass `store` (the pre-loaded parquet DataFrame) to amortize file
    listing across queries — the query-server form, same as the serving
    path's reused SegmentStore handles."""
    qa = np.asarray(query, dtype=np.float64)
    cd = [(float(((np.asarray(c) - qa) ** 2).sum()), i)
          for i, c in enumerate(centroids)]
    probe = [i for _, i in sorted(cd)[:n_probe]]
    lut = adc_lut(codebooks, query)

    base = store if store is not None else spark.read.parquet(path)
    idx = base.filter(F.col("cluster").isin(probe))
    short = (
        adc_scores(idx, lut, id_col)
        .orderBy(F.col("adc").desc(), F.col(id_col).asc())
        .limit(shortlist)
        .select(id_col)
    )
    # the shortlist is bounded (<= `shortlist` ids), so collect it and push
    # it into the rerank scan as an In filter — one job fewer than a
    # broadcast join, and the id set reaches the parquet row-group stats
    ids = [r[id_col] for r in short.collect()]
    cand = idx.filter(F.col(id_col).isin(ids)).select(id_col, vec_col)
    return cosine_topk(cand, query, k, id_col, vec_col, round_to)
