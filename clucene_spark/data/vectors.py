"""Deterministic synthetic embedding generation for scale audits.

Same design as ``webtext_df`` (spark.range -> mapInPandas, no shuffle,
each partition generates its id range independently), but the values are
a pure function of (vec_id, dimension index, seed) via a vectorized
splitmix64 mix — deterministic regardless of partitioning or Arrow batch
boundaries, so the same code generates 500 vectors for pytest or 10^9 on
a cluster and any two runs agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
    ]
)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = z + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def make_vectors(ids: np.ndarray, dim: int = 64, seed: int = 42) -> np.ndarray:
    """(len(ids), dim) float32 in [-1, 1): value = f(id, j, seed) only."""
    ids = np.asarray(ids, dtype=np.uint64)
    ctr = ids[:, None] * np.uint64(dim) + np.arange(dim, dtype=np.uint64)[None, :]
    h = _splitmix64(ctr ^ _splitmix64(np.full_like(ctr, seed, dtype=np.uint64)))
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return (2.0 * u - 1.0).astype(np.float32)


def vectors_df(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    n_part = partitions or max(
        spark.sparkContext.defaultParallelism, n_vecs // 50_000 + 1
    )
    rng_df = spark.range(0, n_vecs, numPartitions=n_part)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            m = make_vectors(ids, dim, seed)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(m)})

    return rng_df.mapInPandas(gen, schema=VECTOR_SCHEMA)
