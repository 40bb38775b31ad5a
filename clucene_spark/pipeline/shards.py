"""Training-shard export — the terminal op of the data pipeline.

A 100-TB curated corpus ships to the trainer as N shards with a manifest.
Assignment is a pure hash of (seed, id) — NOT round-robin — so it is
stable under any reordering or repartitioning of the input, reproducible
across engines (the DuckDB oracle recomputes it from the same md5), and
appending a batch later never reshuffles earlier docs between shards.

The write is one shuffle (repartition on shard) so each shard lands as
one parquet file; the manifest records per-shard row counts and bytes —
the contract a training reader needs to plan its own parallelism.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clucene_spark.pipeline.dedup import md5_60


def shard_col(id_col: Column, n_shards: int, seed: int = 42) -> Column:
    """shard = md5_60("{seed}:{id}") mod n — portable: DuckDB computes the
    identical value as ('0x'||substr(md5(...),1,15))::BIGINT % n (md5_60 is
    non-negative, so % and pmod agree)."""
    h = md5_60(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    return F.pmod(h, F.lit(n_shards)).cast("int")


def shard_assign(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    return docs.withColumn("shard", shard_col(F.col(id_col), n_shards, seed))


def corpus_shuffle(
    docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic global training-order shuffle: (doc, shard, rank).

    A training run wants the corpus in a reproducible pseudo-random order.
    Assign each doc a seeded hash, then rank WITHIN its shard by that hash
    (tiebreak id) — the trainer reads shards in any order and streams each
    shard sequentially, which realizes a global permutation that is stable
    under input reordering, reproducible across engines, and never needs a
    global sort: the window partitions by shard, so at 100 TB every rank
    computation is a per-shard sort of ~corpus/N rows, not one giant
    ORDER BY (a PARTITION-less row_number would collapse to a single
    partition — the classic scale killer). Re-seeding between epochs gives
    fresh orders without rewriting the data (rank is derived, not stored).
    """
    from pyspark.sql import Window

    h = md5_60(F.concat(F.lit(f"shuffle:{seed}:"),
                        F.col(id_col).cast("string")))
    assigned = shard_assign(docs, n_shards, id_col, seed).withColumn(
        "shuffle_key", h
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .drop("shuffle_key")
    )


def write_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 42,
) -> dict:
    """Write shard=K parquet directories plus _manifest.json; returns the
    manifest. Row counts come from the frame (one aggregate), byte sizes
    from the filesystem after the write."""
    assigned = shard_assign(docs, n_shards, id_col, seed)
    assigned.repartition("shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)
    counts = {
        int(r["shard"]): int(r["n"])
        for r in assigned.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    shards = []
    for k in range(n_shards):
        sdir = os.path.join(path, f"shard={k}")
        nbytes = sum(
            os.path.getsize(os.path.join(sdir, f))
            for f in os.listdir(sdir)
            if f.endswith(".parquet")
        ) if os.path.isdir(sdir) else 0
        shards.append({"shard": k, "rows": counts.get(k, 0), "bytes": nbytes})
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "total_rows": sum(s["rows"] for s in shards),
        "shards": shards,
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
