"""Training-data pipeline tests (dedup / ANN / textstats / multimodal).

Cross-engine value parity is enforced by the DuckDB oracle gate
(tools/check_oracle.py); these tests cover behavior the gate can't:
recall of the planted duplicates, IVF-vs-brute recall, stub determinism
across executors, and NotImplementedError surfacing for real decodes.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_finds_all_planted(docs):
    from clucene_spark.pipeline.dedup import exact_dedup, with_planted_dups

    n_planted = docs.filter(F.col("doc_id") % 10 == 0).count()
    corpus = with_planted_dups(docs, every=10, keep_frac=1.0)
    groups = exact_dedup(corpus).collect()
    assert len(groups) == n_planted
    for g in groups:
        assert g["n_copies"] == 2
        assert g["doc_ids"][1] == g["doc_ids"][0] + 1_000_000


def test_minhash_lsh_recall_vs_exact(docs):
    from clucene_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        with_planted_dups,
    )

    corpus = with_planted_dups(docs, every=10, keep_frac=0.8)
    exact = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(corpus, 3, 0.5).collect()}
    lsh = {(r["a"], r["b"]) for r in
           minhash_lsh_pairs(corpus, 3, threshold=0.5, min_shingles=1).collect()}
    assert exact, "planted twins must be detectable"
    assert lsh == exact  # 16x2 bands: ~full recall at J>=0.5, verified subset

    # default signature floor (2K shingles): output = exact restricted to
    # docs long enough for the minima to carry information — a subset,
    # never new pairs, and exactly the floor-eligible ones
    from clucene_spark.pipeline.dedup import shingles

    n_sh = {r["doc_id"]: r["c"] for r in
            shingles(corpus, 3).groupBy("doc_id").count()
            .withColumnRenamed("count", "c").collect()}
    lsh_floor = {(r["a"], r["b"]) for r in
                 minhash_lsh_pairs(corpus, 3, threshold=0.5).collect()}
    want_floor = {(a, b) for (a, b) in exact
                  if n_sh.get(a, 0) >= 64 and n_sh.get(b, 0) >= 64}
    assert lsh_floor == want_floor
    assert lsh_floor <= exact


def test_window_dedup_stats_planted_substrings(docs, spark):
    """ExactSubstr semantics: a doc carrying a copied 21-token prefix of
    another doc shares exactly 21-16+1=6 windows with it; unrelated docs
    share none (60-bit hashes); short docs (<16 tokens) emit no row."""
    from clucene_spark.pipeline.dedup import window_dedup_stats

    base = docs.select("doc_id", "text").filter(F.size(F.split("text", " ")) >= 25)
    toks = F.split(F.col("text"), " ")
    plant = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, 21), " ").alias("text"),
    )
    out = {r["doc_id"]: r for r in
           window_dedup_stats(base.unionByName(plant), w=16).collect()}

    planted_ids = [r["doc_id"] for r in plant.select("doc_id").collect()]
    assert planted_ids
    for pid in planted_ids:
        twin, src = out[pid], out[pid - 1_000_000]
        # the 21-token copy has exactly 6 sliding 16-token windows, all dup
        assert twin["n_windows"] == 6 and twin["n_dup_windows"] == 6
        assert twin["dup_frac"] == 1.0
        # the source doc's first 6 windows are the same ones (the corpus
        # itself shares sentences across docs, so >6 and even ==n_windows
        # are legitimate — the generator reuses fragments like real web
        # boilerplate)
        assert src["n_dup_windows"] >= 6
        assert 0 < src["dup_frac"] <= 1.0

    # synthetic control: disjoint-vocab docs share nothing; a doc under
    # w tokens emits no row
    ctl = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(30))),
            (2, " ".join(f"b{i}" for i in range(30))),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in window_dedup_stats(ctl, w=16).collect()}
    assert set(rows) == {1, 2}
    assert all(r["n_dup_windows"] == 0 and r["dup_frac"] == 0.0
               for r in rows.values())
    assert rows[1]["n_windows"] == 15


def test_minhash_state_lifecycle(docs, spark, tmp_path):
    """minhash_state owns the signatures materialization: same pairs as the
    internal-persist path, and the cache is provably released on exit
    (VERDICT r03 "What's wrong #3" — the leaked persist)."""
    from clucene_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        minhash_state,
        with_planted_dups,
    )

    corpus = with_planted_dups(docs, every=10, keep_frac=0.8)
    want = {(r["a"], r["b"]) for r in
            minhash_lsh_pairs(corpus, 3, threshold=0.5, min_shingles=1).collect()}
    assert want

    # persist-backed handle: identical result, cache released on exit
    jvm_cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    with minhash_state(corpus, 3, min_shingles=1) as st:
        got = {(r["a"], r["b"]) for r in
               minhash_lsh_pairs(corpus, 3, threshold=0.5, state=st).collect()}
        assert st.storageLevel.useMemory  # materialized inside the block
    assert got == want
    assert not st.storageLevel.useMemory  # unpersisted on exit
    assert (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        <= jvm_cached_before
    )

    # write-through handle (the 100-TB form): parquet leaf, no cache at all
    with minhash_state(corpus, 3, min_shingles=1,
                       path=str(tmp_path / "sigs")) as st:
        got_wt = {(r["a"], r["b"]) for r in
                  minhash_lsh_pairs(corpus, 3, threshold=0.5, state=st).collect()}
        assert not st.storageLevel.useMemory
    assert got_wt == want


def test_simhash_planted_twins_close(docs):
    from clucene_spark.pipeline.dedup import simhash_pairs, with_planted_dups

    corpus = with_planted_dups(docs, every=10, keep_frac=0.8)
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             simhash_pairs(corpus, bits=32, max_hamming=6).collect()}
    planted = [(i, i + 1_000_000) for i in range(0, 100, 10)]
    hits = [p for p in planted if p in pairs]
    assert len(hits) >= len(planted) // 2  # most twins within hamming 6


def test_ivf_recall_vs_brute(vecs):
    from clucene_spark.pipeline.ann import cosine_topk, ivf_topk

    q = [float(x) for x in vecs.filter(F.col("vec_id") == 3).first()["embedding"]]
    cents = [
        [float(x) for x in r["embedding"]]
        for r in vecs.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    brute = [r["vec_id"] for r in cosine_topk(vecs, q, k=10).collect()]
    ivf = [r["vec_id"] for r in ivf_topk(vecs, cents, q, k=10, n_probe=8).collect()]
    # probing ALL centroids == brute force (recall 1.0)
    assert ivf == brute


def test_ann_pandas_equals_sql_path(vecs):
    from clucene_spark.pipeline.ann import cosine_topk, cosine_topk_pandas

    q = [float(x) for x in vecs.filter(F.col("vec_id") == 7).first()["embedding"]]
    a = [(r["vec_id"], r["cosine"]) for r in cosine_topk(vecs, q, k=10).collect()]
    b = [(r["vec_id"], r["cosine"]) for r in cosine_topk_pandas(vecs, q, k=10).collect()]
    assert a == b


def test_multimodal_features_deterministic(docs):
    from clucene_spark.pipeline.multimodal import attach_media, extract_features

    media = attach_media(docs.limit(20))
    a = {r["media_id"]: (r["digest60"], tuple(r["features"]))
         for r in extract_features(media).collect()}
    b = {r["media_id"]: (r["digest60"], tuple(r["features"]))
         for r in extract_features(media).collect()}
    assert a == b
    for dg, feats in a.values():
        assert len(feats) == 8 and all(0.0 <= f < 1.0 for f in feats)


def test_multimodal_real_decode_raises(docs):
    from clucene_spark.pipeline.multimodal import attach_media, extract_features

    media = attach_media(docs.limit(2))
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        extract_features(media, fake=False).collect()


def test_resize_and_frame_sample_shapes(docs):
    from clucene_spark.pipeline.multimodal import (
        attach_media,
        frame_sample_stub,
        resize_stub,
    )

    media = attach_media(docs.limit(10))
    r = resize_stub(media, 224, 224)
    rows = r.collect()
    assert len(rows) == 10
    assert all(row["resized_w"] == 224 for row in rows)
    f = frame_sample_stub(media, every_n=10)
    grp = f.groupBy("media_id").count().collect()
    assert len(grp) == 10
    assert all(row["count"] >= 1 for row in grp)


def test_lang_id_flags_english(docs):
    from clucene_spark.pipeline.textstats import lang_id

    rows = lang_id(docs).collect()
    en = sum(1 for r in rows if r["pred_lang"] == "en")
    assert en > len(rows) * 0.5  # corpus is stopword-rich synthetic English


def test_fingerprint_order_sensitive(spark):
    from clucene_spark.pipeline.textstats import fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert fps[1] == fps[3]
    assert fps[1] != fps[2]


def test_simhash_banded_equals_all_pairs(docs):
    """The banded equi-join candidate plan must reproduce the all-pairs
    theta-join result EXACTLY (pigeonhole recall = 1)."""
    from clucene_spark.pipeline.dedup import simhash_signatures, simhash_pairs, with_planted_dups

    corpus = with_planted_dups(docs, every=10, keep_frac=0.8)
    banded = {(r["a"], r["b"]): r["hamming"]
              for r in simhash_pairs(corpus, bits=32, max_hamming=4).collect()}
    # all-pairs reference computed driver-side from the signatures
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(corpus, bits=32).collect()}
    ids = sorted(sigs)
    ref = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 4:
                ref[(a, b)] = h
    assert banded == ref


def test_embedding_neardup_bucketed_recall(vecs):
    """LSH-bucketed near-dup pairing with flip-1 probes vs the exact
    all-pairs reference: full recall on the planted perturbed twins here,
    and never a false positive (cosine is verified in-bucket)."""
    import numpy as np

    from clucene_spark.pipeline.dedup import embedding_neardup_pairs

    v = vecs.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    twins = v.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    corpus = v.unionByName(twins)
    got = {(r["a"], r["b"]) for r in
           embedding_neardup_pairs(corpus, threshold=0.99).collect()}
    rows = corpus.collect()
    m = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(m)
    ref = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            cos = m[a] @ m[b] / (np.linalg.norm(m[a]) * np.linalg.norm(m[b]))
            if round(cos, 4) >= 0.99:
                ref.add((a, b))
    assert ref, "planted twins must exceed the threshold"
    assert got <= ref          # no false positives (exact in-bucket verify)
    recall = len(got & ref) / len(ref)
    assert recall == 1.0       # flip-1 probing recovers every planted twin here


def test_ivf_trained_store_prunes_and_recalls(spark, vecs, tmp_path):
    """k-means-trained IVF: deterministic trainer, cluster-partitioned
    storage whose probe plan PRUNES partitions, recall vs brute force."""
    from clucene_spark.pipeline.ann import (
        cosine_topk,
        ivf_topk_stored,
        ivf_write,
        kmeans_train,
    )

    cents = kmeans_train(vecs, k=8, n_iter=8, seed=42)
    assert cents == kmeans_train(vecs, k=8, n_iter=8, seed=42)  # deterministic
    assert len(cents) == 8 and len(cents[0]) == 64
    path = str(tmp_path / "ivf_store")
    ivf_write(vecs.select("vec_id", "embedding"), cents, path)
    import os

    cluster_dirs = [d for d in os.listdir(path) if d.startswith("cluster=")]
    assert len(cluster_dirs) >= 4  # corpus actually spread across buckets

    qv = [float(x) for x in vecs.filter(F.col("vec_id") == 7).first()["embedding"]]
    got = ivf_topk_stored(spark, path, cents, qv, k=10, n_probe=4)
    # partition pruning: the probed scan reads only the probed clusters
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    probed = {(r["vec_id"], r["cosine"]) for r in got.collect()}
    brute = {(r["vec_id"], r["cosine"]) for r in cosine_topk(vecs, qv, k=10).collect()}
    # this corpus is uniform random (no cluster structure), so IVF recall
    # is bounded near n_probe/k = 0.5 by construction; assert clearly above
    # chance with the exact-verify subset property carrying correctness
    recall = len({v for v, _ in probed} & {v for v, _ in brute}) / 10
    assert recall >= 0.5
    # everything IVF returns is honestly scored (subset of brute scores)
    all_cos = {(r["vec_id"], r["cosine"]) for r in
               cosine_topk(vecs, qv, k=10_000).collect()}
    assert probed <= all_cos


def test_ivfpq_encode_matches_numpy_oracle(vecs):
    """The distributed PQ encoder (Arrow-batched argmin over codebook
    distances) must reproduce a row-at-a-time numpy replay bit-for-bit —
    the same round(d2, 9)/lowest-code contract the SQL oracle replays."""
    import numpy as np

    from clucene_spark.pipeline.ann import pq_encode, pq_train

    books = pq_train(vecs, n_sub=8, n_codes=16, n_iter=8, seed=7)
    assert books == pq_train(vecs, n_sub=8, n_codes=16, n_iter=8, seed=7)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8

    sample = vecs.orderBy("vec_id").limit(32)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(sample, books).collect()}
    CB = np.asarray(books, dtype=np.float64)            # (M, K, dsub)
    for r in sample.collect():
        v = np.asarray(list(r["embedding"]), dtype=np.float64).reshape(8, 1, 8)
        want = np.round(((v - CB) ** 2).sum(axis=2), 9).argmin(axis=1).tolist()
        assert got[r["vec_id"]] == want


def test_ivfpq_store_prunes_shortlists_reranks(spark, vecs, tmp_path):
    """IVF-PQ end to end: partition-pruned probe, ADC shortlist over the
    codes column, exact rerank. With every cluster probed and the shortlist
    = corpus the result IS brute force (plumbing recall 1.0); with a 100-of-
    500 shortlist the ADC ranking must beat chance (uniform random corpus —
    chance recall would be ~0.2)."""
    from clucene_spark.pipeline.ann import (
        cosine_topk,
        ivfpq_topk_stored,
        ivfpq_write,
        kmeans_train,
        pq_train,
    )

    cents = kmeans_train(vecs, k=8, n_iter=8, seed=42)
    books = pq_train(vecs, n_sub=8, n_codes=16, n_iter=8, seed=7)
    path = str(tmp_path / "ivfpq_store")
    ivfpq_write(vecs.select("vec_id", "embedding"), cents, books, path)

    qv = [float(x) for x in vecs.filter(F.col("vec_id") == 11).first()["embedding"]]
    n = vecs.count()
    brute = [(r["vec_id"], r["cosine"]) for r in cosine_topk(vecs, qv, k=10).collect()]

    full = ivfpq_topk_stored(spark, path, cents, books, qv, k=10,
                             n_probe=len(cents), shortlist=n)
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    assert [(r["vec_id"], r["cosine"]) for r in full.collect()] == brute

    short = ivfpq_topk_stored(spark, path, cents, books, qv, k=10,
                              n_probe=len(cents), shortlist=100)
    got = {r["vec_id"] for r in short.collect()}
    assert len(got & {v for v, _ in brute}) / 10 >= 0.5
    # rerank scores are honest exact cosines (subset of the global scoring)
    all_cos = {(r["vec_id"], r["cosine"]) for r in
               cosine_topk(vecs, qv, k=n).collect()}
    assert {(r["vec_id"], r["cosine"]) for r in short.collect()} <= all_cos


def test_quantize_int8_roundtrip(vecs):
    """Symmetric int8 quantization: codes bounded, the max element
    saturates to ±127 by construction, reconstruction error per element
    is bounded by scale/2, and the dequantized cosine is 1.0 at 4 dp on
    64-dim vectors (the 4x compression is effectively lossless for
    similarity search)."""
    import numpy as np

    from clucene_spark.pipeline.ann import quantize_int8

    rows = quantize_int8(vecs.limit(64)).collect()
    for r in rows:
        e = np.asarray(list(r["embedding"]), dtype=np.float64)
        q = np.asarray(list(r["q"]), dtype=np.int64)
        assert q.min() >= -127 and q.max() <= 127
        assert (np.abs(q) == 127).sum() >= 1          # max element saturates
        dq = q * r["scale"]
        assert np.abs(dq - e).max() <= r["scale"] / 2 + 1e-12
        cos = (e @ dq) / (np.linalg.norm(e) * np.linalg.norm(dq))
        assert round(cos, 4) == 1.0


def test_int8_packed_scoring_equals_array_form(vecs):
    """The BINARY-packed int8 store (1 byte/dim — the real 4x) must score
    identically to the array form, and the quantized ranking must agree
    with exact float cosine on this corpus (quantization is lossless at
    4 dp here)."""
    from clucene_spark.pipeline.ann import (
        cosine_topk,
        cosine_topk_int8_packed,
        cosine_topk_quantized,
        quantize_int8,
        quantized_pack,
    )

    q = [float(x) for x in vecs.filter(F.col("vec_id") == 5).first()["embedding"]]
    qz = quantize_int8(vecs)
    a = [(r["vec_id"], r["cosine"])
         for r in cosine_topk_quantized(qz, q, k=10).collect()]
    b = [(r["vec_id"], r["cosine"])
         for r in cosine_topk_int8_packed(quantized_pack(qz), q, k=10).collect()]
    assert a == b
    exact = [r["vec_id"] for r in cosine_topk(vecs, q, k=10).collect()]
    assert [v for v, _ in a] == exact


def test_write_shards_partitions_and_manifest(spark, docs, tmp_path):
    """Training-shard export: hash assignment is stable under reorder, the
    shard dirs form a disjoint cover of the corpus, and the manifest's
    per-shard rows/bytes reconcile with what is on disk."""
    from clucene_spark.pipeline.shards import shard_assign, write_shards

    n = docs.count()
    path = str(tmp_path / "shards")
    manifest = write_shards(docs, path, n_shards=8)
    assert manifest["total_rows"] == n
    assert len(manifest["shards"]) == 8
    assert all(s["bytes"] > 0 for s in manifest["shards"])

    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.select("doc_id").distinct().count() == n  # disjoint cover
    # on-disk shard == recomputed assignment (stability under reorder)
    want = {r["doc_id"]: r["shard"]
            for r in shard_assign(docs.orderBy(F.col("doc_id").desc()), 8)
            .select("doc_id", "shard").collect()}
    got = {r["doc_id"]: r["shard"]
           for r in back.select("doc_id", "shard").collect()}
    assert got == want
    # manifest counts match per-shard reality
    disk = {int(r["shard"]): r["n"] for r in
            back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert {s["shard"]: s["rows"] for s in manifest["shards"]} == {
        k: disk.get(k, 0) for k in range(8)
    }


def test_corpus_shuffle_order(spark, docs):
    """Deterministic training-order shuffle: a bijective (shard, rank)
    addressing, stable under input reordering, scrambled vs doc_id order,
    and re-seeding yields a different permutation (epoch reshuffle)."""
    from clucene_spark.pipeline.shards import corpus_shuffle

    n = docs.count()
    out = corpus_shuffle(docs, n_shards=4, seed=42)
    rows = out.select("doc_id", "shard", "rank").collect()
    assert len(rows) == n
    # (shard, rank) is a bijection: ranks are 1..len(shard) per shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["rank"])
    assert sum(len(v) for v in by_shard.values()) == n
    for k, ranks in by_shard.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), k
    # stable under input reorder
    want = {(r["doc_id"], r["shard"], r["rank"]) for r in rows}
    redo = corpus_shuffle(docs.orderBy(F.col("doc_id").desc()),
                          n_shards=4, seed=42)
    assert {(r["doc_id"], r["shard"], r["rank"])
            for r in redo.collect()} == want
    # the within-shard order is NOT doc_id order (it actually shuffles)
    seq = {k: [d for d, _ in sorted(
        ((r["doc_id"], r["rank"]) for r in rows if r["shard"] == k),
        key=lambda t: t[1])] for k in by_shard}
    assert any(seq[k] != sorted(seq[k]) for k in seq)
    # a different seed gives a different permutation
    other = corpus_shuffle(docs, n_shards=4, seed=7)
    assert {(r["doc_id"], r["rank"]) for r in other.collect()} != {
        (r["doc_id"], r["rank"]) for r in rows}


def test_clean_corpus_fates(spark, docs):
    """Curation pass: planted exact twins drop as exact_dup, truncated
    twins as near_dup (or low_quality when truncation guts them), originals
    survive unless genuinely low-quality; nothing is silently discarded."""
    from clucene_spark.pipeline.clean import clean_corpus

    d = docs.select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    trunc = F.array_join(
        F.slice(toks, 1, F.greatest(F.lit(1), F.floor(F.size(toks) * 0.8)).cast("int")),
        " ",
    )
    exact = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), trunc.alias("text")
    )
    corpus = d.unionByName(exact).unionByName(near)
    out = {r["doc_id"]: r["reason"]
           for r in clean_corpus(corpus, min_quality=0.05,
                                 min_shingles=1).collect()}
    assert len(out) == corpus.count()  # every doc labeled
    # every planted exact twin whose original passed quality is exact_dup
    for i in range(0, 100, 10):
        if out[i] != "low_quality":
            assert out[i + 1_000_000] == "exact_dup", i
    # truncated twins never survive as 'kept' duplicates of a kept original
    for i in range(0, 100, 7):
        if out[i] == "kept":
            assert out[i + 2_000_000] in ("near_dup", "low_quality"), i
    # originals are never charged as duplicates of their twins (lower id wins)
    assert all(out[i] in ("kept", "low_quality", "near_dup") for i in range(100))
    assert sum(1 for v in out.values() if v == "kept") > 0


def test_chunk_dedup_finds_planted_boilerplate(docs):
    from clucene_spark.pipeline.dedup import chunk_dedup, with_planted_dups

    corpus = with_planted_dups(docs, every=10, keep_frac=0.8)
    groups = chunk_dedup(corpus, chunk_tokens=10).collect()
    assert groups, "planted truncated twins must share 10-token chunks"
    # every group references at least two occurrences and a valid keeper
    for g in groups:
        assert g["n_copies"] >= 2
        assert g["n_docs"] >= 1
        assert g["keep_doc"] >= 0 and g["keep_idx"] >= 0
    # twins share their doc's leading chunk: at least one cross-doc group
    assert any(g["n_docs"] >= 2 for g in groups)


def test_decontaminate_flags_bench_sources(spark, docs):
    from pyspark.sql import functions as F

    from clucene_spark.pipeline.dedup import decontaminate

    toks = F.split(F.col("text"), " ")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.array_join(F.slice(toks, 1, 12), " ").alias("text")
    )
    flagged = {r["doc_id"]: r["n_hits"]
               for r in decontaminate(docs, bench, n=8).collect()}
    # every doc the bench was derived from must be flagged (it contains
    # its own leading 8-grams)
    sources = [r["doc_id"] for r in
               docs.filter(F.col("doc_id") % 50 == 0).collect()]
    for d in sources:
        assert d in flagged and flagged[d] >= 1
    # an 8-gram-free corpus stays clean
    clean_bench = bench.limit(0)
    assert decontaminate(docs, clean_bench, n=8).count() == 0


def test_decontaminate_fraction_semantics(spark, docs):
    """Overlap-ratio form: a doc that IS a benchmark item scores frac 1.0,
    a partial overlap lands strictly between 0 and 1, a disjoint doc
    scores 0.0, and every doc appears exactly once."""
    from pyspark.sql import functions as F

    from clucene_spark.pipeline.dedup import decontaminate_fraction

    corpus = spark.createDataFrame(
        [
            (0, "q w e r t y u i o p"),            # == bench doc
            (1, "q w e r t y u i zz xx cc vv"),    # shares a prefix run
            (2, "aa bb cc dd ee ff gg hh ii jj"),  # disjoint
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("q w e r t y u i o p",)], "text string")
    out = {r["doc_id"]: r for r in
           decontaminate_fraction(corpus, bench, n=8).collect()}
    assert set(out) == {0, 1, 2}
    # doc 0: 10 tokens -> 3 distinct 8-grams, all in bench
    assert out[0]["n_grams"] == 3 and out[0]["n_hits"] == 3
    assert out[0]["frac"] == 1.0
    # doc 1: 12 tokens -> 5 8-grams; only "q w e r t y u i" matches
    assert out[1]["n_grams"] == 5 and out[1]["n_hits"] == 1
    assert out[1]["frac"] == 0.2
    assert out[2]["n_hits"] == 0 and out[2]["frac"] == 0.0


def test_repetition_stats_planted(spark):
    from clucene_spark.pipeline.textstats import repetition_stats

    rows = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),       # pure 2-gram loop
            (2, "a b c d e f g h"),                       # all distinct
            (3, "x x x x x x"),                           # one repeated token
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(rows).collect()}
    # doc 1: "buy now" occurs 4x of 7 2-gram slots; every 3-gram repeats
    assert out[1]["n_tokens"] == 8
    assert out[1]["dup_token_frac"] == 0.75
    assert out[1]["top_2gram_frac"] == 1.0  # 4 * 2 / 8
    assert out[1]["dup_3gram_frac"] == 1.0
    # doc 2: nothing repeats
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_2gram_frac"] == 0.25  # every 2-gram unique, max=1
    assert out[2]["dup_3gram_frac"] == 0.0
    # doc 3: single token repeated — overlapping 'x x' covers more
    # token-slots than tokens exist (5*2/6 = 1.67), capped at 1.0 (r5)
    assert out[3]["dup_token_frac"] == round(1 - 1 / 6, 4)
    assert out[3]["top_2gram_frac"] == 1.0
    assert out[3]["dup_3gram_frac"] == 1.0


def test_stratified_sample_deterministic_and_sized(docs):
    from clucene_spark.pipeline.sampling import stratified_sample

    a = {r["doc_id"] for r in stratified_sample(docs, 0.5).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, 0.5).collect()}
    assert a == b  # hash-based, not rand(): identical across runs
    n = docs.count()
    assert 0.35 * n < len(a) < 0.65 * n
    # per-stratum override: fraction 1.0 keeps the whole stratum
    full = stratified_sample(docs, 0.0, fractions={"src3": 1.0})
    kept = full.select("source").distinct().collect()
    assert [r["source"] for r in kept] == ["src3"]
    assert full.count() == docs.filter(F.col("source") == "src3").count()
    # different seed -> different (but same-sized-ish) sample
    c = {r["doc_id"] for r in stratified_sample(docs, 0.5, seed=7).collect()}
    assert c != a


def test_mixture_sample_fractional_epochs(docs):
    """Rate r => every doc appears floor(r) or ceil(r) times, the epoch
    index runs 0..n_copies-1, the fractional copy is hash-deterministic,
    and rate 0 / rate 1 behave as drop / identity."""
    from clucene_spark.pipeline.sampling import mixture_sample

    out = mixture_sample(
        docs, rates={"src3": 2.5, "src7": 0.25, "src1": 0.0}
    ).collect()
    per_source = {r["source"]: r["n"] for r in
                  docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault((r["source"], r["doc_id"]), []).append(r)
    # rate 0.0: stratum vanishes entirely
    assert not any(src == "src1" for src, _ in by_doc)
    for (src, _), rows in by_doc.items():
        n = rows[0]["n_copies"]
        assert all(x["n_copies"] == n for x in rows) and len(rows) == n
        assert sorted(x["epoch"] for x in rows) == list(range(n))
        if src == "src3":
            assert n in (2, 3)
        elif src == "src7":
            assert n == 1
        else:
            assert n == 1  # default rate 1.0: exactly one copy
    # default-rate strata pass through whole
    kept_default = [k for k in by_doc if k[0] not in ("src1", "src3", "src7")]
    n_default = sum(v for s, v in per_source.items()
                    if s not in ("src1", "src3", "src7"))
    assert len(kept_default) == n_default
    # expected sizes: src3 ~2.5x, src7 ~0.25x (loose band, hash-uniform)
    n3 = sum(len(v) for (s, _), v in by_doc.items() if s == "src3")
    n7 = len([1 for (s, _) in by_doc if s == "src7"])
    assert 2.0 * per_source["src3"] <= n3 <= 3.0 * per_source["src3"]
    assert 0.05 * per_source["src7"] <= n7 <= 0.50 * per_source["src7"]
    # deterministic across runs
    again = mixture_sample(
        docs, rates={"src3": 2.5, "src7": 0.25, "src1": 0.0}
    ).collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in out) == sorted(
        (r["doc_id"], r["epoch"]) for r in again
    )


def test_per_stratum_cap(docs):
    from clucene_spark.pipeline.sampling import per_stratum_cap

    capped = per_stratum_cap(docs, cap=3)
    sizes = {r["source"]: r["n"] for r in
             capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    per_source = {r["source"]: r["n"] for r in
                  docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in sizes.items():
        assert n == min(3, per_source[src])
    # deterministic selection
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in per_stratum_cap(docs, cap=3).collect())
    assert a == b


# --- connected components / cluster-canonical dedup -------------------------

def _uf_components(edges, nodes=()):
    """Union-find oracle: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    for n in nodes:
        find(n)
    return {n: find(n) for n in parent}


def test_connected_components_chain_transitive(spark):
    """A chain a-b-c-d must collapse to ONE component (the case pairwise-
    greedy survivor picking gets right only by accident, and naive
    min-propagation needs diameter rounds for)."""
    from clucene_spark.pipeline.graph import connected_components

    chain = [(i, i + 1) for i in range(10, 20)]  # 11-node path
    iso = [(100, 101)]
    e = spark.createDataFrame(chain + iso, "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got == _uf_components(chain + iso)
    assert {got[i] for i in range(10, 21)} == {10}
    assert got[100] == got[101] == 100


def test_connected_components_random_graphs(spark):
    """Seeded random edge sets vs the union-find oracle — exercises multi-
    component graphs, high-degree hubs, and reversed/duplicate edges."""
    import random

    from clucene_spark.pipeline.graph import connected_components

    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(5, 60)
        m = rng.randint(1, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            edges = [(0, 1)]
        e = spark.createDataFrame(edges, "a long, b long")
        got = {r["node"]: r["component"] for r in connected_components(e).collect()}
        assert got == _uf_components(edges), (trial, sorted(edges))


def test_cluster_canonical_survivors(spark, docs):
    """cluster_canonical keeps exactly one doc per duplicate component and
    labels everything; planted twins (doc_id+1_000_000) must never both
    survive."""
    from clucene_spark.pipeline.dedup import minhash_lsh_pairs, with_planted_dups
    from clucene_spark.pipeline.graph import cluster_canonical

    corpus = with_planted_dups(docs, every=10, keep_frac=0.8)
    pairs = minhash_lsh_pairs(corpus, n=3, threshold=0.5)
    lab = cluster_canonical(corpus, pairs)
    rows = lab.collect()
    assert len(rows) == corpus.count()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        keeps = [r for r in members if r["keep"] == 1]
        assert len(keeps) == 1, comp
        assert keeps[0]["doc_id"] == comp == min(r["doc_id"] for r in members)
    # every pair endpoint shares a component with its partner
    for p in pairs.collect():
        assert next(r["component"] for r in rows if r["doc_id"] == p["a"]) == next(
            r["component"] for r in rows if r["doc_id"] == p["b"]
        )


def test_cluster_best_picks_highest_score(spark):
    """cluster_best keeps the max-score member (tie -> min doc_id), not
    the min id; ascending=True flips to lowest score; singletons kept."""
    from clucene_spark.pipeline.graph import cluster_best

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0), (9, 7.0)],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    out = {r["doc_id"]: r for r in
           cluster_best(docs, pairs, score_col="q").collect()}
    assert len(out) == 5
    # component {1,2,3}: max q = 9.0 shared by 2 and 3 -> min doc_id 2
    assert [out[i]["component"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [out[i]["keep"] for i in (1, 2, 3)] == [0, 1, 0]
    # singletons always survive
    assert out[4]["keep"] == 1 and out[9]["keep"] == 1
    # ascending: lowest score wins the cluster
    low = {r["doc_id"]: r["keep"] for r in cluster_best(
        docs, pairs, score_col="q", ascending=True).collect()}
    assert (low[1], low[2], low[3]) == (1, 0, 0)
    assert low[4] == 1 and low[9] == 1


def test_clean_corpus_cluster_policy(spark, docs):
    """near_policy='cluster' drops everything but the component min; its
    drop set contains the pairwise policy's (a component min never has a
    lower-id partner), and each near-dup component keeps exactly one."""
    from clucene_spark.pipeline.clean import clean_corpus
    from clucene_spark.pipeline.dedup import with_planted_dups

    corpus = with_planted_dups(docs, every=10, keep_frac=0.8)
    pw = {r["doc_id"]: r["reason"]
          for r in clean_corpus(corpus, min_quality=0.0, min_shingles=1).collect()}
    cl = {r["doc_id"]: r["reason"]
          for r in clean_corpus(corpus, min_quality=0.0, near_policy="cluster",
                                min_shingles=1).collect()}
    assert set(pw) == set(cl)
    pw_near = {d for d, r in pw.items() if r == "near_dup"}
    cl_near = {d for d, r in cl.items() if r == "near_dup"}
    assert pw_near <= cl_near
    # non-near reasons unchanged by the policy switch
    for d in pw:
        if pw[d] != "near_dup" and d not in cl_near:
            assert pw[d] == cl[d]
    with pytest.raises(ValueError):
        clean_corpus(corpus, near_policy="bogus").collect()


def test_pii_stats_planted(spark):
    """Planted emails/IPs/phones are counted and scrubbed; clean text
    passes through untouched."""
    from clucene_spark.pipeline.textstats import pii_stats

    rows = [
        (0, "write to alice.smith+spam@corp-mail.example.org today"),
        (1, "host 192.168.0.17 then 8.8.8.8 responded"),
        (2, "call +44 207 946 0958 or +1 555 123 4567 now"),
        (3, "nothing sensitive v1.2 here at all"),
        (4, "mixed bob@x.io on 10.0.0.1 dial +1 555 000 1111"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert (got[0]["n_emails"], got[0]["n_ips"], got[0]["n_phones"]) == (1, 0, 0)
    assert "<EMAIL>" in got[0]["redacted"] and "alice" not in got[0]["redacted"]
    assert got[1]["n_ips"] == 2 and got[1]["redacted"].count("<IP>") == 2
    assert got[2]["n_phones"] == 2 and got[2]["redacted"].count("<PHONE>") == 2
    assert got[3]["redacted"] == rows[3][1]
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (1, 1, 1)
    # redaction removes every detected span: re-running finds nothing
    redone = pii_stats(
        pii_stats(df).select("doc_id", F.col("redacted").alias("text"))
    ).collect()
    for r in redone:
        assert r["n_emails"] == r["n_ips"] == r["n_phones"] == 0


def test_pack_sequences_invariants(spark):
    """Global cumsum across range partitions; docs spanning pack
    boundaries report the right span count; zero-token docs occupy no
    pack; explicit count_col path agrees."""
    from clucene_spark.pipeline.sampling import pack_sequences

    rows = [(i, " ".join(["tok"] * n)) for i, n in
            [(0, 100), (1, 200), (2, 0), (3, 513), (4, 50), (5, 512), (6, 1)]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           pack_sequences(df, seq_len=512, n_ranges=4).collect()}
    acc = 0
    for i, n in [(0, 100), (1, 200), (2, 0), (3, 513), (4, 50), (5, 512), (6, 1)]:
        r = got[i]
        assert r["start_tok"] == acc and r["n_tokens"] == n, r
        assert r["pack_id"] == acc // 512 and r["pack_offset"] == acc % 512
        want_span = 0 if n == 0 else (acc + n - 1) // 512 - acc // 512 + 1
        assert r["n_packs"] == want_span, (r, want_span)
        acc += n
    # doc 3 (513 tokens starting at 300) spans packs 0..1
    assert got[3]["n_packs"] == 2
    # count_col path: identical placement from precomputed counts
    counted = df.select("doc_id", F.size(F.filter(F.split("text", " "),
                                                  lambda t: t != "")).alias("nt"))
    got2 = {r["doc_id"]: r for r in
            pack_sequences(counted, seq_len=512, count_col="nt", n_ranges=4).collect()}
    for i in got:
        assert (got2[i]["start_tok"], got2[i]["pack_id"]) == (
            got[i]["start_tok"], got[i]["pack_id"])


# --- real multimodal decode (stdlib WAV / BMP) ------------------------------

def test_audio_stats_real_wav_decode(spark):
    """Genuine PCM WAV payloads decode through the stdlib parser; stats
    equal closed-form expectations; a 2-channel clip (written with the
    wave module directly) reports interleaved frames correctly."""
    import io
    import wave

    import numpy as np

    from clucene_spark.pipeline.multimodal import audio_stats, encode_wav

    s0 = np.array([0, 100, -100, 32767, -32768], dtype="<i2")
    s1 = (np.arange(64, dtype=np.int64) * 515 % 65536 - 32768).astype("<i2")
    buf = io.BytesIO()  # stereo clip
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.array([1, 2, 3, 4, 5, 6], dtype="<i2").tobytes())
    rows = [(0, bytearray(encode_wav(s0))), (1, bytearray(encode_wav(s1))),
            (2, bytearray(buf.getvalue()))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_stats(media).collect()}
    assert got[0]["n_frames"] == 5 and got[0]["peak"] == 32768
    assert got[0]["sum_sq"] == int((s0.astype(np.int64) ** 2).sum())
    assert got[1]["sum_sq"] == int((s1.astype(np.int64) ** 2).sum())
    assert got[2]["n_channels"] == 2 and got[2]["n_frames"] == 3
    assert got[2]["sample_rate"] == 16000 and got[2]["sum_sq"] == 1+4+9+16+25+36


def test_image_stats_and_real_resize(spark):
    """BMP decode + nearest-neighbor resize are real: resized payloads
    re-decode to the requested dimensions with exactly the pixels the
    index map selects; non-BMP payloads pass through flagged."""
    import numpy as np

    from clucene_spark.pipeline.multimodal import (
        _decode_real,
        encode_bmp,
        image_stats,
        resize_media,
    )

    px = (np.arange(6 * 10 * 3, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(6, 10, 3)
    rows = [(0, bytearray(encode_bmp(px))), (1, bytearray(b"\x89PNG notreally"))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    st = {r["media_id"]: r for r in image_stats(media.filter("media_id = 0")).collect()}
    assert (st[0]["width"], st[0]["height"]) == (10, 6)
    assert st[0]["sum_px"] == int(px.astype(np.int64).sum())

    out = {r["media_id"]: r for r in resize_media(media, 5, 3).collect()}
    assert out[0]["decoded"] is True and out[1]["decoded"] is False
    assert bytes(out[1]["payload"]) == b"\x89PNG notreally"
    d = _decode_real(bytes(out[0]["payload"]), "image")
    yi = (np.arange(3) * 6) // 3
    xi = (np.arange(5) * 10) // 5
    assert d["width"] == 5 and d["height"] == 3
    assert np.array_equal(d["pixels"], px[yi][:, xi])


def test_png_roundtrip_all_channel_counts():
    """encode_png -> _decode_png is the identity for gray/RGB/RGBA."""
    import numpy as np

    from clucene_spark.pipeline.multimodal import _decode_png, encode_png

    rng = np.random.RandomState(7)
    for c in (1, 3, 4):
        px = rng.randint(0, 256, (13, 9, c), dtype=np.uint8)
        d = _decode_png(encode_png(px))
        assert (d["width"], d["height"]) == (9, 13)
        assert np.array_equal(d["pixels"], px)


def test_png_unfilter_all_five_filter_types():
    """Decode a hand-filtered image using one row per PNG filter type
    (None/Sub/Up/Average/Paeth, RFC 2083 §6) and recover the original
    pixels exactly."""
    import struct
    import zlib

    import numpy as np

    from clucene_spark.pipeline.multimodal import _decode_png, _paeth, _PNG_SIG

    rng = np.random.RandomState(11)
    h, w, c = 5, 4, 3
    px = rng.randint(0, 256, (h, w, c), dtype=np.uint8).astype(np.int32)
    stride = w * c
    rows, prev = [], np.zeros(stride, np.int32)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        cur = px[y].reshape(-1)
        f = np.zeros(stride, np.int32)
        for i in range(stride):
            a = cur[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if ft == 0:
                f[i] = cur[i]
            elif ft == 1:
                f[i] = (cur[i] - a) & 255
            elif ft == 2:
                f[i] = (cur[i] - b) & 255
            elif ft == 3:
                f[i] = (cur[i] - (a + b) // 2) & 255
            else:
                f[i] = (cur[i] - _paeth(a, b, cc)) & 255
        rows.append(bytes([ft]) + bytes(f.astype(np.uint8)))
        prev = cur

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    payload = (_PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + chunk(b"IEND", b""))
    d = _decode_png(payload)
    assert np.array_equal(d["pixels"].astype(np.int32), px)


def test_png_palette_decode():
    """Color type 3: palette indices expand through PLTE to (h, w, 3)."""
    import struct
    import zlib

    import numpy as np

    from clucene_spark.pipeline.multimodal import _decode_png, _PNG_SIG

    rng = np.random.RandomState(3)
    plte = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (6, 7), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    payload = (_PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0))
               + chunk(b"PLTE", plte.tobytes())
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    d = _decode_png(payload)
    assert d["bpp"] == 24
    assert np.array_equal(d["pixels"], plte[idx])


def test_png_resize_roundtrip(spark):
    """resize_media dispatches PNG payloads through decode -> nearest
    neighbor -> re-encode, like BMP."""
    import numpy as np

    from clucene_spark.pipeline.multimodal import (
        _decode_png,
        encode_png,
        resize_media,
    )

    px = (np.arange(8 * 12 * 3, dtype=np.int64) * 11 % 256).astype(
        np.uint8).reshape(8, 12, 3)
    media = spark.createDataFrame(
        [(0, bytearray(encode_png(px)))], "media_id long, payload binary"
    )
    out = resize_media(media, 6, 4).collect()[0]
    assert out["decoded"] is True
    d = _decode_png(bytes(out["payload"]))
    yi = (np.arange(4) * 8) // 4
    xi = (np.arange(6) * 12) // 6
    assert np.array_equal(d["pixels"], px[yi][:, xi])


def test_jpeg_roundtrip_shapes_and_tolerance():
    """Baseline JPEG codec (pipeline/jpeg.py, ITU T.81): encode/decode
    round-trips for grayscale, RGB 4:4:4 and 4:2:0, odd dims, restart-free
    baseline stream; smooth content stays within a tight pixel tolerance,
    constant blocks are EXACT (DC-only, quantizer divides the level
    shift), and the payload is genuine JFIF (SOI/APP0/DQT/SOF0/DHT/SOS)."""
    import numpy as np

    from clucene_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    # constant gray at q100: all-ones quant tables -> exact
    px = np.full((16, 16), 128, dtype=np.uint8)
    b = encode_jpeg(px, quality=100)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[6:11] == b"JFIF\x00"
    d = decode_jpeg(b)
    assert (d["width"], d["height"], d["channels"]) == (16, 16, 1)
    assert np.array_equal(d["pixels"][:, :, 0], px)

    # smooth RGB gradient, both samplings, odd dims
    h, w = 23, 29
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                          indexing="ij")
    grad = (30 + 4 * y + 3 * x + 9 * c).astype(np.uint8)
    for sub in (False, True):
        d = decode_jpeg(encode_jpeg(grad, quality=95, subsample=sub))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        err = np.abs(d["pixels"].astype(int) - grad.astype(int))
        assert err.max() <= 4, (sub, err.max())

    # determinism: same pixels+quality -> same bytes
    assert encode_jpeg(grad, quality=90) == encode_jpeg(grad, quality=90)

    # lossiness ordering: lower quality -> smaller payload
    assert len(encode_jpeg(grad, quality=30)) < len(encode_jpeg(grad, 95))


def test_jpeg_decoder_reads_tables_from_stream():
    """The decoder must take DQT/DHT from the byte stream, not assume the
    encoder's constants: doctor the quantization table in-place and the
    decoded output must track the doctored table (DC scales visibly)."""
    import struct

    import numpy as np

    from clucene_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    px = np.full((8, 8), 200, dtype=np.uint8)
    b = bytearray(encode_jpeg(px, quality=100))
    # find the luma DQT segment and double its DC entry (zigzag slot 0)
    i = b.find(b"\xff\xdb")
    assert i >= 0
    dc = b[i + 5]
    b[i + 5] = dc * 2
    d0 = decode_jpeg(bytes(encode_jpeg(px, quality=100)))
    d1 = decode_jpeg(bytes(b))
    # doubled dequant step -> decoded DC moves away from the original
    assert not np.array_equal(d0["pixels"], d1["pixels"])
    (seg_len,) = struct.unpack(">H", bytes(b[i + 2:i + 4]))
    assert seg_len == 67  # 8-bit table framing intact


def test_jpeg_nonbaseline_rejected():
    """Progressive (SOF2) and non-JPEG payloads raise honestly."""
    import numpy as np
    import pytest as _pytest

    from clucene_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    px = np.full((8, 8), 99, dtype=np.uint8)
    b = bytearray(encode_jpeg(px, quality=90))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # masquerade as progressive
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(b))
    with _pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_resize_dispatch(spark):
    """resize_media dispatches JPEG payloads through decode -> nearest
    neighbor -> re-encode (decoded=true), like BMP/PNG."""
    import numpy as np

    from clucene_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
    from clucene_spark.pipeline.multimodal import resize_media

    y, x, c = np.meshgrid(np.arange(16), np.arange(16), np.arange(3),
                          indexing="ij")
    px = (40 + 5 * y + 5 * x + 8 * c).astype(np.uint8)
    media = spark.createDataFrame(
        [(0, bytearray(encode_jpeg(px, quality=95)))],
        "media_id long, payload binary",
    )
    out = resize_media(media, 8, 8).collect()[0]
    assert out["decoded"] is True
    d = decode_jpeg(bytes(out["payload"]))
    assert (d["width"], d["height"]) == (8, 8)
    yi = (np.arange(8) * 16) // 8
    ref = px[yi][:, yi]
    err = np.abs(d["pixels"].astype(int) - ref.astype(int))
    assert err.max() <= 10  # two lossy q90/q95 hops


def test_lm_score_hand_computed(spark):
    """Bigram LM with Laplace smoothing on a 3-doc corpus, checked
    against a hand-rolled python model; repeated-bigram doc scores higher
    than a novel-bigram doc."""
    import math

    from clucene_spark.pipeline.textstats import lm_score

    rows = [(0, "a b a b"), (1, "a b c"), (2, "c a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_score(df, round_to=6).collect()}

    toks = {i: t.split() for i, t in rows}
    uni, big = {}, {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(t, t[1:]):
            big[(x, y)] = big.get((x, y), 0) + 1
    V = len(uni)
    for i, t in toks.items():
        lps = [math.log((big[(x, y)] + 1.0) / (uni[x] + float(V)))
               for x, y in zip(t, t[1:])]
        acc = 0.0
        for lp in lps:
            acc += lp
        assert got[i]["n_bigrams"] == len(lps)
        assert abs(got[i]["avg_logp"] - round(acc / len(lps), 6)) < 1e-9, i
    # 'a b' occurs 4x -> doc 0 (all 'a b'/'b a') beats doc 1 (has rare 'b c')
    assert got[0]["avg_logp"] > got[1]["avg_logp"]


def test_ppl_buckets_terciles_per_stratum(spark):
    """Per-stratum equal-count bands in avg_logp DESC order: 6 docs per
    lang split 2/2/2 into head/middle/tail, band membership matching a
    python re-rank of lm_score's own output; <2-token docs excluded."""
    from clucene_spark.pipeline.textstats import lm_score, ppl_buckets

    rows = []
    for lang_i, lang in enumerate(("en", "fr")):
        for j in range(6):
            # vary bigram repetition so scores spread within each lang
            body = ("x y " * (j + 1) + f"u{lang_i}{j} v{lang_i}{j}").strip()
            rows.append((lang_i * 10 + j, lang, body))
    rows.append((99, "en", "solo"))  # 1 token: no bigrams, excluded
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = ppl_buckets(df, by="lang").collect()
    assert all(r["doc_id"] != 99 for r in out)
    scores = {r["doc_id"]: r["avg_logp"]
              for r in lm_score(df, round_to=4).collect() if r["doc_id"] != 99}
    for lang_i, lang in enumerate(("en", "fr")):
        ids = [lang_i * 10 + j for j in range(6)]
        ranked = sorted(ids, key=lambda i: (-scores[i], i))
        want = {i: ("head", "middle", "tail")[pos // 2]
                for pos, i in enumerate(ranked)}
        got = {r["doc_id"]: (r["bucket"], r["bucket_id"])
               for r in out if r["lang"] == lang}
        assert {i: b for i, (b, _) in got.items()} == want
        assert sorted(bid for _, bid in got.values()) == [1, 1, 2, 2, 3, 3]


def test_connected_components_empty_and_selfloop(spark):
    """Empty edge sets and pure self-loops yield no labeled nodes;
    cluster_canonical then marks every doc a singleton keeper."""
    from clucene_spark.pipeline.graph import cluster_canonical, connected_components

    empty = spark.createDataFrame([], "a long, b long")
    assert connected_components(empty).count() == 0
    loops = spark.createDataFrame([(3, 3), (4, 4)], "a long, b long")
    assert connected_components(loops).count() == 0
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    lab = cluster_canonical(docs, empty).collect()
    assert all(r["keep"] == 1 and r["component"] == r["doc_id"] for r in lab)


def test_pick_bands_rule():
    """Auto-banding: most selective power-of-two rows-per-band that keeps
    candidate recall at the threshold >= 0.95."""
    from clucene_spark.pipeline.dedup import pick_bands

    assert pick_bands(32, 0.5) == 16    # r=2: recall 0.990; r=4 would be 0.40
    assert pick_bands(32, 0.8) == 8     # r=4: recall 0.985
    assert pick_bands(32, 0.3) == 32    # r=1 only: r=2 recall 0.78 < 0.95
    assert pick_bands(32, 0.9) == 8     # r=8 recall 0.894 < 0.95 -> stay r=4


# ---------------------------------------------------------------------------
# URL canonicalization / URL-level dedup / line dedup (webtext ops)
# ---------------------------------------------------------------------------

def test_canonicalize_url_axes(spark):
    """Every noise axis collapses; distinct pages stay distinct."""
    from clucene_spark.pipeline.urls import canonicalize_url

    variants = [
        "http://www.Site.Example/a/b/?b=2&a=1#frag",
        "https://site.example:443/a/b?a=1&b=2&utm_source=x",
        "HTTPS://site.example/a/b/?fbclid=123&b=2&a=1",
        "http://site.example:80/a/b?gclid=Z&a=1&b=2",
    ]
    distinct = [
        "https://site.example/a/c?a=1&b=2",   # different path
        "https://site.example/a/b?a=2&b=2",   # different param value
        "https://other.example/a/b?a=1&b=2",  # different host
        "https://site.example/a/b",           # no query
    ]
    df = spark.createDataFrame([(u,) for u in variants + distinct], ["url"])
    got = [r["c"] for r in
           df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert len(set(got[:4])) == 1
    assert got[0] == "site.example/a/b?a=1&b=2"
    assert len(set(got)) == 1 + len(distinct)
    assert got[7] == "site.example/a/b"


def test_url_dedup_on_webtext_latest_wins(spark):
    """webtext pages + noisy re-crawls: survivor is the latest warc_ts."""
    from clucene_spark.data.webtext import webtext_df
    from clucene_spark.pipeline.urls import url_dedup, url_dedup_survivors

    pages = webtext_df(spark, 60).cache()
    # re-crawl every 4th page a day later under a noisier URL
    recrawl = pages.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.regexp_replace("url", "^https://", "http://www.").alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
        "html", "text", "lang",
    )
    corpus = pages.unionByName(recrawl)
    groups = url_dedup(corpus).collect()
    n_dup = pages.filter(F.col("doc_id") % 4 == 0).count()
    assert len(groups) == n_dup
    for g in groups:
        assert g["n_copies"] == 2
        assert g["keep_doc"] >= 10_000  # the later capture wins
    survivors = url_dedup_survivors(corpus)
    assert survivors.count() == 60  # one row per page
    assert survivors.filter(
        (F.col("doc_id") % 4 == 0) & (F.col("doc_id") < 10_000)
    ).count() == 0
    pages.unpersist()


def test_domain_stats_counts(spark):
    from clucene_spark.data.webtext import webtext_df
    from clucene_spark.pipeline.urls import domain_stats

    pages = webtext_df(spark, 100)
    rows = {r["domain"]: r["n_docs"] for r in domain_stats(pages).collect()}
    # generator: url host = site{doc_id % 97}.example; ids 0..99 wrap on 97
    assert sum(rows.values()) == 100
    assert rows["site0.example"] == 2 and rows["site96.example"] == 1
    assert len(rows) == 97


def test_line_dedup_owner_fast_path_matches_reference(spark):
    """The r6 owner-only fast path (max_docs=1 skips the per-line flag
    join): its output must equal a brute-force python reference of the
    policy on a randomized corpus with boilerplate, twins, within-doc
    repeats and all-dropped docs."""
    import random

    from clucene_spark.pipeline.dedup import line_dedup

    rng = random.Random(607)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(120):
        lines = []
        if d % 3 == 0:
            lines.append("nav home about")  # shared boilerplate
        lines += [
            " ".join(rng.choices(vocab, k=4))
            for _ in range(rng.randint(1, 6))
        ]
        if d % 7 == 0 and lines:
            lines.append(lines[0])  # within-doc repeat
        rows.append((d, "\n".join(lines)))
    for d in range(0, 120, 10):  # full twins
        rows.append((d + 1000, rows[d][1]))

    # python reference of the max_docs=1 policy: owner (min doc_id over
    # docs containing the line) keeps; everyone else drops
    owner: dict = {}
    for doc_id, text in rows:
        for ln in text.split("\n"):
            if ln and (ln not in owner or doc_id < owner[ln]):
                owner[ln] = min(doc_id, owner.get(ln, doc_id))
    expect = {}
    for doc_id, text in rows:
        lines = [x for x in text.split("\n") if x != ""]
        kept = [x for x in lines if owner[x] == doc_id]
        expect[doc_id] = (len(lines), len(kept), "\n".join(kept))

    out = line_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]), max_docs=1
    ).collect()
    assert len(out) == len(expect)
    for r in out:
        e = expect[r["doc_id"]]
        assert (r["n_lines"], r["n_kept"], r["text_clean"]) == e, r["doc_id"]


def test_line_dedup_removes_boilerplate_once(spark):
    """Planted shared header survives in exactly one doc; unique lines
    are untouched; a fully-duplicated twin is emptied."""
    from clucene_spark.pipeline.dedup import line_dedup

    header = "shared nav header"
    rows = [
        (1, header + "\nunique one\nunique two"),
        (2, header + "\nunique three"),
        (3, "unique four\nunique four"),  # same line twice WITHIN one doc
        (4, header + "\nunique three"),   # full dup of doc 2's remainder
    ]
    out = {r["doc_id"]: r for r in line_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]), max_docs=1
    ).collect()}
    assert out[1]["n_kept"] == 3  # owner of the header keeps it
    assert out[1]["text_clean"] == header + "\nunique one\nunique two"
    assert out[2]["n_kept"] == 1  # loses header, owns "unique three"
    assert out[2]["text_clean"] == "unique three"
    # within-doc repeats both survive in the owner
    assert out[3]["n_kept"] == 2
    assert out[3]["text_clean"] == "unique four\nunique four"
    # doc 4 loses every line -> empty rewrite, still reported
    assert out[4]["n_kept"] == 0 and out[4]["text_clean"] == ""
    assert out[4]["n_lines"] == 2


def test_line_dedup_max_docs_threshold(spark):
    """max_docs=2: a line in exactly 2 docs survives everywhere; 3+ only
    in the owner."""
    from clucene_spark.pipeline.dedup import line_dedup

    rows = [(i, "pair line\ntriple line" if i < 2 else "triple line")
            for i in range(3)]
    out = {r["doc_id"]: r for r in line_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]), max_docs=2
    ).collect()}
    assert out[0]["n_kept"] == 2  # owner keeps both
    assert out[1]["n_kept"] == 1  # keeps the 2-doc line, loses the 3-doc one
    assert out[1]["text_clean"] == "pair line"
    assert out[2]["n_kept"] == 0


def test_span_dedup_owner_rule_and_merged_spans(spark):
    """ExactSubstr rewrite semantics: a copied 8-token passage is cut
    from every doc but its min-doc owner at ANY alignment; a full twin
    empties out; short docs and within-doc-only repeats are untouched."""
    from clucene_spark.pipeline.dedup import span_dedup

    banner = "a b c d e f g h"
    rows = [
        (1, banner + " unique1 tail1"),
        (2, "x2 " + banner + " y2 z2"),        # copy at offset 1
        (3, "p3 q3 " + banner + " r3"),        # copy at offset 2
        (4, "t u v w aa bb cc dd ee ff"),
        (5, "t u v w aa bb cc dd ee ff"),      # full twin of 4
        (6, "short doc only"),                 # < w tokens: no windows
        (7, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
    ]
    out = {r["doc_id"]: r for r in span_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]), w=8
    ).collect()}
    # owner (min doc_id) keeps the banner
    assert out[1]["dup_tokens"] == 0
    assert out[1]["text_clean"] == banner + " unique1 tail1"
    # non-owners lose exactly the 8 banner tokens as ONE merged span
    assert (out[2]["dup_tokens"], out[2]["n_spans"]) == (8, 1)
    assert out[2]["text_clean"] == "x2 y2 z2"
    assert out[3]["text_clean"] == "p3 q3 r3"
    # full twin: owner intact, twin empties out
    assert out[4]["text_clean"] == "t u v w aa bb cc dd ee ff"
    assert (out[5]["dup_tokens"], out[5]["text_clean"]) == (10, "")
    # short doc reported untouched
    assert (out[6]["n_tokens"], out[6]["dup_tokens"]) == (3, 0)
    assert out[6]["text_clean"] == "short doc only"
    # within-doc-only repetition: owner keeps all copies
    assert out[7]["dup_tokens"] == 0 and out[7]["text_clean"] == rows[6][1]


def test_span_dedup_disjoint_copies_merge_separately(spark):
    """Two separated copied passages in one doc come back as TWO merged
    spans; the gap text survives."""
    from clucene_spark.pipeline.dedup import span_dedup

    p1 = "c1 c2 c3 c4 c5 c6 c7 c8"
    p2 = "d1 d2 d3 d4 d5 d6 d7 d8"
    rows = [
        (1, p1 + " " + p2),                       # owner of both
        (2, p1 + " gap1 gap2 gap3 " + p2),        # copies both, separated
    ]
    out = {r["doc_id"]: r for r in span_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]), w=8
    ).collect()}
    assert out[1]["dup_tokens"] == 0
    assert (out[2]["dup_tokens"], out[2]["n_spans"]) == (16, 2)
    assert out[2]["text_clean"] == "gap1 gap2 gap3"


def test_ingest_webtext_fates_and_lineage(spark):
    """The composed front door labels every input row exactly once and
    the per-stage semantics hold: later capture wins the URL group, the
    shared nav header survives in exactly one kept doc, dropped rows
    carry sentinel stats."""
    from clucene_spark.data.webtext import webtext_df
    from clucene_spark.pipeline.clean import ingest_webtext

    pages = webtext_df(spark, 40).select(
        "doc_id", F.col("warc_ts").cast("long").alias("ts"), "url", "html"
    )
    recrawl = pages.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        (F.col("ts") + 86_400).alias("ts"),
        F.regexp_replace("url", "^https://", "http://www.").alias("url"),
        "html",
    )
    out = ingest_webtext(pages.unionByName(recrawl)).collect()
    by_fate = {}
    for r in out:
        by_fate.setdefault(r["fate"], []).append(r)
    assert len(out) == 50  # every input row labeled once
    # the earlier capture of every re-crawled page is the url_dup
    assert sorted(r["doc_id"] for r in by_fate["url_dup"]) == [
        i for i in range(40) if i % 4 == 0
    ]
    for r in by_fate["url_dup"]:
        assert (r["quality"], r["n_lines"], r["n_kept"], r["text_clean"]) \
            == (-1.0, 0, 0, "")
    # generator pages have no shared lines -> no boilerplate fates, and
    # kept docs carry their extracted text
    assert "all_boilerplate" not in by_fate
    for r in by_fate["kept"]:
        assert r["n_kept"] == r["n_lines"] > 0
        assert r["text_clean"] != ""


def test_ingest_crawl_fates_and_stage_order(spark):
    """The crawl-side admission cascade (`ingest_crawl`) labels every
    page exactly once and the stages fire in policy→content→dedup
    order: a robots-denied page on a blocklisted domain reports
    robots_denied (policy precedence); a boilerplate-only later capture
    never contests latest-wins (dedup sees only admitted pages), so the
    EARLIER capture with real content is kept, not url_dup."""
    import datetime as dt

    from clucene_spark.pipeline.clean import ingest_crawl

    prose = ("The quick brown fox jumps over the lazy dog near the "
             "riverbank every single morning without fail.")
    nav = '<nav><a href="/">home</a> <a href="/a">about</a></nav>'
    foot = "<footer>copyright twenty twenty four</footer>"

    def page(body_para):
        main = f"<p>{body_para}</p>" if body_para else ""
        return f"<html><body>{nav}{main}{foot}</body></html>".encode()

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # 0: clean keep on an allowed domain
        (0, "https://ok.example/a", t0, page(prose)),
        # 1: robots-denied AND blocklisted -> robots wins (stage order)
        (1, "https://deny.example/x", t0, page(prose)),
        # 2: blocklisted only
        (2, "https://blocked.example/y", t0, page(prose)),
        # 3: boilerplate-only page on an allowed domain
        (3, "https://ok.example/empty", t0, page("")),
        # 4+5: same canonical URL (?utm_source strips), later capture wins
        (4, "https://ok.example/dup?utm_source=feed",
         t0, page(prose + " first capture.")),
        (5, "https://ok.example/dup",
         t0 + dt.timedelta(hours=1), page(prose + " second capture.")),
        # 6: earlier capture whose LATER twin (7) is boilerplate-only ->
        #    6 must be kept because 7 never reaches the dedup stage
        (6, "https://ok.example/ghost", t0, page(prose + " survives.")),
        (7, "https://ok.example/ghost", t0 + dt.timedelta(hours=2),
         page("")),
    ]
    pages = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts timestamp, html binary"
    )
    robots = spark.createDataFrame(
        [("ok.example", "User-agent: *\nDisallow: /never\n"),
         ("deny.example", "User-agent: *\nDisallow: /\n"),
         ("blocked.example", "User-agent: *\nDisallow: /never\n")],
        "domain string, robots_txt string",
    )
    bl = spark.createDataFrame(
        [("deny.example",), ("blocked.example",)], "domain string"
    )
    out = {r["doc_id"]: r for r in
           ingest_crawl(pages, robots, bl).collect()}
    assert len(out) == 8
    fates = {d: out[d]["fate"] for d in out}
    assert fates == {
        0: "kept", 1: "robots_denied", 2: "blocked_domain",
        3: "no_content", 4: "url_dup", 5: "kept",
        6: "kept", 7: "no_content",
    }
    # kept rows carry extracted main text, dropped rows carry null
    assert "second capture" in out[5]["text_out"]
    assert "survives" in out[6]["text_out"]
    for d in (1, 2, 3, 4, 7):
        assert out[d]["text_out"] is None


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

def test_dsir_weights_match_python_replay(docs):
    """dsir_weights == an independent pure-Python replay of the hashed
    n-gram / Laplace / integer-micro-nat arithmetic (the same replay the
    DuckDB oracle runs)."""
    import hashlib
    import math
    from collections import Counter

    from clucene_spark.pipeline.dsir import dsir_weights

    target = docs.filter(F.col("source") == "src0")
    out = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in dsir_weights(docs, target, n_buckets=256).collect()
    }

    def grams(text):
        t = [x for x in text.split(" ") if x]
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:7], 16) % 256

    raw_c, tgt_c, docb = Counter(), Counter(), {}
    for r in docs.select("doc_id", "text", "source").collect():
        gs = grams(r["text"])
        if not gs:
            continue
        bs = [bucket(g) for g in gs]
        docb[r["doc_id"]] = Counter(bs)
        raw_c.update(bs)
        if r["source"] == "src0":
            tgt_c.update(bs)
    tr, tt, b = float(sum(raw_c.values())), float(sum(tgt_c.values())), 256.0
    ri = {
        bk: round(
            (math.log((tgt_c.get(bk, 0) + 1.0) / (tt + b))
             - math.log((c + 1.0) / (tr + b))) * 1e6
        )
        for bk, c in raw_c.items()
    }
    assert set(out) == set(docb)
    for d, cnt in docb.items():
        wm = sum(c * ri[bk] for bk, c in cnt.items())
        assert out[d][0] == sum(cnt.values())
        assert abs(out[d][1] - round(wm / 1e6, 6)) < 1e-9, d


def test_dsir_weights_one_sided_buckets(spark):
    """Buckets present in only ONE of the raw/target per-bucket tables —
    the edge the r6 single-union collect must split correctly: raw-only
    buckets take ct=0 through the coalesce, target-only buckets (grams
    no raw doc has) contribute to t_tgt but produce no ratio row.
    Brute-force replay on disjoint vocabularies."""
    import hashlib
    import math
    from collections import Counter

    from clucene_spark.pipeline.dsir import dsir_weights

    nb = 64
    raw_rows = [(1, "alpha beta gamma"), (2, "delta alpha"), (3, "beta")]
    tgt_rows = [(10, "omega psi chi omega")]  # zero vocab overlap
    docs = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    target = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["n_grams"], r["logw"])
           for r in dsir_weights(docs, target, n_buckets=nb).collect()}

    def grams(text):
        t = [x for x in text.split(" ") if x]
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:7], 16) % nb

    raw_c, tgt_c, docb = Counter(), Counter(), {}
    for doc_id, text in raw_rows:
        bs = [bucket(g) for g in grams(text)]
        docb[doc_id] = Counter(bs)
        raw_c.update(bs)
    for _, text in tgt_rows:
        tgt_c.update(bucket(g) for g in grams(text))
    tr, tt, b = float(sum(raw_c.values())), float(sum(tgt_c.values())), float(nb)
    ri = {bk: round((math.log((tgt_c.get(bk, 0) + 1.0) / (tt + b))
                     - math.log((c + 1.0) / (tr + b))) * 1e6)
          for bk, c in raw_c.items()}
    assert set(out) == set(docb)
    for d, cnt in docb.items():
        assert out[d][0] == sum(cnt.values())
        assert abs(out[d][1] - round(sum(c * ri[bk] for bk, c in cnt.items())
                                     / 1e6, 6)) < 1e-9


def test_dsir_resample_prefers_target_like_docs(spark):
    """Docs sharing the target's vocabulary outscore disjoint-vocab docs,
    and the Gumbel-top-k selection is deterministic per seed."""
    from clucene_spark.pipeline.dsir import dsir_resample, dsir_weights

    rows = (
        # target-like vocabulary (wiki-ish)
        [(i, "alpha beta gamma delta alpha beta", "like") for i in range(20)]
        # disjoint vocabulary (crawl-ish junk)
        + [(100 + i, "zz yy xx ww vv uu tt ss", "junk") for i in range(20)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta epsilon", "t") for i in range(5)],
        "doc_id long, text string, kind string",
    )
    w = {r["doc_id"]: r["logw"]
         for r in dsir_weights(docs, target, n_buckets=128).collect()}
    assert min(w[i] for i in range(20)) > max(w[100 + i] for i in range(20))

    sel = dsir_resample(docs, target, k=10, n_buckets=128, seed=3).collect()
    assert len(sel) == 10
    # T=1 Gumbel noise is ~unit-scale; the like/junk weight gap dominates
    assert all(r["doc_id"] < 100 for r in sel)
    again = dsir_resample(docs, target, k=10, n_buckets=128, seed=3).collect()
    assert [r["doc_id"] for r in sel] == [r["doc_id"] for r in again]
    # a different seed redraws the Gumbel keys (ordering may change)
    other = dsir_resample(docs, target, k=10, n_buckets=128, seed=4).collect()
    assert {r["doc_id"] for r in other} <= {i for i in range(20)}


def test_dsir_cache_lifecycle_lru1(spark):
    """Repeated dsir_weights calls must not accumulate cached RDDs (ADVICE
    r4): registering a new docb cache unpersists the previous one, and
    dsir_unpersist() releases the last."""
    from pyspark import StorageLevel
    from clucene_spark.pipeline import dsir as dsir_mod
    from clucene_spark.pipeline.dsir import dsir_unpersist, dsir_weights

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(8)], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(100, "alpha beta")], "doc_id long, text string"
    )

    w1 = dsir_weights(docs, target, n_buckets=64)
    w1.count()  # materialize the first cache
    docb1 = w1._dsir_docb
    assert docb1.storageLevel != StorageLevel.NONE

    # same inputs -> same logical plan -> shared cache entry stays alive
    w1b = dsir_weights(docs, target, n_buckets=64)
    assert w1b._dsir_docb.storageLevel != StorageLevel.NONE
    assert len(dsir_mod._docb_cache) == 1

    # different plan (new n_buckets) -> LRU-1 evicts the previous cache
    w2 = dsir_weights(docs, target, n_buckets=32)
    docb2 = w2._dsir_docb
    assert docb1.storageLevel == StorageLevel.NONE
    assert docb2.storageLevel != StorageLevel.NONE
    assert len(dsir_mod._docb_cache) == 1

    dsir_unpersist()
    assert docb2.storageLevel == StorageLevel.NONE
    assert not dsir_mod._docb_cache

    # cache=False registers nothing and persists nothing
    w3 = dsir_weights(docs, target, n_buckets=64, cache=False)
    assert w3._dsir_docb.storageLevel == StorageLevel.NONE
    assert not dsir_mod._docb_cache
    w3.count()  # still computes correctly without the cache


def test_dsir_temperature_zero_is_hard_topk_and_guards(spark, sf_dir):
    """Regression (r5): temperature=0 hit Spark's non-ANSI divide
    (NULL keys -> k smallest doc_ids selected silently); it now
    degenerates to hard top-k by weight as documented. An empty target
    raises instead of silently inverting the weights into inverse-gram
    rarity; negative temperature is rejected."""
    import pytest as _pytest

    from clucene_spark.pipeline.dsir import (
        dsir_resample,
        dsir_unpersist,
        dsir_weights,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").limit(200)
    target = docs.filter(F.col("doc_id") % 10 == 0)
    try:
        hard = dsir_resample(docs, target, k=10, temperature=0).collect()
        assert len(hard) == 10
        # hard top-k == the 10 largest logw (doc_id ASC tiebreak)
        w = dsir_weights(docs, target).collect()
        want = [r["doc_id"] for r in sorted(
            w, key=lambda r: (-r["logw"], r["doc_id"]))[:10]]
        assert [r["doc_id"] for r in hard] == want
        assert all(r["key"] == r["logw"] for r in hard)

        with _pytest.raises(ValueError, match="temperature"):
            dsir_resample(docs, target, k=5, temperature=-1.0)
        empty_target = docs.filter(F.lit(False))
        with _pytest.raises(ValueError, match="target corpus"):
            dsir_weights(docs, empty_target).collect()
    finally:
        dsir_unpersist()


def test_cosine_topk_pandas_tie_determinism(spark):
    """Regression (r5): per-batch truncation on unrounded scores could
    drop a lower-id row that ties after rounding, diverging from
    cosine_topk's (rounded DESC, id ASC) contract."""
    from clucene_spark.pipeline.ann import cosine_topk, cosine_topk_pandas

    # ids 1 and 2 tie at 4dp; id 2 has the marginally LARGER raw cosine,
    # so raw-score selection with k=1 would keep id 2 — the contract
    # wants id 1
    rows = [
        (1, [1.0, 1.0e-6]),
        (2, [1.0, 0.5e-6]),
        (3, [0.0, 1.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0]
    want = [(r["vec_id"], r["cosine"])
            for r in cosine_topk(vecs, q, k=1).collect()]
    got = [(r["vec_id"], r["cosine"])
           for r in cosine_topk_pandas(vecs.coalesce(1), q, k=1).collect()]
    assert want == got == [(1, 1.0)]


def test_probe_masks_hamming_coverage():
    """Regression (r5): multi_probe >= 2 silently generated only
    single-bit flips; the mask set must cover every hamming distance up
    to multi_probe."""
    from clucene_spark.pipeline.dedup import _probe_masks

    m1 = _probe_masks(8, 1)
    m2 = _probe_masks(8, 2)
    assert len(m1) == 8 and all(bin(m).count("1") == 1 for m in m1)
    assert len(m2) == 8 + 28
    assert {bin(m).count("1") for m in m2} == {1, 2}
    assert _probe_masks(8, 0) == []


def test_extract_features_real_decode_uses_content(spark):
    """Regression (r5): fake=False decoded the payload and then returned
    the hash-based fake features anyway. Real decode must yield
    content-derived features that differ between different images and
    from the fake path."""
    import numpy as np

    from clucene_spark.pipeline.multimodal import (
        encode_png,
        extract_features,
    )

    dark = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    light = encode_png(np.full((4, 4, 3), 200, dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, bytearray(dark)), (2, bytearray(light))],
        "media_id long, payload binary",
    )
    real = {r["media_id"]: tuple(r["features"])
            for r in extract_features(media, fake=False).collect()}
    fake = {r["media_id"]: tuple(r["features"])
            for r in extract_features(media, fake=True).collect()}
    assert real[1] != real[2]
    assert real[1][0] < 0.01 and real[2][0] > 0.5  # mean brightness
    assert real[1] != fake[1]
    assert all(0.0 <= f < 1.0 for v in real.values() for f in v)


def test_repetition_top2gram_capped(spark):
    """Regression (r5): overlapping repeats ('a a a a') pushed
    top_2gram_frac to 1.5; it is capped at 1.0 like dup_3gram_frac."""
    from clucene_spark.pipeline.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["top_2gram_frac"]
           for r in repetition_stats(docs).collect()}
    assert got[1] == 1.0
    assert got[2] == 0.5


def test_minhash_grid_verify_matches_broadcast_plan(spark):
    """r6: the large-sets verify regime (grid-partitioned set attachment,
    dedup._grid_intersect) must produce the EXACT output of the
    broadcast-join plan. Force the grid branch by shrinking the broadcast
    threshold below the measured sets size."""
    from clucene_spark.data.webtext import webtext_df
    from clucene_spark.pipeline.dedup import minhash_lsh_pairs, with_planted_dups

    corpus = with_planted_dups(
        webtext_df(spark, 600).select("doc_id", "text"), every=5
    )
    ref = sorted(tuple(r) for r in minhash_lsh_pairs(corpus, bands=32).collect())
    assert ref, "corpus must produce verified pairs"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        spark.catalog.clearCache()
        got = sorted(
            tuple(r) for r in minhash_lsh_pairs(corpus, bands=32).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == ref
