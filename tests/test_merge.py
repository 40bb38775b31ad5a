"""Log-structured merge tests: policy, compaction equivalence, rebase.

Oracle: logical index equality across compaction (the reference's
TestAddIndexesNoOptimize / TestIndexWriter merge coverage) — merging must
not change any query-visible state.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clucene_spark.index.build import InvertedIndex
from clucene_spark.index.merge import (
    add_indexes,
    find_merges,
    maybe_merge,
    merge_segments,
    optimize,
)
from clucene_spark.index.segments import SegmentStore, build_segments, read_manifest
from clucene_spark.search.engine import SHOULD, BooleanQuery, Searcher, TermQuery
from clucene_spark.search.wand import wand_query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    index = InvertedIndex(docs).cache()
    d = str(tmp_path_factory.mktemp("merge_idx"))
    build_segments(index.tokens, index.doc_lens, d, docs_per_segment=8)
    return index, d


def _seg(n_docs):
    return {"name": f"s{n_docs}", "n_docs": n_docs, "min_doc": 0, "max_doc": 0,
            "n_tokens": 0, "n_terms": 0}


def test_find_merges_policy():
    # 10 same-level segments -> one merge of all 10
    segs = [_seg(100) for _ in range(10)]
    for i, s in enumerate(segs):
        s["name"] = f"s{i}"
    assert find_merges(segs) == [[f"s{i}" for i in range(10)]]
    # 9 segments: below mergeFactor -> no merge
    assert find_merges(segs[:9]) == []
    # one big + 10 small: the small ones merge, the big one is left alone
    big = _seg(10**6); big["name"] = "big"
    mixed = [big] + [_seg(10) for _ in range(10)]
    for i, s in enumerate(mixed[1:]):
        s["name"] = f"t{i}"
    got = find_merges(mixed)
    assert got == [[f"t{i}" for i in range(10)]]


def test_compaction_preserves_index(spark, built):
    index, d = built
    before = read_manifest(d)
    store0 = SegmentStore(spark, d)
    td_before = {r["term"]: (r["df"], r["cf"]) for r in store0.term_dict().collect()}
    n_before = len(before["segments"])
    assert n_before >= 8

    created = maybe_merge(spark, d, merge_factor=4)
    assert created  # at least one merge ran
    after = read_manifest(d)
    assert len(after["segments"]) < n_before
    assert sum(s["n_docs"] for s in after["segments"]) == sum(
        s["n_docs"] for s in before["segments"]
    )

    store1 = SegmentStore(spark, d)
    td_after = {r["term"]: (r["df"], r["cf"]) for r in store1.term_dict().collect()}
    assert td_after == td_before

    # query-visible equivalence: WAND top-k identical pre/post compaction
    searcher = Searcher(index, similarity="bm25")
    q = BooleanQuery().add(TermQuery(term="spark"), SHOULD).add(
        TermQuery(term="table"), SHOULD
    )
    want = [(r["doc_id"], r["score"]) for r in searcher.topk(q, 10, round_to=4).collect()]
    got = [
        (r["doc_id"], r["score"])
        for r in wand_query(store1, ["spark", "table"], k=10).collect()
    ]
    assert got == want


def test_optimize_to_single_segment(spark, built):
    index, d = built
    optimize(spark, d)
    m = read_manifest(d)
    assert len(m["segments"]) == 1
    store = SegmentStore(spark, d)
    assert store.term_dict().count() == index.term_dict.count()
    n, avg = store.stats()
    assert n == index.doc_lens.count()
    # merged segment's prefix-compressed term dictionary round-trips
    from clucene_spark.index.segments import read_term_index

    seg = m["segments"][0]["name"]
    want = sorted(r["term"] for r in index.term_dict.collect())
    assert read_term_index(d, seg) == want


def test_add_indexes_rebase(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    index = InvertedIndex(docs)
    d_main = str(tmp_path / "main")
    d_foreign = str(tmp_path / "foreign")
    build_segments(index.tokens, index.doc_lens, d_main, docs_per_segment=16)
    build_segments(index.tokens, index.doc_lens, d_foreign, docs_per_segment=16)

    base = 1_000_000
    add_indexes(spark, d_main, d_foreign, doc_base=base)
    store = SegmentStore(spark, d_main)
    n, _ = store.stats()
    assert n == 80  # 40 original + 40 rebased
    # every original doc has a rebased twin with identical postings
    docs_col = store.doc_lens().select("doc_id").collect()
    ids = sorted(r["doc_id"] for r in docs_col)
    lo = [i for i in ids if i < base]
    hi = [i - base for i in ids if i >= base]
    assert lo == hi


def test_incremental_append_then_compact(spark, tmp_path):
    """The LSM lifecycle end-to-end: index the first half, append the
    second half (resume skips the checkpointed ranges), compact, and the
    result is query-identical to a one-shot full build."""
    from clucene_spark.index.segments import build_segments_fused

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    half1 = docs.filter(F.col("doc_id") < 250)

    d_inc = str(tmp_path / "inc")
    d_full = str(tmp_path / "full")
    first = build_segments_fused(half1, d_inc, docs_per_segment=64)
    n_first = first.count()
    assert n_first >= 3
    # append: same call over the FULL corpus — checkpointed ranges skip
    second = build_segments_fused(docs, d_inc, docs_per_segment=64)
    assert second.count() >= 3
    # the partial tail range (192-255, previously checkpointed only up to
    # 249) is rebuilt; fully-checkpointed ranges below it are skipped
    assert all(r["min_doc"] >= 192 for r in second.collect())
    maybe_merge(spark, d_inc, merge_factor=4)

    build_segments_fused(docs, d_full, docs_per_segment=64)
    s_inc = SegmentStore(spark, d_inc)
    s_full = SegmentStore(spark, d_full)
    assert s_inc.stats() == s_full.stats()
    td_i = {r["term"]: (r["df"], r["cf"]) for r in s_inc.term_dict().collect()}
    td_f = {r["term"]: (r["df"], r["cf"]) for r in s_full.term_dict().collect()}
    assert td_i == td_f
    got = [(r["doc_id"], r["score"])
           for r in wand_query(s_inc, ["spark", "table"], k=10).collect()]
    want = [(r["doc_id"], r["score"])
            for r in wand_query(s_full, ["spark", "table"], k=10).collect()]
    assert got == want


def test_delete_then_purge_on_optimize(spark, tmp_path):
    """deleteDocuments semantics: results filtered immediately; postings
    physically purged at merge; deletes cleared after optimize."""
    from clucene_spark.index.segments import (
        build_segments_fused,
        delete_docs,
        read_deletes,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "del_idx")
    build_segments_fused(docs, d, docs_per_segment=64)
    store = SegmentStore(spark, d)

    before = [r["doc_id"] for r in wand_query(store, ["spark"], k=5).collect()]
    assert before
    victim = before[0]
    delete_docs(d, [victim])

    store = SegmentStore(spark, d)
    after = [r["doc_id"] for r in wand_query(store, ["spark"], k=5).collect()]
    assert victim not in after
    # stats still count the deleted doc until purge (Lucene docFreq model)
    n_before, _ = store.stats()
    assert n_before == 500

    optimize(spark, d)
    assert read_deletes(d) == []  # purged
    store = SegmentStore(spark, d)
    n_after, _ = store.stats()
    assert n_after == 499
    purged = [r["doc_id"] for r in wand_query(store, ["spark"], k=5).collect()]
    assert victim not in purged
    # doc really gone from postings, not just filtered
    assert store.doc_lens().filter(F.col("doc_id") == victim).count() == 0


def test_update_documents(spark, tmp_path):
    """updateDocument = delete old + add new under a fresh doc_id."""
    from pyspark.sql import functions as F2

    from clucene_spark.index.segments import (
        SegmentStore,
        build_segments_fused,
        update_documents,
    )
    from clucene_spark.search.wand import wand_query_local

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    d = str(tmp_path / "upd_idx")
    build_segments_fused(docs, d, docs_per_segment=128, analyzer="whitespace")
    store = SegmentStore(spark, d)
    hits = wand_query_local(store, ["spark"], k=3)
    victim = hits[0][0]

    new_row = spark.createDataFrame(
        [(10_000, "replacement text featuring spark spark spark")],
        "doc_id long, text string",
    )
    pre_ids = {r["doc_id"] for r in store.doc_lens().select("doc_id").collect()}
    update_documents(spark, d, new_row, [victim],
                     docs_per_segment=128, analyzer="whitespace")
    store = SegmentStore(spark, d)
    after = wand_query_local(store, ["spark"], k=10)
    ids = [h[0] for h in after]
    assert victim not in ids
    assert 10_000 in ids
    # regression (round-1 data loss): the partial tail range must survive an
    # update whose new docs don't re-supply it — no doc may vanish
    n_after, _ = store.stats()
    assert n_after == len(pre_ids) + 1  # victim still counted until purge
    post_ids = {r["doc_id"] for r in store.doc_lens().select("doc_id").collect()}
    assert pre_ids - post_ids == set()
    assert 10_000 in post_ids


def test_append_into_partial_range_no_loss(spark, tmp_path):
    """New docs landing INSIDE a partially-filled range become an extra
    piece segment; the range's existing docs are untouched (the exact
    round-1 loss scenario: 300 docs @ dps=128 -> tail 256-299, then an
    append of 300-305 into the same range)."""
    from clucene_spark.index.segments import (
        SegmentStore,
        build_segments_fused,
        read_manifest,
        update_documents,
    )
    from clucene_spark.search.wand import wand_query_local

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    d = str(tmp_path / "piece_idx")
    build_segments_fused(docs, d, docs_per_segment=128, analyzer="whitespace")
    new_rows = spark.createDataFrame(
        [(300 + i, f"fresh doc {i} mentions spark heavily") for i in range(6)],
        "doc_id long, text string",
    )
    update_documents(spark, d, new_rows, [], docs_per_segment=128,
                     analyzer="whitespace")
    store = SegmentStore(spark, d)
    n, _ = store.stats()
    assert n == 306
    ids = {r["doc_id"] for r in store.doc_lens().select("doc_id").collect()}
    assert ids == set(range(306))
    names = [s["name"] for s in read_manifest(d)["segments"]]
    assert "seg_00000002" in names and "seg_00000002_p1" in names
    # re-delivery of identical rows is a no-op (stream replay idempotence)
    update_documents(spark, d, new_rows, [], docs_per_segment=128,
                     analyzer="whitespace")
    store = SegmentStore(spark, d)
    assert store.stats()[0] == 306
    # queries see both pieces; compaction folds them away
    assert {h[0] for h in wand_query_local(store, ["fresh"], k=10)} == set(
        range(300, 306)
    )
    optimize(spark, d)
    store = SegmentStore(spark, d)
    assert store.stats()[0] == 306


def test_merge_mixed_positions_all_or_none(spark, tmp_path):
    """Merging rows with and without pos_blob for the same term (addIndexes
    of a positions-free index into a positions-enabled one) must not
    misalign positions: the merged term drops positions entirely, while
    terms whose inputs all carry positions keep them."""
    from clucene_spark.index.merge import add_indexes, optimize
    from clucene_spark.index.segments import SegmentStore, build_segments_fused

    texts = [(i, f"shared words plus unique{i} token") for i in range(20)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    d_pos = str(tmp_path / "with_pos")
    d_nopos = str(tmp_path / "no_pos")
    build_segments_fused(docs, d_pos, docs_per_segment=16,
                         analyzer="whitespace", with_positions=True)
    build_segments_fused(docs, d_nopos, docs_per_segment=16,
                         analyzer="whitespace", with_positions=False)
    add_indexes(spark, d_pos, d_nopos, doc_base=1000)
    optimize(spark, d_pos)  # forces pos-ful and pos-free rows into one term

    store = SegmentStore(spark, d_pos)
    rows = {r["term"]: r for r in store.postings().collect()}
    # 'shared' exists in both inputs -> merged with positions dropped
    shared = rows["shared"]
    assert shared["df"] == 40
    assert shared["pos_blob"] is None
    # doc ids intact on both sides of the rebase
    from clucene_spark.index.codec import decode_postings
    d_ids, tfs = decode_postings(bytes(shared["doc_blob"]), bytes(shared["tf_blob"]))
    assert sorted(d_ids) == list(range(20)) + list(range(1000, 1020))
    assert all(t == 1 for t in tfs)


def test_append_after_compaction_keeps_merge_product(spark, tmp_path):
    """Regression (r5): the append commit used to rebuild the manifest
    from checkpoints ALONE, dropping seg_m_* merge products (whose only
    record is the manifest) and resurrecting GC'd segment names — the
    next GC then deleted the merge product itself. Build half, compact,
    append the rest: the manifest must keep the merge product, list only
    dirs that exist, survive GC, and stay query-identical to a one-shot
    build."""
    import os

    from clucene_spark.index.segments import (
        build_segments_fused,
        gc_segments,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    half1 = docs.filter(F.col("doc_id") < 250)
    d = str(tmp_path / "cap")
    build_segments_fused(half1, d, docs_per_segment=64)
    merged = maybe_merge(spark, d, merge_factor=2)
    assert merged, "fixture must actually compact"
    m1 = read_manifest(d)
    assert any(s["name"].startswith("seg_m_") for s in m1["segments"])

    build_segments_fused(docs, d, docs_per_segment=64)  # append 2nd half
    m2 = read_manifest(d)
    names = [s["name"] for s in m2["segments"]]
    assert any(n.startswith("seg_m_") for n in names), (
        "merge product dropped from the appended manifest")
    seg_root = os.path.join(d, "segments")
    missing = [n for n in names
               if not os.path.isdir(os.path.join(seg_root, n))]
    assert not missing, f"manifest lists GC'd segments: {missing}"
    gc_segments(d)
    assert all(os.path.isdir(os.path.join(seg_root, n)) for n in names)

    d_full = str(tmp_path / "cap_full")
    build_segments_fused(docs, d_full, docs_per_segment=64)
    s_inc, s_full = SegmentStore(spark, d), SegmentStore(spark, d_full)
    assert s_inc.stats() == s_full.stats()
    got = [(r["doc_id"], r["score"])
           for r in wand_query(s_inc, ["spark", "table"], k=10).collect()]
    want = [(r["doc_id"], r["score"])
            for r in wand_query(s_full, ["spark", "table"], k=10).collect()]
    assert got == want


def test_retry_after_crash_between_publish_and_checkpoint(spark, tmp_path):
    """A task that died after publishing its segment dir but before the
    checkpoint write used to wedge every retry and every resumed run
    (os.rename onto the existing dir -> ENOTEMPTY). Simulate the crash
    window by deleting one checkpoint after a build; the re-run must
    rebuild that range onto the existing dir without error and restore
    the checkpoint."""
    import os

    from clucene_spark.index.segments import build_segments_fused

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    d = str(tmp_path / "retry")
    build_segments_fused(docs, d, docs_per_segment=128)
    ckdir = os.path.join(d, "checkpoints")
    cks = sorted(f for f in os.listdir(ckdir) if f.endswith(".json"))
    os.remove(os.path.join(ckdir, cks[0]))

    build_segments_fused(docs, d, docs_per_segment=128)  # retry
    assert sorted(
        f for f in os.listdir(ckdir) if f.endswith(".json")) == cks
    store = SegmentStore(spark, d)
    assert store.stats()[0] == n_docs
    names = [s["name"] for s in read_manifest(d)["segments"]]
    assert len(names) == len(set(names))


def test_merge_with_deletes_manifest_stats_exact(spark, tmp_path):
    """Regression (r5): the merged manifest entry summed the gone
    segments' n_tokens, keeping purged docs' tokens; fsck then flagged
    the healthy merged segment (sum(dl) != n_tokens). After
    delete+optimize the entry must match the surviving rows exactly and
    fsck must be clean."""
    from clucene_spark.index.fsck import check_index
    from clucene_spark.index.segments import build_segments_fused, delete_docs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = str(tmp_path / "delmerge")
    build_segments_fused(docs, d, docs_per_segment=64)
    delete_docs(d, [5, 6, 7, 200])
    out = optimize(spark, d)
    entry = [s for s in read_manifest(d)["segments"] if s["name"] == out][0]
    store = SegmentStore(spark, d)
    assert entry["n_docs"] == store.stats()[0]
    tot = store.doc_lens().agg(F.sum("dl")).collect()[0][0]
    assert entry["n_tokens"] == int(tot)
    bad = [r for r in check_index(spark, d).collect() if r["n_bad"]]
    assert not bad, bad[:3]


def test_add_indexes_never_commits_staged_ranges(spark, tmp_path):
    """Regression (r5): addIndexes committed the staged foreign segments
    with their UNREBASED doc ranges into the live manifest before
    merging — a reader in that window (or forever, after a crash
    mid-merge) saw colliding doc_ids. The only commit must be the
    post-merge one, and no generation may ever list a staged_* entry."""
    from clucene_spark.index.segments import (
        build_segments_fused,
        latest_generation,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    d_main, d_foreign = str(tmp_path / "m"), str(tmp_path / "f")
    build_segments_fused(docs, d_main, docs_per_segment=16)
    build_segments_fused(docs, d_foreign, docs_per_segment=16)
    g0 = latest_generation(d_main)
    add_indexes(spark, d_main, d_foreign, doc_base=1_000_000)
    g1 = latest_generation(d_main)
    assert g1 == g0 + 1, "staging must not burn a manifest generation"
    for g in range(g1 + 1):
        m = read_manifest(d_main, generation=g)
        staged = [s["name"] for s in m["segments"]
                  if s["name"].startswith("staged_")]
        assert not staged, f"generation {g} exposes staged entries"
    assert SegmentStore(spark, d_main).stats()[0] == 80
