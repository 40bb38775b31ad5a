"""Query-server serving path (tools/query_server.py): Spark-free store
opening with manifest-derived stats, and rank-identity through a live
socket against the in-process and Spark serving paths."""

import json
import os
import shutil
import socket
import tempfile
import threading

import pytest

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.query_server import QueryServer, _ask, _client, open_store


@pytest.fixture(scope="module")
def served_index(spark, sf_dir):
    from clucene_spark.index.segments import build_segments_fused

    idx = tempfile.mkdtemp(prefix="qsrv_idx_")
    shutil.rmtree(idx, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    build_segments_fused(docs, idx, docs_per_segment=128,
                         analyzer="whitespace")
    yield idx
    shutil.rmtree(idx, ignore_errors=True)


def test_manifest_stats_match_spark_stats(spark, served_index):
    """open_store derives (n_docs, avgdl) from committed per-segment
    metrics; it must equal the Spark doc_lens aggregation exactly on
    n_docs and to float precision on avgdl."""
    from clucene_spark.index.segments import SegmentStore

    st_spark = SegmentStore(spark, served_index)
    n_s, avg_s = st_spark.stats()
    st_local = open_store(served_index)
    n_l, avg_l = st_local._stats
    assert n_l == n_s
    assert abs(avg_l - avg_s) < 1e-9


def test_server_rank_identical_to_local_and_direct(spark, served_index):
    """Hits through the socket == wand_query_local == wand_query_direct
    (collected), for OR and AND over head terms."""
    from clucene_spark.index.segments import SegmentStore
    from clucene_spark.search.wand import wand_query_direct, wand_query_local

    store_local = open_store(served_index)
    srv = QueryServer(("127.0.0.1", 0), store_local)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    sock = _client(host, port)
    try:
        assert _ask(sock, {"cmd": "ping"}) == {"ok": True}
        st = _ask(sock, {"cmd": "stats"})
        assert st["n_docs"] == store_local._stats[0]

        store_spark = SegmentStore(spark, served_index)
        for terms, mode in [
            (["spark", "vector", "window"], "OR"),
            (["spark", "join"], "AND"),
            (["nonexistent_zz_term"], "OR"),
        ]:
            resp = _ask(sock, {"terms": terms, "k": 10, "mode": mode})
            got = [(d, s) for d, s in resp["hits"]]
            want_local = wand_query_local(
                store_local, terms, k=10, mode=mode
            )
            assert got == [(int(d), float(s)) for d, s in want_local]
            want_direct = [
                (r["doc_id"], r["score"])
                for r in wand_query_direct(
                    store_spark, terms, k=10, mode=mode
                ).collect()
            ]
            assert got == want_direct, (terms, mode)

        # malformed request reports an error and the connection survives
        assert "error" in _ask(sock, {"k": 10})
        assert _ask(sock, {"cmd": "ping"}) == {"ok": True}
    finally:
        sock.close()
        srv.shutdown()


def test_serve_cache_hits_negatives_and_eviction(spark, served_index):
    """The per-(segment, term) decoded-postings LRU: repeat queries are
    rank-identical and skip the parquet read entirely (negative entries
    make the term set fully known); a tiny budget forces eviction and
    the bookkeeping stays consistent."""
    from clucene_spark.search.wand import wand_query_local

    store = open_store(served_index)
    r1 = wand_query_local(store, ["spark", "zz_missing"], k=5)
    cache = store._serve_cache
    n_seg = len(store.manifest["segments"])
    # every (segment, term) pair is now known — hit or negative
    assert len(cache) == 2 * n_seg
    assert any(v is None for v in cache.values())  # zz_missing negatives
    before = store._serve_cache_postings
    r2 = wand_query_local(store, ["spark", "zz_missing"], k=5)
    assert r1 == r2
    assert store._serve_cache_postings == before  # pure cache hit

    # eviction: a 1-posting budget evicts everything decoded, but the
    # query must still answer from the values it decoded THIS call —
    # an eviction must never masquerade as a "term absent" negative
    # (regression: the entries snapshot used to re-read the cache after
    # the budget loop, returning [] for any working set over budget)
    store2 = open_store(served_index)
    store2._serve_cache_budget = 1
    r_tiny = wand_query_local(store2, ["spark"], k=5)
    assert store2._serve_cache_postings <= 1
    assert r_tiny  # non-empty…
    assert r_tiny == wand_query_local(store, ["spark"], k=5)  # …and exact
    # still correct and stable after eviction (re-reads transparently)
    assert wand_query_local(store2, ["spark"], k=5) == r_tiny


def test_concurrent_clients_consistent(spark, served_index):
    """Reference-parity concurrency drill (TestReuters.cpp:180-220 runs
    10 threads x 300 queries against one searcher): 10 client threads
    fire mixed OR/AND queries at one server; every response must succeed
    and equal the single-threaded answer — the shared decoded-postings
    cache must be race-free."""
    import queue

    store = open_store(served_index)
    srv = QueryServer(("127.0.0.1", 0), store)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    mix = [
        (["spark"], "OR"), (["spark", "join"], "AND"),
        (["vector", "window"], "OR"), (["table"], "OR"),
        (["spark", "vector", "window"], "OR"),
    ]
    expected = {}
    sock = _client(host, port)
    for terms, mode in mix:
        expected[(tuple(terms), mode)] = _ask(
            sock, {"terms": terms, "k": 10, "mode": mode}
        )["hits"]
    sock.close()

    errors: "queue.Queue" = queue.Queue()

    def client(n_queries=30):
        try:
            s = _client(host, port)
            for i in range(n_queries):
                terms, mode = mix[i % len(mix)]
                resp = _ask(s, {"terms": terms, "k": 10, "mode": mode})
                assert resp["hits"] == expected[(tuple(terms), mode)], (
                    terms, mode)
            s.close()
        except Exception as e:  # surface across the thread boundary
            errors.put(e)

    threads = [threading.Thread(target=client) for _ in range(10)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(60)
    srv.shutdown()
    assert errors.empty(), list(errors.queue)[:3]


def test_once_mode_subprocess(served_index):
    """--once answers one query without a server loop (and without any
    JVM: the subprocess env drops JAVA_HOME to prove no Spark spin-up)."""
    import subprocess
    import sys as _sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAVA_HOME", "SPARK_HOME")}
    out = subprocess.run(
        [_sys.executable, os.path.join(
            os.path.dirname(__file__), "..", "tools", "query_server.py"),
         served_index, "--once", json.dumps({"terms": ["spark"], "k": 5})],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    hits = json.loads(out.stdout.strip().splitlines()[-1])["hits"]
    assert len(hits) == 5
    assert all(isinstance(d, int) for d, _ in hits)


def test_worker_cache_budget_accounting_symmetric(served_index, monkeypatch):
    """The per-worker decoded-postings LRU must charge and credit the SAME
    amount per entry (regression: positional entries charged sum(tf) but
    refunded df on eviction, leaking the counter until the cache thrashed
    empty on every call). Invariant after any sequence of reads: the
    counter equals the sum of charges of the entries actually resident."""
    import clucene_spark.search.wand as W

    seg_root = os.path.join(served_index, "segments")
    seg = sorted(os.listdir(seg_root))[0]
    path = os.path.join(seg_root, seg, "postings.parquet")

    def resident():
        return sum(W._entry_postings(v) for v in W._WORKER_CACHE.values())

    monkeypatch.setattr(W, "_WORKER_CACHE", None)
    monkeypatch.setattr(W, "_WORKER_CACHE_BUDGET", 1)
    # monkeypatch restores the cache DICT on teardown, so the counter
    # must be restored to its matching pre-test value, not zeroed —
    # otherwise counter and resident entries disagree for later tests
    saved_n = W._WORKER_CACHE_N[0]
    W._WORKER_CACHE_N[0] = 0
    try:
        # positional read under a 1-posting budget: the entry is decoded,
        # returned from the in-hand value, then evicted — counter must
        # return exactly to the resident sum (0 or a lone negative)
        out = W._segment_entries(path, ["spark", "zz_missing"],
                                 with_positions=True)
        assert out["spark"] is not None and out["zz_missing"] is None
        assert W._WORKER_CACHE_N[0] == resident()
        # repeated mixed positional/WAND reads never accumulate phantom
        # charge (the leak compounded per evicted entry)
        for _ in range(4):
            W._segment_entries(path, ["spark"], with_positions=True)
            W._segment_entries(path, ["spark"], with_positions=False)
            assert W._WORKER_CACHE_N[0] == resident()
        assert W._WORKER_CACHE_N[0] <= max(1, W._WORKER_CACHE_BUDGET)
    finally:
        W._WORKER_CACHE_N[0] = saved_n
