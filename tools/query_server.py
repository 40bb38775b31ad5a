"""Persistent BM25 query server over a committed segment index.

The per-query Spark serving path (`wand_query_direct`) pays a ~1.3s
stage-scheduling floor per query regardless of index size
(BENCH/large_corpus.json: direct p50 1.51s vs in-process 0.25s on the
same 1M-doc index). The right production shape — and CLucene's own
(an IndexSearcher holds open IndexReaders and answers queries in-process,
src/core/CLucene/search/IndexSearcher.cpp) — is a resident process that
holds SegmentStore handles and serves `wand_query_local` per request:
per-segment pyarrow reads (term-filtered, row-group pruned, GIL-released,
fanned over a thread pool) + the block-max WAND scoring loop. Spark owns
the BUILD (distribution, retries, checkpoints, manifest commits); serving
a committed manifest needs no Spark job at all, so this server runs
entirely Spark-free by default:

  * corpus stats (n_docs, avgdl) come from the committed manifest — each
    segment records n_docs and n_tokens at build, so
    avgdl = Σ n_tokens / Σ n_docs exactly (integer sums; pinned against
    the Spark aggregation in tests/test_query_server.py);
  * deletes come from the sidecar file, datasets are memoized pyarrow
    handles, global df sums segment-local dfs from the filtered read.

At 100 TB this is one server per shard-set replica behind any RPC layer,
each holding the manifest generation it serves (commit-point pinning
gives consistent snapshots during concurrent reindex — the segments_N
time-travel contract).

Protocol: JSON lines over TCP (stdlib-only). Request per line:

    {"terms": ["spark", "join"], "k": 10, "mode": "OR"}
    {"cmd": "stats"}            -> server + index info
    {"cmd": "ping"}             -> {"ok": true}

Response per line: {"hits": [[doc_id, score], ...], "took_ms": 1.8}.

Usage:

    python tools/query_server.py INDEX_DIR [--port 7070] [--host 127.0.0.1]
    python tools/query_server.py INDEX_DIR --once '{"terms": ["spark"]}'
    python tools/query_server.py INDEX_DIR --bench --repeat 5
        # starts the server, drives the query_bench head/torso/tail mix
        # through a real client socket, appends {"serving": "server"}
        # rows to BENCH/query_latency.json
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import socketserver
import statistics
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def open_store(index_dir: str, generation: int | None = None):
    """A SegmentStore handle with manifest-derived stats — no SparkSession.

    SegmentStore only uses its `spark` handle for the DataFrame accessors
    and the stats aggregation; the serving path (dataset/deleted_ids/
    manifest) is pure pyarrow + file reads. Pre-seeding `_stats` from the
    manifest keeps every Spark entry point out of the process."""
    from clucene_spark.index.segments import SegmentStore

    store = SegmentStore(None, index_dir, generation=generation)
    segs = store.manifest["segments"]
    if any("n_tokens" not in s or "n_docs" not in s for s in segs):
        raise ValueError(
            "manifest predates n_tokens metrics; serve with --stats spark"
        )
    n_docs = sum(int(s["n_docs"]) for s in segs)
    n_tokens = sum(int(s["n_tokens"]) for s in segs)
    store._stats = (n_docs, (n_tokens / n_docs) if n_docs else 1.0)
    return store


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:
        from clucene_spark.search.wand import wand_query_local

        srv = self.server
        for raw in self.rfile:
            raw = raw.strip()
            if not raw:
                continue
            t0 = time.perf_counter()
            try:
                req = json.loads(raw)
                if req.get("cmd") == "ping":
                    resp = {"ok": True}
                elif req.get("cmd") == "stats":
                    n, avgdl = srv.store._stats
                    resp = {
                        "index_dir": srv.store.index_dir,
                        "generation": srv.store.manifest.get("generation"),
                        "n_segments": len(srv.store.manifest["segments"]),
                        "n_docs": n,
                        "avgdl": round(avgdl, 6),
                        "queries_served": srv.n_served,
                    }
                else:
                    if req.get("field") is not None and srv.store.spark is None:
                        raise ValueError(
                            "fielded queries need per-field stats; start "
                            "the server with --stats spark"
                        )
                    hits = wand_query_local(
                        srv.store,
                        [str(t) for t in req["terms"]],
                        k=int(req.get("k", 10)),
                        mode=str(req.get("mode", "OR")),
                        algo=str(req.get("algo", "taat")),
                        field=req.get("field"),
                        round_to=req.get("round_to", 4),
                    )
                    with srv.served_lock:
                        srv.n_served += 1
                    resp = {
                        "hits": [[int(d), float(s)] for d, s in hits],
                        "took_ms": round(
                            (time.perf_counter() - t0) * 1e3, 3
                        ),
                    }
            except Exception as e:  # report, keep serving
                resp = {"error": f"{type(e).__name__}: {e}"}
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()


class QueryServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, store):
        super().__init__(addr, _Handler)
        self.store = store
        self.n_served = 0
        # handler threads share this counter; unsynchronized += loses
        # increments under concurrent clients
        self.served_lock = threading.Lock()
        # warm the thread-unsafe first touch of every memoized dataset
        # handle (and the OS page cache for footers) before concurrency
        for s in store.manifest["segments"]:
            store.dataset(s["name"])
        store.deleted_ids()


def _client(host: str, port: int) -> socket.socket:
    s = socket.create_connection((host, port))
    s.settimeout(120)
    return s


def _ask(sock: socket.socket, req: dict) -> dict:
    sock.sendall((json.dumps(req) + "\n").encode())
    buf = b""
    while not buf.endswith(b"\n"):
        chunk = sock.recv(65536)
        if not chunk:
            raise ConnectionError("server closed")
        buf += chunk
    return json.loads(buf)


def _bench_terms(store) -> list[str]:
    """Head/torso/tail term mix from the real dictionary — the same bands
    query_bench.py uses, derived via pyarrow (no Spark)."""
    import pyarrow.dataset as pa_ds  # noqa: F401

    import pandas as pd

    parts = []
    for s in store.manifest["segments"]:
        tab = store.dataset(s["name"]).to_table(columns=["term", "df"])
        parts.append(tab.to_pandas())
    agg = (
        pd.concat(parts).groupby("term", as_index=False)["df"].sum()
        .sort_values("df", ascending=False)
    )
    return agg["term"].tolist()


def run_bench(store, host: str, port: int, repeat: int, k: int) -> dict:
    terms = _bench_terms(store)
    head, torso, tail = terms[:8], terms[100:108], terms[2000:2008]
    queries = (
        [("head1_or", [t]) for t in head[:3]]
        + [("torso1_or", [t]) for t in torso[:3]]
        + [("tail1_or", [t]) for t in tail[:3]]
        + [("head2_or", head[0:2]), ("head2_or", head[2:4])]
        + [("mixed3_or", [head[0], torso[0], tail[0]])]
        + [("head2_and", head[0:2]), ("torso2_and", torso[0:2])]
    )
    sock = _client(host, port)
    _ask(sock, {"cmd": "ping"})
    lats: dict[str, list[float]] = {}
    for name, q in queries:
        mode = "AND" if name.endswith("and") else "OR"
        for _ in range(repeat):
            t0 = time.perf_counter()
            resp = _ask(sock, {"terms": q, "k": k, "mode": mode})
            assert "error" not in resp, resp
            lats.setdefault(name, []).append(time.perf_counter() - t0)
    sock.close()
    flat = sorted(x for v in lats.values() for x in v)
    n_docs, _ = store._stats
    return {
        "metric": "bm25_top10_latency_p50",
        "value": round(flat[len(flat) // 2], 4),
        "unit": "sec",
        "p95": round(flat[int(len(flat) * 0.95)], 4),
        "per_class_p50": {
            n: round(statistics.median(v), 4) for n, v in sorted(lats.items())
        },
        "n_docs": n_docs,
        "k": k,
        "repeats": repeat,
        "serving": "server",
        "n_queries": len(queries),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7070)
    ap.add_argument("--generation", type=int, default=None)
    ap.add_argument("--stats", default="manifest",
                    choices=["manifest", "spark"],
                    help="manifest (default, no Spark) derives (n_docs, "
                         "avgdl) from committed per-segment metrics; "
                         "spark runs the doc_lens aggregation once")
    ap.add_argument("--once", metavar="JSON",
                    help="serve one request to stdout and exit")
    ap.add_argument("--bench", action="store_true",
                    help="start the server, drive the head/torso/tail "
                         "query mix through a client socket, append to "
                         "BENCH/query_latency.json")
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    if args.stats == "spark":
        from clucene_spark.index.segments import SegmentStore
        from clucene_spark.session import get_spark

        store = SegmentStore(get_spark("query_server"), args.index_dir,
                             generation=args.generation)
        store.stats()
    else:
        store = open_store(args.index_dir, generation=args.generation)

    if args.once:
        from clucene_spark.search.wand import wand_query_local

        req = json.loads(args.once)
        hits = wand_query_local(
            store, req["terms"], k=int(req.get("k", 10)),
            mode=req.get("mode", "OR"),
        )
        print(json.dumps({"hits": [[int(d), float(s)] for d, s in hits]}))
        return

    srv = QueryServer((args.host, args.port), store)
    host, port = srv.server_address
    if args.bench:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        out = run_bench(store, host, port, args.repeat, args.k)
        print(json.dumps(out))
        hist_path = os.path.join(REPO, "BENCH", "query_latency.json")
        hist = []
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                hist = json.load(f)
        hist.append(out)
        with open(hist_path, "w") as f:
            json.dump(hist, f, indent=1)
        srv.shutdown()
        return
    n, avgdl = store._stats
    print(json.dumps({"serving": f"{host}:{port}",
                      "index_dir": args.index_dir,
                      "n_docs": n, "avgdl": round(avgdl, 4)}), flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
