"""No-JVM fleet isolation probe: does the BUILD KERNEL itself scale?

Runs the IDENTICAL per-file kernel the direct bulk plan runs (pyarrow
parquet read -> _analyze_docs_codes -> _invert_encode_codes -> parquet
write) with ZERO Spark and ZERO JVM, via plain multiprocessing:

  * solo:  one 4-worker pool, taskset-pinned to 4 cores, over a 1/4
    file shard (a "cluster node" alone on its socket);
  * fleet: four such pools concurrently, disjoint 4-core pins, disjoint
    file shards (the 16-core fleet).

scaling(4->16) = (fleet docs/s) / (4 x solo-node docs/s-per-node-alone)
is the pure-host number: no scheduler, no Arrow socket, no JVM — any
loss left is memory bandwidth / LLC / turbo, the part a real 4-socket
cluster does not pay. The r4 epoch measured ~0.94 here while the Spark
fleet's raw read ~0.71 in the same windows (BENCH/BASELINE.md); this
tool re-runs that isolation for the current kernel epoch.

    python tools/nojvm_fleet_probe.py [--n-docs 2000000] [--record]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import os, sys, time, json
sys.path.insert(0, %(repo)r)
os.environ["OMP_NUM_THREADS"] = "1"
import numpy as np, pyarrow as pa, pyarrow.parquet as pq
try:
    pa.set_cpu_count(1); pa.set_io_thread_count(1)
except Exception:
    pass
from multiprocessing import Pool
from clucene_spark.index.segments import (
    _analyze_docs_codes, _invert_encode_codes)

def one_file(path):
    tab = pq.read_table(path, columns=["doc_id", "text"])
    ids = tab.column("doc_id").to_numpy().astype(np.int64)
    texts = tab.column("text").combine_chunks()
    codes, uniq, p, counts = _analyze_docs_codes(texts, "standard")
    seg_tab, uniq_docs, dl, n_tok, n_post = _invert_encode_codes(
        ids, codes, uniq, p, counts, True)
    out = %(outdir)r + "/" + os.path.basename(path)
    pq.write_table(seg_tab, out)
    return len(ids)

if __name__ == "__main__":
    files = json.loads(sys.argv[1])
    with Pool(4) as pool:          # 4 workers == the 4 pinned cores
        pool.map(one_file, files[:1])   # warm (imports + JIT), 1 file
        t0 = time.perf_counter()
        n = sum(pool.map(one_file, files))
        dt = time.perf_counter() - t0
    print(json.dumps({"n_docs": n, "sec": dt}))
"""


def _run_node(files: list[str], cpus: str, outdir: str) -> dict:
    os.makedirs(outdir, exist_ok=True)
    code = WORKER % {"repo": REPO, "outdir": outdir}
    out = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", code,
         json.dumps(files)],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit("node failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=2_000_000)
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    from tools.scaling_bench import materialize_corpus

    corpus = materialize_corpus(args.n_docs)
    files = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )
    shards = [files[i::4] for i in range(4)]
    pins = ["0-3", "4-7", "8-11", "12-15"]
    base = "/dev/shm/nojvm_probe" if os.path.isdir("/dev/shm") else "/tmp/nojvm_probe"

    # solo: node 0 alone on the box
    solo = _run_node(shards[0], pins[0], f"{base}/solo")
    solo_dps = solo["n_docs"] / solo["sec"]

    # fleet: all four concurrently
    procs = []
    t0 = time.perf_counter()
    for i in range(4):
        code = WORKER % {"repo": REPO, "outdir": f"{base}/fleet{i}"}
        os.makedirs(f"{base}/fleet{i}", exist_ok=True)
        procs.append(subprocess.Popen(
            ["taskset", "-c", pins[i], sys.executable, "-c", code,
             json.dumps(shards[i])],
            stdout=subprocess.PIPE, text=True,
        ))
    nodes = []
    for p in procs:
        out, _ = p.communicate()
        nodes.append(json.loads(out.strip().splitlines()[-1]))
    wall = time.perf_counter() - t0
    fleet_docs = sum(n["n_docs"] for n in nodes)
    fleet_dps = fleet_docs / wall

    eff = fleet_dps / (4 * solo_dps)
    result = {
        "metric": "nojvm_fleet_scaling",
        "value": round(eff, 4),
        "unit": "fraction",
        "n_docs": args.n_docs,
        "solo_node_docs_per_sec": round(solo_dps, 1),
        "fleet_docs_per_sec": round(fleet_dps, 1),
        "fleet_wall_sec": round(wall, 2),
        "node_secs": [round(n["sec"], 2) for n in nodes],
        "topology": "4x 4-core pinned multiprocessing pools, no JVM",
        "kernel": "pyarrow read -> chunk-routed analyze -> int32 invert "
                  "-> parquet write (identical to the direct plan task)",
        "measured_unix": time.time(),
    }
    print(json.dumps(result))
    import shutil
    shutil.rmtree(base, ignore_errors=True)
    if args.record:
        path = os.path.join(REPO, "BENCH", "nojvm_probe.json")
        hist = []
        if os.path.exists(path):
            hist = json.load(open(path))
        hist.append(result)
        json.dump(hist, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
