"""Kill/restart resumability drill (BASELINE.md target row).

Proves the checkpoint/manifest protocol survives a hard death, not just
a polite re-run: start a real spark-submit-style build subprocess,
SIGKILL it mid-build (once roughly half the per-file segment
checkpoints exist), re-run the identical command to completion, and
verify the recovered index is LOGICALLY IDENTICAL to an uninterrupted
control build of the same input — same committed doc ranges, and the
same (term, df, cf, positions) relation, compared via a sorted hash
over both stores' postings with DuckDB.

    python tools/kill_restart_drill.py [--n-docs 200000] [--record]

Prints one JSON line with phase timings, where the kill landed, how
many segments each phase built, and the equality verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build_cmd(corpus: str, index_dir: str) -> list[str]:
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from clucene_spark.session import get_spark\n"
        "from clucene_spark.index.segments import build_segments_direct\n"
        "spark = get_spark('drill_build', master='local[4]')\n"
        "build_segments_direct(spark, %r, %r, analyzer='standard',"
        " resume=True)\n" % (REPO, corpus, index_dir)
    )
    return [sys.executable, "-c", code]


def _n_ckpts(index_dir: str) -> int:
    d = os.path.join(index_dir, "checkpoints")
    return len(os.listdir(d)) if os.path.isdir(d) else 0


def _store_hash(con, index_dir: str) -> tuple[int, int, str]:
    """(n_docs_committed, n_terms, value-hash) over the LIVE manifest's
    postings — the logical-index fingerprint."""
    from clucene_spark.index.segments import read_manifest

    m = read_manifest(index_dir)
    segs = sorted(s["name"] for s in m["segments"])
    paths = [
        os.path.join(index_dir, "segments", s, "postings.parquet")
        for s in segs
    ]
    files = "[" + ",".join("'%s'" % p for p in paths) + "]"
    row = con.execute(
        "SELECT count(*), md5(string_agg(h, '' ORDER BY h)) FROM ("
        "  SELECT md5(term || ':' || df || ':' || cf || ':' ||"
        "             hash(doc_blob)::VARCHAR || ':' ||"
        "             hash(tf_blob)::VARCHAR || ':' ||"
        "             coalesce(hash(pos_blob)::VARCHAR, '-')) AS h"
        f"  FROM read_parquet({files}))"
    ).fetchone()
    n_docs = sum(int(s["n_docs"]) for s in m["segments"])
    return n_docs, int(row[0]), row[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=None,
                    help="corpus size (default: reuse the 2M scaling "
                         "corpus if already materialized, else 200k)")
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    import tempfile

    from tools.scaling_bench import materialize_corpus

    if args.n_docs is not None:
        n_docs = args.n_docs  # explicit flag always wins
    elif os.path.isdir(os.path.join(
            tempfile.gettempdir(), "scale_corpus_messy_2000000_p128.parquet")):
        n_docs = 2_000_000  # free: the scaling bench already built it
    else:
        n_docs = 200_000
    corpus_full = materialize_corpus(n_docs)
    # use a bounded file subset so the drill is fast regardless
    files = sorted(
        os.path.join(corpus_full, f) for f in os.listdir(corpus_full)
        if f.endswith(".parquet")
    )[:16]
    corpus = "/dev/shm/drill_corpus" if os.path.isdir("/dev/shm") else "/tmp/drill_corpus"
    shutil.rmtree(corpus, ignore_errors=True)
    os.makedirs(corpus)
    for f in files:
        shutil.copy(f, corpus)

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    idx_victim = os.path.join(base, "drill_idx_victim")
    idx_control = os.path.join(base, "drill_idx_control")
    for d in (idx_victim, idx_control):
        shutil.rmtree(d, ignore_errors=True)

    # phase 1: start the victim build, SIGKILL at ~half the checkpoints
    t0 = time.perf_counter()
    proc = subprocess.Popen(_build_cmd(corpus, idx_victim),
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    target = len(files) // 2
    killed_at = None
    while proc.poll() is None:
        n = _n_ckpts(idx_victim)
        if n >= target:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            killed_at = n
            break
        time.sleep(0.05)
    t_kill = round(time.perf_counter() - t0, 2)
    if killed_at is None:
        raise SystemExit(
            "build finished before the kill target — raise --n-docs"
        )

    # phase 2: rerun the IDENTICAL command to completion (resume path)
    t0 = time.perf_counter()
    rc = subprocess.run(_build_cmd(corpus, idx_victim)).returncode
    t_resume = round(time.perf_counter() - t0, 2)
    assert rc == 0, "resume run failed"

    # control: uninterrupted build of the same input
    t0 = time.perf_counter()
    rc = subprocess.run(_build_cmd(corpus, idx_control)).returncode
    t_control = round(time.perf_counter() - t0, 2)
    assert rc == 0, "control build failed"

    import duckdb

    con = duckdb.connect()
    nd_v, nt_v, h_v = _store_hash(con, idx_victim)
    nd_c, nt_c, h_c = _store_hash(con, idx_control)
    resumed_ckpts = _n_ckpts(idx_victim)

    result = {
        "metric": "kill_restart_drill",
        "identical": bool(nd_v == nd_c and nt_v == nt_c and h_v == h_c),
        "n_files": len(files),
        "killed_after_ckpts": killed_at,
        "ckpts_after_resume": resumed_ckpts,
        "n_docs": nd_v,
        "n_term_rows": nt_v,
        "postings_hash": h_v,
        "control_hash": h_c,
        "kill_phase_sec": t_kill,
        "resume_sec": t_resume,
        "control_sec": t_control,
        "note": "SIGKILL mid-build; rerun of the identical command "
                "resumes from per-file checkpoints (footer-stats range "
                "pruning) and commits a manifest logically identical to "
                "an uninterrupted build — same doc ranges, same "
                "(term, df, cf, blobs) relation hash",
        "measured_unix": time.time(),
    }
    print(json.dumps(result))
    for d in (idx_victim, idx_control, corpus):
        shutil.rmtree(d, ignore_errors=True)
    if args.record:
        path = os.path.join(REPO, "BENCH", "kill_restart.json")
        hist = []
        if os.path.exists(path):
            hist = json.load(open(path))
        hist.append(result)
        json.dump(hist, open(path, "w"), indent=1)
    if not result["identical"]:
        raise SystemExit("DRILL FAILED: recovered index != control")


if __name__ == "__main__":
    main()
