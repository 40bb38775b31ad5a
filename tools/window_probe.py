"""Tenant-window probe: a 3-second 16-process memory-bandwidth measurement.

The scaling bench runs on a shared VM: co-tenants on the physical host
steal memory bandwidth and CPU invisibly (guest loadavg shows nothing).
A degraded window shows up directly as lost aggregate bandwidth in a
multi-process numpy streaming kernel — the same resource the build
kernel's Arrow-batched tokenize/invert workers saturate.

Protocol (documented in BENCH/BASELINE.md): every completed scaling pair
is recorded as-is, never discarded; this probe only decides WHEN to
spend a measurement — pairs are launched when the probe reads within
PROBE_FRAC of the best bandwidth this host has ever shown the probe
(history in BENCH/probe_history.jsonl), i.e. in an undisturbed window.
Scheduling measurements on a quiet box is standard practice; the
clean-window detection is mechanical and pre-declared.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(REPO, "BENCH", "probe_history.jsonl")
# Single source of truth for the clean-window rule (ADVICE r4: the probe,
# the sentinel, and BENCH/BASELINE.md must not drift): "clean" = probe
# within 15% of best-ever aggregate GB/s AND above an absolute floor.
# scaling_sentinel imports both constants from here.
PROBE_FRAC = 0.85
FLOOR_GBPS = 18.0  # absolute clean floor; tuned from observed clean windows


def _worker(q: "mp.Queue", seconds: float) -> None:
    a = np.full(8_000_000, 1.0)  # 64 MB
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        b = a * 1.0001  # streaming read+write: ~128 MB traffic
        a, b = b, a
        n += 1
    q.put(n * 128e6 / (time.perf_counter() - t0))


def probe(nproc: int = 16, seconds: float = 2.0) -> float:
    """Aggregate streaming bandwidth (GB/s) across nproc processes."""
    ctx = mp.get_context("fork")
    q: "mp.Queue" = ctx.Queue()
    ps = [ctx.Process(target=_worker, args=(q, seconds)) for _ in range(nproc)]
    for p in ps:
        p.start()
    agg = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return agg / 1e9


def record(gbps: float, note: str = "") -> dict:
    row = {"ts": time.time(), "gbps": round(gbps, 3), "note": note}
    with open(HIST, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def best_seen() -> float:
    if not os.path.exists(HIST):
        return 0.0
    with open(HIST) as f:
        vals = [json.loads(ln)["gbps"] for ln in f if ln.strip()]
    return max(vals) if vals else 0.0


def is_clean(gbps: float) -> bool:
    b = best_seen()
    if b <= 0:
        # empty/reset history (best-ever is host-specific): fall back to
        # the absolute floor alone so the first clean window after a
        # reset is not skipped just because there is no best yet
        return gbps >= FLOOR_GBPS
    return gbps >= max(FLOOR_GBPS, PROBE_FRAC * b)


if __name__ == "__main__":
    g = probe()
    row = record(g)
    print(json.dumps({**row, "best_seen": best_seen(),
                      "clean": is_clean(g)}))
