"""Probe-gated scaling-pair collector.

Loops: take a 16-process bandwidth probe (tools/window_probe.py); when
the window is clean (probe within PROBE_FRAC of best-ever AND above an
absolute floor), launch ONE adjacent scaling pair via
tools/scaling_bench.py --pairs 1 and record it. Degraded windows are
skipped — the pair is never run, so nothing is discarded; every
completed pair is recorded as-is, same as always.

Rationale (also in BENCH/BASELINE.md): the 4-core low level is rarely
hurt by co-tenants (4 pinned cores still get their bandwidth) but the
16-core fleet level is the direct victim, so degraded-window pairs
measure the co-tenant, not the engine. Scheduling measurements when a
mechanical probe says the box is quiet maximizes information per CPU
hour and is the shared-box analogue of "don't benchmark while pytest
runs".
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.window_probe import (  # noqa: E402
    best_seen, is_clean, probe, record,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_EVERY = 45.0  # seconds between probes while degraded
N_DOCS = 2_000_000


def one_probe() -> float:
    """Median of 3 back-to-back 2s probes — single probes jitter 2x."""
    return statistics.median(probe(16, 2.0) for _ in range(3))


def run_pair(probe_gbps: float) -> int:
    cmd = [sys.executable, os.path.join(REPO, "tools", "scaling_bench.py"),
           "--n-docs", str(N_DOCS), "--low", "4", "--high", "16",
           "--plan", "direct", "--pairs", "1"]
    # tag the recorded pair with its launch regime (ADVICE r4: sentinel-
    # gated and unconditional pairs sample different host states and must
    # be separable in the medians, not silently pooled)
    env = dict(os.environ, SCALING_SENTINEL_PROBE_GBPS=f"{probe_gbps:.3f}")
    return subprocess.run(cmd, cwd=REPO, env=env).returncode


def main() -> None:
    deadline = time.time() + float(sys.argv[1]) * 60 if len(sys.argv) > 1 else None
    pairs_run = 0
    while deadline is None or time.time() < deadline:
        if os.path.exists("/tmp/dev_busy"):
            # foreground dev work (pytest etc.) owns the box — don't
            # probe (it would read degraded) and don't launch pairs
            # (they'd be polluted); wait it out.
            time.sleep(PROBE_EVERY)
            continue
        g = one_probe()
        # single source of truth for the clean-window rule (the sentinel
        # re-implementing it inline is exactly the drift ADVICE r4 flagged)
        clean = is_clean(g)
        record(g, note=f"sentinel clean={clean}")
        print(f"[sentinel] probe={g:.1f} GB/s best={best_seen():.1f} "
              f"clean={clean} pairs_run={pairs_run}", flush=True)
        if clean:
            rc = run_pair(g)
            pairs_run += 1
            print(f"[sentinel] pair #{pairs_run} rc={rc}", flush=True)
        else:
            time.sleep(PROBE_EVERY)


if __name__ == "__main__":
    main()
