"""Regenerate GATES.md (driver-gate rotation ledger) from the entry module
and the per-round CORRECTNESS_r*.json records.

Run after any queries()/oracle_sql()/_GATE_WINDOW change:

    python tools/gen_gates.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# new-gate annotations for the CURRENT round (edit per round)
NEW_THIS_ROUND = {
    "highlight_fragments": "new r4",
    "dedup_window_stats": "new r4",
    "stream_window_stats": "new r4",
    "multimodal_png_stats": "new post-r3",
    "multi_phrase_overlap_topk": "new post-r3",
    "multi_phrase_overlap_repeat_topk": "new post-r3",
}

HEADER = """# GATES — driver-gate rotation ledger

The external driver oracle-checks the FIRST 50 entries of `queries()`
each round (round-2 lesson: silently exceeding 50 un-gates whatever
falls out). Rotation invariant since round 3: **every registered query
must be driver-green within the last two rounds.** Round 3 checked the
pipeline/sloppy/std families (49/50 green, the 50th being the then
rows-only trained-IVF gate, which now has a full frozen-centroid
oracle); round 4 swaps the window to its complement — everything whose
last driver row is round 2 — plus every gate new or code-changed since
the r3 run, plus high-value pins. Demotions are annotated at
`_GATE_WINDOW` in `__spark_entry__.py`;
`tests/test_gate_window.py` pins the policy. `python
tools/check_oracle.py` re-verifies EVERY registered query locally
regardless of window membership.

Legend: green = rows+schema+value-hash all matched that round's driver
run; rows-only = registered without an oracle that round; — = not
checked that round (outside the then-window or not yet registered).

| query | r1 | r2 | r3 | r4 window |
|---|---|---|---|---|
"""


def _status(rec: dict, name: str) -> str:
    if name not in rec:
        return "—"
    r = rec[name]
    if isinstance(r, dict):
        if r.get("err") == "no_oracle":
            return "rows-only"
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match"):
            return "green"
        return "FAIL"
    return "?"


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "entry_gates", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = list(mod.queries())
    window = set(qs[:50])

    recs = []
    for i in (1, 2, 3):
        try:
            recs.append(json.load(open(os.path.join(REPO, f"CORRECTNESS_r0{i}.json"))))
        except FileNotFoundError:
            recs.append({})

    lines = []
    for q in qs:
        s = [_status(r, q) for r in recs]
        if q in window:
            if q in NEW_THIS_ROUND:
                w = f"in ({NEW_THIS_ROUND[q]})"
            elif s[-1] in ("green", "rows-only"):
                w = "in (pinned/changed)"
            else:
                w = "in (stale rotation)"
        else:
            w = "out (r3-green, unchanged)"
        lines.append(f"| {q} | {' | '.join(s)} | {w} |")

    n_in = sum(1 for q in qs if q in window)
    tail = (
        f"\n\nTotals: {len(qs)} registered, {len(mod.oracle_sql())} "
        f"oracle-gated (full SQL oracle), {n_in} in the round-4 window.\n"
    )
    with open(os.path.join(REPO, "GATES.md"), "w") as f:
        f.write(HEADER + "\n".join(lines) + tail)
    print(f"GATES.md: {len(qs)} queries, {n_in} in window")


if __name__ == "__main__":
    main()
