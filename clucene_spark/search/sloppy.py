"""Reference-faithful sloppy-phrase frequency.

Port of CLucene's SloppyPhraseScorer window walk to Python, driven per-doc
from position arrays (the engine keeps positions as columns; this is the
semantics kernel both the relational scorer and the segment-store serving
path call, Arrow-batched so no per-row Python crosses an executor
boundary).

Algorithm (reference `search/SloppyPhraseScorer.cpp`):

* Each query slot i is a PhrasePositions pp with offset i over the
  positions of its term; ``pp.position = tp.position - offset`` so an
  exact phrase puts every pp at the same position
  (`search/PhraseScorer.cpp:36-40`).
* ``phraseFreq`` (`SloppyPhraseScorer.cpp:35-70`): a min-priority-queue
  walk — pop the lowest pp, advance it past the next-lowest position
  while tracking the window start, score ``1/(matchLength+1)`` whenever
  ``end - start <= slop`` (`Similarity.cpp:223-225`), stretch ``end``,
  reinsert; finish when any pp runs out (the pending window still
  scores: the `break` lands before the matchLength block).
* PQ order: position, ties by offset (`_PhraseQueue.h:25-35`).
* Repeats (`initPhrasePositions`, `SloppyPhraseScorer.cpp:72-151`): slots
  sharing a term are marked repeating; at init they are advanced —
  highest offset first (`_SloppyPhraseScorer.h:49-51` comparator) — until
  all sit on distinct actual term positions, and during the walk a
  repeating pp keeps advancing while it collides
  (``termPositionsDiffer``, `SloppyPhraseScorer.cpp:153-171`). Running out
  during init means phraseFreq 0 for the doc.

The reference detects repeats once per scorer from the first doc's
initial tp positions; since two pps collide there iff they index the same
term (one token occupies one position in this engine — no
position-increment-0 synonyms), "repeating" reduces to term identity,
which is what we use (deterministic across docs).
"""

from __future__ import annotations

import heapq


def repeat_groups(terms: list[str]) -> list[int] | None:
    """Per-slot repeat marker: repeat_groups(terms)[i] is a group id if
    slot i's term occurs in more than one slot, else -1. Returns None when
    no slot repeats (the fast common case)."""
    by_term: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        by_term.setdefault(t, []).append(i)
    marks = [-1] * len(terms)
    gid = 0
    any_rep = False
    for slots in by_term.values():
        if len(slots) > 1:
            any_rep = True
            for s in slots:
                marks[s] = gid
            gid += 1
    return marks if any_rep else None


def sloppy_phrase_freq(
    position_lists: list, slop: int, repeats: list[int] | None = None
) -> float:
    """phraseFreq for one doc.

    position_lists[i] = sorted term positions of slot i's term in the doc
    (all non-empty — the caller intersects docIDs first). ``repeats`` is
    the repeat_groups() marker for the query's slots (None = no repeated
    terms). Returns the sum of 1/(matchLength+1) payoffs."""
    k = len(position_lists)
    if k == 1:
        # the reference never reaches SloppyPhraseScorer with one slot (a
        # one-term PhraseQuery creates a TermWeight, PhraseQuery.cpp
        # createWeight); the equivalent payoff is 1/(0+1) per occurrence.
        # The PQ walk below would IndexError on an empty queue here.
        return float(len(position_lists[0]))
    T = [list(map(int, p)) for p in position_lists]
    idx = [0] * k
    # pp.position = T[i][idx[i]] - i ; tpPos = T[i][idx[i]]

    def pos(i: int) -> int:
        return T[i][idx[i]] - i

    def tp(i: int) -> int:
        return T[i][idx[i]]

    rep_slots = [i for i in range(k) if repeats and repeats[i] >= 0]

    def differs(i: int) -> bool:
        # termPositionsDiffer: pp i's tp position differs from every other
        # repeating pp's current tp position
        t = tp(i)
        return all(tp(j) != t for j in rep_slots if j != i)

    # init: advance repeating pps (highest offset first) onto distinct
    # actual positions
    if rep_slots:
        for i in sorted(rep_slots, reverse=True):
            while not differs(i):
                idx[i] += 1
                if idx[i] >= len(T[i]):
                    return 0.0  # ran out during init -> no match

    end = max(pos(i) for i in range(k))
    pq = [(pos(i), i) for i in range(k)]
    heapq.heapify(pq)  # (position, offset) — the PhraseQueue order

    freq = 0.0
    done = False
    while not done:
        _, m = heapq.heappop(pq)
        start = pos(m)
        nxt = pq[0][0]
        tps_differ = True
        p = start
        # for (pos = start; pos <= next || !tpsDiffer; pos = pp->position)
        while p <= nxt or not tps_differ:
            if p <= nxt and tps_differ:
                start = p
            idx[m] += 1
            if idx[m] >= len(T[m]):
                done = True  # ran out — the pending window still scores
                break
            tps_differ = (not rep_slots) or repeats[m] < 0 or differs(m)
            p = pos(m)
        match_length = end - start
        if match_length <= slop:
            freq += 1.0 / (match_length + 1)
        if not done:
            if pos(m) > end:
                end = pos(m)
            heapq.heappush(pq, (pos(m), m))
    return freq
