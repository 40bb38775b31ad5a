"""Goldens for the reference-faithful SloppyPhraseScorer walk
(clucene_spark/search/sloppy.py vs hand-traces of
reference search/SloppyPhraseScorer.cpp:35-171)."""

import math

from clucene_spark.search.sloppy import repeat_groups, sloppy_phrase_freq


def freq(terms, doc_tokens, slop):
    pos = {}
    for i, t in enumerate(doc_tokens):
        pos.setdefault(t, []).append(i)
    lists = [pos.get(t) for t in terms]
    if any(not p for p in lists):
        return 0.0
    return sloppy_phrase_freq(lists, slop, repeat_groups(terms))


def test_exact_adjacent():
    # "one two"~4 on "one two three": start=end=0 window, mL 0 -> 1.0,
    # then "two" pops, advances out; pending window mL 1-0... trace:
    # pp(one)=0, pp(two)=1-1=0; end 0. pop one(offset0): start 0, next 0;
    # advance -> out -> done; mL 0 -> +1.0
    assert freq(["one", "two"], "one two three".split(), 4) == 1.0


def test_reversed_pair_distance_two():
    # "two one"~2 on "one two three": pp(two)=1, pp(one)=0-1=-1; end=1.
    # pop one: start -1, next 1; advance -> out; mL = 1-(-1) = 2 <= 2
    # -> freq 1/3 (the classic Lucene reversed-adjacent = distance 2)
    assert freq(["two", "one"], "one two three".split(), 2) == 1.0 / 3
    # slop 1 misses it
    assert freq(["two", "one"], "one two three".split(), 1) == 0.0


def test_repeated_term_phrase():
    # "buy buy"~1 on "buy buy buy": init (repeats, desc offset): slot1 ->
    # idx1, slot0 stays idx0. pos0=0, pos1=0, end 0. pop slot0 (tie by
    # offset): start 0, next 0; advance slot0 -> idx1 collides with slot1
    # -> keep advancing -> idx2 (pos 2) differs; exit; mL 0 -> +1.0;
    # end=2. pop slot1 (pos 0): start 0, next 2; advance slot1 -> idx2
    # collides with slot0 -> not differ -> advance -> out -> done; start
    # stayed 0 (collision blocks start update); mL 2 > 1 -> no score.
    assert freq(["buy", "buy"], "buy buy buy".split(), 1) == 1.0
    # the round-2 per-anchor simplification scored this 2.0 — the walk's
    # index-distinctness is what the repeat handling exists for
    assert freq(["buy", "buy"], "buy buy buy".split(), 2) == 1.0 + 1.0 / 3


def test_repeat_needs_enough_occurrences():
    # query has "ho" twice but the doc only once -> init runs out -> 0
    assert freq(["ho", "ho", "my"], "ho my ho".split(), 5) > 0.0
    assert freq(["ho", "ho", "my"], "ho my xx".split(), 5) == 0.0


def test_three_term_spread():
    # "a b c"~2 on "a x b c": pp(a)=0, pp(b)=2-1=1, pp(c)=3-2=1; end 1.
    # pop a: start 0, next 1; a runs out -> done; mL 1 <= 2 -> 1/2
    assert freq(["a", "b", "c"], "a x b c".split(), 2) == 0.5


def test_no_match_when_slop_too_small():
    assert freq(["a", "c"], "a x x c".split(), 1) == 0.0
    assert freq(["a", "c"], "a x x c".split(), 2) == 1.0 / 3


def test_multiple_windows_accumulate():
    # two separated exact occurrences of "k v": each contributes 1.0
    f = freq(["k", "v"], "k v x x k v".split(), 0)
    assert f == 2.0


def test_matches_reference_quirk_single_count():
    # doc "t g t": "t g"~2 — pp(t)=0, pp(g)=1-1=0, end 0.
    # pop t(off0): start 0,next 0; advance t -> pos 2 > 0; exit; mL 0 ->
    # +1.0; end 2. pop g(pos 0): start 0, next 2; g out -> done; mL 2 <=2
    # -> +1/3. total 4/3 (the overlapping-window overcount the reference
    # header comment acknowledges — replicated, not "fixed")
    assert math.isclose(freq(["t", "g"], "t g t".split(), 2), 4.0 / 3)
