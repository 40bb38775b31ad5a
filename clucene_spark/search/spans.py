"""Span queries: position-interval algebra over the token table.

The reference's span family (src/core/CLucene/search/spans/*, ~2200 LoC:
SpanTermQuery, SpanFirstQuery, SpanNearQuery with slop+inOrder via
NearSpansOrdered/Unordered, SpanNotQuery, SpanOrQuery) restated as
DataFrame algebra: a *span stream* is a DataFrame (doc_id, s, e) of
half-open position intervals [s, e). First/Or/Not compose as join/union
interval arithmetic — exactly the shape Catalyst optimizes. Near runs
the reference's ITERATOR algorithms per doc (near_spans_ordered /
near_spans_unordered, Arrow-batched): NearSpansOrdered emits only the
shrunk shortest match per window and consumes clause spans as it goes,
so a declarative cross join of in-slop combinations would over-count
pfreq — r5 replaced the join form after a review caught the divergence.

Scoring follows the span-scorer model exactly: freq(doc) = Σ over
matching spans of sloppy_freq(matchLength) with the RAW interval width
matchLength = e - s (SpanScorer::setFreqCurrentDoc, SpanScorer.cpp:70-75),
payoff 1/(matchLength + 1) (Similarity::sloppyFreq, Similarity.cpp:223-225),
then the standard BM25/classic tf pipeline — mirroring
SpanWeight/SpanScorer. Note the reference does NOT subtract the tightest
possible width: a single-term span has matchLength 1 and payoff 1/2 —
that 1/2 is what produces the 1/sqrt(2) factor in the TestSpansAdvanced2
golden scores (e.g. 0.35355338 = sqrt(0.5) * 0.5), which pin this choice.

Span streams compose arbitrarily: near(or(a,b), c), not(near(...), d), …
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from clucene_spark.index.build import InvertedIndex
from clucene_spark.search import similarity as sim


# ---------------------------------------------------------------------------
# span query AST
# ---------------------------------------------------------------------------

@dataclass
class SpanQuery:
    pass


@dataclass
class SpanTerm(SpanQuery):
    term: str = ""


@dataclass
class SpanFirst(SpanQuery):
    """Matches spans of `query` ending at position <= n (SpanFirstQuery)."""
    query: Optional[SpanQuery] = None
    end: int = 0


@dataclass
class SpanNear(SpanQuery):
    """All clause spans within `slop` unmatched positions, optionally in
    order (SpanNearQuery.h:34-37). Composite span = [min s, max e)."""
    clauses: list = field(default_factory=list)
    slop: int = 0
    in_order: bool = True


@dataclass
class SpanOr(SpanQuery):
    clauses: list = field(default_factory=list)


@dataclass
class SpanNot(SpanQuery):
    """Spans of `include` that do NOT overlap any span of `exclude`."""
    include: Optional[SpanQuery] = None
    exclude: Optional[SpanQuery] = None


# ---------------------------------------------------------------------------
# compiler: SpanQuery -> DataFrame (doc_id, s, e)
# ---------------------------------------------------------------------------

def span_terms(q: SpanQuery) -> list[str]:
    """All weighed terms under a span query — SpanQuery::extractTerms
    (reference spans/SpanWeight.cpp:26-28; SpanNot excludes don't weigh)."""
    if isinstance(q, SpanTerm):
        return [q.term]
    if isinstance(q, SpanFirst):
        return span_terms(q.query)
    if isinstance(q, (SpanOr, SpanNear)):
        return [t for c in q.clauses for t in span_terms(c)]
    if isinstance(q, SpanNot):
        return span_terms(q.include)  # exclude doesn't weigh
    raise TypeError(type(q))


def _ordered_before(s1: int, e1: int, s2: int, e2: int) -> bool:
    """docSpansOrdered (NearSpansOrdered.cpp:171-175): span1 before span2
    by start, ties by SHORTER end. Overlap is allowed — ordered-ness is
    about starts, and only non-overlapping gaps add slop."""
    return e1 < e2 if s1 == s2 else s1 < s2


def near_spans_ordered(lists: list, slop: int) -> list:
    """Per-doc NearSpansOrdered walk (reference NearSpansOrdered.cpp:
    advanceAfterOrdered = stretchToOrder + shrinkToAfterShortestMatch).

    lists[i] = clause i's spans [(s, e), ...] in ONE doc, sorted by
    (s, e) — the docSpansOrdered stream order. Returns the emitted
    (start, end) matches in enumeration order; SpanScorer sums a payoff
    per emitted match, so this is a multiset, and each match is the
    SHRUNK shortest form for its window — a cross join of all in-slop
    clause combinations would inflate pfreq."""
    n = len(lists)
    idx = [0] * n
    lens = [len(L) for L in lists]
    if any(m == 0 for m in lens):
        return []
    out: list = []
    in_same = True
    while in_same:
        # stretchToOrder: advance each clause until ordered after its
        # predecessor's CURRENT span
        for i in range(1, n):
            while not _ordered_before(
                lists[i - 1][idx[i - 1]][0], lists[i - 1][idx[i - 1]][1],
                lists[i][idx[i]][0], lists[i][idx[i]][1],
            ):
                idx[i] += 1
                if idx[i] >= lens[i]:
                    in_same = False
                    break
            if not in_same:
                break
        if not in_same:
            break
        # shrinkToAfterShortestMatch: walk backwards from the last
        # clause, advancing each earlier clause to its LAST span still
        # before the successor — the shortest match for this window.
        # The advances persist (iterators are shared), which is what
        # makes each clause span participate in at most one match.
        match_start, match_end = lists[n - 1][idx[n - 1]]
        match_slop = 0
        last_s, last_e = match_start, match_end
        for i in range(n - 2, -1, -1):
            prev_s, prev_e = lists[i][idx[i]]
            while True:
                idx[i] += 1
                if idx[i] >= lens[i]:
                    in_same = False
                    break  # final match below still counts
                pp_s, pp_e = lists[i][idx[i]]
                if not _ordered_before(pp_s, pp_e, last_s, last_e):
                    break
                prev_s, prev_e = pp_s, pp_e
            if match_start > prev_e:  # only non-overlap adds slop
                match_slop += match_start - prev_e
            match_start = prev_s
            last_s, last_e = prev_s, prev_e
        if match_slop <= slop:
            out.append((match_start, match_end))
    return out


def near_spans_unordered(lists: list, slop: int) -> list:
    """Per-doc NearSpansUnordered walk (reference NearSpansUnordered.cpp:
    a cell queue ordered by docSpansOrdered; every configuration with
    max.end - min.start - totalLength <= slop emits (min.start, max.end),
    then the min cell advances; stops when any cell exhausts)."""
    n = len(lists)
    idx = [0] * n
    if any(len(L) == 0 for L in lists):
        return []
    out: list = []
    while True:
        cur = [lists[i][idx[i]] for i in range(n)]
        total_len = sum(e - s for s, e in cur)
        max_end = max(e for _, e in cur)
        mi = min(range(n), key=lambda i: (cur[i][0], cur[i][1]))
        min_s = cur[mi][0]
        if max_end - min_s - total_len <= slop:
            out.append((min_s, max_end))
        idx[mi] += 1
        if idx[mi] >= len(lists[mi]):
            return out


class SpanSearcher:
    def __init__(self, index: InvertedIndex, similarity: str = "bm25",
                 field: Optional[str] = None):
        """`field` selects the span field on a multi-field index — the
        reference's SpanQuery::getField contract (spans/SpanQuery.h): a
        span tree lives entirely in ONE field, and all stats (df, dl,
        avgdl, n_docs) are that field's. Single-field indexes ignore it;
        a fielded index requires it."""
        self.index = index
        self.similarity = similarity
        self._stats: Optional[tuple[int, float]] = None
        fielded = "field" in index.postings.columns
        if fielded:
            if field is None:
                field = getattr(index, "default_field", None)
                if field is None:
                    raise ValueError(
                        "fielded index: SpanSearcher needs a field"
                    )
            self._postings = index.postings.filter(
                F.col("field") == field
            ).drop("field")
            self._doc_lens = index.doc_lens.filter(
                F.col("field") == field
            ).drop("field")
            self._term_dict = index.term_dict.filter(
                F.col("field") == field
            ).drop("field")
        else:
            self._postings = index.postings
            self._doc_lens = index.doc_lens
            self._term_dict = index.term_dict
        self.field = field

    @property
    def n_docs(self) -> int:
        return self._corpus_stats()[0]

    @property
    def avgdl(self) -> float:
        return self._corpus_stats()[1]

    def _corpus_stats(self) -> tuple[int, float]:
        """Lazy (n_docs, avgdl): span-stream-only uses (filters, the
        engine's SpanScoreQuery path) never pay the stats job."""
        if self._stats is None:
            row = self._doc_lens.agg(
                F.count("*").alias("n"), F.avg("dl").alias("avgdl")
            ).collect()[0]
            self._stats = (int(row["n"]), float(row["avgdl"] or 1.0))
        return self._stats

    def spans(self, q: SpanQuery) -> DataFrame:
        """Compile to the (doc_id, s, e) span stream."""
        if isinstance(q, SpanTerm):
            return (
                self._postings.filter(F.col("term") == q.term)
                .select("doc_id", F.explode("positions").alias("s"))
                .select("doc_id", "s", (F.col("s") + 1).alias("e"))
            )
        if isinstance(q, SpanFirst):
            return self.spans(q.query).filter(F.col("e") <= q.end)
        if isinstance(q, SpanOr):
            out = None
            for c in q.clauses:
                df = self.spans(c)
                out = df if out is None else out.unionByName(df)
            return out.distinct()
        if isinstance(q, SpanNot):
            inc = self.spans(q.include)
            exc = self.spans(q.exclude).select(
                "doc_id", F.col("s").alias("xs"), F.col("e").alias("xe")
            )
            overlap = (F.col("s") < F.col("xe")) & (F.col("xs") < F.col("e"))
            bad = inc.join(exc, "doc_id").filter(overlap).select("doc_id", "s", "e")
            return inc.join(bad, ["doc_id", "s", "e"], "left_anti")
        if isinstance(q, SpanNear):
            return self._near(q)
        raise TypeError(f"unknown span query: {type(q)}")

    def _near(self, q: SpanNear) -> DataFrame:
        """n-way near via the faithful per-doc iterator walks
        (near_spans_ordered / near_spans_unordered — reference
        NearSpansOrdered.cpp / NearSpansUnordered.cpp). A declarative
        cross join of all in-slop clause combinations would emit
        NON-MINIMAL matches the reference iterators never produce,
        inflating pfreq whenever clause terms co-occur more than once
        within slop. Clause span lists are collected per doc (sorted to
        the docSpansOrdered stream order) and the walk runs Arrow-batched;
        the emitted matches are a multiset — SpanScorer pays per match."""
        if len(q.clauses) < 2:
            # NearSpansOrdered.cpp:36-43 throws IllegalArgument
            raise ValueError(f"SpanNear needs >= 2 clauses: {q!r}")
        dfs = []
        for i, c in enumerate(q.clauses):
            dfs.append(
                self.spans(c)
                .groupBy("doc_id")
                .agg(F.sort_array(
                    F.collect_list(F.struct("s", "e"))).alias(f"sp{i}"))
            )
        joined = dfs[0]
        for df in dfs[1:]:
            joined = joined.join(df, "doc_id")
        n = len(q.clauses)
        slop = int(q.slop)
        walk = near_spans_ordered if q.in_order else near_spans_unordered

        @F.pandas_udf("array<struct<s: long, e: long>>")
        def _walk(*cols):
            # one column per clause (NOT F.array(...): clause lists are
            # ragged and the array-of-arrays arrow conversion rejects
            # inhomogeneous shapes)
            import pandas as pd

            return pd.Series(
                [
                    walk(
                        [[(int(x["s"]), int(x["e"])) for x in L]
                         for L in row],
                        slop,
                    )
                    for row in zip(*cols)
                ]
            )

        return (
            joined.select(
                "doc_id",
                F.explode(
                    _walk(*[F.col(f"sp{i}") for i in range(n)])
                ).alias("m"),
            )
            .select("doc_id", F.col("m.s").alias("s"), F.col("m.e").alias("e"))
        )

    # -- scoring ------------------------------------------------------------

    def _collect_terms(self, q: SpanQuery) -> list[str]:
        return span_terms(q)

    def score(self, q: SpanQuery) -> DataFrame:
        """(doc_id, score): sloppyFreq over spans -> tf pipeline (the
        SpanWeight/SpanScorer path). Derived from explain() so the
        explanation invariant holds structurally."""
        return self.explain(q).select("doc_id", "score")

    def explain(self, q: SpanQuery) -> DataFrame:
        """Score-component breakdown for any span query — the
        SpanWeight::explain analogue (reference search/spans/SpanWeight.cpp:
        payload-free branch: value = idf * tf(sloppyFreq) * norm).

        Columns: (doc_id, pfreq, dl, idf, tf_comp, norm, score). Invariant
        (the TestSpanExplanations contract): the product of the listed
        components equals score(q) for every matching doc —
          bm25:    idf_sum * tf_comp               == score
          classic: sqrt(pfreq) * idf^2 * norm      == score
        """
        # raw matchLength = e - s, NOT width-adjusted (SpanScorer.cpp:70-75)
        payoff = 1.0 / ((F.col("e") - F.col("s")) + 1.0)
        freqs = self.spans(q).groupBy("doc_id").agg(F.sum(payoff).alias("pfreq"))
        terms = sorted(set(self._collect_terms(q)))
        td = {
            r["term"]: int(r["df"])
            for r in self._term_dict.filter(F.col("term").isin(terms)).collect()
        }
        rows = freqs.join(self._doc_lens, "doc_id")
        if self.similarity == "bm25":
            idf_sum = sum(
                sim.bm25_idf_py(td.get(t, 0), self.n_docs) for t in terms
            )
            tf_comp = sim.bm25_tf(F.col("pfreq"), F.col("dl"), F.lit(self.avgdl))
            return rows.select(
                "doc_id", "pfreq", "dl",
                F.lit(idf_sum).alias("idf"),
                tf_comp.alias("tf_comp"),
                F.lit(1.0).alias("norm"),
                (F.lit(idf_sum) * tf_comp).alias("score"),
            )
        idf_sum = sum(
            sim.classic_idf_py(td.get(t, 0), self.n_docs) for t in terms
        )
        tf_comp = F.sqrt(F.col("pfreq"))
        norm = 1.0 / F.sqrt(F.col("dl"))
        return rows.select(
            "doc_id", "pfreq", "dl",
            F.lit(idf_sum).alias("idf"),
            tf_comp.alias("tf_comp"),
            norm.alias("norm"),
            (tf_comp * F.lit(idf_sum * idf_sum) * norm).alias("score"),
        )

    def topk(self, q: SpanQuery, k: int = 10, round_to: int | None = None) -> DataFrame:
        s = self.score(q)
        if round_to is not None:
            s = s.select("doc_id", F.round("score", round_to).alias("score"))
        return s.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
