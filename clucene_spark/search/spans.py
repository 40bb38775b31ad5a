"""Span queries: position-interval algebra over the token table.

The reference's span family (src/core/CLucene/search/spans/*, ~2200 LoC:
SpanTermQuery, SpanFirstQuery, SpanNearQuery with slop+inOrder via
NearSpansOrdered/Unordered, SpanNotQuery, SpanOrQuery) restated as
DataFrame algebra: a *span stream* is a DataFrame (doc_id, s, e) of
half-open position intervals [s, e), and every composite is a join/union
on doc_id with interval arithmetic — exactly the shape Catalyst optimizes.

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
        """n-way near: join clause span streams on doc_id, keep tuples whose
        composite width minus the sum of clause widths <= slop; ordered mode
        additionally requires clause i to end before clause i+1 starts
        (NearSpansOrdered semantics)."""
        dfs = []
        for i, c in enumerate(q.clauses):
            dfs.append(
                self.spans(c).select(
                    "doc_id", F.col("s").alias(f"s{i}"), F.col("e").alias(f"e{i}")
                )
            )
        joined = dfs[0]
        for df in dfs[1:]:
            joined = joined.join(df, "doc_id")
        n = len(q.clauses)
        comp_s = F.least(*[F.col(f"s{i}") for i in range(n)])
        comp_e = F.greatest(*[F.col(f"e{i}") for i in range(n)])
        widths = None
        for i in range(n):
            w = F.col(f"e{i}") - F.col(f"s{i}")
            widths = w if widths is None else widths + w
        slack = (comp_e - comp_s) - widths
        cond = slack <= q.slop
        if q.in_order:
            for i in range(n - 1):
                cond = cond & (F.col(f"e{i}") <= F.col(f"s{i+1}"))
        return (
            joined.filter(cond)
            .select("doc_id", comp_s.alias("s"), comp_e.alias("e"))
            .distinct()
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
                sim.bm25_idf_py(td[t], self.n_docs) for t in terms if t in td
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
            sim.classic_idf_py(td[t], self.n_docs) for t in terms if t in td
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
