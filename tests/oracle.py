"""Single-node pure-Python reference oracle (FIXTURES.md §B).

A few hundred lines re-implementing the reference semantics directly:
whitespace tokenization -> postings -> ClassicSimilarity / BM25 scoring ->
top-k with the (score DESC, doc_id ASC) tiebreak of
search/HitQueue.cpp:100-105. The Spark engine is asserted rank-identical
against this, mirroring the reference's logical-index-equality oracle
(src/test/testall.cpp:227-345).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from clucene_spark.search import similarity as sim


class PyIndex:
    def __init__(self, rows: list[tuple[int, str]], tokenizer=None):
        tokenize = tokenizer or (lambda t: [w for w in t.split(" ") if w])
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.doc_lens: dict[int, int] = {}
        for doc_id, text in rows:
            toks = tokenize(text)
            self.doc_lens[doc_id] = len(toks)
            pos_by_term: dict[str, list[int]] = defaultdict(list)
            for pos, t in enumerate(toks):
                pos_by_term[t].append(pos)
            for t, ps in pos_by_term.items():
                self.postings[t][doc_id] = ps
        self.n_docs = len(self.doc_lens)
        self.avgdl = (
            sum(self.doc_lens.values()) / self.n_docs if self.n_docs else 1.0
        )

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def term_dict(self) -> list[tuple[str, int, int]]:
        return sorted(
            (t, len(d), sum(len(p) for p in d.values()))
            for t, d in self.postings.items()
        )


class PySearcher:
    def __init__(self, index: PyIndex, similarity: str = "bm25",
                 norm_bytes: bool = False):
        self.ix = index
        self.similarity = similarity
        self.norm_bytes = norm_bytes

    def _lnorm(self, dl: int) -> float:
        if self.norm_bytes:
            return sim.decode_norm(sim.encode_norm(dl))
        return 1.0 / math.sqrt(dl)

    def _idf(self, df: int) -> float:
        if self.similarity == "bm25":
            return sim.bm25_idf_py(df, self.ix.n_docs)
        return sim.classic_idf_py(df, self.ix.n_docs)

    def term_scores(self, term: str, boost: float = 1.0, query_norm: float = 1.0) -> dict[int, float]:
        d = self.ix.postings.get(term, {})
        idf = self._idf(len(d))
        out = {}
        for doc, ps in d.items():
            tf = len(ps)
            dl = self.ix.doc_lens[doc]
            if self.similarity == "bm25":
                out[doc] = idf * (tf * (sim.K1 + 1.0)) / (
                    tf + sim.K1 * (1.0 - sim.B + sim.B * dl / self.ix.avgdl)
                ) * boost
            else:
                out[doc] = (
                    math.sqrt(tf) * idf * idf * boost * query_norm * self._lnorm(dl)
                )
        return out

    def phrase_scores(self, terms: list[str], boost: float = 1.0, query_norm: float = 1.0) -> dict[int, float]:
        cand = None
        for t in terms:
            docs = set(self.ix.postings.get(t, {}))
            cand = docs if cand is None else cand & docs
        idf_sum = sum(self._idf(self.ix.df(t)) for t in terms)
        out = {}
        for doc in cand or set():
            aligned = set(self.ix.postings[terms[0]][doc])
            for i, t in enumerate(terms[1:], start=1):
                aligned &= {p - i for p in self.ix.postings[t][doc]}
            pf = len(aligned)
            if pf == 0:
                continue
            dl = self.ix.doc_lens[doc]
            if self.similarity == "bm25":
                out[doc] = idf_sum * (pf * (sim.K1 + 1.0)) / (
                    pf + sim.K1 * (1.0 - sim.B + sim.B * dl / self.ix.avgdl)
                ) * boost
            else:
                out[doc] = (
                    math.sqrt(pf) * idf_sum * idf_sum * boost * query_norm / math.sqrt(dl)
                )
        return out

    def boolean_scores(
        self,
        must: list[str] = (),
        should: list[str] = (),
        must_not: list[str] = (),
        min_should_match: int = 0,
        query_norm: float = 1.0,
    ) -> dict[int, float]:
        per_clause = [self.term_scores(t, query_norm=query_norm) for t in must]
        per_should = [self.term_scores(t, query_norm=query_norm) for t in should]
        excl = set()
        for t in must_not:
            excl |= set(self.ix.postings.get(t, {}))
        scores: dict[int, float] = defaultdict(float)
        matched: Counter = Counter()
        must_matched: Counter = Counter()
        for cs in per_clause:
            for doc, s in cs.items():
                scores[doc] += s
                matched[doc] += 1
                must_matched[doc] += 1
        for cs in per_should:
            for doc, s in cs.items():
                scores[doc] += s
                matched[doc] += 1
        out = {}
        max_overlap = len(must) + len(should)
        for doc, s in scores.items():
            if doc in excl:
                continue
            if must and must_matched[doc] != len(must):
                continue
            if min_should_match and (matched[doc] - must_matched[doc]) < min_should_match:
                continue
            if self.similarity == "classic" and max_overlap > 1:
                s = s * matched[doc] / max_overlap
            out[doc] = s
        return out


def topk(scores: dict[int, float], k: int = 10) -> list[tuple[int, float]]:
    """(score DESC, doc_id ASC) — search/HitQueue.cpp:100-105."""
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
