"""Pocket Trinity — a pure-python reference engine for the rank-identity gate.

The reference snapshot ships no tests (Makefile builds only the static
library), so correctness is defined by this independent implementation of the
same semantics (SURVEY.md §5): dict-of-lists inverted index, the boolean /
phrase / min-match evaluation of ``/root/reference/docset_iterators.{h,cpp}``,
and the exact BM25 contract of ``similarity.h:165-235`` (via
``functions.bm25`` — the SAME two formula lines the Spark engine uses).

Scoring composition mirrors ``docset_iterators_scorers.cpp:8-243``: a doc's
query score is the sum of the scores of the matched sub-expressions, summed
in FIXED left-to-right branch order (float addition is not associative; the
Spark planner adds branch columns in the same order).

The oracle shares ``tokenizer.tokenize_terms_py`` with the engine, so the
only thing the gate actually tests is the distributed execution.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from typing import Callable

from .functions.bm25 import idf_py, term_score_py
from .plans.ast import And, ConstTrue, Node, Not, Or, Phrase, Some, Token
from .tokenizer import tokenize_terms_py


def bm25_oracle_scorer(dfs: list[int], n_docs: int, freq: int) -> float:
    """Default scorer: the exact BM25 contract.  ``dfs`` carries one df per
    member term in phrase order (a single token passes a 1-list); the
    phrase-idf-is-sum-of-member-idfs rule (similarity.h:209-217) falls out of
    summing in that order — bit-identical to the pre-pluggable code path."""
    idf = 0.0
    for df in dfs:
        idf += idf_py(df, n_docs)
    return term_score_py(idf, freq)


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, list[int]]]  # term -> doc_id -> positions
    n_docs: int
    deleted: set[int]
    # scorer(member_dfs, n_docs, freq) -> float; the oracle-side Similarity
    # seam (similarity.h:22-41): swap in functions.tfidf.tfidf_score_py /
    # trivial_score_py to rank-check those scorers against the engine
    scorer: Callable[[list[int], int, int], float] = field(
        default=bm25_oracle_scorer
    )

    @classmethod
    def build(
        cls,
        docs: list[tuple[int, str]],
        deleted: set[int] | None = None,
        scorer: Callable[[list[int], int, int], float] = bm25_oracle_scorer,
    ) -> "OracleIndex":
        postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        for doc_id, text in docs:
            for term, pos in tokenize_terms_py(text):
                postings[term].setdefault(doc_id, []).append(pos)
        return cls(dict(postings), len(docs), deleted or set(), scorer)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> float:
        return idf_py(self.df(term), self.n_docs)

    # --- evaluation: node -> {doc_id: score} over matched docs only ---

    def eval(self, node: Node) -> dict[int, float]:
        if isinstance(node, Token):
            dfs = [self.df(node.term)]
            return {
                d: self.scorer(dfs, self.n_docs, len(ps))
                for d, ps in self.postings.get(node.term, {}).items()
            }
        if isinstance(node, Phrase):
            return self._eval_phrase(node)
        if isinstance(node, And):
            return self._eval_and(node.children)
        if isinstance(node, Or):
            return self._eval_naryset(node.children, k=1)
        if isinstance(node, Some):
            return self._eval_naryset(node.children, k=node.k)
        if isinstance(node, Not):
            req = self.eval(node.req)
            excl = self.eval(node.excl)
            return {d: s for d, s in req.items() if d not in excl}
        if isinstance(node, ConstTrue):
            return {}  # top-level optional matches nothing by itself
        raise TypeError(type(node))

    def _eval_phrase(self, node: Phrase) -> dict[int, float]:
        # a phrase scores with its member dfs in phrase order (the scorer
        # sums idfs itself — similarity.h:209-217 for BM25, :110-130 for
        # TF-IDF); freq = adjacency match count (docset_iterators.cpp:91-157)
        dfs = [self.df(t) for t in node.terms]
        plists = [self.postings.get(t, {}) for t in node.terms]
        if any(not p for p in plists):
            return {}
        docs = set(plists[0])
        for p in plists[1:]:
            docs &= set(p)
        out: dict[int, float] = {}
        for d in docs:
            later = [set(p[d]) for p in plists[1:]]
            # position-0 hits (word:tail operator tokens) never anchor a
            # phrase (codecs.h:191-195 positionless contract); pos+i+1 >= 2
            # for pos > 0, so a 0 in a later member's set can never match
            pf = sum(
                1
                for pos in plists[0][d]
                if pos > 0 and all((pos + i + 1) in s for i, s in enumerate(later))
            )
            if pf > 0:
                out[d] = self.scorer(dfs, self.n_docs, pf)
        return out

    def _eval_and(self, children: tuple[Node, ...]) -> dict[int, float]:
        required = [c for c in children if not isinstance(c, ConstTrue)]
        optional = [c.child for c in children if isinstance(c, ConstTrue)]
        if not required:
            return {}
        req_evals = [self.eval(c) for c in required]
        docs = set(req_evals[0])
        for e in req_evals[1:]:
            docs &= set(e)
        opt_evals = [self.eval(c) for c in optional]
        # per-child evals in children order (positional — required/optional
        # preserve relative order), so the per-doc loop is O(children), not
        # an O(children^2) required.index equality scan
        ordered: list[tuple[bool, dict[int, float]]] = []
        ri = oi = 0
        for c in children:
            if isinstance(c, ConstTrue):
                ordered.append((True, opt_evals[oi]))
                oi += 1
            else:
                ordered.append((False, req_evals[ri]))
                ri += 1
        out: dict[int, float] = {}
        for d in docs:
            s = 0.0
            for is_opt, e in ordered:  # fixed left-to-right order
                s += e.get(d, 0.0) if is_opt else e[d]
            out[d] = s
        return out

    def _eval_naryset(self, children: tuple[Node, ...], k: int) -> dict[int, float]:
        evals = [self.eval(c) for c in children]
        docs: set[int] = set()
        for e in evals:
            docs |= set(e)
        out: dict[int, float] = {}
        for d in docs:
            matched = [e for e in evals if d in e]
            if len(matched) >= k:
                s = 0.0
                for e in evals:  # fixed left-to-right order
                    if d in e:
                        s += e[d]
                out[d] = s
        return out

    def topk(self, node: Node, k: int = 10) -> list[tuple[int, float]]:
        scores = self.eval(node)
        live = [(d, s) for d, s in scores.items() if d not in self.deleted]
        live.sort(key=lambda x: (-x[1], x[0]))  # score DESC, doc_id ASC
        return live[:k]
