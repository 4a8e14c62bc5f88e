"""Query AST — the engine's logical IR.

Mirrors the reference's ``ast_node`` tree (``/root/reference/queries.h:10-97``):
tokens/phrases composed with AND / OR / NOT / STRICT_AND, plus ConstTrueExpr
(optional match) and MatchSome (match at least k of n).  STRICT_AND is
semantically AND (``compilation_ctx.cpp:228-231`` compiles both to
``logicaland``); we keep a flag only so rewrites never drop the node.

Normalization (``queries.cpp:1251-1350`` analog) lives in ``normalize()``:
flatten nested same-op binops, drop empty/false branches, collapse
single-child ops.  Unknown terms (df=0) are folded by the *planner*, which is
where df is known (the reference folds them in ``compile`` via
``resolve_query_term`` -> constfalse, ``compilation_ctx.cpp:199-220``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    def normalize(self) -> "Node | None":
        return self


@dataclass(frozen=True)
class RewriteCtx:
    """Provenance of a rewrite-generated node (``/root/reference/
    queries.h:395-418`` rewrite_ctx): ``src`` is the original query text the
    node was expanded from, ``translation_coefficient`` =
    min(src_tokens, dst_tokens) / max(src_tokens, dst_tokens) (queries.h:
    402-407), ``src_seq_size`` the original token-run length.  Rides into
    ``TermContext`` so a custom similarity can down-weight rewritten terms —
    the exec.cpp:553-657 query_term_ctx capability."""

    src: str
    translation_coefficient: float = 1.0
    src_seq_size: int = 1


@dataclass(frozen=True)
class Token(Node):
    term: str
    rep: int = 1  # adjacent-duplicate collapse (queries.cpp:509-515); not scored
    rewrite: RewriteCtx | None = None

    def normalize(self):
        return self if self.term else None


@dataclass(frozen=True)
class Phrase(Node):
    terms: tuple[str, ...]
    rewrite: RewriteCtx | None = None

    def normalize(self):
        if not self.terms:
            return None
        if len(self.terms) == 1:
            return Token(self.terms[0], rewrite=self.rewrite)
        return self


def _flatten(cls, children: list[Node]) -> list[Node]:
    out: list[Node] = []
    for c in children:
        c = c.normalize()
        if c is None:
            continue
        if isinstance(c, cls):
            out.extend(c.children)
        else:
            out.append(c)
    return out


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...]
    strict: bool = False  # STRICT_AND / '+term' (queries.h:15,43-45)

    def normalize(self):
        # flatten only nested ANDs whose strict flag MATCHES: merging a
        # STRICT_AND into a plain AND (or vice versa) would erase/graft the
        # '+term' provenance the flag exists to preserve.  Matching and
        # scoring are unaffected either way (STRICT_AND is semantically
        # AND), but rewrites and plan consumers read the flag.
        kids: list[Node] = []
        for c in self.children:
            c = c.normalize()
            if c is None:
                continue
            if isinstance(c, And) and c.strict == self.strict:
                kids.extend(c.children)
            else:
                kids.append(c)
        if not kids:
            return None
        if len(kids) == 1:
            return kids[0]
        return And(tuple(kids), self.strict)


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...]

    def normalize(self):
        kids = _flatten(Or, list(self.children))
        # x OR x -> x (compilation_ctx.cpp:166-189 "stronger-of"; exact dup only)
        seen, uniq = set(), []
        for k in kids:
            key = repr(k)
            if key not in seen:
                seen.add(key)
                uniq.append(k)
        if not uniq:
            return None
        if len(uniq) == 1:
            return uniq[0]
        return Or(tuple(uniq))


@dataclass(frozen=True)
class Not(Node):
    req: Node
    excl: Node

    def normalize(self):
        req = self.req.normalize()
        excl = self.excl.normalize()
        if req is None:
            return None
        if excl is None:
            return req
        return Not(req, excl)


@dataclass(frozen=True)
class Some(Node):
    """Match at least ``k`` of ``children`` (MatchSome, queries.h:90-97)."""

    children: tuple[Node, ...]
    k: int = 1

    def normalize(self):
        kids = [c for c in (c.normalize() for c in self.children) if c is not None]
        if not kids or self.k > len(kids):  # matchsome(min>n) -> false
            return None
        if self.k < 1:  # matchsome(min=0) -> OR: oracle candidates are the
            # UNION of child matches, so every candidate has matched >= 1
            return Or(tuple(kids)).normalize()
        if self.k == len(kids):  # matchsome(min=n) -> AND (compilation_ctx.cpp)
            return And(tuple(kids)).normalize()
        if len(kids) == 1:
            return kids[0]
        return Some(tuple(kids), self.k)


@dataclass(frozen=True)
class ConstTrue(Node):
    """Optional match (ConstTrueExpr, queries.h:76-89): never rejects a doc;
    contributes its child's score iff the child matches.  Only meaningful as
    an AND branch; a top-level ConstTrue matches nothing by itself."""

    child: Node

    def normalize(self):
        c = self.child.normalize()
        if c is None:
            return None
        return ConstTrue(c)


def query_terms(node: Node) -> list[str]:
    """All distinct terms in plan order (for postings pushdown)."""
    out: list[str] = []

    def walk(n: Node):
        if isinstance(n, Token):
            out.append(n.term)
        elif isinstance(n, Phrase):
            out.extend(n.terms)
        elif isinstance(n, (And, Or, Some)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.req)
            walk(n.excl)
        elif isinstance(n, ConstTrue):
            walk(n.child)

    walk(node)
    seen, uniq = set(), []
    for t in out:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    return uniq


def positive_terms(node: Node) -> list[str]:
    """Distinct terms that can MATCH (everything except Not-exclusion
    subtrees) — the terms a matched-hits surface reports
    (queryexec_ctx.cpp:317-352 passes only matched terms to consider())."""
    out: list[str] = []

    def walk(n: Node):
        if isinstance(n, Token):
            out.append(n.term)
        elif isinstance(n, Phrase):
            out.extend(n.terms)
        elif isinstance(n, (And, Or, Some)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.req)  # the exclusion side never matches
        elif isinstance(n, ConstTrue):
            walk(n.child)

    walk(node)
    seen, uniq = set(), []
    for t in out:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    return uniq
