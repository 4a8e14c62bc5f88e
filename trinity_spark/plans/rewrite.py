"""Query rewriting: synonym/spelling expansion with a budget.

Reference: ``/root/reference/queries_rewrite.h:992-1148`` — ``rewrite_query``
expands K-token spans through an application callback (synonyms, spelling,
stemming) while tracking a ``translationCoefficient`` budget so expansion
stays bounded.  Ours is the AST-level analog: a pure pre-planning pass, so
the planner/executor never know rewrites happened.

``expand_synonyms`` turns each Token t into Or(t, syn1, syn2, ...) (and each
Phrase member likewise via phrase alternatives), stopping when the expansion
budget — the product of per-node branching factors, the reference's
translation coefficient — would exceed ``max_expansion``.
"""

from __future__ import annotations

from ..plans.ast import And, ConstTrue, Node, Not, Or, Phrase, RewriteCtx, Some, Token
from ..tokenizer import tokenize_py


def _ctx(src: str, n_alt_terms: int) -> RewriteCtx:
    """Provenance for one alternative: translation coefficient =
    min(src_tokens, dst_tokens) / max(src_tokens, dst_tokens)
    (queries.h:402-407); src_seq_size = the original run length."""
    ns, nd = len(src.split()), max(n_alt_terms, 1)
    return RewriteCtx(
        src=src,
        translation_coefficient=min(ns, nd) / max(ns, nd),
        src_seq_size=ns,
    )


def _alt_node(src: str, alt: str) -> Node | None:
    """One alternative as an AST node — run through the FROZEN tokenizer:
    the index stores normalized terms ('NYC' -> 'nyc', 'I.B.M' -> 'ibm'),
    so a verbatim alt.split() would mint terms with df=0 that the planner
    folds to constfalse, silently killing the expansion.  None when the
    alternative normalizes to nothing (punctuation-only)."""
    terms = tokenize_py(alt)
    if not terms:
        return None
    ctx = _ctx(src, len(terms))
    if len(terms) > 1:
        return Phrase(tuple(terms), rewrite=ctx)
    return Token(terms[0], rewrite=ctx)


def _alt_nodes(src: str, alts: list[str]) -> tuple[Node, ...]:
    """Tokenized, deduplicated alternatives for one source run.  Identity
    alternatives — same NORMALIZED terms as the source or as an earlier
    alternative ('Error' for 'error') — are dropped: Or.normalize cannot
    dedup them (the rewrite ctx differs) and the score would double-count."""
    seen = {tuple(tokenize_py(src))}
    out: list[Node] = []
    for a in alts:
        node = _alt_node(src, a)
        if node is None:
            continue
        key = node.terms if isinstance(node, Phrase) else (node.term,)
        if key in seen:
            continue
        seen.add(key)
        out.append(node)
    return tuple(out)


def expand_synonyms(
    node: Node,
    synonyms: dict[str, list[str]],
    max_expansion: int = 64,
) -> Node:
    """Expand tokens through the synonym map under a global budget.  Every
    generated alternative carries ``RewriteCtx`` provenance (source text +
    translation coefficient), which the planner forwards to the similarity
    scorer via ``TermContext`` — the exec.cpp:553-657 rewrite-aware-scoring
    capability."""
    budget = [1]  # running product of branching factors

    def expand(n: Node) -> Node:
        if isinstance(n, Token):
            alt_nodes = _alt_nodes(n.term, synonyms.get(n.term, []))
            factor = 1 + len(alt_nodes)
            if alt_nodes and budget[0] * factor <= max_expansion:
                budget[0] *= factor
                return Or((n,) + alt_nodes)
            return n
        if isinstance(n, Phrase):
            # phrase-level alternatives: whole-phrase synonyms keyed by the
            # joined phrase text
            key = " ".join(n.terms)
            alt_nodes = _alt_nodes(key, synonyms.get(key, []))
            factor = 1 + len(alt_nodes)
            if alt_nodes and budget[0] * factor <= max_expansion:
                budget[0] *= factor
                return Or((n,) + alt_nodes)
            return n
        if isinstance(n, And):
            return And(tuple(expand(c) for c in n.children), n.strict)
        if isinstance(n, Or):
            return Or(tuple(expand(c) for c in n.children))
        if isinstance(n, Some):
            return Some(tuple(expand(c) for c in n.children), n.k)
        if isinstance(n, Not):
            # never expand the exclusion side (would over-reject)
            return Not(expand(n.req), n.excl)
        if isinstance(n, ConstTrue):
            return ConstTrue(expand(n.child))
        raise TypeError(type(n))

    out = expand(node).normalize()
    return out if out is not None else node


def expand_spans(
    node: Node,
    synonyms: dict[str, list[str]],
    max_span: int = 4,
    max_expansion: int = 64,
) -> Node:
    """K-token span rewriting (``queries_rewrite.h:992-1148``): a run of up to
    ``max_span`` consecutive AND'd tokens whose joined text hits the synonym
    map becomes ``Or(<original run>, <alternatives>)`` — ``"big apple" ->
    "nyc"`` yields ``Or(And(big, apple), nyc)``.  Longest span wins (the
    reference tries K down to 1); single-token expansion is
    ``expand_synonyms``'s job.  Multi-word alternatives become Phrases (one
    concept => adjacency).  The same translation-coefficient budget bounds
    the product of branching factors."""
    budget = [1]

    def rewrite_children(children: tuple[Node, ...]) -> tuple[Node, ...]:
        out: list[Node] = []
        i = 0
        while i < len(children):
            c = children[i]
            if isinstance(c, Token):
                matched = False
                for k in range(min(max_span, len(children) - i), 1, -1):
                    run = children[i : i + k]
                    if not all(isinstance(x, Token) for x in run):
                        continue
                    key = " ".join(x.term for x in run)
                    alt_nodes = _alt_nodes(key, synonyms.get(key, []))
                    factor = 1 + len(alt_nodes)
                    if alt_nodes and budget[0] * factor <= max_expansion:
                        budget[0] *= factor
                        out.append(Or((And(run),) + alt_nodes))
                        i += k
                        matched = True
                        break
                if matched:
                    continue
            out.append(walk(c))
            i += 1
        return tuple(out)

    def walk(n: Node) -> Node:
        if isinstance(n, And):
            return And(rewrite_children(n.children), n.strict)
        if isinstance(n, Or):
            return Or(tuple(walk(c) for c in n.children))
        if isinstance(n, Some):
            return Some(tuple(walk(c) for c in n.children), n.k)
        if isinstance(n, Not):
            return Not(walk(n.req), n.excl)  # never expand the exclusion side
        if isinstance(n, ConstTrue):
            return ConstTrue(walk(n.child))
        return n

    out = walk(node).normalize()
    return out if out is not None else node
