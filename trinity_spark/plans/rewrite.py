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

from ..plans.ast import And, ConstTrue, Node, Not, Or, Phrase, Some, Token


def expand_synonyms(
    node: Node,
    synonyms: dict[str, list[str]],
    max_expansion: int = 64,
) -> Node:
    """Expand tokens through the synonym map under a global budget."""
    budget = [1]  # running product of branching factors

    def expand(n: Node) -> Node:
        if isinstance(n, Token):
            alts = [s for s in synonyms.get(n.term, []) if s != n.term]
            factor = 1 + len(alts)
            if alts and budget[0] * factor <= max_expansion:
                budget[0] *= factor
                return Or((n,) + tuple(Token(a) for a in alts))
            return n
        if isinstance(n, Phrase):
            # phrase-level alternatives: whole-phrase synonyms keyed by the
            # joined phrase text
            key = " ".join(n.terms)
            alts = synonyms.get(key, [])
            factor = 1 + len(alts)
            if alts and budget[0] * factor <= max_expansion:
                budget[0] *= factor
                return Or(
                    (n,) + tuple(Phrase(tuple(a.split())) for a in alts)
                )
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
