"""Query-string parser -> AST.

Surface syntax parity with the reference's recursive-descent parser
(``/root/reference/queries.cpp:1830-1871`` entry; operators at
``queries.cpp:174-223``; phrases ``:70-121``; groups ``:454-468``;
ConstTrueExpr ``<expr>`` and MatchSome ``[a,b,c]`` ``:403-452``):

- whitespace juxtaposition and the keyword ``AND`` bind as conjunction,
- ``OR`` / ``|``  disjunction (lower precedence: AND/NOT=8 > OR=7,
  queries.cpp:11-28),
- ``NOT`` / prefix ``-``  exclusion,
- prefix ``+``  STRICT_AND (same matching semantics as AND),
- ``"..."``  phrase,
- ``( ... )``  grouping,
- ``< expr >``  ConstTrueExpr (optional match),
- ``[a, b, c] min=2``  MatchSome (k defaults to 1),
- adjacent duplicate tokens collapse to rep++ (queries.cpp:509-515).

Terms inside the query go through the SAME frozen tokenizer as documents
(``common.h:59-72`` requires parser parity), so ``I.B.M`` in a query matches
``ibm`` in a document.
"""

from __future__ import annotations

import re

from ..tokenizer import tokenize_py
from .ast import And, ConstTrue, Node, Not, Or, Phrase, Some, Token

_LEX = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<langle><) | (?P<rangle>>) |
    (?P<lbrack>\[) | (?P<rbrack>\]) |
    (?P<minassign>min\s*=\s*(?P<k>\d+)) |
    (?P<phrase>"[^"]*") |
    (?P<or_kw>\bOR\b|\|) |
    (?P<and_kw>\bAND\b) |
    (?P<not_kw>\bNOT\b) |
    (?P<plus>\+) | (?P<minus>-(?=\S)) |
    (?P<comma>,) |
    (?P<word>[^\s()<>\[\]|,"]+)
    """,
    re.VERBOSE,
)


class QueryParseError(ValueError):
    pass


def _lex(q: str) -> list[tuple[str, str]]:
    toks = []
    for m in _LEX.finditer(q):
        kind = m.lastgroup if m.lastgroup != "k" else "minassign"
        for name in ("lparen", "rparen", "langle", "rangle", "lbrack", "rbrack",
                     "minassign", "phrase", "or_kw", "and_kw", "not_kw", "plus",
                     "minus", "comma", "word"):
            if m.group(name):
                if name == "minassign" and (not toks or toks[-1][0] != "rbrack"):
                    # 'min=N' is the MatchSome k-assignment ONLY in its
                    # grammar position (right after ']'); anywhere else it
                    # is ordinary query text — 'cpu min=90' must parse as a
                    # search, not raise
                    toks.append(("word", m.group("minassign")))
                else:
                    toks.append((name, m.group("k") if name == "minassign" else m.group(name)))
                break
    return toks


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def take(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            # a trailing prefix operator ('foo +') recurses into parse_unary
            # past the end — surface the contract's exception type, not a
            # bare IndexError
            raise QueryParseError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    # expr := and_chain (OR and_chain)*
    def parse_expr(self) -> Node | None:
        branches = []
        left = self.parse_and_chain()
        if left is not None:
            branches.append(left)
        while self.peek() == "or_kw":
            self.take()
            right = self.parse_and_chain()
            if right is not None:
                branches.append(right)
        if not branches:
            return None
        if len(branches) == 1:
            return branches[0]
        return Or(tuple(branches))

    # and_chain := unary (AND? unary | NOT unary)*
    def parse_and_chain(self) -> Node | None:
        node: Node | None = None
        pending_not = False
        while True:
            kind = self.peek()
            if kind in (None, "rparen", "rangle", "rbrack", "or_kw", "comma"):
                break
            if kind == "and_kw":
                self.take()
                continue
            if kind == "not_kw":
                self.take()
                pending_not = True
                continue
            unit = self.parse_unary()
            if unit is None:
                continue
            if pending_not:
                if node is None:
                    raise QueryParseError("NOT with no left operand")
                # 'a NOT -b': unwrap the prefix-minus marker ('-' is itself
                # negation, so NOT -b excludes b) — leaking _Neg into the
                # AST crashes downstream walks with TypeError
                node = Not(node, unit.child if isinstance(unit, _Neg) else unit)
                pending_not = False
            elif node is None:
                if isinstance(unit, _Neg):
                    raise QueryParseError("'-term' with no left operand")
                node = unit
            elif isinstance(unit, _Neg):
                node = Not(node, unit.child)
            else:
                # adjacent duplicate tokens -> rep++ (queries.cpp:509-515)
                if (
                    isinstance(node, Token)
                    and isinstance(unit, Token)
                    and node.term == unit.term
                ):
                    node = Token(node.term, node.rep + 1)
                elif (
                    isinstance(node, And)
                    and isinstance(node.children[-1], Token)
                    and isinstance(unit, Token)
                    and node.children[-1].term == unit.term
                ):
                    last = node.children[-1]
                    node = And(node.children[:-1] + (Token(last.term, last.rep + 1),), node.strict)
                elif isinstance(node, And):
                    node = And(node.children + (unit,), node.strict)
                else:
                    node = And((node, unit))
        return node

    def parse_unary(self) -> Node | None:
        kind, val = self.take()
        if kind == "plus":
            inner = self.parse_unary()
            if isinstance(inner, And):
                return And(inner.children, strict=True)
            return inner
        if kind == "minus":
            inner = self.parse_unary()
            return _Neg(inner) if inner is not None else None
        if kind == "phrase":
            terms = tokenize_py(val[1:-1])
            if not terms:
                return None
            if len(terms) == 1:
                return Token(terms[0])
            return Phrase(tuple(terms[:16]))  # MaxPhraseSize=16 (trinity_limits.h:12)
        if kind == "word":
            terms = tokenize_py(val)
            if not terms:
                return None
            if len(terms) == 1:
                return Token(terms[0])
            return Phrase(tuple(terms[:16]))  # e.g. "x-box" -> phrase(x, box)
        if kind == "lparen":
            inner = self.parse_expr()
            if self.peek() == "rparen":
                self.take()
            return inner
        if kind == "langle":
            inner = self.parse_expr()
            if self.peek() == "rangle":
                self.take()
            return ConstTrue(inner) if inner is not None else None
        if kind == "lbrack":
            branches: list[Node] = []
            while self.peek() not in (None, "rbrack"):
                if self.peek() == "comma":
                    self.take()
                    continue
                # inside [...] commas separate branches (parse_and_chain
                # breaks on comma); OR still allowed inside a branch
                b = self.parse_expr()
                if b is not None:
                    branches.append(b)
            if self.peek() == "rbrack":
                self.take()
            k = 1
            if self.peek() == "minassign":
                _, kval = self.take()
                k = int(kval)
            if not branches:
                return None
            return Some(tuple(branches), k)
        raise QueryParseError(f"unexpected token {kind}:{val!r}")

class _Neg(Node):
    """Internal marker for prefix '-' awaiting its left operand."""

    def __init__(self, child: Node):
        self.child = child


MAX_QUERY_TOKENS = 8192  # trinity_limits.h:13


def trim_query(node: Node | None, max_tokens: int = MAX_QUERY_TOKENS) -> Node | None:
    """Keep-first token trim (``/root/reference/queries.cpp:1503-1526``
    query::trim): walk leaves left-to-right counting tokens (a phrase counts
    its member terms); leaves past the cap are dropped (set_dummy analog) and
    the tree re-normalized — so a pathological 10^5-token query can never
    reach the planner and build an unbounded expression."""
    if node is None:
        return None
    count = [0]

    def walk(n: Node) -> Node | None:
        if isinstance(n, Token):
            count[0] += 1
            return n if count[0] <= max_tokens else None
        if isinstance(n, Phrase):
            count[0] += len(n.terms)
            return n if count[0] <= max_tokens else None
        if isinstance(n, And):
            kids = [k for k in (walk(c) for c in n.children) if k is not None]
            return And(tuple(kids), n.strict) if kids else None
        if isinstance(n, Or):
            kids = [k for k in (walk(c) for c in n.children) if k is not None]
            return Or(tuple(kids)) if kids else None
        if isinstance(n, Some):
            kids = [k for k in (walk(c) for c in n.children) if k is not None]
            return Some(tuple(kids), n.k) if kids else None
        if isinstance(n, Not):
            req = walk(n.req)
            if req is None:
                return None
            excl = walk(n.excl)
            return Not(req, excl) if excl is not None else req
        if isinstance(n, ConstTrue):
            c = walk(n.child)
            return ConstTrue(c) if c is not None else None
        raise TypeError(type(n))

    out = walk(node)
    return out.normalize() if out is not None else None


def parse_query(q: str, max_tokens: int = MAX_QUERY_TOKENS) -> Node | None:
    """Parse a query string; returns a normalized AST or None (empty query).
    Queries over ``max_tokens`` tokens are trimmed keep-first at parse time
    (queries.cpp:1503-1526)."""
    node = _Parser(_lex(q)).parse_expr()
    if node is None:
        return None
    if isinstance(node, _Neg):
        raise QueryParseError("query cannot start with '-'")
    return trim_query(node.normalize(), max_tokens)
