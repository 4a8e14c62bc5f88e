"""Percolator: reverse search — match documents against MANY stored queries.

Reference: ``/root/reference/percolator.h:19-85``, ``percolator.cpp:1-134`` —
a compiled query evaluated against a single document's term set.  Spark-first
version: each incoming document row is tested against every registered query
in one pass; the per-query predicate compiles to a JVM Column expression over
the document's token array (set semantics) and positions map (phrases), so
percolating N docs x Q queries is one narrow projection — no joins, no
shuffles, no Python.

Used for alerting/routing pipelines: ``percolate(docs, registry)`` returns
(doc_id, query_id) matches.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.ast import And, ConstTrue, Node, Not, Or, Phrase, Some, Token
from ..plans.parser import parse_query
from ..tokenizer import tokens_column


def _predicate(node: Node, toks: Column) -> Column:
    """Compile an AST to a boolean Column over a token array.

    Term membership = array_contains; phrase adjacency = exists a position i
    with toks[i..i+n-1] == phrase (JVM higher-order functions)."""
    if isinstance(node, Token):
        return F.array_contains(toks, node.term)
    if isinstance(node, Phrase):
        if any(":" in t for t in node.terms):
            # word:tail members are positionless (codecs.h:191-195): a phrase
            # through them can never adjacency-match — same as the engine
            return F.lit(False)
        n = len(node.terms)
        # positions 0..size-n; toks[i+j] must equal terms[j] for all j.
        # (sequence(0, negative) counts DOWN, so guard short docs first)
        idxs = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array().cast("array<int>"))
        match_at = lambda i: reduce(  # noqa: E731
            lambda a, b: a & b,
            [
                F.element_at(toks, i + j + 1) == F.lit(t)
                for j, t in enumerate(node.terms)
            ],
        )
        return F.exists(idxs, match_at)
    if isinstance(node, And):
        # ConstTrue children never reject (optional-match semantics)
        preds = [
            F.lit(True) if isinstance(c, ConstTrue) else _predicate(c, toks)
            for c in node.children
        ]
        return reduce(lambda a, b: a & b, preds)
    if isinstance(node, Or):
        return reduce(lambda a, b: a | b, [_predicate(c, toks) for c in node.children])
    if isinstance(node, Some):
        matched = reduce(
            lambda a, b: a + b,
            [_predicate(c, toks).cast("int") for c in node.children],
        )
        return matched >= node.k
    if isinstance(node, Not):
        return _predicate(node.req, toks) & ~_predicate(node.excl, toks)
    if isinstance(node, ConstTrue):
        return F.lit(True)
    raise TypeError(type(node))


def percolate(
    docs: DataFrame,
    queries: dict[str, str | Node],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Match every doc against every registered query.

    Returns (doc_id, query_id) for each match; one projection pass over docs
    (tokenize once, evaluate all predicates on the token array)."""
    parsed: dict[str, Node] = {}
    for qid, q in queries.items():
        node = parse_query(q) if isinstance(q, str) else q
        if node is not None:
            parsed[qid] = node
    with_toks = docs.select(F.col(id_col), tokens_column(F.col(text_col)).alias("toks"))
    hits = F.filter(
        F.array(
            *[
                F.when(_predicate(node, F.col("toks")), F.lit(qid))
                for qid, node in parsed.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return with_toks.select(
        F.col(id_col), F.explode(hits).alias("query_id")
    )
