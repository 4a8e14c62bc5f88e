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
from ..tokenizer import is_positionless, tokens_column


def _predicate(node: Node, toks: Column) -> Column:
    """Compile an AST to a boolean Column over a token array.

    Term membership = array_contains; phrase adjacency = exists a position i
    with toks[i..i+n-1] == phrase (JVM higher-order functions)."""
    if isinstance(node, Token):
        return F.array_contains(toks, node.term)
    if isinstance(node, Phrase):
        if any(is_positionless(t) for t in node.terms):
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
        # ConstTrue children never reject (optional-match semantics); an AND
        # with NO required child matches nothing — the engine/oracle rule
        # (oracle.py ConstTrue + all-optional AND), not everything
        required = [c for c in node.children if not isinstance(c, ConstTrue)]
        if not required:
            return F.lit(False)
        return reduce(lambda a, b: a & b, [_predicate(c, toks) for c in required])
    if isinstance(node, Or):
        return reduce(lambda a, b: a | b, [_predicate(c, toks) for c in node.children])
    if isinstance(node, Some):
        matched = reduce(
            lambda a, b: a + b,
            [_predicate(c, toks).cast("int") for c in node.children],
        )
        # k < 1 degenerates to Or (oracle: candidates are the union of
        # child matches) — 'matched >= 0' would match EVERY document,
        # diverging from percolate_routed which routes on the query terms
        return matched >= max(node.k, 1)
    if isinstance(node, Not):
        return _predicate(node.req, toks) & ~_predicate(node.excl, toks)
    if isinstance(node, ConstTrue):
        # top-level optional matches nothing by itself (oracle.py:93-94);
        # inside OR/Some it contributes no match, matching eval() = {}
        return F.lit(False)
    raise TypeError(type(node))


# One projection can only hold so many compiled predicates: past ~10^3 the
# Catalyst expression tree stops fitting whole-stage codegen and planning
# time grows superlinearly.  Registries larger than this are evaluated in
# chunks of this size over a tokenize-once (checkpointed) frame — same
# result rows, bounded plan size per pass.
MAX_COMPILED_QUERIES = 500


def _percolate_chunked(
    with_toks: DataFrame,
    parsed: dict[str, Node],
    id_col: str,
    checkpointed: bool = False,
) -> DataFrame:
    if len(parsed) <= MAX_COMPILED_QUERIES:
        return _percolate_toks(with_toks, parsed, id_col)
    items = sorted(parsed.items())
    # tokenize ONCE across the chunk passes.  Streaming frames cannot be
    # checkpointed (AnalysisException) — there each chunk re-tokenizes its
    # micro-batch, an accepted per-batch cost that keeps >500-query
    # registries working on streams at identical semantics.
    if not checkpointed and not with_toks.isStreaming:
        with_toks = with_toks.localCheckpoint(eager=False)
    out = None
    for lo in range(0, len(items), MAX_COMPILED_QUERIES):
        part = dict(items[lo : lo + MAX_COMPILED_QUERIES])
        frame = _percolate_toks(with_toks, part, id_col)
        out = frame if out is None else out.unionByName(frame)
    return out


def percolate(
    docs: DataFrame,
    queries: dict[str, str | Node],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Match every doc against every registered query.

    Returns (doc_id, query_id) for each match; one projection pass over docs
    (tokenize once, evaluate all predicates on the token array).  Registries
    past MAX_COMPILED_QUERIES evaluate in bounded-size chunks over the
    once-tokenized frame."""
    parsed = _parse_all(queries)
    with_toks = docs.select(F.col(id_col), tokens_column(F.col(text_col)).alias("toks"))
    return _percolate_chunked(with_toks, parsed, id_col)


def _parse_all(queries: dict[str, str | Node]) -> dict[str, Node]:
    parsed: dict[str, Node] = {}
    for qid, q in queries.items():
        node = parse_query(q) if isinstance(q, str) else q
        if node is not None:
            parsed[qid] = node
    return parsed


def _percolate_toks(
    with_toks: DataFrame, parsed: dict[str, Node], id_col: str
) -> DataFrame:
    if not parsed:
        # empty result with the INPUT's id type (a literal schema would
        # break the routed path's union for non-long id columns)
        return with_toks.where(F.lit(False)).select(
            F.col(id_col), F.lit("").alias("query_id")
        )
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


def routing_terms(node: Node) -> frozenset[str] | None:
    """A SOUND routing set: every document matching ``node`` contains at
    least one of the returned terms; ``None`` = unroutable (the query can
    match documents sharing no term with it — e.g. a top-level optional).

    This is the percolator-index idea (route documents to candidate
    queries by term, verify only candidates) reduced to its document-
    pruning core: AND picks its cheapest required child's set, OR/Some
    union their children's, NOT routes on its required side."""
    if isinstance(node, Token):
        return frozenset((node.term,))
    if isinstance(node, Phrase):
        # positionless (word:tail) phrases compile to const-false — any
        # routing set is vacuously sound; a normal phrase requires all its
        # members, so the first is enough
        return frozenset((node.terms[0],))
    if isinstance(node, And):
        best: frozenset[str] | None = None
        for c in node.children:
            if isinstance(c, ConstTrue):
                continue  # optional branch never rejects -> cannot route
            s = routing_terms(c)
            if s is not None and (best is None or len(s) < len(best)):
                best = s
        return best
    if isinstance(node, (Or, Some)):
        out: set[str] = set()
        for c in node.children:
            s = routing_terms(c)
            if s is None:
                return None
            out |= s
        return frozenset(out)
    if isinstance(node, Not):
        return routing_terms(node.req)
    if isinstance(node, ConstTrue):
        return None
    raise TypeError(type(node))


def percolate_routed(
    docs: DataFrame,
    queries: dict[str, str | Node],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term-routed percolation — the many-registered-queries scale path.

    ``percolate`` evaluates every query against every document: one
    zero-shuffle projection, measured linear in both (the right shape up
    to ~10^3 queries).  At alerting scale (10^5+ registered queries whose
    required terms are selective) most documents match nothing, so this
    variant first ROUTES: each query contributes a sound routing-term set
    (``routing_terms``), documents join their distinct tokens against the
    broadcast routing table, and only documents holding at least one
    routing term are verified — by the same compiled projection, so
    results are identical (verified by test).  Queries with no sound
    routing set (pure optionals) fall back to the full scan.

    Cost: tokenize once + one broadcast semi-join + the projection over
    candidate documents only.  The win is the candidate-doc fraction; with
    stopword-routed queries it degenerates gracefully to ``percolate``.

    Reference analog: percolator.cpp:1-134 evaluates per-document against
    a compiled query; the routing index is our distributed addition (the
    reference percolates one document at a time, where routing is free)."""
    if docs.isStreaming:
        # the routing pass is a self-join (distinct tokens vs the doc frame)
        # plus a localCheckpoint — both unsupported on streaming frames.
        # percolate()/streaming.alerts.percolate_stream is the stream path:
        # a stateless projection with identical match semantics.
        raise ValueError(
            "percolate_routed requires a batch DataFrame; for streams use "
            "percolate() (or streaming.alerts.percolate_stream), whose "
            "compiled projection has identical semantics"
        )
    parsed = _parse_all(queries)
    routable: dict[str, Node] = {}
    fallback: dict[str, Node] = {}
    route_term_set: set[str] = set()
    for qid, node in parsed.items():
        s = routing_terms(node)
        if s is None:
            fallback[qid] = node
        else:
            routable[qid] = node
            route_term_set |= s
    spark = docs.sparkSession
    with_toks = docs.select(
        F.col(id_col), tokens_column(F.col(text_col)).alias("toks")
    )
    if routable:
        # with_toks branches (routing join side + verify side, plus any
        # fallback scan): cut the lineage so tokenization runs once
        with_toks = with_toks.localCheckpoint(eager=False)
    # fallback side: with_toks is already checkpointed when routable — do
    # not cache the same tokenized frame twice.  (The verify side's
    # cand_toks is a DIFFERENT, smaller frame — the routing semi-join
    # output — and chunked evaluation rightly checkpoints it once so the
    # join does not replay per chunk.)
    out = _percolate_chunked(
        with_toks, fallback, id_col, checkpointed=bool(routable)
    )
    if routable:
        route_terms = spark.createDataFrame(
            [(t,) for t in sorted(route_term_set)], "term string"
        )
        cand_ids = (
            with_toks.select(
                F.col(id_col), F.explode(F.array_distinct("toks")).alias("term")
            )
            .join(F.broadcast(route_terms), "term")
            .select(id_col)
            .distinct()
        )
        cand_toks = with_toks.join(cand_ids, id_col, "left_semi")
        out = out.unionByName(_percolate_chunked(cand_toks, routable, id_col))
    return out
