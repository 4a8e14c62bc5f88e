"""Property-based gate (SURVEY.md §5.3): random corpora + random query ASTs —
the Spark engine must equal the brute-force oracle on every draw, and the
reference's structural invariants must hold."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trinity_spark.functions.varbyte import delta_decode, delta_encode
from trinity_spark.operators.build import (
    build_field_stats,
    build_postings,
    build_term_dict,
    tokenize_turns,
)
from trinity_spark.operators.docids import assign_doc_ids
from trinity_spark.oracle import OracleIndex
from trinity_spark.plans.ast import And, Node, Not, Or, Phrase, Some, Token
from trinity_spark.plans.planner import LogicalIndex, QueryPlanner

# includes word:tail operator tokens — they must flow through tokenize ->
# postings -> query -> oracle as single raw terms (queries.cpp:2153-2163)
VOCAB = [
    "error", "timeout", "retry", "gpu", "the", "a", "reset", "peer",
    "x1", "x2", "site:x-box.com", "lang:en",
]

terms = st.sampled_from(VOCAB)


def asts(depth: int = 2) -> st.SearchStrategy[Node]:
    leaf = st.one_of(
        terms.map(Token),
        st.lists(terms, min_size=2, max_size=3).map(lambda t: Phrase(tuple(t))),
    )
    if depth == 0:
        return leaf
    sub = asts(depth - 1)
    return st.one_of(
        leaf,
        st.lists(sub, min_size=2, max_size=3).map(lambda c: And(tuple(c))),
        st.lists(sub, min_size=2, max_size=3).map(lambda c: Or(tuple(c))),
        st.tuples(sub, sub).map(lambda p: Not(p[0], p[1])),
        st.lists(sub, min_size=2, max_size=3).map(lambda c: Some(tuple(c), 2)),
    )


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=5, max_value=40))
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    rows = []
    for i in range(n):
        k = int(rng.integers(1, 12))
        rows.append((f"c{i:04d}", 0, " ".join(rng.choice(VOCAB, size=k))))
    return rows


@pytest.fixture(scope="module")
def sparkref(spark):
    return spark


@given(corpus=corpora(), q=asts())
@settings(
    max_examples=int(__import__("os").environ.get("TRINITY_PROP_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_random_ast_matches_oracle(sparkref, corpus, q):
    q = q.normalize()
    if q is None:
        return
    spark = sparkref
    turns = assign_doc_ids(
        spark.createDataFrame(corpus, "conv_id string, turn_idx int, text string"),
        num_partitions=2,
    )
    postings = build_postings(tokenize_turns(turns))
    index = LogicalIndex(
        postings, build_term_dict(postings), build_field_stats(postings, len(corpus))
    )
    oracle = OracleIndex.build([(i, t) for i, (_, _, t) in enumerate(sorted(corpus))])
    want = oracle.topk(q, k=50)
    got = [(r["doc_id"], r["score"]) for r in QueryPlanner(index).plan(q, k=50).collect()]
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= 1e-9, (q, gd)


@given(corpus=corpora(), q=asts())
@settings(
    max_examples=int(__import__("os").environ.get("TRINITY_PROP_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_random_ast_documents_only_matches_oracle(sparkref, corpus, q):
    """ExecFlags::DocumentsOnly on random trees: the presence-only compile
    must produce exactly the oracle's match SET (scores ignored)."""
    q = q.normalize()
    if q is None:
        return
    spark = sparkref
    turns = assign_doc_ids(
        spark.createDataFrame(corpus, "conv_id string, turn_idx int, text string"),
        num_partitions=2,
    )
    postings = build_postings(tokenize_turns(turns))
    index = LogicalIndex(
        postings, build_term_dict(postings), build_field_stats(postings, len(corpus))
    )
    oracle = OracleIndex.build([(i, t) for i, (_, _, t) in enumerate(sorted(corpus))])
    want = {d for d, _ in oracle.topk(q, k=10**6)}
    got = {r["doc_id"] for r in QueryPlanner(index).matching_docs(q).collect()}
    assert got == want, q


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500))
@settings(max_examples=100, deadline=None)
def test_docids_strictly_increasing_roundtrip(ids):
    """The reference's posting invariant: docIDs strictly increase within a
    list (google_codec.cpp:26-30); our delta codec preserves sorted order."""
    arr = np.array(sorted(set(ids)), dtype=np.uint64)
    back = delta_decode(delta_encode(arr))
    assert (np.diff(back.astype(np.int64)) > 0).all() if len(back) > 1 else True
    assert back.tolist() == arr.tolist()
