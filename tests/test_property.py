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


# --- substring-window dedup property gate -----------------------------------
#
# Brute-force python reference for the whole family: windows, corpus-wide
# duplicate counts, per-doc interval-union coverage, and span removal with
# the canonical (start, doc_id) exemption.

def _py_substring(docs, window, stride=1, min_count=2):
    wins = {}  # key -> [(doc, start)]
    toks = {d: t.split() for d, t in docs}
    for d, t in docs:
        tk = toks[d]
        for s in range(0, max(len(tk) - window + 1, 0), 1):
            if s % stride:
                continue
            wins.setdefault(" ".join(tk[s:s + window]), []).append((d, s))
    dup = {k: v for k, v in wins.items() if len(v) >= min_count}
    per_doc_starts = {}
    for occs in dup.values():
        for d, s in occs:
            per_doc_starts.setdefault(d, set()).add(s)
    stats = {}
    for d, t in docs:
        tk = toks[d]
        starts = sorted(per_doc_starts.get(d, ()))
        covered = set()
        for s in starts:
            covered.update(range(s, s + window))
        n_wins = (len(tk) - window) // stride + 1 if len(tk) >= window else 0
        stats[d] = (len(tk), n_wins, len(starts), len(covered))
    removable = {}
    for occs in dup.values():
        canon = min(occs, key=lambda p: (p[1], p[0]))  # (start, doc_id) min
        for d, s in occs:
            if (d, s) != canon:
                removable.setdefault(d, set()).add(s)
    cleaned = {}
    for d, t in docs:
        tk = toks[d]
        cut = set()
        for s in removable.get(d, ()):
            cut.update(range(s, s + window))
        cleaned[d] = " ".join(tok for i, tok in enumerate(tk) if i not in cut)
    return stats, cleaned


@st.composite
def _dup_docs(draw):
    vocab = ["a", "b", "c", "d", "e"]
    n_docs = draw(st.integers(2, 6))
    out = []
    for d in range(n_docs):
        n = draw(st.integers(0, 14))
        out.append((d, " ".join(draw(st.sampled_from(vocab)) for _ in range(n))))
    return out


@settings(
    max_examples=int(__import__("os").environ.get("TRINITY_PROP_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_dup_docs(), window=st.integers(2, 4), stride=st.integers(1, 3))
def test_substring_family_matches_bruteforce(spark, docs, window, stride):
    from trinity_spark.dataops.dedup import remove_duplicate_spans, substring_dup_stats

    # strip whitespace-empty texts: split("") yields [''] both sides, but the
    # python reference treats "" as zero tokens — keep the property crisp
    docs = [(d, t) for d, t in docs if t]
    if not docs:
        return
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    stats, cleaned = _py_substring(docs, window, stride)

    # anchor="position": the brute-force reference models the position
    # grid; the content-anchor default has its own dedicated test
    got = {r["doc_id"]: r for r in
           substring_dup_stats(
               sdf, window=window, stride=stride, anchor="position"
           ).collect()}
    assert set(got) == set(stats)
    for d, (n_tok, n_win, n_dup, covered) in stats.items():
        r = got[d]
        assert r["n_tokens"] == n_tok, (d, docs)
        assert r["n_windows"] == n_win, (d, docs)
        assert r["n_dup_windows"] == n_dup, (d, docs)
        want_frac = min(covered / n_tok, 1.0) if n_tok else 0.0
        assert abs(r["dup_token_frac"] - want_frac) < 1e-6, (d, docs)

    if stride == 1:  # canonical-removal reference assumes stride-1 windows
        got_c = {r["doc_id"]: r["text_clean"] for r in
                 remove_duplicate_spans(sdf, window=window).collect()}
        assert got_c == cleaned, docs


@given(
    corpus=corpora(),
    qs=st.lists(asts(), min_size=2, max_size=5),
    add_optionals=st.booleans(),
)
@settings(
    max_examples=int(__import__("os").environ.get("TRINITY_PROP_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_percolate_routed_matches_full(sparkref, corpus, qs, add_optionals):
    """Routing soundness as a property: for random registries (incl.
    optional-only and mixed-optional queries) over random corpora, the
    term-routed percolation must produce exactly the full-scan match set —
    if routing_terms ever returned an unsound set, a match would go missing
    here."""
    from trinity_spark.operators.percolator import percolate, percolate_routed
    from trinity_spark.plans.ast import ConstTrue

    spark = sparkref
    nodes = {}
    for i, q in enumerate(qs):
        n = q.normalize()
        if n is not None:
            nodes[f"q{i}"] = n
    if add_optionals and nodes:
        first = next(iter(nodes.values()))
        nodes["opt_all"] = And((ConstTrue(Token("error")), ConstTrue(Token("gpu"))))
        nodes["opt_mix"] = And((ConstTrue(Token("gpu")), first))
    if not nodes:
        return
    docs = spark.createDataFrame(
        [(i, t) for i, (_, _, t) in enumerate(sorted(corpus))],
        "doc_id long, text string",
    )
    full = sorted(
        (r["doc_id"], r["query_id"]) for r in percolate(docs, nodes).collect()
    )
    routed = sorted(
        (r["doc_id"], r["query_id"])
        for r in percolate_routed(docs, nodes).collect()
    )
    assert routed == full


# ---------------------------------------------------------------------------
# Random ASTs against a PHYSICAL multi-segment store with NRT and tombstones
# ---------------------------------------------------------------------------
# The gates above run over LogicalIndex (in-memory postings frames); the
# 18-class oracle gate covers physical segments but with FIXED query shapes.
# This closes the matrix cell left open — random trees x physical store —
# one store built per module (3 batch segments + an NRT micro-segment +
# tombstones), every hypothesis draw planning against its decoded blocks.
# Stats identity holds because BOTH sides keep masked docs in df/N until a
# merge folds them in (index_source.h:160-189 masked-docs semantics).


@pytest.fixture(scope="module")
def phys_oracle(spark, tmp_path_factory):
    from trinity_spark.operators.indexer import SegmentIndex, build_index
    from trinity_spark.sources.store import SegmentStore
    from trinity_spark.streaming.nrt import append_micro_segment

    rng = np.random.default_rng(202)
    rows = []
    for i in range(60):
        k = int(rng.integers(1, 12))
        rows.append((f"pc{i:04d}", 0, " ".join(rng.choice(VOCAB, size=k))))
    store = SegmentStore(str(tmp_path_factory.mktemp("prop_phys")))
    build_index(
        spark,
        spark.createDataFrame(rows, "conv_id string, turn_idx int, text string"),
        store,
        rows_per_segment=25,
    )
    nrt_rows = []
    for i in range(60, 68):
        k = int(rng.integers(1, 12))
        nrt_rows.append((f"pc{i:04d}", 0, " ".join(rng.choice(VOCAB, size=k))))
    append_micro_segment(
        spark,
        store,
        spark.createDataFrame(nrt_rows, "conv_id string, turn_idx int, text string"),
        input_desc="prop-phys-nrt",
    )
    texts = {(c, t): x for c, t, x in rows + nrt_rows}
    dm = store.read_docid_map(spark).select("conv_id", "turn_idx", "doc_id").collect()
    docs = sorted(
        (int(r["doc_id"]), texts[(r["conv_id"], r["turn_idx"])]) for r in dm
    )
    # tombstone a spread of ids: batch-segment docs and one NRT doc
    all_ids = [d for d, _ in docs]
    deleted = {all_ids[3], all_ids[17], all_ids[41], all_ids[-2]}
    store.add_deletes(spark, sorted(deleted))
    index = SegmentIndex(spark, store)
    oracle = OracleIndex.build(docs, deleted=deleted)
    return index, oracle


@given(q=asts())
@settings(
    max_examples=int(__import__("os").environ.get("TRINITY_PROP_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_random_ast_physical_store_matches_oracle(phys_oracle, q):
    q = q.normalize()
    if q is None:
        return
    index, oracle = phys_oracle
    want = oracle.topk(q, k=50)
    got = [
        (r["doc_id"], r["score"])
        for r in QueryPlanner(index).plan(q, k=50).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= 1e-9, (q, gd)
