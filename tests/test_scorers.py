"""Pluggable-scorer parity: the reference's Trivial and TF-IDF scorers
(``/root/reference/similarity.h:56-74`` and ``:75-130``) as similarity-seam
drop-ins must rank-match the pocket oracle running the same formulas, across
the boolean/phrase query classes — the per-scorer rank-identity gate the
round-3 verdict asked for ("Next round" #2)."""

import pytest

from trinity_spark.fixtures import docs_in_stable_order, gen_transcripts
from trinity_spark.functions.tfidf import (
    tfidf_score_py,
    tfidf_similarity,
    trivial_score_py,
    trivial_similarity,
)
from trinity_spark.operators.build import (
    build_field_stats,
    build_postings,
    build_term_dict,
    tokenize_turns,
)
from trinity_spark.operators.docids import assign_doc_ids
from trinity_spark.oracle import OracleIndex
from trinity_spark.plans.parser import parse_query
from trinity_spark.plans.planner import LogicalIndex, QueryPlanner

N_TURNS = 900

QUERIES = [
    "error",
    "error AND timeout",
    "retry OR backoff",
    '"rate limit"',
    '("rate limit" OR throttle) AND api NOT sandbox',
    "[error, timeout, retry] min=2",
    "error NOT timeout",
]

SCORERS = {
    "tfidf": (tfidf_similarity, tfidf_score_py),
    "trivial": (trivial_similarity, trivial_score_py),
}


@pytest.fixture(scope="module")
def corpus():
    return gen_transcripts(N_TURNS)


@pytest.fixture(scope="module")
def index(spark, corpus):
    turns = assign_doc_ids(spark.createDataFrame(corpus), num_partitions=5)
    turns.persist()
    postings = build_postings(tokenize_turns(turns)).persist()
    return LogicalIndex(
        postings,
        build_term_dict(postings),
        build_field_stats(postings, docs_cnt=turns.count()),
    )


@pytest.mark.parametrize("name", sorted(SCORERS))
@pytest.mark.parametrize("q", QUERIES)
def test_scorer_rank_identity(spark, corpus, index, name, q):
    sim, score_py = SCORERS[name]
    oracle = OracleIndex.build(docs_in_stable_order(corpus), scorer=score_py)
    node = parse_query(q)
    want = oracle.topk(node, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in QueryPlanner(index, similarity=sim).plan(node, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], (name, q)
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) <= 1e-9, (name, q)


def test_trivial_scores_are_raw_freqs(spark, index):
    """similarity.h:64-66: score(freq) == freq, so a single-token query's
    scores must be exact integers (the doc's tf)."""
    rows = (
        QueryPlanner(index, similarity=trivial_similarity)
        .plan("error", k=10)
        .collect()
    )
    assert rows
    for r in rows:
        assert r["score"] == int(r["score"]) and r["score"] >= 1.0


def test_tfidf_formula_values(spark, index):
    """Spot-check the exact arithmetic against a literal recomputation:
    idf = ln((N+1)/(df+1)) + 1, score = sqrt(tf) * idf (similarity.h:86-95)."""
    import math

    planner = QueryPlanner(index, similarity=tfidf_similarity)
    stats = index.stats_for(["error"])
    rows = planner.plan("error", k=5).collect()
    assert rows
    postings = {
        r["doc_id"]: r["tf"]
        for r in index.postings_for(["error"]).select("doc_id", "tf").collect()
    }
    idf = math.log((stats.n_docs + 1) / (stats.df("error") + 1)) + 1.0
    for r in rows:
        assert abs(r["score"] - math.sqrt(postings[r["doc_id"]]) * idf) <= 1e-9


def test_bm25_default_unchanged(spark, corpus, index):
    """Adding the scorer seam must not perturb the default BM25 path by a
    single bit (the oracle's default scorer reproduces the old float order)."""
    oracle = OracleIndex.build(docs_in_stable_order(corpus))
    node = parse_query('("rate limit" OR throttle) AND api NOT sandbox')
    want = oracle.topk(node, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in QueryPlanner(index).plan(node, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == ws  # exact float64 equality, not tolerance


def test_scorers_on_physical_segments(spark, corpus, tmp_path_factory):
    """The scorer seam must hold off a physical SegmentStore too (decode +
    stats summed across segments feed the same TermContext)."""
    from trinity_spark.operators.indexer import SegmentIndex, build_index
    from trinity_spark.sources.store import SegmentStore

    store = SegmentStore(str(tmp_path_factory.mktemp("scorer_idx")))
    build_index(
        spark, spark.createDataFrame(corpus), store, rows_per_segment=N_TURNS // 2
    )
    idx = SegmentIndex(spark, store)
    for name, (sim, score_py) in SCORERS.items():
        oracle = OracleIndex.build(docs_in_stable_order(corpus), scorer=score_py)
        for q in ["error AND timeout", '"rate limit"']:
            node = parse_query(q)
            want = oracle.topk(node, k=10)
            got = [
                (r["doc_id"], r["score"])
                for r in QueryPlanner(idx, similarity=sim).plan(node, k=10).collect()
            ]
            assert [d for d, _ in got] == [d for d, _ in want], (name, q)
            for (_, gs), (_, ws) in zip(got, want):
                assert abs(gs - ws) <= 1e-9, (name, q)
