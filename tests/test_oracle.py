"""Golden-value tests for the pocket oracle: BM25 formulas computed by hand
from /root/reference/similarity.h:179-184,228-235."""

import math

from trinity_spark.functions.bm25 import K1, idf_py, term_score_py
from trinity_spark.oracle import OracleIndex
from trinity_spark.plans.parser import parse_query

DOCS = [
    (0, "error timeout error"),
    (1, "error retry"),
    (2, "timeout backoff retry retry"),
    (3, "all quiet here"),
    (4, "connection reset by peer now"),
    (5, "a connection reset by peer and another connection reset by peer"),
]


def make():
    return OracleIndex.build(DOCS)


def test_idf_formula():
    # df(error)=2, N=6: idf = ln(1 + (6-2+0.5)/(2+0.5)) = ln(1+1.8) = ln(2.8)
    assert math.isclose(idf_py(2, 6), math.log(2.8), rel_tol=0, abs_tol=1e-15)


def test_term_score_no_length_norm():
    # tf=2: score = idf * 2/(2+1.2) -- norm fixed to k1 (similarity.h:169-173)
    idf = idf_py(2, 6)
    assert math.isclose(term_score_py(idf, 2), idf * 2 / 3.2, abs_tol=1e-15)


def test_single_term_topk():
    idx = make()
    got = idx.topk(parse_query("error"), k=10)
    idf = idf_py(2, 6)
    # doc0 tf=2 beats doc1 tf=1
    assert got == [(0, idf * (2 / (2 + K1))), (1, idf * (1 / (1 + K1)))]


def test_and_sums_in_order():
    idx = make()
    got = idx.topk(parse_query("error AND timeout"), k=10)
    s = term_score_py(idf_py(2, 6), 2) + term_score_py(idf_py(2, 6), 1)
    assert got == [(0, s)]


def test_or_and_tie_break_by_doc_id():
    idx = make()
    got = idx.topk(parse_query("error OR timeout"), k=10)
    # doc0 matches both; doc1 (error tf=1) and doc2 (timeout tf=1) score
    # identically (same df) -> tie broken by ascending doc_id
    assert [d for d, _ in got] == [0, 1, 2]
    scores = dict(got)
    assert scores[1] == scores[2]


def test_not():
    idx = make()
    got = idx.topk(parse_query("error NOT retry"), k=10)
    assert [d for d, _ in got] == [0]


def test_phrase_freq_is_bm25_freq():
    idx = make()
    got = idx.topk(parse_query('"connection reset by peer"'), k=10)
    assert [d for d, _ in got] == [5, 4]  # doc5 has phrase twice
    idf = sum(idf_py(2, 6) for _ in range(4))
    assert math.isclose(got[0][1], idf * (2 / (2 + K1)), abs_tol=1e-12)
    assert math.isclose(got[1][1], idf * (1 / (1 + K1)), abs_tol=1e-12)


def test_minmatch():
    idx = make()
    got = idx.topk(parse_query("[error, timeout, backoff] min=2"), k=10)
    assert set(d for d, _ in got) == {0, 2}


def test_optional_adds_score_never_filters():
    idx = make()
    plain = dict(idx.topk(parse_query("error"), k=10))
    opt = dict(idx.topk(parse_query("error <timeout>"), k=10))
    assert set(plain) == set(opt)
    assert opt[0] > plain[0]  # doc0 has timeout -> boosted
    assert opt[1] == plain[1]  # doc1 doesn't -> unchanged


def test_deleted_docs_never_returned():
    idx = OracleIndex.build(DOCS, deleted={0})
    got = idx.topk(parse_query("error"), k=10)
    assert [d for d, _ in got] == [1]
