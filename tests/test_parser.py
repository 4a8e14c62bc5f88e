from trinity_spark.plans.ast import And, ConstTrue, Not, Or, Phrase, Some, Token
from trinity_spark.plans.parser import parse_query


def test_single_term():
    assert parse_query("error") == Token("error")


def test_case_folding_through_tokenizer():
    assert parse_query("I.B.M") == Token("ibm")


def test_and_explicit_and_implicit():
    assert parse_query("error AND timeout") == And((Token("error"), Token("timeout")))
    assert parse_query("error timeout") == And((Token("error"), Token("timeout")))


def test_or_keyword_and_pipe():
    assert parse_query("a OR b | c") == Or((Token("a"), Token("b"), Token("c")))


def test_precedence_and_over_or():
    q = parse_query("a b OR c d")
    assert q == Or((And((Token("a"), Token("b"))), And((Token("c"), Token("d")))))


def test_not_and_minus():
    assert parse_query("error NOT test") == Not(Token("error"), Token("test"))
    assert parse_query("error -test") == Not(Token("error"), Token("test"))


def test_phrase():
    assert parse_query('"connection reset by peer"') == Phrase(
        ("connection", "reset", "by", "peer")
    )
    assert parse_query('"single"') == Token("single")


def test_hyphenated_word_becomes_phrase():
    assert parse_query("zxqv-marker-7") == Phrase(("zxqv", "marker", "7"))


def test_group():
    q = parse_query("(a OR b) AND c")
    assert q == And((Or((Token("a"), Token("b"))), Token("c")))


def test_consttrue():
    assert parse_query("error <timeout>") == And(
        (Token("error"), ConstTrue(Token("timeout")))
    )


def test_matchsome():
    q = parse_query("[gpu, cuda, driver, kernel] min=2")
    assert q == Some((Token("gpu"), Token("cuda"), Token("driver"), Token("kernel")), 2)


def test_matchsome_min_equals_n_collapses_to_and():
    q = parse_query("[a, b] min=2")
    assert q == And((Token("a"), Token("b")))


def test_dup_collapse():
    q = parse_query("error error timeout")
    assert q == And((Token("error", rep=2), Token("timeout")))


def test_strict_and():
    q = parse_query("+error +timeout")
    assert q == And((Token("error"), Token("timeout")))


def test_mixed_nested():
    q = parse_query('("rate limit" OR throttle) AND api NOT sandbox')
    assert q == Not(
        And((Or((Phrase(("rate", "limit")), Token("throttle"))), Token("api"))),
        Token("sandbox"),
    )


def test_empty_query():
    assert parse_query("") is None
    assert parse_query("!!!") is None


def test_query_trim_keep_first():
    """MaxQueryTokens trim (queries.cpp:1503-1526): tokens past the cap are
    dropped keep-first at parse time; a phrase counts its member terms."""
    from trinity_spark.plans.ast import query_terms
    from trinity_spark.plans.parser import MAX_QUERY_TOKENS

    node = parse_query(" OR ".join(f"w{i:04d}" for i in range(50)), max_tokens=10)
    assert node == Or(tuple(Token(f"w{i:04d}") for i in range(10)))
    # a phrase counts its members; the AND collapses around the dropped token
    assert parse_query('"a b c" AND d', max_tokens=3) == Phrase(("a", "b", "c"))
    # default cap bounds a pathological query
    big = " ".join(f"t{i}" for i in range(MAX_QUERY_TOKENS + 500))
    n = parse_query(big)
    assert len(query_terms(n)) == MAX_QUERY_TOKENS


def test_trimmed_pathological_query_plans(spark):
    """A huge disjunction is trimmed to a bounded expression that the planner
    compiles and executes."""
    from trinity_spark.operators.build import (
        build_field_stats,
        build_postings,
        build_term_dict,
        tokenize_turns,
    )
    from trinity_spark.plans.planner import LogicalIndex, QueryPlanner

    docs = [(0, "w0001 alpha"), (1, "w0002 beta"), (2, "w9999 unrelated")]
    pdf = spark.createDataFrame(docs, "doc_id long, text string")
    postings = build_postings(tokenize_turns(pdf))
    index = LogicalIndex(
        postings, build_term_dict(postings), build_field_stats(postings, 3)
    )
    q = " OR ".join(f"w{i:04d}" for i in range(5000))
    node = parse_query(q, max_tokens=256)
    from trinity_spark.plans.ast import query_terms

    assert len(query_terms(node)) == 256
    got = {r["doc_id"] for r in QueryPlanner(index).plan(node, k=10).collect()}
    assert got == {0, 1}  # w0001/w0002 kept, w9999 is beyond the cap anyway


def test_matchsome_min_zero_degenerates_to_or():
    # oracle semantics: candidates are the UNION of child matches, so
    # min=0 is exactly OR (matched >= 0 would otherwise admit everything
    # downstream in predicate compilers)
    assert parse_query("[a, b] min=0") == Or((Token("a"), Token("b")))


def test_trailing_plus_raises_parse_error_not_indexerror():
    import pytest

    from trinity_spark.plans.parser import QueryParseError

    with pytest.raises(QueryParseError):
        parse_query("foo +")


def test_not_with_prefix_minus_operand():
    """Regression: 'a NOT -b' leaked the internal _Neg marker into the AST
    and crashed downstream walks with TypeError; '-' is itself negation, so
    NOT -b excludes b."""
    from trinity_spark.plans.ast import Not, Token

    n = parse_query("a NOT -b")
    assert isinstance(n, Not)
    assert n.req == Token("a") and n.excl == Token("b")


def test_min_assignment_is_positional():
    """'min=N' is the MatchSome k-assignment only right after ']'; anywhere
    else it is ordinary query text (regression: 'cpu min=90' raised)."""
    from trinity_spark.plans.ast import And, Phrase, Some, Token

    n = parse_query("cpu min=90")
    assert n == And((Token("cpu"), Phrase(("min", "90"))))
    # the grammar position still works, with and without whitespace
    assert parse_query("[a, b, c] min=2") == Some(
        (Token("a"), Token("b"), Token("c")), 2
    )
    assert parse_query("[a, b, c] min = 2") == Some(
        (Token("a"), Token("b"), Token("c")), 2
    )
