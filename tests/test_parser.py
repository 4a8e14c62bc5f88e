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
