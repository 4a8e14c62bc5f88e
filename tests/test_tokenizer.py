"""Tokenizer rules cataloged from /root/reference/queries.cpp:2098-2341."""

from trinity_spark.tokenizer import (
    MAX_POSITION,
    MAX_TERM_LENGTH,
    tokenize_py,
    tokenize_terms_py,
)


def test_basic_alnum_runs():
    assert tokenize_py("Hello, World! 123") == ["hello", "world", "123"]


def test_acronym_collapse():
    assert tokenize_py("I.B.M ships") == ["ibm", "ships"]
    assert tokenize_py("works at i.b.m.") == ["works", "at", "ibm"]
    # single letter + dot is NOT an acronym-in-progress ("a. b" stays)
    assert tokenize_py("e.g. example") == ["eg", "example"]


def test_apostrophe():
    assert tokenize_py("L'Oreal don't") == ["loreal", "dont"]


def test_numeric_normalization():
    assert tokenize_py("9.000 items") == ["9", "items"]
    assert tokenize_py("8.25 rate") == ["8.25", "rate"]


def test_digit_led_dot_sequences_are_numeric_not_acronyms():
    """Acronym collapse requires a LETTER first char (queries.cpp:2120
    _isalpha(*p)); digit-led text follows the numeric rules instead.
    Regression: 9.0 used to collapse to 90 and 1.5 to 15."""
    assert tokenize_py("9.0 ok") == ["9", "ok"]
    assert tokenize_py("1.5 rate") == ["1.5", "rate"]
    # one- and two-digit fractional parts agree now (9.5 vs 9.50)
    assert tokenize_py("9.5 then 9.50") == ["9.5", "then", "9.50"]
    # letter-led mixed-alnum acronyms still collapse (M.P.ACT-style)
    assert tokenize_py("a.1.b x") == ["a1b", "x"]


def test_hyphen_splits():
    assert tokenize_py("zxqv-marker-7") == ["zxqv", "marker", "7"]


def test_empty_and_null():
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("!!! ???") == []


def test_max_term_length_dropped():
    long = "x" * (MAX_TERM_LENGTH + 1)
    toks = tokenize_terms_py(f"ok {long} fine")
    assert [t for t, _ in toks] == ["ok", "fine"]
    assert [p for _, p in toks] == [1, 2]  # positions assigned post-filter


def test_max_position_cap():
    text = " ".join(f"t{i}" for i in range(MAX_POSITION + 100))
    toks = tokenize_terms_py(text)
    assert len(toks) == MAX_POSITION
    assert toks[-1][1] == MAX_POSITION


def test_positions_one_based():
    assert tokenize_terms_py("a b a") == [("a", 1), ("b", 2), ("a", 3)]


def test_spark_parity(spark):
    """The pandas-UDF + JVM-limits path must equal the python core."""
    from pyspark.sql import functions as F

    from trinity_spark.tokenizer import tokens_column

    texts = [
        "Hello, World! 123",
        "I.B.M ships L'Oreal don't 9.000 8.25",
        "zxqv-marker-7 the THE The",
        "",
        None,
        "x" * 70 + " ok",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(tokens_column(F.col("text"))).collect()]
    want = [[t for t, _ in tokenize_terms_py(t)] for t in texts]
    assert got == want


def test_word_tail_operator_tokens():
    """Reference queries.cpp:2153-2163 + l10: an alpha head + ':' + domain
    tail is consumed and stored as ONE raw token."""
    assert tokenize_py("site:google.com") == ["site:google.com"]
    assert tokenize_py("SITE:X-Box.Com rocks") == ["site:x-box.com", "rocks"]
    assert tokenize_py("site:.gr") == ["site:.gr"]
    assert tokenize_py("foo:bar baz") == ["foo:bar", "baz"]
    assert tokenize_py("3:2") == ["3", "2"]  # head must be alphabetic
    assert tokenize_py("word:") == ["word"]  # no tail -> plain token
    assert tokenize_py("a:b-") == ["a:b"]  # dash needs alnum on both sides
    assert tokenize_py("a:b..c") == ["a:b", "c"]  # dot needs following alnum
    assert tokenize_py("video|games") == ["video", "games"]


def test_word_tail_spark_parity(spark):
    from pyspark.sql import functions as F

    from trinity_spark.tokenizer import tokens_column

    texts = ["query site:x-box.com now", "ftp:a.b-c.d", "site:.gr x:y:z"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(tokens_column(F.col("text"))).collect()]
    want = [[t for t, _ in tokenize_terms_py(t)] for t in texts]
    assert got == want


def test_word_tail_positionless():
    """word:tail operator tokens carry position 0 (codecs.h:191-195) while
    still consuming their sequence slot — neighbors keep their distances."""
    assert tokenize_terms_py("alpha site:x-box.com beta") == [
        ("alpha", 1),
        ("site:x-box.com", 0),
        ("beta", 3),
    ]


def test_phrase_excludes_positionless_oracle():
    from trinity_spark.oracle import OracleIndex
    from trinity_spark.plans.parser import parse_query

    docs = [
        (0, "alpha site:x.com beta"),   # operator between: NOT adjacent
        (1, "alpha beta"),              # truly adjacent
        (2, "alpha site:x.com"),        # phrase THROUGH the operator
    ]
    oracle = OracleIndex.build(docs)
    assert [d for d, _ in oracle.topk(parse_query('"alpha beta"'), 10)] == [1]
    assert oracle.topk(parse_query('"alpha site:x.com"'), 10) == []
    # boolean/tf semantics unaffected: the operator term still scores
    assert [d for d, _ in oracle.topk(parse_query("site:x.com"), 10)] == [0, 2]


def test_phrase_excludes_positionless_engine(spark):
    """Engine matches the oracle on phrases around/through operator tokens —
    the last reference-parity deviation from round 2, now closed."""
    import pandas as pd

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

    texts = [
        "alpha site:x.com beta gamma",
        "alpha beta gamma",
        "alpha site:x.com",
        "site:x.com alpha beta",
    ]
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": [0] * len(texts),
            "text": texts,
        }
    )
    turns = assign_doc_ids(spark.createDataFrame(pdf), num_partitions=2)
    postings = build_postings(tokenize_turns(turns))
    index = LogicalIndex(
        postings, build_term_dict(postings), build_field_stats(postings, len(texts))
    )
    planner = QueryPlanner(index)
    oracle = OracleIndex.build(list(enumerate(texts)))
    for q in [
        '"alpha beta"',
        '"alpha site:x.com"',
        '"site:x.com alpha"',
        '"beta gamma"',
        'site:x.com AND alpha',
    ]:
        node = parse_query(q)
        want = oracle.topk(node, k=10)
        got = [(r["doc_id"], r["score"]) for r in planner.plan(node, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= 1e-9, q


def test_word_tail_end_to_end_searchable(spark):
    """A word:tail token indexes and queries as one unit."""
    import pandas as pd

    from trinity_spark.operators.build import (
        build_field_stats,
        build_postings,
        build_term_dict,
        tokenize_turns,
    )
    from trinity_spark.operators.docids import assign_doc_ids
    from trinity_spark.plans.planner import LogicalIndex, QueryPlanner

    pdf = pd.DataFrame(
        {
            "conv_id": ["c0", "c0", "c1"],
            "turn_idx": [0, 1, 0],
            "text": [
                "search site:x-box.com for deals",
                "search the web for deals",
                "site:x-box.com again",
            ],
        }
    )
    turns = assign_doc_ids(spark.createDataFrame(pdf), num_partitions=2)
    postings = build_postings(tokenize_turns(turns))
    index = LogicalIndex(
        postings, build_term_dict(postings), build_field_stats(postings, 3)
    )
    got = [r["doc_id"] for r in QueryPlanner(index).plan("site:x-box.com", k=5).collect()]
    assert set(got) == {0, 2}


def test_multidot_numerics_do_not_fabricate_decimals():
    """`.0` inside `1.0.2` is NOT trailing: the old pass collapsed it to the
    fabricated decimal `1.2`, so a query for 1.2 matched version 1.0.2."""
    assert tokenize_py("release 1.0.2") == ["release", "1.0", "2"]
    assert tokenize_py("10.0.5 node") == ["10.0", "5", "node"]
    # genuinely trailing zero-groups still drop, even chained
    assert tokenize_py("version 1.0.0") == ["version", "1"]


def test_word_tail_stored_verbatim_through_normalization():
    """Rule 5: the reference consumes the word:tail region and stores it
    VERBATIM (queries.cpp:2153-2163) — normalization passes must not
    acronym-collapse, apostrophe-join, or num-normalize inside a tail."""
    assert tokenize_py("site:x.y") == ["site:x.y"]
    assert tokenize_py("site:9.0") == ["site:9.0"]
    # apostrophe ends the tail (not in the tail grammar); the remainder
    # tokenizes as plain words instead of joining across the quote
    assert tokenize_py("site:o'neil.com") == ["site:o", "neil", "com"]
