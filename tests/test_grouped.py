"""Group-scope (conversation-level) top-k retrieval."""

import pytest
from pyspark.sql import functions as F

from trinity_spark.operators.grouped import grouped_topk


def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def _groups(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, conv_id long")


def test_grouped_topk_sum_and_tiebreak(spark):
    scored = _scored(spark, [(1, 2.0), (2, 1.0), (3, 3.0), (4, 1.5), (5, 1.5)])
    groups = _groups(spark, [(1, 10), (2, 10), (3, 20), (4, 30), (5, 40)])
    out = grouped_topk(scored, groups, k=10).collect()
    assert [(r["conv_id"], r["n_docs"], r["score"]) for r in out] == [
        (10, 2, 3.0),
        (20, 1, 3.0),  # tie with conv 10 -> conv asc
        (30, 1, 1.5),
        (40, 1, 1.5),
    ]


def test_grouped_topk_max_and_k(spark):
    scored = _scored(spark, [(1, 2.0), (2, 9.0), (3, 3.0)])
    groups = _groups(spark, [(1, 10), (2, 10), (3, 20)])
    out = grouped_topk(scored, groups, k=1, agg="max").collect()
    assert [(r["conv_id"], r["score"]) for r in out] == [(10, 9.0)]


def test_grouped_topk_unmatched_groups_absent(spark):
    scored = _scored(spark, [(1, 2.0)])
    groups = _groups(spark, [(1, 10), (2, 20)])
    out = grouped_topk(scored, groups).collect()
    assert [r["conv_id"] for r in out] == [10]


def test_grouped_topk_validates_args(spark):
    s, g = _scored(spark, [(1, 1.0)]), _groups(spark, [(1, 10)])
    with pytest.raises(ValueError, match="agg"):
        grouped_topk(s, g, agg="median")
    with pytest.raises(ValueError, match="k must"):
        grouped_topk(s, g, k=0)


def test_grouped_topk_plan_take_ordered(spark):
    scored = _scored(spark, [(i, float(i)) for i in range(100)])
    groups = _groups(spark, [(i, i // 5) for i in range(100)])
    plan = (
        grouped_topk(scored, groups, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_grouped_topk_end_to_end_with_planner(spark):
    from trinity_spark.fixtures import gen_transcripts
    from trinity_spark.operators.docids import assign_doc_ids
    from trinity_spark.operators.build import (
        build_field_stats,
        build_postings,
        build_term_dict,
        tokenize_turns,
    )
    from trinity_spark.plans.planner import LogicalIndex, QueryPlanner

    turns = assign_doc_ids(
        spark.createDataFrame(gen_transcripts(800)), num_partitions=4
    ).persist()
    postings = build_postings(tokenize_turns(turns))
    index = LogicalIndex(
        postings, build_term_dict(postings), build_field_stats(postings, turns.count())
    )
    planner = QueryPlanner(index)
    scored = planner.score_all("error AND timeout")
    got = grouped_topk(scored, turns.select("doc_id", "conv_id"), k=5).collect()
    # independent recomputation: per-doc scores aggregated driver-side
    rows = scored.join(turns.select("doc_id", "conv_id"), "doc_id").collect()
    agg = {}
    for r in rows:
        n, s = agg.get(r["conv_id"], (0, 0.0))
        agg[r["conv_id"]] = (n + 1, s + r["score"])
    want = sorted(
        ((cid, n, round(s, 6)) for cid, (n, s) in agg.items()),
        key=lambda t: (-t[2], t[0]),
    )[:5]
    assert [(r["conv_id"], r["n_docs"], r["score"]) for r in got] == want
    turns.unpersist()


# --- conversation context windows (transcript KWIC) -------------------------

def test_context_windows_semantics(spark):
    from trinity_spark.operators.grouped import context_windows

    turns = spark.createDataFrame(
        [
            (0, "c1", 0, "intro"),
            (1, "c1", 1, "the error happened"),
            (2, "c1", 2, "stack trace follows"),
            (3, "c1", 3, "resolved"),
            (10, "c2", 0, "hello"),
            (11, "c2", 1, "unrelated"),
        ],
        "doc_id long, conv_id string, turn_idx int, text string",
    )
    hits = spark.createDataFrame([(1,)], "doc_id long")
    got = {(r["hit_doc_id"], r["doc_id"]): r["offset"]
           for r in context_windows(hits, turns, window=1).collect()}
    # hit at c1/1: neighbors 0 and 2, nothing from c2, no turn 3
    assert got == {(1, 0): -1, (1, 1): 0, (1, 2): 1}


def test_context_windows_edges_and_overlap(spark):
    from trinity_spark.operators.grouped import context_windows

    turns = spark.createDataFrame(
        [(i, "c", i, f"t{i}") for i in range(5)],
        "doc_id long, conv_id string, turn_idx int, text string",
    )
    # two hits with overlapping windows; window clipped at conversation edges
    hits = spark.createDataFrame([(0,), (2,)], "doc_id long")
    rows = context_windows(hits, turns, window=2).collect()
    per_hit = {}
    for r in rows:
        per_hit.setdefault(r["hit_doc_id"], set()).add((r["doc_id"], r["offset"]))
    assert per_hit[0] == {(0, 0), (1, 1), (2, 2)}  # clipped at start
    assert per_hit[2] == {(0, -2), (1, -1), (2, 0), (3, 1), (4, 2)}
    # window=0 returns exactly the hits
    only = context_windows(hits, turns, window=0).collect()
    assert sorted((r["doc_id"], r["offset"]) for r in only) == [(0, 0), (2, 0)]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="window"):
        context_windows(hits, turns, window=-1)


def test_context_windows_end_to_end_with_planner(spark):
    """Planner hits -> context windows over the original turns table."""
    from trinity_spark.fixtures import gen_transcripts
    from trinity_spark.operators.build import (
        build_field_stats, build_postings, build_term_dict, tokenize_turns,
    )
    from trinity_spark.operators.docids import assign_doc_ids
    from trinity_spark.operators.grouped import context_windows
    from trinity_spark.plans.planner import LogicalIndex, QueryPlanner

    turns = assign_doc_ids(spark.createDataFrame(gen_transcripts(600)))
    postings = build_postings(tokenize_turns(turns))
    eng = QueryPlanner(LogicalIndex(
        postings, build_term_dict(postings),
        build_field_stats(postings, turns.count()),
    ))
    hits = eng.plan("error AND timeout", k=3)
    ctx = context_windows(hits, turns, window=2).collect()
    hit_ids = {r["doc_id"] for r in hits.collect()}
    assert {r["hit_doc_id"] for r in ctx} == hit_ids
    by_doc = {r["doc_id"]: r for r in turns.collect()}
    for r in ctx:
        h = by_doc[r["hit_doc_id"]]
        assert r["conv_id"] == h["conv_id"]
        assert abs(r["turn_idx"] - h["turn_idx"]) <= 2
        assert r["offset"] == r["turn_idx"] - h["turn_idx"]


def test_facet_counts_matches_hand_counts(spark):
    from trinity_spark.operators.grouped import facet_counts

    matching = spark.createDataFrame(
        [(1,), (2,), (3,), (5,), (5,)], "doc_id long"  # dup match rows ok
    )
    meta = spark.createDataFrame(
        [
            (1, "en", "web"), (2, "en", "web"), (3, "de", "web"),
            (4, "en", "book"),  # not matching: must not count
            (5, "en", "book"), (6, None, "web"),
        ],
        "doc_id long, lang string, source string",
    )
    got = [
        (r["lang"], r["source"], r["n_docs"])
        for r in facet_counts(matching, meta, ["lang", "source"]).collect()
    ]
    assert got == [("en", "web", 2), ("de", "web", 1), ("en", "book", 1)]

    one = facet_counts(matching, meta, ["lang"]).collect()
    assert [(r["lang"], r["n_docs"]) for r in one] == [("en", 3), ("de", 1)]

    import pytest as _pt
    with _pt.raises(ValueError, match="facet"):
        facet_counts(matching, meta, [])


def test_facet_counts_composes_with_matching_docs(spark):
    """End-to-end: facets over planner.matching_docs distribute the match
    set across the turn metadata exactly per a driver-side recount."""
    from trinity_spark.fixtures import gen_transcripts
    from trinity_spark.operators.build import (
        build_field_stats, build_postings, build_term_dict, tokenize_turns,
    )
    from trinity_spark.operators.docids import assign_doc_ids
    from trinity_spark.operators.grouped import facet_counts
    from trinity_spark.plans.planner import LogicalIndex, QueryPlanner

    turns = assign_doc_ids(spark.createDataFrame(gen_transcripts(600)))
    postings = build_postings(tokenize_turns(turns))
    eng = QueryPlanner(LogicalIndex(
        postings, build_term_dict(postings),
        build_field_stats(postings, turns.count()),
    ))
    matching = eng.matching_docs("error OR timeout")
    got = {
        (r["role"],): r["n_docs"]
        for r in facet_counts(matching, turns, ["role"]).collect()
    }
    ids = {r["doc_id"] for r in matching.collect()}
    want: dict = {}
    for r in turns.select("doc_id", "role").collect():
        if r["doc_id"] in ids:
            want[(r["role"],)] = want.get((r["role"],), 0) + 1
    assert got == want and sum(got.values()) == len(ids)
