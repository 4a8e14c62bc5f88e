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
