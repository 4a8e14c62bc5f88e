"""NRT micro-segment appends: batch path + a real Structured Streaming run."""

import os

import pytest

from trinity_spark.fixtures import gen_transcripts
from trinity_spark.operators.indexer import SegmentIndex, build_index
from trinity_spark.oracle import OracleIndex
from trinity_spark.plans.parser import parse_query
from trinity_spark.plans.planner import QueryPlanner
from trinity_spark.sources.store import SegmentStore
from trinity_spark.streaming.nrt import append_micro_segment, start_indexing_stream

N0, N1 = 600, 300


def _oracle_for(base_corpus, appended_corpus):
    """Doc ids: batch order across batches, (conv_id, turn_idx) within."""
    from trinity_spark.fixtures import docs_in_stable_order

    docs = docs_in_stable_order(base_corpus)
    extra = docs_in_stable_order(appended_corpus)
    docs += [(d + len(docs), t) for d, t in extra]
    return OracleIndex.build(docs)


@pytest.fixture()
def seeded_store(spark, tmp_path):
    corpus0 = gen_transcripts(N0)
    store = SegmentStore(str(tmp_path / "idx"))
    build_index(spark, spark.createDataFrame(corpus0), store, rows_per_segment=N0)
    return store, corpus0


def test_batch_append(spark, seeded_store):
    store, corpus0 = seeded_store
    corpus1 = gen_transcripts(N1, seed=99)
    meta = append_micro_segment(spark, store, spark.createDataFrame(corpus1))
    assert meta.doc_lo == N0 and meta.doc_hi == N0 + N1
    assert meta.lineage["mode"] == "nrt-append"

    oracle = _oracle_for(corpus0, corpus1)
    planner = QueryPlanner(SegmentIndex(spark, store))
    for q in ["error", "error AND timeout", "retry OR backoff"]:
        node = parse_query(q)
        want = oracle.topk(node, k=10)
        got = [(r["doc_id"], r["score"]) for r in planner.plan(node, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= 1e-9  # stats summed across micro-segments


def test_structured_streaming_ingest(spark, seeded_store, tmp_path):
    store, corpus0 = seeded_store
    corpus1 = gen_transcripts(N1, seed=99)

    # stage the new batch as files and stream them in with availableNow
    src = str(tmp_path / "incoming")
    spark.createDataFrame(corpus1).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_indexing_stream(spark, store, stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    metas = store.segments()
    assert any(s.lineage.get("mode") == "nrt-append" for s in metas)
    assert sum(s.docs_cnt for s in metas) == N0 + N1

    oracle = _oracle_for(corpus0, corpus1)
    planner = QueryPlanner(SegmentIndex(spark, store))
    node = parse_query("error")
    want = oracle.topk(node, k=10)
    got = [(r["doc_id"], r["score"]) for r in planner.plan(node, k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_replay_after_crash_is_idempotent(spark, seeded_store):
    """Crash between the docid_map slice write and commit_segment: the
    replayed batch must overwrite the same slice (no duplicate doc_id rows,
    no doubled tfs)."""
    from pyspark.sql import functions as F

    from trinity_spark.operators.docids import assign_doc_ids
    from trinity_spark.streaming.nrt import next_doc_id

    store, corpus0 = seeded_store
    corpus1 = gen_transcripts(N1, seed=99)
    df1 = spark.createDataFrame(corpus1)

    # simulate the crashed first attempt: slice written, segment NOT committed
    base = next_doc_id(store)
    sid = f"seg-{base:014d}-{base + N1:014d}"
    with_ids = assign_doc_ids(df1).withColumn(
        "doc_id", (F.col("doc_id") + F.lit(base)).cast("long")
    )
    store.write_docid_map_slice(with_ids, sid)

    # replay: append runs from scratch and must rewrite the same slice
    meta = append_micro_segment(spark, store, df1)
    assert meta.segment_id == sid
    n_rows = store.read_docid_map(spark).where(F.col("doc_id") >= base).count()
    assert n_rows == N1  # no duplicate doc_id rows from the replay

    oracle = _oracle_for(corpus0, corpus1)
    planner = QueryPlanner(SegmentIndex(spark, store))
    for q in ["error", "retry OR backoff"]:
        node = parse_query(q)
        want = oracle.topk(node, k=10)
        got = [(r["doc_id"], r["score"]) for r in planner.plan(node, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= 1e-9  # tfs not doubled


def test_micro_segment_compaction(spark, seeded_store):
    """The NRT story end-to-end: several micro-segments pile up, merge
    compacts them into one, ranks stay oracle-identical."""
    from trinity_spark.operators.merge import merge_segments

    store, corpus0 = seeded_store
    batches = [gen_transcripts(100, seed=50 + i) for i in range(3)]
    for b in batches:
        append_micro_segment(spark, store, spark.createDataFrame(b))
    assert len(store.segments()) == 4  # seed + 3 micro

    from trinity_spark.fixtures import docs_in_stable_order

    docs = list(docs_in_stable_order(corpus0))
    off = len(docs)
    for b in batches:
        part = docs_in_stable_order(b)
        docs += [(d + off, t) for d, t in part]
        off += len(part)
    oracle = OracleIndex.build(docs)

    meta = merge_segments(spark, store)
    assert len(store.segments()) == 1
    assert meta.docs_cnt == len(docs)
    planner = QueryPlanner(SegmentIndex(spark, store))
    for q in ["error", "retry OR backoff", "error AND timeout"]:
        node = parse_query(q)
        want = oracle.topk(node, k=10)
        got = [(r["doc_id"], r["score"]) for r in planner.plan(node, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= 1e-9
