"""Selectable wire codec (PFOR) as a first-class segment format:
codec identity in lineage (codecs.h:93-95 / indexer.cpp:268-270 analog),
rank identity off a PFOR-wired store, mixed-codec reads, and the merge
same-codec rule (merge.cpp:256-287: raw copy only between same-codec
segments — mixed inputs re-encode)."""

import numpy as np
import pytest

from trinity_spark.fixtures import docs_in_stable_order, gen_transcripts
from trinity_spark.functions.pfor import (
    pfor_decode_rows,
    pfor_encode,
    pfor_encode_rows,
)
from trinity_spark.operators.indexer import SegmentIndex, build_index
from trinity_spark.operators.merge import merge_segments
from trinity_spark.oracle import OracleIndex
from trinity_spark.plans.parser import parse_query
from trinity_spark.plans.planner import QueryPlanner
from trinity_spark.sources.store import SegmentStore

QUERIES = [
    "error",
    "error AND timeout",
    "retry OR backoff",
    '"rate limit"',
    '("rate limit" OR throttle) AND api NOT sandbox',
]


def _assert_rank_identity(spark, store, corpus_docs, queries=QUERIES):
    oracle = OracleIndex.build(corpus_docs)
    planner = QueryPlanner(SegmentIndex(spark, store))
    for q in queries:
        node = parse_query(q)
        want = oracle.topk(node, k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in planner.plan(node, k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) <= 1e-9, q


def test_pfor_rows_roundtrip_and_per_row_byte_identity():
    rng = np.random.default_rng(7)
    for _ in range(20):
        counts = rng.integers(0, 500, size=rng.integers(1, 30))
        rows = [
            rng.integers(
                0, rng.choice([2, 64, 2**16, 2**40, 2**63]), size=c, dtype=np.uint64
            )
            for c in counts
        ]
        flat = (
            np.concatenate(rows) if counts.sum() else np.empty(0, dtype=np.uint64)
        )
        buf, off = pfor_encode_rows(flat, counts)
        # each row's bytes must equal the single-buffer encoder's output —
        # the two API layers share one wire format
        for i, r in enumerate(rows):
            assert buf[off[i] : off[i + 1]].tobytes() == pfor_encode(r)
        vals, n = pfor_decode_rows(buf, off)
        assert (n == counts).all()
        assert (vals == flat).all()


@pytest.fixture(scope="module")
def pfor_store(spark, tmp_path_factory):
    corpus = gen_transcripts(1200)
    store = SegmentStore(str(tmp_path_factory.mktemp("pfor_idx")))
    build_index(
        spark,
        spark.createDataFrame(corpus),
        store,
        rows_per_segment=400,
        codec="pfor",
    )
    return store, corpus


def test_pfor_store_codec_identity_recorded(pfor_store):
    store, _ = pfor_store
    assert store.default_codec() == "pfor"
    for m in store.segments():
        assert m.lineage["codec"] == "pfor"


def test_pfor_store_rank_identity(spark, pfor_store):
    store, corpus = pfor_store
    _assert_rank_identity(spark, store, docs_in_stable_order(corpus))


def test_pfor_store_fsck_deep(spark, pfor_store):
    store, _ = pfor_store
    rep = store.fsck(spark, deep=True)
    assert rep["ok"], rep["errors"]


def test_pfor_store_merge_preserves_codec_and_reuses(spark, pfor_store):
    store, corpus = pfor_store
    meta = merge_segments(spark, store)
    assert meta.lineage["codec"] == "pfor"
    # same-codec merge keeps the byte-reuse fast path alive
    assert meta.metrics["blocks_reused"] > 0
    _assert_rank_identity(spark, store, docs_in_stable_order(corpus))


def test_nrt_append_inherits_store_codec(spark, tmp_path):
    from trinity_spark.streaming.nrt import append_micro_segment

    corpus = gen_transcripts(500)
    store = SegmentStore(str(tmp_path / "idx"))
    build_index(
        spark, spark.createDataFrame(corpus), store,
        rows_per_segment=500, codec="pfor",
    )
    extra = gen_transcripts(90, seed=11)
    append_micro_segment(spark, store, spark.createDataFrame(extra))
    appended = [m for m in store.segments() if m.lineage.get("mode") == "nrt-append"]
    assert appended and all(m.lineage["codec"] == "pfor" for m in appended)
    docs = docs_in_stable_order(corpus)
    docs += [(d + len(docs), t) for d, t in docs_in_stable_order(extra)]
    _assert_rank_identity(spark, store, docs, queries=["error", '"rate limit"'])


def test_mixed_codec_store_reads_and_merge_reencodes(spark, tmp_path):
    """A store holding segments from BOTH codecs must still answer queries
    rank-identically (codec-tagged read path), and merging it must disable
    byte reuse and re-encode everything at the store default codec — the
    merge.cpp:256-287 same-codec precondition."""
    from trinity_spark.operators.build import (
        field_stats_from_blocks,
        term_dict_from_blocks,
    )
    from trinity_spark.operators.docids import assign_doc_ids
    from trinity_spark.operators.fastbuild import blocks_from_turns
    from trinity_spark.sources.store import SegmentMeta

    corpus_a = gen_transcripts(400)
    corpus_b = gen_transcripts(300, seed=5)
    store = SegmentStore(str(tmp_path / "idx"))
    build_index(
        spark, spark.createDataFrame(corpus_a), store, rows_per_segment=400
    )  # varbyte (default)
    # hand-commit a PFOR segment for the next doc range
    from pyspark.sql import functions as F

    turns_b = assign_doc_ids(spark.createDataFrame(corpus_b)).withColumn(
        "doc_id", (F.col("doc_id") + F.lit(400)).cast("long")
    )
    blocks = blocks_from_turns(turns_b, codec="pfor").persist()
    store.commit_segment(
        blocks,
        term_dict_from_blocks(blocks),
        field_stats_from_blocks(blocks, docs_cnt=300),
        SegmentMeta(
            "seg-pfor-b", 0, 400, 700, 300,
            {"chunk_bits": 16, "codec": "pfor"}, {},
        ),
    )
    blocks.unpersist()

    docs = docs_in_stable_order(corpus_a)
    docs += [(d + 400, t) for d, t in docs_in_stable_order(corpus_b)]
    idx = SegmentIndex(spark, store)
    assert idx.codec == "mixed"
    _assert_rank_identity(spark, store, docs, queries=["error", "error AND timeout", '"rate limit"'])

    meta = merge_segments(spark, store)
    assert meta.metrics["blocks_reused"] == 0  # mixed codecs: no raw copy
    assert meta.lineage["codec"] == store.default_codec() == "varbyte"
    assert SegmentIndex(spark, store).codec == "varbyte"
    _assert_rank_identity(spark, store, docs, queries=["error", '"rate limit"'])


def test_unknown_codec_tag_raises_not_drops(spark, tmp_path):
    """A block row whose codec tag matches no known wire must raise at
    decode — the old per-codec filter union silently VANISHED its postings
    from every query (against the loud-corruption policy)."""
    import pytest

    from trinity_spark.fixtures import gen_transcripts
    from trinity_spark.operators.indexer import build_index
    from trinity_spark.operators.segments import decode_segments
    from trinity_spark.sources.store import SegmentStore

    store = SegmentStore(str(tmp_path / "idx"))
    build_index(
        spark, spark.createDataFrame(gen_transcripts(100)), store,
        rows_per_segment=100,
    )
    from pyspark.sql import functions as F

    blocks = store.read_blocks(spark, with_codec=True).withColumn(
        "codec", F.lit("codec-from-the-future")
    )
    with pytest.raises(Exception, match="unknown wire codec"):
        decode_segments(blocks).count()


def test_payloads_without_positions_honored(spark, tmp_path):
    """with_payloads=True + with_positions=False must skip the position
    stream AND omit the positions column (the flag was silently ignored)."""
    from trinity_spark.fixtures import gen_transcripts
    from trinity_spark.operators.indexer import build_index
    from trinity_spark.operators.segments import decode_segments
    from trinity_spark.sources.store import SegmentStore

    store = SegmentStore(str(tmp_path / "idx2"))
    build_index(
        spark, spark.createDataFrame(gen_transcripts(100)), store,
        rows_per_segment=100,
    )
    out = decode_segments(
        store.read_blocks(spark), with_payloads=True, with_positions=False
    )
    assert "positions" not in out.columns and "payloads" in out.columns
    ref = decode_segments(store.read_blocks(spark), with_payloads=True)
    assert out.count() == ref.count()
