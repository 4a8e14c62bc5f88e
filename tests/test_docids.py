"""Dense doc_id assignment: stable (conv_id, turn_idx) order, dense ids,
driver-known count — including the non-dense turn_idx fallback path."""

import pandas as pd

from trinity_spark.fixtures import gen_transcripts
from trinity_spark.operators.docids import assign_doc_ids_counted


def _check(spark, pdf, num_partitions):
    sdf, n = assign_doc_ids_counted(spark.createDataFrame(pdf), num_partitions)
    got = sdf.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert n == len(pdf)
    assert list(got["doc_id"]) == list(range(len(pdf)))  # dense from 0
    want = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["turn_idx"]) == list(want["turn_idx"])
    assert list(got["text"]) == list(want["text"])  # per-turn text equality


def test_dense_turn_idx_path(spark):
    _check(spark, gen_transcripts(700), num_partitions=5)


def test_sparse_turn_idx_fallback(spark):
    """Gappy / non-zero-based turn_idx must still enumerate in (conv_id,
    turn_idx) order via the row_number fallback."""
    pdf = gen_transcripts(400)
    pdf = pdf.copy()
    pdf["turn_idx"] = pdf["turn_idx"] * 3 + 7  # gaps + nonzero start
    _check(spark, pdf, num_partitions=4)


def test_duplicate_turn_idx_with_gap_routes_to_fallback(spark):
    """turn_idx [0, 0, 2, 3] passes the min/max/count screen (min=0, max=n-1,
    count=n) but is NOT a permutation; the exact distinct-count test must
    route such convs to the row_number path so doc_ids stay unique — the
    arithmetic path would mint base+0 twice."""
    rows = []
    for c in range(6):
        idxs = [0, 1, 2, 3] if c % 2 == 0 else [0, 0, 2, 3]
        for i, t in enumerate(idxs):
            rows.append(
                {
                    "conv_id": f"c{c:03d}",
                    "turn_idx": t,
                    "role": "user",
                    "text": f"msg {c} {i}",
                    "tool": "",
                    "ts": pd.Timestamp("2026-01-01"),
                }
            )
    pdf = pd.DataFrame(rows)
    sdf, n = assign_doc_ids_counted(spark.createDataFrame(pdf), 3)
    got = sdf.toPandas()
    assert n == len(pdf)
    assert sorted(got["doc_id"]) == list(range(len(pdf)))  # unique AND dense
    # each conversation still owns a contiguous doc_id range in conv order
    by_conv = got.groupby("conv_id")["doc_id"].agg(["min", "max", "count"])
    base = 0
    for conv_id in sorted(by_conv.index):
        r = by_conv.loc[conv_id]
        assert (r["min"], r["max"], r["count"]) == (base, base + 3, 4), conv_id
        base += 4


def test_single_conversation_many_partitions(spark):
    pdf = gen_transcripts(120)
    pdf = pdf.copy()
    pdf["conv_id"] = "conv-000"
    pdf["turn_idx"] = range(len(pdf))
    _check(spark, pdf, num_partitions=6)


def test_null_conv_id_raises(spark):
    """NULL conv_id would be counted in n_docs but dropped by the equi-join
    back to the corpus — silent index corruption.  Must fail loudly, at the
    same collect the drift check already pays (zero extra actions)."""
    import pytest

    from trinity_spark.operators.docids import assign_doc_ids_counted

    df = spark.createDataFrame(
        [("c1", 0, "a"), ("c1", 1, "b"), (None, 0, "ghost")],
        "conv_id string, turn_idx int, text string",
    )
    with pytest.raises(ValueError, match="NULL conv_id"):
        assign_doc_ids_counted(df)


def test_long_conv_duplicate_with_gap_routes_to_fallback(spark):
    """A conversation longer than the 62-slot dense-test bitmap whose
    turn_idx stream passes the min/max/count screen (min=0, max=n-1,
    count=n) but contains a duplicate+gap: the exact filtered
    countDistinct pass must catch it and route the corpus to the
    row_number fallback so doc_ids stay unique."""
    rows = []
    # 70 turns: 0, 1, ..., 67, 67, 69  -> count=70, min=0, max=69, dup at 67
    idxs = list(range(68)) + [67, 69]
    for i, t in enumerate(idxs):
        rows.append(
            {
                "conv_id": "c-long",
                "turn_idx": t,
                "role": "user",
                "text": f"msg {i}",
                "tool": "",
                "ts": pd.Timestamp("2026-01-01"),
            }
        )
    pdf = pd.DataFrame(rows)
    sdf, n = assign_doc_ids_counted(spark.createDataFrame(pdf), 3)
    got = sdf.toPandas()
    assert n == len(pdf)
    assert sorted(got["doc_id"]) == list(range(len(pdf)))  # unique AND dense


def test_worker_attach_matches_broadcast_join(spark, tmp_path):
    """The fused worker-side conv-base attach (each Python worker loads
    conv_bases once and computes doc_id = base + turn_idx itself) must
    produce byte-identical postings and identical query results to the
    broadcast-join docmap path it replaces."""
    import shutil

    import trinity_spark.operators.docids as D
    import trinity_spark.operators.indexer as I
    from pyspark.sql import functions as F
    from trinity_spark.fixtures import gen_transcripts
    from trinity_spark.operators.indexer import SegmentIndex, build_index
    from trinity_spark.plans.planner import QueryPlanner
    from trinity_spark.sources.store import SegmentStore

    df = spark.createDataFrame(gen_transcripts(12_000))
    saved = D.BROADCAST_MAX_CONVS
    outs = {}
    try:
        for label, thresh in [("worker", 8_000_000), ("join", 0)]:
            D.BROADCAST_MAX_CONVS = thresh
            I.BROADCAST_MAX_CONVS = thresh
            base = str(tmp_path / f"attach_{label}")
            shutil.rmtree(base, ignore_errors=True)
            st = SegmentStore(base)
            build_index(spark, df, st, rows_per_segment=5_000,
                        input_desc="eq", docid_map_mode="virtual")
            idx = SegmentIndex(spark, st)
            p = QueryPlanner(idx)
            rows = {
                q: [(r["doc_id"], r["score"]) for r in p.plan(q, k=10).collect()]
                for q in ("error AND timeout", '"connection reset by peer"')
            }
            dig = idx.postings.select(
                F.expr("bit_xor(xxhash64(term, doc_id, tf))")
            ).collect()[0][0]
            outs[label] = (rows, int(dig), len(st.segments()))
    finally:
        D.BROADCAST_MAX_CONVS = saved
        I.BROADCAST_MAX_CONVS = saved
    assert outs["worker"] == outs["join"]
