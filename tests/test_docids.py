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


def test_single_conversation_many_partitions(spark):
    pdf = gen_transcripts(120)
    pdf = pdf.copy()
    pdf["conv_id"] = "conv-000"
    pdf["turn_idx"] = range(len(pdf))
    _check(spark, pdf, num_partitions=6)
