"""Shuffle-free postings extraction: turns -> (term, doc_id, tf, positions).

The classic plan (build.py) explodes hits and shuffles them through
``groupBy(term, doc_id)`` — but every posting's rows all come from ONE input
row (a doc's tokens live together), so the aggregation is row-local: this
module computes finished postings inside a single ``mapInArrow`` pass with no
shuffle at all.  At 1M turns this removed ~65% of build wall time; at 10^12
turns it removes a 2.5x-of-corpus-size shuffle entirely (the only remaining
build shuffle is the (term, chunk) repartition that physical encoding needs).

Reference analog: the in-memory per-document hit accumulation of
``SegmentIndexSession::update_document`` (``/root/reference/indexer.cpp:
33-153``) — Trinity also aggregates per (term, doc) before anything global.

Everything is numpy/pandas C-kernels over Arrow batches (factorize, lexsort,
run-length boundaries); no per-row Python.  Output is BIT-IDENTICAL to the
classic path (tests/test_fastbuild.py proves postings-set equality).
"""

from __future__ import annotations

from collections.abc import Iterator
from itertools import chain

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

from ..tokenizer import (
    MAX_POSITION,
    MAX_TERM_LENGTH,
    positionless_mask,
    tokenize_udf,
)

# ONE schema definition: the decode side (segments.py) owns it; a drifted
# copy here would silently emit the old shape from postings_from_turns
from .segments import POSTINGS_SCHEMA  # noqa: E402

_OUT_SCHEMA = pa.schema(
    [
        pa.field("term", pa.string()),
        pa.field("doc_id", pa.int64()),
        pa.field("tf", pa.int32()),
        pa.field("positions", pa.list_(pa.int32())),
    ]
)


def _batch_postings(doc_ids: np.ndarray, token_lists: pd.Series) -> pa.RecordBatch | None:
    lens = token_lists.str.len().fillna(0).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return None
    flat_terms = pd.Series(
        np.fromiter(chain.from_iterable(token_lists), dtype=object, count=total)
    )
    row_idx = np.repeat(np.arange(len(doc_ids)), lens)

    # frozen limits, same order as tokenizer.apply_limits:
    # 1) drop terms longer than MAX_TERM_LENGTH
    keep = (flat_terms.str.len() <= MAX_TERM_LENGTH).to_numpy()
    flat_terms = flat_terms[keep].reset_index(drop=True)
    row_idx = row_idx[keep]
    # 2) positions are 1-based indices in the post-filter stream ...
    new_lens = np.bincount(row_idx, minlength=len(doc_ids))
    starts = np.concatenate(([0], np.cumsum(new_lens)[:-1]))
    positions = (np.arange(len(row_idx)) - np.repeat(starts, new_lens) + 1).astype(np.int64)
    doc_rep = doc_ids[row_idx]
    # 3) ... capped at MAX_POSITION (tokens beyond are dropped)
    cap = positions <= MAX_POSITION
    flat_terms = flat_terms[cap].reset_index(drop=True)
    doc_rep = doc_rep[cap]
    positions = positions[cap]
    if len(doc_rep) == 0:
        return None
    # 4) word:tail operator tokens are positionless (pos 0, codecs.h:191-195)
    # but still consume their slot — distances around them are preserved
    op = positionless_mask(flat_terms).to_numpy()
    if op.any():
        positions = np.where(op, 0, positions)

    codes, uniques = pd.factorize(flat_terms, sort=False)
    order = np.lexsort((positions, codes, doc_rep))
    d, c, p = doc_rep[order], codes[order], positions[order]
    boundary = np.empty(len(d), dtype=bool)
    boundary[0] = True
    boundary[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    run_starts = np.flatnonzero(boundary)
    run_lens = np.diff(np.concatenate((run_starts, [len(d)])))

    offsets = np.concatenate((run_starts, [len(d)])).astype(np.int32)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(np.asarray(uniques, dtype=object)[c[run_starts]], type=pa.string()),
            pa.array(d[run_starts], type=pa.int64()),
            pa.array(run_lens.astype(np.int32), type=pa.int32()),
            pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(p.astype(np.int32), type=pa.int32()),
            ),
        ],
        schema=_OUT_SCHEMA,
    )


def _encode_partition(
    doc: np.ndarray,
    tf: np.ndarray,
    codes: np.ndarray,
    uniques: np.ndarray,
    pos_flat: np.ndarray,
    chunk_bits: int,
    codec: str = "varbyte",
) -> pa.RecordBatch:
    """Vectorized block encoder: one numpy pass over a partition's postings.

    Input rows are (doc, tf, term-code) with per-doc position lists flattened
    in row order; output is one RecordBatch of posting blocks.  No python
    loop touches rows or blocks — binary columns are built zero-copy from one
    encoded buffer + block byte-offsets (pa.BinaryArray.from_buffers): under
    varbyte one ``encode_varbyte_offsets`` pass per stream; under pfor one
    ``pfor_encode_rows`` pass per stream (blocks grouped by bit width —
    lucene_codec.cpp:163-208 shape, batched across every block at once).
    """
    from ..operators.segments import BLOCK_SIZE
    from ..functions.varbyte import encode_varbyte_offsets

    n = len(doc)
    chunk = doc >> np.int64(chunk_bits)
    # order postings by (chunk, term, doc) — the physical layout
    order = np.lexsort((doc, codes, chunk))
    # gather variable-length position rows into the new order (source row
    # offsets MUST come from the pre-reorder tf layout)
    src_offsets = np.concatenate(([0], np.cumsum(tf)))[:-1][order]
    doc, tf, codes, chunk = doc[order], tf[order], codes[order], chunk[order]
    new_offsets = np.concatenate(([0], np.cumsum(tf)))
    gather = np.repeat(src_offsets, tf) + (
        np.arange(new_offsets[-1]) - np.repeat(new_offsets[:-1], tf)
    )
    pos_flat = pos_flat[gather]

    # group = (term, chunk) run; blocks of <= BLOCK_SIZE docs within a group
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = (codes[1:] != codes[:-1]) | (chunk[1:] != chunk[:-1])
    group_ids = np.cumsum(new_group) - 1
    group_first = np.flatnonzero(new_group)
    rank = np.arange(n) - group_first[group_ids]
    new_block = new_group | (rank % BLOCK_SIZE == 0)
    bs = np.flatnonzero(new_block)          # block start row indices
    be = np.append(bs[1:], n)               # block end row indices
    blocks_per_chunk = max((1 << chunk_bits) // BLOCK_SIZE, 1)

    # docID deltas reset at block starts (blocks decode independently)
    d_delta = doc.copy()
    d_delta[1:] -= doc[:-1]
    d_delta[bs] = doc[bs]
    # position deltas reset at each doc's first position
    p_delta = pos_flat.copy()
    p_delta[1:] -= pos_flat[:-1]
    p_delta[new_offsets[:-1]] = pos_flat[new_offsets[:-1]]

    def binary_col(buf: np.ndarray, byte_off: np.ndarray) -> pa.Array:
        # pa.binary() carries int32 offsets: a partition whose encoded stream
        # exceeds 2^31 bytes would silently wrap into garbage blocks — fail
        # loudly instead (split the input into more partitions to proceed)
        if int(byte_off[-1]) >= 2**31:
            raise ValueError(
                f"encoded stream is {int(byte_off[-1])} bytes — over the "
                "int32 Arrow binary-offset limit; repartition the input so "
                "each partition encodes < 2 GiB per stream"
            )
        vo = byte_off.astype(np.int32)
        return pa.Array.from_buffers(
            pa.binary(), len(vo) - 1,
            [None, pa.py_buffer(vo.tobytes()), pa.py_buffer(buf.tobytes())],
        )

    def stream_col(values: np.ndarray, value_bounds: np.ndarray) -> pa.Array:
        """One stream -> per-block wire bytes as an Arrow binary column.
        value_bounds are the per-block value-index bounds (len n_blocks+1)."""
        if codec == "pfor":
            from ..functions.pfor import pfor_encode_rows

            buf, byte_off = pfor_encode_rows(values, np.diff(value_bounds))
            return binary_col(buf, byte_off)
        buf, value_off = encode_varbyte_offsets(values)
        return binary_col(buf, value_off[value_bounds])

    row_bounds = np.append(bs, n)
    pos_bounds = new_offsets[row_bounds]  # value-index bounds in the pos stream
    n_blocks = len(bs)
    # tokenizer hits carry no payloads: an all-empty pay_bytes stream
    empty_pay = pa.Array.from_buffers(
        pa.binary(), n_blocks,
        [None, pa.py_buffer(np.zeros(n_blocks + 1, dtype=np.int32).tobytes()),
         pa.py_buffer(b"")],
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(np.asarray(uniques, dtype=object)[codes[bs]], type=pa.string()),
            pa.array(chunk[bs], type=pa.int64()),
            pa.array(chunk[bs] * blocks_per_chunk + (rank[bs] // BLOCK_SIZE), type=pa.int64()),
            pa.array((be - bs).astype(np.int32), type=pa.int32()),
            pa.array(doc[bs], type=pa.int64()),
            pa.array(doc[be - 1], type=pa.int64()),
            pa.array(np.maximum.reduceat(tf, bs).astype(np.int32), type=pa.int32()),
            pa.array(np.add.reduceat(tf, bs).astype(np.int64), type=pa.int64()),
            stream_col(d_delta.astype(np.uint64), row_bounds),
            stream_col(tf.astype(np.uint64), row_bounds),
            stream_col(p_delta.astype(np.uint64), pos_bounds),
            empty_pay,
        ],
        names=[
            "term", "chunk", "block_id", "doc_count", "min_doc_id", "max_doc_id",
            "max_tf", "sum_tf", "doc_deltas", "tf_bytes", "pos_bytes", "pay_bytes",
        ],
    )


def blocks_from_turns(
    turns: DataFrame,
    text_col: str = "text",
    chunk_bits: int | None = None,
    codec: str = "varbyte",
) -> DataFrame:
    """turns(doc_id, text) -> encoded posting blocks in ONE mapInArrow pass —
    zero shuffles end to end (tokenize -> postings -> delta+varbyte blocks).

    Each input partition becomes an independently-encoded mini-segment slice:
    a (term, chunk) group that straddles a partition boundary yields two
    independent block sets (blocks decode standalone; trinity's per-segment
    term postings are split the same way).  ``operators.merge`` re-encodes
    globally for optimal block packing.
    """
    from ..operators.segments import CHUNK_BITS, SEGMENT_SCHEMA, _check_codec

    _check_codec(codec)
    cb = chunk_bits if chunk_bits is not None else CHUNK_BITS
    tokenize = tokenize_udf.func

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        docs: list[np.ndarray] = []
        tfs: list[np.ndarray] = []
        codes: list[np.ndarray] = []
        pos: list[np.ndarray] = []
        uniq: dict[str, int] = {}
        for batch in batches:
            pdf = batch.to_pandas()
            out = _batch_postings(
                pdf["doc_id"].to_numpy(dtype=np.int64), tokenize(pdf[text_col])
            )
            if out is None:
                continue
            terms = out.column("term").to_pandas()
            c, u = pd.factorize(terms, sort=False)
            # remap batch-local codes into the partition-wide dictionary
            remap = np.empty(len(u), dtype=np.int64)
            for i, t in enumerate(u):
                remap[i] = uniq.setdefault(t, len(uniq))
            codes.append(remap[c])
            docs.append(out.column("doc_id").to_numpy())
            tfs.append(out.column("tf").to_numpy().astype(np.int64))
            pos.append(out.column("positions").flatten().to_numpy().astype(np.int64))
        if not docs:
            return
        uniques = np.empty(len(uniq), dtype=object)
        for t, i in uniq.items():
            uniques[i] = t
        yield _encode_partition(
            np.concatenate(docs), np.concatenate(tfs), np.concatenate(codes),
            uniques, np.concatenate(pos), cb, codec,
        )

    return turns.select("doc_id", text_col).mapInArrow(run, SEGMENT_SCHEMA)


def postings_from_turns(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """turns(doc_id, text, ...) -> postings, zero shuffles.

    Tokenization reuses the frozen tokenize_udf regex pipeline (as a plain
    function on the pandas Series — same code object the UDF wraps)."""
    tokenize = tokenize_udf.func  # the underlying pandas function

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            pdf = batch.to_pandas()
            out = _batch_postings(
                pdf["doc_id"].to_numpy(dtype=np.int64), tokenize(pdf[text_col])
            )
            if out is not None:
                yield out

    return turns.select("doc_id", text_col).mapInArrow(run, POSTINGS_SCHEMA)
