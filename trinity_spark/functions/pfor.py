"""FOR/PFOR block codec — the Lucene-codec wire format, numpy-vectorized.

Reference: Trinity's Lucene codec packs postings in 128-value blocks, each
bit-packed to the block's max bitwidth, with sub-128 tails stored as vInts
(``/root/reference/lucene_codec.cpp:163-208`` encode, ``:596-660`` decode /
skip).  This module reproduces that format shape:

    [u32 n_values]
    [u8 width × n_full_blocks]          (width 0..64; 0 = all-zero block)
    [packed bitstreams, concatenated]   (ceil(128*w/8) bytes per block)
    [tail varbyte]                      (n_values % 128 trailing values)

Vectorization strategy: a Python loop would run per block (the round-1
decode sin); instead blocks are GROUPED BY WIDTH — all blocks of width w
(same byte length) are gathered with one fancy-index into a (k, 16*w) byte
matrix and unpacked in one ``np.unpackbits`` call, so the loop runs over
DISTINCT WIDTHS (<= 64 iterations regardless of data size).

This codec is wired in as an alternative to the default delta+varbyte wire
(``functions/varbyte.py``): on transcript-shaped postings the varbyte stream
is smaller (tf/position deltas are mostly 1-byte) and parquet's ZSTD absorbs
the rest, so varbyte stays the default — the choice is documented in
SURVEY §2.1 and COVERAGE.md; rank parity is score-level and unaffected.
"""

from __future__ import annotations

import numpy as np

from .varbyte import decode_varbyte, encode_varbyte

BLOCK = 128


def _bit_width(values: np.ndarray) -> int:
    m = int(values.max()) if values.size else 0
    return int(m).bit_length()


def pfor_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array into FOR blocks (+ varbyte tail)."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    n_full = n // BLOCK
    full = v[: n_full * BLOCK].reshape(n_full, BLOCK)
    widths = np.array([_bit_width(b) for b in full], dtype=np.uint8)
    parts: list[bytes] = [
        np.uint32(n).tobytes(),
        widths.tobytes(),
    ]
    # pack per distinct width: one unpack/pack matrix op per width group
    packed: dict[int, bytes] = {}
    order: list[tuple[int, int]] = []  # (block_idx, width) in stream order
    by_width: dict[int, list[int]] = {}
    for i, w in enumerate(widths):
        by_width.setdefault(int(w), []).append(i)
        order.append((i, int(w)))
    chunks: dict[int, bytes] = {}
    for w, idxs in by_width.items():
        if w == 0:
            for i in idxs:
                chunks[i] = b""
            continue
        blocks = full[idxs]  # (k, 128)
        bits = (
            (blocks[:, :, None] >> np.arange(w, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.uint8)  # (k, 128, w) little-endian bit order
        raw = np.packbits(bits.reshape(len(idxs), -1), axis=1, bitorder="little")
        nbytes = (BLOCK * w + 7) // 8
        for j, i in enumerate(idxs):
            chunks[i] = raw[j, :nbytes].tobytes()
    for i in range(n_full):
        parts.append(chunks[i])
    parts.append(encode_varbyte(v[n_full * BLOCK :]))
    return b"".join(parts)


def pfor_decode(buf: bytes) -> np.ndarray:
    """Decode FOR blocks (+ varbyte tail) back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    n = int(np.frombuffer(b[:4].tobytes(), dtype=np.uint32)[0])
    n_full = n // BLOCK
    widths = b[4 : 4 + n_full].astype(np.int64)
    lens = (BLOCK * widths + 7) // 8
    starts = 4 + n_full + np.concatenate(([0], np.cumsum(lens)[:-1]))
    out = np.zeros(n_full * BLOCK, dtype=np.uint64)
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        idxs = np.flatnonzero(widths == w)
        nbytes = (BLOCK * w + 7) // 8
        # gather all same-width blocks into one (k, nbytes) matrix
        gather = starts[idxs][:, None] + np.arange(nbytes)
        raw = b[gather]  # (k, nbytes)
        bits = np.unpackbits(raw, axis=1, bitorder="little")[:, : BLOCK * w]
        vals = bits.reshape(len(idxs), BLOCK, w).astype(np.uint64)
        vals = (vals << np.arange(w, dtype=np.uint64)).sum(axis=2, dtype=np.uint64)
        out[(idxs[:, None] * BLOCK + np.arange(BLOCK)).ravel()] = vals.ravel()
    tail_off = int(4 + n_full + lens.sum())
    tail = decode_varbyte(b[tail_off:])
    return np.concatenate([out, tail[: n - n_full * BLOCK]])
