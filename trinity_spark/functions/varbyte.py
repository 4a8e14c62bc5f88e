"""Delta + varbyte posting-block codec, numpy-vectorized.

Format parity target: the reference's Google codec stores posting blocks as
varbyte docID-deltas + varbyte freqs with positions in a parallel stream
(``/root/reference/google_codec.cpp:118-176``); hits are delta+varbyte encoded
during indexing too (``/root/reference/indexer.cpp:73-94``).  The wire format
here is ours (rank parity depends on scores, not bytes): classic LEB128-style
varbyte — 7 data bits per byte, little-endian groups, high bit = continuation.

Everything is numpy array code (loops run over *byte positions* — at most 10
iterations for uint64 — never over elements), so it is safe to call inside
Arrow/pandas UDFs on large batches.
"""

from __future__ import annotations

import numpy as np

_MAX_VARBYTE_LEN = 10  # ceil(64/7)


# 7-bit group boundaries: value v needs k groups iff v >= 2^(7(k-1))
_GROUP_BOUNDS = (np.uint64(1) << (np.uint64(7) * np.arange(1, _MAX_VARBYTE_LEN, dtype=np.uint64)))


def varbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length (number of 7-bit groups, min 1).

    One C searchsorted pass over the 9 group boundaries (zero still takes
    one byte) — no per-group python loop or temporaries."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.int64)
    hi = int(v.max())
    if hi < 0x80:  # the dominant posting-stream case: every value fits 1 byte
        return np.ones(v.shape, dtype=np.int64)
    return (np.searchsorted(_GROUP_BOUNDS, v, side="right") + 1).astype(np.int64)


def encode_varbyte_offsets(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array into (byte_array, per-value byte offsets).

    ``offsets`` has len(values)+1 entries; value i occupies
    ``out[offsets[i]:offsets[i+1]]`` — callers slice contiguous value RANGES
    (e.g. posting blocks) zero-copy out of one encode pass."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    if int(v.max()) < 0x80:
        # all-single-byte stream (the dominant delta/tf case): the encoded
        # bytes ARE the values — no group loop, no offset arithmetic
        return v.astype(np.uint8), np.arange(v.size + 1, dtype=np.int64)
    wide = np.flatnonzero(v >= 0x80)
    if wide.size * 16 < v.size:
        # sparse-wide stream (e.g. doc deltas: only block-start absolutes
        # are multi-byte): write every value as its 1-byte default in one
        # vector store, then patch just the wide values' groups — the group
        # loop runs over the small wide subset instead of the whole array
        nbits = np.ones(v.size, dtype=np.int64)
        vw = v[wide]
        wbits = varbyte_lengths(vw)
        nbits[wide] = wbits
        offsets = np.concatenate(([0], np.cumsum(nbits)))
        out = np.zeros(offsets[-1], dtype=np.uint8)
        out[offsets[:-1]] = (v & np.uint64(0x7F)).astype(np.uint8)
        shifted = vw.copy()
        wpos = offsets[:-1][wide]
        for byte_idx in range(int(wbits.max())):
            sel = wbits > byte_idx
            payload = (shifted[sel] & np.uint64(0x7F)).astype(np.uint8)
            cont = (wbits[sel] > byte_idx + 1).astype(np.uint8) << 7
            out[wpos[sel] + byte_idx] = payload | cont
            shifted[sel] >>= np.uint64(7)
        return out, offsets
    nbits = varbyte_lengths(v)
    offsets = np.concatenate(([0], np.cumsum(nbits)))
    out = np.zeros(offsets[-1], dtype=np.uint8)
    shifted = v.copy()
    for byte_idx in range(int(nbits.max())):
        sel = nbits > byte_idx
        pos = offsets[:-1][sel] + byte_idx
        payload = (shifted[sel] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbits[sel] > byte_idx + 1).astype(np.uint8) << 7
        out[pos] = payload | cont
        shifted[sel] >>= np.uint64(7)
    return out, offsets


def encode_varbyte(values: np.ndarray) -> bytes:
    """Encode a uint64 array to varbyte bytes."""
    out, _ = encode_varbyte_offsets(values)
    return out.tobytes()


def decode_varbyte(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    if not is_last[-1]:
        # the final byte carries the continuation bit: a group is
        # unterminated (partial write / truncated object-store read).
        # Without this check the trailing value silently vanished from the
        # decoded array — corruption must surface as an error, not as
        # missing postings.
        raise ValueError(
            f"decode_varbyte: truncated trailing group ({b.size} bytes, "
            "last byte has the continuation bit set)"
        )
    # group id of each byte = number of completed groups before it
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = ends.size
    values = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    if int(lengths.max()) > 10:
        # a uint64 never needs more than ceil(64/7)=10 varbyte groups; an
        # 11+-byte group is corruption, and shifting payload by >=70 bits
        # would wrap (numpy shift >=64 is undefined) into a garbage value.
        # Same policy as the truncated-trailing-group check above: raise.
        raise ValueError(
            f"decode_varbyte: over-long group ({int(lengths.max())} bytes; "
            "max 10 for uint64) — corrupt buffer"
        )
    payload = (b & 0x7F).astype(np.uint64)
    for byte_idx in range(int(lengths.max())):
        sel = lengths > byte_idx
        values[sel] |= payload[starts[sel] + byte_idx] << np.uint64(7 * byte_idx)
    return values


def delta_encode(sorted_values: np.ndarray, base: int = 0) -> bytes:
    """varbyte(first - base, then successive deltas). Requires ascending input."""
    v = np.asarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0] - np.uint64(base)
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return encode_varbyte(deltas)


def delta_decode(buf: bytes, base: int = 0) -> np.ndarray:
    deltas = decode_varbyte(buf)
    if deltas.size == 0:
        return deltas
    deltas[0] += np.uint64(base)
    return np.cumsum(deltas, dtype=np.uint64)
