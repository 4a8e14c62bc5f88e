"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Shape is fixed by BASELINE.json ``input_hint``:
``transcripts(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)``.  One document = one turn.

Generation is numpy-vectorized and fully determined by ``(n_turns, seed)`` —
independent of partitioning, so the oracle and the engine see byte-identical
text.  The ~5k-word Zipf vocabulary embeds planted patterns so every query
class in queries.jsonl has non-trivial hits:

- high-df stopword-likes (``the``, ``a``, ``to`` ...) for the skew path,
- mid-df topic terms (``error timeout retry backoff gpu cuda driver kernel
  rate limit throttle api sandbox test ...``),
- the exact phrase ``connection reset by peer`` planted at deterministic rows,
- rare markers ``zxqv-marker-7`` (phrase-form, df≈3) and
  ``qqfluxcapacitor`` (single token, df=1..2).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42

_STOPWORDS = ["the", "a", "to", "of", "and", "in", "is", "it", "on", "for"]
_TOPIC = [
    "error", "timeout", "retry", "backoff", "gpu", "cuda", "driver", "kernel",
    "rate", "limit", "throttle", "api", "sandbox", "test", "connection",
    "reset", "peer", "server", "client", "request", "response", "token",
    "model", "agent", "tool", "call", "failed", "success", "latency", "batch",
    "stream", "query", "index", "shard", "replica", "cache", "miss", "hit",
]
_PHRASE = "connection reset by peer"
_RARE_PHRASE = "zxqv-marker-7"
_RARE_TOKEN = "qqfluxcapacitor"
# mid-rare anchor spread uniformly over the doc space (df ~ n/50k, >= 12):
# rare enough for a high idf, frequent enough to saturate top-k — the term
# that makes `anchor OR stopwords` block-max-prunable (its chunks bound high,
# stopword-only chunks bound low)
_ANCHOR_TOKEN = "qqrareanchor"

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["bash", "search", "python", "browser"])


def _vocab(size: int = 5000) -> np.ndarray:
    gen = [f"w{i:04d}" for i in range(size - len(_STOPWORDS) - len(_TOPIC))]
    return np.array(_STOPWORDS + _TOPIC + gen)


def gen_transcripts(n_turns: int, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    # Zipf-ish weights over rank (stopwords first -> huge df)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = 1.0 / (ranks + 2.0)
    probs /= probs.sum()

    # conversations: 1..30 turns, skewed small
    sizes = rng.geometric(0.18, size=max(n_turns // 3, 8)).clip(1, 30)
    # the draw can undershoot n_turns (~1% of seeds at small n): top up with
    # further draws from the same rng — a no-op for seeds that already cover,
    # so existing fixtures stay byte-identical
    while sizes.sum() < n_turns:
        sizes = np.concatenate(
            [sizes, rng.geometric(0.18, size=max(n_turns // 3, 8)).clip(1, 30)]
        )
    cum = np.cumsum(sizes)
    n_conv = int(np.searchsorted(cum, n_turns) + 1)
    sizes = sizes[:n_conv]
    sizes[-1] -= int(cum[n_conv - 1] - n_turns) if cum[n_conv - 1] > n_turns else 0
    conv_ids = np.repeat([f"conv-{i:08d}" for i in range(n_conv)], sizes)
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes])
    n = conv_ids.shape[0]
    assert n == n_turns, (n, n_turns)

    roles = _ROLES[turn_idx % 3]
    tools = np.where(roles == "tool", _TOOLS[rng.integers(0, len(_TOOLS), n)], "")

    # text: 5..40 zipf tokens per turn.  The per-turn " ".join runs as ONE
    # Arrow binary_join over the flat token array (C kernel, ~50x the Python
    # loop at the 8M-turn scaling corpus) — output strings are identical.
    import pyarrow as pa
    import pyarrow.compute as pc

    lens = rng.integers(5, 41, size=n)
    flat = vocab[rng.choice(len(vocab), size=int(lens.sum()), p=probs)]
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = []
    # <=40 tokens/row -> <=80M tokens (~0.5 GB of token bytes) per piece,
    # comfortably inside Arrow's int32 string-offset limit
    row_step = 2_000_000
    for lo in range(0, n, row_step):
        hi = min(lo + row_step, n)
        toks = pa.array(flat[offs[lo] : offs[hi]], type=pa.string())
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        piece = pa.ListArray.from_arrays(
            pa.array(offs[lo : hi + 1] - offs[lo], type=pa.int32()), toks
        )
        texts.extend(pc.binary_join(piece, " ").to_pylist())

    # plant patterns at deterministic rows
    def plant(row: int, payload: str) -> None:
        if 0 <= row < n:
            texts[row] = texts[row] + " " + payload

    for frac in (0.11, 0.37, 0.53, 0.71, 0.89):
        plant(int(n * frac), _PHRASE)
    # phrase with varying repeat counts (distinct phrase-freqs -> distinct scores)
    plant(int(n * 0.23), _PHRASE + " " + _PHRASE)
    for frac in (0.17, 0.61, 0.83):
        plant(int(n * frac), _RARE_PHRASE)
    plant(int(n * 0.41), _RARE_TOKEN)
    plant(int(n * 0.41) + 1, _RARE_TOKEN + " " + _RARE_TOKEN)
    # skew pairing: rare marker co-occurring with the top stopword
    plant(int(n * 0.61) + 1, "the " + _RARE_PHRASE + " the")
    # mid-rare anchor, uniformly spread so its chunks tile the doc space
    n_anchor = max(12, n // 50_000)
    for i in range(n_anchor):
        plant((i * n) // n_anchor + 3, _ANCHOR_TOKEN)

    ts = pd.Timestamp("2026-01-01", tz=None).value // 1000 + np.cumsum(
        rng.integers(1, 120, size=n)
    ) * 1_000_000
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts, unit="us"),
        }
    )


def write_transcripts(path: str, n_turns: int, seed: int = SEED) -> str:
    """Write the corpus as parquet; returns the file path (idempotent)."""
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "transcripts.parquet")
    # v2: anchor-token planting added — bump invalidates stale caches
    marker = os.path.join(path, f"_gen_{n_turns}_{seed}_v2.json")
    if os.path.exists(out) and os.path.exists(marker):
        return out
    # the parquet is SHARED across sizes/seeds at one path: stale markers
    # from a previous (n_turns, seed) must go with the overwrite, or a
    # later call for that older shape would adopt this file as its corpus
    import glob

    for old in glob.glob(os.path.join(path, "_gen_*.json")):
        os.remove(old)
    df = gen_transcripts(n_turns, seed)
    # microsecond timestamps: Spark cannot read TIMESTAMP(NANOS) parquet
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(df, preserve_index=False)
    ts_idx = table.schema.get_field_index("ts")
    table = table.set_column(
        ts_idx, "ts", table.column("ts").cast(pa.timestamp("us"))
    )
    pq.write_table(table, out, row_group_size=65536)  # splittable scan units
    with open(marker, "w") as f:
        f.write('{"n_turns": %d, "seed": %d}' % (n_turns, seed))
    return out


def docs_in_stable_order(df: pd.DataFrame) -> list[tuple[int, str]]:
    """(doc_id, text) in the frozen global order (conv_id, turn_idx) —
    the same dense assignment operators.docids produces."""
    s = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    return list(zip(range(len(s)), s["text"].tolist()))
