"""Corpus scrubbing + restructuring: PII redaction and document chunking.

Two passes a web-scale corpus runs between curation and indexing/training:

- ``redact_pii``: replace machine-recognizable PII spans (emails, IPv4s,
  simple phone formats) with typed placeholder tokens and count what was
  hit, so downstream stages never see the raw spans and the redaction
  rate is auditable per corpus slice.  Patterns are deliberately RE2-safe
  (no lookaround, no backreferences) so the exact same regexes run under
  Java's engine here and DuckDB/RE2 in the oracle — and would run under
  any other engine a pipeline mixes in.  This is the pattern tier of PII
  handling; an ML-based NER tier would slot in as a ``mapInPandas`` stage
  (same seam as ``multimodal.extract_features``).
- ``chunk_documents``: split long documents into overlapping token
  windows with deterministic (doc_id, chunk_id) identity — the unit a
  retrieval index or context-bounded trainer actually consumes.  Window
  arithmetic is pure array slicing on a whitespace tokenization, so a
  chunk's text is always a verbatim substring sequence of the source.

Both are single fused projections (chunking adds one explode), zero
shuffles, no UDFs; at 100 TB they are embarrassingly parallel scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns (shared verbatim with the DuckDB oracle)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Input columns + ``text`` replaced by its redacted form and one
    ``n_<kind>`` count per requested kind.

    Spans matching each kind's pattern are replaced with ``<KIND>``
    placeholders in ``kinds`` order (order matters only for overlapping
    matches, e.g. an email whose domain would also IPv4-match — earlier
    kinds win because their placeholder breaks the later pattern).  Counts
    are measured BEFORE any replacement, on the original text.
    """
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII kinds {unknown}; available: {sorted(PII_PATTERNS)}"
        )
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(PII_PATTERNS[k])).cast("long").alias(f"n_{k}")
        for k in kinds
    ]
    red = t
    for k in kinds:
        red = F.regexp_replace(red, PII_PATTERNS[k], f"<{k.upper()}>")
    others = [c for c in docs.columns if c not in (id_col, text_col)]
    return docs.select(
        F.col(id_col), red.alias(text_col), *counts, *[F.col(c) for c in others]
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens) — overlapping token windows.

    Whitespace tokens; windows start every ``chunk_tokens - overlap``
    tokens and span ``chunk_tokens`` (the last window may be shorter).
    A trailing window whose tokens all lie inside the previous window's
    overlap is NOT emitted — it would be a strict subset duplicating
    content (start s is kept iff s == 0 or s + overlap < n; every token
    is still covered).  ``chunk_id`` is the 0-based window index, so
    ``(doc_id, chunk_id)`` is a deterministic, re-run-stable chunk
    identity and ``doc_id = chunk.doc_id`` recovers provenance.
    Documents with zero tokens yield zero chunks.  One projection +
    explode, zero shuffles.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    t = F.col(text_col)
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    n = F.size(F.col("_toks"))
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(step)),
        lambda s: (s == 0) | (s + overlap < n),
    )
    chunked = (
        base.where(n > 0)
        .withColumn("chunk_id", F.explode(starts))
        .select(
            F.col(id_col),
            (F.col("chunk_id") / step).cast("long").alias("chunk_id"),
            F.slice(F.col("_toks"), F.col("chunk_id") + 1, chunk_tokens).alias(
                "_w"
            ),
        )
    )
    return chunked.select(
        F.col(id_col),
        "chunk_id",
        F.array_join(F.col("_w"), " ").alias("chunk_text"),
        F.size(F.col("_w")).cast("long").alias("n_tokens"),
    )
