"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All pure JVM Column expressions (regexp / aggregates / md5-derived hashes),
deterministic, and DuckDB-reproducible for the driver oracle.  These are the
per-document scoring passes a training-data pipeline runs before filtering;
at 100 TB they are embarrassingly parallel single-pass scans (no shuffle at
all — Catalyst fuses them into the parquet scan projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "it", "you", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "ich", "mit", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "que", "pas", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por", "con", "para"],
}


def _tokens(text_col: Column) -> Column:
    return F.filter(F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda t: t != "")


def token_count(text_col: Column) -> Column:
    """Whitespace-ish token count (the cheap pre-BPE size estimate)."""
    return F.size(_tokens(text_col))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-flavored estimate: word-piece regex (runs of letters, digits,
    single punctuation marks) — the standard ~GPT-2 pre-tokenizer shape."""
    pieces = F.regexp_extract_all(
        text_col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def language_id(text_col: Column) -> Column:
    """Heuristic language ID: argmax of marker-stopword hit ratio; 'und'
    (undetermined) when nothing matches."""
    toks = _tokens(text_col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, markers in _LANG_MARKERS.items():
        score = F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        cond = score > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, score).otherwise(best_score)
    return best_lang


def quality_score(text_col: Column) -> Column:
    """[0,1] quality heuristic from length / punctuation / stopword ratios:
    quality = 0.4*len_norm + 0.3*(1 - punct_ratio) + 0.3*stop_ratio_norm."""
    n_chars = F.length(text_col)
    toks = _tokens(text_col)
    n_toks = F.size(toks)
    len_norm = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    punct = F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(1.0)
    stops = F.array(*[F.lit(m) for m in _LANG_MARKERS["en"]])
    stop_ratio = F.when(
        n_toks > 0, F.size(F.array_intersect(toks, stops)).cast("double") / F.least(n_toks, F.lit(10))
    ).otherwise(0.0)
    q = 0.4 * len_norm + 0.3 * (1.0 - punct_ratio) + 0.3 * F.least(stop_ratio, F.lit(1.0))
    return F.round(q, 6)


def fingerprint(text_col: Column) -> Column:
    """Order-sensitive document fingerprint (rolling-hash flavor):
    sum over tokens of position * hash32(token), mod 2^61-1.

    hash32(token) = first 8 hex chars of md5 — DuckDB computes the identical
    value, making this a cross-engine-stable content fingerprint."""
    toks = _tokens(text_col)
    M = F.lit((1 << 61) - 1)
    contrib = F.transform(
        toks,
        lambda t, i: (
            (i + 1).cast("long")
            * F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        )
        % M,
    )
    return F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: (acc + x) % M)


def analyze(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document analysis table."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars"),
        language_id(t).alias("lang"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
