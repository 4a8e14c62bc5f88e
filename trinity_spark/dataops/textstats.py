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
    # NULL text scores 0, same as empty: F.least() SKIPS nulls, so an
    # un-coalesced NULL length made len_norm=1.0 and handed NULL-text docs
    # a 0.4 quality floor — above real short documents
    n_chars = F.coalesce(F.length(text_col), F.lit(0))
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


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
    max_scan_tokens: int = 2048,
) -> DataFrame:
    """Per-document repetition metrics in the Gopher/MassiveText family —
    the filters that catch boilerplate, scraped navigation, and
    degenerate-generation text that length/quality ratios miss.

    Columns returned (all in [0, 1], rounded to 6):

    - ``dup_line_frac``: fraction of non-empty lines that are repeats of a
      line already seen in the document (1 - distinct/total).
    - ``dup_line_char_frac``: fraction of line characters inside those
      repeat occurrences (1 - distinct-line chars / total line chars).
    - ``top_ngram_char_frac``: the heaviest word ``ngram_n``-gram's share
      of token characters — max over n-grams of
      count * token-chars(gram), divided by total token chars.  (Gopher
      picks the most FREQUENT n-gram then measures its chars; taking the
      max of the count*chars product instead is deterministic under count
      ties and filters the same pathology.)  Overlapping occurrences can
      overcount ("a a a" has two "a a" bigrams over three tokens), so the
      ratio is clamped to 1.

    Scale shape: a single fused projection, zero shuffle — every metric is
    an array expression over the doc's own lines/tokens.  The n-gram scan
    is O(distinct-grams * grams) per document, so it is bounded by
    ``max_scan_tokens`` (first K tokens only, like production pipelines
    scan a prefix); the cap is applied identically in the DuckDB oracle.
    """
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.round(dup_line_frac(t), 6).alias("dup_line_frac"),
        F.round(dup_line_char_frac(t), 6).alias("dup_line_char_frac"),
        F.round(top_ngram_char_frac(t, ngram_n, max_scan_tokens), 6).alias(
            "top_ngram_char_frac"
        ),
    )


def _lines(text_col: Column) -> Column:
    return F.filter(F.split(text_col, "\n"), lambda x: x != "")


def _chars_of(arr: Column) -> Column:
    return F.aggregate(
        F.transform(arr, F.length), F.lit(0), lambda acc, x: acc + x
    )


def dup_line_frac(text_col: Column) -> Column:
    """Fraction of non-empty lines repeating an earlier line (Column form,
    self-contained — composable into any projection, e.g. curate's gates)."""
    lines = _lines(text_col)
    n = F.size(lines)
    return F.when(
        n > 0, 1.0 - F.size(F.array_distinct(lines)).cast("double") / n
    ).otherwise(0.0)


def dup_line_char_frac(text_col: Column) -> Column:
    """Fraction of line characters inside repeat line occurrences."""
    lines = _lines(text_col)
    total = _chars_of(lines)
    return F.when(
        total > 0,
        1.0 - _chars_of(F.array_distinct(lines)).cast("double") / total,
    ).otherwise(0.0)


def top_ngram_char_frac(
    text_col: Column, ngram_n: int = 2, max_scan_tokens: int = 2048
) -> Column:
    """Heaviest word n-gram's (clamped) share of token characters."""
    if ngram_n < 1:
        raise ValueError("ngram_n must be >= 1")
    if max_scan_tokens < 1:
        raise ValueError("max_scan_tokens must be >= 1")
    toks = F.slice(_tokens(text_col), 1, max_scan_tokens)
    n_toks = F.size(toks)
    # n-grams joined with ' '; gram token-chars = length - (n-1) separators
    grams = F.transform(
        F.slice(toks, 1, F.greatest(n_toks - (ngram_n - 1), F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(ngram_n)]
        ),
    )
    # max over distinct grams of count * token-chars, computed as a single
    # linear fold over the SORTED gram array (equal grams are adjacent, so a
    # run-length counter reproduces each distinct gram's total count) — the
    # naive distinct x all-grams nested scan is O(g^2) per doc and dominated
    # curate wall time; this is O(g log g) and ~20x faster at bench scale
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        mass = run * (F.length(g) - (ngram_n - 1))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], mass).alias("best"),
        )

    top_mass = F.aggregate(
        F.array_sort(grams), acc0, _step, lambda acc: acc["best"]
    )
    tok_chars = _chars_of(toks)
    return F.when(
        (tok_chars > 0) & (F.size(grams) > 0),
        F.least(top_mass.cast("double") / tok_chars, F.lit(1.0)),
    ).otherwise(0.0)


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
