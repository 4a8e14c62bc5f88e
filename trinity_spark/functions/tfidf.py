"""The reference's OTHER two built-in scorers, as similarity-seam drop-ins.

Trinity ships three scorers on its Similarity extension point
(``/root/reference/similarity.h``):

- ``IndexSourcesCollectionTrivialScorer`` (similarity.h:56-74): score = the
  raw match frequency, nothing else — ``score(...) { return freq; }``.
- ``IndexSourcesCollectionTFIDFScorer`` (similarity.h:75-130): Lucene-classic
  TF-IDF with ``idf(df, N) = ln((N + 1) / (df + 1)) + 1.0``
  (similarity.h:86-88), ``tf(freq) = sqrt(freq)`` (similarity.h:93-95), a
  term-set weight that SUMS the member terms' idfs with df aggregated across
  all sources (similarity.h:110-130 new_scorer_weight), and
  ``score = tf(freq) * weight`` (similarity.h:135-139; no doc-length norm —
  the decodeNormValue branch is a TODO in the reference).
- ``TrivialBM25Scorer`` (similarity.h:165-235) — the default; see
  ``functions/bm25.py``.

Both are usable anywhere the engine takes a similarity:
``QueryPlanner(index, similarity=tfidf_similarity)``,
``exec_query_collection(..., similarity=trivial_similarity)``.  Phrases work
unchanged: the planner hands the scorer ``ctx.member_dfs`` (one df per member
term, phrase order) and ``ctx.n_docs``, exactly the inputs the reference's
``new_scorer_weight(terms, cnt)`` resolves for itself, and ``freq`` is the
phrase match count.

Python scalar twins (for the pocket oracle) live beside the Column forms so
each formula exists in exactly two lockstep lines, like functions/bm25.py.
Summation/multiplication order matches between the pairs, so engine and
oracle agree bit-for-bit in float64.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def tfidf_idf_py(df: int, n_docs: int) -> float:
    """similarity.h:86-88: ln((N + 1) / (df + 1)) + 1."""
    return math.log((n_docs + 1) / float(df + 1)) + 1.0


def tfidf_weight_py(dfs: Sequence[int], n_docs: int) -> float:
    """similarity.h:110-130: term-set weight = sum of member idfs (collection
    df), accumulated in member order (float64 addition order matters)."""
    w = 0.0
    for df in dfs:
        w += tfidf_idf_py(df, n_docs)
    return w


def tfidf_score_py(dfs: Sequence[int], n_docs: int, freq: int) -> float:
    """similarity.h:135-139: sqrt(freq) * weight (no length norm)."""
    return math.sqrt(freq) * tfidf_weight_py(dfs, n_docs)


def trivial_score_py(dfs: Sequence[int], n_docs: int, freq: int) -> float:
    """similarity.h:64-66: score is the raw frequency."""
    return float(freq)


def tfidf_similarity(ctx, freq: Column) -> Column:
    """Similarity-seam drop-in for the reference TF-IDF scorer.

    The weight is plan-time driver arithmetic (dfs and N are already cached
    stats — zero extra Spark work); only sqrt(freq) runs JVM-side, inside
    whole-stage codegen."""
    dfs = ctx.member_dfs or (ctx.df,)
    w = tfidf_weight_py(dfs, ctx.n_docs)
    return F.sqrt(freq.cast("double")) * F.lit(w)


def trivial_similarity(ctx, freq: Column) -> Column:
    """Similarity-seam drop-in for the reference Trivial scorer."""
    return freq.cast("double")
