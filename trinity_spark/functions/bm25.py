"""The exact reference scoring contract (rank-identity depends on this).

From ``/root/reference/similarity.h:165-235`` (TrivialBM25Scorer, the scorer
the north rule names):

- ``idf(df, N) = ln(1 + (N - df + 0.5) / (df + 0.5))``  (similarity.h:179-181)
- a phrase's idf is the SUM of its member terms' idfs     (similarity.h:209-217)
- per-doc term score = ``idf * freq / (freq + k1)`` with ``k1 = 1.2``;
  the shipped reference uses ``norm = k1`` — i.e. NO length normalization
  (the norms table is computed but unused; similarity.h:169-173,228-235).
  We reproduce that exact quirk.
- df and N are sums across all index sources/segments (similarity.h:238-250).
- query score = sum over matched sub-expressions
  (docset_iterators_scorers.cpp:8-243); we sum in a FIXED branch order
  (float64 addition is not associative — the planner adds branch columns
  left-to-right so Spark and the oracle agree bit-for-bit).

Both a python scalar version (oracle) and a Column version (engine) live here
so the formula exists in exactly two lockstep lines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75  # parsed but unused, like the reference (norm fixed to k1)


def idf_py(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def term_score_py(idf: float, freq: int) -> float:
    return idf * (freq / (freq + K1))


def term_score_col(idf: Column | float, freq: Column) -> Column:
    freq = freq.cast("double")
    idf = F.lit(idf) if not isinstance(idf, Column) else idf
    return idf * (freq / (freq + F.lit(K1)))
