"""Group-scope retrieval: top-k GROUPS (conversations) by aggregated
per-document relevance.

The transcript-native query the reference's per-document engine stops short
of: "which conversations are about X" rather than "which turns match X".
Expressed as the obvious Spark composition — score matching turns with the
existing planner, join the narrow (doc -> group) mapping, aggregate per
group, global top-k:

- the scored side holds only MATCHING documents (df(query)-sized, not
  corpus-sized), so the doc_id equi-join is cheap; AQE broadcasts it when
  small and plans a shuffle hash join for stopword-scale matches — no
  forced hint (the r3-ADVICE lesson);
- the per-group aggregation is a map-side-combined groupBy on group_col;
- the global k goes through TakeOrderedAndProject (sort k rows per
  partition, never a full sort), with the same deterministic
  (score desc, group asc) tie-break contract as the per-doc engine
  (reference analog: matches.h:139-186).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {"sum": F.sum, "max": F.max, "avg": F.avg}


def grouped_topk(
    scored: DataFrame,
    groups: DataFrame,
    k: int = 10,
    agg: str = "sum",
    id_col: str = "doc_id",
    group_col: str = "conv_id",
    score_col: str = "score",
) -> DataFrame:
    """Top-k groups from per-document scores.

    ``scored``: (id_col, score_col) — e.g. ``QueryPlanner.score_all(q)``.
    ``groups``: (id_col, group_col) mapping, e.g. the turns table projected
    to (doc_id, conv_id).  Returns (group_col, n_docs, score) with
    score = round(agg(raw per-doc scores), 6), ordered score desc,
    group asc, limited to k.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    joined = scored.join(
        groups.select(F.col(id_col), F.col(group_col)), id_col
    )
    per_group = joined.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(_AGGS[agg](score_col), 6).alias("score"),
    )
    return per_group.orderBy(F.desc("score"), F.asc(group_col)).limit(k)
