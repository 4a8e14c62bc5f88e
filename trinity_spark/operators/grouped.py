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


def context_windows(
    hits: DataFrame,
    turns: DataFrame,
    window: int = 2,
    id_col: str = "doc_id",
    group_col: str = "conv_id",
    pos_col: str = "turn_idx",
) -> DataFrame:
    """Matched turns with +/-``window`` neighboring turns from the same
    conversation — the transcript KWIC: a hit is only interpretable with
    its surrounding exchange, so retrieval UIs and context-assembly
    pipelines fetch the window, not the lone turn.

    ``hits``: (id_col[, score...]) — e.g. ``QueryPlanner.plan(q, k)``.
    ``turns``: the corpus with (id_col, group_col, pos_col, ...).

    Returns one row per (hit, context turn): all of ``turns``'s columns
    plus ``hit_doc_id`` (the matched turn this row gives context for) and
    ``offset`` (this turn's position minus the hit's, in [-window, window];
    0 is the hit itself).  A turn neighboring two hits appears once per
    hit — deduplicate on id_col downstream if a flat context set is wanted.

    Distributed shape: the hit side is k rows (or df(query) for score_all
    output) — a broadcast-sized build side joined on group_col with a
    bounded |pos - hit_pos| <= window predicate, so the probe side is one
    scan of the corpus co-partitioned by conversation; no window function,
    no self-join of the corpus with itself."""
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    hit_pos = turns.select(
        F.col(id_col).alias("hit_doc_id"),
        F.col(group_col).alias("__g"),
        F.col(pos_col).alias("__p"),
    ).join(hits.select(F.col(id_col).alias("hit_doc_id")), "hit_doc_id")
    out = turns.join(
        hit_pos,
        (turns[group_col] == F.col("__g"))
        & (turns[pos_col] >= F.col("__p") - window)
        & (turns[pos_col] <= F.col("__p") + window),
    )
    return out.select(
        *[turns[c] for c in turns.columns],
        F.col("hit_doc_id"),
        (turns[pos_col] - F.col("__p")).cast("int").alias("offset"),
    )


def facet_counts(
    matching: DataFrame,
    meta: DataFrame,
    by: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Facet counts over a query's matches: how the result set distributes
    across metadata dimensions (role, tool, lang, source, ...) — the
    result-analytics sidebar every search deployment renders next to the
    hit list.

    ``matching`` is the DocumentsOnly frame (``planner.matching_docs`` —
    the scorer never runs) or any (doc_id, ...) result; ``meta`` maps
    doc_id to the facet columns (the docid_map / source table — at 10^12
    docs keep it a NARROW projection of just id + facet columns so the
    join side stays slim).  One equi-join on doc_id (AQE broadcasts the
    match side for selective queries — df(query)-sized, not corpus-sized)
    + one map-side-combined groupBy per call; one output row per distinct
    facet-value combination.

    Returns (*by, n_docs long), ordered by n_docs desc then the facet
    values asc for a deterministic render order.
    """
    if not by:
        raise ValueError("facet_counts needs at least one facet column")
    joined = meta.select(id_col, *by).join(
        matching.select(id_col).distinct(), id_col
    )
    return (
        joined.groupBy(*by)
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), *[F.asc(c) for c in by])
    )
