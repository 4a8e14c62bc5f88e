"""Collection execution: one query over MANY index stores.

Reference: ``exec_query`` over an ``IndexSourcesCollection`` runs each source
independently (``/root/reference/exec.h:64-81``); ``exec_query_par`` gives
each source its own thread (``exec.h:87-177``); and the APP merges the
per-source top-k results ("collecting the top-k results from every exec() and
then use merge/reduce", ``index_source.h:210-212``).  Scoring is PER SOURCE —
each source's own stats drive its idf; sources never pool df/N.  (Our
single-store ``SegmentIndex`` pools stats across its own segments, which maps
to ONE reference source's chunks; a *collection* is a set of such stores —
e.g. per-tenant or per-time-range indexes queried together.)

Spark-first: every per-store top-k is an independent DataFrame plan; the
app-side merge/reduce is a ``unionByName`` + one global
TakeOrderedAndProject.  Spark schedules the per-store stages concurrently
inside the one collect (the ``std::async`` analog without threads), and k
rows per store is all that reaches the final sort.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.parser import parse_query
from ..plans.planner import QueryPlanner
from .indexer import SegmentIndex


def exec_query_collection(
    spark: SparkSession,
    stores: list,
    query,
    k: int = 10,
    similarity=None,
    documents_only: bool = False,
) -> DataFrame:
    """Top-k over a collection of index stores.  ``stores`` may hold
    ``SegmentStore``s, ``SegmentIndex``es, or any planner-compatible index
    (duck-typed like QueryPlanner's LogicalIndex protocol).

    Returns (source int, doc_id long, score double): doc_id spaces are
    per-source (the reference's isrc spaces, index_source.h:100-114), so the
    source ordinal is part of the result identity.  Deterministic order:
    score DESC, source ASC, doc_id ASC.

    ``documents_only=True`` is ExecFlags::DocumentsOnly over the collection
    (exec.h:11-23 composed with exec.h:64-81): ALL matching (source, doc_id)
    pairs, unranked and unlimited, scorer never evaluated."""
    if not stores:
        raise ValueError("empty collection")
    node = parse_query(query) if isinstance(query, str) else query
    frames = []
    for i, st in enumerate(stores):
        idx = SegmentIndex(spark, st) if hasattr(st, "read_manifest") else st
        planner = QueryPlanner(idx, similarity=similarity)
        if documents_only:
            frames.append(
                planner.matching_docs(node).select(
                    F.lit(i).alias("source"), "doc_id"
                )
            )
        else:
            frames.append(
                planner.plan(node, k=k).select(
                    F.lit(i).alias("source"), "doc_id", "score"
                )
            )
    merged = reduce(DataFrame.unionByName, frames)
    if documents_only:
        return merged
    return merged.orderBy(
        F.desc("score"), F.asc("source"), F.asc("doc_id")
    ).limit(k)
