"""Segment merge with delete application and retention.

Reference: ``/root/reference/merge.cpp`` — k-way merge of segment term
dictionaries ordered by generation DESC (``merge.cpp:6-25``); per term the
postings of all sources are merged by docID with masked documents filtered
out (``merge.cpp:288-394``); old sources get a retention verdict
(``merge.cpp:418-447``).

Spark-first: the k-way merge-sort IS a union + re-group — decode the selected
segments' blocks, anti-join the tombstones, re-encode, commit one new
segment, retire the inputs.  Because our doc_id spaces are already global
(docid_map assigns once), no remap join is needed for plain merges; the remap
path (Trinity's isrc->global translation, index_source.h:100-114) is exposed
separately as ``remap_doc_ids`` for compaction-style renumbering.

Fast-path note (merge.cpp:166-180 raw chunk copy): when a term occurs in only
one input segment and no tombstone falls in its doc range, its encoded blocks
are byte-reusable.  On Iceberg this merge is metadata-only; here we re-encode
uniformly — the cost is one pass and it keeps block invariants trivially true.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import __version__
from ..sources.store import SegmentMeta, SegmentStore
from .build import build_field_stats, build_term_dict
from .segments import decode_segments, encode_postings


def merge_segments(
    spark: SparkSession,
    store: SegmentStore,
    segment_ids: list[str] | None = None,
    apply_deletes: bool = True,
) -> SegmentMeta:
    """Merge segments (default: all) into one; returns the new meta."""
    metas = store.segments()
    if segment_ids is not None:
        metas = [m for m in metas if m.segment_id in segment_ids]
    if not metas:
        raise ValueError("nothing to merge")
    ids = [m.segment_id for m in metas]
    lo = min(m.doc_lo for m in metas)
    hi = max(m.doc_hi for m in metas)

    t0 = time.monotonic()
    postings = decode_segments(store.read_blocks(spark, ids))
    deletes = store.read_deletes(spark) if apply_deletes else None
    n_deleted = 0
    if deletes is not None:
        in_range = deletes.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        n_deleted = in_range.count()
        postings = postings.join(F.broadcast(in_range), "doc_id", "left_anti")
    postings = postings.persist()

    docs_cnt = sum(m.docs_cnt for m in metas) - n_deleted
    blocks = encode_postings(postings)
    term_dict = build_term_dict(postings)
    stats = build_field_stats(postings, docs_cnt=docs_cnt)

    gen = store.read_manifest()["next_generation"]
    meta = SegmentMeta(
        segment_id=f"merged-{lo:014d}-{hi:014d}-g{gen:06d}",
        generation=0,
        doc_lo=lo,
        doc_hi=hi,
        docs_cnt=docs_cnt,
        lineage={
            "merged_from": ids,
            "deletes_applied": n_deleted,
            "engine_version": __version__,
        },
        metrics={},
    )
    store.commit_segment(blocks, term_dict, stats, meta)
    store.retire_segments(ids)  # retention verdict (merge.cpp:418-447)
    postings.unpersist()
    wall = time.monotonic() - t0
    meta.metrics.update({"wall_sec": round(wall, 3), "docs": docs_cnt})
    m = store.read_manifest()
    for s in m["segments"]:
        if s["segment_id"] == meta.segment_id:
            s["metrics"] = meta.metrics
    store._write_manifest(m)
    # tombstones fully covered by this merge are spent
    if segment_ids is None and apply_deletes:
        m = store.read_manifest()
        m["deletes"] = []
        store._write_manifest(m)
    return meta


def remap_doc_ids(postings: DataFrame, docid_map: DataFrame) -> DataFrame:
    """Compaction-style renumbering: join postings to a (doc_id -> new_doc_id)
    map — the translate_docid analog for rebuilding a dense space after many
    deletes.  Broadcast when the map is small; shuffle-join otherwise."""
    return (
        postings.join(docid_map.select("doc_id", "new_doc_id"), "doc_id", "inner")
        .drop("doc_id")
        .withColumnRenamed("new_doc_id", "doc_id")
    )
