"""Compaction policy: WHICH segments to merge, and a one-call driver.

Reference: Trinity's merge is mechanism only — the application collects a
``MergeCandidatesCollection`` (ordered by generation DESC,
``/root/reference/merge.cpp:6-25``) and calls ``merge()``; the retention
verdict for the inputs is ``merge.cpp:418-447``.  WHEN and WHAT to merge is
left to the app, and every real deployment (and our NRT path, which mints one
micro-segment per stream batch) needs that policy.  This module supplies a
size-tiered policy in the Lucene TieredMergePolicy tradition:

- segments are bucketed into size tiers by ``docs_cnt`` (log base
  ``tier_factor`` above a ``micro_docs`` floor, so all NRT micro-segments
  share tier 0);
- a tier is merge-eligible once it holds >= ``min_merge`` live segments;
- one merge takes at most ``max_merge`` inputs (bounds the working set of
  any single merge job — at 10^12 docs a merge's shuffle is proportional to
  its inputs' bytes, so the cap is the scale knob);
- merging smallest-first means bytes are rewritten O(log_tier_factor(N))
  times over an index's lifetime — the standard amortization argument.

The planner is DRIVER-METADATA ONLY: it reads the manifest, never runs a
Spark job.  ``compact`` cascades (a produced merge may fill the next tier)
and finishes with the store's deferred GC pass.
"""

from __future__ import annotations


from pyspark.sql import SparkSession

from ..sources.store import SegmentMeta, SegmentStore
from .merge import merge_segments

MICRO_DOCS = 1 << 14


def plan_compaction(
    store: SegmentStore,
    min_merge: int = 4,
    max_merge: int = 16,
    tier_factor: int = 8,
    micro_docs: int = MICRO_DOCS,
) -> list[list[str]]:
    """Return merge candidate groups (lists of segment_ids), smallest tier
    first.  Empty list = nothing worth merging.  Pure manifest arithmetic."""
    if min_merge < 2:
        raise ValueError("min_merge must be >= 2")
    if max_merge < min_merge:
        raise ValueError(f"max_merge {max_merge} must be >= min_merge {min_merge}")
    if tier_factor < 2:
        # tier_factor=1 would never shrink q below itself (infinite loop)
        raise ValueError("tier_factor must be >= 2")
    if micro_docs < 1:
        raise ValueError("micro_docs must be >= 1")
    tiers: dict[int, list[SegmentMeta]] = {}
    for m in store.segments():
        if m.docs_cnt < micro_docs:
            t = 0
        else:
            # integer repeated division, not float log: log(1000)/log(10)
            # evaluates to 2.9999999999999996 and int() would drop an
            # exact-boundary segment one tier low, grouping it with
            # segments up to tier_factor x smaller
            t, q = 1, m.docs_cnt // micro_docs
            while q >= tier_factor:
                q //= tier_factor
                t += 1
        tiers.setdefault(t, []).append(m)
    plans: list[list[str]] = []
    for t in sorted(tiers):
        group = sorted(tiers[t], key=lambda m: (m.docs_cnt, m.segment_id))
        while len(group) >= min_merge:
            take, group = group[:max_merge], group[max_merge:]
            plans.append([m.segment_id for m in take])
    return plans


def compact(
    spark: SparkSession,
    store: SegmentStore,
    apply_deletes: bool = True,
    max_rounds: int = 8,
    gc: bool = True,
    **policy: int,
) -> list[SegmentMeta]:
    """Run the policy to quiescence: plan -> merge each group -> re-plan
    (a round's outputs can fill a higher tier), then GC retired data.
    Returns the metas of every merged segment produced.

    ``gc=True`` reclaims IMMEDIATELY: it first expires retained store
    snapshots down to the store's configured ``snapshot_retention`` window
    (or just the newest when no retention is set — ``store.gc`` honors
    snapshot-referenced data, so the pre-compaction states would otherwise
    pin the merged-away inputs on disk).  Pass ``gc=False`` to keep all
    history across the compaction and reclaim later via
    ``expire_snapshots`` + ``gc``.

    If ``max_rounds`` is exhausted with eligible merges still pending, a
    ``RuntimeWarning`` is emitted naming the pending group count (the caller
    asked for quiescence and did not get it — re-run or raise max_rounds);
    normal termination means the policy found nothing left to merge."""
    produced: list[SegmentMeta] = []
    quiescent = False
    for _ in range(max_rounds):
        plans = plan_compaction(store, **policy)
        if not plans:
            quiescent = True
            break
        for ids in plans:
            produced.append(
                merge_segments(spark, store, ids, apply_deletes=apply_deletes)
            )
    if not quiescent:
        pending = plan_compaction(store, **policy)
        if pending:
            import warnings

            warnings.warn(
                f"compact() stopped after max_rounds={max_rounds} with "
                f"{len(pending)} eligible merge group(s) still pending; "
                "re-run or raise max_rounds",
                RuntimeWarning,
                stacklevel=2,
            )
    if gc:
        # honor a user-configured retention window: only without one does
        # immediate reclaim collapse history to the current state — and
        # that collapse is LOGGED (no silent history drops), since losing
        # time travel is a side effect a caller may not expect from a
        # routine compaction
        retain = store.read_manifest().get("snapshot_retention")
        expired = store.expire_snapshots(keep_last=int(retain) if retain else 1)
        if expired and not retain:
            import logging

            logging.getLogger(__name__).warning(
                "compact(gc=True) with no snapshot_retention configured "
                "expired %d snapshot(s) %s; set store retention "
                "(manifest snapshot_retention) to keep time-travel history",
                len(expired),
                expired,
            )
        store.gc()
    return produced
