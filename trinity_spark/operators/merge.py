"""Segment merge with delete application, byte reuse, and retention.

Reference: ``/root/reference/merge.cpp`` — k-way merge of segment term
dictionaries ordered by generation DESC (``merge.cpp:6-25``); per term the
postings of all sources are merged by docID with masked documents filtered
out (``merge.cpp:288-394``); old sources get a retention verdict
(``merge.cpp:418-447``); and the raw-chunk fast path copies a term's encoded
bytes untouched when nothing in it changed (``merge.cpp:166-180``,
``google_codec.cpp:178-184``).

Spark-first: the k-way merge-sort IS a union + re-group — decode the selected
segments' blocks, anti-join the tombstones, re-encode, commit one new
segment, retire the inputs.  Because our doc_id spaces are already global
(docid_map assigns once), no remap join is needed for plain merges; the remap
path (Trinity's isrc->global translation, index_source.h:100-114) is exposed
separately as ``remap_doc_ids`` for compaction-style renumbering.

Byte-reuse fast path, finer-grained than the reference's: Trinity can only
raw-copy a term when it lives in ONE source segment (the byte streams must
splice contiguously); our blocks decode standalone, so reuse is decided per
block:

- FULL blocks (doc_count == BLOCK_SIZE) are maximally packed by definition —
  re-encoding reproduces them byte-identically — so any tombstone-free full
  block moves untouched regardless of how many segments share the term.
- A PARTIAL block whose (term, chunk) group contains exactly ONE partial
  across all merge inputs already holds every one of the group's
  non-full-block docs, so repacking cannot improve the packing — it moves
  untouched.  This is the dominant block class: every rare term contributes
  one lone partial per chunk, and on transcript corpora lone partials are
  ~3/4 of all blocks.  (The reused output is DECODE-EQUIVALENT to a fresh
  re-encode, not necessarily the canonical byte layout: after merging
  inputs with interleaved doc ranges a reused lone partial may precede
  reused full blocks in doc order, and reused blocks from different source
  segments can collide on block_id — both benign, because blocks decode
  standalone and block_id is only a within-chunk sort key, never an
  identity.)
- Only groups with 2+ partials (a build scan-split or segment boundary
  straddled the chunk — the fastbuild per-partition encoder emits an
  independent tail per slice) are repacked, which is the actual point of
  compaction, plus every block that actually CONTAINS a tombstoned doc:
  range-cover tombstone candidates are membership-refined by a
  doc_deltas-only decode (``_membership_refine``) before losing their
  reuse verdict — a rare term's lone partial spans most of its chunk, so
  the range probe alone re-encoded the majority of blocks once tombstones
  landed in every chunk (measured 36.7% reuse at a 10M-turn merge with
  1000 tombstones; the refine restores the ~15 true-hit blocks per
  tombstoned doc).

The multi-partial group list is computed by a metadata-only aggregation
(term/chunk/doc_count columns; parquet pruning keeps the byte streams out of
that job) and probed via (term, chunk) equi-joins with NO forced broadcast:
on the first compaction of a fragmented build nearly every group has 2+
partials, so ``multi`` can approach one row per distinct (term, chunk) —
far beyond any driver broadcast budget at 10^12 docs.  AQE picks broadcast
when the list is actually small and a shuffle hash join otherwise; either
way the reused byte streams themselves never ride the probe join.
The tombstone probe is an equi-join on the block's chunk (a tombstone's
chunk equals its victim block's chunk) + a range refine, so it is a
broadcast HASH join, not a nested loop; tombstone sets ride a broadcast
exactly like the reference keeps masked-docid bitmaps in RAM
(docidupdates.h:90-191).

Accounting correctness (partial merges):
- ``docs_cnt`` subtracts a tombstone only if its generation has NOT already
  been applied to the covering segment (lineage ``deletes_gens``, id-based —
  this is what keeps zero-token docs, which have no postings to be "present"
  in, correctly subtracted).  Segments whose lineage predates ``deletes_gens``
  (key absent) fall back to presence-based counting: decode only the blocks
  whose [min_doc_id, max_doc_id] cover a candidate tombstone and count the
  tombstones whose doc still physically exists — re-counting a doc already
  removed by an earlier merge would corrupt N and hence every idf after the
  merge.
- Tombstone retention: only the tombstone generations READ by this merge are
  retired, and only when the merge covered every segment that existed at read
  time; a partial merge leaves all tombstones in place (they may still mask
  docs in unmerged segments; re-masking already-removed docs is harmless).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import __version__
from ..sources.store import SegmentMeta, SegmentStore
from .build import field_stats_from_blocks, term_dict_from_blocks
from .segments import BLOCK_SIZE, CHUNK_BITS, decode_segments, encode_postings


def _merge_chunk_bits(metas) -> int | None:
    """Common chunk_bits across the merged segments (from build lineage), or
    None when mixed/unrecorded — the tombstone probe then skips the chunk
    equi-join and falls back to a pure range condition."""
    bits = {m.lineage.get("chunk_bits", CHUNK_BITS) for m in metas}
    return bits.pop() if len(bits) == 1 else None


def _merge_codec(metas) -> str | None:
    """Common wire codec across the merged segments (lineage ``codec``), or
    None when mixed — the merge.cpp:256-287 same-codec precondition for the
    raw-copy fast path: mixed-codec inputs disable byte reuse entirely and
    everything is decoded (per codec) and re-encoded at one codec."""
    from .segments import CODECS

    codecs = {m.lineage.get("codec", "varbyte") for m in metas}
    unknown = codecs - set(CODECS)
    if unknown:
        raise ValueError(
            f"cannot merge segments with unknown codec(s) {sorted(unknown)}; "
            f"this engine knows {list(CODECS)}"
        )
    return codecs.pop() if len(codecs) == 1 else None


# Tombstone-set ceiling for the membership refine: the sorted id array rides
# the kernel closure (int64, 4M ids = 32 MB — the same RAM-resident bound the
# broadcast probes already assume, docidupdates.h:90-191).  Past it the refine
# is skipped and every range-cover candidate re-encodes (the pre-refine
# behavior — correct, just less byte reuse).
REFINE_MAX_TOMBSTONES = 4_000_000


def _membership_refine(
    cand: DataFrame, tombstones: DataFrame, codec: str
) -> tuple[DataFrame, DataFrame]:
    """Split range-cover tombstone candidates into (clean, hit) by ACTUAL
    doc membership.

    A candidate block decodes ONLY its doc_deltas stream (never tf/pos/pay
    bytes) and tests the absolute ids against the sorted tombstone array;
    blocks with zero true hits keep their bytes untouched.  The reference
    analog is the codec's block-skip discipline — confirm a docID is inside
    a block before decoding it (google_codec.cpp:146-176) — applied to the
    merge's raw-copy verdict (merge.cpp:166-180).

    One Arrow round-trip over candidate rows (lazily checkpointed so the
    two consumers share one execution); candidates are exactly the set the
    old path re-encoded wholesale, so the refine is strictly cheaper than
    what it replaces whenever any candidate is a false positive."""
    import numpy as np

    # Arrow transfer, not collect(): at the 4M-id ceiling a Row-object
    # collect holds ~10x the 32 MB the int64 array needs on the driver.
    capped = tombstones.select("doc_id").limit(REFINE_MAX_TOMBSTONES + 1)
    ids = capped.toArrow().column("doc_id").to_numpy(zero_copy_only=False)
    if len(ids) > REFINE_MAX_TOMBSTONES:
        return cand.where(F.lit(False)), cand
    tomb = np.sort(ids.astype(np.int64, copy=False))

    from pyspark.sql.types import BooleanType, StructField, StructType

    # fresh StructType: .add() MUTATES the DataFrame's cached schema object,
    # which makes mapInArrow think its own input already has the column
    out_schema = StructType(
        list(cand.schema.fields) + [StructField("_thit", BooleanType())]
    )

    def verdict(batches):
        import numpy as np
        import pyarrow as pa

        from .segments import _decode_stream, _reset_cumsum

        for b in batches:
            if b.num_rows == 0:
                continue
            dc = b.column("doc_count").to_numpy().astype(np.int64)
            # block invariant: 1 <= doc_count <= BLOCK_SIZE (reduceat needs
            # strictly increasing segment starts)
            if (dc < 1).any():
                raise ValueError("merge refine: block with doc_count < 1")
            starts = np.concatenate(([0], np.cumsum(dc)[:-1]))
            ids = _reset_cumsum(
                _decode_stream(b.column("doc_deltas"), codec), starts, dc
            )
            pos = np.searchsorted(tomb, ids)
            hit_post = np.zeros(len(ids), dtype=np.int64)
            inb = pos < len(tomb)
            hit_post[inb] = tomb[pos[inb]] == ids[inb]
            blk_hit = np.add.reduceat(hit_post, starts) > 0
            yield b.append_column("_thit", pa.array(blk_hit, type=pa.bool_()))

    refined = cand.mapInArrow(verdict, out_schema).localCheckpoint(eager=False)
    return (
        refined.where(~F.col("_thit")).drop("_thit"),
        refined.where(F.col("_thit")).drop("_thit"),
    )


def _present_tombstones(
    blocks: DataFrame, cand: DataFrame, legacy_metas, cdc: str | None
) -> DataFrame:
    """Candidate tombstone ids that still physically exist in the legacy
    segments' blocks (pre-``deletes_gens`` lineage: the applied set is
    unknown, so presence is the only safe evidence a tombstone has not been
    counted before).  Decodes ONLY blocks whose [min_doc_id, max_doc_id]
    cover a candidate — the candidate set is a broadcast (tombstone sets are
    RAM-resident by design, docidupdates.h:90-191), so the range probe is a
    broadcast join, never a full decode."""
    from functools import reduce

    rng = reduce(
        lambda a, b: a | b,
        [
            (F.col("min_doc_id") < m.doc_hi) & (F.col("max_doc_id") >= m.doc_lo)
            for m in legacy_metas
        ],
    )
    lb = blocks.where(rng)
    c = F.broadcast(cand.withColumnRenamed("doc_id", "_cand_id"))
    hit = lb.join(
        c,
        (F.col("_cand_id") >= F.col("min_doc_id"))
        & (F.col("_cand_id") <= F.col("max_doc_id")),
        "left_semi",
    )
    if cdc is None:
        present = decode_segments(hit, with_positions=False)
    else:
        present = decode_segments(hit, with_positions=False, codec=cdc)
    return cand.join(
        present.select("doc_id").distinct(), "doc_id", "left_semi"
    )


def merge_segments(
    spark: SparkSession,
    store: SegmentStore,
    segment_ids: list[str] | None = None,
    apply_deletes: bool = True,
) -> SegmentMeta:
    """Merge segments (default: all) into one; returns the new meta."""
    # ONE manifest snapshot feeds segment metas, the gen list, AND the
    # deletes frame: with separate reads, a delete committed in between
    # would be physically applied and counted but omitted from the output
    # segment's deletes_gens lineage (and kept by the retirement filter),
    # so the next merge would subtract the same docs again
    manifest0 = store.read_manifest()
    all_metas = [SegmentMeta(**s) for s in manifest0["segments"]]
    metas = all_metas
    if segment_ids is not None:
        known = {m.segment_id for m in all_metas}
        unknown = [sid for sid in segment_ids if sid not in known]
        if unknown:
            # a silent subset merge would retire only the matched inputs
            # while the caller believes the whole list was compacted
            raise ValueError(
                f"segment_ids not in the manifest: {unknown}"
            )
        metas = [m for m in metas if m.segment_id in segment_ids]
    if not metas:
        raise ValueError("nothing to merge")
    ids = [m.segment_id for m in metas]
    full_merge = {m.segment_id for m in all_metas} <= set(ids)
    lo = min(m.doc_lo for m in metas)
    hi = max(m.doc_hi for m in metas)

    t0 = time.monotonic()
    cdc = _merge_codec(metas)  # None = mixed codecs -> re-encode everything
    blocks = store.read_blocks(spark, ids, with_codec=cdc is None)
    read_gens: list[int] = []
    in_range = None
    n_deleted = 0
    legacy_ids: list[str] = []
    if apply_deletes:
        read_gens = [d["gen"] for d in manifest0["deletes"]]
        deletes = store.read_deletes_with_gen(spark, manifest=manifest0)
        if deletes is not None:
            # only tombstones inside a merged segment's ACTUAL range matter —
            # per-meta ranges, not [min_lo, max_hi): merge sets can be
            # non-contiguous and ids in the gaps belong to other segments
            from functools import reduce

            def _rng(m):
                return (F.col("doc_id") >= m.doc_lo) & (
                    F.col("doc_id") < m.doc_hi
                )

            cond = reduce(lambda a, b: a | b, [_rng(m) for m in metas])
            in_range = deletes.where(cond).select("doc_id").distinct()
            # docs_cnt accounting is GEN-AWARE: a tombstone counts against a
            # covering segment only if that segment has not already applied
            # its generation (lineage ``deletes_gens``, written below) — a
            # partial merge followed by a full merge re-reads the same
            # unretired tombstone and must not subtract the doc twice.
            # Counting by tombstone id (not decoded-posting presence) is
            # what keeps zero-token docs (assigned ids with no postings)
            # correctly subtracted.  Ranges are disjoint, so each id has
            # exactly one covering segment.
            def _applied(m):
                gens = m.lineage.get("deletes_gens", [])
                return F.col("gen").isin([int(g) for g in gens]) if gens else F.lit(False)

            # A meta WITHOUT the deletes_gens key predates gen-aware
            # lineage: which tombstone generations it already applied is
            # UNKNOWN, so id-based counting could subtract an
            # already-applied (already-subtracted) tombstone a second time
            # and drift docs_cnt low.  For those ranges, fall back to
            # presence-based counting: a tombstone only counts if its doc
            # still physically exists in the segment's blocks.  (Fresh
            # segments write deletes_gens=[] explicitly, so the id-based
            # path — which alone subtracts zero-token docs correctly —
            # stays the norm.)
            aware = [m for m in metas if "deletes_gens" in m.lineage]
            legacy = [m for m in metas if "deletes_gens" not in m.lineage]
            parts = []
            if aware:
                countable = deletes.where(
                    reduce(
                        lambda a, b: a | b,
                        [_rng(m) & ~_applied(m) for m in aware],
                    )
                ).select("doc_id").distinct()
                already = deletes.where(
                    reduce(
                        lambda a, b: a | b,
                        [_rng(m) & _applied(m) for m in aware],
                    )
                ).select("doc_id").distinct()
                parts.append(countable.join(already, "doc_id", "left_anti"))
            if legacy:
                import logging

                legacy_ids = [m.segment_id for m in legacy]
                # presence counting is the only SAFE mode for unknown
                # applied sets, but it is LOSSY for zero-token docs: a
                # never-applied tombstone on an assigned id with no
                # postings leaves no presence evidence, so docs_cnt (and
                # every idf after this merge) stays one high per such doc.
                # Surface the mode — silent lossy accounting is against
                # this codebase's no-silent-drops convention — and record
                # it in the merged lineage for later audits/fsck.
                logging.getLogger(__name__).warning(
                    "merge: %d segment(s) predate gen-aware delete lineage "
                    "(%s); their tombstones are counted by posting "
                    "PRESENCE, which cannot see zero-token docs — docs_cnt "
                    "may over-count tombstoned docs that had no postings "
                    "in those ranges",
                    len(legacy),
                    legacy_ids,
                )
                lcond = reduce(lambda a, b: a | b, [_rng(m) for m in legacy])
                cand = deletes.where(lcond).select("doc_id").distinct()
                parts.append(_present_tombstones(blocks, cand, legacy, cdc))
            merged_cnt = parts[0]
            for p in parts[1:]:
                merged_cnt = merged_cnt.unionByName(p)
            n_deleted = merged_cnt.distinct().count()

    # One chunk width AND one codec per output segment: re-encoded blocks
    # use the inputs' common chunk_bits/codec so reused + re-encoded blocks
    # share one geometry and one wire, and the recorded lineage stays exact
    # (later merges' tombstone chunk probe, chunk-restricted pruning, and
    # the decode path depend on both).  Mixed-width OR mixed-codec inputs
    # disable the byte-reuse fast path entirely — everything is decoded
    # (per its own codec) and re-encoded at the default width / the store's
    # default codec (the merge.cpp:256-287 same-codec raw-copy rule).
    cb = _merge_chunk_bits(metas)
    out_bits = cb if cb is not None else CHUNK_BITS
    out_codec = cdc if cdc is not None else store.default_codec()
    full = F.col("doc_count") == BLOCK_SIZE
    if cb is None or cdc is None:
        reused = (
            blocks.drop("codec") if cdc is None else blocks
        ).where(F.lit(False))
        rest = blocks
    else:
        # (term, chunk) groups with 2+ partial blocks need repacking; all
        # other blocks (fulls + lone partials) are already optimally packed.
        # Metadata-only aggregation — byte columns pruned from this job.
        multi = (
            blocks.where(~full)
            .groupBy("term", "chunk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
            .select("term", "chunk")
        )
        # no forced broadcast on `multi` (ADVICE r3): its size is unbounded —
        # a first compaction of a fragmented build has ~one row per distinct
        # (term, chunk) — so AQE decides (broadcast when small, shuffle hash
        # join otherwise; the join is metadata-only either way)
        packed = blocks.where(full).unionByName(
            blocks.where(~full).join(multi, ["term", "chunk"], "left_anti")
        )
        needs_repack = blocks.where(~full).join(
            multi, ["term", "chunk"], "left_semi"
        )
        if in_range is not None:
            tomb = in_range.select(
                F.col("doc_id").alias("_t_doc"),
                F.shiftright(F.col("doc_id"), cb).alias("_t_chunk"),
            )
            probe = (
                (F.col("chunk") == F.col("_t_chunk"))
                & (F.col("_t_doc") >= F.col("min_doc_id"))
                & (F.col("_t_doc") <= F.col("max_doc_id"))
            )
            safe = packed.join(F.broadcast(tomb), probe, "left_anti")
            # range-cover is only a CANDIDATE test: a block whose
            # [min_doc_id, max_doc_id] covers a tombstoned id need not
            # CONTAIN it — a rare term's lone partial spans most of its
            # chunk, so with tombstones scattered across every chunk the
            # range probe alone re-encoded the majority of all blocks
            # (measured: 10M-turn merge with 1000 tombstones fell to 36.7%
            # byte reuse).  Refine candidates by actual doc membership
            # (doc_deltas-only decode, the reference's skiplist-then-seek
            # discipline: google_codec.cpp:146-176 confirms a docID is in
            # a block before touching it) and reuse the true misses.
            cand = packed.join(F.broadcast(tomb), probe, "left_semi")
            clean, tombhit = _membership_refine(cand, in_range, cdc)
            reused = safe.unionByName(clean)
            rest = needs_repack.unionByName(tombhit)
        else:
            reused = packed
            rest = needs_repack

    # mixed-codec `rest` carries the codec tag column -> decode splits per
    # codec; single-codec inputs decode with that codec directly.  Decode
    # WITH payloads: re-encoded blocks must carry their per-hit payload
    # stream through the merge (reused blocks keep theirs byte-for-byte, so
    # dropping them here would silently strip payloads from exactly the
    # repacked/tombstone-hit blocks); payload-free stores round-trip an
    # empty stream
    rest_postings = (
        decode_segments(rest, with_payloads=True)
        if cdc is None
        else decode_segments(rest, with_payloads=True, codec=cdc)
    )
    if in_range is not None:
        # physical removal anti-joins ALL in-range tombstone ids (removing
        # already-absent ids is a no-op); the docs_cnt arithmetic used the
        # gen-aware count computed above
        rest_postings = rest_postings.join(
            F.broadcast(in_range), "doc_id", "left_anti"
        )

    docs_cnt = sum(m.docs_cnt for m in metas) - n_deleted
    # tag reused rows BEFORE the union so the metrics pass is one cheap
    # group-count over the persisted output instead of re-executing the whole
    # reuse pipeline (ADVICE r3: reused.count() replayed the metadata scan +
    # probe joins as a full extra job on every merge)
    new_blocks = (
        reused.withColumn("_reused", F.lit(True))
        .unionByName(
            encode_postings(
                rest_postings, chunk_bits=out_bits, codec=out_codec
            ).withColumn("_reused", F.lit(False))
        )
        .persist()
    )
    # dictionary + stats off block METADATA — reused blocks are never decoded
    term_dict = term_dict_from_blocks(new_blocks)
    stats = field_stats_from_blocks(new_blocks, docs_cnt=docs_cnt)

    # name suffix = next_generation at merge-PLAN time (manifest0, no extra
    # read) — a uniqueness scope, not the committed generation: concurrent
    # commits may bump the counter before commit_merge assigns the real one
    # (meta.generation, set inside the atomic commit, is authoritative)
    gen = manifest0["next_generation"]
    meta = SegmentMeta(
        segment_id=f"merged-{lo:014d}-{hi:014d}-g{gen:06d}",
        generation=0,
        doc_lo=lo,
        doc_hi=hi,
        docs_cnt=docs_cnt,
        lineage={
            "merged_from": ids,
            "deletes_applied": n_deleted,
            # every gen read now is fully applied to this segment's range,
            # as is every gen an input had already applied — later merges
            # must not re-count them (see the gen-aware accounting above)
            "deletes_gens": sorted(
                set(read_gens)
                | {
                    int(g)
                    for m in metas
                    for g in m.lineage.get("deletes_gens", [])
                }
            ),
            "chunk_bits": out_bits,
            "codec": out_codec,
            "engine_version": __version__,
            # audit trail: ranges whose tombstones were counted by the
            # lossy presence mode (inputs predating deletes_gens lineage)
            **(
                {"legacy_presence_counted": legacy_ids} if legacy_ids else {}
            ),
        },
        metrics={},
    )
    # ONE atomic manifest write: merged segment in, inputs out, fully-applied
    # tombstone gens retired — no window serving merged docs twice, no lost
    # concurrent delete (see SegmentStore.commit_merge).  Gens retire only if
    # this merge covered every segment that existed at read time — deletes
    # added concurrently (later gens) and deletes still masking unmerged
    # segments stay in force.
    store.commit_merge(
        new_blocks.drop("_reused"),
        term_dict,
        stats,
        meta,
        retire_ids=ids,
        retire_delete_gens=(
            read_gens if (apply_deletes and full_merge and read_gens) else None
        ),
    )
    # byte-reuse economics for metrics: ONE group-count over the cached
    # output (materialized by the commit write above) — no pipeline replay
    counts = {
        r["_reused"]: r["cnt"]
        for r in new_blocks.groupBy("_reused")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n_reused = int(counts.get(True, 0))
    n_total = int(sum(counts.values()))
    new_blocks.unpersist()
    wall = time.monotonic() - t0
    meta.metrics.update(
        {
            "wall_sec": round(wall, 3),
            "docs": docs_cnt,
            "docs_per_sec": round(docs_cnt / wall, 1) if wall else None,
            # the merge.cpp:166-180 fast-path economics: blocks moved
            # byte-identical vs decoded+re-encoded
            "blocks_reused": n_reused,
            "blocks_reencoded": n_total - n_reused,
        }
    )
    store.update_segment_metrics(meta.segment_id, meta.metrics)
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
