"""Segment store: generational segments + atomic manifest + deletes.

Reference analog — Trinity's on-disk index model:
- a *segment* is a directory of postings + term dictionary + field stats,
  named by generation (``/root/reference/indexer.cpp:241-300``);
- an *index sources collection* is the ordered-by-generation set of segments,
  where newer sources' masked-document sets veto older docs
  (``index_source.h:191-238``);
- segment persist is atomic (tmp write + rename, ``indexer.cpp:286-300``).

Our layout (plain parquet + a JSON manifest; the design is Iceberg-shaped —
manifest == snapshot metadata — because no Iceberg runtime jar ships in this
sandbox; on a cluster each ``commit_segment`` becomes one Iceberg append
snapshot):

    <base>/
      manifest.json                 # atomic: tmp + os.replace
      docid_map/                    # doc_id <-> (conv_id, turn_idx) + text cols
      segments/<segment_id>/
        postings/   (block rows, written sorted by term -> parquet min/max
                     column stats give term-seek, the terms.idx analog)
        term_dict/
        field_stats/
      deletes/<gen>.parquet         # masked doc_ids (docidupdates.cpp analog)

The manifest records, per segment: generation, doc range, row counts, build
METRICS (wall seconds, turns/sec) and LINEAGE (input fingerprint, docid
range, builder version) — the north rule's per-partition checkpoint +
lineage requirement.  ``build_index`` resumes by skipping segment ids already
committed in the manifest.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"


@dataclass
class SegmentMeta:
    segment_id: str
    generation: int
    doc_lo: int
    doc_hi: int  # exclusive
    docs_cnt: int
    lineage: dict[str, Any] = field(default_factory=dict)
    metrics: dict[str, Any] = field(default_factory=dict)


class SegmentStore:
    def __init__(self, base: str):
        self.base = base
        os.makedirs(base, exist_ok=True)

    # --- manifest ---

    def _manifest_path(self) -> str:
        return os.path.join(self.base, MANIFEST)

    def read_manifest(self) -> dict[str, Any]:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"segments": [], "deletes": [], "next_generation": 1}
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, m: dict[str, Any]) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())  # atomic snapshot commit

    def segments(self) -> list[SegmentMeta]:
        return [SegmentMeta(**s) for s in self.read_manifest()["segments"]]

    def has_segment(self, segment_id: str) -> bool:
        return any(s["segment_id"] == segment_id for s in self.read_manifest()["segments"])

    # --- paths ---

    def segment_dir(self, segment_id: str, part: str) -> str:
        return os.path.join(self.base, "segments", segment_id, part)

    def docid_map_dir(self) -> str:
        return os.path.join(self.base, "docid_map")

    # --- writes ---

    def write_docid_map(
        self,
        turns_with_ids: DataFrame,
        n_docs: int | None = None,
        layout: bool = True,
    ) -> None:
        """Write the docid_map; when ``n_docs`` is known and ``layout`` is on,
        lay files out by doc_id range (pid = doc_id // rows_per_file, rows
        sorted within) so a segment's ``doc_id in [lo, hi)`` read prunes
        files/row-groups via parquet min/max stats instead of scanning the
        whole corpus.  Single-segment builds pass ``layout=False`` — the one
        segment reads everything anyway, so the range shuffle is pure cost."""
        df = turns_with_ids
        if n_docs and layout:
            import math

            par = max(df.sparkSession.sparkContext.defaultParallelism, 2)
            rows_per_file = max(math.ceil(n_docs / (par * 2)), 1 << 14)
            n_files = max(math.ceil(n_docs / rows_per_file), 1)
            df = df.repartition(
                n_files, (F.col("doc_id") / F.lit(rows_per_file)).cast("long")
            ).sortWithinPartitions("doc_id")
        df.write.mode("overwrite").parquet(self.docid_map_dir())
        if n_docs is not None:
            m = self.read_manifest()
            m["docid_map"] = {"n_docs": int(n_docs)}
            self._write_manifest(m)

    def write_docid_map_slice(self, turns_with_ids: DataFrame, segment_id: str) -> None:
        """NRT micro-batch slice of the docid_map, at a DETERMINISTIC
        per-segment path with overwrite semantics: a crashed batch replayed
        by the stream checkpoint rewrites the same files instead of appending
        duplicate doc_id rows (exactly-once for the map, not just the
        segment)."""
        turns_with_ids.write.mode("overwrite").parquet(
            os.path.join(self.docid_map_dir(), "nrt", segment_id)
        )

    def read_docid_map_slice(self, spark: SparkSession, segment_id: str) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.docid_map_dir(), "nrt", segment_id)
        )

    def docid_map_count(self, spark: SparkSession) -> int:
        """n_docs from the manifest when recorded; else one count job."""
        m = self.read_manifest()
        if "docid_map" in m and "n_docs" in m["docid_map"]:
            return int(m["docid_map"]["n_docs"])
        return self.read_docid_map(spark).count()

    def commit_segment(
        self,
        blocks: DataFrame,
        term_dict: DataFrame,
        field_stats: DataFrame,
        meta: SegmentMeta,
    ) -> None:
        """Write segment data, then atomically add it to the manifest.
        Data writes are idempotent (overwrite) so a crashed attempt is
        invisible until the manifest names the segment — Trinity's
        tmp-then-rename persist (indexer.cpp:286-300)."""
        # sorted by term: parquet row-group min/max on `term` = dictionary seek
        blocks.repartitionByRange(
            max(blocks.sparkSession.sparkContext.defaultParallelism // 2, 1), "term"
        ).sortWithinPartitions("term", "block_id").write.mode("overwrite").parquet(
            self.segment_dir(meta.segment_id, "postings")
        )
        term_dict.write.mode("overwrite").parquet(self.segment_dir(meta.segment_id, "term_dict"))
        field_stats.write.mode("overwrite").parquet(
            self.segment_dir(meta.segment_id, "field_stats")
        )
        m = self.read_manifest()
        m["segments"] = [s for s in m["segments"] if s["segment_id"] != meta.segment_id]
        meta.generation = m["next_generation"]
        m["next_generation"] += 1
        m["segments"].append(meta.__dict__)
        self._write_manifest(m)

    def retire_segments(self, segment_ids: list[str]) -> None:
        """Drop merged-away segments from the manifest (the merge retention
        verdict, merge.cpp:418-447). Data dirs are left for GC."""
        m = self.read_manifest()
        m["segments"] = [s for s in m["segments"] if s["segment_id"] not in segment_ids]
        self._write_manifest(m)

    def add_deletes(self, spark: SparkSession, doc_ids: list[int] | DataFrame) -> int:
        """Mask documents (docidupdates.cpp analog): a new tombstone file +
        manifest entry at the next generation."""
        m = self.read_manifest()
        gen = m["next_generation"]
        m["next_generation"] += 1
        path = os.path.join(self.base, "deletes", f"{gen}.parquet")
        df = (
            spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
            if isinstance(doc_ids, list)
            else doc_ids.select(F.col("doc_id").cast("long"))
        )
        df.withColumn("gen", F.lit(gen)).write.mode("overwrite").parquet(path)
        m["deletes"].append({"gen": gen, "path": path})
        self._write_manifest(m)
        return gen

    # --- reads ---

    def read_blocks(self, spark: SparkSession, segment_ids: list[str] | None = None) -> DataFrame:
        metas = self.segments()
        if segment_ids is not None:
            metas = [s for s in metas if s.segment_id in segment_ids]
        if not metas:
            from ..operators.segments import SEGMENT_SCHEMA

            return spark.createDataFrame([], SEGMENT_SCHEMA)
        paths = [self.segment_dir(s.segment_id, "postings") for s in metas]
        return spark.read.parquet(*paths)

    def read_term_dict(self, spark: SparkSession) -> DataFrame:
        metas = self.segments()
        if not metas:
            return spark.createDataFrame([], "term string, df long, cf long")
        return spark.read.parquet(*[self.segment_dir(s.segment_id, "term_dict") for s in metas])

    def read_field_stats(self, spark: SparkSession) -> DataFrame:
        metas = self.segments()
        if not metas:
            return spark.createDataFrame(
                [], "sum_term_hits long, total_terms long, sum_terms_docs long, docs_cnt long"
            )
        return spark.read.parquet(
            *[self.segment_dir(s.segment_id, "field_stats") for s in metas]
        )

    def read_deletes(self, spark: SparkSession) -> DataFrame | None:
        m = self.read_manifest()
        if not m["deletes"]:
            return None
        return spark.read.parquet(*[d["path"] for d in m["deletes"]]).select("doc_id").distinct()

    def read_docid_map(self, spark: SparkSession) -> DataFrame:
        # recursive: picks up both the batch-build map (flat files) and any
        # NRT per-segment slices (nrt/<segment_id>/ subdirectories)
        return spark.read.option("recursiveFileLookup", "true").parquet(
            self.docid_map_dir()
        )
