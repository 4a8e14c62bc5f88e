"""Streaming ingest dedup: drop exact-duplicate documents as they arrive.

A training-data ingest pipeline dedupes ON THE WAY IN, not only in batch
sweeps: a re-posted document admitted today costs a tokenize/index/embed
pass plus a later batch-dedup round trip.  Structured Streaming's
``dropDuplicatesWithinWatermark`` is exactly the built-in for this — state
keyed by content hash, bounded by the event-time watermark (a duplicate
arriving later than the watermark delay is admitted and left for the batch
sweep; unbounded exact streaming dedup would need unbounded state at
10^12 docs, so the bound is the design, not a compromise).

Composes with the batch side: ``dataops.dedup.content_hash`` is the same
md5 fingerprint, so stream-admitted docs and batch sweeps agree on
identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dataops.dedup import content_hash


def dedup_stream(
    stream: DataFrame,
    watermark_delay: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Exact-dedup a streaming DataFrame by content hash.

    State is ONE row per distinct hash seen within the watermark horizon —
    the 10^12-doc bound.  Within the horizon the FIRST arrival wins
    (micro-batch processing order); later identical texts are dropped.

    NULL-text rows (media-only / failed-extraction documents) pass through
    UNDEDUPLICATED: their content hash is NULL, and
    ``dropDuplicatesWithinWatermark`` keys NULLs as equal — keying them
    would silently collapse every NULL-text document after the first into
    one.  The batch side agrees: ``curate`` gates NULL-text docs
    individually, never as exact duplicates of each other.
    """
    hashed = stream.withColumn("_h", content_hash(F.col(text_col)))
    deduped = (
        hashed.where(F.col("_h").isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["_h"])
    )
    return deduped.unionByName(hashed.where(F.col("_h").isNull())).drop("_h")
