"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with typed metadata and runs decode / feature-extract /
resize / frame-sample as Arrow-batched UDF stages.  The image/audio codec
libraries are NOT in this container, so the *decode kernels* are stubbed:
``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True`` selects the deterministic fake decoder (byte-statistics
features).  Everything Spark-side — schema, batching, partitioning, UDF
signatures, output shapes — is real and tested (tests/test_dataops.py).

Scale notes: media rows are large and skew-prone; ``repartition_for_media``
bins rows by payload size so one partition never holds two 100 MB videos
while another holds 10k thumbnails (explicit size-salting, the binary-column
analog of the term-chunk salt in segments.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

FEATURE_DIM = 8


def make_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: wrap any (id, text) table as a fake media table (payload =
    utf-8 bytes) so the plumbing is exercisable without real assets."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake decoder: byte-statistics feature vector.
    Stands in for a real image/audio decode; same output shape contract."""
    b = np.frombuffer(payload or b"", dtype=np.uint8).astype(np.float32)
    if b.size == 0:
        # NULL/empty payload (metadata-only row): all-zero feature whose
        # length slot agrees with the n_bytes column — the old b"\x00"
        # substitute reported a phantom byte (feature[0]=1) that
        # n_bytes=0 contradicted in the same output row
        return np.zeros(8, dtype=np.float32)
    return np.array(
        [
            len(b),
            float(b.mean()),
            float(b.std()),
            float(b.min()),
            float(b.max()),
            float(np.median(b)),
            float((b > 127).mean()),
            float(b[:16].sum()),
        ],
        dtype=np.float32,
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image codecs (PIL/cv2) are not available in this environment; "
        "pass fake=True for the deterministic stub decoder"
    )


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "audio codecs (soundfile/librosa) are not available in this "
        "environment; pass fake=True for the deterministic stub decoder"
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode + feature extraction (mapInPandas).

    Real pipeline shape: batches arrive as pandas frames, the codec runs
    per payload (vectorized where the codec allows), features leave as a
    fixed-dim array<float> column."""

    decoders = {
        "image": decode_image,
        "audio": decode_audio,
        # video frames decode as images once a real codec is plugged in;
        # the frame explode lives in frame_sample_plan
        "video": decode_image,
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                dec = decoders.get(k)
                if dec is None:
                    # explicit dispatch: an unknown kind must error, not be
                    # silently decoded as audio (the old else-branch fed
                    # video payloads to decode_audio)
                    raise ValueError(f"extract_features: unknown media kind {k!r}")
                feats.append(dec(p, fake=fake))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode —
    the explode that precedes a real frame decoder.  Runs entirely JVM-side;
    the decode stage it feeds is `extract_features`-shaped."""
    n_frames = F.greatest(
        (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int"), F.lit(1)
    )
    frames = media.where(F.col("kind") == "video").select(
        "media_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    )
    return frames.withColumn("ts_ms", F.col("frame_idx") * F.lit(every_ms))


def repartition_for_media(media: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Size-aware salting: big payloads spread out, small ones pack together.
    Salt = size bucket (payload_len / target) x 64 + id hash, so same-tier
    payloads scatter over 64 sub-buckets (probabilistic: two same-tier
    payloads still collide with p=1/64 — this bounds expected skew, it is
    not a strict one-big-payload-per-partition guarantee).  NULL payloads
    (metadata-only rows) count as size 0 so they spread with the small tier
    instead of all hashing to the single NULL-salt partition."""
    size_bucket = (
        F.coalesce(F.length("payload"), F.lit(0)) / F.lit(target_bytes)
    ).cast("long")
    salt = F.pmod(F.xxhash64("media_id"), F.lit(64)) + size_bucket * 64
    return media.repartition(salt)
