"""Similarity search over embedding columns (array<float/double>).

Two paths, as a 100 TB pipeline needs both:

- ``brute_force_topk``: exact cosine top-k of a query vector against every
  row — one scan, JVM-side ``F.zip_with``/``F.aggregate`` arithmetic (no
  Python), ``TakeOrderedAndProject`` for the global k.  The correctness
  baseline and the right choice below ~10^8 vectors.
- ``lsh_topk``: random-hyperplane LSH. Deterministic hyperplanes are derived
  from md5 of (seed, bit, dim) so signatures are reproducible anywhere; the
  query probes only its own bucket ring (hamming radius 0..r), turning the
  scan into a bucket-pruned candidate rescore.  Recall/latency knob = bits +
  probe radius.  On a cluster the signature column is precomputed once and
  bucketed/clustered on write, so a query touches a few partitions.

- ``cosine_pairs``: embedding-cosine near-duplicate pairs over an
  LSH-bucketed self-join (the embedding analog of minhash dedup).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (id, score), score desc, id asc tie-break."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = vectors.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


# --- random-hyperplane LSH ---------------------------------------------------


def _hyperplane(seed: int, bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5 bytes."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}|{bit}|{d}".encode()).hexdigest()
        # map 8 hex chars -> [-1, 1)
        out.append(int(h[:8], 16) / float(1 << 31) - 1.0)
    return out


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of the vector against each hyperplane."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec_col, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = sig + bit.cast("long")
    return sig


def add_lsh_signatures(
    vectors: DataFrame,
    dim: int,
    bits: int = 12,
    seed: int = 7,
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    planes = [_hyperplane(seed, b, dim) for b in range(bits)]
    return (
        vectors.withColumn(
            "lsh_sig", lsh_signature(F.col(vec_col).cast("array<double>"), planes)
        ),
        planes,
    )


def _query_sig(query: list[float], planes: list[list[float]]) -> int:
    sig = 0
    for i, plane in enumerate(planes):
        if sum(x * y for x, y in zip(query, plane)) >= 0:
            sig |= 1 << i
    return sig


def lsh_topk(
    vectors_with_sig: DataFrame,
    planes: list[list[float]],
    query: list[float],
    k: int = 10,
    probe_radius: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: rescore only rows whose signature is within
    ``probe_radius`` hamming distance of the query signature."""
    qsig = _query_sig(query, planes)
    candidates = vectors_with_sig.where(
        F.bit_count(F.col("lsh_sig").bitwiseXOR(F.lit(qsig))) <= probe_radius
    )
    return brute_force_topk(candidates, query, k, id_col, vec_col)


def cosine_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 12,
    band_bits: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-banded self-join + exact
    cosine verify.  Bands of the sign signature bucket the join so the
    self-join never goes quadratic."""
    sigged, _ = add_lsh_signatures(vectors, dim, bits, seed, vec_col)
    n_bands = math.ceil(bits / band_bits)
    mask = (1 << band_bits) - 1
    banded = sigged.select(
        F.col(id_col), F.col(vec_col), F.col("lsh_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("lsh_sig"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, vec_col, "bb.band", "bb.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
        .distinct()
    )
    cos = F.round(
        cosine(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")), 6
    )
    return pairs.select("id_a", "id_b", cos.alias("cosine")).where(
        F.col("cosine") >= threshold
    )
