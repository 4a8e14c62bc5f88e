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


# --- IVF (inverted-file) ANN --------------------------------------------------


def _argmax_cosine(vec: Column, cents: list[list[float]]) -> Column:
    """Index of the max-cosine centroid, as one JVM expression: array_max
    over (cosine, idx) structs (struct comparison is field-ordered)."""
    pairs = F.array(
        *[
            F.struct(
                cosine(vec, F.array(*[F.lit(float(x)) for x in c])).alias("c"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(cents)
        ]
    )
    return F.array_max(pairs)["i"]


def ivf_index(
    vectors: DataFrame,
    n_lists: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF partitioning: deterministic k-means over the embedding column.

    Init = the ``n_lists`` vectors with smallest md5(id) (a deterministic
    sample, reproducible anywhere); ``iters`` Lloyd rounds follow, each one
    Spark job: assign (JVM expression argmax) + per-dimension mean via
    posexplode/groupBy.  Returns (vectors + ``list_id``, centroids).

    Scale notes: centroids live in the plan as literals and the Lloyd update
    collects n_lists x dim mean cells per round — the right call up to a few
    hundred lists.  Past that use ``ivf_index_scalable`` (broadcast-join
    assignment + in-Spark update, no driver materialization); at 10^9+
    vectors the list assignment is computed once and the table is written
    partitioned/clustered BY list_id so a query's probes touch only its
    lists' files — the IVF promise in storage-pruning form."""
    v = vectors.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
    init = (
        v.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(n_lists)
        .collect()
    )
    cents = [list(r[vec_col]) for r in init]
    for _ in range(iters):
        assigned = v.withColumn("list_id", _argmax_cosine(F.col(vec_col), cents))
        means = (
            assigned.select("list_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_list: dict[int, dict[int, float]] = {}
        for r in means:
            by_list.setdefault(r["list_id"], {})[r["pos"]] = r["m"]
        cents = [
            [d[p] for p in sorted(d)] if (d := by_list.get(i)) else cents[i]
            for i in range(n_lists)
        ]
    return v.withColumn("list_id", _argmax_cosine(F.col(vec_col), cents)), cents


def _assign_with_cdf(
    v: DataFrame, cdf: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Broadcast-join argmax-cosine list assignment against a (list_id,
    centroid) DataFrame; ties break to the higher list id, matching
    ``_argmax_cosine``'s array_max struct ordering."""
    scored = v.crossJoin(F.broadcast(cdf)).withColumn(
        "cos_sim", cosine(F.col(vec_col), F.col("centroid"))
    )
    best = scored.groupBy(id_col).agg(
        F.expr("max_by(list_id, struct(cos_sim, list_id))").alias("list_id")
    )
    return v.join(best, id_col)


def ivf_assign_join(
    vectors: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-path list assignment: broadcast the centroids as a DataFrame and
    pick each vector's argmax-cosine list with ``max_by`` — for n_lists in
    the thousands, where the literal-expression argmax of ``_argmax_cosine``
    would blow up the plan.  Cost: |vectors| x n_lists comparison rows, all
    map-side (broadcast join, no shuffle of the vectors)."""
    spark = vectors.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    )
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    return _assign_with_cdf(v, cdf, id_col, vec_col)


def ivf_index_scalable(
    vectors: DataFrame,
    n_lists: int = 256,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF k-means with the Lloyd UPDATE step kept in Spark — the large-
    n_lists·dim path (``ivf_index`` collects n_lists x dim mean rows to the
    driver per round, which becomes a driver bottleneck past ~10^6 cells).

    Centroids live as a (list_id, centroid array<double>) DataFrame for the
    whole training loop: assignment is the ``ivf_assign_join`` broadcast
    argmax, the update re-assembles per-list mean vectors with
    posexplode -> avg -> collect_list(struct(pos, m)) sorted by pos — no
    driver materialization at any round.  Each round's centroid table is
    eagerly localCheckpoint'ed (n_lists rows, distributed) to cut lineage.
    Empty lists keep their previous centroid.

    Returns (vectors + list_id, centroids DataFrame).  Query-time probe
    selection still needs the centroids once driver-side —
    ``cdf.collect()`` — which is O(n_lists * dim) independent of data size.
    """
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    from pyspark.sql import Window

    w = Window.orderBy("_h", id_col)  # n_lists rows: 1-partition window is fine
    cdf = (
        v.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(n_lists)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("list_id"),
            F.col(vec_col).alias("centroid"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = _assign_with_cdf(v, cdf, id_col, vec_col)
        means = (
            assigned.select("list_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg("x").alias("m"))
        )
        new_cdf = means.groupBy("list_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
        cdf = (
            cdf.select("list_id", F.col("centroid").alias("_old"))
            .join(new_cdf, "list_id", "left")
            .select(
                "list_id",
                F.coalesce(F.col("centroid"), F.col("_old")).alias("centroid"),
            )
            .localCheckpoint(eager=True)
        )
    return _assign_with_cdf(v, cdf, id_col, vec_col), cdf


def ivf_topk(
    indexed: DataFrame,
    cents: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k probing the ``n_probe`` nearest lists.
    ``n_probe = n_lists`` degenerates to exact brute force (the recall
    guarantee tests rely on)."""

    def cos_py(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    order = sorted(range(len(cents)), key=lambda i: (-cos_py(query, cents[i]), i))
    probes = order[: max(n_probe, 1)]
    return brute_force_topk(
        indexed.where(F.col("list_id").isin(probes)), query, k, id_col, vec_col
    )


def cosine_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 12,
    band_bits: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-banded self-join + exact
    cosine verify.  Bands of the sign signature bucket the join so the
    self-join never goes quadratic ACROSS buckets; ``max_bucket_size``
    additionally bounds a single degenerate bucket (a flood of identical
    or near-identical embeddings shares every sign band) the same way the
    text-side LSH does — oversized buckets are salt-split into bounded
    sub-buckets re-linked by a chain of representatives, every emitted
    pair still exact-cosine verified, skip logged (see
    ``dedup._capped_bucket_pairs``).  None = exact (no cap)."""
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
    if max_bucket_size is not None:
        from .dedup import _capped_bucket_pairs

        pairs = _capped_bucket_pairs(
            banded,
            ["band", "key"],
            id_col,
            max_bucket_size,
            sig_col=vec_col,
            label="CosineLSH",
        ).select(
            "id_a", "id_b", F.col("sig_a").alias("va"), F.col("sig_b").alias("vb")
        )
    else:
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


# --- SemDeDup: cluster-scoped semantic dedup ----------------------------------


def semantic_dedup_pairs(
    indexed: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "list_id",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Within-cluster exact-cosine near-duplicate pairs over a CLUSTERED
    embedding table — the SemDeDup recipe (Abbas et al. 2023,
    arXiv:2303.09540): k-means partition the corpus, then verify pairwise
    cosine only inside each cluster.  This is the published scale path for
    embedding-level dedup: the quadratic term is bounded by cluster size
    (|corpus| / n_lists on average) instead of the corpus, and the
    self-join shuffles once on ``list_col``.  It is the semantic complement
    of ``cosine_pairs`` — LSH bands catch high-cosine twins cheaply; k-means
    clusters catch "same meaning, different wording" groups whose cosine
    sits below the band-collision operating point but inside one centroid's
    cell.

    ``indexed`` is the output of ``ivf_index`` / ``ivf_index_scalable`` /
    ``ivf_assign_join`` (id, embedding, list_id) — the SAME centroids and
    assignment serve ANN probing and dedup, so a pipeline pays for k-means
    once.  ``max_cluster_size`` bounds a degenerate cluster (an
    identical-embedding flood assigns to one centroid) exactly like the
    text-side LSH cap: oversized clusters salt-split into bounded
    sub-buckets re-linked by a verified representative chain, skip logged
    (``dedup._capped_bucket_pairs``).  None = exact within-cluster
    all-pairs.

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded to 6.
    """
    src = indexed.select(F.col(id_col), F.col(vec_col), F.col(list_col))
    if max_cluster_size is not None:
        from .dedup import _capped_bucket_pairs

        pairs = _capped_bucket_pairs(
            src,
            [list_col],
            id_col,
            max_cluster_size,
            sig_col=vec_col,
            label="SemDeDup",
        ).select(
            "id_a", "id_b", F.col("sig_a").alias("va"), F.col("sig_b").alias("vb")
        )
    else:
        a, b = src.alias("a"), src.alias("b")
        pairs = a.join(
            b,
            (F.col(f"a.{list_col}") == F.col(f"b.{list_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
    cos = F.round(
        cosine(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")), 6
    )
    return pairs.select("id_a", "id_b", cos.alias("cosine")).where(
        F.col("cosine") >= threshold
    )


def semantic_dedup(
    vectors: DataFrame,
    n_lists: int = 256,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """End-to-end SemDeDup: train deterministic k-means in Spark
    (``ivf_index_scalable`` — no driver materialization), generate
    within-cluster pairs at ``threshold``, and resolve duplicate clusters
    to a canonical representative (smallest id, via the shared min-label
    connected-components pass).  Returns every input id with
    (list_id, component, is_canonical); ``.where("is_canonical")`` is the
    semantically deduplicated corpus."""
    from .dedup import resolve_duplicates

    indexed, _cents = ivf_index_scalable(
        vectors, n_lists=n_lists, iters=iters, id_col=id_col, vec_col=vec_col
    )
    pairs = semantic_dedup_pairs(
        indexed,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        max_cluster_size=max_cluster_size,
    )
    resolved = resolve_duplicates(
        indexed.select(id_col, "list_id"), pairs, id_col=id_col
    )
    return indexed.select(F.col(id_col), F.col("list_id")).join(
        resolved.select(F.col(id_col).alias("_rid"), "component", "is_canonical"),
        F.col(id_col) == F.col("_rid"),
    ).drop("_rid")
