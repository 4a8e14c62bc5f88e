"""Training-data assembly operators: deterministic corpus splitting,
benchmark decontamination, and token-budget sequence packing.

These are the passes that turn a curated corpus into model-ready data; at
100 TB each is shaped to avoid the failure mode that kills it at scale:

- ``hash_split``: split assignment must be a pure function of the document
  id (no sampling, no global sort), so re-runs, backfills, and incremental
  appends land every document in the same split forever.  One projection,
  zero shuffles.
- ``sample_sources``: mixture reweighting (epochs per source) must also be
  a pure function of (seed, id) — no RNG, no global count — so a domain's
  up/downsampling is reproducible and append-stable.  One projection +
  explode, zero shuffles.
- ``decontaminate``: benchmark/eval sets are tiny (MBs) next to the corpus,
  so the n-gram probe is a broadcast join against the corpus's exploded
  shingles — the corpus is never shuffled; only MATCHING (doc, shingle)
  rows (a vanishingly small set) reach the per-doc aggregation.
- ``pack_sequences``: contiguous token-budget packing is a global exclusive
  prefix sum in document order — the same two-phase pattern as doc-id
  assignment (``operators/docids.py``): range-partition a NARROW (id,
  n_tokens) projection, per-partition sums -> driver exclusive prefix
  (O(partitions) rows) -> one mapInArrow cumulative pass.  No global
  window funnel, no corpus-wide sort of full rows.

All arithmetic is md5-derived / integer-exact so the DuckDB driver oracle
reproduces results bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trinity_spark.dataops.dedup import shingles
from trinity_spark.dataops.textstats import token_count

_DEFAULT_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def split_bucket(id_col, seed: int = 7):
    """Deterministic 32-bit bucket for a document id: first 8 hex chars of
    md5("{seed}|{id}") — the cross-engine-stable hash used throughout
    (DuckDB: ``('0x' || substr(md5(seed || '|' || id), 1, 8))::BIGINT``).

    NULL ids fail the job: ``concat_ws`` SKIPS null arguments, so every
    NULL id would hash to the one constant bucket md5("{seed}") — a whole
    cohort silently landing in the same split / same sample decision."""
    id_str = F.col(id_col).cast("string")
    id_str = F.when(
        id_str.isNull(),
        F.assert_true(
            id_str.isNotNull(), f"split_bucket: NULL {id_col}"
        ).cast("string"),
    ).otherwise(id_str)
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), id_str)),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def split_bounds(weights: dict[str, float]) -> list[int]:
    """Upper bucket bound for every split but the last — the EXACT float
    accumulation hash_split compiles (accumulation order matters: 0.8 + 0.1
    != 0.9 exactly in IEEE754).  Exposed so oracle/SQL reproductions import
    this derivation instead of hand-copying it (copy drift = silent parity
    loss)."""
    names = list(weights)
    bounds: list[int] = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        bounds.append(int(acc * (1 << 32)))
    return bounds


def mixture_parts(w: float) -> tuple[int, int]:
    """(whole copies, fractional-accept threshold in 2^32 bucket units) for
    a mixture rate — the exact derivation sample_sources compiles; exposed
    for oracle reproductions (see split_bounds)."""
    base = int(w)
    return base, int(round((w - base) * (1 << 32)))


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """``docs`` + ``bucket`` (long) + ``split`` (string): deterministic
    hash-based train/val/test assignment.

    Split boundaries are exact integers over the 2^32 bucket space (no float
    comparisons), assigned in the ``weights`` insertion order; weights must
    sum to ~1.  A document's split depends only on (seed, id): stable under
    re-runs, appends, repartitioning, and engine changes.
    """
    weights = weights or _DEFAULT_SPLITS
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    bucket = split_bucket(id_col, seed)
    names = list(weights)
    bounds = split_bounds(weights)
    expr = F.lit(names[-1])
    for name, hi in reversed(list(zip(names[:-1], bounds))):
        expr = F.when(bucket < hi, F.lit(name)).otherwise(expr)
    return docs.withColumn("bucket", bucket).withColumn("split", expr)


def sample_sources(
    docs: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 11,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic mixture sampling: replicate or thin each document by
    its source's target rate — how a training mix reweights domains
    (upsample high-quality sources past 1.0 epochs, downsample bulk web
    below 1.0, drop a source with 0).

    A source's rate ``w`` maps to per-document copy count
    ``floor(w) + [hash_frac < frac(w)]`` with the fractional accept decided
    by the same md5 bucket as ``hash_split`` (integer-exact threshold
    ``int(frac(w) * 2^32)``, its own ``seed`` so mixture and split
    decisions stay independent): expected copies = w per doc, exact
    ``floor``/``ceil`` mix within a source, and the decision is a pure
    function of (seed, id) — stable under re-runs, appends, and
    repartitioning, so incremental pipeline runs never flip a document's
    fate.  Unlisted sources take ``default_rate``.

    Output: input columns + ``epoch`` (long, 0-based copy index; docs with
    0 copies are dropped).  One projection + explode, zero shuffles, no
    RNG state anywhere.
    """
    if any(w < 0 for w in rates.values()) or default_rate < 0:
        raise ValueError("rates must be non-negative")
    bucket = split_bucket(id_col, seed)

    src = F.col(source_col)
    db, dt = mixture_parts(default_rate)
    base_expr, thr_expr = F.lit(db), F.lit(dt)
    for name, w in rates.items():
        b, t = mixture_parts(w)
        base_expr = F.when(src == name, F.lit(b)).otherwise(base_expr)
        thr_expr = F.when(src == name, F.lit(t)).otherwise(thr_expr)
    copies = base_expr + F.when(bucket < thr_expr, 1).otherwise(0)
    return (
        docs.withColumn("_copies", copies)
        .where(F.col("_copies") > 0)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0), (F.col("_copies") - 1).cast("int"))),
        )
        .drop("_copies")
        .withColumn("epoch", F.col("epoch").cast("long"))
    )


def balanced_sample(
    docs: DataFrame,
    stratum_col: str,
    n_per_stratum: int | None = None,
    seed: int = 13,
    id_col: str = "doc_id",
    method: str = "exact",
) -> DataFrame:
    """Balanced per-stratum downsample: equal document counts per class /
    language / source — the balancing pass classifier training data needs
    (``hash_split`` / ``sample_sources`` are per-row probabilistic, so
    their per-stratum counts carry +-sqrt(n) noise; balancing wants EXACT
    counts).

    ``method="exact"`` (default): keep each stratum's first ``n`` rows in
    deterministic md5(seed|id) order (ties by id) via a per-stratum
    row_number — ONE shuffle of a narrow projection.  The window funnels
    each stratum through one task, so this is the right tool while
    per-stratum volume fits a task (millions of narrow rows); it is
    deterministic for a fixed corpus but NOT append-stable (ranks shift
    as rows arrive) — exact counts and append stability are mutually
    exclusive by construction.

    ``method="threshold"``: zero-funnel scale path — keep rows whose
    md5 bucket falls under the per-stratum acceptance threshold
    ``n / count_s * 2^32`` (one count aggregation, then a pure
    projection).  Counts land at n +- O(sqrt(n)) instead of exactly n,
    but no stratum ever concentrates on one task — the form that holds
    at 10^12 rows per stratum.

    ``n_per_stratum=None`` -> the smallest stratum's count (one extra
    aggregation).  Output: the input columns, filtered.
    """
    if method not in ("exact", "threshold"):
        raise ValueError(f"unknown method {method!r}; use 'exact' or 'threshold'")
    if n_per_stratum is not None and n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    counts = docs.groupBy(stratum_col).count()
    if n_per_stratum is None:
        row = counts.agg(F.min("count").alias("m")).collect()[0]
        if row["m"] is None:
            raise ValueError("balanced_sample of an empty DataFrame")
        n_per_stratum = int(row["m"])
    bucket = split_bucket(id_col, seed)
    if method == "threshold":
        thr = F.least(
            (F.lit(n_per_stratum) / F.col("count") * F.lit(1 << 32)).cast("long"),
            F.lit(1 << 32),
        )
        keep = counts.select(
            F.col(stratum_col).alias("_stratum"), thr.alias("_thr")
        )
        # null-safe join: groupBy counts a NULL stratum as a group (exact
        # method samples it too), so the threshold join must match it —
        # a plain equi-join would silently drop every null-stratum row
        return (
            docs.withColumn("_b", bucket)
            .join(
                F.broadcast(keep),
                F.col(stratum_col).eqNullSafe(F.col("_stratum")),
            )
            .where(F.col("_b") < F.col("_thr"))
            .drop("_b", "_thr", "_stratum")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(F.col("_b"), F.col(id_col))
    return (
        docs.withColumn("_b", bucket)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_b", "_rn")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with a benchmark
    set: (id, n_hit_ngrams, contaminated) for EVERY input document.

    Standard eval-set decontamination (the n-gram overlap check run before
    training).  Documents shorter than ``n`` tokens cannot carry a full
    n-gram and are reported clean with 0 hits — they never enter the join.

    ``broadcast_bench=True`` (default) is right whenever the benchmark's
    distinct shingle set fits an executor (real eval sets: thousands of
    docs); set False for a benchmark-sized-like-a-corpus and AQE plans the
    shuffle join.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    long_enough = F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n

    bench_sh = (
        benchmark.where(F.size(F.split(F.trim(F.col(bench_text_col)), r"\s+")) >= n)
        .select(F.explode(shingles(F.col(bench_text_col), n)).alias("sh"))
        .distinct()
    )
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    doc_sh = docs.where(long_enough).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("sh")
    )
    hits = (
        doc_sh.join(bench_sh, "sh")
        .groupBy(id_col)
        .agg(F.countDistinct("sh").alias("n_hit_ngrams"))
    )
    return docs.join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_hit_ngrams"), F.lit(0)).cast("long").alias("n_hit_ngrams"),
        (F.coalesce(F.col("n_hit_ngrams"), F.lit(0)) > 0).alias("contaminated"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous token-budget packing: (id, n_tokens, bin_id) with
    ``bin_id = exclusive_prefix_sum(n_tokens in id order) // budget``.

    A document belongs to the bin its FIRST token falls in (bins at exact
    cumulative offsets; a doc may straddle the boundary into the next bin's
    budget — the standard concat-then-chunk packing for LLM pretraining,
    deterministic and engine-checkable, unlike first-fit heuristics whose
    output depends on visit order).

    Distributed as a two-phase prefix sum over a NARROW (id, n_tokens)
    projection: range-partition by id, localCheckpoint the ~16-byte rows
    (pins partition contents so the sum pass and the cumulative pass cannot
    drift; blocks are reclaimed when the result is unreferenced), collect
    one sum per partition, then a single mapInArrow adds the partition base.
    Join the result back on ``id_col`` for the full rows.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 4)
    toks = (
        F.col(token_col).cast("long")
        if token_col
        else token_count(F.col(text_col)).cast("long")
    )
    narrow = (
        docs.select(F.col(id_col), toks.alias("n_tokens"))
        .repartitionByRange(num_partitions, id_col)
        .sortWithinPartitions(id_col)
        .localCheckpoint(eager=True)
    )
    parts = (
        narrow.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tokens").alias("n_toks"),
            # null token counts (NULL text / NULL token_col) ride the same
            # single action: they would otherwise surface as an opaque
            # ArrowInvalid in the kernel (and F.sum skips nulls, so the
            # offsets would silently drift from the kernel's cumsum)
            F.sum(F.col("n_tokens").isNull().cast("long")).alias("n_nulls"),
            # negative counts (e.g. a -1 'unknown' sentinel from an
            # upstream tokenizer, reachable only via token_col) would
            # regress the prefix sum and shift every later bin_id low
            # with no error — fail loud like the NULL case instead
            F.sum((F.col("n_tokens") < 0).cast("long")).alias("n_negs"),
        )
        .collect()  # O(partitions) rows
    )
    n_nulls = sum(int(r["n_nulls"] or 0) for r in parts)
    if n_nulls:
        raise ValueError(
            f"pack_sequences: {n_nulls} document(s) have NULL token counts "
            f"(NULL {text_col if not token_col else token_col}); filter or "
            "impute them before packing"
        )
    n_negs = sum(int(r["n_negs"] or 0) for r in parts)
    if n_negs:
        raise ValueError(
            f"pack_sequences: {n_negs} document(s) have negative token "
            "counts; filter or impute them before packing"
        )
    by_pid = {r["pid"]: r for r in parts}
    offsets: dict[int, int] = {}
    expect: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        r = by_pid.get(pid)
        expect[pid] = int(r["n_rows"]) if r is not None else 0
        acc += int(r["n_toks"]) if r is not None else 0

    id_field = narrow.schema[0]

    def assign_bins(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for batch in batches:
            nt = batch.column("n_tokens").to_numpy().astype(np.int64)
            cum_before = base + np.concatenate(([0], np.cumsum(nt)[:-1]))
            base += int(nt.sum())
            seen += batch.num_rows
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_field.name),
                    pa.array(nt, type=pa.int64()),
                    pa.array(cum_before // budget, type=pa.int64()),
                ],
                names=[id_field.name, "n_tokens", "bin_id"],
            )
        if seen != expect.get(pid, 0):
            raise RuntimeError(
                f"pack partition {pid} row count drifted: saw {seen}, "
                f"expected {expect.get(pid, 0)}"
            )

    out_schema = f"{id_field.name} {id_field.dataType.simpleString()}, n_tokens long, bin_id long"
    return narrow.mapInArrow(assign_bins, out_schema)
