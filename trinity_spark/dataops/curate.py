"""One-call corpus curation: quality gates + dedup with per-doc verdicts.

The composition a training-data pipeline actually runs — per-document
metrics, structural gates, exact dedup, optional near-dup cluster resolution
— ordered so the cheap single-pass gates run first and the (shuffling) dedup
stages see only survivors.  Every document comes back with a ``keep``
verdict and a ``reason`` naming the FIRST gate it failed ('' when kept), so
rejected data is auditable instead of silently vanishing — at 100 TB the
drop-reason histogram is the pipeline's primary health metric.

Scale shape: stage 1 is a fused projection (zero shuffle); exact dedup is
one shuffle on md5(text) with map-side combine; near-dup runs the banded
LSH/shingle machinery from ``dedup`` over gate-survivors only and resolves
clusters with distributed label propagation.  Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import (
    MINHASH_PRESETS,
    connected_components,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
)
from .textstats import language_id, quality_score, token_count


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 1 << 20,
    min_quality: float = 0.3,
    languages: tuple[str, ...] | None = ("en",),
    near_dup_threshold: float | None = None,
    shingle_n: int = 3,
    near_dup_method: str = "exact",
    minhash_preset: str = "balanced",
    max_bucket_size: int | None = 10_000,
    max_dup_line_frac: float | None = None,
    max_top_ngram_char_frac: float | None = None,
    rep_ngram_n: int = 2,
    max_dup_token_frac: float | None = None,
    dup_window: int = 20,
    dup_stride: int = 1,
    benchmark: DataFrame | None = None,
    decontam_n: int = 8,
    bench_text_col: str = "text",
) -> DataFrame:
    """Annotate every document with metrics + a keep/reason verdict.

    Gate order (first failure wins the ``reason``):
    ``too_short`` / ``too_long`` -> ``low_quality`` -> ``lang`` ->
    ``repetitive`` (only when ``max_dup_line_frac`` and/or
    ``max_top_ngram_char_frac`` is set: Gopher-style intra-document
    repetition — duplicate-line fraction over the cap, or the heaviest
    word ``rep_ngram_n``-gram's token-char share over the cap; pure
    array expressions fused into the same stage-1 projection, zero
    shuffle — ``textstats.repetition_stats``) ->
    ``contaminated`` (only when ``benchmark`` is set: shares a word
    ``decontam_n``-gram with the eval set — ``traindata.decontaminate``'s
    broadcast probe, run on cheap-gate survivors only) ->
    ``exact_dup`` (md5(text) groups; smallest id is canonical) ->
    ``boilerplate`` (only when ``max_dup_token_frac`` is set: the fraction
    of the doc's tokens covered by corpus-wide duplicated ``dup_window``-
    token windows exceeds the cap — ``dedup.substring_dup_stats`` over
    exact-dedup survivors.  NOTE: this is a content-quality gate, not a
    dedup stage — every member of a heavily-duplicated group is dropped,
    canonical included, on the grounds that the content is boilerplate;
    use ``dedup.remove_duplicate_spans`` when you want keep-one-copy
    remediation instead) ->
    ``near_dup`` (only when ``near_dup_threshold`` is set: Jaccard pairs
    over survivors, connected components, smallest id per cluster
    survives).

    ``near_dup_method`` picks the pair generator:
    - ``"exact"`` (default): deterministic shared-shingle candidates +
      exact Jaccard (``ngram_jaccard_pairs``) — the SQL-oracle-reproducible
      variant; candidate generation is quadratic in docs sharing a shingle,
      so it suits corpora that already passed exact dedup at moderate scale.
    - ``"minhash"``: banded MinHash LSH (``minhash_near_duplicates``) with
      the ``minhash_preset`` recall/cost point — THE 100 TB path: candidate
      cost is bounded by band-bucket collisions, and ``max_bucket_size``
      (default 10k; None disables) caps degenerate buckets by salt-splitting
      them into sub-buckets re-linked through a representative chain
      (``dedup._capped_bucket_pairs``), with a logged skip report.
      Probabilistic recall (preset s* curve), verified pairs are exact
      Jaccard either way.

    Returns (id, text, n_tokens, quality, lang, component (near-dup cluster
    id or own id), keep boolean, reason string); ``df.where("keep")`` is the
    curated corpus, text included.  OTHER input columns (source, url, ...)
    are not carried — the gates run over a narrow (id, text) projection so
    wide payloads never ride the checkpoints/shuffles; join back on
    ``id_col`` to reattach them.
    """
    if near_dup_method not in ("exact", "minhash"):
        raise ValueError(
            f"near_dup_method must be 'exact' or 'minhash', got {near_dup_method!r}"
        )
    if minhash_preset not in MINHASH_PRESETS:
        raise ValueError(
            f"minhash_preset must be one of {sorted(MINHASH_PRESETS)}, "
            f"got {minhash_preset!r}"
        )
    t = F.col(text_col)
    annotated = docs.select(
        F.col(id_col),
        t,
        token_count(t).alias("n_tokens"),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang"),
    )

    gate = (
        # NULL text first: every later predicate evaluates NULL (skipped)
        # on it, so without this gate a text-less document sails through
        # with keep=true and reason=''.
        F.when(t.isNull(), F.lit("null_text"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
    )
    if languages is not None:
        gate = gate.when(
            ~F.col("lang").isin(list(languages)), F.lit("lang")
        )
    if max_dup_line_frac is not None or max_top_ngram_char_frac is not None:
        from .textstats import dup_line_frac, top_ngram_char_frac

        rep = F.lit(False)
        if max_dup_line_frac is not None:
            rep = rep | (F.round(dup_line_frac(t), 6) > max_dup_line_frac)
        if max_top_ngram_char_frac is not None:
            rep = rep | (
                F.round(top_ngram_char_frac(t, rep_ngram_n), 6)
                > max_top_ngram_char_frac
            )
        gate = gate.when(rep, F.lit("repetitive"))
    annotated = annotated.withColumn("reason", F.coalesce(gate, F.lit("")))
    # Every later stage branches `annotated` (filter side + join-back side),
    # and Spark re-executes each branch's lineage per occurrence — without a
    # cut, the stage-1 gate metrics (notably the interpreted higher-order
    # repetition expressions) would be re-evaluated once per downstream
    # branch, compounding across stages.  A lazy localCheckpoint
    # materializes stage 1 exactly once (the connected_components /
    # docids.py pattern); at cluster scale this is the usual
    # stage-output materialization a multi-stage pipeline pays anyway.
    annotated = annotated.localCheckpoint(eager=False)

    if benchmark is not None:
        # eval-set decontamination among cheap-gate survivors: the flagged
        # set is tiny (true contamination is rare), so the back-join is
        # AQE-broadcast
        from .traindata import decontaminate

        flagged = (
            decontaminate(
                annotated.where(F.col("reason") == "").select(id_col, text_col),
                benchmark,
                n=decontam_n,
                id_col=id_col,
                text_col=text_col,
                bench_text_col=bench_text_col,
            )
            .where(F.col("contaminated"))
            .select(F.col(id_col).alias("_cont_id"))
        )
        annotated = (
            annotated.join(flagged, annotated[id_col] == F.col("_cont_id"), "left")
            .withColumn(
                "reason",
                F.when(
                    (F.col("reason") == "") & F.col("_cont_id").isNotNull(),
                    F.lit("contaminated"),
                ).otherwise(F.col("reason")),
            )
            .drop("_cont_id")
        )

    # exact dedup among gate-survivors: one shuffle on the content hash,
    # expressed as a window min (no self-join, no branch recompute) —
    # canonical = smallest surviving id per md5(text) group
    canon = F.min(
        F.when(F.col("reason") == "", F.col(id_col))
    ).over(Window.partitionBy(F.md5(t)))
    annotated = annotated.withColumn(
        "reason",
        F.when(
            (F.col("reason") == "") & (F.col(id_col) != canon),
            F.lit("exact_dup"),
        ).otherwise(F.col("reason")),
    )

    if max_dup_token_frac is not None:
        # cross-doc boilerplate gate over exact-dedup survivors: one count
        # shuffle on the window hash + one join back; the flagged set is the
        # boilerplate tail, so the back-join stays AQE-broadcast.  Checkpoint
        # first: this stage branches annotated again (stats side + join-back
        # side) and the exact-dedup window shuffle should run once, not twice
        from .dedup import substring_dup_stats

        annotated = annotated.localCheckpoint(eager=False)

        flagged_bp = (
            substring_dup_stats(
                annotated.where(F.col("reason") == "").select(id_col, text_col),
                id_col=id_col,
                text_col=text_col,
                window=dup_window,
                stride=dup_stride,
            )
            .where(F.col("dup_token_frac") > max_dup_token_frac)
            .select(F.col(id_col).alias("_bp_id"))
        )
        annotated = (
            annotated.join(flagged_bp, annotated[id_col] == F.col("_bp_id"), "left")
            .withColumn(
                "reason",
                F.when(
                    (F.col("reason") == "") & F.col("_bp_id").isNotNull(),
                    F.lit("boilerplate"),
                ).otherwise(F.col("reason")),
            )
            .drop("_bp_id")
        )

    annotated = annotated.withColumn("component", F.col(id_col))
    if near_dup_threshold is not None:
        # same branch-point rule: the LSH/shingle side and the join-back
        # side must both read materialized upstream stages, not re-run them
        annotated = annotated.localCheckpoint(eager=False)
        nd_survivors = annotated.where(F.col("reason") == "").select(id_col, text_col)
        if near_dup_method == "minhash":
            preset = MINHASH_PRESETS[minhash_preset]
            pairs = minhash_near_duplicates(
                nd_survivors, id_col=id_col, text_col=text_col,
                num_hashes=preset["num_hashes"], bands=preset["bands"],
                shingle_n=shingle_n, threshold=near_dup_threshold,
                max_bucket_size=max_bucket_size,
            )
        else:
            pairs = ngram_jaccard_pairs(
                nd_survivors, id_col=id_col, text_col=text_col,
                shingle_n=shingle_n, threshold=near_dup_threshold,
            )
        comps = connected_components(pairs).select(
            F.col("doc_id").alias("_cc_id"),
            F.col("component").alias("_cc_comp"),
        )
        annotated = (
            annotated.join(comps, annotated[id_col] == F.col("_cc_id"), "left")
            .drop("_cc_id")
            .withColumn(
                "component",
                F.when(
                    (F.col("reason") == "") & F.col("_cc_comp").isNotNull(),
                    F.col("_cc_comp"),
                ).otherwise(F.col(id_col)),
            )
            .drop("_cc_comp")
            .withColumn(
                "reason",
                F.when(
                    (F.col("reason") == "") & (F.col("component") != F.col(id_col)),
                    F.lit("near_dup"),
                ).otherwise(F.col("reason")),
            )
        )
    return annotated.select(
        id_col, text_col, "n_tokens", "quality", "lang", "component",
        (F.col("reason") == "").alias("keep"), "reason",
    )
