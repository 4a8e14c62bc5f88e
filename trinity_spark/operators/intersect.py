"""Token-subset intersection counting (query-suggestion support).

Reference: ``/root/reference/intersect.cpp:5-230`` — given a token list,
count documents per EXACT token-set bitmask (each doc contributes to the one
mask of query tokens it contains, ``intersect.cpp:111-141`` accumulates
``mask |= m`` per doc then counts per distinct mask).  An application
suggesting "which words to drop" sums the superset masks of its candidate
subset; neither the reference nor this operator pre-aggregates supersets.

Spark-first: per (doc, token) membership -> bit per token -> ``bit_or`` per
doc -> count per mask.  Two narrow aggregations; no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def intersection_counts(
    postings: DataFrame, tokens: list[str], min_mask_bits: int = 1
) -> DataFrame:
    """For each subset-mask of ``tokens`` (bit i = tokens[i] present in the
    doc), the number of documents whose term set matches exactly that mask.

    Input is the logical postings (term, doc_id, ...) view; the scan is
    pushed down to the query tokens only.

    At most 63 tokens: the mask lives in a SIGNED 64-bit Spark long, so bit
    63 (1 << 63) cannot be represented as a literal — the reference's
    machine-word mask has the same ceiling (intersect.cpp uses uint64_t;
    we lose the sign bit).  Raises rather than silently truncating.
    """
    if not tokens:
        raise ValueError("intersection_counts: empty token list")
    if len(set(tokens)) != len(tokens):
        # the coalesce below fires the FIRST matching branch, so a repeated
        # token's later bit would never be set — every mask touching it
        # silently wrong.  Raise: bit positions are the caller's contract.
        raise ValueError("intersection_counts: duplicate tokens in list")
    if len(tokens) > 63:
        raise ValueError(
            f"intersection_counts: {len(tokens)} tokens exceed the 63-bit "
            "mask width; pre-select a candidate subset"
        )
    per_row = postings.where(F.col("term").isin(tokens)).select(
        "doc_id",
        F.coalesce(
            *[
                F.when(F.col("term") == t, F.lit(1 << i).cast("long"))
                for i, t in enumerate(tokens)
            ]
        ).alias("bit"),
    )
    per_doc = per_row.groupBy("doc_id").agg(F.bit_or("bit").alias("mask"))
    return (
        per_doc.groupBy("mask")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .where(F.bit_count("mask") >= min_mask_bits)
        .orderBy(F.desc("doc_count"))
    )
