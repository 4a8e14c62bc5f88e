"""Block-max pruned disjunctive top-k (the distributed WAND analog).

Reference analogs: skip-based block seeking (``/root/reference/
google_codec.cpp:146-159`` skiplists; ``lucene_codec.cpp:596-660``) and
cost-ordered min-should-match iteration (``docset_iterators.h:40-60``).  The
reference has no WAND; block-max pruning is our north-star requirement
(SURVEY.md §4.3.2), re-derived for batch execution:

Let chunk(d) = d >> CHUNK_BITS (the encode-group docid range).  Every posting
of doc d, for every term, lives in blocks of chunk(d), so

    score(d) <= sum_t ub_t(chunk(d)),
    ub_t(c) = idf_t * max_tf_t(c) / (max_tf_t(c) + k1)

computed from BLOCK METADATA ONLY (max_tf per block — no decode).  Given any
lower bound T on the final k-th score, every chunk with bound < T is dead for
ALL its docs, and — crucially — every surviving doc's EXACT score needs only
its own chunk's blocks, which survive as a unit.  So the pruned query is
bit-identical to the unpruned one: we re-run the ordinary planner over a view
whose block scan is restricted to surviving chunks.

T comes from a cheap first pass: the exact top-k of the sub-disjunction over
the lowest-df prefix of the query terms (df-ascending — the reference's
rarest-term-drives ordering, ``exec.cpp:154-170``).  Sub-scores only grow
when branches are added, so the k-th best sub-score is a valid lower bound
for the full query's k-th best.  Fewer than k sub-matches => T=0 => no
pruning (still correct).

Cost shape at 10^12 turns: pass 1 decodes only rare terms' blocks; the
pruning decision reads only (query-term, chunk) metadata rows; pass 2 decodes
the few chunks a stopword shares with the rare terms — the ``the AND/OR
rare-marker`` query never materializes the stopword's 10^11-doc list.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bm25 import K1
from ..plans.ast import Or, Token

# --- cost gate ---------------------------------------------------------------
# Pruning is only worth its fixed overhead (an extra pass-1 Spark job + the
# chunk-bound metadata aggregation, ~2 actions) when the decode work it can
# skip is large.  The reference applies the same economics: skiplist steps are
# only taken when the skip spans enough postings to beat linear scanning
# (lucene_codec.cpp:596-660 step granularity).  Thresholds are in df units
# (postings rows the expensive tail would otherwise decode):
PRUNE_MIN_TAIL_DF = 1 << 22  # OR path: tail below ~4M rows decodes faster flat
PRUNE_MIN_SKEW = 8.0  # need rare-vs-common contrast for a useful bound
AND_PRUNE_MIN_DF = 1 << 20  # AND path is cheaper (no pass-1 job): gate lower
_TF_SAT = 1.0 / (1.0 + K1)  # score of a tf=1 hit as a fraction of idf


def _pruning_feasible(stats, live: list[str], k: int, chunk_bits: int) -> bool:
    """Can ANY chunk be pruned, estimated driver-side from df alone?

    A term with df >= #chunks is expected in EVERY chunk (uniform spread), so
    its upper bound taxes every chunk's score bound; a chunk is prunable only
    if the pass-1 threshold T can exceed the SUM of the ubiquitous terms'
    idfs.  T is estimated conservatively: walk cheap terms by df ascending
    (idf descending) until their df saturates k — the k-th pass-1 score is at
    least the tf=1 score of the last term needed.  (Measured: without this
    check, a stopword disjunction at 10^6 docs pays two full passes and
    prunes nothing — every chunk contains every stopword.)"""
    total_chunks = max(stats.n_docs >> chunk_bits, 1)
    ubiq_bound = sum(stats.idf(t) for t in live if stats.df(t) >= total_chunks)
    by_df = sorted(live, key=lambda t: stats.df(t))
    acc, t_est = 0, 0.0
    for t in by_df[:-1]:  # the most expensive term never joins pass 1
        acc += stats.df(t)
        if acc >= k:
            t_est = _TF_SAT * stats.idf(t)
            break
    return t_est > ubiq_bound


def or_gate_report(stats, terms: list[str], k: int, chunk_bits: int = 16) -> dict:
    """Gate decision + the df-derived reasons, all driver-side arithmetic on
    cached df (no Spark job).  The dict is surfaced by QueryPlanner.last_route
    so a bench artifact can SHOW "gate closed, single-pass plan" instead of a
    reviewer inferring it from matched walls."""
    dfs = sorted(stats.df(t) for t in terms if stats.df(t) > 0)
    rep = {
        "open": False,
        "reason": "",
        "live_terms": len(dfs),
        "tail_df": sum(dfs[1:]) if len(dfs) > 1 else 0,
        "min_tail_df": PRUNE_MIN_TAIL_DF,
        "skew": round(dfs[-1] / dfs[0], 1) if dfs and dfs[0] else None,
    }
    if len(dfs) < 2:
        rep["reason"] = "fewer than two live terms: nothing to prune against"
    elif sum(dfs[:-1]) < k:
        rep["reason"] = "pass-1 cannot saturate k -> T=0 -> no chunks pruned"
    elif sum(dfs[1:]) < PRUNE_MIN_TAIL_DF:
        rep["reason"] = (
            f"tail df {sum(dfs[1:])} < {PRUNE_MIN_TAIL_DF}: decode work the "
            "pruned plan could skip is too small to pay the extra pass-1 job"
        )
    elif dfs[-1] < PRUNE_MIN_SKEW * dfs[0]:
        rep["reason"] = "insufficient rare-vs-common df contrast"
    else:
        live = [t for t in terms if stats.df(t) > 0]
        if not _pruning_feasible(stats, live, k, chunk_bits):
            rep["reason"] = (
                "no chunk can be pruned: ubiquitous terms (df >= #chunks) "
                "bound every chunk above the estimated threshold"
            )
        else:
            rep["open"] = True
            rep["reason"] = "pruning predicted to beat single-pass"
    return rep


def or_pruning_pays(
    stats, terms: list[str], k: int, chunk_bits: int = 16
) -> bool:
    """True when block-max pruning of this plain-token disjunction should beat
    the single-pass plan.  Driver-side arithmetic on cached df only."""
    return or_gate_report(stats, terms, k, chunk_bits)["open"]


def and_gate_report(stats, terms: list[str], chunk_bits: int = 16) -> dict:
    """Gate decision + reasons for the rare-term AND chunk restriction.
    This path has no pass-1 job (the chunk set comes from block metadata in
    the same action), so only the broadcast-subquery overhead must amortize —
    but it still needs the rare term ABSENT from most chunks (df below the
    chunk count), else the restriction keeps everything."""
    dfs = sorted(stats.df(t) for t in terms if stats.df(t) > 0)
    total_chunks = max(stats.n_docs >> chunk_bits, 1)
    rep = {
        "open": False,
        "reason": "",
        "live_terms": len(dfs),
        "max_df": dfs[-1] if dfs else 0,
        "min_df": dfs[0] if dfs else 0,
        "total_chunks": total_chunks,
    }
    if len(dfs) < 2:
        rep["reason"] = "fewer than two live terms"
    elif dfs[-1] < AND_PRUNE_MIN_DF:
        rep["reason"] = (
            f"common side df {dfs[-1]} < {AND_PRUNE_MIN_DF}: decodes faster flat"
        )
    elif dfs[-1] < PRUNE_MIN_SKEW * dfs[0]:
        rep["reason"] = "insufficient rare-vs-common df contrast"
    elif dfs[0] >= total_chunks:
        rep["reason"] = (
            f"rarest df {dfs[0]} >= {total_chunks} chunks: restriction keeps "
            "every chunk"
        )
    else:
        rep["open"] = True
        rep["reason"] = "rare-term chunk restriction predicted to pay"
    return rep


def and_pruning_pays(stats, terms: list[str], chunk_bits: int = 16) -> bool:
    return and_gate_report(stats, terms, chunk_bits)["open"]


@dataclass
class PruningReport:
    total_chunks: int
    kept_chunks: int
    threshold: float
    cheap_terms: list[str]


class _PrunedView:
    """SegmentIndex facade with the block scan restricted to kept chunks.
    Stats (df, N) intentionally come from the FULL index — scores must not
    change under pruning."""

    def __init__(self, inner, kept_chunks: DataFrame):
        self._inner = inner
        self.blocks = inner.blocks.join(
            F.broadcast(kept_chunks), "chunk", "left_semi"
        )
        self.term_dict = inner.term_dict
        self.field_stats = inner.field_stats
        self.deleted = inner.deleted
        self.postings = inner.postings
        self.chunk_bits = getattr(inner, "chunk_bits", 16)
        self.codec = getattr(inner, "codec", "varbyte")

    def postings_for(self, terms, with_positions: bool = True):
        from .segments import decode_segments

        pruned = self.blocks.where(F.col("term").isin(terms))
        if self.codec == "mixed":
            # codec-tagged blocks: decode_segments splits per codec column
            return decode_segments(pruned, with_positions=with_positions)
        return decode_segments(
            pruned, with_positions=with_positions, codec=self.codec
        )

    def postings_with_payloads_for(self, terms):
        # hits/payloads must come from the FULL index: a winner doc's matched
        # terms are not restricted to the kept chunks' blocks
        return self._inner.postings_with_payloads_for(terms)

    def stats_for(self, terms):
        return self._inner.stats_for(terms)


def rare_and_topk(
    spark: SparkSession,
    index,
    node,
    k: int = 10,
    doc_filter=None,
    similarity=None,
):
    """Exact top-k for a plain-token AND, with the block scan restricted to
    the rarest required term's chunks (every match must contain that term, and
    all of a doc's postings share its chunk).  The reference analog is the
    df-ascending lead-iterator AND (exec.cpp:154-170): the rare list drives,
    the common lists are only probed where it has documents.  Metadata-only —
    no pass-1 scoring job; the kept-chunk set is a broadcast subquery."""
    from ..plans.ast import query_terms
    from ..plans.planner import QueryPlanner

    terms = query_terms(node)  # every branch is required: any term restricts
    stats = index.stats_for(terms)
    rarest = min(terms, key=lambda t: stats.df(t))
    kept = index.blocks.where(F.col("term") == rarest).select("chunk").distinct()
    view = _PrunedView(index, kept)
    return QueryPlanner(view, similarity=similarity).plan(
        node, k, doc_filter=doc_filter, block_pruning=False
    )


def pruned_or_topk(
    spark: SparkSession,
    index,
    terms: list[str],
    k: int = 10,
    return_report: bool = False,
    node=None,
):
    """Exact top-k for the disjunction of ``terms`` with block-max pruning.
    ``index`` must expose block metadata (SegmentIndex)."""
    from ..plans.planner import QueryPlanner

    if k < 1:
        # pass-1 peeks sub_top[-1]; k=0 has no threshold to prune against
        raise ValueError(f"k must be >= 1, got {k}")

    if node is None:
        node = Or(tuple(Token(t) for t in terms)).normalize()
    planner = QueryPlanner(index)
    stats = index.stats_for(terms)
    live = [t for t in terms if stats.df(t) > 0]
    if len(live) < 2:
        res = planner.plan(node, k, block_pruning=False)
        return (res, PruningReport(0, 0, 0.0, [])) if return_report else res

    # pass 1: T = exact k-th score of the cheap (low-df) sub-disjunction
    by_df = sorted(live, key=lambda t: stats.df(t))
    total_df = sum(stats.df(t) for t in live)
    budget = max(total_df * 0.2, stats.df(by_df[0]))
    cheap, acc = [], 0
    for t in by_df[:-1]:  # never all terms — pruning needs an expensive tail
        # keep the pass-1 scan small, but only stop once it can plausibly
        # yield k hits (fewer than k sub-matches would force T=0: no pruning)
        if acc >= k and acc + stats.df(t) > budget and cheap:
            break
        cheap.append(t)
        acc += stats.df(t)
    sub = Or(tuple(Token(t) for t in cheap)).normalize()
    sub_top = planner.plan(sub, k, block_pruning=False).collect()
    threshold = sub_top[-1]["score"] if len(sub_top) >= k else 0.0

    # chunk bounds from block metadata only
    idf_map = F.create_map(
        *[x for t in live for x in (F.lit(t), F.lit(stats.idf(t)))]
    )
    meta = (
        index.blocks.where(F.col("term").isin(live))
        .withColumn(
            "ub",
            idf_map[F.col("term")]
            * (F.col("max_tf") / (F.col("max_tf") + F.lit(K1))),
        )
        .groupBy("term", "chunk")
        .agg(F.max("ub").alias("ub"))
    )
    bounds = meta.groupBy("chunk").agg(F.sum("ub").alias("bound"))
    kept = bounds.where(F.col("bound") >= F.lit(threshold)).select("chunk")

    res = QueryPlanner(_PrunedView(index, kept)).plan(node, k, block_pruning=False)
    if return_report:
        total = bounds.count()
        nkept = kept.count()
        return res, PruningReport(total, nkept, float(threshold), cheap)
    return res
