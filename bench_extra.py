#!/usr/bin/env python
"""Round-6 auxiliary benchmarks (bench.py is frozen for measurement, so
optimization-evidence legs live here; numbers are cited in
OPTIMIZATION_r06.md).

Sections (each gated by an env flag so a run measures only what it asks):
  TRINITY_XB_MINHASH=1   MinHash signature kernel A/B (sql md5 vs arrow),
                         interleaved same-window reps, verified-pair parity.
  TRINITY_XB_DECODE=1    Postings-scan decode-job floor: per-task Python
                         overhead vs scan task count on the sf0.1 index
                         (guide 1.4 noop-sink isolation).

Env: SPARK_GRAFT_CPUS (default 32), TRINITY_XB_MINHASH_DOCS (default 1M).
Prints one JSON object (pretty) to stdout; nothing is cached or reused.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_minhash_ab(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from trinity_spark.dataops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from trinity_spark.fixtures import gen_transcripts
    from trinity_spark.session import get_spark

    n_docs = int(os.environ.get("TRINITY_XB_MINHASH_DOCS", "1000000"))
    spark = get_spark(f"xb_minhash_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    pdf = gen_transcripts(n_docs)[["text"]].copy()
    # plant 2% exact dups so the candidate stage is non-trivial
    for i in range(0, n_docs, 50):
        pdf.iat[i, 0] = pdf.iat[(i + 1) % n_docs, 0]
    pdf["doc_id"] = range(n_docs)
    docs = spark.createDataFrame(pdf[["doc_id", "text"]]).persist()
    docs.count()

    def sig_wall(kernel: str) -> float:
        spark.sparkContext.setJobDescription(f"minhash sigs [{kernel}]")
        t0 = time.monotonic()
        # checksum aggregation forces every signature to be computed
        minhash_signatures(docs, kernel=kernel).agg(
            F.count(F.lit(1)), F.sum(F.crc32(F.concat_ws("|", "h0", "h15")))
        ).collect()
        return time.monotonic() - t0

    walls: dict[str, list[float]] = {"sql": [], "arrow": []}
    for rep in range(3):  # interleaved same-window reps
        order = ("sql", "arrow") if rep % 2 == 0 else ("arrow", "sql")
        for k in order:
            walls[k].append(round(sig_wall(k), 2))

    # parity of the banded candidate stage (pair sets differ slightly by
    # family; VERIFIED near-dup sets are compared in the test suite — here
    # we record candidate counts for scale context)
    n_cand = {}
    for k in ("sql", "arrow"):
        sigs = minhash_signatures(docs, kernel=k)
        n_cand[k] = lsh_candidate_pairs(
            sigs, num_hashes=16, bands=4, max_bucket_size=2000
        ).count()
    med = {k: statistics.median(v) for k, v in walls.items()}
    return {
        "n_docs": n_docs,
        "signature_walls_sec": walls,
        "signature_median_sec": med,
        "docs_per_sec": {
            k: round(n_docs / med[k], 1) for k in med
        },
        "speedup_arrow_over_sql": round(med["sql"] / med["arrow"], 2),
        "candidate_pairs": n_cand,
    }


def run_decode_floor(cpus: int) -> dict:
    """Per-task Python-boundary cost of the decode MapInArrow on the bench
    index (guide 1.4: noop sink so the sink never distorts the timing)."""
    from pyspark.sql import functions as F

    from trinity_spark.operators.indexer import SegmentIndex
    from trinity_spark.operators.segments import decode_segments
    from trinity_spark.session import get_spark
    from trinity_spark.sources.store import SegmentStore

    idx = os.environ.get(
        "TRINITY_XB_INDEX", "/tmp/trinity_bench/index_c32_1000000"
    )
    spark = get_spark(f"xb_decode_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    index = SegmentIndex(spark, SegmentStore(idx))
    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    out: dict = {"index": idx}
    for label, term in [("empty_term", "zzznothing"), ("mid_term", "error"),
                        ("stopword", "the")]:
        src = index.blocks.where(F.col("term") == term)
        noop(decode_segments(src, with_positions=False))  # warm
        walls = []
        for _ in range(5):
            t0 = time.monotonic()
            noop(decode_segments(src, with_positions=False))
            walls.append(round(time.monotonic() - t0, 3))
        out[label] = {"walls": walls, "median": statistics.median(walls)}
    return out


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result: dict = {"cpus": cpus}
    if os.environ.get("TRINITY_XB_MINHASH", "0") == "1":
        result["minhash_kernel_ab"] = run_minhash_ab(cpus)
    if os.environ.get("TRINITY_XB_DECODE", "0") == "1":
        result["decode_floor"] = run_decode_floor(cpus)
    print(json.dumps(result, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
