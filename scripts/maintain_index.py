#!/usr/bin/env python
"""spark-submit entrypoint for index maintenance: compaction, fsck, gc.

The operational companion to submit_build.py — the jobs a deployment runs on
a schedule (the reference leaves merge candidate selection and integrity
auditing to applications; see operators/compaction.py and
SegmentStore.fsck).  Prints ONE JSON line per action.

    spark-submit --master local[8] --py-files trinity_spark.zip \
        scripts/maintain_index.py --index-dir /data/index compact
    spark-submit ... scripts/maintain_index.py --index-dir /data/index \
        fsck --deep
    spark-submit ... scripts/maintain_index.py --index-dir /data/index gc
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    sub = ap.add_subparsers(dest="action", required=True)
    c = sub.add_parser("compact", help="size-tiered merge policy to quiescence + gc")
    c.add_argument("--min-merge", type=int, default=4)
    c.add_argument("--max-merge", type=int, default=16)
    c.add_argument("--no-deletes", action="store_true",
                   help="do not apply tombstones during merges")
    f = sub.add_parser("fsck", help="store integrity check")
    f.add_argument("--deep", action="store_true",
                   help="decode blocks and verify physical doc counts")
    sub.add_parser("gc", help="remove data no manifest snapshot references")
    sub.add_parser("snapshots", help="list retained store snapshots")
    e = sub.add_parser(
        "expire-snapshots",
        help="drop all but the newest N retained snapshots (then run gc)",
    )
    e.add_argument("--keep-last", type=int, default=1)
    args = ap.parse_args(argv)

    from trinity_spark.sources.store import SegmentStore

    store = SegmentStore(args.index_dir)
    if args.action == "gc":
        print("MAINTAIN_GC " + json.dumps(store.gc()))
        return
    if args.action == "snapshots":
        print("MAINTAIN_SNAPSHOTS " + json.dumps(store.list_snapshots()))
        return
    if args.action == "expire-snapshots":
        expired = store.expire_snapshots(keep_last=args.keep_last)
        removed = store.gc()  # reclaim what only the expired history pinned
        print("MAINTAIN_EXPIRE " + json.dumps({"expired": expired, "gc": removed}))
        return

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"trinity_spark_{args.action}")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    if args.action == "fsck":
        rep = store.fsck(spark, deep=args.deep)
        print("MAINTAIN_FSCK " + json.dumps(rep))
        spark.stop()
        raise SystemExit(0 if rep["ok"] else 1)

    from trinity_spark.operators.compaction import compact

    produced = compact(
        spark, store,
        apply_deletes=not args.no_deletes,
        min_merge=args.min_merge, max_merge=args.max_merge,
    )
    print(
        "MAINTAIN_COMPACT "
        + json.dumps(
            {
                "merged_segments": [
                    {"segment_id": m.segment_id, "metrics": m.metrics}
                    for m in produced
                ],
                "live_segments": len(store.segments()),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
