#!/usr/bin/env python
"""Capture .explain("formatted") for every headline query into plans/r06/.

Usage: python scripts/capture_plans_r06.py <index_dir> <suffix>
  suffix: "before" | "after" (file name tail)

The index must exist (bench.py --build-only creates it).  Plans are
captured on a warm session with the same planner construction the bench
uses, so the committed files show exactly the plan shape the timed run
executes (Exchange count, PushedFilters, ReadSchema, codegen spans).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json


def main() -> None:
    index_dir, suffix = sys.argv[1], sys.argv[2]
    from trinity_spark.operators.indexer import SegmentIndex
    from trinity_spark.plans.planner import QueryPlanner
    from trinity_spark.session import get_spark
    from trinity_spark.sources.store import SegmentStore

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"plans_r06_{suffix}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    planner = QueryPlanner(SegmentIndex(spark, SegmentStore(index_dir)))
    planner.plan("zzzwarmupnonterm", k=1).collect()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    qs = [
        json.loads(x)
        for x in open(os.path.join(here, "queries.jsonl"))
        if x.strip()
    ]
    qs.append({"id": "q_bmx_pruned_or", "query": "the OR a OR error OR zxqv", "k": 10})
    for q in qs:
        df = planner.plan(q["query"], k=q["k"])
        route = dict(planner.last_route)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{q['id']}_{suffix}.txt"), "w") as f:
            f.write(f"query: {q['query']!r}  k={q['k']}\n")
            f.write(f"routed path: {route.get('path')}\n")
            gate = route.get("gate")
            if gate:
                f.write(f"gate: tier={gate.get('tier')} open={gate.get('open')} "
                        f"reason={gate.get('reason')!r}\n")
            f.write("\n" + buf.getvalue())
        print(f"wrote {q['id']}_{suffix}.txt ({route.get('path')})")


if __name__ == "__main__":
    main()
