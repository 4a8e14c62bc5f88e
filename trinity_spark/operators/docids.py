"""Dense, deterministic, stable-ordered doc_id assignment at arbitrary scale.

Reference analog: Trinity's two ID spaces — per-source ``isrc_docid_t`` and
global ``docid_t`` with ``translate_docid`` (``/root/reference/common.h:28-43``,
``index_source.h:100-114``).  Our global ``doc_id`` is a LongType (u32 in the
reference can't hold 10^12 turns) assigned densely in the frozen order
``(conv_id, turn_idx)`` — the stable ordering the north rule fixes.

Why not the obvious ways:
- ``monotonically_increasing_id`` is neither dense nor order-stable;
- a single global ``row_number()`` window funnels 100 TB through one task.

Scalable two-pass instead (SURVEY.md §1.2):
1. range-repartition by (conv_id, turn_idx) + sort within partitions — the
   partitions tile the global order;
2. count rows per partition (tiny driver-side collect: one long per
   partition), exclusive prefix-sum -> per-partition base offsets;
3. ``mapInArrow`` enumerates each partition's rows starting at its offset
   (arrow-batch arithmetic, no per-row Python).

The sorted frame is persisted between the two passes so both observe the
identical partitioning (range-partition sampling is otherwise re-run).  On a
real cluster this materialization is the ``docid_map`` write itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDER_COLS = ("conv_id", "turn_idx")


def assign_doc_ids(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Return ``df`` + ``doc_id`` (long), dense in (conv_id, turn_idx) order."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 4)

    ordered = df.repartitionByRange(num_partitions, *ORDER_COLS).sortWithinPartitions(
        *ORDER_COLS
    )
    ordered.persist(StorageLevel.MEMORY_AND_DISK)

    counts = (
        ordered.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()  # one row per partition — O(partitions), not O(rows)
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(ordered.schema.fields) + [T.StructField("doc_id", T.LongType(), False)]
    )

    def enumerate_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = TaskContext.get().partitionId()
        next_id = offsets.get(pid, 0)
        for batch in batches:
            n = batch.num_rows
            ids = pa.array(range(next_id, next_id + n), type=pa.int64())
            next_id += n
            yield batch.append_column("doc_id", ids)

    return ordered.mapInArrow(enumerate_partition, out_schema)
