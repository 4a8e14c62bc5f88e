"""Python worker daemon with the engine's heavy imports preloaded.

PySpark's worker daemon forks a child per worker; by default each child
imports numpy/pandas/pyarrow (plus this package's hot modules) on its first
task — ~0.5 s of CPU and tens of MB of first-touch page faults PER WORKER,
which at local[32] serializes into >10 s of cold-start inside the first
build/query stage.  Importing them HERE, in the daemon process, makes every
fork inherit the already-initialized modules through copy-on-write: one
import for the whole executor instead of one per worker.

Wired via ``spark.python.daemon.module`` (session.get_spark); the module
must end by handing control to the stock pyspark daemon loop.
"""

# fmt: off
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyarrow.compute  # noqa: F401

try:  # the engine's hot worker-side modules (regexes compiled, schemas built)
    import trinity_spark.tokenizer  # noqa: F401
    import trinity_spark.operators.fastbuild  # noqa: F401
    import trinity_spark.operators.segments  # noqa: F401
    import trinity_spark.functions.varbyte  # noqa: F401
    import trinity_spark.functions.bm25  # noqa: F401
except Exception:  # pragma: no cover - daemon must start even if import fails
    pass
# fmt: on

import gc

# The stock daemon loop runs a full gc.collect() in the worker after EVERY
# task; with the preloaded modules above that is a ~73k-object permanent
# generation scanned each time (measured 16-30 ms per collect — per task).
# Freeze the post-import heap into the permanent generation: forked workers
# inherit it, their per-task collections scan only objects allocated since
# fork, and the frozen pages also stay copy-on-write-clean longer.
gc.collect()
gc.freeze()

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
