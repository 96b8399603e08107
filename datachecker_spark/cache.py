"""Deterministic release of checkpoint blocks.

The engine materializes intermediates with ``Dataset.localCheckpoint``
(runner.py, constraints/drift.py, textops.py).  The Spark story is that a
checkpoint block is reclaimed by the JVM ContextCleaner once the
checkpointed RDD becomes weakly reachable — drop the Dataset, GC runs,
blocks drain.  Measured on this engine (pyspark 4.1, ClientServer
gateway), that path is DEAD from Python: a localCheckpoint block survives
15 rounds of paired ``gc.collect()`` + ``System.gc()`` after every Python
reference is dropped (see tests/test_persist_release.py docstring for the
repro).  In a long-lived session — exactly the 10^12-doc deployment mode,
a resume loop re-entering ``run_suite`` per partition batch — each pass
would pin one more generation of blocks until executors OOM.

So the engine never relies on GC: every materialized DataFrame's blocks
are reachable as ``LogicalRDD`` leaves of its analyzed plan, and
``release()`` unpersists them by direct reference.  ``run_suite`` frees
its internal intermediates before returning and hands the caller a
``SuiteResult.release()`` for the result blocks; the dedup/similarity ops
that hand back lazy plans over a checkpoint (``minhash_near_dup_pairs``)
document ``cache.release(result)`` as the disposal call.

Analog in the reference: arena deallocation at the end of each module's
run (/root/reference/src/modules/core.zig — allocator passed in, freed by
the caller); same contract, the producer does not leak what the consumer
cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_rdds(df: DataFrame) -> list:
    """JVM RDD handles for every LogicalRDD leaf of df's analyzed plan.

    Covers local and reliable checkpoints (both wrap the materialized RDD
    in a LogicalRDD); plain persisted Datasets don't appear here — their
    release is ``df.unpersist()``, which ``release`` below also applies.
    """
    leaves = df._jdf.queryExecution().analyzed().collectLeaves()
    return [
        leaves.apply(i).rdd()
        for i in range(leaves.length())
        if leaves.apply(i).getClass().getSimpleName() == "LogicalRDD"
    ]


def release(*dfs: DataFrame | None, blocking: bool = False) -> int:
    """Unpersist every cache block reachable from the given DataFrames.

    Handles both materialization styles the engine uses: Dataset-level
    persist (checkpoint_mode="persist") and checkpoint blocks (LogicalRDD
    leaves).  Blocks not actually persisted (reliable-checkpoint leaves,
    already-released blocks) are skipped.  Returns the number of RDDs
    unpersisted.  Safe to call twice; None entries are ignored.
    """
    n = 0
    for df in dfs:
        if df is None:
            continue
        sl = df.storageLevel
        if sl.useMemory or sl.useDisk:
            df.unpersist(blocking)
            n += 1
        for rdd in checkpoint_rdds(df):
            jsl = rdd.getStorageLevel()
            if jsl.useMemory() or jsl.useDisk():
                rdd.unpersist(blocking)
                n += 1
    return n


def release_all(spark, blocking: bool = False) -> int:
    """Unpersist EVERY persistent RDD in the context (bench/test hygiene).

    For harnesses that run many independent queries in one session
    (bench.py, the driver's oracle gate): between queries nothing is
    legitimately cached, so drop whatever the last query materialized —
    including checkpoint blocks that no DataFrame handle reaches anymore.
    Not for use inside the engine (it would drop concurrent jobs' blocks).
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    n = 0
    while it.hasNext():
        it.next().getValue().unpersist(blocking)
        n += 1
    spark.catalog.clearCache()
    return n
