"""Every cache the engine takes must drain back to zero (VERDICT r2 #7).

Why explicit release exists at all: the documented Spark path — drop the
Dataset, ContextCleaner reclaims the checkpoint blocks via weak refs — is
DEAD from PySpark.  Repro (pyspark 4.1, ClientServer gateway): create
`spark.range(100).localCheckpoint(eager=True)`, drop every Python
reference, then run 15 rounds of paired `gc.collect()` +
`jvm.System.gc()` — the block never drains.  So in a long-lived session
(the 10^12-doc deployment mode: a resume loop re-entering run_suite per
partition batch) each pass would pin one more generation of blocks until
executors OOM.  The engine therefore releases deterministically
(datachecker_spark/cache.py), and these tests assert exact block
accounting at each lifecycle point — no GC, no polling, no timeouts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datachecker_spark import cache
from datachecker_spark.datagen import generate_documents
from datachecker_spark.fingerprint import annotate
from datachecker_spark.runner import SuiteConfig, run_suite
from datachecker_spark.textops import minhash_near_dup_pairs


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_run_suite_releases_to_zero(spark):
    cache.release_all(spark)  # drop other tests' dangling blocks: exact accounting needs a clean base
    docs = generate_documents(spark, 400, dup_rate=0.1, seed=7)
    base = _n_persistent(spark)

    res = run_suite(docs, config=SuiteConfig(referential=False, integrity=False))
    # while the caller holds the results, ONLY the result blocks are
    # resident: violations (main block + drift block inside the union),
    # metrics, profile. The corpus persist and drift's obs/counts
    # intermediates must already be gone — run_suite freed them itself.
    held = _n_persistent(spark) - base
    assert held == 4, f"expected 4 result blocks resident, got {held}"

    # consume the results the way a caller would, then dispose
    res.violations.count()
    res.metrics.count()
    res.profile.count()
    n = res.release()
    assert n == 4, f"release() freed {n} blocks, expected 4"
    assert _n_persistent(spark) == base

    # idempotent: a second release is a no-op
    assert res.release() == 0


def test_run_suite_no_drift_releases_to_zero(spark):
    cache.release_all(spark)  # drop other tests' dangling blocks: exact accounting needs a clean base
    docs = generate_documents(spark, 300, dup_rate=0.1, seed=3)
    base = _n_persistent(spark)
    res = run_suite(
        docs,
        config=SuiteConfig(referential=False, integrity=False, drift=False),
    )
    res.violations.count()
    held = _n_persistent(spark) - base
    assert held == 3, f"expected 3 result blocks (no drift), got {held}"
    res.release()
    assert _n_persistent(spark) == base


def test_minhash_releases_shingle_checkpoint(spark):
    cache.release_all(spark)  # drop other tests' dangling blocks: exact accounting needs a clean base
    flat = annotate(generate_documents(spark, 300, dup_rate=0.2, seed=11)).select(
        "doc_id", F.col("_flat").alias("text")
    )
    base = _n_persistent(spark)
    pairs = minhash_near_dup_pairs(flat, threshold=0.6)
    pairs.count()
    # the lazy localCheckpoint of the shingle sets is now materialized and
    # reachable as a LogicalRDD leaf of the returned plan
    assert _n_persistent(spark) - base == 1
    n = cache.release(pairs)
    assert n == 1
    assert _n_persistent(spark) == base
