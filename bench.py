"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also runs the validation-engine flagship (full duplicate check over a
span-ified + planted corpus derived from the sf documents table) as query
"flagship_dedup". Use tools/bench_scaling.py for the N-vs-4N-cores scaling run.

Isolation re-timing (VERDICT r3 #7): a query's in-suite number can inherit
memory pressure / GC debt from the 40 queries before it (measured: the r3
embedding_near_dups read 20.6s in-suite vs 5.2s alone). Queries slower than
ISOLATE_THRESHOLD_SEC in-suite are re-timed in a FRESH subprocess (own JVM,
cold block manager) and both numbers land in the JSON under "isolated" —
self-contained evidence instead of BASELINE.md prose.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ISOLATE_THRESHOLD_SEC = 5.0


def _build_runners(spark, sf_dir):
    """name -> zero-arg callable running that query to a noop sink."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E

    qs = E.queries()
    runners = {
        name: (lambda n=name: qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save())
        for name in qs
    }

    # flagship: full duplicate-detection suite over span-structured docs
    def flagship():
        flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs = E.spanify(flat)
        planted = E.spanify(
            flat.where(F.col("doc_id") % 10 == 0).withColumn(
                "doc_id", F.col("doc_id") + 1000000
            )
        )
        from datachecker_spark.constraints.duplicates import check_duplicates

        check_duplicates(docs.unionByName(planted)).write.format("noop").mode(
            "overwrite"
        ).save()

    runners["flagship_dedup"] = flagship
    return runners


def _warmup(spark, sf_dir: str, cores: int) -> float:
    """One-time session warmup so per-query samples reflect EXECUTION, not
    whichever query happens to run first alphabetically (r4 VERDICT #2:
    ann_cosine_topk's 4.58s first sample vs 0.81s second was almost entirely
    session fixed cost). Measured attribution on this box, local[32] sf0.1:
      * first Arrow mapInPandas job: ~2.4-2.8s — forks the Python worker
        pool (one per core) and imports pandas/pyarrow/numpy in each;
        a pandas_udf (ArrowEvalPython) warmup does NOT absorb it, the
        mapInPandas runner path must run once itself.
      * first read of each parquet table: ~0.2-1.5s — footer/schema load.
      * first JVM job: ~3-5s — executor threads + codegen infrastructure.
    A 1000-executor production job pays these once per executor lifetime,
    not per query, so the suite charges them to one reported warmup_sec
    instead of the alphabetically-first queries' first samples."""
    import pandas as pd
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    # JVM / scheduler / codegen
    spark.range(10**6).agg(F.sum("id")).collect()
    # Python worker pool + pandas/numpy imports (one task per core)
    def _mp(batches):
        import numpy as np

        for pdf in batches:
            yield pd.DataFrame({"x": np.asarray(pdf["id"], dtype="float64")})

    spark.range(0, cores * 10, 1, cores).mapInPandas(_mp, "x double").write.format(
        "noop"
    ).mode("overwrite").save()
    # parquet footers/schemas for every table the suite reads
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _host_calibration() -> dict[str, float]:
    """Fixed-size single-threaded CPU + memory probes, recorded in the bench
    JSON so a run can be normalized against the quiet-box reference when the
    host is degraded. Motivation (2026-08-20): identical code+input measured
    suite numbers 1.5-2x apart hours apart, with one pinned 16-core scaling
    sample running BELOW the 4-core level — co-tenant CPU-steal on the
    shared host, invisible to load average inside this VM. The CPU probe is
    numpy elementwise transcendentals over an L3-resident array —
    single-threaded by construction (unlike BLAS matmul) so it measures
    per-core supply, not the thread pool. Reference values for THESE probes
    on a healthy window (2026-08-20): cpu_sec ~0.04-0.06, stream_gbs
    ~5.0-5.5; cpu_sec well above the reference marks the window degraded —
    weigh the per-query numbers accordingly rather than as engine
    regressions."""
    import numpy as np

    x = np.linspace(0.0, 8.0, 2_000_000)  # 16 MB, L3-resident
    cpu = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (np.sin(x) * np.cos(x)).sum()
        cpu = min(cpu, time.perf_counter() - t0)
    buf = np.zeros(25_000_000, dtype="float64")  # 200 MB, far beyond L3
    t0 = time.perf_counter()
    for _ in range(3):
        buf += 1.0
    stream_gbs = (3 * 2 * buf.nbytes / (time.perf_counter() - t0)) / 1e9
    return {"cpu_sec": round(cpu, 4), "stream_gbs": round(stream_gbs, 2)}


def _timed(spark, fn) -> tuple[float, list[float]]:
    """best-of-2 seconds + raw samples: one sample can inherit a GC pause or
    co-tenant stall (round-1 bench showed a trivially-cheap query at 22.6s
    once). release_all between samples: checkpoint blocks are never
    GC-reclaimed from Python (cache.py) — drop whatever this query
    materialized so later queries aren't squeezed by dead generations."""
    from datachecker_spark.cache import release_all

    samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
        release_all(spark)
    return round(min(samples), 3), [round(s, 3) for s in samples]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    only = sys.argv[sys.argv.index("--only") + 1] if "--only" in sys.argv else None

    from datachecker_spark.session import get_spark

    spark = get_spark(cores=cores, shuffle_partitions=max(cores, 8), app_name="bench")

    calibration = _host_calibration()
    warmup_sec = _warmup(spark, sf_dir, cores)

    runners = _build_runners(spark, sf_dir)

    if only is not None:
        # isolation worker: one query in a fresh JVM, same protocol
        t, samples = _timed(spark, runners[only])
        print(json.dumps({"query": only, "sec": t, "samples": samples}))
        return

    timings: dict[str, float] = {}
    variance: dict[str, list[float]] = {}
    for name in sorted(runners):
        t, samples = _timed(spark, runners[name])
        timings[name] = t
        if max(samples) > 3 * min(samples) and max(samples) > 1.0:
            variance[name] = samples

    # re-time the slow tail in fresh subprocesses (own JVM, cold blocks)
    isolated: dict[str, float | None] = {}
    for name, t in sorted(timings.items()):
        if t <= ISOLATE_THRESHOLD_SEC:
            continue
        # a hung/failed child must not discard the already-collected suite
        # timings — mark it and move on (None = attempted, no number)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--only", name],
                capture_output=True, text=True, timeout=900,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env=dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                         SPARK_GRAFT_CPUS=str(cores)),
            )
        except subprocess.TimeoutExpired:
            isolated[name] = None
            continue
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        # a failed child can emit '{'-prefixed log noise — treat unparsable
        # output the same as no output (None = attempted, no number)
        try:
            isolated[name] = json.loads(lines[-1])["sec"] if lines else None
        except (json.JSONDecodeError, KeyError, TypeError):
            isolated[name] = None

    sf = sf_dir.rstrip("/").split("sf")[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cores": cores,
                "high_variance": variance,
                "isolated": isolated,
                "warmup_sec": warmup_sec,
                "host_calibration": calibration,
            }
        )
    )


if __name__ == "__main__":
    main()
