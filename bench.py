"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also runs the validation-engine flagship (full duplicate check over a
span-ified + planted corpus derived from the sf documents table) as query
"flagship_dedup". Use tools/bench_scaling.py for the N-vs-4N-cores scaling run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from datachecker_spark.session import get_spark

    spark = get_spark(cores=cores, shuffle_partitions=max(cores, 8), app_name="bench")

    timings: dict[str, float] = {}
    variance: dict[str, list[float]] = {}

    def timed(name: str, fn) -> None:
        # best-of-2: one sample can inherit a GC pause or co-tenant stall
        # (round-1 bench showed a trivially-cheap query at 22.6s once);
        # queries whose samples differ >3x are flagged in the output
        from datachecker_spark.cache import release_all

        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
            # checkpoint blocks are never GC-reclaimed from Python
            # (cache.py) — drop whatever this query materialized so later
            # queries aren't squeezed by dead generations of blocks
            release_all(spark)
        timings[name] = round(min(samples), 3)
        if max(samples) > 3 * min(samples) and max(samples) > 1.0:
            variance[name] = [round(s, 3) for s in samples]

    # warm the JVM/codegen once so per-query numbers reflect execution
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = E.queries()
    for name in sorted(qs):
        timed(name, lambda n=name: qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save())

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

    timed("flagship_dedup", flagship)

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
            }
        )
    )


if __name__ == "__main__":
    main()
