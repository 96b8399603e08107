"""Measure the confidential-scan engines head-to-head (the data behind
AUTO_EXPR_MAX_PATTERNS in constraints/confidential.py): the codegen
OR-of-contains chain is O(patterns x text) separate indexOf passes; the
Arrow-UDF path is ONE RE2 DFA pass per string (pattern-count-flat) plus the
Arrow transfer of every flattened string. History: against Python re's
backtracking alternation the two tied at ~284 patterns (2M docs, 21.7s vs
22.7s); with the RE2 kernel the UDF side costs the same as not scanning at
all inside the suite, so expr only wins for trivial pattern sets that avoid
Python workers entirely.

Usage: python tools/bench_confidential.py [--docs 2000000] [--cores 16]
Prints one JSON line per engine (median of 3 timed counts after 1 warm).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from datachecker_spark.constraints.confidential import (
        DEFAULT_PATTERNS,
        contains_any_expr,
        contains_any_udf,
    )
    from datachecker_spark.fingerprint import flattened_text
    from datachecker_spark.session import get_spark

    spark = get_spark(cores=args.cores, shuffle_partitions=2 * args.cores)
    path = f"/tmp/doccheck_bench/{args.docs}/docs"
    if not os.path.exists(path):
        from datachecker_spark.datagen import generate_documents

        generate_documents(
            spark, args.docs, n_parts=64, hot_frac=0.02, slices=64
        ).write.mode("overwrite").parquet(path)
    # materialize the flattened text once so both engines time ONLY the scan
    # (the runner's cache provides _flat the same way)
    flat = (
        spark.read.parquet(path)
        .select(flattened_text("spans").alias("_flat"))
        .localCheckpoint(eager=True)
    )
    n = flat.count()

    engines = {
        "expr": lambda: flat.where(
            contains_any_expr(F.col("_flat"), DEFAULT_PATTERNS)
        ).count(),
        "regex_udf": lambda: flat.where(
            contains_any_udf(DEFAULT_PATTERNS, engine="regex")(F.col("_flat"))
        ).count(),
    }
    for name, run in engines.items():
        hits = run()  # warm (JIT / UDF worker spin-up)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "engine": name,
                    "docs": n,
                    "patterns": len(DEFAULT_PATTERNS),
                    "hits": hits,
                    "median_sec": round(statistics.median(times), 2),
                    "samples": [round(t, 2) for t in times],
                }
            )
        )


if __name__ == "__main__":
    main()
