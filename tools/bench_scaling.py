"""Scaling-efficiency evidence for the north rule (BASELINE.json).

The rule requires >=0.8 throughput scaling efficiency between N and 4N
executors. No real cluster exists in this sandbox, so per the driver's
instructions the same job runs at two parallelism levels (local[N] vs
local[4N]) on byte-identical input and we report docs/sec at both plus
efficiency = (throughput_4N / throughput_N) / 4.

The job is the full constraint suite (column stats + dedup + uniqueness +
predicates + referential + integrity + Aho-Corasick confidential scan +
drift) over a deterministically generated interleaved-span corpus
(datachecker_spark.datagen — parallelism-independent: every value derives
from xxhash64(seed, id)). Spark fixes its master at the first SparkSession,
so each measurement runs in its own subprocess.

Usage:
  python tools/bench_scaling.py                 # full run: N=8 vs 32 (and 2 vs 8)
  python tools/bench_scaling.py --pairs 2,8     # one pair
  python tools/bench_scaling.py --docs 300000
Writes BENCH_SCALING.json and prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cores: int, n_docs: int) -> None:
    """Run the full suite once at local[cores]; print one JSON line."""
    from datachecker_spark.datagen import (
        generate_documents,
        generate_expected_fingerprints,
        generate_media_catalog,
    )
    from datachecker_spark.runner import SuiteConfig, run_suite
    from datachecker_spark.session import get_spark

    spark = get_spark(
        cores=cores, shuffle_partitions=max(2 * cores, 8), app_name=f"scale-{cores}"
    )
    # identical input at every parallelism level: fixed slice count.
    # localCheckpoint truncates the generator's (huge) expression tree so
    # every suite plan starts from a scan of materialized rows — the same
    # plan shape a real parquet/Iceberg input would have. Without it, driver-
    # side plan canonicalization of the embedded generator tree dominates.
    docs = generate_documents(
        spark, n_docs, n_parts=64, hot_frac=0.02, slices=64
    ).localCheckpoint(eager=True)
    catalog = generate_media_catalog(spark)
    expected = generate_expected_fingerprints(docs).localCheckpoint(eager=True)
    n = docs.count()

    t0 = time.perf_counter()
    res = run_suite(
        docs,
        media_catalog=catalog,
        expected_fingerprints=expected,
        config=SuiteConfig(),
    )
    res.violations.write.format("noop").mode("overwrite").save()
    res.metrics.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n,
                "suite_sec": round(elapsed, 3),
                "docs_per_sec": round(n / elapsed, 1),
            }
        )
    )


def run_one(cores: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cores),
         "--docs", str(n_docs)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not line:
        sys.stderr.write(out.stdout + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"worker local[{cores}] produced no JSON")
    rec = json.loads(line[-1])
    print(json.dumps(rec))
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--pairs", type=str, default="8,32;2,8")
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.docs)
        return

    results: dict = {"n_docs": args.docs, "pairs": []}
    measured: dict[int, dict] = {}
    for pair in args.pairs.split(";"):
        lo, hi = (int(x) for x in pair.split(","))
        for c in (lo, hi):
            if c not in measured:
                measured[c] = run_one(c, args.docs)
        eff = (
            measured[hi]["docs_per_sec"] / measured[lo]["docs_per_sec"]
        ) / (hi / lo)
        rec = {
            "N": lo,
            "4N": hi,
            "docs_per_sec_N": measured[lo]["docs_per_sec"],
            "docs_per_sec_4N": measured[hi]["docs_per_sec"],
            "scaling_efficiency": round(eff, 3),
            "pass_ge_0.8": eff >= 0.8,
        }
        results["pairs"].append(rec)
        print(json.dumps(rec))

    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"written": "BENCH_SCALING.json", **results}))


if __name__ == "__main__":
    main()
