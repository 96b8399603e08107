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
  python tools/bench_scaling.py                 # full run: 2 vs 8 and 4 vs 16
  python tools/bench_scaling.py --pairs 2,8 --taskset   # pinned, one pair
  python tools/bench_scaling.py --docs 300000
Writes BENCH_SCALING.json (or --out) and prints one JSON line per
measurement, including the per-phase t_* split from run_suite(timings=...).
--taskset pins each worker to exactly N cores — the faithful model of an
N-core executor (see run_one; BASELINE.md "unpinned-proxy subsidy").
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
        cores=cores,
        shuffle_partitions=max(2 * cores, 8),
        app_name=f"scale-{cores}",
        # the 2M corpus is 64 parquet files x ~4MB; the defaults
        # (maxPartitionBytes=128MB + openCostInBytes=4MB) pack them into ~4
        # input partitions, capping scan+annotate parallelism at 4 tasks
        # regardless of cores — split finer so the content pass can use the
        # whole machine (cluster deploys keep the defaults: real inputs are
        # hundreds of GB with 128MB row groups)
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
        },
    )
    # identical input at every parallelism level: fixed slice count.
    # localCheckpoint truncates the generator's (huge) expression tree so
    # every suite plan starts from a scan of materialized rows — the same
    # plan shape a real parquet/Iceberg input would have. Without it, driver-
    # side plan canonicalization of the embedded generator tree dominates.
    def corpus(n: int):
        # materialize to parquet and scan it back — the production input
        # shape (columnar pages on disk). run_suite owns the in-memory
        # caching: it annotates the scan with the derived columns
        # (fingerprint/content_key/size/flat text) and persists + eagerly
        # populates that projection, so the measured pass includes the
        # engine's single content pass — the phase that dominates a real
        # 100 TB run and must scale with cores.
        base = f"/tmp/doccheck_bench/{n}"
        d_path, e_path = f"{base}/docs", f"{base}/expected"
        if not os.path.exists(d_path):
            d0 = generate_documents(spark, n, n_parts=64, hot_frac=0.02, slices=64)
            d0.write.mode("overwrite").parquet(d_path)
            generate_expected_fingerprints(
                spark.read.parquet(d_path)
            ).write.mode("overwrite").parquet(e_path)
        return spark.read.parquet(d_path), spark.read.parquet(e_path)

    catalog = generate_media_catalog(spark)

    def one_pass(d, e, timings: dict | None = None) -> float:
        # run_suite unpersists its own cache and frees its drift
        # intermediates; the result blocks are released explicitly below
        # (checkpoint blocks are never GC-reclaimed from Python —
        # cache.py; relying on System.gc() here let dead generations of
        # blocks accumulate across passes until the heap pinned). The GC
        # call still helps between passes: it compacts the old gen before
        # the next pass's allocation burst.
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        res = run_suite(
            d,
            media_catalog=catalog,
            expected_fingerprints=e,
            config=SuiteConfig(timestamp_now="2024-06-01 00:00:00"),
            timings=timings,
        )
        res.violations.write.format("noop").mode("overwrite").save()
        res.metrics.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        res.release(blocking=True)
        return elapsed

    # warm-up = ONE FULL pass over the measured corpus (C2 JIT of the ~50
    # generated codegen classes only finishes under real row volume — a
    # small-corpus warm-up left the first full pass 3x slower), then ONE
    # measured pass: steady-state throughput is the metric, matching a
    # long-running job. Input re-reads parquet and the suite re-derives +
    # re-caches its annotated projection each pass (run_suite unpersists at
    # exit), so the measured pass still contains the full content pipeline.
    docs, expected = corpus(n_docs)
    n = docs.count()
    one_pass(docs, expected)
    sub: dict = {}
    elapsed = one_pass(docs, expected, timings=sub)

    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n,
                "suite_sec": round(elapsed, 3),
                "docs_per_sec": round(n / elapsed, 1),
                **{f"t_{k}": v for k, v in sub.items()},
            }
        )
    )


def run_one(cores: int, n_docs: int, pin: bool = False) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(cores),
           "--docs", str(n_docs)]
    if pin:
        # Pin the whole worker (JVM + python UDF children) to exactly
        # `cores` hardware threads. Without this, local[N] is NOT an N-core
        # machine: GC, JIT, Netty IO, shuffle and Python workers run free on
        # the other idle cores — a one-sided subsidy that inflates the
        # low-N baseline and biases measured N→4N efficiency DOWN (a real
        # cluster executor gets a pinned cgroup CPU allocation, it does not
        # borrow 30 idle cores for its GC). The JVM sizes its GC/compiler
        # pools from sched_getaffinity, so the pinned worker self-tunes to
        # the allocation.
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd,
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
    ap.add_argument("--docs", type=int, default=150_000)
    ap.add_argument("--pairs", type=str, default="2,8;4,16")
    ap.add_argument("--repeat", type=int, default=3,
                    help="interleaved repeats per level; the MEDIAN is "
                         "reported (the sandbox host has uncontrolled "
                         "co-tenant load; median of interleaved repeats is "
                         "robust to one contended sample in either direction)")
    ap.add_argument("--taskset", action="store_true",
                    help="pin each worker to exactly N hardware threads "
                         "(taskset -c 0-(N-1)) — the faithful N-core-"
                         "executor model; see run_one")
    ap.add_argument("--out", type=str, default="BENCH_SCALING.json")
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.docs)
        return

    results: dict = {
        "n_docs": args.docs, "repeat": args.repeat,
        "cpu_pinned": bool(args.taskset), "pairs": [],
    }
    samples: dict[int, list[dict]] = {}
    levels: list[int] = []
    for pair in args.pairs.split(";"):
        for c in (int(x) for x in pair.split(",")):
            if c not in levels:
                levels.append(c)
    # interleave: A B A B ... so slow drift in host load hits both levels
    for _ in range(args.repeat):
        for c in levels:
            samples.setdefault(c, []).append(
                run_one(c, args.docs, pin=args.taskset)
            )

    import statistics

    med = {
        c: statistics.median(s["docs_per_sec"] for s in samples[c]) for c in levels
    }
    # co-tenant interference on this host is ONE-SIDED (it can only slow a
    # pass down, never speed it up), so max-of-k is the consistent estimator
    # of the uncontended throughput at each level; the median is reported as
    # the conservative headline alongside it
    best = {c: max(s["docs_per_sec"] for s in samples[c]) for c in levels}
    results["samples"] = {
        str(c): [s["docs_per_sec"] for s in samples[c]] for c in levels
    }
    for pair in args.pairs.split(";"):
        lo, hi = (int(x) for x in pair.split(","))
        eff = (med[hi] / med[lo]) / (hi / lo)
        eff_best = (best[hi] / best[lo]) / (hi / lo)
        rec = {
            "N": lo,
            "4N": hi,
            "docs_per_sec_N": med[lo],
            "docs_per_sec_4N": med[hi],
            "scaling_efficiency": round(eff, 3),
            "docs_per_sec_N_best": best[lo],
            "docs_per_sec_4N_best": best[hi],
            "scaling_efficiency_best": round(eff_best, 3),
            "pass_ge_0.8": eff >= 0.8,
        }
        results["pairs"].append(rec)
        print(json.dumps(rec))

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"written": args.out, **results}))


if __name__ == "__main__":
    main()
