"""Stage-level attribution of suite wall time via the Spark event log.

Runs one full suite pass at a given parallelism with eventLog enabled, then
aggregates per-stage task time / wall time so the expensive branch of the
violations union can be identified by its call site (stage details carry
the RDD scope names).

Usage: python tools/stage_profile.py [cores] [docs]
Prints the top stages by task time as JSON lines.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    docs_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    log_dir = "/tmp/doccheck_eventlog"
    os.makedirs(log_dir, exist_ok=True)
    for f in glob.glob(f"{log_dir}/*"):
        os.remove(f)

    from datachecker_spark.datagen import (
        generate_documents,
        generate_expected_fingerprints,
        generate_media_catalog,
    )
    from datachecker_spark.runner import SuiteConfig, run_suite
    from datachecker_spark.session import get_spark

    spark = get_spark(
        cores=cores,
        shuffle_partitions=2 * cores,
        app_name="stage-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    docs = generate_documents(spark, docs_n, n_parts=64, hot_frac=0.02, slices=64)
    docs = docs.localCheckpoint(eager=True)
    catalog = generate_media_catalog(spark)
    expected = generate_expected_fingerprints(docs).localCheckpoint(eager=True)

    # warm + measured (stages of both appear; the report keys on stage name
    # so duplicates merge — use the measured half by submission time cutoff)
    import time

    res = run_suite(docs, media_catalog=catalog, expected_fingerprints=expected,
                    config=SuiteConfig(timestamp_now="2024-06-01 00:00:00"))
    t_cut = time.time() * 1000
    res2 = run_suite(docs, media_catalog=catalog, expected_fingerprints=expected,
                     config=SuiteConfig(timestamp_now="2024-06-01 00:00:00"), timings=(t2 := {}))
    print(json.dumps({"measured_pass": t2}))
    spark.stop()

    stages = {}
    for path in glob.glob(f"{log_dir}/*"):
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerStageCompleted":
                    continue
                si = ev["Stage Info"]
                if si.get("Submission Time", 0) < t_cut:
                    continue
                name = si.get("Name", "?")
                # the call-site name distinguishes branches
                detail = (si.get("Details") or "").split("\n")[0][:120]
                key = f"{name} | {detail}"
                wall = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
                rec = stages.setdefault(key, {"n": 0, "wall": 0.0, "tasks": 0})
                rec["n"] += 1
                rec["wall"] += wall
                rec["tasks"] += si.get("Number of Tasks", 0)

    top = sorted(stages.items(), key=lambda kv: -kv[1]["wall"])[:25]
    for k, v in top:
        print(json.dumps({"stage": k, **{x: round(y, 2) if isinstance(y, float) else y for x, y in v.items()}}))


if __name__ == "__main__":
    main()
