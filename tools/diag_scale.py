"""One-off diagnosis: where does suite wall time go at different parallelism?

Usage: python tools/diag_scale.py <cores> <shuffle> <aqe:0|1> [docs]
Prints phase timings as JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores, shuffle, aqe = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3] == "1"
    docs_n = int(sys.argv[4]) if len(sys.argv) > 4 else 150_000

    from datachecker_spark.datagen import (
        generate_documents,
        generate_expected_fingerprints,
        generate_media_catalog,
    )
    from datachecker_spark.runner import SuiteConfig, run_suite
    from datachecker_spark.session import get_spark

    spark = get_spark(
        cores=cores,
        shuffle_partitions=shuffle,
        app_name="diag",
        extra_conf={"spark.sql.adaptive.enabled": str(aqe).lower()},
    )
    t = {}
    t0 = time.perf_counter()
    docs = generate_documents(spark, docs_n, n_parts=64, hot_frac=0.02, slices=64).localCheckpoint(eager=True)
    catalog = generate_media_catalog(spark)
    expected = generate_expected_fingerprints(docs).localCheckpoint(eager=True)
    n = docs.count()
    t["gen"] = round(time.perf_counter() - t0, 2)

    # warm pass
    t0 = time.perf_counter()
    res = run_suite(docs, media_catalog=catalog, expected_fingerprints=expected, config=SuiteConfig(timestamp_now="2024-06-01 00:00:00"))
    res.violations.write.format("noop").mode("overwrite").save()
    res.metrics.write.format("noop").mode("overwrite").save()
    t["warm_total"] = round(time.perf_counter() - t0, 2)

    # measured pass, phase-split
    sub: dict = {}
    t0 = time.perf_counter()
    res = run_suite(docs, media_catalog=catalog, expected_fingerprints=expected, config=SuiteConfig(timestamp_now="2024-06-01 00:00:00"), timings=sub)
    t["plan_build"] = round(time.perf_counter() - t0, 2)
    t.update({f"suite_{k}": v for k, v in sub.items()})
    t0 = time.perf_counter()
    res.violations.write.format("noop").mode("overwrite").save()
    t["violations"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    res.metrics.write.format("noop").mode("overwrite").save()
    t["metrics"] = round(time.perf_counter() - t0, 2)

    total = t["plan_build"] + t["violations"] + t["metrics"]
    print(json.dumps({
        "cores": cores, "shuffle": shuffle, "aqe": aqe, "docs": n,
        **t, "measured_total": round(total, 2),
        "docs_per_sec": round(n / total, 1),
    }))


if __name__ == "__main__":
    main()
