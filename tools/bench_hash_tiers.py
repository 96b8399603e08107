"""Measured MB/s per integrity hash tier (VERDICT r3 #9).

The integrity check dispatches 26 algorithms across three tiers
(constraints/integrity.py): JVM built-ins (codegen'd, no Python), hashlib
via one Arrow UDF (C implementations, Arrow batch transfer), and the
vendored pure-Python blake3 / ascon256 (KAT-anchored to the reference's
fixtures). The pure-Python tier is correct but slow — this bench PRICES
the limitation so an expectation table heavy in those algorithms is a
known cost, not a surprise. Run:

    python tools/bench_hash_tiers.py [--mb 8]

prints one JSON line {tier/algo: MB_per_sec} and a human table to stderr.
No Spark needed for the Python tiers; the JVM tier is measured through a
local session over a binary column (includes Tungsten eval overhead, not
just the hash kernel — that's the realistic per-row cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rate(fn, data: bytes, min_sec: float = 0.5) -> float:
    """MB/s of fn(data), amortized over enough repeats to fill min_sec."""
    fn(data)  # warm
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < min_sec:
        fn(data)
        n += 1
    elapsed = time.perf_counter() - t0
    return len(data) * n / elapsed / 1e6


def main() -> None:
    mb = 8
    if "--mb" in sys.argv:
        mb = int(sys.argv[sys.argv.index("--mb") + 1])
    import hashlib

    from datachecker_spark.hashes import ascon_hash256_hex, blake3_hex

    data = os.urandom(mb * 1024 * 1024)
    small = data[: 64 * 1024]  # pure-python tiers: 64 KiB is plenty to rate

    out: dict[str, float] = {}
    for algo in ("md5", "sha1", "sha256", "sha512", "sha3_256", "blake2b"):
        out[f"hashlib/{algo}"] = round(
            _rate(lambda d, a=algo: hashlib.new(a, d).hexdigest(), data), 1
        )
    out["purepy/blake3"] = round(_rate(blake3_hex, small), 3)
    out["purepy/ascon256"] = round(_rate(ascon_hash256_hex, small), 3)

    # JVM tier through Spark (includes expression-eval overhead per row)
    from pyspark.sql import functions as F

    from datachecker_spark.session import get_spark

    spark = get_spark(cores=1, shuffle_partitions=1, app_name="hash-tiers")
    chunk = 1 * 1024 * 1024
    rows = 256  # 256 MB total per measurement
    df = spark.range(rows).select(
        F.expr(f"repeat(rpad(cast(id as string), 20, 'x'), {chunk // 20})").alias("s")
    ).localCheckpoint(eager=True)
    for name, col in (
        ("jvm/xxhash64", F.xxhash64("s")),
        ("jvm/sha256", F.sha2("s", 256)),
        ("jvm/md5", F.md5("s")),
    ):
        d = df.select(col.alias("h"))
        d.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        d.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        out[name] = round(rows * chunk / elapsed / 1e6, 1)

    for k, v in sorted(out.items()):
        sys.stderr.write(f"{k:24s} {v:>12} MB/s\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
