"""Measured crossover: ngram_jaccard_pairs candidates="join" vs "prefix".

The count-join path computes |A ∩ B| as a by-product of the common-shingle
self-join (cost Σ df² over the capped universe); the prefix path (All-Pairs /
ppjoin, see textops.ngram_jaccard_pairs) joins only each doc's (df asc)-first
p = n − ⌈t·n⌉ + 1 shingles and verifies candidates with array_intersect.
The prefix length — and therefore how much of the Σ df² the filter removes —
depends on the threshold, so the right mode is a function of t. This bench
MEASURES that crossover on the real sf corpus instead of guessing:

    python tools/bench_ngram_modes.py [--sf-dir /root/testdata/sf0.1]
                                      [--thresholds 0.2,0.5,0.7] [--repeat 2]

prints one JSON line {"t=0.2": {"join": sec, "prefix": sec, "rows": n}, ...}
(best-of-repeat per cell; rows asserted equal between modes — the two paths
must agree before their times are comparable). release_all between samples:
checkpoint blocks are never GC-reclaimed from PySpark (see cache.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    thresholds = [0.2, 0.5, 0.7]
    if "--thresholds" in sys.argv:
        thresholds = [
            float(x) for x in sys.argv[sys.argv.index("--thresholds") + 1].split(",")
        ]
    repeat = 2
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    from datachecker_spark.cache import release_all
    from datachecker_spark.session import get_spark
    from datachecker_spark.textops import ngram_jaccard_pairs

    spark = get_spark()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # warm the session once (python workers / Arrow path / first shuffle)
    docs.limit(64).count()

    out: dict[str, dict] = {}
    for t in thresholds:
        cell: dict = {}
        rows_by_mode: dict[str, int] = {}
        for mode in ("join", "prefix"):
            best = None
            for _ in range(repeat):
                release_all(spark)
                t0 = time.perf_counter()
                n = ngram_jaccard_pairs(
                    docs,
                    threshold=t,
                    max_df=1000,
                    hash_shingles=True,
                    candidates=mode,
                ).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            cell[mode] = round(best, 2)
            rows_by_mode[mode] = n
        assert len(set(rows_by_mode.values())) == 1, rows_by_mode
        cell["rows"] = rows_by_mode["join"]
        out[f"t={t}"] = cell
        print(f"t={t}: {cell}", file=sys.stderr)
    release_all(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
