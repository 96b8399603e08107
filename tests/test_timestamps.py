"""Timestamp checks: future dates + staleness (reference stats.zig:165-187)."""

from __future__ import annotations

from datachecker_spark.constraints.stats import (
    CHECK_FUTURE,
    CHECK_STALE,
    check_timestamps,
)
from datachecker_spark.datagen import generate_documents

NOW = "2024-06-01 00:00:00"


def _docs(spark, rows):
    """rows: (doc_id, ingest_ts, modified_ts) as timestamp strings."""
    from datetime import datetime

    parse = lambda s: datetime.strptime(s, "%Y-%m-%d %H:%M:%S")  # noqa: E731
    return spark.createDataFrame(
        [(d, "p0", parse(i), parse(m)) for d, i, m in rows],
        "doc_id string, part string, ingest_ts timestamp, modified_ts timestamp",
    )


def test_future_and_stale_classification(spark):
    rows = [
        ("ok", "2024-05-01 00:00:00", "2024-05-20 00:00:00"),
        ("future_mod", "2024-05-01 00:00:00", "2024-07-01 00:00:00"),
        ("future_ingest", "2025-01-01 00:00:00", "2024-05-01 00:00:00"),
        ("stale", "2022-01-01 00:00:00", "2022-06-01 00:00:00"),
        # stale ingest but fresh modification → not stale (newest wins)
        ("old_but_touched", "2022-01-01 00:00:00", "2024-05-30 00:00:00"),
    ]
    got = check_timestamps(_docs(spark, rows), now=NOW, max_age_days=365).collect()
    by_check = {}
    for r in got:
        by_check.setdefault(r["check"], set()).add(r["doc_id"])
    assert by_check.get(CHECK_FUTURE) == {"future_mod", "future_ingest"}
    assert by_check.get(CHECK_STALE) == {"stale"}


def test_boundary_not_flagged(spark):
    # exactly 'now' is not future; exactly at the cutoff is not stale
    rows = [
        ("at_now", "2024-06-01 00:00:00", "2024-06-01 00:00:00"),
        ("at_cutoff", "2023-06-02 00:00:00", "2023-06-02 00:00:00"),
    ]
    got = check_timestamps(_docs(spark, rows), now=NOW, max_age_days=365).collect()
    assert got == []


def test_missing_columns_skipped(spark):
    df = spark.createDataFrame([("d", "p")], "doc_id string, part string")
    assert check_timestamps(df, now=NOW).count() == 0


def test_datagen_plants_both_families(spark):
    docs = generate_documents(spark, 5000, n_parts=4)
    got = check_timestamps(docs, now=NOW).groupBy("check").count().collect()
    counts = {r["check"]: r["count"] for r in got}
    # rates: future 0.2%, stale 1% of 5000
    assert counts.get(CHECK_FUTURE, 0) > 0
    assert counts.get(CHECK_STALE, 0) > counts.get(CHECK_FUTURE, 0)
