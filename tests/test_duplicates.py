"""Duplicate detection vs the FIXTURES.md case families."""

from __future__ import annotations

from pyspark.sql import functions as F

from datachecker_spark.constraints.duplicates import (
    check_duplicates,
    duplicate_groups,
    wasted_bytes_total,
)
from datachecker_spark.datagen import generate_documents, make_docs


def _fixture(spark):
    dup_spans = [("text", "same content here", None, 0), ("media", None, "m7", 1)]
    shuffled = [dup_spans[1], dup_spans[0]]  # storage order differs, offsets kept
    rows = [
        ("d1", dup_spans, "p0"),
        ("d2", shuffled, "p1"),
        ("d3", dup_spans, "p0"),
        # near-miss: same span count, same total length, one char differs
        ("n1", [("text", "abcdef", None, 0)], "p0"),
        ("n2", [("text", "abcdeg", None, 0)], "p0"),
        # empty pair: size 0 → excluded (ref skips size==0)
        ("e1", [], "p0"),
        ("e2", [], "p1"),
        ("u1", [("text", "unique text", None, 0)], "p1"),
    ]
    return make_docs(spark, rows)


def test_exact_duplicates_flagged(spark):
    v = check_duplicates(_fixture(spark))
    flagged = {r["doc_id"] for r in v.collect()}
    assert flagged == {"d1", "d2", "d3"}


def test_group_metrics(spark):
    g = duplicate_groups(_fixture(spark)).collect()
    assert len(g) == 1
    row = g[0]
    assert row["dup_count"] == 3
    assert row["size"] == 17  # "same content here"
    assert row["wasted_bytes"] == 17 * 2  # size once per extra member

    total = wasted_bytes_total(_fixture(spark)).collect()[0]["wasted_bytes"]
    assert total == 34


def test_fused_key_equals_exact_confirm(spark):
    """Grouping on sha256(canonical) ≡ grouping on the canonical string itself
    (the reference's byte-exact clustering oracle)."""
    docs = generate_documents(spark, 3000, dup_rate=0.2, seed=7)
    a = {(r["fp"], r["dup_count"]) for r in duplicate_groups(docs).collect()}
    b = {
        (r["fp"], r["dup_count"])
        for r in duplicate_groups(docs, exact_confirm=True).collect()
    }
    assert a == b
    assert len(a) > 0


def test_skewed_hot_key(spark):
    """30% of docs share one boilerplate content (FIXTURES fingerprint-skew)."""
    docs = generate_documents(spark, 5000, hot_frac=0.3, dup_rate=0.0, seed=11)
    g = duplicate_groups(docs)
    hot = g.orderBy(F.desc("dup_count")).first()
    assert hot["dup_count"] >= 1200  # ~30% of 5000, minus empty-doc overlap
    # every member flagged exactly once
    v = check_duplicates(docs)
    assert v.groupBy("doc_id").count().where("count > 1").count() == 0


def test_bulk_generator_duplicates_detected(spark):
    docs = generate_documents(spark, 4000, dup_rate=0.1, seed=42)
    assert docs.count() == 4000
    groups = duplicate_groups(docs)
    assert groups.count() > 10
    # members flagged = sum of group sizes
    v = check_duplicates(docs)
    expect = groups.agg(F.sum("dup_count")).collect()[0][0]
    assert v.count() == expect
