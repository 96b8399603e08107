"""Canonical fingerprint invariants (SURVEY.md §7 hard part (a))."""

from __future__ import annotations

from pyspark.sql import functions as F

from datachecker_spark.datagen import make_docs
from datachecker_spark.fingerprint import canonical_string, doc_size, fingerprint


def _fps(spark, rows):
    df = make_docs(spark, rows).select(
        "doc_id", fingerprint("spans").alias("fp"), canonical_string("spans").alias("c")
    )
    return {r["doc_id"]: (r["fp"], r["c"]) for r in df.collect()}


def test_storage_order_invariance(spark):
    spans = [("text", "hello world", None, 0), ("media", None, "m1", 1), ("text", "tail", None, 2)]
    shuffled = [spans[2], spans[0], spans[1]]
    fps = _fps(spark, [("a", spans, "p0"), ("b", shuffled, "p0")])
    assert fps["a"] == fps["b"]


def test_logical_order_matters(spark):
    s1 = [("text", "one", None, 0), ("text", "two", None, 1)]
    s2 = [("text", "two", None, 0), ("text", "one", None, 1)]
    fps = _fps(spark, [("a", s1, "p0"), ("b", s2, "p0")])
    assert fps["a"] != fps["b"]


def test_absolute_offsets_irrelevant(spark):
    # equality is on span ORDER, not offset values (input_hint: kind/text/media_ref/order)
    s1 = [("text", "x", None, 0), ("text", "y", None, 1)]
    s2 = [("text", "x", None, 10), ("text", "y", None, 20)]
    fps = _fps(spark, [("a", s1, "p0"), ("b", s2, "p0")])
    assert fps["a"] == fps["b"]


def test_null_vs_empty_distinct(spark):
    s1 = [("text", None, None, 0)]
    s2 = [("text", "", None, 0)]
    fps = _fps(spark, [("a", s1, "p0"), ("b", s2, "p0")])
    assert fps["a"] != fps["b"]


def test_kind_and_ref_participate(spark):
    s1 = [("text", "x", None, 0)]
    s2 = [("media", "x", None, 0)]
    s3 = [("text", "x", "m1", 0)]
    fps = _fps(spark, [("a", s1, "p0"), ("b", s2, "p0"), ("c", s3, "p0")])
    assert len({fps["a"][0], fps["b"][0], fps["c"][0]}) == 3


def test_doc_size(spark):
    rows = [
        ("a", [("text", "abcd", None, 0), ("media", None, "m1", 1), ("text", "xy", None, 2)], "p0"),
        ("b", [], "p0"),
    ]
    df = make_docs(spark, rows).select("doc_id", doc_size("spans").alias("sz"))
    got = {r["doc_id"]: r["sz"] for r in df.collect()}
    assert got == {"a": 6, "b": 0}
