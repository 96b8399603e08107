"""Per-column / per-partition statistics block (SURVEY.md §2.11) plus the
reference's per-item size predicates (§2.5: empty files stats.zig:143-151,
large files stats.zig:154-162).

One groupBy("part") pass computes the whole profile — the analog of the
reference's stat cache amortizing a single walk across all checks: Catalyst
evaluates every aggregate in a single partial+final hash aggregation over one
scan, with column pruning keeping untouched span fields out of the read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datachecker_spark.contract import SEV_WARNING, as_violations
from datachecker_spark.fingerprint import doc_size, fingerprint, span_count

CHECK_EMPTY = "empty_doc"
CHECK_LARGE = "large_doc"
DEFAULT_LARGE_DOC_SIZE = 1_000_000  # chars; analog of LARGE_FILE_SIZE (config.zig:61)


def _annotated(docs: DataFrame) -> DataFrame:
    text_spans = F.filter(F.col("spans"), lambda s: s["kind"] == "text")
    media_spans = F.filter(F.col("spans"), lambda s: s["kind"] == "media")
    return docs.select(
        "doc_id",
        "part",
        doc_size("spans").alias("size"),
        span_count("spans").alias("n_spans"),
        fingerprint("spans").alias("fp"),
        F.size(text_spans).alias("n_text_spans"),
        F.size(media_spans).alias("n_media_spans"),
        F.size(F.filter(text_spans, lambda s: s["text"].isNull())).alias("n_null_text"),
        F.size(F.filter(media_spans, lambda s: s["media_ref"].isNull())).alias(
            "n_null_ref"
        ),
    )


def partition_profile(docs: DataFrame) -> DataFrame:
    """Per-partition column statistics: counts, null rates, min/max,
    HLL cardinality sketches (approx_count_distinct = HyperLogLog++)."""
    a = _annotated(docs)
    return a.groupBy("part").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("size") == 0).cast("long")).alias("n_empty_docs"),
        F.min("size").alias("min_size"),
        F.max("size").alias("max_size"),
        F.round(F.avg("size"), 4).alias("avg_size"),
        F.min("n_spans").alias("min_spans"),
        F.max("n_spans").alias("max_spans"),
        F.sum("n_text_spans").alias("n_text_spans"),
        F.sum("n_media_spans").alias("n_media_spans"),
        F.round(
            F.sum("n_null_text") / F.greatest(F.sum("n_text_spans"), F.lit(1)), 6
        ).alias("null_text_rate"),
        F.round(
            F.sum("n_null_ref") / F.greatest(F.sum("n_media_spans"), F.lit(1)), 6
        ).alias("null_ref_rate"),
        F.approx_count_distinct("fp").alias("approx_distinct_content"),
        F.countDistinct("doc_id").alias("distinct_doc_ids"),
    )


def check_empty_docs(docs: DataFrame) -> DataFrame:
    """WARNING per document with no content (size==0 or no spans)."""
    offenders = docs.where(doc_size("spans") == 0)
    return as_violations(offenders, CHECK_EMPTY, SEV_WARNING, "document has no text content")


def check_large_docs(
    docs: DataFrame, threshold: int = DEFAULT_LARGE_DOC_SIZE
) -> DataFrame:
    """WARNING per document whose total text length exceeds the threshold."""
    sized = docs.select("doc_id", "part", doc_size("spans").alias("size"))
    offenders = sized.where(F.col("size") > threshold)
    detail = F.format_string("size=%d exceeds threshold=%d", F.col("size"), F.lit(threshold))
    return as_violations(offenders, CHECK_LARGE, SEV_WARNING, detail)
