"""Partition-level aggregates — the reference's directory checks (SURVEY.md
§2.10: empty dirs stats.zig:190-198, many-items :201-207, one-item :210-216).

A table partition plays the directory role. "Empty partition" needs an
expected-partition list (a partition with zero rows is invisible in the data
itself — the analog of an empty directory still existing on disk); callers
pass it from the catalog/metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datachecker_spark.contract import SEV_WARNING, VIOLATION_COLS

CHECK_EMPTY_PART = "empty_partition"
CHECK_MANY_ITEMS = "many_items_partition"
CHECK_ONE_ITEM = "one_item_partition"
DEFAULT_MAX_ITEMS = 10_000  # MAX_ITEMS_DIRECTORY analog


def partition_counts(docs: DataFrame) -> DataFrame:
    return docs.groupBy("part").agg(F.count("*").alias("n_docs"))


def check_partition_sizes(
    docs: DataFrame,
    expected_parts: DataFrame | None = None,
    max_items: int = DEFAULT_MAX_ITEMS,
) -> DataFrame:
    """Violations with doc_id=NULL (partition-scoped, not row-scoped)."""
    counts = partition_counts(docs)

    def v(df: DataFrame, check: str, detail) -> DataFrame:
        return df.select(
            F.lit(check).alias("check"),
            F.lit(SEV_WARNING).alias("severity"),
            F.lit(None).cast("string").alias("doc_id"),
            F.col("part").cast("string").alias("part"),
            detail.alias("detail"),
        ).select(*VIOLATION_COLS)

    many = v(
        counts.where(F.col("n_docs") > max_items),
        CHECK_MANY_ITEMS,
        F.format_string("partition has %d docs (max %d)", F.col("n_docs"), F.lit(max_items)),
    )
    one = v(
        counts.where(F.col("n_docs") == 1),
        CHECK_ONE_ITEM,
        F.lit("partition has exactly one doc"),
    )
    out = many.unionByName(one)
    if expected_parts is not None:
        empty = expected_parts.select("part").join(
            F.broadcast(counts.select("part")), "part", "left_anti"
        )
        out = out.unionByName(
            v(empty, CHECK_EMPTY_PART, F.lit("expected partition has no docs"))
        )
    return out
