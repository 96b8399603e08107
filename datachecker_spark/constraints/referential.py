"""Referential integrity: media_ref → media catalog.

Reference primitive: existence checks — symlink target missing
(/root/reference/src/modules/stats.zig:80-100) and sidecar-hash base file
missing (src/modules/integrity.zig:163-170). Generalized: every media span's
media_ref must exist in the media catalog.

Spark-first: explode only media spans (Catalyst prunes text columns from the
scan), left-anti join against the catalog. Join strategy: broadcast when the
catalog is small (caller hint or AQE's size-based choice), sort-merge
otherwise — at 10^12 docs the exploded ref stream is huge but the anti-join
shuffles only (doc_id, part, media_ref), not span text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datachecker_spark.contract import SEV_ERROR, as_violations

CHECK_NAME = "dangling_media_ref"


def media_refs(docs: DataFrame) -> DataFrame:
    """One row per media span with a non-null ref: (doc_id, part, media_ref).
    Reads the cached `refs` derived column when annotate() provided it, so
    the anti-join never decompresses the spans payload."""
    if "refs" in docs.columns:
        return docs.select(
            "doc_id", "part", F.explode("refs").alias("media_ref")
        )
    refs = F.filter(
        F.col("spans"), lambda s: (s["kind"] == "media") & s["media_ref"].isNotNull()
    )
    return docs.select(
        "doc_id", "part", F.explode(F.transform(refs, lambda s: s["media_ref"])).alias("media_ref")
    )


def check_media_refs(
    docs: DataFrame, catalog: DataFrame, *, broadcast_catalog: bool | None = None
) -> DataFrame:
    """ERROR per (doc, dangling ref). catalog must carry `media_ref`.

    broadcast_catalog: True forces broadcast (small dim), False forces
    shuffle (huge catalog), None lets AQE decide from size statistics.
    """
    cat = catalog.select("media_ref").distinct()
    if broadcast_catalog is True:
        cat = F.broadcast(cat)
    elif broadcast_catalog is False:
        cat = cat.hint("merge")
    dangling = media_refs(docs).join(cat, "media_ref", "left_anti")
    # one violation per distinct (doc, ref) — a doc referencing the same
    # missing ref in 3 spans is one problem, not three
    offenders = dangling.distinct()
    detail = F.format_string("media_ref %s not in catalog", F.col("media_ref"))
    return as_violations(offenders, CHECK_NAME, SEV_ERROR, detail)
