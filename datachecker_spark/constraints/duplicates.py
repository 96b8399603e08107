"""Duplicate-document detection — the flagship operator.

Reference pipeline (/root/reference/src/modules/duplicate_files/): group by
size → prune singletons → BLAKE3 hash per file on a thread pool → prune
singletons → byte-exact clustering within hash groups; total = bytes wasted
(size counted once per extra member, core.zig:76-77); size==0 files skipped
(core.zig:35).

Spark-first redesign (NOT a stage-for-stage translation):

* One scan computes a 64-bit xxhash64 fingerprint AND a 256-bit sha2 of the
  same canonical offset-ordered span serialization. The cheap-key pre-group
  (size) is subsumed — hashing a span array in-JVM costs ~the same as
  measuring it, so the multi-pass prefilter would only add shuffles.
* The reference's byte-exact clustering exists because its 256-bit hash
  groups could collide (core.zig:147 comment). Here group identity is the
  (fp64, sha256) pair: equality to 2^-256, i.e. the exact-confirmation stage
  is fused into the group key instead of a quadratic in-group re-compare.
  `exact_confirm=True` groups on the full canonical string instead — a
  test-scale oracle proving the fused key changes nothing.
* Aggregation-key skew (one boilerplate doc on 30% of rows) is NOT fixed by
  AQE (it handles join skew only), so the count uses a salted two-phase
  aggregate: groupBy(key, salt) partial counts → groupBy(key) final sum.
  Map-side partial aggregation makes phase 1 cheap; phase 2's cardinality is
  |distinct keys| × n_salts, tiny.
* Violations are emitted by joining the (small) duplicate-key set back to the
  doc stream — one violation row per member, never a collect_list of members
  (a hot group's member list would not fit in one task at 10^12 docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datachecker_spark.contract import SEV_WARNING, as_violations
from datachecker_spark.fingerprint import canonical_string, doc_size, fingerprint

CHECK_NAME = "duplicate_docs"


def with_fingerprint(docs: DataFrame, exact_confirm: bool = False) -> DataFrame:
    """Annotate docs with (fp, content_key, size) in a single projection.

    When the runner has already materialized the derived columns into the
    cached scan (fingerprint.annotate), they are reused as-is — no HOF
    re-evaluation per branch. exact_confirm=True always rebuilds the key from
    the full canonical string (test-scale oracle for the fused-key design)."""
    if exact_confirm:
        canon = canonical_string("spans")
        keep = [c for c in docs.columns if c not in ("fp", "content_key", "size")]
        return docs.select(
            *keep,
            fingerprint("spans").alias("fp"),
            canon.alias("content_key"),
            doc_size("spans").alias("size"),
        )
    have = set(docs.columns)
    extra = []
    if "fp" not in have:
        extra.append(fingerprint("spans").alias("fp"))
    if "content_key" not in have:
        extra.append(F.sha2(canonical_string("spans"), 256).alias("content_key"))
    if "size" not in have:
        extra.append(doc_size("spans").alias("size"))
    return docs.select("*", *extra) if extra else docs


def duplicate_groups(
    docs: DataFrame, *, n_salts: int = 64, exact_confirm: bool = False
) -> DataFrame:
    """Duplicate clusters: (fp, content_key, dup_count, size, wasted_bytes).

    Empty documents (size 0) are excluded, matching the reference's
    size==0 skip (duplicate_files/core.zig:35).
    """
    fp = with_fingerprint(docs, exact_confirm=exact_confirm).where(F.col("size") > 0)
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts))
    partial = fp.groupBy("fp", "content_key", salt.alias("_salt")).agg(
        F.count("*").alias("_cnt"), F.min("size").alias("_sz")
    )
    groups = (
        partial.groupBy("fp", "content_key")
        .agg(F.sum("_cnt").alias("dup_count"), F.min("_sz").alias("size"))
        .where(F.col("dup_count") > 1)
    )
    # bytes wasted: size once per extra member (duplicate_files/core.zig:76-77)
    return groups.withColumn(
        "wasted_bytes", F.col("size") * (F.col("dup_count") - 1)
    )


def check_duplicates(
    docs: DataFrame, *, n_salts: int = 64, exact_confirm: bool = False
) -> DataFrame:
    """Violations: one WARNING row per member of every duplicate cluster."""
    fp = with_fingerprint(docs, exact_confirm=exact_confirm).where(F.col("size") > 0)
    groups = duplicate_groups(docs, n_salts=n_salts, exact_confirm=exact_confirm)
    # the duplicate-key set is tiny relative to the corpus; let AQE pick
    # broadcast when it fits, sort-merge otherwise
    members = fp.join(
        groups.select("fp", "content_key", "dup_count", "wasted_bytes"),
        ["fp", "content_key"],
        "inner",
    )
    detail = F.format_string(
        "duplicate group fp=%d members=%d wasted_bytes=%d",
        F.col("fp"),
        F.col("dup_count"),
        F.col("wasted_bytes"),
    )
    return as_violations(members, CHECK_NAME, SEV_WARNING, detail)


def wasted_bytes_total(docs: DataFrame, *, n_salts: int = 64) -> DataFrame:
    """The reference's per-check Total: aggregate bytes wasted."""
    return duplicate_groups(docs, n_salts=n_salts).agg(
        F.coalesce(F.sum("wasted_bytes"), F.lit(0)).alias("wasted_bytes")
    )
