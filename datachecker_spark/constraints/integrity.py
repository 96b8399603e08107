"""Integrity: create-or-verify content fingerprints against an expectation
table — the engine's analog of the reference's hash-sidecar protocol
(/root/reference/src/modules/integrity.zig:145-199):

  sidecar empty      → compute and WRITE the hash (CHECK verdict)   :172-180
  sidecar non-empty  → compare, OK or "different hash" ERROR        :190-198
  base file missing  → ERROR                                        :163-170

Relational form: full outer join of computed fingerprints with the
`expected_fingerprints` table (doc_id, algo, expected_hash):

  expected NULL/empty     → CHECK verdict + row in the write-back set
                            (caller MERGEs it into the expectation table)
  expected != computed    → ERROR violation
  doc absent              → ERROR (referential; FileNotFound analog)

Algorithms: xxhash64 (canonical, JVM built-in) and sha256 (F.sha2) — both
computed in one projection, selected per-expectation by `algo`. The
reference's 26-algorithm dispatch table collapses to the two that matter at
scale; exotic digests would be a pandas-UDF extension point, deliberately
not in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datachecker_spark.contract import SEV_CHECK, SEV_ERROR, VIOLATION_COLS
from datachecker_spark.fingerprint import canonical_string, fingerprint

CHECK_NAME = "integrity"
CHECK_MISSING = "integrity_missing"
GLOBAL_PART = "__global__"  # corpus-level violations carry this pseudo-partition

SUPPORTED_ALGOS = ("xxhash64", "sha256")


def computed_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, part, xxhash64, sha256) in one pass over the canonical form."""
    canon = canonical_string("spans")
    return docs.select(
        "doc_id",
        "part",
        fingerprint("spans").cast("string").alias("xxhash64"),
        F.sha2(canon, 256).alias("sha256"),
    )


def check_missing_expectations(docs: DataFrame, expected: DataFrame) -> DataFrame:
    """ERROR per expectation whose doc_id is absent from the corpus (the
    reference's FileNotFound branch, integrity.zig:163-170).

    This is a CORPUS-level check: the expectation table spans all partitions,
    so 'missing' is only decidable against the full document set — run it
    over the whole input, never a partition batch. Only doc_id is read from
    docs (column pruning keeps span payloads out of the scan)."""
    missing = expected.select("doc_id", "algo").join(
        docs.select("doc_id"), "doc_id", "left_anti"
    )
    return missing.select(
        F.lit(CHECK_MISSING).alias("check"),
        F.lit(SEV_ERROR).alias("severity"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(GLOBAL_PART).alias("part"),
        F.format_string("expected %s hash but document missing", F.col("algo")).alias(
            "detail"
        ),
    ).select(*VIOLATION_COLS)


def verify_integrity(
    docs: DataFrame, expected: DataFrame, *, include_missing: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Returns (violations, write_back).

    violations: ERROR rows for hash mismatches (plus, when include_missing,
    corpus-level rows for expectations whose doc_id is absent — see
    check_missing_expectations), CHECK rows for create-semantics entries.
    write_back: (doc_id, algo, expected_hash=computed) rows the caller merges
    into the expectation table (the reference writes the sidecar in place).
    """
    comp = computed_hashes(docs)
    exp = expected.select("doc_id", "algo", "expected_hash")
    join_type = "left" if include_missing else "inner"
    j = exp.join(comp, "doc_id", join_type)
    computed = (
        F.when(F.col("algo") == "xxhash64", F.col("xxhash64"))
        .when(F.col("algo") == "sha256", F.col("sha256"))
        .otherwise(F.lit(None))
    )
    j = j.withColumn("_computed", computed)

    create = j.where(
        F.col("xxhash64").isNotNull()
        & (F.col("expected_hash").isNull() | (F.col("expected_hash") == ""))
    )
    mismatch = j.where(
        F.col("xxhash64").isNotNull()
        & F.col("expected_hash").isNotNull()
        & (F.col("expected_hash") != "")
        & (F.col("_computed") != F.col("expected_hash"))
    )

    def v(df: DataFrame, severity: str, detail) -> DataFrame:
        return df.select(
            F.lit(CHECK_NAME).alias("check"),
            F.lit(severity).alias("severity"),
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("part").cast("string").alias("part"),
            detail.alias("detail"),
        ).select(*VIOLATION_COLS)

    violations = v(
        mismatch,
        SEV_ERROR,
        F.format_string(
            "%s mismatch: expected=%s computed=%s",
            F.col("algo"),
            F.col("expected_hash"),
            F.col("_computed"),
        ),
    ).unionByName(
        v(create, SEV_CHECK, F.format_string("created %s fingerprint", F.col("algo")))
    )
    if include_missing:
        violations = violations.unionByName(check_missing_expectations(docs, expected))
    write_back = create.select(
        "doc_id", "algo", F.col("_computed").alias("expected_hash")
    )
    return violations, write_back
