"""26-algorithm integrity dispatch (reference map: integrity.zig:46-73).

Expectation digests are computed in PYTHON (hashlib) over the reconstructed
canonical span serialization and verified against the SPARK-computed hashes:
for the JVM tier (md5/sha1/sha2*/truncations) this is a genuine cross-engine
known-answer test (OpenSSL vs JVM); for the hashlib tier it proves the UDF
dispatch, canonicalization, and digest parameters (BLAKE2 digest_size ↔
parameter block) line up end-to-end."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from datachecker_spark.constraints.integrity import (
    HASHLIB_ALGOS,
    JVM_ALGOS,
    REFERENCE_ALGOS,
    SUPPORTED_ALGOS,
    hashlib_digest,
    verify_integrity,
)
from datachecker_spark.datagen import make_docs
from datachecker_spark.fingerprint import FIELD_SEP, NULL_SENTINEL, SPAN_SEP


def _canonical(spans: list[tuple]) -> str:
    """Python reconstruction of fingerprint.canonical_string: offset-sorted
    (kind, text, media_ref) joined with the sentinel separators."""
    ordered = sorted(spans, key=lambda s: s[3])
    return SPAN_SEP.join(
        FIELD_SEP.join(x if x is not None else NULL_SENTINEL for x in (k, t, m))
        for k, t, m, _ in ordered
    )


SPANS = [
    ("text", "hello integrity", None, 0),
    ("media", None, "m1", 1),
    ("text", "tail", None, 2),
]


def _py_digest(algo: str, data: bytes) -> str | None:
    jvm = {
        "md5": lambda: hashlib.md5(data).hexdigest(),
        "sha1": lambda: hashlib.sha1(data).hexdigest(),
        "sha224": lambda: hashlib.sha224(data).hexdigest(),
        "sha256": lambda: hashlib.sha256(data).hexdigest(),
        "sha384": lambda: hashlib.sha384(data).hexdigest(),
        "sha512": lambda: hashlib.sha512(data).hexdigest(),
        "sha256t192": lambda: hashlib.sha256(data).hexdigest()[:48],
        "sha512t224": lambda: hashlib.sha512(data).hexdigest()[:56],
        "sha512t256": lambda: hashlib.sha512(data).hexdigest()[:64],
    }
    if algo in jvm:
        return jvm[algo]()
    return hashlib_digest(algo, data)


def test_reference_coverage():
    # full parity: all 26 reference algorithms run locally (blake3/ascon256
    # via the pure-Python public-spec tier in datachecker_spark.hashes)
    assert len(REFERENCE_ALGOS) == 26
    assert set(REFERENCE_ALGOS) <= set(SUPPORTED_ALGOS)


def test_all_algos_verify_and_mismatch(spark):
    docs = make_docs(spark, [("d0", SPANS, "p0")])
    canon = _canonical(SPANS).encode("utf-8")
    algos = [a for a in REFERENCE_ALGOS if a in SUPPORTED_ALGOS]
    rows = []
    for a in algos:
        rows.append((f"d0", a, _py_digest(a, canon)))        # correct → silent
    exp_ok = spark.createDataFrame(rows, "doc_id string, algo string, expected_hash string")
    v, _ = verify_integrity(docs, exp_ok, include_missing=False)
    bad = [r for r in v.collect() if r["severity"] == "ERROR"]
    assert bad == [], bad  # every Python digest matches the Spark-computed one

    exp_bad = spark.createDataFrame(
        [(f"d0", a, "corrupt_" + _py_digest(a, canon)) for a in algos],
        "doc_id string, algo string, expected_hash string",
    )
    v2, _ = verify_integrity(docs, exp_bad, include_missing=False)
    got = {r["detail"].split(" ")[0] for r in v2.collect() if r["severity"] == "ERROR"}
    assert got == set(algos)  # every algorithm flags its corrupted sidecar


def test_unsupported_algo_check_verdict(spark):
    docs = make_docs(spark, [("d0", SPANS, "p0")])
    # an algo outside the reference map (the reference has no whirlpool
    # sidecar) degrades to a CHECK verdict instead of crashing the job
    exp = spark.createDataFrame(
        [("d0", "whirlpool", "feedface")],
        "doc_id string, algo string, expected_hash string",
    )
    v, _ = verify_integrity(docs, exp, include_missing=False)
    rows = v.collect()
    assert len(rows) == 1
    assert rows[0]["severity"] == "CHECK"
    assert "unsupported" in rows[0]["detail"]


def test_create_semantics_all_tiers(spark):
    docs = make_docs(spark, [("d0", SPANS, "p0")])
    exp = spark.createDataFrame(
        [("d0", "sha3_256", None), ("d0", "md5", "")],
        "doc_id string, algo string, expected_hash string",
    )
    v, wb = verify_integrity(docs, exp, include_missing=False)
    assert {r["severity"] for r in v.collect()} == {"CHECK"}
    canon = _canonical(SPANS).encode("utf-8")
    got = {r["algo"]: r["expected_hash"] for r in wb.collect()}
    assert got["sha3_256"] == hashlib.sha3_256(canon).hexdigest()
    assert got["md5"] == hashlib.md5(canon).hexdigest()


def test_truncation_variants_are_prefixes():
    data = b"truncation check"
    assert _py_digest("sha256t192", data) == hashlib.sha256(data).hexdigest()[:48]
    # FIPS sha512_224 is NOT a truncation of sha512 (distinct IV)
    assert hashlib_digest("sha512_224", data) != hashlib.sha512(data).hexdigest()[:56]
    assert len(hashlib_digest("sha512_224", data)) == 56


def test_blake2_parameterization():
    # digest_size is part of the BLAKE2 parameter block: blake2b256 of x is
    # NOT a prefix of blake2b512 of x
    d256 = hashlib_digest("blake2b256", b"abc")
    d512 = hashlib_digest("blake2b512", b"abc")
    assert len(d256) == 64 and len(d512) == 128
    assert not d512.startswith(d256)
