"""Canonical content fingerprints for interleaved span documents.

The reference's duplicate pipeline hashes file content chunk-by-chunk with
BLAKE3 (`/root/reference/src/modules/core.zig:380-410`); here the "content" of
a document is its span sequence in logical `offset` order, independent of the
storage order of the array. The fingerprint is therefore computed over an
offset-sorted projection of (kind, text, media_ref) — never over the raw
array — using the JVM-side `xxhash64` so the whole computation stays inside
whole-stage codegen (no Python).

Null vs empty-string must not collide (the reference treats absence as a
distinct error branch), so each field is coalesced to a sentinel that cannot
appear in real text before concatenation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_SENTINEL = "\x00N"
FIELD_SEP = "\x01"
SPAN_SEP = "\x02"


def ordered_spans(spans: Column | str = "spans") -> Column:
    """Spans sorted by logical offset, storage order discarded.

    Implemented by lifting `offset` to the first struct field and using the
    natural (field-lexicographic) ordering of `array_sort` — pure Catalyst,
    codegen-friendly, no comparator lambda needed.
    """
    c = F.col(spans) if isinstance(spans, str) else spans
    lifted = F.transform(
        c,
        lambda s: F.struct(
            s["offset"].alias("offset"),
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
        ),
    )
    return F.transform(
        F.array_sort(lifted),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )


def canonical_string(spans: Column | str = "spans") -> Column:
    """Deterministic serialization of the ordered span sequence.

    (kind, text, media_ref) per span, fields joined by FIELD_SEP, spans by
    SPAN_SEP, nulls mapped to NULL_SENTINEL. `offset` itself is excluded:
    two documents whose spans read identically in order are duplicates even
    if their absolute offsets differ (order is the invariant, per the
    BASELINE input_hint: span-sequence equality on kind/text/media_ref/order).
    """
    return _canonical_from_ordered(ordered_spans(spans))


def fingerprint(spans: Column | str = "spans") -> Column:
    """64-bit content fingerprint: xxhash64 of the canonical string.

    xxhash64 is the engine's canonical algorithm (built-in, codegen'd).
    Collisions are possible at 2^-64; exact-duplicate confirmation therefore
    re-checks span-sequence equality inside each fingerprint group (see
    constraints/duplicates.py), mirroring the reference's byte-exact
    clustering stage (`/root/reference/src/modules/duplicate_files/core.zig:67-94`).
    """
    return F.xxhash64(canonical_string(spans))


def doc_size(spans: Column | str = "spans") -> Column:
    """Total text length of a document (the analog of file size).

    Media spans contribute 0 (their payload lives behind media_ref)."""
    c = F.col(spans) if isinstance(spans, str) else spans
    return F.aggregate(
        c,
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)).cast("long"),
    )


def span_count(spans: Column | str = "spans") -> Column:
    c = F.col(spans) if isinstance(spans, str) else spans
    return F.size(c)


def flattened_text(spans: Column | str = "spans") -> Column:
    """Ordered concatenation of text-span content — the confidentiality-scan
    input. Adjacent spans are contiguous text (the documented boundary rule:
    the analog of the reference treating chunk boundaries as contiguous,
    /root/reference/src/modules/confidential.zig:66-88), so a pattern split
    across two spans still matches. Media spans contribute nothing."""
    return _flat_from_ordered(ordered_spans(spans))


# Derived columns every check family reads. Spark evaluates higher-order
# functions (transform/array_sort/aggregate) in interpreted mode — outside
# whole-stage codegen, with per-row array materialization — so re-deriving
# these in each of the suite's ~18 branches over the cached scan is pure
# allocation churn that collapses multi-core scaling (measured: local[32]
# SLOWER than local[8] before this existed). annotate() computes them ONCE;
# the runner persists the annotated projection and every branch reads cheap
# cached columns. This is the engine's real analog of the reference's stat
# cache — walk once, reuse derived values
# (/root/reference/src/modules/core.zig:225-241) — applied to derived
# columns, not just rows.
DERIVED_COLUMNS = (
    "fp",
    "content_key",
    "size",
    "n_spans",
    "n_media",
    "_flat",
    # profile inputs: with these materialized, the per-partition profile
    # aggregation prunes to cached fixed-width columns and never touches the
    # spans payload (measured at 1M docs/8 cores: the profile scan was the
    # single biggest side-job, ~25 CPU-s/pass of repeated interpreted-HOF
    # span walks)
    "n_text_spans",
    "n_null_text",
    "n_null_ref",
    # media_ref list (tiny, fixed-ish width): the three ref-level checks +
    # the referential anti-join explode THIS column instead of re-reading
    # and decompressing the full spans struct array from the cache — after
    # this, the spans payload is decompressed by exactly ONE branch per
    # pass (the span-level checks); the corpus text otherwise re-enters the
    # memory bus once per ref consumer, which the bandwidth accounting in
    # BASELINE.md shows is the binding constraint on a shared socket
    "refs",
    # narrow per-span fields for the span-level checks (kind consistency +
    # JSON validity, constraints/predicates.span_meta_column). With this
    # materialized, NO union branch reads the cached spans payload at all —
    # the runner drops `spans` from the cache entirely (when integrity
    # doesn't need the canonical recompute), halving the cached text bytes
    # (_flat remains the single text copy) and removing a full
    # decompress-the-corpus pass from the union job
    "span_meta",
)


def _canonical_from_ordered(ordered: Column) -> Column:
    return F.array_join(
        F.transform(
            ordered,
            lambda s: F.concat_ws(
                FIELD_SEP,
                F.coalesce(s["kind"], F.lit(NULL_SENTINEL)),
                F.coalesce(s["text"], F.lit(NULL_SENTINEL)),
                F.coalesce(s["media_ref"], F.lit(NULL_SENTINEL)),
            ),
        ),
        SPAN_SEP,
    )


def _flat_from_ordered(ordered: Column) -> Column:
    return F.array_join(
        F.transform(ordered, lambda s: F.coalesce(s["text"], F.lit(""))), ""
    )


def annotate(docs):
    """Return docs with all DERIVED_COLUMNS present (no-op if already there).

    Two staged projections keep each expensive intermediate evaluated ONCE:
    the offset-sorted span projection feeds both the canonical serialization
    and the flattened text, and the canonical string feeds both xxhash64 and
    sha2. Catalyst's CollapseProject refuses to inline non-cheap expressions
    referenced more than once, so the staging survives optimization. The
    higher-order chain is interpreted (outside codegen) and allocation-heavy
    — halving its evaluations measurably lifts the content pass's multi-core
    ceiling (GC work competes with mutator threads for the same cores)."""
    # lazy import: constraints/ imports fingerprint at module level, so the
    # span-meta builder (which lives with the magic-prefix table it encodes)
    # is resolved at call time to keep the layering acyclic
    from datachecker_spark.constraints.predicates import span_meta_column as _span_meta

    missing = [c for c in DERIVED_COLUMNS if c not in docs.columns]
    if not missing:
        return docs
    staged = docs.withColumn("_ord", ordered_spans("spans")).withColumn(
        "_canon", _canonical_from_ordered(F.col("_ord"))
    )
    text_spans = F.filter(F.col("spans"), lambda s: s["kind"] == "text")
    media_spans = F.filter(F.col("spans"), lambda s: s["kind"] == "media")
    derived = {
        "fp": F.xxhash64(F.col("_canon")),
        "content_key": F.sha2(F.col("_canon"), 256),
        "size": doc_size("spans"),
        "n_spans": span_count("spans"),
        "n_media": F.size(media_spans),
        "_flat": _flat_from_ordered(F.col("_ord")),
        "n_text_spans": F.size(text_spans),
        "n_null_text": F.size(
            F.filter(text_spans, lambda s: s["text"].isNull())
        ),
        "n_null_ref": F.size(
            F.filter(media_spans, lambda s: s["media_ref"].isNull())
        ),
        "refs": F.transform(
            F.filter(media_spans, lambda s: s["media_ref"].isNotNull()),
            lambda s: s["media_ref"],
        ),
        "span_meta": _span_meta(F.col("spans")),
    }
    return staged.select(
        *docs.columns, *[derived[c].alias(c) for c in missing]
    )
