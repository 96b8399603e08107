"""Membership-table breadth vs the reference (VERDICT round-1 gap #8) and
the ngram hot-shingle guard (#6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datachecker_spark.constraints.confidential import DEFAULT_PATTERNS
from datachecker_spark.constraints.predicates import (
    LEGACY_FORMATS,
    TEMP_EXACT_NAMES,
    TEMP_EXTENSIONS,
    TEMP_PATH_FRAGMENTS,
    TEMP_START_END,
    temp_ref_expr,
)
from datachecker_spark.textops import ngram_jaccard_pairs


def test_table_breadth_matches_reference():
    # EXACT reference counts, verified by scripted diff against the zig
    # tables (round 3): 101 temp extensions (useless.zig:76-192, zero
    # symmetric difference), 6 exact names (:44-51), 14 start/end pairs
    # (:56-71), 110 legacy formats (:195-306, zero symmetric difference),
    # ~220 confidential literals (config.zig:98-172)
    assert len(TEMP_EXTENSIONS) == 101
    assert len(set(TEMP_EXTENSIONS)) == 101
    assert len(TEMP_EXACT_NAMES) == 6
    assert len(TEMP_START_END) == 14
    assert len(LEGACY_FORMATS) == 110
    assert len(DEFAULT_PATTERNS) >= 220
    # exact parity with the reference's 20-entry CONTAINS list
    # (useless.zig:20-41, Windows '\' forms verbatim) + the five documented
    # '/'-twin engine extensions
    from datachecker_spark.constraints.predicates import (
        REFERENCE_PATH_FRAGMENTS,
        UNIX_TWIN_FRAGMENTS,
    )

    reference_contains = [
        "\\$Recycle.bin\\", "\\AppData\\Local\\Temp", "\\Windows\\Temp",
        "\\AppData\\Local\\Microsoft\\INetCache\\IE",
        "\\AppData\\Local\\Microsoft\\INetCache\\Content.IE5",
        ".~lock.", ".git/objects/tmp_", ".git\\objects\\tmp_",
        ".hg/store/journal", ".hg\\store\\journal",
        ".svn/tmp/", ".svn\\tmp\\", ".torrent.", "/tmp/", "\\tmp\\",
        "node_modules/", "node_modules\\", "pycache/", "pycache\\",
        "__pycache__",
    ]
    assert set(REFERENCE_PATH_FRAGMENTS) == set(reference_contains)
    assert len(REFERENCE_PATH_FRAGMENTS) == 20
    assert len(UNIX_TWIN_FRAGMENTS) == 5
    assert set(TEMP_PATH_FRAGMENTS) == set(reference_contains) | set(
        UNIX_TWIN_FRAGMENTS
    )


def test_temp_ref_matcher_families(spark):
    cases = [
        ("a/b/report.docx", False),
        ("a/b/~report.docx", True),        # prefix/suffix pair ~*.docx
        ("a/b/notes.txt~", True),          # *~ backup
        ("a/b/#autosave#", True),          # #…# emacs
        ("a/b/.hidden", True),             # dotfile
        ("a/b/build.pyc", True),           # temp extension
        ("x/node_modules/lib.js", True),   # path fragment
        ("x/Thumbs.db", True),             # exact name
        ("x/archive.tar", False),
        ("x/tmpfile.dat", True),           # tmp* prefix
        (r"C:\Users\u\AppData\Local\Temp\a.dat", True),   # Windows fragment
        (r"C:\proj\node_modules\lib.js", True),           # '\' twin
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "ref string")
    got = {
        r["ref"]: r["hit"]
        for r in df.select("ref", temp_ref_expr(F.col("ref")).alias("hit")).collect()
    }
    for ref, expect in cases:
        assert got[ref] == expect, f"{ref}: {got[ref]} != {expect}"


def test_ngram_max_df_cap_identity_and_guard(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),
        (3, "zeta eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.1).collect()
    }
    # cap above the corpus max DF → byte-identical result
    capped = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.1, max_df=10).collect()
    }
    assert capped == uncapped and len(uncapped) == 1

    # skew-planted corpus: one stop-phrase shingle in EVERY doc; with
    # max_df=2 the hot shingle is excluded, so unrelated docs no longer pair
    skew = [(i, f"common phrase word{i} tail{i}") for i in range(20)]
    sdf = spark.createDataFrame(skew, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(sdf, threshold=0.01, max_df=2).collect()
    assert pairs == []  # only evidence was the capped stop shingle
    pairs_uncapped = ngram_jaccard_pairs(sdf, threshold=0.01).count()
    assert pairs_uncapped == 190  # quadratic blowup the guard prevents
    # disposal contract: ngram/minhash results carry a lazy shingle
    # checkpoint (textops.py) — callers release when done
    from datachecker_spark import cache

    cache.release_all(spark)
