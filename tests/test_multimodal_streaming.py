"""Multimodal binary plumbing + streaming validation."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from datachecker_spark.datagen import make_docs
from datachecker_spark.multimodal import (
    check_binary_magic,
    decode_media,
    generate_media_blobs,
    resize_images,
    sample_frames,
)
from datachecker_spark.streaming import stream_violations, windowed_verdicts


def test_media_blob_generation_and_magic(spark):
    media = generate_media_blobs(spark, 100, seed=3, corrupt_rate=0.1)
    assert media.count() == 100
    v = check_binary_magic(media)
    n_bad = v.count()
    assert 0 < n_bad < 30  # ~10% corrupted
    # corrupted payloads start with XXXX, clean ones with the magic
    bad_refs = {r["doc_id"] for r in v.collect()}
    raw = {r["media_ref"]: bytes(r["content"]) for r in media.collect()}
    for ref, content in raw.items():
        assert (not content.startswith(b"DCMM")) == (ref in bad_refs)


def test_decode_media(spark):
    media = generate_media_blobs(spark, 60, seed=4, corrupt_rate=0.0)
    dec = decode_media(media)
    rows = {r["media_ref"]: r for r in dec.collect()}
    assert len(rows) == 60
    meta = {r["media_ref"]: r["meta"] for r in media.collect()}
    for ref, r in rows.items():
        assert r["decoder"] == "fake"
        m = meta[ref]
        if r["media_kind"] == "image":
            assert (r["width"], r["height"]) == (m["width"], m["height"])
        if r["media_kind"] == "audio":
            assert r["sample_rate"] == 44100
        assert r["n_bytes"] == 64 + 21


def test_decode_corrupt_is_null(spark):
    media = generate_media_blobs(spark, 40, seed=5, corrupt_rate=1.0)
    dec = decode_media(media)
    assert dec.where("decoder = 'none'").count() == 40


def test_resize_images(spark):
    media = generate_media_blobs(spark, 60, seed=6, corrupt_rate=0.0)
    out = {r["media_ref"]: r for r in resize_images(media, max_side=64).collect()}
    orig = {r["media_ref"]: r["meta"] for r in media.where("media_kind='image'").collect()}
    assert set(out) == set(orig)
    for ref, r in out.items():
        assert max(r["width"], r["height"]) <= 64
        w0, h0 = orig[ref]["width"], orig[ref]["height"]
        scale = min(64 / max(w0, 1), 64 / max(h0, 1), 1.0)
        assert (r["width"], r["height"]) == (max(int(w0 * scale), 1), max(int(h0 * scale), 1))
        # resized payload re-decodes with the new dims
    redec = decode_media(
        spark.createDataFrame(
            [(r["media_ref"], "image", r["content"], None) for r in out.values()],
            "media_ref string, media_kind string, content binary, meta struct<width:int,height:int,duration_ms:int,sample_rate:int>",
        )
    )
    for r in redec.collect():
        assert (r["width"], r["height"]) == (out[r["media_ref"]]["width"], out[r["media_ref"]]["height"])


def test_sample_frames(spark):
    media = generate_media_blobs(spark, 30, seed=7, corrupt_rate=0.0)
    frames = sample_frames(media, every_ms=1000)
    got = frames.groupBy("media_ref").agg(F.count("*").alias("n"), F.max("ts_ms").alias("last"))
    durations = {r["media_ref"]: r["meta"]["duration_ms"]
                 for r in media.where("media_kind='video'").collect()}
    for r in got.collect():
        d = durations[r["media_ref"]]
        assert r["n"] == (d + 999) // 1000
        assert r["last"] < d


def _stream_docs_rows():
    return [
        ("ok1", [("text", "plain fine text", None, 0)], "p0"),
        ("bad..name", [("text", "x", None, 0)], "p0"),
        ("secret1", [("text", "contains top secret stuff", None, 0)], "p1"),
        ("empty1", [], "p1"),
    ]


def test_stream_violations_on_batch(spark):
    """The streaming check set is the same functions as batch — verify the
    composition on a static frame first."""
    docs = make_docs(spark, _stream_docs_rows())
    v = stream_violations(docs)
    got = {(r["check"], r["doc_id"]) for r in v.collect()}
    assert ("name_rules", "bad..name") in got
    assert ("confidential", "secret1") in got
    assert ("empty_doc", "empty1") in got
    assert all(d != "ok1" for _, d in got)


def test_streaming_end_to_end(spark, tmp_path):
    """Real readStream → stateless checks → memory sink."""
    docs = make_docs(spark, _stream_docs_rows())
    src = str(tmp_path / "stream_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    assert stream.isStreaming
    v = stream_violations(stream)
    q = (
        v.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_viol")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r["check"], r["doc_id"]) for r in spark.sql("select * from stream_viol").collect()}
    assert ("name_rules", "bad..name") in got
    assert ("confidential", "secret1") in got


def test_stateful_running_rates(spark, tmp_path):
    """applyInPandasWithState: cumulative per-part violation rate carries
    state ACROSS micro-batches — two file drops, second emission must
    include the first batch's totals."""
    from datachecker_spark.streaming import running_violation_rates

    src = str(tmp_path / "state_src")
    batch1 = make_docs(
        spark,
        [
            ("a1", [("text", "fine", None, 0)], "p0"),
            ("a2", [], "p0"),  # empty → violation
        ],
    )
    batch1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(batch1.schema).parquet(src)
    q = (
        running_violation_rates(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_rates")
        .start()
    )
    try:
        q.processAllAvailable()
        batch2 = make_docs(
            spark,
            [
                ("b1", [("text", "ok", None, 0)], "p0"),
                ("b2", [("text", "ok", None, 0)], "p0"),
            ],
        )
        batch2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "select * from running_rates order by total_docs"
    ).collect()
    # first emission: 2 docs, 1 violation; second carries state: 4 docs total
    assert rows[0]["total_docs"] == 2 and rows[0]["total_violations"] == 1
    last = rows[-1]
    assert last["total_docs"] == 4 and last["total_violations"] == 1
    assert abs(last["violation_rate"] - 0.25) < 1e-9


def test_windowed_verdicts_streaming(spark, tmp_path):
    """Watermarked windowed aggregation over a doc stream with event time."""
    docs = make_docs(spark, _stream_docs_rows())
    with_ts = docs.withColumn(
        "ts",
        F.to_timestamp(
            F.when(F.col("part") == "p0", "2024-01-01 00:01:00").otherwise(
                "2024-01-01 00:07:00"
            )
        ),
    )
    src = str(tmp_path / "wv_src")
    with_ts.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(with_ts.schema).parquet(src)
    wv = windowed_verdicts(stream, window="5 minutes", watermark="1 minute", large_doc_size=10_000)
    # complete mode: emit every window each trigger — in append mode a window
    # only emits once the watermark passes its end, so a one-shot run would
    # hold back the last window (correct streaming behavior, wrong for a test)
    q = (
        wv.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_wv")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {(r["part"], str(r["window_start"])): r
            for r in spark.sql("select * from stream_wv").collect()}
    # windowed `violations` must equal the BATCH stateless check set's
    # violation-row count per part (each part's docs share one window here):
    # the streaming path reuses the same constraint functions, so the two
    # pipelines must agree row-for-row
    expected = {
        r["part"]: r["n"]
        for r in stream_violations(docs, large_doc_size=10_000)
        .groupBy("part").agg(F.count("*").alias("n")).collect()
    }
    p1 = rows[("p1", "2024-01-01 00:05:00")]
    assert p1["docs_seen"] == 2 and p1["violations"] == expected["p1"]
    assert expected["p1"] >= 2  # confidential (secret1) + empty_doc (empty1)
    p0 = rows[("p0", "2024-01-01 00:00:00")]
    assert p0["docs_seen"] == 2 and p0["violations"] == expected.get("p0", 0)
    assert expected.get("p0", 0) >= 1  # name_rules (bad..name)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Bounded-state streaming dedup on the canonical fingerprint: a
    re-arrival of identical span content within the watermark horizon is
    dropped — INCLUDING across micro-batches (the state survives the batch
    boundary) — while distinct content passes."""
    from datachecker_spark.streaming import stream_dedup

    src = str(tmp_path / "dedup_src")
    dup_spans = [("text", "same payload", None, 0)]
    batch1 = make_docs(
        spark,
        [
            ("d1", dup_spans, "p0"),
            ("d2", dup_spans, "p0"),          # same fp as d1 → dropped
            ("d3", [("text", "other", None, 0)], "p0"),
        ],
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:01:00")))
    batch1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(batch1.schema).parquet(src)
    q = (
        stream_dedup(stream, horizon="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup_sink")
        .start()
    )
    try:
        q.processAllAvailable()
        batch2 = make_docs(
            spark,
            [
                ("d4", dup_spans, "p0"),      # fp seen in batch1, within horizon
                ("d5", [("text", "fresh", None, 0)], "p0"),
            ],
        ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:02:00")))
        batch2.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from stream_dedup_sink").collect()
    fps = [r["fp"] for r in rows]
    assert len(fps) == len(set(fps)) == 3  # one per distinct content
    ids = {r["doc_id"] for r in rows}
    assert "d3" in ids and "d5" in ids
    assert ("d1" in ids) ^ ("d2" in ids)    # exactly one of the twins
    assert "d4" not in ids                  # cross-batch re-arrival dropped
