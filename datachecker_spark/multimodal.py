"""Multimodal media handling: opaque binary payloads + typed metadata.

Media travels as a `content: binary` column with a declared kind and a typed
metadata struct. Everything Spark-side is real and tested — schemas, magic
validation (§2.7 over actual bytes), Arrow batch shape through mapInPandas,
partition-aware batching. The pixel/sample decoding itself needs image/audio
libraries that are NOT in this container, so each decoder tries its library
and otherwise falls back to a clearly-marked deterministic fake that parses
only the engine's own synthetic header (generate_media_blobs) — the UDF
signature, batch iteration, and output schema are exactly what a real
decoder drops into.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datachecker_spark.contract import SEV_ERROR, VIOLATION_COLS

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# engine-native synthetic container format: magic + kind byte + dims header.
# Real formats would carry PNG/JPEG/WAV magic; the fake keeps the byte-level
# validation path (magic check, header parse) honest without codec libraries.
FAKE_MAGIC = b"DCMM"
_KIND_CODE = {"image": 1, "audio": 2, "video": 3}
_CODE_KIND = {v: k for k, v in _KIND_CODE.items()}

# real-world magic prefixes for the binary kind-consistency check
BINARY_MAGIC = {
    "image": [b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF87a", b"GIF89a", FAKE_MAGIC + b"\x01"],
    "audio": [b"ID3", b"RIFF", b"fLaC", FAKE_MAGIC + b"\x02"],
    "video": [b"\x00\x00\x00\x18ftyp", b"\x1aE\xdf\xa3", FAKE_MAGIC + b"\x03"],
}


def generate_media_blobs(
    spark: SparkSession, n: int = 200, *, seed: int = 42, corrupt_rate: float = 0.05
) -> DataFrame:
    """Deterministic fake media table. Payload = FAKE_MAGIC + kind byte +
    width/height/duration/rate (uint32 LE each) + hash-derived body bytes.
    corrupt_rate of rows get a wrong magic (kind-consistency offenders)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h = (rng.randrange(16, 512), rng.randrange(16, 512)) if kind == "image" else (0, 0)
        dur = rng.randrange(1000, 60000) if kind != "image" else 0
        sr = 44100 if kind == "audio" else 0
        header = FAKE_MAGIC + bytes([_KIND_CODE[kind]]) + struct.pack("<IIII", w, h, dur, sr)
        body = bytes((seed + i * 37 + j) % 256 for j in range(64))
        content = header + body
        if rng.random() < corrupt_rate:
            content = b"XXXX" + content[4:]
        rows.append((f"m{i}", kind, bytearray(content), (w, h, dur, sr)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def generate_real_format_blobs(
    spark: SparkSession, n: int = 120, *, seed: int = 43, corrupt_rate: float = 0.1
) -> DataFrame:
    """Media table variant carrying REAL format headers (+ ext column) for
    the §2.7/§2.8 checks — one specimen per rotation of the complex-magic
    format set, corrupt_rate rows get the signature byte flipped. Columns:
    (media_ref, ext, content binary)."""
    import random

    from datachecker_spark.constraints.magic import COMPLEX_MAGIC, SIMPLE_MAGIC

    def specimen(ext: str) -> bytes:
        clauses = COMPLEX_MAGIC.get(ext)
        if clauses is None:
            return SIMPLE_MAGIC[ext] + b"\x00" * 8
        clause = clauses[0]
        end = max(off + len(b) for off, b in clause)
        buf = bytearray(end + 8)
        for off, b in clause:
            buf[off : off + len(b)] = b
        return bytes(buf)

    exts = [".png", ".pdf", ".jpg", ".gif", ".zip", ".mp4", ".tar", ".mp3",
            ".avi", ".wav", ".tiff", ".html"]
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ext = exts[i % len(exts)]
        content = bytearray(specimen(ext))
        if rng.random() < corrupt_rate:
            # flip the deepest signature byte so every alternative fails
            off = max(
                (off for clause in COMPLEX_MAGIC.get(ext, [[(0, b"x")]]) for off, _ in clause),
                default=0,
            )
            content[off] ^= 0xEE
        rows.append((f"r{i}", ext, content))
    return spark.createDataFrame(
        rows, "media_ref string, ext string, content binary"
    )


# ---------------------------------------------------------------------------
# Binary-level validation (pure Spark, no UDF)
# ---------------------------------------------------------------------------


def check_binary_magic(media: DataFrame) -> DataFrame:
    """ERROR when content's leading bytes match none of the declared kind's
    known signatures — §2.7's declared-type-vs-content check over real bytes.
    Pure `substring(binary)` comparisons, whole-stage codegen."""
    cond = F.lit(False)
    for kind, magics in BINARY_MAGIC.items():
        anyhit = F.lit(False)
        for m in magics:
            anyhit = anyhit | (F.substring("content", 1, len(m)) == F.lit(bytearray(m)))
        cond = cond | ((F.col("media_kind") == kind) & anyhit)
    offenders = media.where(F.col("content").isNotNull() & ~cond)
    return offenders.select(
        F.lit("binary_magic").alias("check"),
        F.lit(SEV_ERROR).alias("severity"),
        F.col("media_ref").alias("doc_id"),
        F.lit("__media__").alias("part"),
        F.format_string("content does not match declared kind %s", F.col("media_kind")).alias(
            "detail"
        ),
    ).select(*VIOLATION_COLS)


# ---------------------------------------------------------------------------
# Decode / feature-extract via mapInPandas (Arrow-batched)
# ---------------------------------------------------------------------------

DECODE_SCHEMA = (
    "media_ref string, media_kind string, width int, height int, "
    "duration_ms int, sample_rate int, n_bytes int, decoder string"
)


def _decode_fake(content: bytes) -> dict | None:
    """Parse the engine's synthetic container header (deterministic fake)."""
    if content is None or len(content) < 21 or content[:4] != FAKE_MAGIC:
        return None
    kind = _CODE_KIND.get(content[4])
    w, h, dur, sr = struct.unpack("<IIII", content[5:21])
    return {"kind": kind, "width": w, "height": h, "duration_ms": dur, "sample_rate": sr}


def decode_media(media: DataFrame) -> DataFrame:
    """Decode metadata from binary payloads via mapInPandas.

    Tries Pillow for images (not installed in this container → the
    deterministic fake header parser handles the engine's own format and
    anything unparseable decodes to NULLs). Batch shape: one Arrow batch of
    (media_ref, media_kind, content) in, one pandas frame of typed metadata
    out — a real codec slots into `decode_one` untouched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # real decoder, when the library exists
            from io import BytesIO

            from PIL import Image  # noqa: F401

            def decode_image(b: bytes):
                img = Image.open(BytesIO(b))
                return {"width": img.width, "height": img.height}

            have_pil = True
        except ImportError:
            have_pil = False

        def decode_one(kind: str, b: bytes) -> dict:
            if have_pil and kind == "image":
                try:
                    d = decode_image(b)
                    return {**d, "duration_ms": None, "sample_rate": None, "decoder": "pillow"}
                except Exception:
                    pass
            fake = _decode_fake(b)
            if fake is not None:
                return {
                    "width": fake["width"] or None,
                    "height": fake["height"] or None,
                    "duration_ms": fake["duration_ms"] or None,
                    "sample_rate": fake["sample_rate"] or None,
                    "decoder": "fake",
                }
            return {"width": None, "height": None, "duration_ms": None,
                    "sample_rate": None, "decoder": "none"}

        for pdf in it:
            out = []
            for ref, kind, content in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["content"]
            ):
                d = decode_one(kind, content)
                out.append(
                    {
                        "media_ref": ref,
                        "media_kind": kind,
                        "width": d["width"],
                        "height": d["height"],
                        "duration_ms": d["duration_ms"],
                        "sample_rate": d["sample_rate"],
                        "n_bytes": len(content) if content is not None else 0,
                        "decoder": d["decoder"],
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_ref", "media_kind", "content").mapInPandas(
        batches, schema=DECODE_SCHEMA
    )


RESIZE_SCHEMA = "media_ref string, width int, height int, content binary"


def resize_images(media: DataFrame, *, max_side: int = 256) -> DataFrame:
    """Resize plumbing: images through mapInPandas, metadata-true output.
    Without a codec library the pixel path raises NotImplementedError inside
    a try and the fake scales the header dims (payload passed through) —
    the schema, batching, and scale math are the real contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resize_one(content: bytes):
            d = _decode_fake(content)
            if d is None or d["kind"] != "image":
                raise NotImplementedError("real codec required for non-engine formats")
            w, h = d["width"], d["height"]
            scale = min(max_side / max(w, 1), max_side / max(h, 1), 1.0)
            nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
            out = (
                content[:5]
                + struct.pack("<IIII", nw, nh, d["duration_ms"], d["sample_rate"])
                + content[21:]
            )
            return nw, nh, out

        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    nw, nh, out = resize_one(content)
                    rows.append({"media_ref": ref, "width": nw, "height": nh, "content": out})
                except NotImplementedError:
                    rows.append({"media_ref": ref, "width": None, "height": None, "content": None})
            yield pd.DataFrame(rows)

    imgs = media.where(F.col("media_kind") == "image")
    return imgs.select("media_ref", "content").mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_ref string, frame_idx int, ts_ms int"


def sample_frames(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video: emits one row per sampled frame
    timestamp from the decoded duration (a real decoder would also attach the
    frame bytes). Demonstrates the 1→N mapInPandas expansion shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                d = _decode_fake(content)
                if d is None or d["kind"] != "video":
                    continue
                for idx, ts in enumerate(range(0, d["duration_ms"], every_ms)):
                    rows.append({"media_ref": ref, "frame_idx": idx, "ts_ms": ts})
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "ts_ms"])

    vids = media.where(F.col("media_kind") == "video")
    return vids.select("media_ref", "content").mapInPandas(batches, schema=FRAME_SCHEMA)
