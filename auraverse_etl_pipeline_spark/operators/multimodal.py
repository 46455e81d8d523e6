"""Multimodal column conventions + feature-extraction plumbing.

Convention (SURVEY.md north star): media travels as an opaque ``binary``
payload column plus a typed metadata struct —

    media(media_id: long, kind: string, payload: binary,
          media_meta: struct<mime: string, n_bytes: long, origin: string>)

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec step is stubbed because
image/audio libraries are not in this container: ``decode_payload``
raises ``NotImplementedError`` unless a decoder is importable, and the
pipeline substitutes a deterministic fake feature extractor
(byte-statistics) so every downstream stage is exercisable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from auraverse_etl_pipeline_spark.runtime import ship_package

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy_proxy", DoubleType()),
        StructField("n_frames_sampled", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def decode_payload(payload: bytes, kind: str):
    """Codec hook. Binary PPM (P6) decodes for real — a complete pure
    stdlib+numpy raster codec, so the resize/feature path is exercised
    on genuine pixel data with zero third-party image libraries.
    Everything else (JPEG/WAV/MP4...) needs PIL / soundfile / pyav,
    absent in this runtime, and raises ``NotImplementedError`` so
    downstream code falls back to the deterministic byte-level fake.

    The PPM path is gated on the declared ``kind`` as well as the magic
    bytes: an audio/video payload that happens to start with ``P6``
    must not be silently reinterpreted as pixels."""
    if kind == "image" and payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        f"no {kind} decoder available in this runtime; "
        "install pillow/soundfile/pyav and implement decode_payload"
    )


def encode_ppm(pixels, maxval: int = 255) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n%d\n" % (w, h, maxval) + pixels.tobytes()


def decode_ppm(payload: bytes):
    """Binary PPM (P6) → (maxval, (h, w, 3) uint8 array). Raises
    ValueError on malformed headers/truncated rasters (strict — a
    training pipeline wants corrupt media surfaced, not guessed at)."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # ASCII tokens (comments #... legal between tokens), then ONE
    # whitespace byte, then the raster.
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(payload[start:pos])
    pos += 1  # the single whitespace separating header from raster
    w, h, maxval = (int(f) for f in fields)
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return maxval, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def attach_fake_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic media table from a text corpus: payload =
    UTF-8 bytes (an opaque blob as far as the pipeline is concerned),
    kind assigned round-robin. Gives every SF a media table without
    shipping binaries in testdata."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col(id_col) % len(MEDIA_KINDS) + 1).cast("int")
    )
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("synthetic").alias("origin"),
        ).alias("media_meta"),
    )


#: attach_ppm_media pixel formula — also inlined by the DuckDB oracle
#: for the resize digest gate, so keep the two in sync.
#:   pixel(media_id, x, y, c) = 1 + (media_id + 3x + 7y + c) mod 127
PPM_MAXVAL = 127  # bytes stay 1..127: ASCII-safe, so a SQL engine can
#                   rebuild the exact raster with chr()/string_agg


def attach_ppm_media(
    docs: DataFrame, width: int = 12, height: int = 6, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL image table: every doc gets a binary PPM (P6)
    whose pixels follow a closed-form gradient of (media_id, x, y,
    channel). Unlike :func:`attach_fake_media` (opaque text bytes),
    these payloads decode through :func:`decode_payload`, so resize and
    feature extraction run on genuine rasters — and because the formula
    is closed-form over ASCII-safe byte values, a SQL oracle can
    reconstruct the expected output bytes exactly."""
    import numpy as np

    # the UDF closes over module globals (encode_ppm, PPM_MAXVAL), so
    # the package must be importable on executors under a foreign cwd
    ship_package(docs.sparkSession)

    def make_ppm(ids: pd.Series) -> pd.Series:
        x = np.arange(width)[None, :, None] * 3
        y = np.arange(height)[:, None, None] * 7
        c = np.arange(3)[None, None, :]
        return pd.Series(
            [
                encode_ppm(
                    (1 + (int(mid) + x + y + c) % PPM_MAXVAL).astype(np.uint8),
                    maxval=PPM_MAXVAL,
                )
                for mid in ids
            ]
        )

    payload = F.pandas_udf(make_ppm, "binary")(F.col(id_col))
    out = docs.select(F.col(id_col).alias("media_id"), payload.alias("payload"))
    return out.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.lit("synthetic-ppm").alias("origin"),
        ).alias("media_meta"),
    )


def extract_media_features(media: DataFrame, frame_stride: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    Uses :func:`decode_payload` when a decoder exists; otherwise the
    deterministic byte-statistics fake (mean byte value, distinct-byte
    entropy proxy, strided frame count) — the batch shape, schema and
    partitioning are identical either way, which is what this operator
    is exercising."""
    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                payload = bytes(rec.payload or b"")
                try:
                    _, pixels = decode_payload(payload, rec.kind)
                    stat_bytes = pixels.tobytes()  # stats over real raster
                except (NotImplementedError, ValueError):
                    stat_bytes = payload  # deterministic byte-level fake
                n = len(payload)
                ns = len(stat_bytes)
                rows.append(
                    {
                        "media_id": rec.media_id,
                        "kind": rec.kind,
                        "n_bytes": n,
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "byte_mean": (sum(stat_bytes) / ns) if ns else 0.0,
                        "byte_entropy_proxy": (len(set(stat_bytes)) / 256.0),
                        "n_frames_sampled": (ns + frame_stride - 1) // frame_stride,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, frame_stride: int = 64, max_frames: int = 8) -> DataFrame:
    """Strided frame sampling: payload → ≤max_frames byte windows.
    Native (posexplode over slice offsets); with a real codec the UDF
    variant would decode then sample — the fan-out shape is the same."""
    n_frames = F.least(
        F.ceil(F.length("payload") / frame_stride).cast("long"), F.lit(max_frames)
    )
    idx = F.sequence(F.lit(0).cast("long"), n_frames - 1)
    return (
        media.select("media_id", "payload", F.posexplode(idx).alias("pos", "frame_index"))
        .select(
            "media_id",
            "frame_index",
            F.expr(f"substring(payload, frame_index * {frame_stride} + 1, {frame_stride})").alias(
                "frame_bytes"
            ),
        )
    )


#: Output schema of resize_media.
RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("resized", BinaryType()),
        StructField("n_bytes_out", LongType()),
    ]
)


def resize_media(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Arrow-batched resize. Decodable payloads (binary PPM via
    :func:`decode_payload`) get a REAL nearest-neighbor resample —
    out[y, x] = in[(y·H) // H_out, (x·W) // W_out] — re-encoded as PPM
    with the source maxval, so the output is a valid image whose pixel
    bytes an independent oracle can recompute exactly. Undecodable
    payloads keep the deterministic strided byte sample (same schema,
    batch shape, and partitioning), so the operator is total over mixed
    media."""
    import numpy as np

    ship_package(media.sparkSession)
    out_len = target_w * target_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, payload in zip(
                batch["media_id"], batch["kind"], batch["payload"]
            ):
                try:
                    maxval, pixels = decode_payload(bytes(payload), kind)
                    h, w, _ = pixels.shape
                    ys = (np.arange(target_h) * h) // target_h
                    xs = (np.arange(target_w) * w) // target_w
                    resized = encode_ppm(pixels[ys][:, xs], maxval=maxval)
                except (NotImplementedError, ValueError):
                    buf = np.frombuffer(payload, dtype=np.uint8)
                    idx = np.linspace(0, len(buf) - 1, num=min(out_len, len(buf))).astype(int)
                    resized = buf[idx].tobytes()
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "target_w": target_w,
                        "target_h": target_h,
                        "resized": resized,
                        "n_bytes_out": len(resized),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(run, RESIZED_SCHEMA)
