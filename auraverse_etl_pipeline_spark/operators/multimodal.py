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
    """Real codec hook. Wire PIL / soundfile / pyav here when the
    runtime has them; this container does not, so downstream code must
    go through the deterministic fake in ``extract_media_features``."""
    raise NotImplementedError(
        f"no {kind} decoder available in this runtime; "
        "install pillow/soundfile/pyav and implement decode_payload"
    )


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
                    decoded = decode_payload(payload, rec.kind)  # pragma: no cover
                    raise RuntimeError(f"unexpected decoder output: {type(decoded)}")
                except NotImplementedError:
                    pass  # fall through to the deterministic fake
                n = len(payload)
                rows.append(
                    {
                        "media_id": rec.media_id,
                        "kind": rec.kind,
                        "n_bytes": n,
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "byte_mean": (sum(payload) / n) if n else 0.0,
                        "byte_entropy_proxy": (len(set(payload)) / 256.0),
                        "n_frames_sampled": (n + frame_stride - 1) // frame_stride,
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
    """Resize plumbing: Arrow-batched ``mapInPandas`` with the schema,
    batch shape, and per-item loop a real codec-backed resize would use.
    With a decoder importable, ``decode_payload`` would yield pixel
    arrays for real interpolation; the deterministic stand-in takes a
    strided byte sample down to ``target_w * target_h`` bytes, so output
    sizes, schemas, and partitioning behave exactly like production."""
    import numpy as np

    out_len = target_w * target_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, kind, payload in zip(
                batch["media_id"], batch["kind"], batch["payload"]
            ):
                try:
                    decoded = decode_payload(payload, kind)  # pragma: no cover
                except NotImplementedError:
                    buf = np.frombuffer(payload, dtype=np.uint8)
                    idx = np.linspace(0, len(buf) - 1, num=min(out_len, len(buf))).astype(int)
                    decoded = buf[idx].tobytes()
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "target_w": target_w,
                        "target_h": target_h,
                        "resized": decoded,
                        "n_bytes_out": len(decoded),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(run, RESIZED_SCHEMA)
