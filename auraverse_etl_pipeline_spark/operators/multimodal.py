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


#: PNG file signature.
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_payload(payload: bytes, kind: str):
    """Codec hook. Binary PPM (P6), PNG (8-bit RGB/RGBA,
    non-interlaced), BMP (24-bit BI_RGB) and WAV (16-bit PCM mono)
    decode for real —
    complete pure stdlib(+zlib/struct)+numpy codecs, so the
    resize/feature path is exercised on genuine pixel/sample data with
    zero third-party media libraries. Everything else (JPEG/MP3/MP4…)
    needs PIL / soundfile / pyav, absent in this runtime, and raises
    ``NotImplementedError`` so downstream code falls back to the
    deterministic byte-level fake.

    Both image paths are gated on the declared ``kind`` as well as the
    magic bytes: an audio/video payload that happens to start with
    ``P6`` or the PNG signature must not be silently reinterpreted as
    pixels."""
    if kind == "image" and payload[:2] == b"P6":
        return decode_ppm(payload)
    if kind == "image" and payload[: len(PNG_MAGIC)] == PNG_MAGIC:
        return decode_png(payload)
    if kind == "image" and payload[:2] == b"BM":
        return decode_bmp(payload)
    if kind == "image" and payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if kind == "audio" and payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        f"no {kind} decoder available in this runtime; "
        "install pillow/soundfile/pyav and implement decode_payload"
    )


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels, row_filters=None) -> bytes:
    """(h, w, 3) uint8 array → PNG bytes (8-bit truecolor RGB,
    non-interlaced). ``row_filters`` optionally picks a PNG filter type
    (0..4) per scanline — the test hook that makes the decoder's
    unfilter pass exercisable on every filter, not just the type-0
    rows this encoder would otherwise emit."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = pixels.shape
    bpp = 3
    if row_filters is None:
        row_filters = [0] * h
    raw = np.asarray(pixels, dtype=np.uint8)
    out_rows = []
    prior = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        row = raw[y].reshape(-1).astype(np.int64)
        f = row_filters[y]
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
            filt = (row - left) % 256
        elif f == 2:  # Up
            filt = (row - prior) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
            filt = (row - (left + prior) // 2) % 256
        elif f == 4:  # Paeth
            filt = np.empty_like(row)
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                filt[i] = (row[i] - _paeth(int(a), int(b), int(c))) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out_rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows))
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """PNG → (maxval=255, (h, w, 3) uint8 array). Pure stdlib ``zlib``
    + numpy: chunk walk, IDAT concatenation, inflate, per-scanline
    unfilter (all five PNG filter types). Supports 8-bit truecolor
    (color type 2) and truecolor+alpha (type 6 — alpha dropped, the
    standard convention for RGB feature extractors), non-interlaced.
    Strict like :func:`decode_ppm`: malformed headers, unsupported
    variants, and truncated rasters raise ValueError — a training
    pipeline wants corrupt media surfaced, not guessed at."""
    import struct
    import zlib

    import numpy as np

    if payload[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = len(PNG_MAGIC)
    ihdr = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt_method, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (2, 6) or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} interlace={interlace})"
        )
    bpp = 3 if color == 2 else 4
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT: {exc}") from exc
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG raster")
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            rec = row
        elif f == 2:  # Up
            rec = (row + prior) % 256
        elif f in (1, 3, 4):  # Sub/Average/Paeth: serial in x
            rec = np.empty_like(row)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (int(a) + int(b)) // 2
                else:
                    pred = _paeth(int(a), int(b), int(c))
                rec[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    pixels = out.reshape(h, w, bpp)[:, :, :3]
    return 255, np.ascontiguousarray(pixels)


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


def attach_png_media(
    docs: DataFrame, width: int = 16, height: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL PNG table: the :func:`attach_ppm_media`
    gradient formula (pixel = 1 + (media_id + 3x + 7y + c) mod 127),
    zlib-compressed through :func:`encode_png` with the scanline filter
    cycling over all five PNG filter types — so the full decode path
    (inflate + every unfilter) runs on every payload, and because the
    DECODED raster is closed-form, a SQL oracle can recompute the
    feature stats without ever touching zlib. (Payload LENGTH is
    compression-dependent, so oracles gate the decoded-raster stats,
    never n_bytes/sha256.)"""
    import numpy as np

    ship_package(docs.sparkSession)

    def make_png(ids: pd.Series) -> pd.Series:
        x = np.arange(width)[None, :, None] * 3
        y = np.arange(height)[:, None, None] * 7
        c = np.arange(3)[None, None, :]
        filters = [(i % 5) for i in range(height)]
        return pd.Series(
            [
                encode_png(
                    (1 + (int(mid) + x + y + c) % PPM_MAXVAL).astype(np.uint8),
                    row_filters=filters,
                )
                for mid in ids
            ]
        )

    payload = F.pandas_udf(make_png, "binary")(F.col(id_col))
    out = docs.select(F.col(id_col).alias("media_id"), payload.alias("payload"))
    return out.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.lit("synthetic-png").alias("origin"),
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


def multimodal_pair_dedup(
    pairs: DataFrame,
    caption_pairs: DataFrame,
    id_col: str = "pair_id",
    media_col: str = "payload",
) -> DataFrame:
    """LAION-style image-text PAIR dedup — where the multimodal tier
    and the dedup ladder meet: a pair is a duplicate of another if its
    media payload is byte-identical (exact tier: sha256, the same
    digest :func:`extract_media_features` emits) OR its caption is a
    near-duplicate (any text tier's pair output), and whole duplicate
    CLUSTERS collapse via connected components — so a re-hosted image
    with a paraphrased caption and a distinct image with a plagiarized
    caption both land in the original's component.

    ``pairs``: (``id_col``, ``media_col`` binary). ``caption_pairs``:
    (id1, id2) from any caption near-dup tier — exact n-gram Jaccard
    (:func:`~auraverse_etl_pipeline_spark.operators.dedup.
    ngram_jaccard_pairs`) at audit scale, MinHash-LSH
    (:func:`~auraverse_etl_pipeline_spark.operators.dedup.
    minhash_near_duplicates`) at corpus scale; the composition does
    not care which. Output: (``id_col``, component) for every pair
    touched by an edge, component = smallest reachable pair id.

    Scale shape: image edges cost one hash aggregate over fixed-width
    digests (group per sha256, anchored at the group-min id — a STAR
    per duplicate group, linear in members, never the quadratic
    within-group pairing) and payloads are digested map-side (native
    ``sha2``, no Python, no payload shuffle — only 64-hex-char
    digests move). The caption tier carries the banding/bucketing
    discipline of whichever dedup operator produced it, and the
    closure is the checkpointed pointer-doubling CC operator."""
    from auraverse_etl_pipeline_spark.operators.dedup import (
        connected_component_labels,
    )

    sha = pairs.select(
        F.col(id_col).alias("id"), F.sha2(F.col(media_col), 256).alias("s")
    )
    grp = (
        sha.groupBy("s")
        .agg(F.min("id").alias("id1"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("s", "id1")
    )
    img_edges = (
        sha.join(grp, "s")
        .filter(F.col("id") > F.col("id1"))
        .select("id1", F.col("id").alias("id2"))
    )
    edges = img_edges.unionByName(caption_pairs.select("id1", "id2"))
    return connected_component_labels(edges, id_col=id_col)


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


WAV_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", LongType()),
        StructField("sum_squares", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("peak", LongType()),
    ]
)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """int16 1-D array → RIFF/WAVE bytes (16-bit PCM mono). Pure
    stdlib ``struct`` — the audio twin of :func:`encode_png`."""
    import struct

    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes):
    """RIFF/WAVE (16-bit PCM mono) → (sample_rate, int16 array).
    Strict: non-PCM formats, multi-channel audio and truncated data
    chunks raise ValueError — corrupt media gets surfaced, not
    guessed at. Walks the chunk list, so extra chunks (LIST, fact)
    between fmt and data are tolerated like any real reader."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            if len(body) != size:
                raise ValueError("truncated data chunk")
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV layout (format={audio_format}, channels={channels}, bits={bits})"
        )
    return sample_rate, np.frombuffer(data, dtype="<i2")


def attach_wav_media(
    docs: DataFrame, n_samples: int = 256, sample_rate: int = 8000, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL WAV table: sample[t] = ((media_id·37 + t·13)
    mod 1024) − 512 as 16-bit PCM — closed-form, so a SQL oracle
    recomputes every waveform statistic from (media_id, t) arithmetic
    without parsing RIFF, while the Spark side must run the real
    decode path to see the samples at all."""
    import numpy as np

    ship_package(docs.sparkSession)

    def make_wav(ids: pd.Series) -> pd.Series:
        t = np.arange(n_samples, dtype=np.int64)
        return pd.Series(
            [
                encode_wav((((int(mid) * 37 + t * 13) % 1024) - 512).astype(np.int16), sample_rate)
                for mid in ids
            ]
        )

    payload = F.pandas_udf(make_wav, "binary")(F.col(id_col))
    out = docs.select(F.col(id_col).alias("media_id"), payload.alias("payload"))
    return out.select(
        "media_id",
        F.lit("audio").alias("kind"),
        "payload",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.lit("synthetic-wav").alias("origin"),
        ).alias("media_meta"),
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched waveform statistics through the REAL WAV decode:
    (media_id, n_samples, sample_rate, sum_squares, zero_crossings,
    peak) — all integers (16-bit samples square and sum exactly in
    int64), so the features are engine-reproducible with no float
    tolerance. ``zero_crossings`` counts sign flips between adjacent
    samples with sign(x) = x >= 0.

    Same scale shape as :func:`extract_media_features`: payloads
    never shuffle (features are computed in the scan's Arrow batch),
    one fixed-width row out per media row."""
    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                rate, s = decode_wav(bytes(rec.payload))
                s64 = s.astype(np.int64)
                nonneg = s64 >= 0
                rows.append(
                    {
                        "media_id": rec.media_id,
                        "n_samples": len(s64),
                        "sample_rate": rate,
                        "sum_squares": int((s64 * s64).sum()),
                        "zero_crossings": int((nonneg[1:] != nonneg[:-1]).sum()),
                        "peak": int(np.abs(s64).max()) if len(s64) else 0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in WAV_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(run, WAV_SCHEMA)


def encode_bmp(pixels) -> bytes:
    """(h, w, 3) uint8 RGB array → BMP bytes (Windows BITMAPINFOHEADER,
    24-bit BI_RGB, bottom-up, rows padded to 4 bytes — the classic
    uncompressed DIB every viewer reads)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        raster += px[y, :, ::-1].tobytes()  # BGR order
        raster += b"\x00" * pad
    header_size = 14 + 40
    file_size = header_size + len(raster)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
        + bytes(raster)
    )


def decode_bmp(payload: bytes):
    """BMP → (maxval=255, (h, w, 3) uint8 RGB array). Pure stdlib
    ``struct``: BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, 24-bit
    BI_RGB only (strict — compressed/paletted variants raise, a
    training pipeline wants unsupported media surfaced, not guessed
    at). Handles both bottom-up (positive height) and top-down
    (negative height) rasters and the 4-byte row padding."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    _, _, _, _, data_off = struct.unpack("<2sIHHI", payload[:14])
    hdr_size, w, h, planes, bpp, compression = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if hdr_size < 40:
        raise ValueError("unsupported BMP header (pre-BITMAPINFOHEADER)")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp} compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP raster")
    rows = []
    for i in range(h):
        start = data_off + i * stride
        row = np.frombuffer(payload[start : start + row_bytes], dtype=np.uint8)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR → RGB
    raster = np.stack(rows if top_down else rows[::-1])
    return 255, raster


def attach_bmp_media(
    docs: DataFrame, width: int = 16, height: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL BMP table: the same closed-form gradient as
    :func:`attach_ppm_media` / :func:`attach_png_media`, packed through
    :func:`encode_bmp` — so the decode path exercises the DIB layout
    rules (bottom-up row order, BGR channels, 4-byte padding) on every
    payload while the decoded raster stays SQL-recomputable."""
    import numpy as np

    ship_package(docs.sparkSession)

    def make_bmp(ids: pd.Series) -> pd.Series:
        x = np.arange(width)[None, :, None] * 3
        y = np.arange(height)[:, None, None] * 7
        c = np.arange(3)[None, None, :]
        return pd.Series(
            [
                encode_bmp((1 + (int(mid) + x + y + c) % PPM_MAXVAL).astype(np.uint8))
                for mid in ids
            ]
        )

    payload = F.pandas_udf(make_bmp, "binary")(F.col(id_col))
    out = docs.select(F.col(id_col).alias("media_id"), payload.alias("payload"))
    return out.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.lit("synthetic-bmp").alias("origin"),
        ).alias("media_meta"),
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 baseline sequential, 1-component grayscale)
# ---------------------------------------------------------------------------

#: Zigzag order: raster index of each zigzag position (T.81 Figure 5).
JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: T.81 Annex K luminance Huffman tables: (BITS counts per code length
#: 1..16, HUFFVAL symbol list) — the tables every camera ships.
JPEG_DC_LUMA = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
JPEG_AC_LUMA = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)


def _jpeg_canonical_codes(bits, vals):
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 Annex C)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_dct_basis():
    """Orthonormal 8-point DCT-II basis C with C[u,x] =
    (1/2)·c(u)·cos((2x+1)uπ/16): forward 2-D DCT is C·B·Cᵀ, inverse is
    Cᵀ·F·C (T.81 A.3.3 normalization)."""
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return c


def encode_jpeg(pixels, quant: int = 8) -> bytes:
    """(h, w) uint8 grayscale array → baseline sequential JPEG bytes
    (SOI/APP0-JFIF/DQT/SOF0/DHT/SOS/EOI, 1 component, Annex-K luminance
    Huffman tables, flat quantization table of ``quant``).

    A flat power-of-two table makes BLOCK-CONSTANT images round-trip
    bit-exactly (a constant block has only a DC coefficient, 8·(v−128),
    which quant=8 divides without remainder and the IDCT recovers
    within float epsilon of an integer) — the property the closed-form
    oracle fixtures exploit, while the entropy coding, zigzag and DCT
    machinery stay the real thing. Edges pad by replication to 8×8
    multiples, as every encoder does."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(px, ((0, bh - h), (0, bw - w)), mode="edge").astype(np.float64)
    C = _jpeg_dct_basis()
    qtab = np.full((8, 8), quant, dtype=np.int64)

    dc_codes = _jpeg_canonical_codes(*JPEG_DC_LUMA)
    ac_codes = _jpeg_canonical_codes(*JPEG_AC_LUMA)
    out = bytearray()
    acc, nbits = 0, 0

    def put(code, length):
        nonlocal acc, nbits
        acc = (acc << length) | code
        nbits += length
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
        acc &= (1 << nbits) - 1  # keep the accumulator bounded: an
        # unmasked acc grows one bit per emitted bit, making every
        # later shift copy the whole integer (O(bits^2) on real images)

    def magnitude(v):
        s = int(v).bit_length() if v >= 0 else int(-v).bit_length()
        return s, (v if v >= 0 else v + (1 << s) - 1)

    prev_dc = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coeffs = C @ block @ C.T
            q = np.round(coeffs / qtab).astype(np.int64)
            zz = [int(q.flat[i]) for i in JPEG_ZIGZAG]
            s, bitsv = magnitude(zz[0] - prev_dc)
            prev_dc = zz[0]
            put(*dc_codes[s])
            if s:
                put(bitsv, s)
            run = 0
            for coeff in zz[1:]:
                if coeff == 0:
                    run += 1
                    continue
                while run > 15:
                    put(*ac_codes[0xF0])  # ZRL
                    run -= 16
                s, bitsv = magnitude(coeff)
                put(*ac_codes[(run << 4) | s])
                put(bitsv, s)
                run = 0
            if run:
                put(*ac_codes[0x00])  # EOB
    if nbits:  # pad final byte with 1s (T.81 F.1.2.3)
        pad = 8 - nbits
        acc = (acc << pad) | ((1 << pad) - 1)
        byte = acc & 0xFF
        out.append(byte)
        if byte == 0xFF:
            out.append(0x00)

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, b"\x00" + bytes(int(qtab.flat[i]) for i in JPEG_ZIGZAG))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(JPEG_DC_LUMA[0]) + bytes(JPEG_DC_LUMA[1])
        + b"\x10" + bytes(JPEG_AC_LUMA[0]) + bytes(JPEG_AC_LUMA[1]),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return b"\xff\xd8" + app0 + dqt + sof + dht + sos + bytes(out) + b"\xff\xd9"


def decode_jpeg(payload: bytes):
    """Baseline JPEG → (maxval=255, (h, w, 3) uint8 array — grayscale
    replicated across RGB, which is exactly what viewers do with a
    1-component JFIF). Pure stdlib+numpy: marker parse, DQT/DHT table
    build, Huffman entropy decode with byte-unstuffing, DC prediction,
    zigzag→raster, dequantize, orthonormal IDCT, level shift, clamp.

    Strict baseline subset, same surfaced-not-guessed discipline as
    :func:`decode_bmp`: progressive (SOF2), arithmetic coding,
    multi-component (color) scans, 12-bit precision and restart
    intervals raise ``ValueError`` — a training pipeline wants
    unsupported media reported, not misdecoded."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qtables: dict[int, list[int]] = {}
    hufftabs: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q = None
    dc_id = ac_id = None
    pos = 2
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = (payload[pos] << 8) | payload[pos + 1]
        if marker == 0xFFD9:
            raise ValueError("no scan data before EOI")
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                qtables[tid] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0x0F
                bits = tuple(body[i + 1 : i + 17])
                n = sum(bits)
                vals = tuple(body[i + 17 : i + 17 + n])
                # a corrupted BITS array can claim more symbols than
                # the segment holds (or sum past 256 legal codes)
                if len(bits) != 16 or len(vals) != n or n > 256:
                    raise ValueError("malformed DHT segment")
                codes = _jpeg_canonical_codes(bits, vals)
                hufftabs[(tclass, tid)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                i += 17 + n
        elif marker == 0xFFC0:
            if len(body) < 9:
                raise ValueError("truncated SOF0 segment")
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only 1-component (grayscale) baseline supported")
            if body[7] != 0x11:
                raise ValueError("subsampled single component is malformed")
            comp_q = body[8]
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            if len(body) < 6:
                raise ValueError("truncated SOS header")
            if body[0] != 1:
                raise ValueError("only 1-component scans supported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            data_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if data_start is None or h is None or comp_q not in qtables:
        raise ValueError("truncated JPEG header")
    dc_tab = hufftabs.get((0, dc_id))
    ac_tab = hufftabs.get((1, ac_id))
    if dc_tab is None or ac_tab is None:
        raise ValueError("missing Huffman tables")
    qtab = np.zeros(64, dtype=np.int64)
    for zzpos, raster in enumerate(JPEG_ZIGZAG):
        qtab[raster] = qtables[comp_q][zzpos]

    # unstuff the entropy stream once: 0xFF 0x00 → 0xFF; a 0xFF
    # followed by anything else is a marker and ends the scan
    data = payload[data_start:]
    ent = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            if i + 1 < len(data) and data[i + 1] == 0x00:
                ent.append(0xFF)
                i += 2
                continue
            break
        ent.append(b)
        i += 1
    bitpos = 0

    def read_bit():
        nonlocal bitpos
        byte_i, bit_i = divmod(bitpos, 8)
        if byte_i >= len(ent):
            raise ValueError("truncated entropy data")
        bitpos += 1
        return (ent[byte_i] >> (7 - bit_i)) & 1

    def read_huff(tab):
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | read_bit()
            length += 1
            if (length, code) in tab:
                return tab[(length, code)]
        raise ValueError("invalid Huffman code")

    def receive_extend(s):
        v = 0
        for _ in range(s):
            v = (v << 1) | read_bit()
        if s and v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v

    C = _jpeg_dct_basis()
    bh, bw = -(-h // 8), -(-w // 8)
    raster = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.int64)
            s = read_huff(dc_tab)
            if s > 11:  # T.81 F.1.2.1: baseline DC categories are 0..11
                raise ValueError(f"invalid DC category {s}")
            prev_dc += receive_extend(s)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_huff(ac_tab)
                run, s = rs >> 4, rs & 0x0F
                if s > 10:  # T.81 F.1.2.2: baseline AC categories are 1..10
                    raise ValueError(f"invalid AC category {s}")
                if s == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = receive_extend(s)
                k += 1
            block = np.zeros(64, dtype=np.int64)
            for zzpos, ri in enumerate(JPEG_ZIGZAG):
                block[ri] = zz[zzpos]
            deq = (block * qtab).reshape(8, 8).astype(np.float64)
            spatial = C.T @ deq @ C + 128.0
            raster[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial
    gray = np.clip(np.round(raster[:h, :w]), 0, 255).astype(np.uint8)
    return 255, np.repeat(gray[:, :, None], 3, axis=2)


def attach_jpeg_media(
    docs: DataFrame, width: int = 24, height: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL baseline-JPEG table: BLOCK-constant gradients
    (every 8×8 block holds one value, 1 + (media_id + 3·bx + 7·by) mod
    127) encoded with the flat power-of-two quantization table — so the
    lossy codec round-trips bit-exactly (see :func:`encode_jpeg`) and
    the decoded raster stays SQL-recomputable closed-form, while
    Huffman entropy coding, zigzag, dequant and the IDCT all run for
    real on every payload."""
    import numpy as np

    ship_package(docs.sparkSession)
    if width % 8 or height % 8:
        raise ValueError("fixture dims must be 8x8-block multiples")

    def make_jpeg(ids: pd.Series) -> pd.Series:
        bx = np.arange(width // 8) * 3
        by = np.arange(height // 8) * 7
        blocks = by[:, None] + bx[None, :]
        return pd.Series(
            [
                encode_jpeg(
                    np.kron(
                        (1 + (int(mid) + blocks) % 127).astype(np.uint8),
                        np.ones((8, 8), dtype=np.uint8),
                    )
                )
                for mid in ids
            ]
        )

    payload = F.pandas_udf(make_jpeg, "binary")(F.col(id_col))
    out = docs.select(F.col(id_col).alias("media_id"), payload.alias("payload"))
    return out.select(
        "media_id",
        F.lit("image").alias("kind"),
        "payload",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.lit("synthetic-jpeg").alias("origin"),
        ).alias("media_meta"),
    )
