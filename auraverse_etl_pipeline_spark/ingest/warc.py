"""WARC (ISO 28500) record writer/parser + Spark ingestion plumbing.

Web-scale training corpora land as WARC files (CommonCrawl ships
~100 TB/crawl of them), so a pipeline that can't read WARC can't start.
This is the stdlib twin of ``warcio``: a strict WARC/1.0 record parser
(CRLF framing, header block, ``Content-Length``-delimited payload,
record trailer) plus a deterministic writer used by the fixtures — the
same honest-codec pattern as ``operators/multimodal.py`` (the parser is
the real thing; the corpus is synthesized so an oracle can replay the
expected output closed-form).

Spark shape: WARC files are many-record blobs, so ingestion is
``binaryFile``-style rows → Arrow-batched ``mapInPandas`` parse →
one row per record. Parsing is stateful WITHIN a file and
embarrassingly parallel ACROSS files — the ingest-pipeline posture
(SCALE.md): with millions of WARC files per crawl, file-level
parallelism saturates any cluster without splitting records.
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from auraverse_etl_pipeline_spark.runtime import ship_package

_CRLF = b"\r\n"

#: Fixed, deterministic WARC-Date for synthesized records (WARC requires
#: the header; fixtures must not read the clock).
FIXTURE_WARC_DATE = "2026-01-01T00:00:00Z"


def build_warc_record(target_uri: str, payload: bytes) -> bytes:
    """One WARC/1.0 ``response`` record: version line, header block
    (named headers + byte-exact ``Content-Length``), blank line,
    payload, record trailer (two CRLFs). The record id is derived from
    the payload digest — deterministic, no RNG, no clock."""
    rid = hashlib.md5(target_uri.encode() + payload).hexdigest()
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">" + _CRLF
        + b"WARC-Date: " + FIXTURE_WARC_DATE.encode() + _CRLF
        + b"WARC-Target-URI: " + target_uri.encode() + _CRLF
        + b"Content-Type: text/plain" + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
    )
    return headers + _CRLF + payload + _CRLF + _CRLF


def build_warc(records: list[tuple[str, bytes]], gzip: bool = False) -> bytes:
    """Concatenate records into one WARC file; ``gzip=True`` compresses
    the whole member (CommonCrawl gzips per record — a concatenation of
    gzip members decompresses identically with ``zlib``; one member is
    the simple honest subset)."""
    blob = b"".join(build_warc_record(uri, payload) for uri, payload in records)
    return _gzip.compress(blob, 9, mtime=0) if gzip else blob


def parse_warc(data: bytes) -> list[dict]:
    """Strict WARC/1.0 parse → one dict per record:
    ``{"headers": {name: value}, "payload": bytes}``.

    Framing rules enforced, not guessed (the decode_bmp discipline —
    malformed records raise ``ValueError``): every record starts with
    ``WARC/1.0``/``WARC/1.1``, headers end at the first blank line,
    the payload is EXACTLY ``Content-Length`` bytes (multi-byte UTF-8
    payloads make byte-vs-char slicing observable), and the record
    trailer is two CRLFs. Gzipped input (magic ``1f 8b``) is inflated
    transparently, including concatenated members."""
    if data[:2] == b"\x1f\x8b":
        data = _gzip.decompress(data)
    out: list[dict] = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC version line at offset {pos}")
        ver_end = data.index(_CRLF, pos)
        version = data[pos:ver_end].decode("ascii")
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise ValueError(f"unsupported {version}")
        hdr_end = data.index(_CRLF + _CRLF, ver_end)
        headers: dict[str, str] = {}
        for line in data[ver_end + 2 : hdr_end].split(_CRLF):
            name, sep, value = line.decode("utf-8").partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[name.strip()] = value.strip()
        if "Content-Length" not in headers:
            raise ValueError("record missing Content-Length")
        n = int(headers["Content-Length"])
        body_start = hdr_end + 4
        payload = data[body_start : body_start + n]
        if len(payload) != n:
            raise ValueError("truncated WARC payload")
        if data[body_start + n : body_start + n + 4] != _CRLF + _CRLF:
            raise ValueError("missing WARC record trailer")
        out.append({"headers": headers, "payload": payload})
        pos = body_start + n + 4
    return out


#: Schema of the staged WARC-file table.
WARC_FILE_SCHEMA = StructType(
    [
        StructField("file_id", LongType()),
        StructField("content", BinaryType()),
    ]
)

#: Schema of the parsed-record table.
WARC_RECORD_SCHEMA = StructType(
    [
        StructField("file_id", LongType()),
        StructField("target_uri", StringType()),
        StructField("warc_type", StringType()),
        StructField("content_length", LongType()),
        StructField("n_headers", LongType()),
        StructField("payload_sha256", StringType()),
    ]
)


def documents_to_warc(
    docs: DataFrame,
    records_per_file: int = 50,
    gzip: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    uri_col: str | None = None,
) -> DataFrame:
    """Stage a document table as multi-record WARC files:
    ``(file_id, content binary)`` with ``records_per_file`` documents
    per file (grouped by ``id DIV records_per_file``, ordered by id
    inside the file — fully deterministic bytes). The fixture half of
    the roundtrip; the bytes are REAL WARC that any external reader
    ingests.

    ``uri_col`` (optional) supplies the ``WARC-Target-URI`` per
    document (default: ``http://corpus.invalid/doc/<id>``). A custom
    URI MUST still end in ``/<doc_id>`` — :func:`warc_documents`
    recovers the id from the trailing path segment — and the staging
    kernel enforces it loudly."""
    ship_package(docs.sparkSession)

    uri = (
        F.col(uri_col)
        if uri_col
        else F.concat(F.lit("http://corpus.invalid/doc/"), F.col(id_col).cast("string"))
    )
    grouped = (
        docs.select(
            # integer DIV, never float-divide+cast: above 2^53 the
            # double quotient loses precision (CLAUDE.md bucket-id rule)
            F.expr(f"CAST({id_col} AS BIGINT) DIV {int(records_per_file)}").alias(
                "file_id"
            ),
            F.col(id_col).cast("bigint").alias("id"),
            F.col(text_col).alias("text"),
            uri.alias("uri"),
        )
        .groupBy("file_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("id", "text", "uri"))).alias("recs")
        )
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                # NULL text fails loudly: silently staging an empty
                # payload would make the roundtrip digest diverge from
                # any oracle computed off the source column (which
                # propagates NULL), hiding data loss.
                for r in rec.recs:
                    if r["text"] is None:
                        raise ValueError(
                            f"documents_to_warc: NULL text for doc id {r['id']}"
                        )
                    if r["uri"] is None or r["uri"].rsplit("/", 1)[-1] != str(r["id"]):
                        raise ValueError(
                            "documents_to_warc: WARC-Target-URI must end in "
                            f"/<doc_id>; got {r['uri']!r} for doc id {r['id']}"
                        )
                records = [
                    (r["uri"], r["text"].encode("utf-8")) for r in rec.recs
                ]
                rows.append(
                    {"file_id": rec.file_id, "content": build_warc(records, gzip=gzip)}
                )
            yield pd.DataFrame(rows, columns=["file_id", "content"])

    return grouped.mapInPandas(build, WARC_FILE_SCHEMA)


def warc_records(files: DataFrame) -> DataFrame:
    """Parse a ``(file_id, content)`` WARC-file table into one row per
    record: ``(file_id, target_uri, warc_type, content_length,
    n_headers, payload_sha256)``. Arrow-batched ``mapInPandas`` — the
    same per-file-stateful / across-files-parallel posture as the
    document detector pipeline; a real crawl run points this at a
    ``binaryFile`` scan of the WARC prefix instead."""
    ship_package(files.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                for parsed in parse_warc(bytes(rec.content)):
                    h = parsed["headers"]
                    rows.append(
                        {
                            "file_id": rec.file_id,
                            "target_uri": h.get("WARC-Target-URI", ""),
                            "warc_type": h.get("WARC-Type", ""),
                            "content_length": int(h["Content-Length"]),
                            "n_headers": len(h),
                            "payload_sha256": hashlib.sha256(
                                parsed["payload"]
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return files.mapInPandas(run, WARC_RECORD_SCHEMA)


#: warc_documents output: the (doc_id, text) shape the detector
#: pipeline consumes.
WARC_DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

#: with_uri=True adds the crawl metadata column.
WARC_DOCUMENT_URI_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("target_uri", StringType()),
    ]
)


def warc_documents(files: DataFrame, with_uri: bool = False) -> DataFrame:
    """The re-ingestion inverse of :func:`documents_to_warc`: parse a
    ``(file_id, content)`` WARC-file table back into ``(doc_id, text)``
    document rows — doc_id recovered from the trailing path segment of
    ``WARC-Target-URI``, text decoded strictly as UTF-8 (a payload that
    is not valid UTF-8 fails loudly, same posture as the NULL-text
    staging guard). Only ``response`` records are documents; other
    record types (warcinfo, request, metadata in a real crawl) are
    skipped. ``with_uri=True`` keeps the ``target_uri`` column for
    domain-level curation (per-domain cards, blocklists). Arrow-batched
    ``mapInPandas``, stateful per file and embarrassingly parallel
    across files."""
    ship_package(files.sparkSession)
    schema = WARC_DOCUMENT_URI_SCHEMA if with_uri else WARC_DOCUMENT_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rec in batch.itertuples(index=False):
                for parsed in parse_warc(bytes(rec.content)):
                    h = parsed["headers"]
                    if h.get("WARC-Type") != "response":
                        continue
                    uri = h["WARC-Target-URI"]
                    row = {
                        "doc_id": int(uri.rsplit("/", 1)[1]),
                        "text": parsed["payload"].decode("utf-8"),
                    }
                    if with_uri:
                        row["target_uri"] = uri
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return files.mapInPandas(run, schema)
