"""Document-ETL parity tests against golden behavior captured from the
reference implementation running on its own fixtures
(``tests/fixtures/reference_golden.json``; fixtures are the reference's
``input.txt``/``input2.txt``)."""

from __future__ import annotations

import json
import os

import pytest

from auraverse_etl_pipeline_spark.ingest.convert import convert_document
from auraverse_etl_pipeline_spark.ingest.detect import detect_document
from auraverse_etl_pipeline_spark.ingest.normalize import normalize_fragment
from auraverse_etl_pipeline_spark.ingest.schema_infer import fields_for_data, infer_value_type

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _read(name: str) -> str:
    with open(os.path.join(FIXTURES, name), encoding="utf-8") as fh:
        return fh.read()


@pytest.fixture(scope="module")
def golden():
    with open(os.path.join(FIXTURES, "reference_golden.json"), encoding="utf-8") as fh:
        return json.load(fh)


@pytest.mark.parametrize("doc_key,fname", [("doc1", "messy_doc_1.txt"), ("doc2", "messy_doc_2.txt")])
class TestReferenceParity:
    def test_fragment_inventory(self, golden, doc_key, fname):
        """Exact span/confidence/format parity with the reference detector."""
        frags = detect_document(_read(fname))
        mine = [(f.format_type, f.start, f.end, round(f.confidence, 4)) for f in frags]
        ref = [
            (g["format_type"], g["start_index"], g["end_index"], g["confidence"])
            for g in golden[doc_key]["fragments"]
        ]
        assert mine == ref

    def test_fragment_invariants(self, golden, doc_key, fname):
        """Reserved-format fragments never overlap each other."""
        from auraverse_etl_pipeline_spark.ingest.detect import RESERVING

        frags = [f for f in detect_document(_read(fname)) if f.format_type in RESERVING]
        spans = sorted((f.start, f.end) for f in frags)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2, f"overlap: ({s1},{e1}) vs ({s2},{e2})"

    def test_records(self, golden, doc_key, fname):
        """Normalized record parity (modulo the YAML upgrade: the
        reference drops YAML_FRONTMATTER records, we keep them)."""
        frags = detect_document(_read(fname))
        mine = []
        for f in frags:
            data = normalize_fragment(f.format_type, f.text, f.meta)
            if data is not None and f.format_type != "YAML_FRONTMATTER":
                mine.append({"format": f.format_type, "start": f.start, "end": f.end, "data": data})
        assert mine == golden[doc_key]["records"]

    def test_merged_document(self, golden, doc_key, fname):
        assert convert_document(_read(fname)) == golden[doc_key]["merged"]


def test_cli_convert_byte_parity_with_reference_golden(tmp_path):
    """BYTE-level regression oracle: the reference repo commits its own
    converter output (``input_parsed2.json`` — ``script.py:555-573``
    run on ``input.txt``, serialized with ``json.dump(indent=2,
    ensure_ascii=False)`` and no trailing newline). Our CLI ``convert``
    on the identical input must reproduce that file byte-for-byte —
    key order, nesting, ``@type`` retention, all of it. The documented
    N9 deviation (no greedy ``\\{.*\\}`` merge) does not surface on this
    input, so no masking is needed; if it ever does, pin it here
    explicitly rather than widening the comparison."""
    from auraverse_etl_pipeline_spark.cli import main

    src = tmp_path / "input.txt"
    src.write_text(_read("messy_doc_1.txt"), encoding="utf-8")
    out = tmp_path / "out.json"
    assert main(["convert", str(src), str(out)]) == 0
    got = out.read_bytes()
    ref = (
        open(os.path.join(FIXTURES, "input_parsed2.reference.json"), "rb").read()
    )
    assert got == ref


def test_cli_convert_byte_parity_input2(tmp_path):
    """Second byte-parity oracle: the reference converter run on its
    ``input2.txt`` fixture (output captured by executing the reference
    ``script.py`` — same ``json.dump(indent=2, ensure_ascii=False)``
    serialization, no trailing newline — and committed as
    ``input2_parsed2.reference.json``). Notably the documented N9
    greedy-merge bug produces ``warranty_period: 2`` (the ``2 years``
    string folded to an integer) on this input and our section pipeline
    arrives at the same value through its own KV coercion, so full byte
    parity holds with no deviation mask."""
    from auraverse_etl_pipeline_spark.cli import main

    src = tmp_path / "input2.txt"
    src.write_text(_read("messy_doc_2.txt"), encoding="utf-8")
    out = tmp_path / "out2.json"
    assert main(["convert", str(src), str(out)]) == 0
    got = out.read_bytes()
    ref = (
        open(os.path.join(FIXTURES, "input2_parsed2.reference.json"), "rb").read()
    )
    assert got == ref


def test_merged_matches_reference_committed_golden():
    """The reference repo commits its own golden output
    (``input_parsed2.json`` = script.py run on input.txt); we must
    reproduce it byte-for-byte at the dict level."""
    expected = {
        "name": "Widget A",
        "image": [
            "https://example.com/images/widget-a-1.jpg",
            "https://example.com/images/widget-a-2.jpg",
        ],
        "description": "A versatile widget for the modern home.",
        "sku": "WA-1001",
        "offers": {
            "priceCurrency": "USD",
            "price": "9.99",
            "availability": "http://schema.org/InStock",
            "url": "https://example.com/product/widget-a",
        },
    }
    got = convert_document(_read("messy_doc_1.txt"))
    assert got["offers"]["@type"] == "Offer"  # nested @ keys survive
    got["offers"].pop("@type")
    assert got == expected


def test_yaml_records_are_an_upgrade():
    frags = detect_document(_read("messy_doc_2.txt"))
    yaml = [f for f in frags if f.format_type == "YAML_FRONTMATTER"]
    assert len(yaml) == 1
    data = normalize_fragment("YAML_FRONTMATTER", yaml[0].text, {})
    assert data.get("source_url", "").startswith("https://")


def test_detector_never_crashes_on_garbage():
    nasty = [
        "",
        "{",
        "}" * 100,
        '{"a": ' * 5000,
        "<table><tr><td>x",
        "\x00\x01\x02",
        "a,b\n" * 500,
        "k: v\n" * 500,
        "--- \n---\n--- JSON\n{",
        '{"k": "' + "\\" * 99 + '"}',
    ]
    for doc in nasty:
        frags = detect_document(doc)
        for f in frags:
            assert 0.0 <= f.confidence <= 1.0
            assert 0 <= f.start <= f.end <= len(doc)
            data = normalize_fragment(f.format_type, f.text, f.meta)
            json.dumps(data)  # always JSON-serializable


def test_infer_value_type():
    assert infer_value_type(True) == "boolean"
    assert infer_value_type(3) == "integer"
    assert infer_value_type(3.5) == "number"
    assert infer_value_type("2025-01-01") == "date"
    assert infer_value_type("x") == "string"
    assert infer_value_type(None) == "null"


def test_fields_fan_out_lists():
    fields = fields_for_data([{"a": 1}, {"a": None}])
    assert [(f.path, f.type, f.nullable) for f in fields] == [
        ("a", "integer", False),
        ("a", "null", True),
    ]
    nested = fields_for_data({"u": {"n": "x"}, "tags": ["a", "b"]})
    assert {f.path for f in nested} == {"u.n", "tags[0]", "tags[1]"}


def test_spark_pipeline_end_to_end(spark):
    """documents DF → fragments/records/schema_fields/summary DFs."""
    from auraverse_etl_pipeline_spark.ingest.pipeline import (
        detect_fragments,
        extract_records,
        infer_schema_fields,
        summarize_fragments,
    )

    docs = spark.createDataFrame(
        [(1, _read("messy_doc_1.txt")), (2, _read("messy_doc_2.txt"))],
        "doc_id long, text string",
    )
    frags = detect_fragments(docs)
    assert frags.count() == 47
    summary = {r["format_type"]: r["n_fragments"] for r in summarize_fragments(frags).collect()}
    assert summary["RAW_TEXT"] == 22 and summary["JSON"] == 4
    records = extract_records(docs)
    assert records.count() == 24  # 23 reference records + 1 YAML upgrade
    parsed = json.loads(records.filter("format = 'JSON_LD'").head()["data"])
    assert parsed["@type"] == "Product"
    fields = infer_schema_fields(records)
    assert fields.filter("type = 'boolean'").count() == 2


def test_typed_records_infer_and_parse(spark):
    """M4: per-format typed materialization — inferred struct schema,
    every record parsed, heterogeneous fields null-padded."""
    from auraverse_etl_pipeline_spark.ingest.pipeline import extract_records, typed_records
    from auraverse_etl_pipeline_spark.plans.ingest_queries import fixture_documents

    records = extract_records(fixture_documents(spark)).cache()
    typed = typed_records(records, "JSON")
    assert typed.schema["record"].dataType.typeName() == "struct"
    rows = typed.collect()
    assert rows and all(r.record is not None for r in rows)
    # KEY_VALUE records are flat string maps -> struct of strings
    kv = typed_records(records, "KEY_VALUE")
    assert kv.count() > 0


def test_typed_records_degrades_on_hostile_samples(spark):
    """Inference must stay PERMISSIVE-spirited: empty-string data rows
    are excluded from the sample (they would poison schema_of_json over
    the concatenated array), and a sample that defeats inference
    entirely degrades to the raw JSON string instead of raising."""
    from auraverse_etl_pipeline_spark.ingest.pipeline import typed_records

    # empty strings alongside good records: inference must succeed off
    # the good ones and parse them; empty-data rows land as null records
    records = spark.createDataFrame(
        [
            (1, "JSON", 0, 10, '{"a": 1}'),
            (2, "JSON", 0, 10, ""),
            (3, "JSON", 0, 10, '{"a": 2}'),
        ],
        "doc_id long, format string, start long, end long, data string",
    )
    typed = typed_records(records, "JSON")
    assert typed.schema["record"].dataType.typeName() == "struct"
    got = {r.doc_id: r.record for r in typed.collect()}
    assert got[1]["a"] == 1 and got[3]["a"] == 2
    # a format whose sample is pure garbage must not raise — fall back
    # to the raw string column
    garbage = spark.createDataFrame(
        [(1, "JSON", 0, 10, "not json at all"), (2, "JSON", 0, 10, "{{{{")],
        "doc_id long, format string, start long, end long, data string",
    )
    fb = typed_records(garbage, "JSON")
    rows = {r.doc_id: r.record for r in fb.collect()}
    assert isinstance(rows[1], str) or rows[1] is None  # degraded, no crash


def test_ppm_decode_gated_on_image_kind():
    """A non-image payload that happens to start with the P6 magic must
    NOT be reinterpreted as pixels — decode_payload only decodes PPM
    when the declared kind is image."""
    import numpy as np
    import pytest as _pytest

    from auraverse_etl_pipeline_spark.operators.multimodal import (
        decode_payload,
        encode_ppm,
    )

    ppm = encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    maxval, pix = decode_payload(ppm, "image")
    assert pix.shape == (2, 2, 3)
    with _pytest.raises(NotImplementedError):
        decode_payload(ppm, "audio")  # P6-prefixed audio stays undecodable


def test_corpus_scale_multiformat_pipeline(spark):
    """Distributed end-to-end over a SYNTHESIZED 300-doc mixed-format
    corpus (blocks drawn deterministically from the fixture formats):
    the Spark pipeline's per-format fragment counts must equal running
    the detector directly in Python on every document."""
    import random
    from collections import Counter

    import pyspark.sql.functions as F

    from auraverse_etl_pipeline_spark.ingest.detect import detect_document as detect_py
    from auraverse_etl_pipeline_spark.ingest.pipeline import detect_fragments

    blocks = [
        '{"id": %d, "name": "thing-%d"}',
        "k%d: v%d\nport = %d",
        "a,b,c\n%d,%d,%d",
        "<table><tr><th>x</th></tr><tr><td>%d</td></tr></table>",
        "SELECT %d FROM t WHERE id = %d;",
        "var cfg%d = { n: %d };",
        "just some prose about item %d and its %d friends.",
    ]
    rnd = random.Random(7)
    docs = []
    for i in range(300):
        parts = []
        for j in rnd.sample(range(30), rnd.randrange(1, 6)):
            tpl = blocks[j % len(blocks)]
            parts.append(tpl % tuple([i + j] * tpl.count("%d")))
        docs.append((i, "\n\n".join(parts)))

    expected = Counter(
        f.format_type for _, text in docs for f in detect_py(text)
    )
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(8)
    got = Counter(
        {
            r.format_type: r.n
            for r in detect_fragments(df)
            .groupBy("format_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    )
    assert got == expected
    assert len(expected) >= 4, f"corpus too homogeneous: {expected}"


def test_parse_file_full_contract():
    """The library API must honor the reference's documented contract
    INCLUDING the v1-only 'fields' key (the shipped trial scripts crash
    on it against the reference's own v2 - SURVEY §3 EP3)."""
    from auraverse_etl_pipeline_spark.ingest.api import parse_file

    result = parse_file(_read("messy_doc_1.txt"))
    assert set(result) == {"fragments", "summary", "records", "fields"}
    assert sum(result["summary"].values()) == len(result["fragments"])
    assert result["records"] and result["fields"]
    f0 = result["fields"][0]
    assert set(f0) == {"name", "path", "type", "nullable", "example", "confidence"}
    # the trial-script access pattern works
    for fr in result["fragments"][:3]:
        assert fr["end_index"] > fr["start_index"]


def test_convert_file_default_naming(tmp_path):
    from auraverse_etl_pipeline_spark.ingest.api import convert_file

    src = tmp_path / "input.txt"
    src.write_text("--- METADATA\nname: Thing\n", encoding="utf-8")
    merged = convert_file(str(src))
    assert merged["name"] == "Thing"
    out = tmp_path / "input_parsed2.json"
    assert out.exists()
    import json

    assert json.loads(out.read_text())["name"] == "Thing"


def test_warc_parser_framing_gzip_and_strictness():
    """The stdlib WARC parser: multi-record roundtrip incl. multi-byte
    UTF-8 payloads (Content-Length is BYTES — char slicing would
    corrupt every record after the first non-ASCII one), transparent
    gunzip, and strict rejection of malformed framing."""
    import gzip

    import pytest as pt

    from auraverse_etl_pipeline_spark.ingest.warc import (
        build_warc,
        parse_warc,
    )

    payloads = [
        ("http://x/1", "plain ascii".encode()),
        ("http://x/2", "héllo wörld — 中文 текст".encode()),
        ("http://x/3", b""),  # zero-length payload is legal
    ]
    blob = build_warc(payloads)
    recs = parse_warc(blob)
    assert [r["payload"] for r in recs] == [p for _, p in payloads]
    assert [r["headers"]["WARC-Target-URI"] for r in recs] == [u for u, _ in payloads]
    assert all(r["headers"]["WARC-Type"] == "response" for r in recs)
    assert int(recs[1]["headers"]["Content-Length"]) == len(payloads[1][1])

    # gzip transparency, including genuinely CONCATENATED members
    # (CommonCrawl gzips per record; Python's gzip handles multi-member
    # streams and the parser must inherit that)
    assert parse_warc(build_warc(payloads, gzip=True)) == recs
    split = len(blob) // 2
    boundary = blob.rfind(b"\r\n\r\n", 0, split) + 4  # record boundary
    two_members = gzip.compress(blob[:boundary], mtime=0) + gzip.compress(
        blob[boundary:], mtime=0
    )
    assert parse_warc(two_members) == recs

    with pt.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pt.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n")
    truncated = blob[:-10]
    with pt.raises(ValueError):
        parse_warc(truncated)
    # corrupt the trailer of record 1
    bad = blob.replace(b"plain ascii\r\n\r\n", b"plain ascii\r\nX\r\n", 1)
    with pt.raises(ValueError, match="trailer"):
        parse_warc(bad)


def test_documents_to_warc_null_text_fails_loudly(spark):
    """A NULL text column must raise at staging, not silently become a
    zero-byte payload: the roundtrip oracle computes the digest off the
    source column (propagating NULL), so silent coercion would be an
    invisible hash divergence — and in a real run, invisible data loss
    (ADVICE r7)."""
    import pytest as pt

    from auraverse_etl_pipeline_spark.ingest.warc import documents_to_warc

    docs = spark.createDataFrame(
        [(1, "ok"), (2, None)], "doc_id BIGINT, text STRING"
    )
    with pt.raises(Exception, match="NULL text"):
        documents_to_warc(docs, records_per_file=10).collect()
