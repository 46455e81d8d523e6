"""CLI — the reference's two entry points, Spark-backed.

    python -m auraverse_etl_pipeline_spark.cli parse <file_or_glob>
        ≙ ``python etl_parser.py <input.txt>`` (etl_parser.py:1085-1103):
        prints the fragment inventory, per-format summary and record
        count for every matched document.

    python -m auraverse_etl_pipeline_spark.cli convert <input> [output]
        ≙ ``python script.py <input> [output]`` (script.py:540-576):
        writes the merged clean JSON for one document, default output
        name ``<stem>_parsed2.json`` (script.py:558).

Single files run fine on local[*]; the same commands take a glob/dir
and fan out across the cluster — the CLI is a thin driver around the
DataFrame pipeline, exactly the S4 role in SURVEY.md §2.1.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from auraverse_etl_pipeline_spark.session import get_spark


def _docs(spark, path: str):
    from auraverse_etl_pipeline_spark.sources.tables import read_text_corpus

    return read_text_corpus(spark, path)


def cmd_parse(args: argparse.Namespace) -> int:
    from auraverse_etl_pipeline_spark.ingest.pipeline import (
        detect_fragments,
        extract_records,
    )
    from auraverse_etl_pipeline_spark.sources.sinks import fragment_report

    spark = get_spark(app_name="auraverse-parse")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _docs(spark, args.path)
    frags = detect_fragments(docs).cache()
    print(fragment_report(frags))
    n_records = extract_records(docs).count()
    print(f"Normalized {n_records} records from {docs.count()} document(s).")
    return 0


def cmd_convert(args: argparse.Namespace) -> int:
    from auraverse_etl_pipeline_spark.ingest.convert import convert_corpus
    from auraverse_etl_pipeline_spark.sources.sinks import merged_json_pretty

    if not os.path.exists(args.input):
        print(f"error: input not found: {args.input}", file=sys.stderr)
        return 1
    out = args.output or f"{os.path.splitext(args.input)[0]}_parsed2.json"
    spark = get_spark(app_name="auraverse-convert")
    spark.sparkContext.setLogLevel("ERROR")
    rows = merged_json_pretty(convert_corpus(_docs(spark, args.input))).collect()
    if len(rows) == 1:
        with open(out, "w", encoding="utf-8") as fh:
            fh.write(rows[0].pretty)
        print(f"wrote {out}")
    else:  # glob/dir input → one output file per doc_id
        os.makedirs(out, exist_ok=True)
        for r in rows:
            with open(os.path.join(out, f"{r.doc_id}.json"), "w", encoding="utf-8") as fh:
                fh.write(r.pretty)
        print(f"wrote {len(rows)} documents under {out}/")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="auraverse_etl_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("parse", help="detect + normalize; print report")
    pp.add_argument("path")
    pp.set_defaults(fn=cmd_parse)
    pc = sub.add_parser("convert", help="merged clean JSON per document")
    pc.add_argument("input")
    pc.add_argument("output", nargs="?")
    pc.set_defaults(fn=cmd_convert)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
