"""Auraverse ETL Pipeline — PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of
``Atharv1507/Auraverse-ETL-Pipeline`` (reference surveyed in SURVEY.md):

- ``ingest``    — messy-document ETL: fragment detection, per-format
  normalization, schema inference, merged-document conversion
  (the reference's core surface, re-expressed as DataFrame pipelines).
- ``functions`` — scalar column functions (type coercion, key cleaning,
  entity extraction, text analysis) built on ``pyspark.sql.functions``.
- ``operators`` — large-scale data-pipeline operators: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard), similarity search, as-of and
  range joins, sessionization, multimodal column plumbing.
- ``plans``     — the relational analytics query library (joins, aggs,
  windows, rollup/cube, set ops) with DuckDB oracle SQL twins.
- ``sources``   — table loaders / writers for the parquet star schema and
  whole-file text document corpora.
- ``streaming`` — Structured Streaming pipelines over the events shape.

Everything is declarative DataFrame/SQL so Catalyst/Tungsten handle
pushdown, pruning, join selection and codegen; Python only runs inside
Arrow-batched pandas UDFs where Spark lacks a primitive (per-document
fragment detection, HTML parsing, CSV sniffing).
"""

from auraverse_etl_pipeline_spark.ingest.api import convert_file, parse_file
from auraverse_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark", "parse_file", "convert_file"]
__version__ = "0.1.0"
