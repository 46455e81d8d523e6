"""Sources: parquet star-schema tables and whole-file text corpora.

Reference parity: the reference's only source is a whole-file UTF-8 read
(``etl_parser.py:1093-1094``, ``script.py:561-563``). Here that becomes
(a) ``read_text_corpus`` — ``spark.read.text(..., wholetext=True)`` with
one row per file, and (b) the driver-provided ``documents`` parquet
table for corpus scale. The relational tables are the TPC-H-ish star
schema from TESTDATA.md.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: All driver-generated tables (one parquet file each per SF dir).
TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table. Plain parquet scan — column pruning
    and predicate pushdown are Catalyst's job once the caller filters.

    ``events.ts`` has shipped in two parquet layouts across testdata
    generations: TIMESTAMP(NANOS) — which Spark's reader rejects unless
    read as raw nanos via the legacy conf, then converted with exact
    integer math (``DIV``, since a double roundtrip loses precision
    above 2^53 ns) — and plain TIMESTAMP(MICROS), which arrives as
    TIMESTAMP_NTZ. Normalize both to session TimestampType so every
    downstream plan (and the DuckDB oracle twin) sees one type.
    """
    # Runtime SQL conf; set on the caller's session so this works even
    # when the driver owns the SparkSession.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        if dict(df.dtypes)["ts"] == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries run
    against the same names the DuckDB oracle uses."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file text source → ``(doc_id, source, text)``.

    One row per file (the reference's unit of work). ``doc_id`` is a
    deterministic hash of the file path so it is stable across runs and
    partition layouts — monotonically_increasing_id would not be.
    """
    raw = spark.read.text(path, wholetext=True)
    raw = raw.withColumn("source", F.input_file_name())
    return raw.select(
        F.xxhash64("source").alias("doc_id"),
        "source",
        F.col("value").alias("text"),
    )


def write_jsonl_corpus(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Stage a document table as JSON Lines — the interchange format
    LLM corpora actually ship in (one JSON object per line, splittable,
    appendable, schema-on-read). Spark's native json sink: no Python in
    the write path, one file per partition."""
    df.write.mode(mode).json(path)


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read a JSON Lines corpus with an EXPLICIT schema when given.

    Passing the schema matters twice at 100 TB: it skips Spark's
    whole-dataset inference pre-pass (a full extra read), and it pins
    types against drift — a corpus shard where every ``doc_id`` happens
    to fit in int32, or a ``text`` field that is null throughout,
    must not change the table's schema. Without ``schema`` this falls
    back to inference (interactive use)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
