"""SQL-callable surface parity: the UDTF/UDF/SQL-function registrations
must agree with the DataFrame-API pipeline and column functions."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from auraverse_etl_pipeline_spark.functions.sql_surface import register_sql_surface
from auraverse_etl_pipeline_spark.ingest.pipeline import detect_fragments, extract_records
from auraverse_etl_pipeline_spark.plans.ingest_queries import fixture_documents


@pytest.fixture(scope="module")
def sql_docs(spark):
    register_sql_surface(spark)
    fixture_documents(spark).createOrReplaceTempView("sqldocs")
    return spark


def test_udtf_fragments_match_pipeline(sql_docs, spark):
    got = spark.sql(
        """SELECT d.doc_id, f.format_type, f.start_index, f.end_index, f.confidence
           FROM sqldocs d, LATERAL detect_fragments(d.text) f"""
    )
    want = detect_fragments(fixture_documents(spark)).select(
        "doc_id", "format_type", "start_index", "end_index", "confidence"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_udtf_records_match_pipeline(sql_docs, spark):
    got = spark.sql(
        """SELECT d.doc_id, r.format, r.start, r.end, r.data
           FROM sqldocs d, LATERAL extract_records(d.text) r"""
    )
    want = extract_records(fixture_documents(spark))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_sql_udfs_match_column_functions(sql_docs, spark):
    from auraverse_etl_pipeline_spark.functions.text import (
        avg_token_len,
        content_fingerprint,
        punct_ratio,
        token_count,
    )

    got = spark.sql(
        """SELECT doc_id, token_count(text) AS tc, punct_ratio(text) AS pr,
                  avg_token_len(text) AS atl, content_fingerprint(text) AS fp
           FROM sqldocs"""
    )
    want = fixture_documents(spark).select(
        "doc_id",
        token_count("text").alias("tc"),
        punct_ratio("text").alias("pr"),
        avg_token_len("text").alias("atl"),
        content_fingerprint("text").alias("fp"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_repair_json_udf(sql_docs, spark):
    row = spark.sql("SELECT repair_json('{a: 1,}') AS j").first()
    import json

    assert json.loads(row.j) == {"a": 1}


def test_repair_json_is_native_and_matches_python(sql_docs, spark):
    """repair_json is a pure regexp_replace chain — no Python worker on
    the repair path — and agrees with ingest.normalize.repair_json_text
    on representative broken-JSON shapes."""
    from auraverse_etl_pipeline_spark.ingest.normalize import repair_json_text

    cases = [
        "{a: 1,}",
        "{'k': 'v'}",
        '{"a": [1, 2,], "b": {c: 3,} }',
        "{name: 'x', tags: ['a','b',],}",
        "{a:1, b_2: 'two', c-d: 3}",
        "plain text, no json at all",
        "{nested: {deep: 'q',}, end: 7,}",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    df.createOrReplaceTempView("repair_cases")
    got = spark.sql("SELECT t, repair_json(t) AS j FROM repair_cases")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for r in got.collect():
        assert r.j == repair_json_text(r.t), r.t


def test_grouped_agg_udafs_match_native_exact(spark, sf_dir):
    """median_agg/mad_agg (pandas GROUPED_AGG) must equal the exact
    percentile spellings of the same statistics, digit for digit."""
    from auraverse_etl_pipeline_spark.functions.sql_surface import register_sql_surface
    from auraverse_etl_pipeline_spark.sources.tables import load_table

    register_sql_surface(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udaf_t")
    got = {
        r.source: (r.med, r.mad)
        for r in spark.sql(
            "SELECT source, median_agg(n_chars) AS med, mad_agg(n_chars) AS mad "
            "FROM _docs_udaf_t GROUP BY source"
        ).collect()
    }
    want = {
        r.source: r.med
        for r in spark.sql(
            "SELECT source, percentile(n_chars, 0.5) AS med FROM _docs_udaf_t GROUP BY source"
        ).collect()
    }
    assert set(got) == set(want)
    for src, med in want.items():
        assert got[src][0] == med
        assert got[src][1] >= 0.0


def test_sql_sample_key_and_feature_bucket_match_operators(spark, sf_dir):
    """The SQL spellings must reproduce the engine's deterministic
    decisions exactly: sample_key == sampling.sample_hash, and
    feature_bucket == classifier.token_bucket."""
    from auraverse_etl_pipeline_spark.functions.sql_surface import register_sql_surface
    from auraverse_etl_pipeline_spark.operators.classifier import token_bucket
    from auraverse_etl_pipeline_spark.operators.sampling import sample_hash

    register_sql_surface(spark)
    rows = spark.sql(
        "SELECT sample_key(id) AS k, feature_bucket(CAST(id AS STRING), 97) AS b, id "
        "FROM range(50)"
    ).collect()
    import pyspark.sql.functions as F

    want = {
        r.id: (r.k, r.b)
        for r in spark.range(50)
        .select(
            "id",
            sample_hash("id").alias("k"),
            token_bucket(F.col("id").cast("string"), 97).alias("b"),
        )
        .collect()
    }
    for r in rows:
        assert (r.k, r.b) == want[r.id]


def test_sql_unicode_functions(spark):
    from auraverse_etl_pipeline_spark.functions.sql_surface import register_sql_surface

    register_sql_surface(spark)
    row = spark.sql(
        "SELECT nfc_text('Café') AS nfc, fold_text('CAFÉ') AS folded"
    ).first()
    assert row.nfc == "Café" and row.folded == "cafe"
