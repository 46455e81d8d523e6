"""Oracle-parity harness: every registered query with an ``oracle`` SQL
string must produce EXACTLY the DuckDB result (row count, column names,
values) — the same comparison the driver's correctness gate performs,
run here with exact equality rather than a hash so failures are
debuggable."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from auraverse_etl_pipeline_spark.plans.registry import all_queries

QUERIES = all_queries()
ORACLE_QUERIES = sorted(n for n, qd in QUERIES.items() if qd.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, qd in QUERIES.items() if qd.oracle is None)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, dtype-normalized frame."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif s.dtype == object:
            s = s.astype(str)
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            eq = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
        else:
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
        if not eq.all():
            bad = np.nonzero(~eq)[0][:5]
            raise AssertionError(
                f"{name}: column {c!r} mismatch at rows {bad.tolist()}: "
                f"spark={av[bad].tolist()} duck={bv[bad].tolist()}"
            )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck, sf_dir):
    qd = QUERIES[name]
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(qd.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(name, spark, sf_dir):
    """Queries without a SQL oracle must still run and return a stable schema."""
    qd = QUERIES[name]
    df = qd.fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
