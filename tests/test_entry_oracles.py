"""Driver-contract mimic: every queries() entry with an oracle_sql() twin
must match DuckDB on row count, column set, and (order-insensitive) values —
the same comparison CORRECTNESS_r{N}.json records.

Runs at sf0.001 for speed (the driver uses sf0.01; the logic is scale-free).
"""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


ORACLE_QUERIES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    spark_pdf = q(spark, sf_dir).toPandas()
    duck_pdf = duck_con(sf_dir).execute(sql).fetchdf()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    a = normalize_frame(spark_pdf)
    b = normalize_frame(duck_pdf)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)
    except AssertionError as e:
        diff = (a != b) & ~(a.isna() & b.isna())
        bad = diff.any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch, first diffs:\n"
            f"spark:\n{a[bad].head(5)}\noracle:\n{b[bad].head(5)}"
        ) from e


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still run and return a stable schema."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    rows_only = [n for n in qs if n not in oracles and n != "resolve_pipeline"]
    for name in rows_only:
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0, name
        assert len(df.columns) > 0, name
