"""P1 normalization parity: Spark Column chain vs hand-expected strings
(rules from reference config.py:14-27 + resolver.py:148-176) and vs the
DuckDB-SQL renderer used by the oracle harness."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.functions.normalize import (
    address_key,
    address_key_sql,
    address_score,
    address_score_sql,
    normalize_entity_text,
    normalize_entity_text_sql,
)

CASES = [
    # (input, expected) — expectations hand-derived from the reference rules
    ("Crystal Clean LLC", "crystal clean"),
    ("Crystal-Clean Inc.", "crystal clean"),
    ("Midwest Waste Services", "midwest waste services"),
    ("A & B Trucking Co", "a and b trucking"),
    ("Acme (formerly Ajax) Corp", "acme"),
    ("Old Name Inc DBA New Name", "new name"),
    ("Jones Mfg", "jones manufacturing"),
    ("Quality Svcs Group", "quality service"),
    ("Best Equip Rental 2", "best equipment rental"),
    ("  Spaced   Out  ", "spaced out"),
    (None, ""),
    ("ACME+SONS", "acme and sons"),
    ("Natl Auto Ctr", "national automotive center"),
]


def test_normalize_expected(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "name string")
    out = df.select(normalize_entity_text(F.col("name")).alias("n")).collect()
    for (inp, want), row in zip(CASES, out):
        assert row["n"] == want, f"{inp!r}: got {row['n']!r} want {want!r}"


def test_normalize_duckdb_parity(spark):
    """The SQL renderer must agree byte-for-byte with the Spark renderer —
    this is what keeps the driver's value-hash comparison green."""
    df = spark.createDataFrame([(c[0],) for c in CASES], "name string")
    spark_out = [
        r["n"]
        for r in df.select(normalize_entity_text(F.col("name")).alias("n")).collect()
    ]
    con = duckdb.connect()
    sql_expr = normalize_entity_text_sql("name")
    duck_out = []
    for inp, _ in CASES:
        v = con.execute(
            f"select {sql_expr} from (select ?::varchar as name)", [inp]
        ).fetchone()[0]
        duck_out.append(v)
    assert spark_out == duck_out


ADDR_CASES = [
    ("123", "Main St", "Rockford", "IL", "61101"),
    ("", "Oak Ave", "Hoffman Estates", "ILL", "601"),
    (None, None, "Chicago", "IL", "60601"),
    ("9", "Elm", "", "I", "ABCDE"),
]


def test_address_key_and_score(spark):
    df = spark.createDataFrame(
        ADDR_CASES, "num string, name string, city string, state string, zip string"
    )
    out = df.select(
        address_key(
            F.col("num"), F.col("name"), F.col("city"), F.col("state"), F.col("zip")
        ).alias("key"),
        address_score(
            F.col("num"), F.col("name"), F.col("city"), F.col("state"), F.col("zip")
        ).alias("score"),
    ).collect()
    assert out[0]["key"] == "123 main st rockford il 61101"
    assert out[0]["score"] == 6  # name(2)+num+city+state+zip
    assert out[1]["score"] == 3  # name(2)+city(1); state len 3, zip len 3, num empty
    assert out[2]["score"] == 3  # city + state + zip
    assert out[3]["score"] == 3  # name(2) + num(1); city empty, state len1, zip non-digit


def test_address_sql_parity():
    con = duckdb.connect()
    key_sql = address_key_sql("num", "name", "city", "state", "zip")
    score_sql = address_score_sql("num", "name", "city", "state", "zip")
    for case in ADDR_CASES:
        row = con.execute(
            f"select {key_sql} as k, {score_sql} as s from (select "
            '?::varchar as num, ?::varchar as "name", ?::varchar as city, '
            "?::varchar as state, ?::varchar as zip)",
            list(case),
        ).fetchone()
        assert row is not None
