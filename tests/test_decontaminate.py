"""Benchmark decontamination (operators/decontaminate.py)."""

import pytest
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.operators.decontaminate import (
    decontaminate_flags,
    word_gram_hashes,
)


def test_gram_hashes_short_doc_empty(spark):
    df = spark.createDataFrame(
        [("one two three",), ("",), (None,)], "text string"
    )
    out = df.select(F.size(word_gram_hashes(F.col("text"), 5)).alias("n"))
    assert [r["n"] for r in out.collect()] == [0, 0, 0]


def test_gram_hashes_window_count_and_case(spark):
    df = spark.createDataFrame([("A b  C d e",)], "text string")
    # 5 tokens, n=3 -> 3 windows; lowercase + whitespace collapse
    hashes = df.select(
        word_gram_hashes(F.col("text"), 3).alias("h")
    ).first()["h"]
    assert len(hashes) == 3
    same = spark.createDataFrame([("a B c D E",)], "text string").select(
        word_gram_hashes(F.col("text"), 3).alias("h")
    ).first()["h"]
    assert hashes == same  # case-insensitive


def test_flags_planted_contamination(spark):
    bench = spark.createDataFrame(
        [("What is the capital of France Paris is the capital city",)],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            # contains a full 7-gram of the benchmark
            (1, "trivia night what is the capital of france paris was fun"),
            (2, "completely unrelated text about spark physical plans"),
            # shares words but no full 7-gram run
            (3, "the capital and france and paris"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate_flags(docs, bench, n=7).collect()
    }
    assert out[1][1] is True and out[1][0] >= 1
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_every_doc_reported(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = spark.createDataFrame(
        [("this benchmark phrase does not appear anywhere at all",)],
        "text string",
    )
    out = decontaminate_flags(docs, bench, n=13)
    assert out.count() == docs.count()
    assert out.where("contaminated").count() == 0


def test_rejects_bad_n(spark):
    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        decontaminate_flags(d, d.select("text"), n=0)
