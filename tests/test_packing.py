"""Sequence packing (operators/packing.py): linear running-sum packing
within deterministic buckets."""

import pytest
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.operators.packing import pack_documents


def test_single_bucket_linear_packing(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * n) for i, n in enumerate([10, 8, 6, 5, 3, 2])],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"])
        for r in pack_documents(
            docs, token_budget=10, n_buckets=1
        ).collect()
    }
    # order: 10, 8, 6, 5, 3, 2 (desc); exclusive cumsum: 0,10,18,24,29,32
    # packs at budget 10: 0, 1, 1, 2, 2, 3
    assert [out[i][1] for i in range(6)] == [0, 1, 1, 2, 2, 3]
    # "tok " * n trims to n tokens
    assert [out[i][0] for i in range(6)] == [10, 8, 6, 5, 3, 2]


def test_budget_overflow_bounded_by_one_doc(spark):
    import random

    rng = random.Random(3)
    docs = spark.createDataFrame(
        [(i, "w " * rng.randint(1, 900)) for i in range(300)],
        "doc_id long, text string",
    )
    budget = 2048
    out = pack_documents(docs, token_budget=budget, n_buckets=4)
    packs = (
        out.groupBy("bucket", "pack_id")
        .agg(F.sum("n_tokens").alias("total"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    for p in packs:
        # linear packing: a pack never exceeds budget + its largest member
        assert p["total"] <= budget + p["mx"]


def test_deterministic_across_partitioning(spark):
    docs = spark.createDataFrame(
        [(i * 7919, "x " * (i % 50 + 1)) for i in range(500)],
        "doc_id long, text string",
    )
    a = pack_documents(docs.repartition(2), 512).toPandas()
    b = pack_documents(docs.repartition(23), 512).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_rejects_bad_budget(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_documents(docs, token_budget=0)
