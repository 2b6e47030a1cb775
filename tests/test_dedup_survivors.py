"""Survivorship selection over near-dup groups (dedup.dedup_survivors)."""

import pytest
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.operators.dedup import (
    dedup_survivors,
    minhash_dedup,
)


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [
            (1, "short"),
            (2, "the much longer text of the pair"),
            (3, "the much longer text of the pai"),  # same group as 2
            (4, "ungrouped loner"),
            (5, None),  # null text, grouped with 6
            (6, "x"),
            (7, "tie"),  # same length as 8 -> min id wins
            (8, "eit"),
        ],
        "doc_id long, text string",
    )
    groups = spark.createDataFrame(
        [(2, 2), (3, 2), (5, 5), (6, 5), (7, 7), (8, 7), (1, 2)],
        "doc_id long, dup_group long",
    )
    return docs, groups


def test_longest_policy(frames, spark):
    docs, groups = frames
    out = {
        r["doc_id"]: r["dup_group"]
        for r in dedup_survivors(docs, groups, policy="longest").collect()
    }
    # group 2 = {1, 2, 3}: doc 2 has the longest text
    # group 5 = {5, 6}: null text -> length 0, doc 6 ("x") wins
    # group 7 = {7, 8}: equal lengths -> min id 7 wins
    assert out == {2: 2, 6: 5, 7: 7, 4: None}


def test_min_id_policy(frames):
    docs, groups = frames
    out = {
        r["doc_id"]: r["dup_group"]
        for r in dedup_survivors(docs, groups, policy="min_id").collect()
    }
    assert out == {1: 2, 5: 5, 7: 7, 4: None}


def test_unknown_policy_raises(frames):
    docs, groups = frames
    with pytest.raises(ValueError):
        dedup_survivors(docs, groups, policy="best_vibes")


def test_composes_with_minhash_dedup(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    groups = minhash_dedup(docs, "doc_id", "text")
    surv = dedup_survivors(docs, groups, policy="longest")
    n_docs = docs.count()
    n_groups = groups.select("dup_group").distinct().count()
    n_members = groups.count()
    # every doc survives except the non-winner group members
    assert surv.count() == n_docs - (n_members - n_groups)
    # exactly one survivor per group, and it is a member of that group
    per_group = surv.where(F.col("dup_group").isNotNull()).groupBy(
        "dup_group"
    ).count()
    assert per_group.where(F.col("count") != 1).count() == 0
    assert (
        surv.where(F.col("dup_group").isNotNull())
        .join(groups, ["doc_id", "dup_group"], "left_anti")
        .count()
        == 0
    )
