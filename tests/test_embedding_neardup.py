"""Banded-multiprobe hyperplane LSH must find planted embedding near-dups
with full recall and exact-cosine precision (threshold semantics)."""

import numpy as np
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.operators.dedup import embedding_neardup_pairs


def _corpus(spark, n=60, dim=32, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    rows = []
    for i in range(n):
        rows.append((i, [float(x) for x in base[i]]))
    # planted near-dups: tiny rotation-mix, cosine ~0.995
    for i in range(n):
        v = base[i] + 0.1 * np.roll(base[i], -17)
        rows.append((i + 1000000, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planted_neardups_found_with_full_recall(spark):
    corpus = _corpus(spark)
    got = {
        (r.src, r.dst)
        for r in embedding_neardup_pairs(corpus, threshold=0.95).collect()
    }
    planted = {(i, i + 1000000) for i in range(60)}
    missing = planted - got
    assert not missing, f"LSH missed planted pairs: {sorted(missing)[:5]}"


def test_no_false_positives_below_threshold(spark):
    corpus = _corpus(spark)
    out = embedding_neardup_pairs(corpus, threshold=0.95)
    assert out.where(F.col("cosine") < 0.95).count() == 0
    # random 32-dim gaussians don't collide at 0.95: everything found is planted
    extras = out.where(
        ~((F.col("dst") - F.col("src")) == 1000000)
    ).count()
    assert extras == 0
