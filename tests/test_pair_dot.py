"""The array_intersect dot product must be BITWISE equal to the
full-iteration probe form it replaced: skipped keys contributed exact +0.0
terms (which never change a finite IEEE accumulator) and array_intersect
preserves vec_a's key order, so surviving products accumulate in the same
order with the same values."""

import random

from pyspark.sql import functions as F

from gpu_entity_resolver_spark.operators.shingles import (
    _DOT_SQL,
    doc_vector_table,
    pair_cosine_vecs,
)

_FULL_ITER_SQL = (
    "aggregate(map_entries(vec_a), 0D, (acc, e) -> acc +"
    " coalesce(cast(element_at(vec_b, e.key) as double), 0D)"
    " * cast(e.value as double))"
)


def _vec(rng, keys):
    return {k: rng.uniform(-1.0, 1.0) for k in keys}


def test_dot_bitwise_parity_adversarial(spark):
    rng = random.Random(11)
    universe = list(range(1, 60))
    rows = []
    for i in range(400):
        ka = rng.sample(universe, rng.randint(0, 20))
        kb = rng.sample(universe, rng.randint(0, 20))
        rows.append((i, _vec(rng, ka), _vec(rng, kb)))
    # targeted shapes: empty/empty, identical, disjoint, subset
    shared = _vec(rng, [1, 2, 3])
    rows += [
        (1000, {}, {}),
        (1001, shared, dict(shared)),
        (1002, {1: 0.5}, {2: 0.5}),
        (1003, {1: 0.25, 2: -0.75}, {2: -0.75}),
    ]
    df = spark.createDataFrame(
        rows, "id long, vec_a map<long,float>, vec_b map<long,float>"
    )
    diff = df.select(
        F.expr(_DOT_SQL).alias("a"), F.expr(_FULL_ITER_SQL).alias("b")
    ).where("a IS DISTINCT FROM b")
    assert diff.count() == 0


def test_pair_cosine_vecs_end_to_end_parity(spark):
    texts = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumped over a lazy dog"),
            (3, "completely unrelated text about spark plans"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, full_t string",
    )
    vecs = doc_vector_table(texts, id_col="doc_id", text_col="full_t")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "src long, dst long"
    )
    got = {
        (r["src"], r["dst"]): r["tfidf_cos"]
        for r in pair_cosine_vecs(pairs, vecs).collect()
    }
    assert abs(got[(1, 4)] - 1.0) < 1e-6  # identical docs -> cosine ~1.0
    assert got[(1, 2)] > got[(1, 3)]  # near-dup beats unrelated
    assert all(v >= 0.0 for v in got.values())
