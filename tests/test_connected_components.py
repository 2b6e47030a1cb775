"""Property tests for the large-star/small-star connected components
(SURVEY.md §5.1: equality with a union-find oracle on random graphs)."""

import random

import pytest

from gpu_entity_resolver_spark.operators.connected_components import (
    connected_components,
)


def union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min vertex id
    comp = {}
    for v in list(parent):
        comp[v] = find(v)
    return comp


def run_case(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        df = df.limit(0)
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = union_find_oracle(edges)
    # oracle roots are min ids because union always keeps the smaller root
    assert got == want, f"mismatch: got={got} want={want}"


def test_empty(spark):
    run_case(spark, [])


def test_single_edge(spark):
    run_case(spark, [(5, 9)])


def test_self_loop_only(spark):
    run_case(spark, [(7, 7)])


def test_chain(spark):
    run_case(spark, [(i, i + 1) for i in range(50)])


def test_star(spark):
    run_case(spark, [(100, i) for i in range(30)])


def test_two_components_and_singleton(spark):
    run_case(spark, [(1, 2), (2, 3), (10, 11), (20, 20)])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_erdos_renyi(spark, seed):
    rng = random.Random(seed)
    n = 300
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randrange(50, 400))
    ]
    run_case(spark, edges)


def test_duplicate_and_reversed_edges(spark):
    run_case(spark, [(1, 2), (2, 1), (1, 2), (3, 2)])
