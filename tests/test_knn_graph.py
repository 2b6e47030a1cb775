"""Mutual-rank kNN graph (J4/G5) tests against hand-computed expectations."""

from pyspark.sql import functions as F

from gpu_entity_resolver_spark.operators.knn_graph import (
    directed_topk_edges,
    mutual_rank_edges,
)

# undirected scored pairs over 4 nodes
PAIRS = [
    (1, 2, 0.9),
    (1, 3, 0.8),
    (1, 4, 0.2),
    (2, 3, 0.7),
    (2, 4, 0.1),
    (3, 4, 0.6),
]


def test_directed_topk(spark):
    df = spark.createDataFrame(PAIRS, "src long, dst long, score double")
    d = directed_topk_edges(df, k=2)
    got = {(r["u"], r["v"]): r["rank"] for r in d.collect()}
    # node 1 neighbors by score: 2 (0.9), 3 (0.8), 4 (0.2) -> top-2 = {2,3}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 2 and (1, 4) not in got
    # node 4 neighbors: 3 (0.6), 1 (0.2), 2 (0.1) -> top-2 = {3,1}
    assert got[(4, 3)] == 1 and got[(4, 1)] == 2 and (4, 2) not in got


def test_mutual_rank_edges(spark):
    df = spark.createDataFrame(PAIRS, "src long, dst long, score double")
    m = {(r["src"], r["dst"]): r["weight"] for r in mutual_rank_edges(df, k=2).collect()}
    # (1,2): rank 1->2 is 1; node 2 neighbors: 1 (0.9), 3 (0.7), 4 (0.1),
    # rank 2->1 is 1 -> mutual, weight = 0.9 / (1+1+2) = 0.225
    assert abs(m[(1, 2)] - 0.225) < 1e-9
    # (1,4): 4 ranks 1 at rank 2, but 1's top-2 excludes 4 -> not mutual
    assert (1, 4) not in m
    # (3,4): 3's neighbors: 1 (0.8), 2 (0.7), 4 (0.6) -> 4 not in 3's top-2
    assert (3, 4) not in m
    assert (1, 3) in m  # 1->3 rank2, 3->1 rank1 -> mutual
