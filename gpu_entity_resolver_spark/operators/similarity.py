"""Similarity search over an embedding column (array<float>).

Two strategies, per the build brief:
- brute-force cosine top-k: exact baseline. The query set is small and
  broadcast; the corpus streams through one pass; per-row dot products are
  JVM higher-order functions (no Python); top-k via window rank.
- IVF-style bucketed top-k: corpus assigned to the nearest of C seeded
  centroids (deterministic sample); queries probe the nearest ``n_probe``
  centroids. Turns the scan into an equi-join on centroid id — the scale
  path (at 10^12 rows the brute-force scan is one full pass per query
  batch; IVF reads only ~n_probe/C of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(vec_a: str, vec_b: str):
    dot = F.expr(
        f"aggregate(zip_with({vec_a}, {vec_b}, (x, y) -> cast(x as double) * y), "
        "0D, (acc, v) -> acc + v)"
    )
    na = F.expr(f"sqrt(aggregate({vec_a}, 0D, (acc, x) -> acc + cast(x as double) * x))")
    nb = F.expr(f"sqrt(aggregate({vec_b}, 0D, (acc, x) -> acc + cast(x as double) * x))")
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors: (query_id, neighbor_id, rank).

    ``queries`` must be small (broadcast); excludes self-matches. Rank ties
    break on neighbor id ascending (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cosine("qv", "cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: IVF with deterministic sampled centroids.

    Centroids are the vectors whose ids hash lowest (a seeded, data-
    independent sample — stable across parallelism). Corpus rows index to
    their single nearest centroid; queries probe ``n_probe`` nearest
    centroid lists. Returns (query_id, neighbor_id, rank, cosine).
    """
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("cv"))
    cents = (
        c.withColumn("hk", F.xxhash64("nid", F.lit(seed)))
        .orderBy("hk")
        .limit(n_centroids)
        .select(F.col("nid").alias("centroid_id"), F.col("cv").alias("centv"))
    )
    # corpus -> nearest centroid (broadcast centroids; one pass)
    assign_w = Window.partitionBy("nid").orderBy(
        F.desc("csim"), F.asc("centroid_id")
    )
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .select("nid", "cv", "centroid_id", _cosine("cv", "centv").alias("csim"))
        .withColumn("rn", F.row_number().over(assign_w))
        .where(F.col("rn") == 1)
        .select("nid", "cv", "centroid_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("qsim"), F.asc("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "centroid_id", _cosine("qv", "centv").alias("qsim"))
        .withColumn("rn", F.row_number().over(probe_w))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qv", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .where(F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            _cosine("qv", "cv").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
