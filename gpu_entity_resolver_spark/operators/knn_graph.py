"""Mutual-rank kNN graph (SURVEY.md §2.3 J4, §2.8 G5).

The reference builds a directed kNN graph over embeddings, keeps only
reciprocal edges via a swapped self-join, and weights them by
``1/(rank_i + rank_j + 2) * mean cosine`` (reference utils.py:400-469).
Here the same construction runs over any scored pair list (from blocking +
scoring), entirely relational: per-source rank window, swapped self-join,
weight arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def directed_topk_edges(
    scored: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    score: str = "score",
) -> DataFrame:
    """Directed kNN edges from an undirected scored pair list: both
    orientations, rank per source by score desc (ties: dst asc)."""
    both = scored.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(score).alias("s")
    ).unionByName(
        scored.select(
            F.col(dst).alias("u"), F.col(src).alias("v"), F.col(score).alias("s")
        )
    )
    w = Window.partitionBy("u").orderBy(F.desc("s"), F.asc("v"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def mutual_rank_edges(
    scored: DataFrame,
    k: int = 15,
    src: str = "src",
    dst: str = "dst",
    score: str = "score",
) -> DataFrame:
    """Reciprocal kNN edges with the reference's rank weight:
    (src, dst, weight) where weight = mean(s) / (rank_uv + rank_vu + 2)
    ... mirroring utils.py:430-468 (swapped self-join keeps only pairs
    ranked within k from BOTH endpoints)."""
    d = directed_topk_edges(scored, k, src, dst, score)
    fwd = d.select("u", "v", F.col("s").alias("s_f"), F.col("rank").alias("r_f"))
    rev = d.select(
        F.col("v").alias("u"),
        F.col("u").alias("v"),
        F.col("rank").alias("r_b"),
    )
    mutual = fwd.join(rev, ["u", "v"])
    return (
        mutual.where(F.col("u") < F.col("v"))
        .select(
            F.col("u").alias(src),
            F.col("v").alias(dst),
            (
                F.col("s_f") / (F.col("r_f") + F.col("r_b") + 2.0)
            ).alias("weight"),
        )
    )
