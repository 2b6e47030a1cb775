"""Cluster-hygiene operators (SURVEY.md §2.9) — the relational stages the
reference runs between clustering and canonical-map building, re-expressed
as joins/windows/aggregations:

- C6 ``consolidate_identical_entities`` (reference resolver.py:702-782)
- C7 ``split_clusters_by``             (reference resolver.py:784-899)
- C5 ``merge_similar_clusters``        (reference resolver.py:542-700)
- C12 invariant checks                 (reference resolver.py:2680-2796)
- S5 ``generate_report``               (reference resolver.py:1289-1385)
- S6 ``review_dataframe``              (reference resolver.py:1233-1287)
- C13 ``assign_new_documents``         (reference resolver.py:1020-1042,
                                        2280-2332 — the transform path)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import ResolverConfig


def consolidate_identical_entities(
    members: DataFrame,
    key_col: str = "norm_text",
    cluster_col: str = "cluster",
) -> DataFrame:
    """C6: if the same entity key appears in more than one cluster, move all
    its rows to the largest cluster (ties: smallest cluster id) — reference
    resolver.py:702-782 semantics, one window pass instead of a Python loop.

    Returns the input with ``cluster`` re-mapped.
    """
    sizes = members.groupBy(cluster_col).agg(F.count("*").alias("_csize"))
    key_winner = (
        members.join(sizes, cluster_col)
        .groupBy(key_col, cluster_col)
        .agg(F.first("_csize").alias("_csize"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key_col).orderBy(
                    F.desc("_csize"), F.asc(cluster_col)
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .select(key_col, F.col(cluster_col).alias("_winner"))
    )
    return (
        members.join(key_winner, key_col, "left")
        .withColumn(cluster_col, F.coalesce("_winner", F.col(cluster_col)))
        .drop("_winner")
    )


def split_clusters_by(
    members: DataFrame,
    split_col: str,
    cluster_col: str = "cluster",
) -> DataFrame:
    """C7: split clusters spanning more than one value of ``split_col``
    (the reference splits on state, resolver.py:850-860; for web pages the
    analog is language). New ids are minted deterministically above the
    current max (reference W3 ngroup pattern, resolver.py:857-859)."""
    multi = (
        members.groupBy(cluster_col)
        .agg(F.countDistinct(split_col).alias("_nv"))
        .where(F.col("_nv") > 1)
        .select(cluster_col)
    )
    # Shuffle-free deterministic id minting: the reference's `max_id + ngroup`
    # (resolver.py:857-859) needs a total order — a single-partition sort at
    # scale. Ids here only need to be unique and deterministic, so mint them
    # as xxhash64 of the (cluster, split value) pair; collision odds with
    # existing hash-derived ids are ~n^2/2^64. Only multi-value clusters are
    # touched.
    new_ids = (
        members.join(multi, cluster_col, "left_semi")
        .select(cluster_col, split_col)
        .distinct()
        .withColumn(
            "_new", F.xxhash64(F.lit("split"), F.col(cluster_col), F.col(split_col))
        )
    )
    return (
        members.join(new_ids, [cluster_col, split_col], "left")
        .withColumn(cluster_col, F.coalesce("_new", F.col(cluster_col)))
        .drop("_new")
    )


def merge_similar_clusters(
    members: DataFrame,
    canon: DataFrame,
    cfg: ResolverConfig | None = None,
    cluster_col: str = "cluster",
) -> DataFrame:
    """C5: merge over-split clusters whose canonical representatives are
    near-identical (reference resolver.py:542-700, thresholds
    config.py:150-169). Candidate canonical pairs come from the same
    blocking machinery; merged components relabel to the smallest member id
    via connected components (replaces the reference's union-find loop,
    utils.py:570-579)."""
    from .blocking import blocking_keys, candidate_pairs
    from .connected_components import connected_components
    from .scoring import score_pairs

    cfg = cfg or ResolverConfig()
    reps = canon.select(
        F.col(cluster_col).alias("doc_id"),
        F.col("canonical_text").alias("norm_text"),
    ).localCheckpoint(eager=False)
    pairs = candidate_pairs(
        blocking_keys(reps, "doc_id", "norm_text", cfg=cfg.blocking), cfg.blocking
    )
    scored = score_pairs(pairs, reps, "doc_id", "norm_text", cfg.scoring)
    merge_edges = scored.where(
        F.col("score") >= cfg.clustering.merge_max_threshold
    ).select("src", "dst")
    if merge_edges.isEmpty():
        return members
    remap = connected_components(merge_edges).withColumnsRenamed(
        {"vertex": cluster_col, "component": "_merged"}
    )
    return (
        members.join(remap, cluster_col, "left")
        .withColumn(cluster_col, F.coalesce("_merged", F.col(cluster_col)))
        .drop("_merged")
    )


def split_by_street_number_range(
    members: DataFrame,
    cluster_col: str = "final_cluster",
    number_col: str = "addr_street_number",
    street_col: str = "addr_street_name",
    zip_col: str = "addr_zip",
    max_range: int = 50,
) -> DataFrame:
    """C7 street-number-range split (reference resolver.py:862-888): a
    (cluster, street, zip) group whose numeric street-number span exceeds
    ``max_range`` (with >1 distinct number) cannot be one site; each distinct
    number is minted into its own cluster (W3 ngroup pattern)."""
    num = F.when(
        F.col(number_col).rlike(r"^[0-9]+$"), F.col(number_col).cast("long")
    )
    grp = (
        members.withColumn("_num", num)
        .groupBy(cluster_col, street_col, zip_col)
        .agg(
            (F.max("_num") - F.min("_num")).alias("_span"),
            F.countDistinct("_num").alias("_nnum"),
        )
        .where((F.col("_span") > max_range) & (F.col("_nnum") > 1))
        .select(cluster_col, street_col, zip_col)
    )
    # Same shuffle-free hash minting as split_clusters_by (no global sort).
    new_ids = (
        members.join(grp, [cluster_col, street_col, zip_col], "left_semi")
        .select(cluster_col, street_col, zip_col, number_col)
        .distinct()
        .withColumn(
            "_new",
            F.xxhash64(
                F.lit("snsplit"),
                F.col(cluster_col),
                F.col(street_col),
                F.col(zip_col),
                F.col(number_col),
            ),
        )
    )
    return (
        members.join(new_ids, [cluster_col, street_col, zip_col, number_col], "left")
        .withColumn(cluster_col, F.coalesce("_new", F.col(cluster_col)))
        .drop("_new")
    )


def number_chain_entities(
    canon: DataFrame,
    name_col: str = "canonical_name",
    cluster_col: str = "final_cluster",
    addr_col: str = "canonical_address",
) -> DataFrame:
    """C8 chain-entity numbering (reference resolver.py:943-1001): when the
    same canonical name belongs to multiple clusters (a chain with several
    locations), number them ' - N' by address order (W2,
    resolver.py:979) so canonical names stay unique."""
    w = Window.partitionBy(name_col).orderBy(
        F.asc_nulls_last(addr_col), F.asc(cluster_col)
    )
    counts = Window.partitionBy(name_col)
    return (
        canon.withColumn("_n", F.count("*").over(counts))
        .withColumn("_i", F.row_number().over(w))
        .withColumn(
            name_col,
            F.when(
                F.col("_n") > 1,
                F.concat(F.col(name_col), F.lit(" - "), F.col("_i").cast("string")),
            ).otherwise(F.col(name_col)),
        )
        .drop("_n", "_i")
    )


# --- invariants (C12) -------------------------------------------------------

def check_no_key_in_two_clusters(
    members: DataFrame, key_col: str = "norm_text", cluster_col: str = "cluster"
) -> int:
    """Reference resolver.py:2702-2725: returns the number of entity keys
    found in more than one cluster (0 = invariant holds)."""
    return (
        members.groupBy(key_col)
        .agg(F.countDistinct(cluster_col).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )


def check_unique_canonical_names(canon: DataFrame) -> int:
    """Reference resolver.py:1007-1015: canonical names must be unique
    across clusters (before chain numbering makes them so)."""
    return (
        canon.groupBy("canonical_text")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )


# --- report / review export (S5, S6) ---------------------------------------

def generate_report(resolved: DataFrame) -> dict:
    """S5: summary statistics dict (reference resolver.py:1289-1385)."""
    row = resolved.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cluster").alias("n_clusters"),
        F.sum(F.when(F.col("cluster_size") == 1, 1).otherwise(0)).alias(
            "n_singletons"
        ),
        F.round(F.avg("confidence_score"), 4).alias("avg_confidence"),
        F.sum(F.col("needs_review").cast("int")).alias("n_needs_review"),
        F.max("cluster_size").alias("max_cluster_size"),
    ).first()
    cat = {
        r["confidence_category"]: r["n"]
        for r in resolved.groupBy("confidence_category")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    reasons = {
        r["reason"]: r["n"]
        for r in resolved.where(F.col("review_reason") != "")
        .select(F.explode(F.split("review_reason", ",")).alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return {
        "n_docs": row["n_docs"],
        "n_clusters": row["n_clusters"],
        "n_singletons": row["n_singletons"],
        "avg_confidence": row["avg_confidence"],
        "n_needs_review": row["n_needs_review"],
        "max_cluster_size": row["max_cluster_size"],
        "confidence_categories": cat,
        "review_reasons": reasons,
    }


def review_dataframe(resolved: DataFrame) -> DataFrame:
    """S6: dedup + sorted review mapping table (reference
    resolver.py:1233-1287)."""
    return (
        resolved.where(F.col("needs_review"))
        .select(
            "norm_text",
            "canonical_text",
            "cluster",
            "confidence_score",
            "review_reason",
        )
        .dropDuplicates(["norm_text", "canonical_text"])
        .orderBy("canonical_text", "norm_text")
    )


# --- transform path (C13) ---------------------------------------------------

def assign_new_documents(
    spark: SparkSession,
    new_docs: DataFrame,
    canon: DataFrame,
    cfg: ResolverConfig | None = None,
) -> DataFrame:
    """C13: assign new documents to existing clusters by blocking + scoring
    against the canonical representatives; unmatched docs become new
    entities (reference transform path, resolver.py:1633-1639).

    ``new_docs``: (doc_id, norm_text); ``canon``: (cluster, canonical_text).
    Returns (doc_id, cluster, match_score, is_new_entity).
    """
    from .blocking import blocking_keys
    from .scoring import score_pairs

    cfg = cfg or ResolverConfig()
    reps = canon.select(
        F.col("cluster").alias("doc_id"), F.col("canonical_text").alias("norm_text")
    )
    combined = new_docs.select("doc_id", "norm_text").unionByName(reps)
    # Block each side separately and equi-join the key tables directly:
    # candidate generation over union(new, reps) would materialize new x new
    # and rep x rep pairs only to discard them with semi-joins — this form
    # produces exactly the (new x rep) pairs at roughly half (often far less)
    # of the pair volume, and can never lose a pair to salt-group splits.
    new_keys = blocking_keys(
        new_docs, "doc_id", "norm_text", cfg=cfg.blocking
    ).withColumnRenamed("doc_id", "new_id")
    rep_keys = blocking_keys(
        reps, "doc_id", "norm_text", cfg=cfg.blocking
    ).withColumnRenamed("doc_id", "rep_id").localCheckpoint(eager=False)
    # Hot-key cap (the cross-table analog of salt_blocks): a block key shared
    # by more than max_block_size reps is a near-useless discriminator and
    # would fan out new_n x rep_n rows — drop it; every doc carries many
    # independent keys so recall loss is bounded.
    hot = (
        rep_keys.groupBy("block_key")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > cfg.blocking.max_block_size)
        .select("block_key")
    )
    nr = (
        new_keys.join(hot, "block_key", "left_anti")
        .join(rep_keys, "block_key")
        .select("new_id", "rep_id")
        .distinct()
    )
    scored = score_pairs(
        nr.select(F.col("new_id").alias("src"), F.col("rep_id").alias("dst")),
        combined,
        "doc_id",
        "norm_text",
        cfg.scoring,
    )
    best = (
        scored.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
            ),
        )
        .where((F.col("_rn") == 1) & (F.col("score") >= cfg.scoring.edge_threshold))
        .select(
            F.col("src").alias("doc_id"),
            F.col("dst").alias("cluster"),
            F.col("score").alias("match_score"),
        )
    )
    return (
        new_docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster", "doc_id").alias("cluster"),
            F.coalesce("match_score", F.lit(0.0)).alias("match_score"),
            F.col("match_score").isNull().alias("is_new_entity"),
        )
    )
