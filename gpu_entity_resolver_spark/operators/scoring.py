"""Batched pairwise scoring inside blocks (SURVEY.md §2.7 V9, north rule).

Three signals per candidate pair, combined by configurable weights (the
reference's stream energy proportions become score weights — SURVEY.md V6):

- TF-IDF char-shingle cosine — pure JVM equi-join + agg (shingles.pair_cosine),
  re-expressing reference utils.py:211-232;
- Jaro-Winkler — Arrow-batched pandas UDF over the numpy kernel
  (functions/simfns.py), no per-row Python;
- Levenshtein ratio — Spark's built-in JVM ``levenshtein`` with threshold
  early-exit, stays inside whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import ScoringConfig
from ..functions.simfns import jaro_winkler
from .shingles import pair_cosine, tfidf_weights


def make_jw_udf(max_chars: int = 64):
    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(jaro_winkler(a, b, max_chars=max_chars))

    return jw


def content_sketch(col, seg: int):
    """Bounded representative of a document for edit-distance scoring:
    first ``seg`` + middle ``seg`` + last ``seg`` characters (the whole
    string when it is shorter than 3*seg). Prefix-only truncation collapses
    documents sharing a long common prefix into spurious distance-0 pairs;
    the three-segment sketch keeps per-pair edit cost O(seg²) regardless of
    document size without that failure mode."""
    n = F.length(col)
    mid_start = (n / 2).cast("int") - (seg // 2)
    return F.when(n <= 3 * seg, col).otherwise(
        F.concat(
            F.substr(col, F.lit(1), F.lit(seg)),
            F.substr(col, mid_start, F.lit(seg)),
            F.substr(col, n - seg + 1, F.lit(seg)),
        )
    )


def score_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "norm_text",
    cfg: ScoringConfig | None = None,
) -> DataFrame:
    """Score candidate pairs; returns (src, dst, tfidf_cos, jw, lev_ratio,
    score). ``pairs`` has (src, dst); ``docs`` has (id_col, text_col).

    TF-IDF cosine sees the FULL normalized text (linear cost, pruned
    vectors); JW/Levenshtein see the content sketch (bounded quadratic)."""
    cfg = cfg or ScoringConfig()
    seg = cfg.sketch_chars
    texts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("full_t"),
        content_sketch(F.col(text_col), seg).alias("t"),
    )

    # Phase 1 — TF-IDF cosine for ALL candidate pairs (linear, JVM-only).
    weights = tfidf_weights(
        texts, id_col="doc_id", text_col="full_t",
        n_lo=cfg.tfidf_ngram_lo, n_hi=cfg.tfidf_ngram_hi, min_df=cfg.tfidf_min_df,
    )
    # Barrier: cos feeds both the survivors branch and the pruned branch.
    cos = pair_cosine(pairs, weights, top_k=cfg.tfidf_top_k).localCheckpoint(
        eager=False
    )

    # Phase 2 — JW + Levenshtein only for pairs passing the cosine
    # prefilter. This is the reference's centroid-prefilter pattern
    # (utils.py:602-621) applied to edit distances: on web corpora the
    # overwhelming majority of candidate pairs have near-zero shingle
    # cosine and cannot be duplicates; skipping their quadratic edit
    # kernels is the dominant scoring cost lever. Pairs below the
    # prefilter keep score = tfidf share only (by construction < tau).
    survivors = cos.where(F.col("tfidf_cos") >= cfg.cosine_prefilter)
    sketches = texts.select("doc_id", "t")
    with_texts = (
        survivors
        .join(sketches.withColumnsRenamed({"doc_id": "src", "t": "t_a"}), "src")
        .join(sketches.withColumnsRenamed({"doc_id": "dst", "t": "t_b"}), "dst")
    )
    max_len = F.greatest(F.length("t_a"), F.length("t_b"), F.lit(1))
    # levenshtein(threshold=...) returns -1 when distance exceeds the
    # threshold. Sketches are <= 3*seg chars so that can't happen today, but
    # guard the sentinel explicitly: a future sketch-length change would
    # otherwise silently yield lev_ratio > 1 for the most dissimilar pairs.
    lev_raw = F.levenshtein("t_a", "t_b", 3 * seg)
    lev = F.least(
        F.when(lev_raw < 0, max_len.cast("int")).otherwise(lev_raw),
        max_len.cast("int"),
    )
    jw_udf = make_jw_udf(max_chars=3 * seg)
    scored = with_texts.select(
        "src",
        "dst",
        "tfidf_cos",
        (1.0 - lev / max_len).alias("lev_ratio"),
        jw_udf("t_a", "t_b").alias("jw"),
    )

    total_w = cfg.tfidf_weight + cfg.jaro_winkler_weight + cfg.levenshtein_weight
    full = scored.withColumn(
        "score",
        (
            cfg.tfidf_weight * F.col("tfidf_cos")
            + cfg.jaro_winkler_weight * F.col("jw")
            + cfg.levenshtein_weight * F.col("lev_ratio")
        )
        / F.lit(total_w),
    )
    pruned = (
        cos.where(F.col("tfidf_cos") < cfg.cosine_prefilter)
        .select(
            "src",
            "dst",
            "tfidf_cos",
            F.lit(None).cast("double").alias("lev_ratio"),
            F.lit(None).cast("double").alias("jw"),
            (cfg.tfidf_weight * F.col("tfidf_cos") / F.lit(total_w)).alias("score"),
        )
    )
    return full.unionByName(pruned)


def edges_above_threshold(scores: DataFrame, threshold: float) -> DataFrame:
    """G2 edge-list build: thresholded, self-loop-free (reference
    utils.py:282-311)."""
    return scores.where(
        (F.col("score") >= threshold) & (F.col("src") != F.col("dst"))
    ).select("src", "dst", "score")
