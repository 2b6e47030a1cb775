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
from ..functions.simfns import jaro_winkler, levenshtein_batch
from .shingles import doc_vector_table, pair_cosine_vecs


def make_jw_udf(max_chars: int = 64):
    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(jaro_winkler(a, b, max_chars=max_chars))

    return jw


def make_lev_udf(max_chars: int):
    """Arrow-batched exact Levenshtein (functions/simfns.levenshtein_batch).

    Replaces Spark's builtin ``levenshtein()`` in the scorer: the builtin
    decodes UTF8 code points cell-by-cell through the full O(L²) DP per
    pair (~530 core-µs at L=144 — measured as the single largest term of
    the scoring stage), while the batch kernel runs the same DP vectorized
    across pairs (~110 core-µs). Distances are bit-equal to the builtin
    (tests/test_levenshtein.py), so every downstream score value is
    unchanged. ``max_chars`` must bound the longest input for that parity —
    the scorer's sketches are <= 3*sketch_chars by construction."""

    @pandas_udf("int")
    def lev(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(levenshtein_batch(a, b, max_chars=max_chars))

    return lev


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
    exact_only: bool = False,
) -> DataFrame:
    """Score candidate pairs; returns (src, dst, tfidf_cos, lev_ratio, jw,
    ph_sim, score). ``pairs`` has (src, dst); ``docs`` has (id_col, text_col).

    ``exact_only=True`` returns ONLY the exact-score rows (jw non-null) —
    row-for-row the same frame as ``score_pairs(...).where(jw IS NOT
    NULL)``, but as one LINEAR plan: the cosine-prefilter prunes and the
    decision-band skips are never unioned in, so the two materialization
    barriers the branching form needs (the cos table feeding
    survivors+pruned, the partial-score table feeding banded+rest) drop
    out, and with them two full intermediate materializations (~5.4M cos
    rows on the bench corpus) and their jobs. Correct for every caller
    whose downstream reads only exact rows: any score >= the band floor
    implies an exact jw (score <= _partial + jw_share), so threshold
    consumers at or above the floor — resolve's edges, assign_new's
    >= edge_threshold winner, merge's >= centroid prefilter — and
    explicit jw-non-null consumers (G8 attachment) see identical rows.
    Callers aggregating over sub-band scores (merge's sampled-member
    median) must keep the default.

    TF-IDF cosine sees the FULL normalized text (linear cost, pruned
    vectors); JW/Levenshtein see the content sketch (bounded quadratic).
    When ``cfg.phonetic_weight > 0`` a fourth signal joins the blend: the
    V2 phonetic term (reference resolver.py:353-369, stream energy 15% per
    config.py:117-124) re-expressed as Metaphone-token-set Jaccard — the
    relational equivalent of the reference's binary CountVectorizer overlap
    on Metaphone text (SURVEY.md §2.7 V2). Metaphone encoding runs once per
    DOC (Arrow-batched UDF); the per-PAIR Jaccard is JVM array set-ops."""
    cfg = cfg or ScoringConfig()
    seg = cfg.sketch_chars
    use_ph = cfg.phonetic_weight > 0
    text_cols = [
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("full_t"),
        content_sketch(F.col(text_col), seg).alias("t"),
    ]
    if use_ph:
        from ..functions.phonetic import metaphone_udf

        text_cols.append(
            F.array_distinct(
                F.filter(
                    F.split(metaphone_udf(F.col(text_col)), " "),
                    lambda x: x != "",
                )
            ).alias("ph")
        )
    texts = docs.select(*text_cols)

    # Phase 1 — TF-IDF cosine for ALL candidate pairs. Doc vectors build
    # map-side against a broadcast IDF table (shingles.doc_vector_table);
    # the dot product is a JVM fold over the two attached vectors.
    vecs = doc_vector_table(
        texts, id_col="doc_id", text_col="full_t",
        n_lo=cfg.tfidf_ngram_lo, n_hi=cfg.tfidf_ngram_hi,
        min_df=cfg.tfidf_min_df, top_k=cfg.tfidf_top_k,
    )
    # Barrier: cos feeds both the survivors branch and the pruned branch —
    # except in exact_only mode, where the pruned branch does not exist and
    # cos flows straight into the survivors filter (single consumer).
    cos = pair_cosine_vecs(pairs, vecs)
    if not exact_only:
        cos = cos.localCheckpoint(eager=False)

    # Phase 2 — JW + Levenshtein only for pairs passing the cosine
    # prefilter. This is the reference's centroid-prefilter pattern
    # (utils.py:602-621) applied to edit distances: on web corpora the
    # overwhelming majority of candidate pairs have near-zero shingle
    # cosine and cannot be duplicates; skipping their quadratic edit
    # kernels is the dominant scoring cost lever. Pairs below the
    # prefilter keep score = tfidf share only (by construction < tau).
    survivors = cos.where(F.col("tfidf_cos") >= cfg.cosine_prefilter)
    side_cols = ["doc_id", "t"] + (["ph"] if use_ph else [])
    sketches = texts.select(*side_cols)
    ren_a = {"doc_id": "src", "t": "t_a"} | ({"ph": "ph_a"} if use_ph else {})
    ren_b = {"doc_id": "dst", "t": "t_b"} | ({"ph": "ph_b"} if use_ph else {})
    with_texts = (
        survivors
        .join(sketches.withColumnsRenamed(ren_a), "src")
        .join(sketches.withColumnsRenamed(ren_b), "dst")
    )
    if use_ph:
        uni = F.size(F.array_union("ph_a", "ph_b"))
        ph_sim = F.when(
            uni > 0,
            F.size(F.array_intersect("ph_a", "ph_b")).cast("double") / uni,
        ).otherwise(F.lit(0.0))
    else:
        ph_sim = F.lit(None).cast("double")
    max_len = F.greatest(F.length("t_a"), F.length("t_b"), F.lit(1))
    # Batched numpy Levenshtein (bit-equal to the JVM builtin it replaced —
    # make_lev_udf). Materialized as a column FIRST so the expression below
    # references the UDF output exactly once (the optimizer may duplicate a
    # UDF referenced from several sub-expressions, guide §4.4). The kernel
    # never returns -1; the sentinel guard is kept because a caller passing
    # longer-than-sketch texts would truncate, and clamping at max_len is
    # the safe direction (same rationale as the old threshold sentinel).
    with_texts = with_texts.withColumn(
        "_lev_raw", make_lev_udf(3 * seg)("t_a", "t_b")
    )
    lev_raw = F.col("_lev_raw")
    lev = F.least(
        F.when(lev_raw < 0, max_len.cast("int")).otherwise(lev_raw),
        max_len.cast("int"),
    )
    jw_udf = make_jw_udf(max_chars=3 * seg)
    total_w = (
        cfg.tfidf_weight
        + cfg.jaro_winkler_weight
        + cfg.levenshtein_weight
        + cfg.phonetic_weight
    )
    ph_term = cfg.phonetic_weight * F.coalesce(F.col("ph_sim"), F.lit(0.0))
    if cfg.jw_decision_band is None:
        scored = with_texts.select(
            "src",
            "dst",
            "tfidf_cos",
            (1.0 - lev / max_len).alias("lev_ratio"),
            jw_udf("t_a", "t_b").alias("jw"),
            ph_sim.alias("ph_sim"),
        )
        full = scored.withColumn(
            "score",
            (
                cfg.tfidf_weight * F.col("tfidf_cos")
                + cfg.jaro_winkler_weight * F.col("jw")
                + cfg.levenshtein_weight * F.col("lev_ratio")
                + ph_term
            )
            / F.lit(total_w),
        )
        if exact_only:
            return full
    else:
        # Phase 2b — decision-band JW. The partial (tfidf + lev) score is
        # pure JVM; the memory-bandwidth-bound numpy JW kernel is SKIPPED
        # only on the LOW side: pairs whose partial score cannot reach `lo`
        # even with a perfect JW (true score provably < lo). That side is
        # where the candidate volume lives (sub-threshold garbage pairs);
        # the high side (partial >= hi) IS computed, because confident
        # pairs flow into mean/median/rank consumers — attach_singletons'
        # neighbor means, merge_similar_clusters' interpolated median,
        # mutual-rank orderings, avg_pair_score -> confidence — and those
        # need exact values, not a jw-as-0 underreport. Every threshold
        # comparison at or above `lo` is exactly invariant; skipped pairs
        # report score = partial with jw null (same convention as the
        # cosine prefilter branch below) and can only be underreported,
        # never overreported. `hi` is kept in the config for consumers
        # that want to reason about the band, but no longer gates the
        # kernel.
        lo, _hi = cfg.jw_decision_band
        jw_share = cfg.jaro_winkler_weight / total_w
        base = with_texts.select(
            "src",
            "dst",
            "tfidf_cos",
            (1.0 - lev / max_len).alias("lev_ratio"),
            ph_sim.alias("ph_sim"),
            "t_a",
            "t_b",
        ).withColumn(
            "_partial",
            (
                cfg.tfidf_weight * F.col("tfidf_cos")
                + cfg.levenshtein_weight * F.col("lev_ratio")
                + ph_term
            )
            / F.lit(total_w),
        )
        if not exact_only:
            # barrier: both branches read the joined+lev'd table once
            base = base.localCheckpoint(eager=False)
        need_jw = F.col("_partial") + F.lit(jw_share) >= F.lit(lo)
        out_cols = ["src", "dst", "tfidf_cos", "lev_ratio", "jw", "ph_sim", "score"]
        banded = (
            base.where(need_jw)
            .withColumn("jw", jw_udf("t_a", "t_b"))
            .withColumn(
                "score",
                F.col("_partial")
                + F.lit(jw_share) * F.col("jw"),
            )
            .select(*out_cols)
        )
        if exact_only:
            return banded
        rest = (
            base.where(~need_jw)
            .withColumn("jw", F.lit(None).cast("double"))
            .withColumn("score", F.col("_partial"))
            .select(*out_cols)
        )
        full = banded.unionByName(rest)
    pruned = (
        cos.where(F.col("tfidf_cos") < cfg.cosine_prefilter)
        .select(
            "src",
            "dst",
            "tfidf_cos",
            F.lit(None).cast("double").alias("lev_ratio"),
            F.lit(None).cast("double").alias("jw"),
            F.lit(None).cast("double").alias("ph_sim"),
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
