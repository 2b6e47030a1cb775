"""Character-shingle machinery shared by TF-IDF scoring and MinHash blocking.

The reference vectorizes with cuML ``TfidfVectorizer(analyzer='char',
ngram_range=(3,5), sublinear_tf=True)`` (reference resolver.py:329-350,
config.py:57-64). Here the same weighting is computed as a two-pass
DataFrame job producing an exploded ``(doc_id, shingle, w)`` table with
L2-normalized sublinear-TF-IDF weights — pure JVM column math, no Python.

At 100 TB the exploded table is large but shuffle-friendly: every downstream
use (doc-frequency agg, pair-cosine join) is an equi-join/agg on ``shingle``
or ``doc_id``; Catalyst + AQE handle partial aggregation and skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(col_name: str, n_lo: int, n_hi: int) -> Column:
    """Array of all char n-grams for n in [n_lo, n_hi] of a string column.

    Pure SQL higher-order functions: ``transform(sequence(...))`` per width,
    concatenated. Strings shorter than n contribute the whole string once
    (mirrors vectorizer behavior of producing no n-gram; we keep the whole
    string so very short docs still block/score).
    """
    parts = []
    for n in range(n_lo, n_hi + 1):
        parts.append(
            f"CASE WHEN length({col_name}) >= {n} THEN "
            f"transform(sequence(1, length({col_name}) - {n} + 1),"
            f" i -> substring({col_name}, i, {n})) "
            f"ELSE array({col_name}) END"
        )
    return F.expr("concat(" + ", ".join(parts) + ")")


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "norm_text",
    n_lo: int = 3,
    n_hi: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """L2-normalized sublinear TF-IDF weights, exploded one row per
    (doc, shingle). Matches sklearn/cuML formula the reference uses:
    ``w = (1 + ln tf) * (ln((1+N)/(1+df)) + 1)``, then L2 per doc.
    """
    n_docs = docs.count()
    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(char_shingles(text_col, n_lo, n_hi)).alias("shingle"),
    )
    tf = tokens.groupBy("doc_id", "shingle").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("shingle").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    w_raw = (
        tf.join(dfreq, "shingle")
        .withColumn(
            "w_raw",
            (1.0 + F.log(F.col("tf").cast("double")))
            * (F.log((F.lit(float(1 + n_docs))) / (1.0 + F.col("df"))) + 1.0),
        )
    )
    norms = w_raw.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w_raw") * F.col("w_raw"))).alias("l2")
    )
    return (
        w_raw.join(norms, "doc_id")
        .select(
            "doc_id",
            "shingle",
            (F.col("w_raw") / F.col("l2")).alias("w"),
        )
    )


def pair_cosine(
    pairs: DataFrame,
    weights: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Cosine similarity per candidate pair via shared-shingle join:
    ``cos = sum(w_src * w_dst)`` over shingles both docs contain (vectors are
    already L2-normalized). Re-expresses reference utils.py:211-232
    (row-wise TF-IDF cosine) as an equi-join + aggregation.

    Plan shape: pairs × weights on src (explodes by src's shingles), then
    equi-join on (dst, shingle) — both joins are shuffle hash joins on keys
    with bounded fan-out because blocking caps block sizes upstream.
    """
    wa = weights.select(
        F.col("doc_id").alias(src_col),
        "shingle",
        F.col("w").alias("w_a"),
    )
    wb = weights.select(
        F.col("doc_id").alias(dst_col),
        "shingle",
        F.col("w").alias("w_b"),
    )
    return (
        pairs.select(src_col, dst_col)
        .join(wa, src_col)
        .join(wb, [dst_col, "shingle"])
        .groupBy(src_col, dst_col)
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("tfidf_cos"))
    )
