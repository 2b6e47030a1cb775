"""The per-partition document-frequency partials (r6) must aggregate to
EXACTLY the per-doc term-count formulation's frequencies — the broadcast
IDF table (and so every TF-IDF vector) is built from them."""

import random

from pyspark.sql import functions as F

from gpu_entity_resolver_spark.operators.shingles import (
    _doc_term_counts,
    _partition_term_dfs,
)


def _corpus(spark, n_lo_len=0, n_docs=300):
    rng = random.Random(5)
    alphabet = "abcdef ghé"  # incl. a multi-byte char
    texts = ["", "a", "abc", None, "abcd"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(n_lo_len, 80)))
        for _ in range(n_docs)
    ]
    texts += texts[5:15]  # repeated docs: df counts each doc once
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(7)


def _dfs(df):
    return {r.h: r.df for r in df.collect()}


def test_partition_dfs_match_per_doc_counts(spark):
    docs = _corpus(spark)
    for n_lo, n_hi in ((4, 4), (3, 5)):
        got = _dfs(
            _partition_term_dfs(docs, "doc_id", "text", n_lo, n_hi)
            .groupBy("h")
            .agg(F.sum("df").alias("df"))
        )
        want = _dfs(
            _doc_term_counts(docs, "doc_id", "text", n_lo, n_hi)
            .groupBy("h")
            .agg(F.count("*").alias("df"))
        )
        assert got == want
