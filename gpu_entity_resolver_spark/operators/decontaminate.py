"""Benchmark decontamination for LLM training corpora.

Flags training documents that share any word n-gram (default n=13, the
GPT-3/Pile convention) with a benchmark/eval set, so they can be dropped
before training. Spark-first shape:

- the BENCHMARK side is small by construction (eval sets): its distinct
  n-gram hashes become a broadcast table;
- the CORPUS side explodes its n-gram hashes map-side (same
  transform(sequence(...)) pattern as the char shinglers — pure JVM, no
  Python) and broadcast-semi-joins; only MATCHED rows (rare) reach the
  per-doc aggregation, so nothing corpus-sized ever shuffles;
- tokenization is the whitespace convention of functions.textstats
  (lowercased), n-grams hash with xxhash64 over the space-joined window.

At 100 TB the plan is one corpus scan + a broadcast join — the standard
decontamination pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_gram_hashes(col: Column, n: int) -> Column:
    """xxhash64 over each word n-gram of a text column (lowercase,
    whitespace tokens, space-rejoined windows) as one JVM expression.
    Docs shorter than n words produce an EMPTY array (a sub-n document
    cannot contain a full benchmark n-gram) — guarded explicitly because
    Spark's sequence(1, 0) would count DOWN, not come back empty."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(col, F.lit("")))), r"\s+"),
        lambda x: x != "",
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i, n), " ")),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<bigint>")
    )


def decontaminate_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for EVERY corpus doc: n_hits = how
    many of the doc's word n-gram occurrences appear anywhere in the
    benchmark set; contaminated = n_hits > 0."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    bench_grams = benchmark.select(
        F.explode(word_gram_hashes(F.col(bench_text_col), n)).alias("h")
    ).distinct()
    hits = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_gram_hashes(F.col(text_col), n)).alias("h"),
        )
        .join(F.broadcast(bench_grams), "h", "leftsemi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
