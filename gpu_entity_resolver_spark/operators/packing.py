"""Sequence packing for LLM training-data preparation.

Groups documents into context-window-sized PACKS — the step between a
deduplicated corpus and a tokenized training shard. At 10^12 docs a true
greedy bin-pack is a sequential scan, so the operator uses the standard
distributed compromise:

- documents land in ``n_buckets`` deterministic buckets keyed on
  ``pmod(doc_id, n_buckets)`` (doc ids are already xxhash64(url), so the
  modulus is uniform; reproducible across runs and parallelism — no
  ``monotonically_increasing_id``, and plain modulus keeps the bucket
  rule replayable in the ANSI-SQL oracle);
- WITHIN a bucket, docs are ordered (token_count desc, doc_id asc) and
  packed by linear running-sum: ``pack = floor((cumsum - tokens) /
  budget)`` — closed-form, one window, no sequential driver loop. A pack
  may overflow by at most one document past ``token_budget`` (training
  loaders split/truncate at the boundary anyway); a doc longer than the
  budget occupies its own pack plus the spill the formula assigns.

Everything is expressible in ANSI SQL, so the driver oracle replays it
exactly (token counts via functions.textstats.token_count_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import token_count


def pack_documents(
    docs: DataFrame,
    token_budget: int = 8192,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, bucket, pack_id) — pack_id is globally unique
    (bucket * 2^32 + local pack ordinal) and deterministic.

    Scale shape: one narrow projection (token counts are a column
    expression), one shuffle on the bucket key, one window per bucket.
    ``n_buckets`` only needs to exceed cluster parallelism; packs never
    cross buckets so bucket count does not change pack QUALITY, only the
    parallelism of the packing pass.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive: {token_budget}")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_buckets)).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    local_pack = F.floor(
        (cum - F.col("n_tokens")) / F.lit(float(token_budget))
    ).cast("long")
    return toks.select(
        "doc_id",
        "n_tokens",
        "bucket",
        (F.col("bucket") * F.lit(1 << 32) + local_pack).alias("pack_id"),
    )
