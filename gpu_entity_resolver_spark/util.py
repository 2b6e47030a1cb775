"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition a SMALL under-parallel input up to cluster parallelism.

    The operator pipelines open with per-row map work (vectorized python
    key builds, fingerprint kernels, JVM dot folds) that inherits the scan
    partitioning, and a table under ~128 MB scans as ONE split — the whole
    pre-exchange stage then runs on one core of a 32-core cluster (the
    same failure mode plans/resolve.py's scan-split guard handles for the
    flagship; this is the operator-level analog). A round-robin
    repartition of a provably small input costs one sub-second shuffle
    and restores full parallelism.

    Only fires when the CURRENT partition count is below cluster
    parallelism, so big inputs (the 100 TB regime — thousands of splits)
    pass through untouched, and it never fights an upstream partitioner.
    Row-level results are partition-invariant across the engine (pinned by
    the determinism tests), and sort-before-repartition (Spark default)
    keeps the assignment reproducible under task retry.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target * factor)
    return df
