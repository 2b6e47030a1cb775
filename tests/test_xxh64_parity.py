"""Bit parity of the numpy XXH64 primitives with Spark's xxhash64.

The zero-shuffle MinHash key builder depends on these being EXACT: any
mismatch would silently change blocking keys (and so candidate pairs) of
every LSH consumer. Randomized inputs cover the full signed-long range.
"""

import numpy as np
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.functions.xxh64 import (
    xxh64_bytes,
    xxhash64_long_array_int,
    xxhash64_long_int,
)


def _rand_longs(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_long_int_parity(spark):
    vals = _rand_longs(500, 1)
    df = spark.createDataFrame(
        [(int(v), int(p)) for v, p in zip(vals, np.arange(500) % 64)],
        "h long, p int",
    )
    got_spark = [
        r.x for r in df.select(F.expr("xxhash64(h, p)").alias("x")).collect()
    ]
    got_np = (
        xxhash64_long_int(vals.view(np.uint64), np.arange(500) % 64)
        .astype(np.uint64)
        .view(np.int64)
    )
    assert got_spark == got_np.tolist()


def test_bytes_parity(spark):
    """xxh64_bytes must equal Spark's xxhash64 over the UTF-8 bytes of a
    string for every tail-length class (0-7 trailing bytes, with/without
    4-byte lane, with/without 8-byte lanes and the >=32-byte stripe loop)
    and for multi-byte UTF-8."""
    import random

    rng = random.Random(3)
    samples = ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
               "abcdefghi", "héllo wörld", "日本語のテキスト", "x" * 31,
               "y" * 32, "z" * 100]
    samples += [
        "".join(chr(rng.randint(32, 600)) for _ in range(rng.randint(0, 80)))
        for _ in range(100)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got_spark = [
        r.x for r in df.select(F.expr("xxhash64(s)").alias("x")).collect()
    ]
    got_py = [
        int(np.uint64(xxh64_bytes(s.encode("utf-8"), 42)).view(np.int64))
        for s in samples
    ]
    assert got_spark == got_py


def test_long_array_int_parity(spark):
    rng = np.random.default_rng(2)
    rows = []
    for i in range(50):
        n = int(rng.integers(1, 12))
        rows.append(([int(v) for v in _rand_longs(n, 100 + i)], i % 8))
    df = spark.createDataFrame(rows, "a array<long>, b int")
    got_spark = [
        r.x for r in df.select(F.expr("xxhash64(a, b)").alias("x")).collect()
    ]
    got_np = [
        int(
            np.uint64(
                xxhash64_long_array_int(
                    np.array(a, dtype=np.int64).view(np.uint64), b
                )
            ).astype(np.uint64).view(np.int64)
        )
        for a, b in rows
    ]
    assert got_spark == got_np
