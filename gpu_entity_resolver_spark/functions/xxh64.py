"""Vectorized XXH64 primitives matching Spark's ``xxhash64`` expression.

Spark's ``xxhash64(c1, c2, ...)`` folds its children left to right starting
from seed 42: the running hash after child i becomes the SEED for child
i+1. Per-type steps (org.apache.spark.sql.catalyst.expressions.XXH64):

- long child:   ``hashLong(value, seed)``
- int child:    ``hashInt(value, seed)``
- array child:  elements folded element-wise with the running hash
                (a long array folds through ``hashLong`` per element)

These numpy re-implementations are used by the zero-shuffle MinHash key
builder (operators/blocking.py): the JVM computes the per-shingle string
hashes (``xxhash64(shingle, seed)`` — string hashing stays in the JVM), and
the permutation/band math — pure long/int hashing — runs vectorized here.
Bit parity with the JVM is pinned by tests/test_xxh64_parity.py; every
operation is uint64 with wraparound, matching Java's long arithmetic.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

_SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long(value, seed) -> np.ndarray:
    """XXH64.hashLong: one 8-byte lane. ``value``/``seed`` may each be a
    uint64 scalar or array (numpy broadcasting applies)."""
    value = np.asarray(value, dtype=np.uint64)
    seed = np.asarray(seed, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the semantics
        h = seed + _P5 + np.uint64(8)
        h = h ^ (_rotl(value * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def hash_int(value, seed) -> np.ndarray:
    """XXH64.hashInt: one 4-byte lane (int child of ``xxhash64``)."""
    value = np.asarray(value, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
    seed = np.asarray(seed, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the semantics
        h = seed + _P5 + np.uint64(4)
        h = h ^ (value * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)


def xxhash64_long_int(value, i) -> np.ndarray:
    """``xxhash64(longCol, intLiteral)`` — e.g. the MinHash permutation
    hash ``xxhash64(h, p)``: hashLong with the Spark seed, then hashInt
    with the running hash as seed."""
    return hash_int(i, hash_long(value, _SPARK_SEED))


_M64 = (1 << 64) - 1
_P1_I, _P2_I, _P3_I, _P4_I, _P5_I = (
    int(_P1), int(_P2), int(_P3), int(_P4), int(_P5)
)


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """Exact XXH64 of a byte string (Spark's ``xxhash64(stringCol)`` hashes
    the UTF-8 bytes with this), as a Python int in uint64 space. Scalar —
    used for the rare grams the vectorized 4-byte-lane fast path can't
    take (non-ASCII text, short-string fallbacks); parity pinned by
    tests/test_xxh64_parity.py."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1_I + _P2_I) & _M64
        v2 = (seed + _P2_I) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1_I) & _M64
        off = 0
        while off + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[off + 8 * i : off + 8 * i + 8], "little")
                v = (v + k * _P2_I) & _M64
                v = ((v << 31) | (v >> 33)) & _M64
                v = (v * _P1_I) & _M64
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (
            ((v1 << 1) | (v1 >> 63))
            + ((v2 << 7) | (v2 >> 57))
            + ((v3 << 12) | (v3 >> 52))
            + ((v4 << 18) | (v4 >> 46))
        ) & _M64
        for v in (v1, v2, v3, v4):
            k = (v * _P2_I) & _M64
            k = ((k << 31) | (k >> 33)) & _M64
            h ^= (k * _P1_I) & _M64
            h = (h * _P1_I + _P4_I) & _M64
    else:
        h = (seed + _P5_I) & _M64
        off = 0
    h = (h + n) & _M64
    while off + 8 <= n:
        k = int.from_bytes(data[off : off + 8], "little")
        k = (k * _P2_I) & _M64
        k = ((k << 31) | (k >> 33)) & _M64
        h ^= (k * _P1_I) & _M64
        h = ((h << 27) | (h >> 37)) & _M64
        h = (h * _P1_I + _P4_I) & _M64
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(data[off : off + 4], "little") * _P1_I) & _M64
        h = ((h << 23) | (h >> 41)) & _M64
        h = (h * _P2_I + _P3_I) & _M64
        off += 4
    while off < n:
        h ^= (data[off] * _P5_I) & _M64
        h = ((h << 11) | (h >> 53)) & _M64
        h = (h * _P1_I) & _M64
        off += 1
    h ^= h >> 33
    h = (h * _P2_I) & _M64
    h ^= h >> 29
    h = (h * _P3_I) & _M64
    h ^= h >> 32
    return h


_LE_W: dict[int, np.ndarray] = {}


def gram_hashes_spark(t, n: int, seed: int) -> np.ndarray:
    """int64 array of ``xxhash64(gram, seed)`` over the DISTINCT char
    n-grams of ``t`` — element-for-element the multiset Spark's
    ``transform(array_distinct(<shingles>), x -> xxhash64(x, {seed}))``
    produces, up to ORDER (first-occurrence there, code-sorted here).
    Hash multiplicity is preserved: two distinct grams colliding to one
    hash yield two array entries, exactly like the JVM form — SimHash's
    majority votes depend on that, MinHash minima don't care.

    ASCII fast path: an n-byte gram takes XXH64's int tail path, so
    ``xxhash64(gram, seed) == hash_int(seed, hash_int(le_bytes, 42))`` for
    n == 4 — two vectorized calls over the sliding byte windows, with
    ``np.unique`` as the exact ``array_distinct``. Non-ASCII / short /
    null texts fall back to per-gram ``xxh64_bytes`` with the same values.
    The short-string rule mirrors the SQL CASE: len(t) < n keeps the whole
    string as the single gram."""
    seed_u = np.uint64(seed)
    if t is not None and len(t) >= n and t.isascii() and n == 4:
        w = _LE_W.get(n)
        if w is None:
            w = _LE_W[n] = (1 << (8 * np.arange(n, dtype=np.int64))).astype(
                np.int64
            )
        b = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
        codes = np.unique(
            np.lib.stride_tricks.sliding_window_view(b, n).astype(np.int64) @ w
        )
        return hash_int(seed_u, hash_int(codes.view(np.uint64), np.uint64(42))).view(
            np.int64
        )
    if t is None:
        # xxhash64(NULL, seed): the null child is skipped, the int literal
        # hashes against the initial seed 42
        vals = [int(hash_int(seed_u, np.uint64(42)))]
    else:
        grams = (
            dict.fromkeys(t[i : i + n] for i in range(len(t) - n + 1))
            if len(t) >= n
            else (t,)
        )
        vals = [
            int(hash_int(seed_u, np.uint64(xxh64_bytes(g.encode("utf-8")))))
            for g in grams
        ]
    return np.array(vals, dtype=np.uint64).view(np.int64)


def xxhash64_long_array_int(values: np.ndarray, i) -> np.uint64:
    """``xxhash64(array<long>Col, intLiteral)`` — e.g. the LSH band hash
    ``xxhash64(slice(mhs, ...), b)``: fold the elements through hashLong,
    then hashInt the int."""
    h = _SPARK_SEED
    for v in np.asarray(values, dtype=np.uint64):
        h = hash_long(v, h)
    return hash_int(i, h)
