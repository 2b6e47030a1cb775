"""Canonical-representative election per cluster.

V11 (reference utils.py:28-62): among the unique texts of a cluster, score
each candidate by centrality x descriptiveness:

    score = (cosine_sim_matrix @ freq_weights + freq_weights) * min(log(len+1), 3.5)

using char 3-5-gram TF-IDF (sklearn-default weighting: raw tf, smooth idf,
L2 norm). The argmax is the canonical text. The reference runs this in a
per-cluster CPU/GPU loop (resolver.py:560-571 etc.); here it is ONE
``applyInPandas`` pass over all clusters — each cluster is small after
resolution, so the per-group numpy work is tiny and fully parallel.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_codes(s: str, n_lo: int, n_hi: int) -> np.ndarray:
    """All char n-gram occurrences of an ASCII string as uint64 codes.

    A gram is packed big-endian into the high bytes of a uint64 (low bytes
    zero), so code identity == gram identity (no gram contains NUL — the
    caller guarantees it) and uint64 sort order == lexicographic sort order
    of the gram strings. Replicates the slow path's short-string fallback:
    for each n with len(s) < n the WHOLE string counts as one gram.
    """
    b = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(np.uint64)
    shifts = (np.arange(n_hi - 1, -1, -1, dtype=np.int64) * 8).astype(np.uint64)
    weights = np.left_shift(np.uint64(1), shifts)
    parts = []
    for n in range(n_lo, n_hi + 1):
        if len(b) >= n:
            w = np.lib.stride_tricks.sliding_window_view(b, n)
            parts.append(w @ weights[:n])
        else:
            whole = b @ weights[: len(b)] if len(b) else np.uint64(0)
            parts.append(np.array([whole], dtype=np.uint64))
    return np.concatenate(parts)


def _tfidf_matrix(names: list[str], n_lo: int = 3, n_hi: int = 5) -> np.ndarray:
    """Dense sklearn-default char TF-IDF matrix for a SMALL list of strings.

    Two gram extractors produce the SAME matrix bit-for-bit: a vectorized
    numpy path (windows packed to uint64 codes — used when every name is
    NUL-free ASCII and grams fit 8 bytes, i.e. virtually always after
    normalization) and the per-gram Python fallback. Identical tf values in
    an identically SORTED vocabulary make every downstream float op —
    idf scaling, L2 norm, X @ X.T — bitwise equal, so the election result
    cannot depend on which path ran (pinned by test_canonical_fastpath.py).
    """
    n = len(names)
    fast = n_hi <= 8 and all(s.isascii() and "\x00" not in s for s in names)
    if fast:
        per = [
            np.unique(_gram_codes(s, n_lo, n_hi), return_counts=True)
            for s in names
        ]
        vocab = np.unique(np.concatenate([u for u, _ in per]))
        X = np.zeros((n, len(vocab)))
        for r, (u, tf) in enumerate(per):
            X[r, np.searchsorted(vocab, u)] = tf
    else:
        grams: list[Counter] = []
        for s in names:
            c: Counter = Counter()
            for gn in range(n_lo, n_hi + 1):
                if len(s) >= gn:
                    for i in range(len(s) - gn + 1):
                        c[s[i : i + gn]] += 1
                else:
                    c[s] += 1
            grams.append(c)
        vmap = {g: i for i, g in enumerate(sorted(set().union(*grams)))}
        X = np.zeros((n, len(vmap)))
        for r, c in enumerate(grams):
            for g, tf in c.items():
                X[r, vmap[g]] = tf
    df = (X > 0).sum(axis=0)
    idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
    X = X * idf
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return X / norms


def _elect_canonical_list(names: list[str]) -> str:
    """Exact V11 formula on one cluster's member texts (plain-list core).

    The candidate list is processed in SORTED order (r6b), making the
    election a pure function of the name MULTISET: the earlier
    first-appearance order inherited ``collect_list``'s shuffle arrival
    order, so ``base = sim @ freq`` summed in a partition-dependent order
    and the argmax (first max wins) broke exact ties by arrival — the
    end-to-end determinism test caught a flipped near-tie after the r6b
    hygiene rewrites perturbed row order. Candidate SCORES are otherwise
    order-independent (tf/idf/norms are per-row over the sorted vocab; sim
    entries are pairwise dots), so on margin-decidable inputs — every
    oracle fixture — the winner is unchanged; ties now break
    lexicographically, deterministically."""
    if not names:
        return ""
    counts = Counter(names)
    if len(counts) == 1:
        return names[0]
    uniq = sorted(counts)
    X = _tfidf_matrix(uniq)
    sim = X @ X.T
    freq = np.array([counts[u] for u in uniq], dtype=np.float64) / float(
        len(names)
    )
    base = sim @ freq + freq
    lengths = np.array([len(u) for u in uniq], dtype=np.float64)
    bonus = np.minimum(np.log(lengths + 1.0), 3.5)
    return uniq[int(np.argmax(base * bonus))]


def elect_canonical(names: pd.Series) -> str:
    """Exact V11 formula on one cluster's member texts."""
    return _elect_canonical_list(list(names))


def canonical_map(
    members: DataFrame,
    cluster_col: str = "cluster",
    text_col: str = "norm_text",
) -> DataFrame:
    """(cluster, canonical_text, cluster_size).

    One groupBy collects each cluster's member texts, then a ``mapInPandas``
    pass elects canonicals over THOUSANDS of clusters per Arrow batch. The
    former per-cluster ``applyInPandas`` paid the Arrow/pandas round-trip
    once per cluster (28k groups = 28k tiny batches) and anti-scaled with
    cores; clusters are small post-resolution, so the collected name lists
    are bounded."""
    grouped = members.groupBy(F.col(cluster_col).alias("cluster")).agg(
        F.collect_list(F.col(text_col)).alias("_names")
    )

    def per_batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "cluster": pdf["cluster"],
                    "canonical_text": [
                        _elect_canonical_list(list(ns)) for ns in pdf["_names"]
                    ],
                    "cluster_size": [len(ns) for ns in pdf["_names"]],
                }
            )

    return grouped.mapInPandas(
        per_batch, "cluster long, canonical_text string, cluster_size long"
    )
