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


def _tfidf_matrix(names: list[str], n_lo: int = 3, n_hi: int = 5) -> np.ndarray:
    """Dense sklearn-default char TF-IDF matrix for a SMALL list of strings."""
    grams: list[Counter] = []
    for s in names:
        c: Counter = Counter()
        for n in range(n_lo, n_hi + 1):
            if len(s) >= n:
                for i in range(len(s) - n + 1):
                    c[s[i : i + n]] += 1
            else:
                c[s] += 1
        grams.append(c)
    vocab = {g: i for i, g in enumerate(sorted(set().union(*grams)))}
    X = np.zeros((len(names), len(vocab)))
    for r, c in enumerate(grams):
        for g, tf in c.items():
            X[r, vocab[g]] = tf
    n = len(names)
    df = (X > 0).sum(axis=0)
    idf = np.log((1.0 + n) / (1.0 + df)) + 1.0
    X = X * idf
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return X / norms


def elect_canonical(names: pd.Series) -> str:
    """Exact V11 formula on one cluster's member texts."""
    if names.empty:
        return ""
    uniq = pd.unique(names)
    if len(uniq) == 1:
        return uniq[0]
    X = _tfidf_matrix(list(uniq))
    sim = X @ X.T
    counts = names.value_counts()
    freq = counts.reindex(uniq).fillna(0).to_numpy() / float(len(names))
    base = sim @ freq + freq
    lengths = np.array([len(u) for u in uniq], dtype=np.float64)
    bonus = np.minimum(np.log(lengths + 1.0), 3.5)
    return uniq[int(np.argmax(base * bonus))]


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
                        elect_canonical(pd.Series(ns)) for ns in pdf["_names"]
                    ],
                    "cluster_size": [len(ns) for ns in pdf["_names"]],
                }
            )

    return grouped.mapInPandas(
        per_batch, "cluster long, canonical_text string, cluster_size long"
    )
