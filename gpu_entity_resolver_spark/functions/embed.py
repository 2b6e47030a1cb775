"""V3 semantic-embedding hook (SURVEY.md §2.7 V3, §2.11).

The reference encodes entity names with a sentence-transformer
(``SentenceTransformer('all-mpnet-base-v2').encode(batch=512)``,
reference resolver.py:383-400, config.py:40-42). The north rule replaces
semantic similarity with TF-IDF-cosine + edit distances, so no model
ships here — but SURVEY V3 promises the PRODUCTION SEAM: a
``predict_batch_udf``-style hook that runs a user-supplied batch encoder
over Arrow batches with load-once-per-worker model semantics, emitting
the ``array<float>`` embedding column the similarity/near-dup operators
(`operators/similarity.py`, `operators/dedup.embedding_neardup_pairs`)
already consume.

Design notes for 100 TB:
- the model loads ONCE per python worker (factory result cached in a
  module-level slot), not per batch and never on the driver — the
  pattern of ``pyspark.ml.functions.predict_batch_udf``;
- inference is batched: texts are re-chunked to ``batch_size`` inside
  ``mapInPandas`` so the encoder sees GPU/BLAS-friendly batch shapes
  regardless of Arrow batch sizing;
- embeddings are float32 (half the shuffle bytes of double) and the
  operator is a narrow map — partitioning passes through untouched.

No embedding model exists in this sandbox, so ``hash_embedder`` provides
a deterministic stand-in (unit vectors derived from blake2b of the
text): identical texts embed identically on any worker at any
parallelism, which is exactly what the plumbing tests need — the same
honest-seam pattern as the FAKEIMG codec in functions/multimodal.py.
"""

from __future__ import annotations

import hashlib
import uuid
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# One encoder per python worker process (predict_batch_udf semantics).
# Keyed by a per-call uuid so different hooks coexist and a recycled
# driver-side object id can never alias a previous call's encoder.
_WORKER_ENCODERS: dict[str, Callable[[list[str]], np.ndarray]] = {}


def hash_embedder(dim: int = 64) -> Callable[[list[str]], np.ndarray]:
    """Deterministic stand-in encoder: text -> L2-normalized float32
    vector derived from blake2b(text). No semantic meaning — a seam
    filler with the right shape, dtype and determinism contract."""

    def encode(texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            h = hashlib.blake2b(
                ("" if t is None else str(t)).encode("utf-8"), digest_size=8
            ).digest()
            rng = np.random.default_rng(int.from_bytes(h, "little"))
            v = rng.standard_normal(dim).astype(np.float32)
            out[i] = v / (np.linalg.norm(v) or 1.0)
        return out

    return encode


def embed_documents(
    docs: DataFrame,
    encoder_factory: Callable[[], Callable[[list[str]], np.ndarray]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = 512,
) -> DataFrame:
    """(id_col, out_col: array<float>) — run a batch encoder over the
    corpus with load-once-per-worker model semantics.

    ``encoder_factory`` is a ZERO-ARG callable returning the actual
    ``list[str] -> np.ndarray[n, dim]`` encoder. The factory runs at most
    once per python worker process (never on the driver), so a production
    hook can do the expensive model load there::

        def factory():
            from sentence_transformers import SentenceTransformer
            m = SentenceTransformer("all-mpnet-base-v2")
            return lambda texts: m.encode(texts, batch_size=512)

        emb = embed_documents(docs, factory)

    The output feeds ``operators.similarity.brute_force_topk`` /
    ``ivf_topk`` and ``operators.dedup.embedding_neardup_pairs`` as-is.
    """
    # Cache key must be a stable per-call identity: id() of the driver-side
    # factory can be recycled after garbage collection, silently handing a
    # later call the PREVIOUS factory's cached encoder on long-lived
    # python workers. A fresh uuid per embed_documents call can never
    # alias; the factory still runs at most once per worker per call.
    key = uuid.uuid4().hex

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = _WORKER_ENCODERS.get(key)
        if enc is None:
            enc = encoder_factory()
            _WORKER_ENCODERS[key] = enc
        for pdf in batches:
            ids = pdf[id_col]
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            vec_chunks = [
                enc(texts[i : i + batch_size])
                for i in range(0, len(texts), batch_size)
            ]
            vecs = (
                np.concatenate(vec_chunks).astype(np.float32)
                if vec_chunks
                else np.empty((0, 0), dtype=np.float32)
            )
            yield pd.DataFrame(
                {
                    id_col: ids.to_numpy(),
                    out_col: [row for row in vecs],
                }
            )

    from pyspark.sql import functions as F

    return docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(per_batch, f"{id_col} long, {out_col} array<float>")
