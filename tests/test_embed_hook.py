"""V3 semantic-embed hook: plumbing tests for functions/embed.py.

No model exists in the sandbox; the deterministic hash_embedder fills the
seam (same pattern as the FAKEIMG codec). The tests pin the contract a
real sentence-transformer hook relies on: schema, dtype, determinism
across parallelism, factory-based worker-side loading, and that the
output feeds the existing embedding operators unchanged.
"""

import numpy as np
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.functions.embed import (
    embed_documents,
    hash_embedder,
)


def _docs(spark, n=40, partitions=None):
    rows = [(i, f"document number {i} about topic {i % 7}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(partitions) if partitions else df


def test_schema_shape_and_norm(spark):
    out = embed_documents(_docs(spark), lambda: hash_embedder(32))
    assert [f.name for f in out.schema.fields] == ["doc_id", "embedding"]
    assert out.schema["embedding"].dataType.simpleString() == "array<float>"
    rows = out.collect()
    assert len(rows) == 40
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float32)
        assert v.shape == (32,)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_deterministic_across_parallelism(spark):
    a = {r["doc_id"]: r["embedding"] for r in
         embed_documents(_docs(spark, partitions=2), lambda: hash_embedder(16)).collect()}
    b = {r["doc_id"]: r["embedding"] for r in
         embed_documents(_docs(spark, partitions=13), lambda: hash_embedder(16)).collect()}
    assert a == b


def test_batching_rechunks_to_batch_size(spark):
    # an encoder that refuses batches larger than 8 proves the re-chunk
    def factory():
        enc = hash_embedder(8)

        def checked(texts):
            assert len(texts) <= 8, f"batch of {len(texts)} reached encoder"
            return enc(texts)

        return checked

    out = embed_documents(_docs(spark, n=50), factory, batch_size=8)
    assert out.count() == 50


def test_feeds_embedding_neardup(spark):
    # identical texts embed identically -> cosine 1 -> near-dup pair found
    from gpu_entity_resolver_spark.operators.dedup import embedding_neardup_pairs

    rows = [(1, "same exact page"), (2, "same exact page")] + [
        (i, f"unique page {i} {'x' * (i % 5)}") for i in range(3, 30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = embed_documents(docs, lambda: hash_embedder(64))
    pairs = embedding_neardup_pairs(
        emb, id_col="doc_id", vec_col="embedding", threshold=0.95
    ).collect()
    assert {(r["src"], r["dst"]) for r in pairs} == {(1, 2)}
