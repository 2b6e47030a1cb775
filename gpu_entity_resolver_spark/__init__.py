"""gpu_entity_resolver_spark — a from-scratch, PySpark-native record-linkage
(entity-resolution) engine with the query and data-processing capabilities of
the reference ``andrewjordan3/gpu-entity-resolver`` (see SURVEY.md).

The reference is a single-node NVIDIA RAPIDS pipeline (resolver.py:38); this
package re-expresses the same semantics Spark-first:

- DataFrame/SQL column expressions for normalization, keys, scores
  (reference resolver.py:130-182, utils.py:99-166);
- multi-key blocking (MinHash-LSH over char shingles + sorted-neighborhood)
  instead of the reference's kNN-over-embeddings (utils.py:313-359);
- Arrow-vectorized pandas UDFs only where built-ins cannot express the
  semantics (extraction, Jaro-Winkler, per-cluster canonical election);
- an iterative DataFrame connected-components (large-star/small-star) instead
  of cuGraph (utils.py:361-398);
- parquet stage tables + a lineage/metrics table for checkpoint/resume
  (the local stand-in for an Iceberg catalog — no Iceberg jar is available in
  this sandbox; the table layout is catalog-agnostic).
"""

from .config import ResolverConfig


def __getattr__(name):
    # lazy imports so the package imports without an active SparkSession
    if name == "EntityResolver":
        from .plans.entities import EntityResolver

        return EntityResolver
    if name == "resolve_documents":
        from .plans.resolve import resolve_documents

        return resolve_documents
    if name == "embed_documents":
        from .functions.embed import embed_documents

        return embed_documents
    raise AttributeError(name)


__all__ = [
    "ResolverConfig",
    "EntityResolver",
    "resolve_documents",
    "embed_documents",
]
__version__ = "0.1.0"
