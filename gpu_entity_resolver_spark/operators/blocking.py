"""Multi-key blocking: MinHash-LSH over char shingles + sorted-neighborhood
prefix keys + host keys, with hot-block salting.

This is the single most important semantic→Spark transformation (SURVEY.md
§2.3 J5): the reference bounds all-pairs work with a chunked cross join
(resolver.py:2534-2562) and kNN searches (utils.py:313-359); at 10^12-doc
scale candidate generation must instead be an equi-join on blocking keys.

MinHash is hand-rolled with ``xxhash64`` column math rather than
``ml.feature.MinHashLSH`` to guarantee cross-run determinism, avoid
VectorUDT round-trips, and keep everything inside whole-stage codegen
(SURVEY.md §7.3). ``xxhash64(shingle, perm_index)`` varies the hash per
permutation; band hashes combine ``rows_per_band`` minima.

Hot blocks (template boilerplate producing giant LSH buckets) are handled
by salting: a block of size s > cap is split into ceil(s/cap) salt groups
and pairs are generated only within a salt group. Recall loss is bounded
because every doc carries ``bands + extra`` independent keys; duplicate
pairs from multiple keys are deduped downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import BlockingConfig


def minhash_signature(text_col: str, cfg: BlockingConfig) -> Column:
    """All ``num_perm`` min-hashes as ONE array<long> column, computed in a
    single pass over the distinct char shingles.

    Structure matters for speed: the shingle array is referenced exactly once
    (evaluated once per row); the ``aggregate`` fold then computes, per
    shingle, all permutation hashes ``xxhash64(shingle_hash, p, seed)`` (long
    math, no string re-hash) and keeps the element-wise minimum via
    ``zip_with``. A naive 64-column formulation re-evaluated the shingling 64
    times per row and was ~60x slower.
    """
    hs_all = f"transform(array_distinct({_shingle_expr(text_col, cfg.shingle_size)}), x -> xxhash64(x, {cfg.seed}))"
    # Deterministic shingle subsampling (keep hashes ≡ 0 mod m): an unbiased
    # MinHash over the subsampled shingle sets at 1/m the permutation cost —
    # the standard trick for long documents. Short docs (sample would be
    # empty) fall back to the full set.
    if cfg.minhash_shingle_mod > 1:
        # Bind the expensive shingle-hash array ONCE via lambda variables
        # (transform over a 1-element array), so neither the full set nor the
        # filtered subset is re-evaluated per reference. The previous CASE
        # formulation inlined `hs_all` textually into the condition, the THEN
        # branch and the fallback — 2 evaluations per row of the most
        # expensive sub-expression on the default config path.
        m = cfg.minhash_shingle_mod
        hs = (
            f"transform(transform(array({hs_all}), "
            f"a -> struct(a AS a, filter(a, h -> pmod(h, {m}) = 0) AS f)), "
            f"s -> CASE WHEN size(s.f) > 0 THEN s.f ELSE s.a END)[0]"
        )
    else:
        hs = hs_all
    perms = f"sequence(0, {cfg.num_perm - 1})"
    return F.expr(
        f"aggregate({hs}, "
        f"transform({perms}, p -> 9223372036854775807L), "
        f"(acc, h) -> zip_with(acc, transform({perms}, p -> xxhash64(h, p)), "
        f"(a, b) -> least(a, b)))"
    )


def _shingle_expr(col: str, n: int) -> str:
    return (
        f"CASE WHEN length({col}) >= {n} THEN "
        f"transform(sequence(1, length({col}) - {n} + 1), i -> substring({col}, i, {n})) "
        f"ELSE array({col}) END"
    )


def lsh_block_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "norm_text",
    cfg: BlockingConfig | None = None,
) -> DataFrame:
    """(doc_id, block_key) rows: one key per LSH band."""
    cfg = cfg or BlockingConfig()
    r = cfg.num_perm // cfg.bands
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(text_col, cfg).alias("mhs"),
    )
    # Band hash = xxhash64 over the band's r minima (banding via slice).
    bands = F.expr(
        f"transform(sequence(0, {cfg.bands - 1}), "
        f"b -> concat('mh', b, ':', xxhash64(slice(mhs, b * {r} + 1, {r}), b)))"
    )
    return sig.select("doc_id", F.explode(bands).alias("block_key"))


def sorted_neighborhood_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "norm_text",
    cfg: BlockingConfig | None = None,
) -> DataFrame:
    """Prefix-block keys on the normalized text — the sorted-neighborhood
    analog expressed as an equi-joinable key (docs sharing the first K chars
    fall in one block; the window semantics are delivered by the in-block
    pair join, block sizes being capped by salting)."""
    cfg = cfg or BlockingConfig()
    k = cfg.sorted_neighborhood_prefix
    squeezed = F.regexp_replace(F.col(text_col), r"\s+", "")
    head = F.concat(F.lit("sn:"), F.substring(squeezed, 1, k))
    # Tail key catches duplicates whose head diverges (leading word drops /
    # DBA-style prefix noise) — a second sort order, as classic sorted-
    # neighborhood uses multiple passes.
    tail = F.concat(F.lit("st:"), F.substr(squeezed, F.length(squeezed) - k + 1, F.lit(k)))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array(head, tail)).alias("block_key"),
        )
        .where(F.length("block_key") > 3)
    )


def host_keys(
    docs: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Normalized-host blocking key from the url (north rule's second key
    family). Strips scheme, www., port and path; pure JVM regex."""
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:www\.)?([^/:?#]+)", 1)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(F.lit("host:"), host).alias("block_key"),
    ).where(F.col("block_key") != "host:")


def phonetic_block_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "norm_text",
    max_words: int = 2,
) -> DataFrame:
    """V2 phonetic key family: soundex per word over the first ``max_words``
    words (JVM soundex, no Python). Blocks together name variants whose
    spelling diverges beyond shingle reach ('jonsen'/'johnson'). The
    reference routes the same signal through a phonetic count-vector stream
    at 15% energy (config.py:117-124)."""
    from ..functions.phonetic import soundex_key

    key = F.concat(F.lit("ph:"), soundex_key(F.col(text_col), max_words))
    return docs.select(
        F.col(id_col).alias("doc_id"), key.alias("block_key")
    ).where(F.length("block_key") > 3)


def salt_blocks(
    blocks: DataFrame,
    cfg: BlockingConfig | None = None,
) -> DataFrame:
    """Split oversized blocks into salt groups of at most ``max_block_size``
    members. Deterministic: the salt is xxhash64(doc_id) mod n_salts.

    This caps the within-block pair fan-out at cap^2/2 regardless of skew —
    the explicit analog of AQE's skew-join splitting, applied before the
    self-join so the quadratic blow-up never materializes.
    """
    cfg = cfg or BlockingConfig()
    # Materialization barrier: `blocks` (whose plan contains the MinHash
    # signatures) is referenced by both the size aggregation and the join —
    # without it the signature computation runs twice.
    blocks = blocks.localCheckpoint(eager=False)
    counts = blocks.groupBy("block_key").agg(F.count("*").alias("block_n"))
    # Blocks of size 1 produce no pairs — drop them before the join.
    useful = counts.where(F.col("block_n") >= 2)
    salted = (
        blocks.join(useful, "block_key")
        .withColumn(
            "n_salts",
            F.ceil(F.col("block_n") / F.lit(cfg.max_block_size)).cast("int"),
        )
        .withColumn(
            "salt",
            F.when(F.col("n_salts") <= 1, F.lit(0)).otherwise(
                F.pmod(F.xxhash64("doc_id"), F.col("n_salts")).cast("int")
            ),
        )
        .select(
            "doc_id",
            F.concat_ws("#", "block_key", F.col("salt").cast("string")).alias(
                "block_key"
            ),
        )
    )
    return salted


def candidate_pairs(
    blocks: DataFrame,
    cfg: BlockingConfig | None = None,
) -> DataFrame:
    """Self-join blocks on block_key, canonical order src < dst, dedup pairs
    that co-occur in several blocks. The shuffle key is block_key (bounded
    cardinality per key after salting); the dedup groupBy shuffles on the
    pair itself."""
    # Barrier before the self-join: both join sides reference `salted`.
    salted = salt_blocks(blocks, cfg).localCheckpoint(eager=False)
    a = salted.alias("a")
    b = salted.alias("b")
    return (
        a.join(b, "block_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("dst"),
        )
        .distinct()
    )


def blocking_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "norm_text",
    url_col: str | None = None,
    cfg: BlockingConfig | None = None,
) -> DataFrame:
    """Union of all key families — MinHash-LSH bands, sorted-neighborhood
    prefix, and (when urls exist) normalized host."""
    cfg = cfg or BlockingConfig()
    keys = lsh_block_keys(docs, id_col, text_col, cfg).unionByName(
        sorted_neighborhood_keys(docs, id_col, text_col, cfg)
    )
    if url_col is not None:
        keys = keys.unionByName(host_keys(docs, id_col, url_col))
    if cfg.use_phonetic_keys:
        keys = keys.unionByName(
            phonetic_block_keys(docs, id_col, text_col, cfg.phonetic_key_words)
        )
    return keys
