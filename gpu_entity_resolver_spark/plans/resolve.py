"""The flagship end-to-end resolve pipeline (SURVEY.md §7.1):

documents(url, warc_ts, html, text, lang)
  1 EXTRACT+NORMALIZE  byte-identical html→text UDF; P1 normalization;
                       doc_id = xxhash64(url)
  2 BLOCK              MinHash-LSH bands ∪ sorted-neighborhood ∪ host keys,
                       hot blocks salted
  3 SCORE              TF-IDF-cosine (JVM join) + Jaro-Winkler (Arrow UDF)
                       + Levenshtein (JVM builtin); weighted; threshold τ
  4 CLUSTER            large-star/small-star connected components
  5 FINALIZE           canonical election (V11), per-cluster stats,
                       confidence (C10 shape), review flags (C11)

Each stage optionally checkpoints to a parquet stage table with lineage
rows (CheckpointManager) so a killed run resumes after the last committed
stage. Stage order mirrors the reference's ``_process_pipeline``
(resolver.py:1552-1642).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ResolverConfig
from ..functions.extraction import extracted_text
from ..functions.normalize import confidence_bin, normalize_entity_text
from ..operators.blocking import blocking_plan, candidate_pairs
from ..operators.canonical import canonical_map
from ..operators.connected_components import connected_components
from ..operators.scoring import edges_above_threshold, make_jw_udf, score_pairs
from ..sources.checkpoint import CheckpointManager


def _cluster_sig(members: DataFrame) -> DataFrame:
    """Per-cluster membership signature: (count, bit_xor of doc_id hashes).

    Two clusters carry equal signatures iff their member sets are identical
    (xor collision odds are 2^-64 per pair; a collision's only consequence is
    reusing a stale canonical text, never a partition change). One map-side
    partial agg, O(clusters) output — the cheap test that lets the finalize
    stage skip re-electing canonicals for clusters hygiene never touched."""
    return members.groupBy("cluster").agg(
        F.count("*").alias("_sig_n"),
        F.bit_xor(F.xxhash64("doc_id")).alias("_sig_x"),
    )


def prepare_documents(docs: DataFrame, cfg: ResolverConfig) -> DataFrame:
    """Stage 1: extraction + normalization + stable doc ids.

    Emits ONLY the columns later stages consume (doc_id, url, lang,
    norm_text). The raw ``body_text`` (~2 KB/doc) and ``warc_ts`` used to
    ride every stage checkpoint, hygiene join and the finalize chain even
    though nothing after this stage reads them — at 128 k docs that was
    ~300 MB of dead weight per materialization (guide §2.3: project before
    the exchange; §8: don't carry payload the decisions never touch)."""
    body = extracted_text(F.col("html"), F.col("text"))
    return docs.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        "lang",
        normalize_entity_text(
            body, cfg.replacements, cfg.suffixes_to_remove
        ).alias("norm_text"),
    )


def resolve_documents(
    spark: SparkSession,
    docs: DataFrame,
    cfg: ResolverConfig | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Resolve a documents table into entity clusters.

    Returns one row per input document:
    (doc_id, url, cluster, canonical_text, cluster_size, avg_pair_score,
     name_similarity, confidence_score, confidence_category, needs_review,
     review_reason).
    """
    cfg = cfg or ResolverConfig()
    if (
        cfg.clustering.ensemble_mutual_rank
        and cfg.scoring.jw_decision_band is not None
        and cfg.scoring.jw_decision_band[0] > cfg.clustering.ensemble_recall_threshold
    ):
        # the recall path thresholds scores BELOW the default band floor;
        # widen the band so that comparison stays exactly invariant
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            scoring=dataclasses.replace(
                cfg.scoring,
                jw_decision_band=(
                    cfg.clustering.ensemble_recall_threshold,
                    cfg.scoring.jw_decision_band[1],
                ),
            ),
        )
    ckpt = CheckpointManager(spark, checkpoint_dir or cfg.runtime.checkpoint_dir)

    # Parallelism guard: stage 1 (extraction UDF + normalization) is narrow,
    # so it inherits the INPUT partitioning. A handful of SMALL input files
    # would serialize the most expensive per-row work; never run it below
    # cluster parallelism. File count alone is NOT the trigger: parquet
    # scans split files larger than maxPartitionBytes on their own, so a
    # handful of multi-GB files already scans at >= target parallelism and
    # repartitioning would force a full-input shuffle (fatal at 100 TB).
    # Gate on the ESTIMATED SCAN SPLITS — total bytes / maxPartitionBytes —
    # and only shuffle when both file count and split count fall short:
    # a cheap shuffle of genuinely tiny input. Sizes come from the Hadoop
    # FileSystem API (works for file:/hdfs:/s3a:); if a size can't be
    # fetched, assume the input is big and leave the scan alone (the
    # false-negative costs an under-parallel scan of one stage; the
    # false-positive costs shuffling the whole input). Non-file frames
    # (in-memory test data, prior-stage results) return no files and keep
    # their partitioning, which already defaults to cluster parallelism.
    target = spark.sparkContext.defaultParallelism
    files = docs.inputFiles()
    if 0 < len(files) < target:
        try:
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
            total = 0
            for uri in files:
                jpath = jvm.org.apache.hadoop.fs.Path(uri)
                total += jpath.getFileSystem(hconf).getFileStatus(jpath).getLen()
            mpb_raw = spark.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728b"
            )
            mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "b": 1}
            mpb_raw = mpb_raw.strip().lower()
            mpb = (
                int(mpb_raw[:-1]) * mult[mpb_raw[-1]]
                if mpb_raw[-1] in mult
                else int(mpb_raw)
            )
            est_splits = -(-total // max(mpb, 1))
        except Exception:
            est_splits = target
        if est_splits < target:
            docs = docs.repartition(target * 2)

    prepared = ckpt.stage("01_normalized", lambda: prepare_documents(docs, cfg))

    # Host keys are deliberately NOT in the default key set: MinHash bands +
    # sorted-neighborhood already block every textual duplicate (measured
    # 100% labeled-pair recall), while Zipf-hot hosts contributed ~80% of
    # candidate pairs with no additional recall. Use
    # operators.blocking.host_keys for URL-duplicate-specific workloads.
    def build_pairs() -> DataFrame:
        keys, tokens = blocking_plan(
            prepared, "doc_id", "norm_text", cfg=cfg.blocking
        )
        return candidate_pairs(keys, cfg.blocking, tokens=tokens)

    pairs = ckpt.stage("02_pairs", build_pairs)

    # The checkpointed stage keeps ONLY the exact-score rows (jw non-null,
    # score_pairs exact_only mode — one linear plan, no approx-branch
    # unions or barriers). Proof that nothing downstream reads the rest:
    # edges need score >= edge_threshold, and score <= _partial + jw_share,
    # so any row at or above the threshold cleared the decision band and
    # has an exact jw; G8 attachment explicitly consumes jw-non-null rows
    # only (approximate scores must not enter its mean/ratio tests); the
    # ensemble recall path thresholds at >= the band floor (the config
    # widening above guarantees it). The jw-null rows — ~95% of the
    # candidate volume, cosine-prefilter prunes and band skips — were
    # being materialized into the stage table for no consumer (guide §1.2:
    # don't compute/store what you throw away; the cosine PASS over them
    # is still paid, it is the prefilter itself).
    scored = ckpt.stage(
        "03_scored",
        lambda: score_pairs(
            pairs, prepared, "doc_id", "norm_text", cfg.scoring,
            exact_only=True,
        ),
    )
    edges = edges_above_threshold(scored, cfg.scoring.edge_threshold)

    def build_clusters() -> DataFrame:
        labels = connected_components(
            edges, max_iterations=cfg.clustering.cc_max_iterations
        )
        return prepared.join(
            labels.withColumnsRenamed({"vertex": "doc_id", "component": "cluster"}),
            "doc_id",
            "left",
        ).withColumn("cluster", F.coalesce("cluster", "doc_id"))

    clustered = ckpt.stage("04_clusters", build_clusters)

    def build_hygiene() -> DataFrame:
        from ..operators.hygiene import (
            attach_singletons,
            consolidate_identical_entities,
            ensemble_labels,
            merge_similar_clusters,
            split_clusters_by,
        )

        out = clustered
        if cfg.clustering.ensemble_mutual_rank:
            # G5+G10: labeling B = CC over the mutual-rank kNN graph built
            # from sub-threshold scored pairs (reference SNN recall path,
            # utils.py:400-469); arbitration keeps the precise CC labels as
            # the core and rescues/mints from B (resolver.py:2157-2278).
            from ..operators.knn_graph import mutual_rank_edges

            recall_edges = mutual_rank_edges(
                scored.where(
                    F.col("score") >= cfg.clustering.ensemble_recall_threshold
                ).select("src", "dst", "score"),
                k=cfg.clustering.mutual_rank_k,
            )
            labels_b = connected_components(
                recall_edges, max_iterations=cfg.clustering.cc_max_iterations
            )
            b_full = out.select("doc_id").join(
                labels_b.withColumnsRenamed(
                    {"vertex": "doc_id", "component": "cluster"}
                ),
                "doc_id",
                "left",
            ).withColumn("cluster", F.coalesce("cluster", "doc_id"))
            ens = ensemble_labels(out.select("doc_id", "cluster"), b_full)
            out = out.drop("cluster").join(ens, "doc_id")
        if cfg.clustering.attach_noise:
            # G8: rescue singletons with a strong unambiguous sub-threshold
            # signal (reference utils.py:473-545) — reuses the stage-03
            # scores, no extra scoring pass. jw-null rows (decision-band
            # skips + cosine-prefilter prunes) carry APPROXIMATE scores,
            # provably < band lo (0.55), far under tau: feed only exact
            # scores into the mean/ratio tests so an underreported
            # runner-up mean can never inflate the best/second ratio. The
            # reference's neighborhood is top-k by similarity
            # (utils.py:490-492); pairs this weak are precisely the ones
            # its kNN crowds out.
            out = attach_singletons(
                scored.where(F.col("jw").isNotNull()).select(
                    "src", "dst", "score"
                ),
                out,
                tau=cfg.clustering.attachment_similarity_threshold,
                min_matching=cfg.clustering.attachment_min_matching,
                ratio_threshold=cfg.clustering.attachment_ratio_threshold,
            )
        if cfg.clustering.merge_similar:
            # The pre-merge election is reused by the finalize stage for
            # every cluster hygiene leaves untouched (the vast majority —
            # merge/consolidate/split each relabel a handful), so the
            # full-corpus collect_list shuffle + election runs ONCE per
            # job, not twice. eager localCheckpoints pin both frames so
            # finalize reads cached results instead of replaying the
            # hygiene plan. Session-local only: on checkpoint-resume of a
            # committed 04b stage this closure never runs and finalize
            # falls back to a full election.
            canon0 = canonical_map(out, "cluster", "norm_text").localCheckpoint(
                eager=True
            )
            _election_reuse["canon0"] = canon0
            _election_reuse["sig0"] = _cluster_sig(out).localCheckpoint(eager=True)
            out = merge_similar_clusters(out, canon0, cfg)
        if cfg.clustering.consolidate_identical:
            out = consolidate_identical_entities(out, "norm_text", "cluster")
        if cfg.clustering.split_by_lang:
            out = split_clusters_by(out, "lang", "cluster")
        return out

    _election_reuse: dict[str, DataFrame] = {}
    clustered = ckpt.stage("04b_hygiene", build_hygiene)

    def build_resolved() -> DataFrame:
        canon0 = _election_reuse.get("canon0")
        sig0 = _election_reuse.get("sig0")
        if canon0 is not None:
            # Incremental re-election: a final cluster whose id AND
            # membership signature match the pre-merge state elected the
            # same canonical text — reuse it. Only clusters hygiene
            # actually touched (absent id or changed signature) pay the
            # collect_list + election again.
            unchanged = (
                _cluster_sig(clustered)
                .join(sig0, ["cluster", "_sig_n", "_sig_x"])
                .select("cluster")
                .localCheckpoint(eager=True)
            )
            canon = canon0.join(unchanged, "cluster", "leftsemi").unionByName(
                canonical_map(
                    clustered.join(unchanged, "cluster", "left_anti"),
                    "cluster",
                    "norm_text",
                )
            )
        else:
            canon = canonical_map(clustered, "cluster", "norm_text")
        # cluster_probability analog: mean incident edge score per doc
        # (reference HDBSCAN probabilities, resolver.py:450 → SURVEY G7).
        incident = (
            edges.select(F.col("src").alias("doc_id"), "score")
            .unionByName(edges.select(F.col("dst").alias("doc_id"), "score"))
            .groupBy("doc_id")
            .agg(F.avg("score").alias("avg_pair_score"))
        )
        jw = make_jw_udf(64)
        out = (
            clustered.join(canon, "cluster")
            .join(incident, "doc_id", "left")
            .withColumn("avg_pair_score", F.coalesce("avg_pair_score", F.lit(1.0)))
            .withColumn("name_similarity", jw("norm_text", "canonical_text"))
            .localCheckpoint(eager=False)
        )
        # cohesion = 1 - std of member name similarities (reference
        # resolver.py:1113-1120) — a real dispersion measure, not an alias
        # of name_similarity
        cohesion = out.groupBy("cluster").agg(
            F.coalesce(F.stddev_samp("name_similarity"), F.lit(0.0)).alias("_nv")
        ).withColumn(
            "cohesion_score",
            F.least(F.greatest(1.0 - F.col("_nv"), F.lit(0.0)), F.lit(1.0)),
        ).drop("_nv")
        out = out.join(cohesion, "cluster")
        # C10-shaped confidence: weighted sum of name similarity, cluster
        # probability, log-size factor and cohesion
        # (reference resolver.py:1086-1173; address terms are absent for the
        # web-page payload, weights renormalized accordingly).
        c = cfg.confidence
        wsum = (
            c.name_similarity_weight
            + c.avg_cluster_prob_weight
            + c.cluster_size_weight
            + c.cohesion_weight
        )
        size_factor = F.least(
            F.log(F.col("cluster_size").cast("double") + 1.0) / F.lit(3.5), F.lit(1.0)
        )
        conf = (
            c.name_similarity_weight * F.col("name_similarity")
            + c.avg_cluster_prob_weight * F.col("avg_pair_score")
            + c.cluster_size_weight * size_factor
            + c.cohesion_weight * F.col("cohesion_score")
        ) / F.lit(wsum)
        # Noise analog: singletons get 0.5 x name_similarity floor like the
        # reference's noise rule (resolver.py:1154-1160).
        conf = F.when(F.col("cluster_size") == 1, F.lit(0.5)).otherwise(conf)
        out = (
            out.withColumn(
                "confidence_score", F.least(F.greatest(conf, F.lit(0.0)), F.lit(1.0))
            )
            .withColumn("confidence_category", confidence_bin(F.col("confidence_score")))
        )
        # C11 review flags (reference resolver.py:1199-1227): OR-combined
        # masks with a csv reason string built from an array of fired rules.
        reasons = F.array_compact(
            F.array(
                F.when(
                    F.col("confidence_score") < c.review_confidence_threshold,
                    F.lit("low_confidence"),
                ),
                F.when(
                    (F.col("cluster_size") == 1)
                    & (F.col("name_similarity") < 1.0),
                    F.lit("singleton_changed"),
                ),
                F.when(
                    F.col("name_similarity") < 1.0 - c.review_change_threshold,
                    F.lit("high_change"),
                ),
            )
        )
        label_source = (
            F.col("label_source")
            if "label_source" in clustered.columns
            else F.lit(0)
        )
        return out.select(
            "doc_id",
            "url",
            "cluster",
            "norm_text",
            "canonical_text",
            "cluster_size",
            "avg_pair_score",
            "name_similarity",
            "confidence_score",
            "confidence_category",
            label_source.cast("int").alias("label_source"),
            (F.size(reasons) > 0).alias("needs_review"),
            F.array_join(reasons, ",").alias("review_reason"),
        )

    return ckpt.stage("05_resolved", build_resolved)
