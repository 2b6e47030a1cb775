"""End-to-end pipeline tests (SURVEY.md §5.3): pairwise F1 on the labeled
synthetic web corpus, extraction byte-identity, blocking recall, and
checkpoint/resume."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.config import ResolverConfig
from gpu_entity_resolver_spark.functions.extraction import extract_text_series
from gpu_entity_resolver_spark.operators.blocking import (
    blocking_keys,
    candidate_pairs,
)
from gpu_entity_resolver_spark.plans.resolve import (
    prepare_documents,
    resolve_documents,
)
from gpu_entity_resolver_spark.sources.webgen import (
    INPUT_COLUMNS,
    generate_documents,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    gen = generate_documents(spark, SF_DIR).localCheckpoint(eager=True)
    return gen


@pytest.fixture(scope="module")
def truth(corpus):
    return corpus.select(
        F.xxhash64("url").alias("doc_id"), "entity_id"
    ).localCheckpoint(eager=True)


def test_generator_deterministic_across_parallelism(spark, corpus):
    """FIXTURES.md: generator output is independent of partitioning."""
    again = (
        generate_documents(spark, SF_DIR)
        .repartition(64)
        .select("url", "text", F.md5("html").alias("h"))
    )
    first = corpus.select("url", "text", F.md5("html").alias("h"))
    assert first.exceptAll(again).count() == 0
    assert again.exceptAll(first).count() == 0


def test_extraction_byte_identity(corpus):
    """input_hint invariant: extracted text is byte-identical per url and
    equals the stored ground-truth text where present."""
    pdf = corpus.select("url", "html", "text").toPandas()
    extracted1 = extract_text_series(pdf["html"])
    extracted2 = extract_text_series(pdf["html"].sample(frac=1, random_state=7).sort_index())
    assert (extracted1 == extracted2).all()
    has_truth = pdf["text"].notna()
    assert (extracted1[has_truth] == pdf["text"][has_truth]).all(), (
        "markup noise changed extracted bytes"
    )


def test_blocking_recall(spark, corpus, truth):
    """SURVEY.md §5.1: every labeled duplicate pair shares >= 1 blocking key."""
    cfg = ResolverConfig()
    prep = prepare_documents(corpus.select(*INPUT_COLUMNS), cfg).localCheckpoint(
        eager=True
    )
    # same key families the pipeline uses (MinHash bands + SN prefix)
    pairs = candidate_pairs(
        blocking_keys(prep, "doc_id", "norm_text", cfg=cfg.blocking),
        cfg.blocking,
    )
    t = truth
    true_pairs = (
        t.alias("a")
        .join(
            t.alias("b"),
            (F.col("a.entity_id") == F.col("b.entity_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    n_true = true_pairs.count()
    n_hit = pairs.join(true_pairs, ["src", "dst"], "left_semi").count()
    assert n_hit / n_true >= 0.995, f"blocking recall {n_hit}/{n_true}"


def test_pipeline_f1(spark, corpus, truth):
    """BASELINE.json gate: pairwise F1 >= 0.99 on labeled same-block pairs.
    (We compute all-pairs F1, which is stricter: same-block is a subset.)"""
    resolved = resolve_documents(spark, corpus.select(*INPUT_COLUMNS))
    j = resolved.select("doc_id", "cluster").join(truth, "doc_id")
    pairs = (
        j.alias("a")
        .join(j.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            (F.col("a.cluster") == F.col("b.cluster")).alias("pred"),
            (F.col("a.entity_id") == F.col("b.entity_id")).alias("truth"),
        )
    )
    agg = pairs.agg(
        F.sum(F.when(F.col("pred") & F.col("truth"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("truth"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("truth"), 1).otherwise(0)).alias("fn"),
    ).first()
    tp, fp, fn = agg["tp"], agg["fp"], agg["fn"]
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, f"F1={f1:.4f} (P={precision:.4f} R={recall:.4f})"


def test_checkpoint_resume_after_midwrite_crash(spark):
    """VERDICT r3 #8: a cold kill MID-WRITE leaves a partial stage dir
    (part files present, no _SUCCESS). The rerun must treat that stage as
    uncommitted, rebuild it idempotently over the debris, keep upstream
    committed stages untouched, and build downstream stages normally."""
    from gpu_entity_resolver_spark.sources.checkpoint import CheckpointManager

    workdir = tempfile.mkdtemp(prefix="ckpt_crash_")
    try:
        builds = {"s1": 0, "s2": 0, "s3": 0}

        def run():
            ck = CheckpointManager(spark, workdir)
            d1 = ck.stage("s1", lambda: (builds.__setitem__("s1", builds["s1"] + 1), spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v")))[1])
            d2 = ck.stage("s2", lambda: (builds.__setitem__("s2", builds["s2"] + 1), d1.withColumn("w", F.col("v") + 1))[1])
            return ck.stage("s3", lambda: (builds.__setitem__("s3", builds["s3"] + 1), d2.groupBy((F.col("id") % 10).alias("g")).agg(F.sum("w").alias("sw")))[1])

        out1 = {(r["g"], r["sw"]) for r in run().collect()}
        assert builds == {"s1": 1, "s2": 1, "s3": 1}

        # crash mid-s2-write: drop the commit marker, leave the part files,
        # add orphan debris a killed writer could have left; s3 never ran
        s2 = os.path.join(workdir, "s2")
        os.remove(os.path.join(s2, "_SUCCESS"))
        with open(os.path.join(s2, "part-99999-orphan.parquet"), "wb") as f:
            f.write(b"not a parquet file")
        shutil.rmtree(os.path.join(workdir, "s3"), ignore_errors=True)

        out2 = {(r["g"], r["sw"]) for r in run().collect()}
        # s1 resumed from disk; s2 rebuilt exactly once; s3 rebuilt
        assert builds == {"s1": 1, "s2": 2, "s3": 2}
        assert out2 == out1
        # the rebuild replaced the debris and recommitted
        assert os.path.exists(os.path.join(s2, "_SUCCESS"))
        assert not os.path.exists(os.path.join(s2, "part-99999-orphan.parquet"))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_checkpoint_resume(spark, corpus):
    """North rule: the pipeline resumes from the last committed stage."""
    workdir = tempfile.mkdtemp(prefix="ckpt_")
    try:
        docs = corpus.select(*INPUT_COLUMNS).limit(300)
        r1 = resolve_documents(spark, docs, checkpoint_dir=workdir)
        rows1 = {
            (r["doc_id"], r["cluster"])
            for r in r1.select("doc_id", "cluster").collect()
        }
        n1 = len(rows1)
        # Simulate a restart after stage 03: remove later stage tables.
        for stage in ["04_clusters", "05_resolved"]:
            shutil.rmtree(os.path.join(workdir, stage), ignore_errors=True)
        r2 = resolve_documents(spark, docs, checkpoint_dir=workdir)
        assert r2.count() == n1
        # committed stages are consulted, lineage rows exist per stage
        lineage = spark.read.parquet(os.path.join(workdir, "_lineage"))
        stages = {r["stage"] for r in lineage.select("stage").distinct().collect()}
        assert {"01_normalized", "02_pairs", "03_scored"} <= stages
        # identical output from the resumed run
        rows2 = {
            (r["doc_id"], r["cluster"])
            for r in r2.select("doc_id", "cluster").collect()
        }
        assert rows1 == rows2
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_resolve_deterministic_across_parallelism(spark, corpus):
    """North-rule invariant, end to end: the RESOLVED output — cluster
    partition, canonical text, review flags — is identical no matter how
    the input is partitioned. Every ordering the pipeline relies on is
    explicit (xxhash salting, rank windows with doc_id tie-breaks,
    min-based CC labels, deterministic election), so repartitioning the
    input must not move a single document. Float aggregates
    (avg_pair_score, confidence) are compared rounded: their summation
    ORDER legitimately varies with partitioning."""
    docs = corpus.select(*INPUT_COLUMNS)
    outs = []
    for nparts in (3, 29):
        res = resolve_documents(spark, docs.repartition(nparts))
        outs.append(
            res.select(
                "doc_id",
                "cluster",
                "canonical_text",
                "cluster_size",
                "needs_review",
                F.round("confidence_score", 6).alias("conf6"),
            )
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    a, b = outs
    assert len(a) == len(b)
    # identical cluster PARTITION (labels are min-vertex ids — comparable
    # directly), identical canonicals, identical flags
    for col in ("cluster", "canonical_text", "cluster_size", "needs_review"):
        assert a[col].equals(b[col]), col
    assert (a["conf6"] - b["conf6"]).abs().max() <= 1e-6
