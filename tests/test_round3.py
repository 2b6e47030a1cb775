"""Round-3 additions: V2 phonetic scoring term, full config round-trip,
IVF auto-sizing recall, S5 report distribution stats, G5+G10 ensemble
wiring."""

import math
import os
import random

import pytest
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.config import (
    BlockingConfig,
    ResolverConfig,
    ScoringConfig,
    config_from_dict,
    config_to_dict,
)


# --- V2 phonetic scoring term ----------------------------------------------

def _entity_score(spark, a: str, b: str, phonetic_weight: float) -> float:
    from gpu_entity_resolver_spark.operators.scoring import score_pairs

    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, norm_text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "src long, dst long")
    cfg = ScoringConfig(
        tfidf_weight=0.40,
        jaro_winkler_weight=0.35,
        levenshtein_weight=0.25,
        phonetic_weight=phonetic_weight,
        tfidf_ngram_lo=3,
        tfidf_ngram_hi=5,
        cosine_prefilter=0.0,
        jw_decision_band=None,
    )
    row = score_pairs(pairs, docs, cfg=cfg).collect()[0]
    return row


def test_phonetic_term_lifts_misspelling_over_threshold(spark):
    # 'jonsen trucking salvage' vs 'johnson trucking salvage': identical
    # Metaphone codes (JNSN TRKNK SLFJ), so ph_sim = 1.0 lifts the pair;
    # without the phonetic stream the shingle/edit signals alone are weaker.
    a, b = "jonsen trucking salvage", "johnson trucking salvage"
    without = _entity_score(spark, a, b, 0.0)
    with_ph = _entity_score(spark, a, b, 0.15)
    assert with_ph["ph_sim"] == 1.0
    assert with_ph["score"] > without["score"]
    # the entity path's 0.65 threshold: phonetics carries it across
    assert with_ph["score"] >= 0.65


def test_phonetic_term_neutral_for_identical_and_absent_for_corpus(spark):
    row = _entity_score(spark, "acme manufacturing", "acme manufacturing", 0.15)
    assert row["ph_sim"] == 1.0 and row["score"] == pytest.approx(1.0)
    # corpus scorer (phonetic_weight = 0) reports ph_sim as null
    from gpu_entity_resolver_spark.operators.scoring import score_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
        "doc_id long, norm_text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = score_pairs(pairs, docs, cfg=ScoringConfig(cosine_prefilter=0.0)).collect()
    assert all(r["ph_sim"] is None for r in out)


def test_decision_band_skips_only_low_side(spark):
    # ADVICE r3: confident pairs (partial >= hi) must get an EXACT jw —
    # mean/median/rank consumers read score values, not just threshold
    # outcomes. Only pairs that cannot reach `lo` even with jw = 1 skip
    # the kernel, and their reported score stays below lo.
    from gpu_entity_resolver_spark.operators.scoring import score_pairs

    docs = spark.createDataFrame(
        [
            (1, "acme manufacturing company of rockford illinois"),
            (2, "acme manufacturing company of rockford illinois"),
            (3, "completely unrelated text about gardening tulips"),
        ],
        "doc_id long, norm_text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    cfg = ScoringConfig(cosine_prefilter=0.0, jw_decision_band=(0.55, 0.90))
    rows = {(r["src"], r["dst"]): r for r in score_pairs(pairs, docs, cfg=cfg).collect()}
    hi_pair, lo_pair = rows[(1, 2)], rows[(1, 3)]
    assert hi_pair["jw"] is not None and hi_pair["jw"] > 0.99
    # exact score (not partial-only); float32 vector weights bound the slack
    assert abs(hi_pair["score"] - 1.0) < 1e-6
    assert lo_pair["jw"] is None
    assert lo_pair["score"] < 0.55


# --- S3/S4 full config round-trip -------------------------------------------

def test_config_round_trip_exact():
    cfg = ResolverConfig()
    cfg.scoring.edge_threshold = 0.71
    cfg.scoring.jw_decision_band = (0.6, 0.8)
    cfg.clustering.name_match_threshold = 0.93
    cfg.clustering.allow_neighboring_states = (("il", "wi"), ("mn", "ia"))
    cfg.blocking.max_block_size = 99
    back = config_from_dict(config_to_dict(cfg))
    assert back == cfg


def test_config_round_trip_ignores_unknown_keys():
    d = config_to_dict(ResolverConfig())
    d["scoring"]["added_in_future_version"] = 1
    d["brand_new_section"] = {"x": 1}
    cfg = config_from_dict(d)
    assert cfg.scoring.edge_threshold == ResolverConfig().scoring.edge_threshold


def test_save_load_restores_thresholds(spark, tmp_path):
    import pandas as pd

    from gpu_entity_resolver_spark.plans.entities import EntityResolver

    cfg = ResolverConfig()
    cfg.clustering.addr_match_threshold = 0.91  # non-default
    cfg.scoring.edge_threshold = 0.58
    df = pd.DataFrame(
        {
            "company_name": ["Acme Mfg", "Acme Manufacturing", "Zebra Co"],
            "address": [
                "12 Main St Springfield IL 62701",
                "12 Main St Springfield IL 62701",
                "9 Oak Ave Peoria IL 61601",
            ],
        }
    )
    r = EntityResolver(config=cfg, spark=spark)
    r.fit(df)
    path = str(tmp_path / "model")
    r.save_model(path)
    loaded = EntityResolver(spark=spark).load_model(path)
    # reference-parity classmethod form (reference resolver.py:1439-1440)
    cls_loaded = EntityResolver.load_model(path)
    assert cls_loaded._is_fitted
    assert cls_loaded.config.clustering.addr_match_threshold == 0.91
    assert loaded.config.clustering.addr_match_threshold == 0.91
    assert loaded.config.scoring.edge_threshold == 0.58
    # transform runs under the restored config
    out = loaded.transform(df.head(1))
    assert len(out) == 1


# --- IVF auto-sizing --------------------------------------------------------

def test_ivf_autosize_recall(spark, sf_dir):
    # The IVF use case is near-dup retrieval: corpus = base vectors plus
    # small perturbations; the perturbed query must retrieve its base
    # vector in the top-5. Auto-sized n_centroids/n_probe.
    from gpu_entity_resolver_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    dim = len(emb.first()["embedding"])
    planted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> cast(x + 0.05 * "
            f"embedding[(i + 7) % {dim}] as float))"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    queries = planted.where(F.col("vec_id") < 1_000_050)
    hits = {
        r["query_id"]
        for r in ivf_topk(corpus, queries, k=5).collect()
        if r["neighbor_id"] == r["query_id"] - 1_000_000
    }
    recall = len(hits) / queries.count()
    assert recall >= 0.9, f"IVF near-dup recall@5 {recall:.3f}"


def test_ivf_autosize_formula():
    # ceil(sqrt(N)) with a floor of 16
    assert max(16, math.isqrt(99) + 1) == 16
    n = 100_000
    assert max(16, math.isqrt(n - 1) + 1) == 317


# --- S5 report parity -------------------------------------------------------

def test_report_distribution_stats(spark):
    from gpu_entity_resolver_spark.operators.hygiene import generate_report

    rows = []
    for c in range(5):
        for m in range(c + 1):
            rows.append(
                (c * 100 + m, c, f"text {c}", f"canon {c}", c + 1, 0.9,
                 "VeryHigh", False, "")
            )
    df = spark.createDataFrame(
        rows,
        "doc_id long, cluster long, norm_text string, canonical_text string,"
        " cluster_size int, confidence_score double,"
        " confidence_category string, needs_review boolean,"
        " review_reason string",
    )
    rep = generate_report(df, top_n_clusters=3)
    st = rep["cluster_size_stats"]
    assert st["min"] == 1 and st["max"] == 5
    assert st["mean"] == pytest.approx(3.0)
    assert len(rep["largest_clusters"]) == 3
    assert rep["largest_clusters"][0]["size"] == 5
    assert rep["largest_clusters"][0]["canonical_text"] == "canon 4"


# --- SQL soundex oracle parity ----------------------------------------------

def test_soundex_sql_parity_full_vocab(spark, sf_dir):
    # The phonetic_soundex DuckDB oracle must equal Spark's soundex() on
    # every word of the corpus vocabulary (pure lowercase ASCII).
    import duckdb

    import __spark_entry__ as entry_mod

    sdf = entry_mod.queries()["phonetic_soundex"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    odf = con.execute(entry_mod.oracle_sql()["phonetic_soundex"]).df()
    s = dict(zip(sdf["doc_id"], sdf["phonetic_key"]))
    o = dict(zip(odf["doc_id"], odf["phonetic_key"]))
    assert s == o


def test_soundex_sql_parity_adversarial(spark):
    # Words the corpus vocabulary may never contain but real text will:
    # H/W-initial words (the drop-first-code step must remove the first
    # letter's own code, not the next one's), H/W-invisible collapses
    # (NIST examples tymczak/ashcraft), non-alpha-initial tokens (Spark
    # passes the input through unchanged), and digits/punct inside words
    # (separator semantics).
    import duckdb

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from gpu_entity_resolver_spark.functions.phonetic import soundex_key

    words = [
        "wright", "php", "hwb", "4runner", "abc123", "pfister", "baba",
        "tymczak", "honeyman", "robert", "rupert", "ashcraft", "ashcroft",
        "wu", "h", "a", "99", "o'neil", "x-ray",
    ]
    sdf = spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["k"]
        for r in sdf.select(
            "doc_id", soundex_key(F.col("text"), 5).alias("k")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT row_number() OVER () AS doc_id, "
        "w AS text FROM (SELECT unnest(?) AS w)",
        [words],
    )
    odf = con.execute(entry_mod.oracle_sql()["phonetic_soundex"]).df()
    want = dict(zip(odf["doc_id"], odf["phonetic_key"]))
    assert got == want


# --- G5 + G10 ensemble in the flagship --------------------------------------

def test_resolve_with_mutual_rank_ensemble(spark):
    from gpu_entity_resolver_spark.plans.resolve import resolve_documents
    from gpu_entity_resolver_spark.sources.webgen import (
        INPUT_COLUMNS,
        generate_documents,
    )

    docs = generate_documents(spark, "/root/testdata/sf0.001").select(
        *INPUT_COLUMNS
    ).limit(400).localCheckpoint(eager=True)
    cfg = ResolverConfig()
    cfg.clustering.ensemble_mutual_rank = True
    out = resolve_documents(spark, docs, cfg).localCheckpoint(eager=True)
    assert out.count() == docs.count()
    srcs = {r["label_source"] for r in out.select("label_source").distinct().collect()}
    assert srcs <= {0, 1, 2} and 0 in srcs
    # default config keeps the column, constant 0
    out0 = resolve_documents(spark, docs)
    assert {r["label_source"] for r in out0.select("label_source").distinct().collect()} == {0}


def test_exact_only_equals_filtered_full(spark, sf_dir):
    """r6b: score_pairs(exact_only=True) must equal the branching form
    filtered to jw-non-null, row for row and bit for bit, on a real corpus
    slice — and likewise with the decision band off (prefilter prunes
    only)."""
    from gpu_entity_resolver_spark.config import BlockingConfig
    from gpu_entity_resolver_spark.operators.blocking import (
        blocking_plan,
        candidate_pairs,
    )
    from gpu_entity_resolver_spark.operators.scoring import score_pairs

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.lower(F.coalesce("text", F.lit(""))).alias("norm_text"),
        )
        .localCheckpoint(eager=True)
    )
    bcfg = BlockingConfig()
    keys, tokens = blocking_plan(docs, "doc_id", "norm_text", cfg=bcfg)
    pairs = candidate_pairs(keys, bcfg, tokens=tokens).localCheckpoint(
        eager=True
    )
    for scfg in (
        ScoringConfig(),
        ScoringConfig(jw_decision_band=None),
    ):
        full = score_pairs(pairs, docs, cfg=scfg).where(
            F.col("jw").isNotNull()
        )
        fast = score_pairs(pairs, docs, cfg=scfg, exact_only=True)
        cols = ["src", "dst", "tfidf_cos", "lev_ratio", "jw", "ph_sim", "score"]
        a = sorted(map(tuple, full.select(*cols).collect()))
        b = sorted(map(tuple, fast.select(*cols).collect()))
        assert len(a) > 0 and a == b


def test_unrolled_dot_equals_fold(spark):
    """r6b: the dim-unrolled codegen dot/norm must be BIT-identical to the
    zip_with/aggregate fold (same left-associative addition order), and the
    CASE guard must route size-mismatched rows to the fold."""
    import random

    from gpu_entity_resolver_spark.operators.similarity import _dot, _norm

    rng = random.Random(99)
    rows = []
    for i in range(500):
        d = 64 if i % 7 else rng.choice([3, 64, 65])  # some mismatched sizes
        rows.append((
            [rng.uniform(-1, 1) for _ in range(d)],
            [rng.uniform(-1, 1) for _ in range(d)],
        ))
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    got = df.select(
        _dot("a", "b", 64).alias("d"), _norm("a", 64).alias("n")
    ).collect()
    want = df.select(_dot("a", "b").alias("d"), _norm("a").alias("n")).collect()
    assert [(r["d"], r["n"]) for r in got] == [(r["d"], r["n"]) for r in want]
