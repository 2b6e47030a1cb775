"""Dual-renderer parity: every function that ships BOTH a Spark Column
expression and a DuckDB SQL string (the oracle gate's foundation) must
agree on adversarial inputs, not just the synthetic corpus vocabulary —
unicode, emoji, HTML fragments, escapes, empties, repeats, long strings.
A divergence here is exactly the corpus-drift failure mode ADVICE r3
flagged for the soundex oracle (fixed and gated separately in
tests/test_round3.py)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from gpu_entity_resolver_spark.functions.normalize import (
    normalize_entity_text,
    normalize_entity_text_sql,
)
from gpu_entity_resolver_spark.functions.textstats import (
    doc_fingerprint,
    doc_fingerprint_sql,
    lang_id_guess,
    lang_id_guess_sql,
    quality_stats,
    quality_stats_sql,
)

ADVERSARIAL = [
    "", " ", "\t\n  ", "ACME & Sons, Inc.", "café société ltd",
    "ÅÄÖ STRASSE ß", "a" * 500, "word " * 100, "123-456", "!!!",
    "mixed CASE Text 42", "naïve co", "日本語テキスト", "emoji 🙂 text",
    "O'Neil & Co; LLC.", "tab\tsep\tvals", "newline\ntext\rhere",
    "  leading and trailing  ", "under_score-dash.dot", "x", "ab",
    "HTML <b>bold</b> &amp; entities", 'quote "inside" it', "back\\slash",
    "percent 100% done", "semi;colon:colon", "ünïcödé müsic",
    "ALL CAPS SENTENCE HERE", "repeat repeat repeat repeat",
    "digits 0123456789",
] + [f"random doc {i} with words alpha beta {i * 7 % 13}" for i in range(30)]


def test_dual_renderers_agree_on_adversarial_strings(spark):
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "id long, text string"
    )
    stats = quality_stats("text")
    got = (
        sdf.select(
            "id",
            normalize_entity_text(F.col("text")).alias("norm"),
            lang_id_guess(F.col("text")).alias("lang"),
            doc_fingerprint(F.col("text")).alias("fp"),
            *[v.alias(k) for k, v in stats.items()],
        )
        .toPandas()
        .set_index("id")
        .sort_index()
    )

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(len(ADVERSARIAL)), "text": ADVERSARIAL}))
    sq = quality_stats_sql("text")
    want = (
        con.execute(
            f"SELECT id, {normalize_entity_text_sql('text')} AS norm, "
            f"{lang_id_guess_sql('text')} AS lang, "
            f"{doc_fingerprint_sql('text')} AS fp, "
            + ", ".join(f"{e} AS {k}" for k, e in sq.items())
            + " FROM t ORDER BY id"
        )
        .df()
        .set_index("id")
        .sort_index()
    )

    diffs = []
    for col in got.columns:
        for i in got.index:
            a, b = got.loc[i, col], want.loc[i, col]
            if (a == b) or (pd.isna(a) and pd.isna(b)):
                continue
            if isinstance(a, float) and isinstance(b, float) and abs(a - b) < 1e-9:
                continue
            diffs.append((col, ADVERSARIAL[i][:40], a, b))
    assert not diffs, diffs[:10]


def test_quality_filter_every_rule_fires_and_renderers_agree(spark):
    import duckdb

    from gpu_entity_resolver_spark.functions.textstats import (
        quality_filter,
        quality_filter_sql,
    )

    rows = [
        (1, "short text"),                                # too_short
        (2, "the " * 200_000),                            # too_long
        (3, "!!! ??? *** " * 10 + "the and is " * 10),    # punct_heavy
        (4, "zebra quark nova lumen pixel " * 10),        # low_stopword
        (5, ("a a of " * 40).strip()),                    # tok_len too small
        (6, ("the " + "x" * 40 + " ") * 20),              # tok_len too large
        (7, "the quick brown fox and the lazy dog are " * 5),  # ok
        (8, None),                                        # null -> too_short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = quality_filter(F.col("text"))
    got = {
        r["doc_id"]: (r["reason"], r["keep"])
        for r in df.select(
            "doc_id", flags["reason"].alias("reason"), flags["keep"].alias("keep")
        ).collect()
    }
    assert got[1] == ("too_short", False)
    assert got[2] == ("too_long", False)
    assert got[3] == ("punct_heavy", False)
    assert got[4] == ("low_stopword", False)
    assert got[5] == ("tok_len_out_of_range", False)
    assert got[6] == ("tok_len_out_of_range", False)
    assert got[7] == ("ok", True)
    assert got[8] == ("too_short", False)

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    sqlf = quality_filter_sql("text")
    oracle = {
        int(r[0]): (r[1], bool(r[2]))
        for r in con.execute(
            f"SELECT doc_id, {sqlf['reason']} AS reason, {sqlf['keep']} AS keep "
            "FROM documents"
        ).fetchall()
    }
    assert oracle == got
