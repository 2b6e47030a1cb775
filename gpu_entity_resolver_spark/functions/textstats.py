"""Text-analysis operators for a large-scale training-data pipeline:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All JVM-side Column expressions (no Python UDFs), each with
a DuckDB-SQL twin for the oracle harness.

These extend the reference's scope (it has no text-corpus analytics) as
required by the build brief; the column-expression style mirrors the
reference's vectorized cuDF string ops (reference resolver.py:148-176).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword list shared by both renderers (quality scoring only).
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for null/empty/blank strings."""
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def token_count_sql(expr: str) -> str:
    return (
        f"CAST(CASE WHEN trim(coalesce({expr}, '')) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(trim(coalesce({expr}, '')), '\\s+')) "
        f"END AS BIGINT)"
    )


def quality_stats(col: Column) -> dict[str, Column]:
    """Quality-signal columns: char count, punctuation count, digit count,
    stopword hits, mean token length (x100, integer for hash stability)."""
    t = F.coalesce(col, F.lit(""))
    n_chars = F.length(t).cast("long")
    n_punct = (
        n_chars - F.length(F.regexp_replace(t, r"[^a-zA-Z0-9\s]", ""))
    ).cast("long")
    n_digits = (
        n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    ).cast("long")
    low = F.lower(t)
    stop_hits = None
    for w in _STOPWORDS:
        hits = F.size(F.regexp_extract_all(low, F.lit(rf"\b{w}\b"), F.lit(0)))
        stop_hits = hits if stop_hits is None else stop_hits + hits
    n_tokens = token_count(col)
    # floor() in both renderers: DuckDB's CAST(double AS BIGINT) rounds
    # half-even while Spark's cast truncates — floor is the common ground.
    mean_tok_len_x100 = F.when(n_tokens > 0,
        F.floor((n_chars - (n_tokens - 1)) * 100 / n_tokens)
    ).otherwise(F.lit(0)).cast("long")
    return {
        "n_chars": n_chars,
        "n_punct": n_punct,
        "n_digits": n_digits,
        "n_stopwords": stop_hits.cast("long"),
        "n_tokens": n_tokens,
        "mean_tok_len_x100": mean_tok_len_x100,
    }


def quality_stats_sql(expr: str) -> dict[str, str]:
    t = f"coalesce({expr}, '')"
    n_chars = f"CAST(length({t}) AS BIGINT)"
    n_punct = (
        f"CAST(length({t}) - length(regexp_replace({t}, '[^a-zA-Z0-9\\s]', '', 'g')) AS BIGINT)"
    )
    n_digits = f"CAST(length({t}) - length(regexp_replace({t}, '[0-9]', '', 'g')) AS BIGINT)"
    stop_terms = " + ".join(
        f"len(regexp_extract_all(lower({t}), '\\b{w}\\b'))" for w in _STOPWORDS
    )
    n_tokens = token_count_sql(expr)
    mean = (
        f"CAST(CASE WHEN {n_tokens} > 0 THEN "
        f"floor(({n_chars} - ({n_tokens} - 1)) * 100 / {n_tokens}) "
        f"ELSE 0 END AS BIGINT)"
    )
    return {
        "n_chars": n_chars,
        "n_punct": n_punct,
        "n_digits": n_digits,
        "n_stopwords": f"CAST({stop_terms} AS BIGINT)",
        "n_tokens": n_tokens,
        "mean_tok_len_x100": mean,
    }


def lang_id_guess(col: Column) -> Column:
    """Heuristic language ID from function-word hits (en/de/fr/es), 'und'
    otherwise. Pure Column expression; deterministic."""
    low = F.lower(F.coalesce(col, F.lit("")))

    def hits(words: tuple[str, ...]) -> Column:
        total = None
        for w in words:
            h = F.size(F.regexp_extract_all(low, F.lit(rf"\b{w}\b"), F.lit(0)))
            total = h if total is None else total + h
        return total

    en = hits(_LANG_WORDS["en"])
    de = hits(_LANG_WORDS["de"])
    fr = hits(_LANG_WORDS["fr"])
    es = hits(_LANG_WORDS["es"])
    best = F.greatest(en, de, fr, es)
    return (
        F.when(best == 0, "und")
        .when(en == best, "en")
        .when(de == best, "de")
        .when(fr == best, "fr")
        .otherwise("es")
    )


_LANG_WORDS = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "die", "das", "und", "mit"),
    "fr": ("le", "la", "les", "et", "avec"),
    "es": ("el", "los", "las", "y", "con"),
}


def lang_id_guess_sql(expr: str) -> str:
    """DuckDB twin of :func:`lang_id_guess` (same word lists, same
    greatest/tie-break order)."""
    t = f"lower(coalesce({expr}, ''))"
    hits = {
        lang: " + ".join(
            f"len(regexp_extract_all({t}, '\\b{w}\\b'))" for w in words
        )
        for lang, words in _LANG_WORDS.items()
    }
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    best = f"greatest({en}, {de}, {fr}, {es})"
    return (
        f"(CASE WHEN {best} = 0 THEN 'und' "
        f"WHEN ({en}) = {best} THEN 'en' "
        f"WHEN ({de}) = {best} THEN 'de' "
        f"WHEN ({fr}) = {best} THEN 'fr' "
        f"ELSE 'es' END)"
    )


def doc_fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key. md5 is identical across Spark and DuckDB."""
    norm = F.trim(F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), r"\s+", " "))
    return F.md5(norm)


def doc_fingerprint_sql(expr: str) -> str:
    norm = f"trim(regexp_replace(lower(coalesce({expr}, '')), '\\s+', ' ', 'g'))"
    return f"md5({norm})"


def quality_filter(
    col: Column,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.005,
    min_mean_tok_len_x100: int = 150,
    max_mean_tok_len_x100: int = 1500,
) -> dict[str, Column]:
    """Composite C4/Gopher-style quality gate from the quality_stats
    signals: (reason, keep) where reason names the FIRST failing rule in a
    fixed order ('ok' when none fails) and keep = reason == 'ok'. Ratio
    rules compare via double multiplication of integer counts — the same
    IEEE ops in both renderers, so the SQL twin matches exactly."""
    s = quality_stats(col)
    reason = (
        F.when(s["n_tokens"] < min_tokens, F.lit("too_short"))
        .when(s["n_tokens"] > max_tokens, F.lit("too_long"))
        .when(
            s["n_punct"].cast("double")
            > F.lit(float(max_punct_ratio)) * s["n_chars"].cast("double"),
            F.lit("punct_heavy"),
        )
        .when(
            s["n_stopwords"].cast("double")
            < F.lit(float(min_stopword_ratio)) * s["n_tokens"].cast("double"),
            F.lit("low_stopword"),
        )
        .when(
            (s["mean_tok_len_x100"] < min_mean_tok_len_x100)
            | (s["mean_tok_len_x100"] > max_mean_tok_len_x100),
            F.lit("tok_len_out_of_range"),
        )
        .otherwise(F.lit("ok"))
    )
    return {"reason": reason, "keep": reason == F.lit("ok")}


def quality_filter_sql(
    expr: str,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.005,
    min_mean_tok_len_x100: int = 150,
    max_mean_tok_len_x100: int = 1500,
) -> dict[str, str]:
    s = quality_stats_sql(expr)
    reason = (
        "CASE "
        f"WHEN {s['n_tokens']} < {min_tokens} THEN 'too_short' "
        f"WHEN {s['n_tokens']} > {max_tokens} THEN 'too_long' "
        f"WHEN CAST({s['n_punct']} AS DOUBLE) > {max_punct_ratio!r} * "
        f"CAST({s['n_chars']} AS DOUBLE) THEN 'punct_heavy' "
        f"WHEN CAST({s['n_stopwords']} AS DOUBLE) < {min_stopword_ratio!r} * "
        f"CAST({s['n_tokens']} AS DOUBLE) THEN 'low_stopword' "
        f"WHEN {s['mean_tok_len_x100']} < {min_mean_tok_len_x100} "
        f"OR {s['mean_tok_len_x100']} > {max_mean_tok_len_x100} "
        "THEN 'tok_len_out_of_range' "
        "ELSE 'ok' END"
    )
    return {"reason": reason, "keep": f"({reason}) = 'ok'"}
