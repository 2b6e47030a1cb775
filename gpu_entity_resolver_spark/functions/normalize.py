"""Scalar string operators P1/P3/P4/P6/P8/P10 (SURVEY.md §2.2) as pure Spark
Column expressions — JVM-side, whole-stage-codegen friendly, no Python in the
hot path.

Each operator has two renderers driven by ONE rule table:

- ``*_text(col)``  -> pyspark Column (what the engine runs);
- ``*_sql(expr)``  -> ANSI SQL string (what the DuckDB oracle runs).

Keeping both renderers next to the shared rule list is what guarantees the
driver's Spark-vs-DuckDB value-hash comparison stays green as rules evolve.

Semantics re-expressed from the reference:
- name normalization: reference resolver.py:130-182 (lower, '&'/'+' -> ' and ',
  strip parentheticals, keep text after DBA/FKA/AKA, word replacements,
  legal-suffix strip, punctuation strip, trailing-number strip, space collapse);
- address key: reference utils.py:99-127; address completeness score:
  reference utils.py:129-166; binning: reference resolver.py:1166-1169.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import DEFAULT_REPLACEMENTS, DEFAULT_SUFFIXES

# DBA/FKA/AKA extraction — keep only the text after the marker
# (reference resolver.py:158-162). Same regex works in Java regex and RE2.
_DBA_PATTERN = (
    r"(?:\s|^)(?:d[/ ]?b[/ ]?a|f[/ ]?k[/ ]?a|a[/ ]?k[/ ]?a)\s+(.*)"
)


def _replacement_rules(
    replacements: dict[str, str] | None = None,
    suffixes: tuple[str, ...] | None = None,
) -> list[tuple[str, str]]:
    """Ordered (pattern, replacement) rules shared by both renderers."""
    replacements = DEFAULT_REPLACEMENTS if replacements is None else replacements
    suffixes = DEFAULT_SUFFIXES if suffixes is None else suffixes
    rules: list[tuple[str, str]] = []
    for old, new in replacements.items():
        rules.append((r"\b" + re.escape(old) + r"\b", new))
    if suffixes:
        alt = "|".join(re.escape(s) for s in suffixes)
        rules.append((r"\b(" + alt + r")\b", ""))
    # Final cleanup (reference resolver.py:174-177): non-word chars -> space,
    # strip trailing digits, collapse whitespace. We use an explicit ASCII
    # class instead of \w so Spark (Java regex) and DuckDB (RE2) agree on
    # unicode classes.
    rules.append((r"[^a-z0-9_\s]", " "))
    rules.append((r"\s+\d+$", ""))
    rules.append((r"\s+", " "))
    return rules


def normalize_entity_text(
    col: Column,
    replacements: dict[str, str] | None = None,
    suffixes: tuple[str, ...] | None = None,
) -> Column:
    """P1 — entity-name normalization as a chained Column expression."""
    s = F.lower(F.coalesce(col, F.lit("")))
    s = F.regexp_replace(s, r"&", " and ")
    s = F.regexp_replace(s, r"\+", " and ")
    s = F.regexp_replace(s, r"\([^)]*\)", "")
    extracted = F.regexp_extract(s, _DBA_PATTERN, 1)
    s = F.when(extracted != "", extracted).otherwise(s)
    for pat, rep in _replacement_rules(replacements, suffixes):
        s = F.regexp_replace(s, pat, rep)
    return F.trim(s)


def normalize_entity_text_sql(
    expr: str,
    replacements: dict[str, str] | None = None,
    suffixes: tuple[str, ...] | None = None,
) -> str:
    """P1 rendered as DuckDB SQL (regexp_replace needs the 'g' flag there)."""
    s = f"lower(coalesce({expr}, ''))"
    s = f"regexp_replace({s}, '&', ' and ', 'g')"
    s = f"regexp_replace({s}, '\\+', ' and ', 'g')"
    s = f"regexp_replace({s}, '\\([^)]*\\)', '', 'g')"
    dba = _DBA_PATTERN.replace("'", "''")
    s = (
        f"(CASE WHEN coalesce(regexp_extract({s}, '{dba}', 1), '') <> '' "
        f"THEN regexp_extract({s}, '{dba}', 1) ELSE {s} END)"
    )
    for pat, rep in _replacement_rules(replacements, suffixes):
        # DuckDB standard single-quoted literals pass backslashes through
        # verbatim, so regex escapes need no doubling — only quote doubling.
        pat_sql = pat.replace("'", "''")
        s = f"regexp_replace({s}, '{pat_sql}', '{rep}', 'g')"
    return f"trim({s})"


# --- Address key / completeness score (P3, P4) -----------------------------

_ADDR_COLS = ("addr_street_number", "addr_street_name", "addr_city",
              "addr_state", "addr_zip")


def address_key(*cols: Column) -> Column:
    """P3 — normalized address key: concat components, lower, collapse spaces
    (reference utils.py:99-127). Accepts the 5 component columns in order."""
    joined = F.concat_ws(" ", *[F.coalesce(c, F.lit("")) for c in cols])
    return F.trim(F.regexp_replace(F.lower(joined), r"\s+", " "))


def address_key_sql(*exprs: str) -> str:
    joined = " || ' ' || ".join(f"coalesce({e}, '')" for e in exprs)
    return f"trim(regexp_replace(lower({joined}), '\\s+', ' ', 'g'))"


def address_score(
    street_number: Column, street_name: Column, city: Column,
    state: Column, zip_code: Column,
) -> Column:
    """P4 — weighted completeness: street name x2; number/city x1; 2-char
    state x1; 5-digit zip x1 (reference utils.py:129-166)."""
    nz = lambda c: (c.isNotNull() & (c != "")).cast("int")  # noqa: E731
    return (
        nz(street_name) * 2
        + nz(street_number)
        + nz(city)
        + (state.isNotNull() & (F.length(state) == 2)).cast("int")
        + (
            zip_code.isNotNull()
            & (F.length(zip_code) == 5)
            & zip_code.rlike(r"^[0-9]+$")
        ).cast("int")
    ).cast("int")


def address_score_sql(
    street_number: str, street_name: str, city: str, state: str, zip_code: str,
) -> str:
    nz = lambda e: f"(CASE WHEN {e} IS NOT NULL AND {e} <> '' THEN 1 ELSE 0 END)"  # noqa: E731
    return (
        f"CAST({nz(street_name)} * 2 + {nz(street_number)} + {nz(city)}"
        f" + (CASE WHEN {state} IS NOT NULL AND length({state}) = 2 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {zip_code} IS NOT NULL AND length({zip_code}) = 5"
        f"      AND regexp_matches({zip_code}, '^[0-9]+$') THEN 1 ELSE 0 END)"
        f" AS INTEGER)"
    )


def confidence_bin(score: Column) -> Column:
    """P8 — bin confidence into Low/Medium/High/VeryHigh with the reference's
    cut points [0, .5, .7, .85, 1] (reference resolver.py:1166-1169)."""
    return (
        F.when(score <= 0.5, "Low")
        .when(score <= 0.7, "Medium")
        .when(score <= 0.85, "High")
        .otherwise("VeryHigh")
    )
