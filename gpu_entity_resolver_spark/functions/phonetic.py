"""Phonetic encoding (SURVEY.md §2.2 P5, §2.7 V2).

The reference encodes the first 5 words with Metaphone via per-row CPU
``.apply`` (reference resolver.py:357-362) and builds a binary
CountVectorizer over the phonetic tokens (resolver.py:353-369). Here:

- ``soundex_key`` — Spark's built-in JVM ``soundex`` per word (cheap path,
  whole-stage codegen, zero Python);
- ``metaphone_udf`` — a classic-Metaphone implementation over Arrow
  batches for reference-faithful keys (used for blocking keys and the
  phonetic-overlap score, not in the per-pair hot path).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_VOWELS = "AEIOU"


def _metaphone(word: str) -> str:
    """Classic Metaphone (Lawrence Philips 1990), compact implementation."""
    w = re.sub(r"[^A-Z]", "", word.upper())
    if not w:
        return ""
    # initial-letter exceptions
    if w[:2] in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[:1] == "X":
        w = "S" + w[1:]
    elif w[:2] == "WH":
        w = "W" + w[2:]
    out = []
    i = 0
    n = len(w)
    while i < n and len(out) < 8:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        prev = w[i - 1] if i > 0 else ""
        # drop duplicate adjacent letters except C
        if c == prev and c != "C":
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and prev == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and i + 2 < n and w[i + 2] == "A":
                out.append("X")
            elif nxt == "H":
                out.append("X")
                i += 1
            elif nxt in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and i + 2 < n and w[i + 2] in "EYI":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                if i + 2 < n and w[i + 2] not in _VOWELS:
                    pass  # silent GH
                else:
                    out.append("K")
                    i += 1
            elif nxt == "N":
                pass  # silent as in GNOME/SIGN
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if prev in _VOWELS and nxt not in _VOWELS:
                pass
            elif prev in "CSPTG":
                pass
            else:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if prev != "C":
                out.append("K")
        elif c == "P":
            if nxt == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt == "I" and i + 2 < n and w[i + 2] in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "H":
                out.append("0")
                i += 1
            elif nxt == "I" and i + 2 < n and w[i + 2] in "OA":
                out.append("X")
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "X":
            out.append("KS")
        elif c == "Y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out)


def metaphone_series(texts: pd.Series, max_words: int = 5) -> pd.Series:
    """Metaphone of the first ``max_words`` words, space-joined — the
    reference's ``multi_phonetic`` semantics (resolver.py:357-362)."""
    def enc(t):
        if not isinstance(t, str) or not t:
            return ""
        return " ".join(_metaphone(p) for p in t.split()[:max_words])

    return texts.map(enc, na_action=None).fillna("")


@pandas_udf(StringType())
def metaphone_udf(texts: pd.Series) -> pd.Series:
    return metaphone_series(texts)


def soundex_key(col: Column, max_words: int = 5) -> Column:
    """JVM-only cheap phonetic key: soundex per word over the first
    ``max_words`` words."""
    words = F.slice(F.split(F.trim(col), r"\s+"), 1, max_words)
    return F.array_join(F.transform(words, lambda w: F.soundex(w)), " ")
