"""Scorer parity (SURVEY.md §5.1): the numpy-vectorized Jaro-Winkler must
agree with an independent scalar oracle — DuckDB's jaro_winkler_similarity."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gpu_entity_resolver_spark.functions.simfns import jaro_winkler

_con = duckdb.connect()


def oracle(a: str, b: str) -> float:
    return _con.execute(
        "select jaro_winkler_similarity(?::varchar, ?::varchar)", [a, b]
    ).fetchone()[0]


KNOWN = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("", ""),
    ("abc", ""),
    ("", "abc"),
    ("same", "same"),
    ("crystal clean", "crystal clean llc"),
    ("a", "a"),
    ("ab", "ba"),
]


def test_known_pairs_match_duckdb():
    a = pd.Series([p[0] for p in KNOWN])
    b = pd.Series([p[1] for p in KNOWN])
    got = jaro_winkler(a, b)
    want = np.array([oracle(x, y) for x, y in KNOWN])
    np.testing.assert_allclose(got, want, atol=1e-9)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefg 123", max_size=20),
            st.text(alphabet="abcdefg 123", max_size=20),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_random_pairs_match_duckdb(pairs):
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = jaro_winkler(a, b)
    want = np.array([oracle(x, y) for x, y in pairs])
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_chunking_invariance():
    rng = np.random.default_rng(42)
    words = ["crystal", "clean", "midwest", "waste", "service", "truck"]
    a = pd.Series([" ".join(rng.choice(words, 3)) for _ in range(500)])
    b = pd.Series([" ".join(rng.choice(words, 3)) for _ in range(500)])
    full = jaro_winkler(a, b, chunk_rows=4096)
    small = jaro_winkler(a, b, chunk_rows=7)
    np.testing.assert_array_equal(full, small)
