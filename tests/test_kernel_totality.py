"""Crash-safety property tests for every Python kernel a 100 TB run feeds
raw web bytes into: each must be TOTAL (no exception on any input), return
one aligned string per input row, and be deterministic (same batch twice →
byte-identical output — the north rule's per-row invariant)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gpu_entity_resolver_spark.functions.extraction import extract_text_series
from gpu_entity_resolver_spark.functions.phonetic import metaphone_series
from gpu_entity_resolver_spark.functions.simfns import jaro_winkler

_junk = st.one_of(
    st.none(),
    st.text(max_size=120),
    st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=0x10FFFF,
                                   exclude_categories=("Cs",)), max_size=60),
)


def _total_and_deterministic(fn, rows):
    s = pd.Series(rows, dtype=object)
    out1, out2 = fn(s), fn(s)
    assert len(out1) == len(rows)
    assert out1.map(lambda v: isinstance(v, str)).all()
    assert out1.equals(out2)


@settings(max_examples=150, deadline=None)
@given(st.lists(_junk, min_size=1, max_size=6))
def test_metaphone_total(rows):
    _total_and_deterministic(metaphone_series, rows)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=200)),
                min_size=1, max_size=5))
def test_extraction_total_on_arbitrary_bytes(rows):
    s = pd.Series(rows, dtype=object)
    out1, out2 = extract_text_series(s), extract_text_series(s)
    assert len(out1) == len(rows)
    assert out1.map(lambda v: isinstance(v, str)).all()
    assert out1.equals(out2)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.text(max_size=80), st.text(max_size=80)),
                min_size=1, max_size=6))
def test_jaro_winkler_total_and_bounded(pairs):
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    out = jaro_winkler(a, b)
    assert len(out) == len(pairs)
    assert ((out >= 0.0) & (out <= 1.0)).all()
