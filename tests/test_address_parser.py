"""P2 address-parser robustness fixture (VERDICT r3 'what's missing' #1).

Hand-labeled expectations for the shapes libpostal handles in the
reference (utils.py:66-97): unit/suite designators, directionals,
comma-free addresses, PO boxes, zip+4, and the malformed strings a messy
address table throws at the parser. Pure-pandas path (the Arrow UDF wraps
the same function; the UDF wiring is covered by the entities golden
tests).
"""

import pandas as pd
import pytest

from gpu_entity_resolver_spark.functions.address import parse_address_series

# (input, street_number, street_name, city, state, zip)
CASES = [
    # the reference README's shape
    ("123 Main St, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("450 Oak Avenue, Peoria IL 61602", "450", "oak avenue", "peoria", "IL", "61602"),
    # zip+4
    ("123 Main St, Rockford IL 61101-2345", "123", "main street", "rockford", "IL", "61101"),
    # unit/suite designators — identical keys with and without
    ("123 Main St Apt 4B, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 Main St, Apt 4B, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 Main St Suite 200, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 Main St Ste 12, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 Main St Unit 7, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 Main St # 5, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 Main St #5, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 Main St Bldg C, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 Main St Fl 2, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 Main St Rm 9, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    # 'FL' as the STATE must survive the floor-designator rule
    ("500 Ocean Dr, Miami FL 33139", "500", "ocean drive", "miami", "FL", "33139"),
    ("500 Ocean Dr Miami FL 33139", "500", "ocean drive", "miami", "FL", "33139"),
    # 'Ste' opening a city name is not a suite
    ("10 Market St, Ste Genevieve MO 63670", "10", "market street", "ste genevieve", "MO", "63670"),
    # directionals
    ("123 N Main St, Rockford IL 61101", "123", "north main street", "rockford", "IL", "61101"),
    ("456 SW Oak Ave, Peoria IL 61602", "456", "southwest oak avenue", "peoria", "IL", "61602"),
    ("789 E State St, Rockford IL 61104", "789", "east state street", "rockford", "IL", "61104"),
    # comma-free
    ("123 Main St Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("123 N Main St Apt 4B Rockford IL 61101", "123", "north main street", "rockford", "IL", "61101"),
    ("11 main st rockford il 61101", "11", "main street", "rockford", "IL", "61101"),
    # comma before the state
    ("123 Main St Rockford, IL 61101", "123", "main street", "rockford", "IL", "61101"),
    # suffix word inside the street NAME: split at the LAST suffix
    ("123 St Marks Pl Brooklyn NY 11221", "123", "st marks place", "brooklyn", "NY", "11221"),
    # multi-word city
    ("77 Lake Shore Dr, East Moline IL 61244", "77", "lake shore drive", "east moline", "IL", "61244"),
    # PO boxes
    ("P.O. Box 57, Rockford IL 61101", "", "po box 57", "rockford", "IL", "61101"),
    ("PO Box 142, Peoria IL 61602", "", "po box 142", "peoria", "IL", "61602"),
    ("po box #99, Moline IL 61265", "", "po box 99", "moline", "IL", "61265"),
    # malformed / degenerate
    ("", "", "", "", "", ""),
    (None, "", "", "", "", ""),
    ("Main Street", "", "main street", "", "", ""),
    ("61101", "61101", "", "", "", ""),
    # --- round-5 long tail (VERDICT r4 item 7; libpostal behavior per
    # reference utils.py:66-97 as the spec) ---
    # intersections: & -> and, suffixes expand on BOTH arms
    ("5th & Main, Rockford IL 61101", "", "5th and main", "rockford", "IL", "61101"),
    ("Main St & 5th Ave, Rockford IL 61101", "", "main street and 5th avenue", "rockford", "IL", "61101"),
    ("Main St & 5th Ave Rockford IL 61101", "", "main street and 5th avenue", "rockford", "IL", "61101"),
    ("Oak Ave and Elm St, Peoria IL 61602", "", "oak avenue and elm street", "peoria", "IL", "61602"),
    # highways / numbered routes (suffix expands before a route number;
    # comma-free split keeps the route number on the street side)
    ("1200 US Highway 12, Genoa City WI 53128", "1200", "us highway 12", "genoa city", "WI", "53128"),
    ("1200 US Hwy 12 Genoa City WI 53128", "1200", "us highway 12", "genoa city", "WI", "53128"),
    # Wisconsin-style grid house number
    ("N4452 State Route 45, Eldorado WI 54932", "n4452", "state route 45", "eldorado", "WI", "54932"),
    # suffix expands before a trailing directional
    ("Hwy 61 S, Natchez MS 39120", "", "highway 61 south", "natchez", "MS", "39120"),
    ("Rte 9, Fishkill NY 12524", "", "route 9", "fishkill", "NY", "12524"),
    # rural routes (box stays in the street phrase, not the city)
    ("RR 2 Box 152, Glasgow KY 42141", "", "rural route 2 box 152", "glasgow", "KY", "42141"),
    ("R.R. 2, Glasgow KY 42141", "", "rural route 2", "glasgow", "KY", "42141"),
    ("Rural Route 2 Box 15 Glasgow KY 42141", "", "rural route 2 box 15", "glasgow", "KY", "42141"),
    # unit BEFORE the street address
    ("Apt 4B 123 Main St, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
    ("Unit 7, 123 Main St, Rockford IL 61101", "123", "main street", "rockford", "IL", "61101"),
]


def test_highway_variants_share_one_key():
    # abbreviated and expanded route forms must land on one blocking key
    variants = pd.Series(
        [
            "1200 US Highway 12, Genoa City WI 53128",
            "1200 US Hwy 12 Genoa City WI 53128",
            "1200 US HWY 12, Genoa City, WI 53128",
        ]
    )
    out = parse_address_series(variants)
    keys = (
        out["street_number"] + "|" + out["street_name"] + "|" + out["city"]
        + "|" + out["state"] + "|" + out["zip"]
    )
    assert keys.nunique() == 1, keys.tolist()


@pytest.mark.parametrize("case", CASES, ids=[str(c[0])[:40] for c in CASES])
def test_parse_shapes(case):
    raw, num, street, city, state, zc = case
    out = parse_address_series(pd.Series([raw]))
    got = out.iloc[0]
    assert got["street_number"] == num, f"number: {got.to_dict()}"
    assert got["street_name"] == street, f"street: {got.to_dict()}"
    assert got["city"] == city, f"city: {got.to_dict()}"
    assert got["state"] == state, f"state: {got.to_dict()}"
    assert got["zip"] == zc, f"zip: {got.to_dict()}"


def test_unit_variants_share_one_key():
    variants = pd.Series(
        [
            "123 Main St, Rockford IL 61101",
            "123 Main St Apt 4B, Rockford IL 61101",
            "123 Main St Suite 200, Rockford IL 61101",
            "123 Main St # 5, Rockford IL 61101",
            "123 Main St Rockford IL 61101",
            "123 Main St Rockford, IL 61101",
        ]
    )
    out = parse_address_series(variants)
    keys = (
        out["street_number"] + "|" + out["street_name"] + "|" + out["city"]
        + "|" + out["state"] + "|" + out["zip"]
    )
    assert keys.nunique() == 1, keys.tolist()


def test_vectorized_batch_alignment():
    # mixed shapes in one batch must not cross-contaminate rows
    mixed = pd.Series(
        [
            "123 Main St, Rockford IL 61101",
            "P.O. Box 57, Rockford IL 61101",
            "500 Ocean Dr Miami FL 33139",
            "",
        ]
    )
    out = parse_address_series(mixed)
    assert out["street_name"].tolist() == [
        "main street", "po box 57", "ocean drive", ""
    ]
    assert out["state"].tolist() == ["IL", "IL", "FL", ""]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(max_size=80),  # arbitrary unicode junk
            st.text(
                alphabet="0123456789 abcdefghijklmnopqrstuvwxyz.,#&-", max_size=80
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_parser_total_on_arbitrary_input(rows):
    """Web-scale crash safety: the parser is TOTAL — any batch of junk
    (None, unicode, control chars, commas everywhere) parses without
    raising, returns one aligned row per input with the full column set,
    and every output is a string (no NaN leaks into downstream keys)."""
    out = parse_address_series(pd.Series(rows, dtype=object))
    assert list(out.columns) == [
        "street_number", "street_name", "city", "state", "zip"
    ]
    assert len(out) == len(rows)
    for col in out.columns:
        assert out[col].map(lambda v: isinstance(v, str)).all(), col
