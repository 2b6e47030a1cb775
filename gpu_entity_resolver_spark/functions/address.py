"""Address parsing (SURVEY.md §2.2 P2).

The reference shells out to libpostal per row (reference utils.py:66-97,
resolver.py:205-219 — a GPU→CPU→GPU round trip with per-row ``.apply``).
libpostal is not available here; this module provides a deterministic
regex-based US-style parser, implemented as ONE Arrow-vectorized pandas
UDF returning a struct — no per-row Python, and a drop-in seam for a
libpostal-backed implementation where the library exists.

Handled shapes (tests/test_address_parser.py pins each):
- "123 Main St, Rockford IL 61101" (the reference README's shape);
- comma-free: "123 Main St Rockford IL 61101" — the state+zip tail is
  anchored, then street and city split at the last street-suffix token
  (last, so suffix words inside street NAMES — "St Marks Pl" — stay in
  the street);
- "123 Main St Rockford, IL 61101" (comma before the state);
- unit/suite designators ("Apt 4B", "Suite 200", "Ste 12", "Unit 7",
  "# 5", "Bldg C", "Fl 2", "Rm 9") are stripped wherever they appear —
  libpostal routes them to a separate `unit` field the reference never
  consumes (utils.py:86-97 keeps house_number/road/city/state/postcode),
  so the struct stays stable and keys line up with and without units.
  A designator counts only when its value carries a digit or is a
  single letter: "Fl 2" strips, Florida's "FL 33101" and city names
  like "Ste Genevieve" don't;
- directionals ("123 N Main St" / "456 SW Oak Ave") expand to their full
  words inside the street name, mirroring libpostal's expand_address;
- PO boxes ("P.O. Box 57") and zip+4.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

ADDRESS_STRUCT = StructType(
    [
        StructField("street_number", StringType()),
        StructField("street_name", StringType()),
        StructField("city", StringType()),
        StructField("state", StringType()),
        StructField("zip", StringType()),
    ]
)

# Street-suffix expansions, the spirit of libpostal's expand_address
# (reference utils.py:75-78): normalize abbreviations so keys line up.
_SUFFIX_EXPANSIONS = {
    "st": "street", "str": "street",
    "ave": "avenue", "av": "avenue",
    "rd": "road", "dr": "drive", "blvd": "boulevard", "ln": "lane",
    "hwy": "highway", "pkwy": "parkway", "ct": "court", "pl": "place",
    "cir": "circle", "ter": "terrace", "trl": "trail",
}

# Directional expansions (two-letter first so "ne" expands as one token).
_DIRECTIONALS = {
    "ne": "northeast", "nw": "northwest",
    "se": "southeast", "sw": "southwest",
    "n": "north", "s": "south", "e": "east", "w": "west",
}

# every token that can END a street phrase, for the suffix-anchored split
# (longest first so "street" wins over "st" in the alternation)
_SUFFIX_TOKENS = sorted(
    set(_SUFFIX_EXPANSIONS)
    | set(_SUFFIX_EXPANSIONS.values())
    | {"way", "route", "rte"},
    key=len,
    reverse=True,
)
_SUFFIX_ALT = "|".join(_SUFFIX_TOKENS)
# street phrase = optional number + words, ending at the LAST suffix token
# (plus an optional route number: "US Highway 12"), followed by at least
# one trailing (city) word. The leading number is optional so
# intersections ("Main St & 5th Ave Rockford ...") and un-numbered
# streets still split at the suffix boundary.
_STREET_CITY_RE = (
    rf"(?i)^((?:\d+\s+)?.*\b(?:{_SUFFIX_ALT})\.?(?:\s+\d+)?)\s+(.+)$"
)

# rural-route shapes: "RR 2 Box 152" / "R.R. 2" / "Rural Route 2 Box 15"
# (libpostal files these under po_box/road; the reference consumes only
# road, so they normalize into street_name)
_RR_RE = (
    r"(?i)\b(?:r\.?\s*r\.?|rural\s+route)\s*#?\s*(\d+)"
    r"(?:\s+box\s+#?\s*(\d+))?\b"
)

# unit/suite designator + value. The value must carry a digit (not a
# bare 5-digit zip) or be a single letter — so "Fl 2" is a unit but
# Florida's "FL 33101" is not, and "Ste Genevieve" stays a city.
_UNIT_VAL = r"(?:(?!\d{5}\b)(?=[\w-]*\d)[\w-]+|[A-Za-z])"
_UNIT_RE = (
    r"(?i)[,\s]*\b(?:apartment|apt|suite|ste|unit|bldg|building|"
    rf"floor|fl|room|rm)\.?\s*#?\s*{_UNIT_VAL}\b"
    rf"|[,\s]*#\s*{_UNIT_VAL}\b"
)

_STATE_RE = r"\b([A-Z]{2})\b"
# comma-free tail anchor: "... <city words> <ST> <zip>" at end of string
_TAIL_RE = r"^(.*?)[\s,]+([A-Za-z]{2})\s+(\d{5})(?:-\d{4})?$"


def _rr_street(m) -> str:
    box = f" box {m.group(2)}" if m.group(2) else ""
    return f"rural route {m.group(1)}{box} "


def _expand_street(street: pd.Series) -> pd.Series:
    """Lowercase, strip punctuation, expand suffix abbreviations and
    directional tokens.

    Suffixes expand at the END of the street phrase (the conservative
    default that keeps "St Marks Pl"'s inner "St" a name word) and in the
    three other positions where a token is provably a suffix, not a name:
    before " and " (intersections: "Main St & 5th Ave"), before a route
    number ("US Hwy 12"), and before a trailing directional
    ("Hwy 61 S")."""
    out = (
        street.str.lower()
        .str.replace(r"&", " and ", regex=True)
        .str.replace(r"[^\w\s]", " ", regex=True)
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )
    out = out.str.replace(_RR_RE + r"\s*", _rr_street, regex=True)
    for abbr, full in _DIRECTIONALS.items():
        out = out.str.replace(rf"\b{abbr}\b", full, regex=True)
    dir_alt = "|".join(_DIRECTIONALS.values())
    for abbr, full in _SUFFIX_EXPANSIONS.items():
        out = out.str.replace(
            rf"\b{abbr}\b(?=$|\s+and\s|\s+\d|\s+(?:{dir_alt})$)",
            full,
            regex=True,
        )
    out = out.str.replace(r"\brte\b", "route", regex=True)
    return out.str.replace(r"\s+", " ", regex=True).str.strip()


def _clean_city(city: pd.Series) -> pd.Series:
    return (
        city.str.replace(r"\b\d{5}(?:-\d{4})?\b", "", regex=True)
        .str.replace(_STATE_RE, "", regex=True)
        .str.replace(r"[^\w\s]", " ", regex=True)
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
        .str.lower()
    )


def parse_address_series(addr: pd.Series) -> pd.DataFrame:
    """Vectorized parse of US-style address strings (see module doc for
    the handled shapes)."""
    s = addr.fillna("").astype(str).str.strip()

    # PO Box special case (reference utils.py:80-84)
    po = s.str.extract(r"(?i)\bp\.?\s*o\.?\s*box\s*#?\s*(\d+)", expand=False)

    # unit/suite designators carry no signal the reference consumes —
    # strip them before any split, so "123 Main St Apt 4B, Rockford IL"
    # and "123 Main St, Rockford IL" produce identical keys
    s_clean = (
        s.str.replace(_UNIT_RE, " ", regex=True)
        # unit-FIRST shapes ("Unit 7, 123 Main St, ...") leave a leading
        # comma behind; drop it so the comma split sees the street first
        .str.replace(r"^[\s,]+", "", regex=True)
        .str.replace(r"\s+,", ",", regex=True)
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )

    has_comma = s_clean.str.contains(",", regex=False)

    # --- comma path: "NUMBER STREET, CITY STATE ZIP" --------------------
    parts = s_clean.str.split(",", n=2, expand=True).reindex(columns=[0, 1, 2])
    first = parts[0].fillna("")
    rest = (parts[1].fillna("") + " " + parts[2].fillna("")).str.strip()

    # --- comma-free path: anchor the "<ST> <zip>" tail, then split the
    # head into street + city at the last street-suffix token ------------
    tail = s_clean.str.extract(_TAIL_RE)
    head = tail[0].fillna("")
    head_split = head.str.extract(_STREET_CITY_RE)
    cf = (~has_comma) & tail[0].notna()
    # suffix found: street = up to it, city = after; no suffix: whole
    # head stays street (city unrecoverable without a gazetteer)
    first = first.mask(cf, head_split[0].fillna(head))
    cf_city = head_split[1].fillna("")

    # --- "NUMBER STREET CITY, ST ZIP" (comma before the state):
    # city tokens live in `first`; pull them out at the suffix boundary
    rest_is_tail = rest.str.match(r"^(?i:[A-Za-z]{2})\s+\d{5}(?:-\d{4})?$")
    first_split = first.str.extract(_STREET_CITY_RE)
    cs = has_comma & rest_is_tail.fillna(False) & first_split[0].notna()
    first = first.mask(cs, first_split[0])

    # house number: digits, or a Wisconsin/Illinois-style grid number
    # ("N4452", "W130N10497" simplifies to the leading token) — libpostal
    # files both under house_number. A number fused to letters on the
    # RIGHT ("5th", "61101st"?) is an ordinal street name, not a house
    # number, so the match must end at a digit→space boundary.
    _NUM = r"(?i)^\s*([nwse]?\d+)(?:\s|$)"
    street_number = (
        first.str.extract(_NUM, expand=False).fillna("").str.lower()
    )
    street_name = _expand_street(
        first.str.replace(_NUM + r"\s*", "", regex=True)
    )

    zips = rest.str.extract(r"\b(\d{5})(?:-\d{4})?\b", expand=False)
    zips = zips.mask(cf, tail[2]).fillna("")
    # comma-free / comma-tail states were anchored (case-insensitive);
    # the general comma path keeps the uppercase-only match (a lowercase
    # 2-letter word mid-city, e.g. "st" in "st louis", is not a state)
    state = rest.str.extract(_STATE_RE, expand=False)
    state = state.mask(cf, tail[1].str.upper())
    state = state.mask(
        cs, rest.str.extract(r"^([A-Za-z]{2})\b", expand=False).str.upper()
    ).fillna("")
    city = _clean_city(rest)
    city = city.mask(cf, _clean_city(cf_city))
    city = city.mask(cs, _clean_city(first_split[1].fillna("")))

    # rural routes: street is the whole "rural route N [box B]" phrase;
    # the suffix-anchored split would otherwise cut at "route" and push
    # the box segment into the city
    rr = s_clean.str.extract(_RR_RE)
    is_rr = rr[0].notna()
    street_name = street_name.mask(
        is_rr,
        (
            "rural route " + rr[0].fillna("")
            + (" box " + rr[1]).where(rr[1].notna(), "")
        ).str.strip(),
    )
    street_number = street_number.mask(is_rr, "")
    rr_rest = _clean_city(
        head.str.replace(_RR_RE, " ", regex=True)
    )
    city = city.mask(cf & is_rr, rr_rest)
    city = city.mask(
        cs & is_rr,
        _clean_city(parts[0].fillna("").str.replace(_RR_RE, " ", regex=True)),
    )

    is_po = po.notna()
    street_name = street_name.mask(is_po, "po box " + po.fillna(""))
    street_number = street_number.mask(is_po, "")

    return pd.DataFrame(
        {
            "street_number": street_number,
            "street_name": street_name,
            "city": city,
            "state": state.str.upper(),
            "zip": zips,
        }
    )


@pandas_udf(ADDRESS_STRUCT)
def parse_address_udf(addr: pd.Series) -> pd.DataFrame:
    return parse_address_series(addr)


def parsed_address(col: Column) -> Column:
    """Struct column (street_number, street_name, city, state, zip)."""
    return parse_address_udf(col)
