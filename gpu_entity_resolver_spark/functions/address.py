"""Address parsing (SURVEY.md §2.2 P2).

The reference shells out to libpostal per row (reference utils.py:66-97,
resolver.py:205-219 — a GPU→CPU→GPU round trip with per-row ``.apply``).
libpostal is not available here; this module provides a deterministic
regex-based US-style parser good for the reference's README-shaped inputs
("123 Main St, Rockford IL 61101"), implemented as ONE Arrow-vectorized
pandas UDF returning a struct — no per-row Python, and a drop-in seam for
a libpostal-backed implementation where the library exists.
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
}

_STATE_RE = r"\b([A-Z]{2})\b"


def parse_address_series(addr: pd.Series) -> pd.DataFrame:
    """Vectorized parse of 'NUMBER STREET, CITY STATE ZIP'-shaped strings."""
    s = addr.fillna("").astype(str).str.strip()

    # PO Box special case (reference utils.py:80-84)
    po = s.str.extract(r"(?i)\bp\.?\s*o\.?\s*box\s*#?\s*(\d+)", expand=False)

    parts = s.str.split(",", n=2, expand=True).reindex(columns=[0, 1, 2])
    first = parts[0].fillna("")
    rest = (parts[1].fillna("") + " " + parts[2].fillna("")).str.strip()

    street_number = first.str.extract(r"^\s*(\d+)\b", expand=False).fillna("")
    street_name = (
        first.str.replace(r"^\s*\d+\s*", "", regex=True)
        .str.lower()
        .str.replace(r"[^\w\s]", " ", regex=True)
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )
    # expand trailing street-suffix abbreviation
    for abbr, full in _SUFFIX_EXPANSIONS.items():
        street_name = street_name.str.replace(
            rf"\b{abbr}$", full, regex=True
        )

    zips = rest.str.extract(r"\b(\d{5})(?:-\d{4})?\b", expand=False).fillna("")
    state = rest.str.extract(_STATE_RE, expand=False).fillna("")
    city = (
        rest.str.replace(r"\b\d{5}(?:-\d{4})?\b", "", regex=True)
        .str.replace(_STATE_RE, "", regex=True)
        .str.replace(r"[^\w\s]", " ", regex=True)
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
        .str.lower()
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
