"""Geoid synthesis and Planning-Labs formatting as column expressions.

Reference: download.py:143-156 (geoid synthesis by string concat),
geography/2010_to_2020.py:231-264 (labs geoid/geotype formatting).
All string-typed — geoids keep leading zeros.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# NYC county FIPS → boro digit (geography/2010_to_2020.py:233).
FIPS_TO_BORO = {"05": "2", "47": "3", "61": "1", "81": "4", "85": "5"}

GEOTYPE_LABELS_2020 = {
    "NTA": "NTA",
    "CDTA": "CDTA",
    "tract": "CT",
    "CT20": "CT",
    "borough": "Boro",
    "city": "City",
    "block": "CB",
    "block group": "CBG",
}


def make_census_geoid(df: DataFrame, geotype: str) -> DataFrame:
    """Synthesize ``census_geoid`` from geo-part columns
    (reference download.py:143-156).  String concatenation — parts are
    already zero-padded strings from ingest."""
    if geotype == "tract":
        geoid = F.concat("state", "county", "tract")
    elif geotype == "borough":
        geoid = F.concat("state", "county")
    elif geotype == "city":
        geoid = F.concat("state", "place")
    elif geotype == "block":
        geoid = F.concat("state", "county", "tract", "block")
    elif geotype == "block group":
        geoid = F.concat("state", "county", "tract", F.col("block_group"))
    else:
        raise ValueError(f"unknown geotype: {geotype}")
    return df.withColumn("census_geoid", geoid)


def format_geoid_2020(geoid: Column | str) -> Column:
    """Census geoid → Planning Labs geoid
    (reference geography/2010_to_2020.py:231-245):

    * NTA/CDTA codes (MN/QN/BX/BK/SI prefix) pass through
    * 11-char tract geoid → boro digit + 6-digit tract
    * 5-char borough geoid → boro digit
    * city "3651000" → "0"

    Pure function of one column → a when-chain, no join needed.
    """
    g = F.col(geoid) if isinstance(geoid, str) else geoid
    prefix2 = F.substring(g, 1, 2)
    fips = F.substring(g, 4, 2)  # chars 4-5 of the 11-char tract geoid
    boro_map = F.create_map(
        *[F.lit(x) for kv in FIPS_TO_BORO.items() for x in kv]
    )
    return (
        F.when(prefix2.isin("MN", "QN", "BX", "BK", "SI"), g)
        .when(F.length(g) == 11, F.concat(boro_map[fips], F.substring(g, 6, 6)))
        .when(F.length(g) == 5, boro_map[F.substring(g, 4, 2)])
        .when(g == "3651000", F.lit("0"))
    )


def format_geotype_2020(geotype: Column | str) -> Column:
    """Geotype → labs geotype label with year suffix
    (reference geography/2010_to_2020.py:247-263): ``tract`` → CT2010,
    known labels → <label>2020, anything else passes through."""
    g = F.col(geotype) if isinstance(geotype, str) else geotype
    out = F.when(g == "tract", F.lit("CT2010"))
    for k, v in GEOTYPE_LABELS_2020.items():
        if k == "tract":
            continue
        out = out.when(g == k, F.lit(v + "2020"))
    return out.otherwise(g)


GEOTYPE_LABELS_2010 = {
    "NTA": "NTA",
    "PUMA": "PUMA",
    "tract": "CT",
    "borough": "Boro",
    "city": "City",
    "block": "CB",
    "block group": "CBG",
}


def format_geoid_2010(geoid: Column | str) -> Column:
    """Census geoid → Planning Labs geoid, 2010 vintage
    (reference geography/2010.py:213-230):

    * NTA codes (MN/QN/BX/BK/SI prefix) pass through
    * Community District (PUMA) geoid with "79" prefix → last 4 chars
    * 11-char tract geoid → boro digit (from chars -8:-6, i.e. the
      county FIPS) + 6-digit tract
    * 5-char borough geoid → boro digit
    * city "3651000" → "0"
    * anything else → NULL (the reference function falls off the end
      and returns None)
    """
    g = F.col(geoid) if isinstance(geoid, str) else geoid
    prefix2 = F.substring(g, 1, 2)
    boro_map = F.create_map(
        *[F.lit(x) for kv in FIPS_TO_BORO.items() for x in kv]
    )
    return (
        F.when(prefix2.isin("MN", "QN", "BX", "BK", "SI"), g)
        .when(prefix2 == "79", F.substring(g, -4, 4))
        .when(
            F.length(g) == 11,
            F.concat(boro_map[F.substring(g, -8, 2)], F.substring(g, -6, 6)),
        )
        .when(F.length(g) == 5, boro_map[F.substring(g, -2, 2)])
        .when(g == "3651000", F.lit("0"))
    )


def format_geotype_2010(geotype: Column | str) -> Column:
    """Geotype → labs geotype label with the 2010 year suffix
    (reference geography/2010.py:232-243).  Unknown geotypes pass
    through unchanged (the reference's ``dict.get(...) + "2010"`` would
    raise on an unknown key; it is only ever called with registry
    geotypes, so the passthrough is unobservable in parity terms)."""
    g = F.col(geotype) if isinstance(geotype, str) else geotype
    out = None
    for k, v in GEOTYPE_LABELS_2010.items():
        clause = (g == k, F.lit(v + "2010"))
        out = F.when(*clause) if out is None else out.when(*clause)
    return out.otherwise(g)
