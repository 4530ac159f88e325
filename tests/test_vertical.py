"""Vertical aggregation + 2010→2020 crosswalk tests.

The crosswalk fixture mirrors the reference's only true unit test
(tests/test_geography.py:36-49): two 2010 tracts, one of which splits
into two 2020 tracts."""

import math

from pyspark.sql import functions as F

from db_factfinder_spark.operators.vertical import (
    AggregatedGeography2020,
    aggregate_to_geography,
    ct2010_to_ct2020,
    prepare_lookup_geo,
    prepare_ratio,
)


def _ratio(spark):
    # tract 0001600 maps 1:1; tract 0001900 splits 60/40 into two tracts
    raw = spark.createDataFrame(
        [
            ("05001600", "05001600", "1.0"),
            ("05001900", "05001901", "0.6"),
            ("05001900", "05001902", "0.4"),
        ],
        "boroct2010 string, boroct2020 string, ratio string",
    )
    return prepare_ratio(raw)


def _facts(spark):
    return spark.createDataFrame(
        [
            ("test", "36005001600", "tract", 5825.0, 398.0),
            ("test", "36005001900", "tract", 3141.0, 341.0),
        ],
        "pff_variable string, census_geoid string, geotype string, e double, m double",
    )


def test_prepare_ratio_geoid_padding(spark):
    rows = {r["geoid_ct2010"] for r in _ratio(spark).collect()}
    assert rows == {"36005001600", "36005001900"}


def test_ct2010_to_ct2020_split(spark):
    out = ct2010_to_ct2020(_facts(spark), _ratio(spark), "test")
    rows = {r["census_geoid"]: (r["e"], r["m"]) for r in out.collect()}
    assert set(rows) == {"36005001600", "36005001901", "36005001902"}
    # 1:1 tract passes through unchanged
    assert rows["36005001600"] == (5825.0, 398.0)
    # split tract: e scales by ratio
    assert abs(rows["36005001901"][0] - 3141.0 * 0.6) < 1e-9
    assert abs(rows["36005001902"][0] - 3141.0 * 0.4) < 1e-9
    # split MOE deflates by the power law (ratio 0.6 → factor < 100)
    factor = (0.6 * 100) ** 0.56901 * 7.96309
    assert abs(rows["36005001901"][1] - factor / 100 * 341.0) < 1e-6
    # schema matches the long fact contract
    assert out.columns == ["census_geoid", "pff_variable", "geotype", "e", "m"]
    assert out.select("geotype").distinct().collect()[0][0] == "CT20"


def test_aggregate_to_geography_moe(spark):
    df = spark.createDataFrame(
        [("A", 1.0, 3.0), ("A", 2.0, 4.0), ("B", 5.0, None)],
        "nta string, e double, m double",
    )
    out = {
        r["census_geoid"]: (r["e"], r["m"])
        for r in aggregate_to_geography(df, "nta", "NTA", "test").collect()
    }
    assert out["A"][0] == 3.0
    assert out["A"][1] == 5.0  # sqrt(9+16)
    assert out["B"] == (5.0, 0.0)  # NULL MOE → 0 under agg


def test_tract_to_nta_rollup(spark):
    lookup_raw = spark.createDataFrame(
        [
            ("360050016001000", "BX0101", "Melrose", "BX01", "BX CD1", "2", "Bronx", "0", "1", "1"),
            ("360050019011000", "BX0102", "Mott Haven", "BX01", "BX CD1", "2", "Bronx", "1", "1", "0"),
            ("360050019021000", "BX0102", "Mott Haven", "BX01", "BX CD1", "2", "Bronx", "0", "0", "1"),
        ],
        "geoid string, nta2020 string, ntaname string, cdta2020 string, cdtaname string,"
        " borocode string, boroname string, fp_100 string, fp_500 string, park_access string",
    )
    geo = AggregatedGeography2020(prepare_lookup_geo(lookup_raw), _ratio(spark))
    nta_fn = geo.options("acs")["tract"]["NTA"]
    out = {r["census_geoid"]: (r["e"], r["m"]) for r in nta_fn(_facts(spark), "test").collect()}
    # BX0101 ← tract ...1600; BX0102 ← tracts ...1901 + ...1902
    assert abs(out["BX0101"][0] - 5825.0) < 1e-9
    assert abs(out["BX0102"][0] - 3141.0) < 1e-9
    factor = (0.6 * 100) ** 0.56901 * 7.96309 / 100
    factor40 = (0.4 * 100) ** 0.56901 * 7.96309 / 100
    expect_m = math.sqrt((factor * 341.0) ** 2 + (factor40 * 341.0) ** 2)
    assert abs(out["BX0102"][1] - expect_m) < 1e-6


def test_support_geoids(spark):
    lookup_raw = spark.createDataFrame(
        [
            ("360050016001000", "BX0101", "Melrose", "BX01", "BX CD1", "2", "Bronx", "0", "1", "1"),
            ("360050019011000", "BX0102", "Mott Haven", "BX01", "BX CD1", "2", "Bronx", "1", "1", "0"),
        ],
        "geoid string, nta2020 string, ntaname string, cdta2020 string, cdtaname string,"
        " borocode string, boroname string, fp_100 string, fp_500 string, park_access string",
    )
    geo = AggregatedGeography2020(prepare_lookup_geo(lookup_raw), _ratio(spark))
    rows = geo.support_geoids().collect()
    geotypes = {r["geotype"] for r in rows}
    assert geotypes == {"NTA2020", "CDTA2020", "Boro2020", "City2020"}
    assert len([r for r in rows if r["geotype"] == "NTA2020"]) == 2
