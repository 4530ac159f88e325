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


# ---------------------------------------------------------------------------
# 2010 geography registry (reference geography/2010.py)
# ---------------------------------------------------------------------------

from db_factfinder_spark.functions.geoid import (  # noqa: E402
    format_geoid_2010,
    format_geotype_2010,
)
from db_factfinder_spark.operators.vertical import (  # noqa: E402
    AggregatedGeography2010,
    prepare_lookup_geo_2010,
)


def _lookup_2010(spark):
    # two tracts in one NTA; tract 000200's block group is in the 500-yr
    # flood plain, tract 000300's is not; a third tract exists only in
    # the lookup (park zone with no facts)
    raw = spark.createDataFrame(
        [
            ("36047", "0002001001", "000200", "BK01", "790301", "0", "1", "0"),
            ("36047", "0003001001", "000300", "BK01", "790301", "0", "0", "0"),
            ("36047", "0004001001", "000400", "BK02", "790302", "0", "1", "1"),
        ],
        "county_fips string, ctcb2010 string, ct2010 string, nta string,"
        " cd string, fp_100 string, fp_500 string, park_access string",
    )
    return prepare_lookup_geo_2010(raw)


def _facts_2010(spark, geoids):
    return spark.createDataFrame(
        [("test", g, e, m) for g, e, m in geoids],
        "pff_variable string, census_geoid string, e double, m double",
    )


def test_lookup_2010_derived_keys(spark):
    row = _lookup_2010(spark).filter(F.col("ct2010") == "000200").first()
    assert row["geoid_block"] == "360470002001001"
    assert row["geoid_block_group"] == "360470002001"
    assert row["geoid_tract"] == "36047000200"
    assert row["cd_fp_500"] == "790301" and row["cd_fp_100"] is None


def test_tract_to_nta_2010(spark):
    facts = _facts_2010(
        spark,
        [("36047000200", 100.0, 30.0), ("36047000300", 50.0, 40.0)],
    )
    geo = AggregatedGeography2010(_lookup_2010(spark))
    out = geo.options("acs")["tract"]["NTA"](facts, "test").collect()
    rows = {r["census_geoid"]: (r["e"], r["m"], r["geotype"]) for r in out}
    # both tracts roll into BK01: e sums, m = sqrt(30² + 40²) = 50
    assert rows == {"BK01": (150.0, 50.0, "NTA")}


def test_block_group_zone_2010_right_join(spark):
    facts = _facts_2010(spark, [("360470002001", 80.0, 6.0)])
    geo = AggregatedGeography2010(_lookup_2010(spark))
    out = geo.options("acs")["block group"]["cd_fp_500"](facts, "test").collect()
    rows = {r["census_geoid"]: (r["e"], r["m"]) for r in out}
    # 000300 has no fp_500 flag → dropped by the pre-join filter;
    # 000400 is flagged but has no facts → kept by the right join,
    # aggregating to 0 (pandas sum/agg_moe of an all-NaN group)
    assert rows == {"790301": (80.0, 6.0), "790302": (0.0, 0.0)}


def test_block_grain_zone_2010_decennial(spark):
    facts = _facts_2010(spark, [("360470002001001", 7.0, 5.0)])
    geo = AggregatedGeography2010(_lookup_2010(spark))
    out = geo.options("decennial")["block"]["cd_fp_500"](facts, "test").collect()
    rows = {r["census_geoid"]: (r["e"], r["m"]) for r in out}
    assert rows == {"790301": (7.0, 5.0), "790302": (0.0, 0.0)}


def test_format_geoid_2010_branches(spark):
    df = spark.createDataFrame(
        [("BK01",), ("790301",), ("36047000200",), ("36047",), ("3651000",),
         ("xx",)],
        "g string",
    ).select(format_geoid_2010("g").alias("labs"), "g")
    got = {r["g"]: r["labs"] for r in df.collect()}
    assert got["BK01"] == "BK01"          # NTA passthrough
    assert got["790301"] == "0301"        # PUMA suffix
    assert got["36047000200"] == "3000200"  # boro digit + 6-digit tract
    assert got["36047"] == "3"            # borough
    assert got["3651000"] == "0"          # city
    assert got["xx"] is None              # falls off the end → None


def test_format_geotype_2010(spark):
    df = spark.createDataFrame(
        [("NTA",), ("tract",), ("block group",), ("cd_fp_500",)], "g string"
    ).select(format_geotype_2010("g").alias("labs"), "g")
    got = {r["g"]: r["labs"] for r in df.collect()}
    assert got["NTA"] == "NTA2010"
    assert got["tract"] == "CT2010"
    assert got["block group"] == "CBG2010"
    assert got["cd_fp_500"] == "cd_fp_500"  # unknown passes through


def test_registry_2010_surface(spark):
    geo = AggregatedGeography2010(_lookup_2010(spark))
    assert set(geo.options("acs")) == {"tract", "block group"}
    assert set(geo.options("decennial")) == {"tract", "block"}
    assert geo.aggregated_geography == sorted(
        ["NTA", "cd", "cd_fp_500", "cd_fp_100", "cd_park_access"]
    )
