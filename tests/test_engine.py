"""End-to-end engine tests: catalog → plan → result, over a wide
Parquet fixture (the SURVEY §7.2 minimum slice and beyond)."""

import math
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from db_factfinder_spark.catalog import Catalog
from db_factfinder_spark.operators.vertical import (
    AggregatedGeography2020,
    prepare_lookup_geo,
    prepare_ratio,
)
from db_factfinder_spark.plans.planner import FactFinderEngine, ParquetWideSource

FIXTURES = Path(__file__).parent / "fixtures"

# two tracts in county 005 (Bronx): geoids 36005000100, 36005000200
WIDE_TRACT_ROWS = [
    # state, county, tract, pop E/M, 65+ E/M (two cols), agg income E/M,
    # bins, profile-only DP E/M/PE/PM
    ("36", "005", "000100", 1000.0, 50.0, 60.0, 10.0, 40.0, 8.0, 2.0e7, 1.0e6, 30.0, 40.0, 30.0, 500.0, 25.0, 50.0, 2.5, 600.0, 30.0, 100.0, 7.0, 150.0, 12.0, 15.0, 1.2, 5.0, 3.0),
    ("36", "005", "000200", 2000.0, 80.0, 100.0, 12.0, 60.0, 9.0, 5.0e7, 2.0e6, 10.0, 10.0, 80.0, 800.0, 40.0, 40.0, 2.0, 900.0, 45.0, 200.0, 11.0, 300.0, 20.0, 15.0, 1.0, 3.0, 2.0),
]
WIDE_SCHEMA = (
    "state string, county string, tract string,"
    " B01001_001E double, B01001_001M double,"
    " B01001_020E double, B01001_020M double,"
    " B01001_044E double, B01001_044M double,"
    " B19313_001E double, B19313_001M double,"
    " C01_001E double, C01_002E double, C01_003E double,"
    " DP05_0001E double, DP05_0001M double,"
    " DP05_0001PE double, DP05_0001PM double,"
    " B08006_001E double, B08006_001M double,"
    " B08006_017E double, B08006_017M double,"
    " B17001_002E double, B17001_002M double,"
    " C17_002E double, C17_002M double,"
    " B99_001E double, B99_001M double"
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("wide")
    df = spark.createDataFrame(WIDE_TRACT_ROWS, WIDE_SCHEMA)
    # bins need M columns too (horizontal agg reads them)
    for c in ["C01_001", "C01_002", "C01_003"]:
        df = df.withColumn(f"{c}M", F.lit(1.0))
    df.write.mode("overwrite").parquet(str(root / "tract.parquet"))

    cat = Catalog(
        FIXTURES / "metadata.json",
        FIXTURES / "median.json",
        FIXTURES / "special.json",
    )
    lookup_raw = spark.createDataFrame(
        [
            ("360050001001000", "BX0101", "Melrose", "BX01", "BX CD1", "2", "Bronx", "0", "1", "1"),
            ("360050002001000", "BX0101", "Melrose", "BX01", "BX CD1", "2", "Bronx", "1", "1", "0"),
        ],
        "geoid string, nta2020 string, ntaname string, cdta2020 string, cdtaname string,"
        " borocode string, boroname string, fp_100 string, fp_500 string, park_access string",
    )
    ratio_raw = spark.createDataFrame(
        [("05000100", "05000100", "1.0"), ("05000200", "05000200", "1.0")],
        "boroct2010 string, boroct2020 string, ratio string",
    )
    geo = AggregatedGeography2020(prepare_lookup_geo(lookup_raw), prepare_ratio(ratio_raw))
    return FactFinderEngine(spark, cat, geo, ParquetWideSource(spark, root))


def test_base_variable_at_tract(engine):
    rows = {r["census_geoid"]: r.asDict() for r in engine("pop_1", "tract").collect()}
    assert set(rows) == {"36005000100", "36005000200"}
    r = rows["36005000100"]
    assert r["e"] == 1000.0 and r["m"] == 50.0
    assert r["p"] == 100.0 and r["z"] == 0.0  # base var cleaning rule
    assert abs(r["c"] - round(50.0 / 1.645 / 1000.0 * 100, 1)) < 1e-9
    assert r["labs_geoid"] == "2000100"  # boro digit 2 + tract
    assert r["labs_geotype"] == "CT2010"


def test_child_variable_p_z_against_base(engine):
    rows = {r["census_geoid"]: r.asDict() for r in engine("pop65pl", "tract").collect()}
    r = rows["36005000100"]
    assert r["e"] == 100.0  # 60 + 40
    expect_m = math.sqrt(10.0**2 + 8.0**2)
    assert abs(r["m"] - round(expect_m, 0)) < 1e-9
    assert abs(r["p"] - round(100.0 / 1000.0 * 100, 1)) < 1e-9


def test_vertical_rollup_to_nta(engine):
    rows = {r["census_geoid"]: r.asDict() for r in engine("pop_1", "NTA").collect()}
    assert set(rows) == {"BX0101"}
    r = rows["BX0101"]
    assert r["e"] == 3000.0
    assert abs(r["m"] - round(math.sqrt(50.0**2 + 80.0**2), 0)) < 1e-9
    assert r["labs_geoid"] == "BX0101"
    assert r["labs_geotype"] == "NTA2020"


def test_special_variable_at_nta(engine):
    rows = {r["census_geoid"]: r.asDict() for r in engine("percapinc", "NTA").collect()}
    r = rows["BX0101"]
    agg_inc, pop = 7.0e7, 3000.0
    assert abs(r["e"] - round(agg_inc / pop, 2)) < 1e-9
    assert r["p"] is None and r["z"] is None  # special vars never publish p/z


def test_median_variable_at_nta(engine):
    rows = {r["census_geoid"]: r.asDict() for r in engine("mdtest", "NTA").collect()}
    r = rows["BX0101"]
    # counts: bins (40, 50, 110), B=200, N/2=100 → bin 2 (top) → top-coded
    assert r["e"] == 20.0
    assert r["p"] is None and r["z"] is None


def test_profile_only_variable_at_tract(engine):
    """Profile-only path (calculate.py:109-129): e/m/p/z come straight
    from the DP variable's E/M/PE/PM columns — no base join, no
    aggregation."""
    rows = {
        r["census_geoid"]: r.asDict()
        for r in engine("proftest", "tract").collect()
    }
    r = rows["36005000100"]
    assert (r["e"], r["m"], r["p"], r["z"]) == (500.0, 25.0, 50.0, 2.5)
    assert abs(r["c"] - round(25.0 / 1.645 / 500.0 * 100, 1)) < 1e-9
    r2 = rows["36005000200"]
    assert (r2["e"], r2["p"]) == (800.0, 40.0)


def test_wrkrnothm_special_at_any_geotype(engine):
    """The `wrkrnothm` quirk (calculate.py:222-235): special formula
    applies at NON-aggregated geotypes too — difference estimate with
    sqrt(m1²+m2²) MOE, p/z NULL (special vars never publish them)."""
    rows = {
        r["census_geoid"]: r.asDict()
        for r in engine("wrkrnothm", "tract").collect()
    }
    r = rows["36005000100"]
    assert r["e"] == 600.0 - 100.0
    assert r["m"] == round(math.sqrt(30.0**2 + 7.0**2), 0)
    assert r["p"] is None and r["z"] is None


def test_poverty_pz_twin_join(engine):
    """Poverty variables (J4): p/z come from the `_pct` twin's e/m via
    an inner join on (geoid, geotype) — calculate.py:171-182."""
    rows = {
        r["census_geoid"]: r.asDict()
        for r in engine("pbwpv", "tract").collect()
    }
    r = rows["36005000100"]
    assert (r["e"], r["m"]) == (150.0, 12.0)
    assert (r["p"], r["z"]) == (15.0, 1.2)
    assert abs(r["c"] - round(12.0 / 1.645 / 150.0 * 100, 1)) < 1e-9


def test_median_base_pz_quirk(engine):
    """The calculate.py:248-259 quirk branch: when the base variable is
    a median at an aggregated geotype, p/z compute against the MEDIAN's
    e/m (here mdtest@NTA = 20.0, top-coded, MOE NULL → z NULL)."""
    rows = {
        r["census_geoid"]: r.asDict()
        for r in engine("mdchild", "NTA").collect()
    }
    r = rows["BX0101"]
    assert r["e"] == 8.0  # 5 + 3
    assert r["p"] == round(8.0 / 20.0 * 100, 1)  # base = median value
    assert r["z"] is None  # median MOE NULL propagates through get_z


def test_batch_driver_shape(engine):
    out = engine.calculate_batch(
        [("pop_1", "tract"), ("pop65pl", "tract"), ("pop_1", "NTA")]
    )
    rows = out.collect()
    assert len(rows) == 5  # 2 + 2 + 1
    assert "domain" in out.columns


# ---------------------------------------------------------------------------
# 2010-vintage engine path (reference geography/2010.py registry)
# ---------------------------------------------------------------------------

from db_factfinder_spark.operators.vertical import (  # noqa: E402
    AggregatedGeography2010,
    prepare_lookup_geo_2010,
)


@pytest.fixture(scope="module")
def engine_2010(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("wide2010")
    df = spark.createDataFrame(WIDE_TRACT_ROWS, WIDE_SCHEMA)
    for c in ["C01_001", "C01_002", "C01_003"]:
        df = df.withColumn(f"{c}M", F.lit(1.0))
    df.write.mode("overwrite").parquet(str(root / "tract.parquet"))

    cat = Catalog(
        FIXTURES / "metadata.json",
        FIXTURES / "median.json",
        FIXTURES / "special.json",
    )
    lookup_raw = spark.createDataFrame(
        [
            ("36005", "0001001000", "000100", "BX01", "790301", "0", "1", "1"),
            ("36005", "0002001000", "000200", "BX01", "790301", "1", "1", "0"),
        ],
        "county_fips string, ctcb2010 string, ct2010 string, nta string,"
        " cd string, fp_100 string, fp_500 string, park_access string",
    )
    geo = AggregatedGeography2010(prepare_lookup_geo_2010(lookup_raw))
    return FactFinderEngine(spark, cat, geo, ParquetWideSource(spark, root))


def test_2010_base_variable_at_tract(engine_2010):
    rows = {
        r["census_geoid"]: r.asDict()
        for r in engine_2010("pop_1", "tract").collect()
    }
    r = rows["36005000100"]
    assert r["e"] == 1000.0 and r["m"] == 50.0
    assert r["labs_geoid"] == "2000100"  # 2010 formatter, same tract shape
    assert r["labs_geotype"] == "CT2010"


def test_2010_vertical_rollup_to_nta(engine_2010):
    rows = {
        r["census_geoid"]: r.asDict()
        for r in engine_2010("pop_1", "NTA").collect()
    }
    assert set(rows) == {"BX01"}
    r = rows["BX01"]
    assert r["e"] == 3000.0
    assert abs(r["m"] - round(math.sqrt(50.0**2 + 80.0**2), 0)) < 1e-9
    assert r["labs_geoid"] == "BX01"
    assert r["labs_geotype"] == "NTA2010"


def test_2010_rollup_to_cd(engine_2010):
    rows = {
        r["census_geoid"]: r.asDict()
        for r in engine_2010("pop_1", "cd").collect()
    }
    assert set(rows) == {"790301"}
    r = rows["790301"]
    assert r["e"] == 3000.0
    assert r["labs_geoid"] == "0301"  # PUMA "79" prefix → last 4
    assert r["labs_geotype"] == "cd"  # unknown label passes through


# ---------------------------------------------------------------------------
# Retry (O3) + batch error isolation (O4)
# ---------------------------------------------------------------------------

def test_retry_succeeds_after_transient_failures():
    from db_factfinder_spark.retry import with_retry

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert with_retry(flaky, tries=3, delay=0) == "ok"
    assert calls["n"] == 3


def test_retry_exhausts_and_raises():
    import pytest as _pytest

    from db_factfinder_spark.retry import retry

    calls = {"n": 0}

    @retry(tries=2, delay=0)
    def doomed():
        calls["n"] += 1
        raise ValueError("permanent")

    with _pytest.raises(ValueError):
        doomed()
    assert calls["n"] == 2


def test_batch_retries_then_isolates_bad_task(engine):
    # unknown variable fails deterministically: the task retries
    # retry_tries times, then is isolated (O4) while good tasks survive
    out = engine.calculate_batch(
        [("pop_1", "tract"), ("no_such_var", "tract")],
        retry_tries=2,
        retry_delay=0,
    )
    assert out.count() == 2  # pop_1's two tracts; bad task skipped


# ---------------------------------------------------------------------------
# Decennial catalog registry (reference data/decennial/{2010,2020})
# ---------------------------------------------------------------------------

def test_registry_loads_both_decennial_vintages():
    for year in (2010, 2020):
        cat = Catalog.from_registry("decennial", year)
        assert len(cat.metadata) == 25
        v = cat.create_variable("decennial_pop")
        assert v.census_variable == ["P001001"]
        assert v.base_variable == "decennial_pop"
        # decennial catalogs expose no profile-only variables
        # (reference calculate.py:103 never asks; empty
        # census_variable entries must not crash the classifier)
        assert cat.profile_only_variables == []
        assert "decennial_pop" in cat.base_variables
        assert cat.median_variables == [] and cat.special_variables == []


def test_registry_unknown_vintage_raises():
    with pytest.raises(ValueError, match="packaged"):
        Catalog.from_registry("decennial", 1990)


@pytest.fixture(scope="module")
def decennial_engine(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("wide_dec")
    df = spark.createDataFrame(
        [
            ("36", "047", "000100", 3000.0),
            ("36", "047", "000200", 999999999.0),  # sentinel → e 0
        ],
        "state string, county string, tract string, P001001 double",
    )
    df.write.mode("overwrite").parquet(str(root / "tract.parquet"))
    cat = Catalog.from_registry("decennial", 2020)
    lookup_raw = spark.createDataFrame(
        [
            ("360470001001000", "BK0101", "N", "BK01", "D", "3", "Brooklyn", "0", "0", "0"),
        ],
        "geoid string, nta2020 string, ntaname string, cdta2020 string, cdtaname string,"
        " borocode string, boroname string, fp_100 string, fp_500 string, park_access string",
    )
    ratio_raw = spark.createDataFrame(
        [("47000100", "47000100", "1.0")],
        "boroct2010 string, boroct2020 string, ratio string",
    )
    geo = AggregatedGeography2020(
        prepare_lookup_geo(lookup_raw), prepare_ratio(ratio_raw)
    )
    return FactFinderEngine(spark, cat, geo, ParquetWideSource(spark, root))


def test_decennial_2020_base_variable_at_tract(decennial_engine):
    rows = {
        r["census_geoid"]: r.asDict()
        for r in decennial_engine("decennial_pop", "tract").collect()
    }
    assert set(rows) == {"36047000100", "36047000200"}
    r = rows["36047000100"]
    # decennial: margin NULL, base variable → p=100, z=0 (cleaning)
    assert r["e"] == 3000.0 and r["m"] is None
    assert r["p"] == 100.0 and r["z"] == 0.0
    assert r["c"] is None
    assert r["labs_geoid"] == "3000100"
    assert r["labs_geotype"] == "CT2010"
    # sentinel-scrubbed tract: e 0 → c/m/p/z suppressed
    s = rows["36047000200"]
    assert s["e"] == 0.0
    assert s["c"] is None and s["m"] is None
    assert s["p"] is None and s["z"] is None


def test_decennial_2020_aggregated_geotype_unreachable(decennial_engine):
    # the 2010_to_2020 geography registers no decennial rollups
    # (reference 2010_to_2020.py:200-219), so NTA is a clean error,
    # not a StopIteration
    with pytest.raises(ValueError, match="not reachable"):
        decennial_engine("decennial_pop", "NTA")
