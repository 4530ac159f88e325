"""Median operator: hand fixtures (FIXTURES.md §6) + randomized
comparison against the pure-Python oracle in reference_median.py."""

import math

import pytest
from pyspark.sql import functions as F

from db_factfinder_spark.catalog import MedianSpec
from db_factfinder_spark.operators.median import calculate_median
from tests.reference_median import median_and_moe

BINS4 = [("b0", 0.0, 9.9999), ("b1", 10.0, 19.9999), ("b2", 20.0, 29.9999), ("b3", 30.0, 39.9999)]


def _spec(top=True, bottom=True, df_=1.1, name="mdtest"):
    return MedianSpec(
        pff_variable=name,
        design_factor=df_,
        top_coding=top,
        bottom_coding=bottom,
        bins=list(BINS4),
    )


def _run(spark, spec, rows):
    """rows: list of (geoid, [counts])."""
    data = [(g, *c) for g, c in rows]
    schema = "census_geoid string, " + ", ".join(f"{b[0]} double" for b in spec.bins)
    df = spark.createDataFrame(data, schema)
    out = calculate_median(df, spec, "NTA")
    return {r["census_geoid"]: (r["e"], r["m"]) for r in out.collect()}


def test_median_interpolation(spark):
    # N=100, N/2=50 falls in bin1: C_prev=30, F=40 → 10 + 20/40*9.9999
    counts = [30.0, 40.0, 20.0, 10.0]
    res = _run(spark, _spec(), [("g1", counts)])
    e, m = res["g1"]
    expect_e = 10.0 + (50 - 30) * 9.9999 / 40
    assert abs(e - expect_e) < 1e-9
    ref_e, ref_m = median_and_moe(counts, [(b[1], b[2]) for b in BINS4], 1.1, True, True)
    assert abs(e - ref_e) < 1e-9
    assert abs(m - ref_m) < 1e-9


def test_median_degenerate_rows(spark):
    spec = _spec()
    res = _run(
        spark,
        spec,
        [
            ("zero", [0.0, 0.0, 0.0, 0.0]),      # B=0 → NULL/NULL
            ("bottom", [100.0, 1.0, 1.0, 1.0]),  # bottom-coded → hi[0]
            ("top", [1.0, 1.0, 1.0, 100.0]),     # top-coded → lo[-1]
        ],
    )
    assert res["zero"] == (None, None)
    assert res["bottom"][0] == 9.9999
    assert res["top"][0] == 30.0
    assert res["top"][1] is None  # median in top bin → MOE suppressed


def test_median_no_coding_interpolates_edges(spark):
    spec = _spec(top=False, bottom=False)
    res = _run(spark, spec, [("g", [100.0, 1.0, 1.0, 1.0])])
    e, _ = res["g"]
    ref_e, _ = median_and_moe(
        [100.0, 1.0, 1.0, 1.0], [(b[1], b[2]) for b in BINS4], 1.1, False, False
    )
    assert abs(e - ref_e) < 1e-9
    # interpolated inside bin 0, not the bin edge
    assert 0 < e < 9.9999


@pytest.mark.parametrize("seed", range(8))
def test_median_matches_python_oracle_randomized(spark, seed):
    import random

    rng = random.Random(seed)
    rows = []
    expected = {}
    bounds = [(b[1], b[2]) for b in BINS4]
    for i in range(25):
        counts = [float(rng.choice([0, 0, rng.randint(0, 500)])) for _ in BINS4]
        gid = f"g{seed}_{i}"
        rows.append((gid, counts))
        expected[gid] = median_and_moe(counts, bounds, 1.1, True, True)
    res = _run(spark, _spec(), rows)
    for gid, (ref_e, ref_m) in expected.items():
        got_e, got_m = res[gid]
        for got, ref in ((got_e, ref_e), (got_m, ref_m)):
            if isinstance(ref, float) and math.isnan(ref):
                assert got is None, f"{gid}: expected NULL, got {got}"
            else:
                assert got is not None and abs(got - ref) < 1e-9, (
                    f"{gid}: {got} != {ref}"
                )
