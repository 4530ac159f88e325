"""Unit tests for the MOE statistics column expressions against
hand-computed values (semantics: reference utils.py:24-48,
geography/__init__.py:6-7, geography/2010_to_2020.py:71-80)."""

import math

from pyspark.sql import functions as F

from db_factfinder_spark.functions.stats import (
    agg_moe,
    convert_moe,
    get_c,
    get_p,
    get_z,
    hmoe,
    hsum,
    sum_skipna,
)


def _one(spark, cols: dict, expr):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} double" for k in cols)
    )
    return df.select(expr.alias("x")).collect()[0]["x"]


def test_get_c(spark):
    assert _one(spark, {"e": 100.0, "m": 16.45}, get_c("e", "m")) == 10.0
    assert _one(spark, {"e": 0.0, "m": 5.0}, get_c("e", "m")) is None
    assert _one(spark, {"e": None, "m": 5.0}, get_c("e", "m")) is None


def test_get_p(spark):
    assert _one(spark, {"e": 25.0, "b": 50.0}, get_p("e", "b")) == 50.0
    assert _one(spark, {"e": 25.0, "b": 0.0}, get_p("e", "b")) is None


def test_get_z_branches(spark):
    # p == 0 / p == 100 / agg_e == 0 → NULL
    assert _one(spark, {"e": 1.0, "m": 1.0, "p": 0.0, "ae": 2.0, "am": 1.0},
                get_z("e", "m", "p", "ae", "am")) is None
    assert _one(spark, {"e": 1.0, "m": 1.0, "p": 100.0, "ae": 2.0, "am": 1.0},
                get_z("e", "m", "p", "ae", "am")) is None
    assert _one(spark, {"e": 1.0, "m": 1.0, "p": 50.0, "ae": 0.0, "am": 1.0},
                get_z("e", "m", "p", "ae", "am")) is None
    # standard branch: sqrt(m² − (e·am/ae)²)/ae·100
    val = _one(spark, {"e": 10.0, "m": 5.0, "p": 50.0, "ae": 20.0, "am": 4.0},
               get_z("e", "m", "p", "ae", "am"))
    assert abs(val - math.sqrt(25 - 4.0) / 20 * 100) < 1e-12
    # fallback branch: m² − (…)² < 0 → sqrt(m² + (…)²)
    val = _one(spark, {"e": 10.0, "m": 1.0, "p": 50.0, "ae": 20.0, "am": 4.0},
               get_z("e", "m", "p", "ae", "am"))
    assert abs(val - math.sqrt(1 + 4.0) / 20 * 100) < 1e-12


def test_convert_moe_branches(spark):
    cols = {"e0": 100.0, "m0": 10.0, "e1": 100.0, "r": 1.0}
    expr = convert_moe("e0", "m0", "e1", "r")
    assert _one(spark, cols, expr) == 10.0  # ratio == 1 → unchanged
    cols = {"e0": 100.0, "m0": 10.0, "e1": 0.0, "r": 0.5}
    assert _one(spark, cols, expr) is None  # e_2020 == 0 → NULL
    # big ratio → factor ≥ 100 → unchanged: 0.9 → (90)^0.56901*7.96309 ≈ 103
    cols = {"e0": 100.0, "m0": 10.0, "e1": 90.0, "r": 0.9}
    assert _one(spark, cols, expr) == 10.0
    # small ratio → deflated
    cols = {"e0": 100.0, "m0": 10.0, "e1": 10.0, "r": 0.1}
    expect = ((10.0 ** 0.56901) * 7.96309) / 100 * 10.0
    assert abs(_one(spark, cols, expr) - expect) < 1e-9


def test_hsum_hmoe_null_skip(spark):
    df = spark.createDataFrame(
        [(1.0, None, 3.0)], "a double, b double, c double"
    )
    row = df.select(
        hsum(["a", "b", "c"]).alias("e"), hmoe(["a", "b", "c"]).alias("m")
    ).collect()[0]
    assert row["e"] == 4.0  # NULL skipped, not propagated
    assert abs(row["m"] - math.sqrt(1 + 9)) < 1e-12
    # all-NULL row sums to 0.0 like pandas
    df = spark.createDataFrame([(None, None)], "a double, b double")
    assert df.select(hsum(["a", "b"]).alias("e")).collect()[0]["e"] == 0.0


def test_agg_moe_nan_as_zero(spark):
    df = spark.createDataFrame(
        [("g", 3.0), ("g", None), ("g", 4.0), ("h", None)],
        "k string, m double",
    )
    rows = {
        r["k"]: (r["m"], r["e"])
        for r in df.groupBy("k")
        .agg(agg_moe("m").alias("m"), sum_skipna("m").alias("e"))
        .collect()
    }
    assert rows["g"][0] == 5.0  # sqrt(9+16), NULL → 0
    assert rows["h"][0] == 0.0  # all-NULL group → 0, not NULL
    assert rows["h"][1] == 0.0  # pandas groupby().sum() min_count=0
