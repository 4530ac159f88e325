"""Cleaning cascade order-sensitivity tests (reference calculate.py:293-352)."""

from db_factfinder_spark.operators.cleaning import cleaning

SCHEMA = (
    "census_geoid string, pff_variable string, geotype string,"
    " c double, e double, m double, p double, z double"
)

BASES = ["base1", "nan"]
MEDIANS = ["mdtest"]
SPECIALS = ["sptest"]
MEDIAN_INPUTS = ["mdbin1", "mdbinrms"]


def _clean(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = cleaning(df, BASES, MEDIANS, SPECIALS, MEDIAN_INPUTS)
    return {r["census_geoid"]: r.asDict() for r in out.collect()}


def test_negative_and_p_rules(spark):
    rows = [
        ("neg", "v", "tract", -1.0, 10.0, -2.0, -3.0, -4.0),
        ("pbig", "v", "tract", 1.0, 10.0, 2.0, 101.0, 4.0),
        ("p100", "v", "tract", 1.0, 10.0, 2.0, 100.0, 4.0),
    ]
    out = _clean(spark, rows)
    assert out["neg"]["c"] is None and out["neg"]["m"] is None
    assert out["neg"]["p"] is None and out["neg"]["z"] is None  # p<0→NULL then z:=NULL
    # p>100 → p NULL, and the subsequent p-is-NULL rule nulls z
    assert out["pbig"]["p"] is None and out["pbig"]["z"] is None
    # p==100 → z := 0 (runs after the NULL rules)
    assert out["p100"]["p"] == 100.0 and out["p100"]["z"] == 0.0


def test_base_variable_rules(spark):
    rows = [
        ("boro", "base1", "borough", None, 10.0, None, 50.0, 5.0),
        ("tract", "base1", "tract", 1.0, 10.0, 2.0, 50.0, 5.0),
    ]
    out = _clean(spark, rows)
    # borough base: NULL c/m → 0
    assert out["boro"]["c"] == 0.0 and out["boro"]["m"] == 0.0
    # all base vars (not median): p=100, z=0
    assert out["boro"]["p"] == 100.0 and out["boro"]["z"] == 0.0
    assert out["tract"]["p"] == 100.0 and out["tract"]["z"] == 0.0


def test_median_input_and_special_suppression(spark):
    rows = [
        ("bin", "mdbin1", "NTA", 1.0, 10.0, 2.0, 50.0, 5.0),
        ("rms", "mdbinrms", "NTA", 1.0, 10.0, 2.0, 50.0, 5.0),
        ("sp", "sptest", "NTA", 1.0, 10.0, 2.0, 50.0, 5.0),
    ]
    out = _clean(spark, rows)
    # median inputs fully suppressed…
    assert out["bin"]["c"] is None and out["bin"]["m"] is None
    assert out["bin"]["p"] is None and out["bin"]["z"] is None
    # …except *rms* bins, which keep c/m but aren't base vars
    assert out["rms"]["c"] == 1.0 and out["rms"]["m"] == 2.0
    # special variables lose p/z only
    assert out["sp"]["p"] is None and out["sp"]["z"] is None
    assert out["sp"]["c"] == 1.0 and out["sp"]["m"] == 2.0


def test_zero_or_null_e_nulls_everything(spark):
    rows = [
        ("zero", "v", "tract", 1.0, 0.0, 2.0, 50.0, 5.0),
        ("nul", "v", "tract", 1.0, None, 2.0, 50.0, 5.0),
    ]
    out = _clean(spark, rows)
    for g in ("zero", "nul"):
        assert out[g]["c"] is None and out[g]["m"] is None
        assert out[g]["p"] is None and out[g]["z"] is None
