"""Manual-update driver tests (reference pipelines/acs_manual_update.py):
melt, Unnamed strip, geotype dropna, catalog semi-join, output schema."""

from pyspark.sql import functions as F

from db_factfinder_spark.pipelines import (
    OUTPUT_SCHEMA_COLUMNS,
    extract_field_names,
    manual_update,
    transform_sheet,
)


def _sheet(spark):
    return spark.createDataFrame(
        [
            ("NTA2020", "BK01", 10.0, 1.0, 5.0, 100.0, 0.0, 7.0, 2.0, 9.0, "x"),
            ("NTA2020", "BK02", 20.0, 2.0, 6.0, 100.0, 0.0, 8.0, 3.0, 9.0, "y"),
            (None, "BK03", 30.0, 3.0, 7.0, 100.0, 0.0, 9.0, 4.0, 9.0, "z"),
        ],
        "GeoType string, GeoID string,"
        " Pop_1E double, Pop_1M double, Pop_1C double, Pop_1P double,"
        " Pop_1Z double, Hsp1E double, Hsp1M double, GhostE double,"
        " `Unnamed: 3` string",
    )


def test_extract_field_names_order_and_dedup():
    cols = ["GeoType", "GeoID", "Pop_1E", "Pop_1M", "Hsp1E", "Unnamed: 3"]
    assert extract_field_names(cols) == ["Pop_1", "Hsp1"]


def test_transform_sheet_melt(spark):
    long = transform_sheet(_sheet(spark), "demographic")
    rows = {(r["geoid"], r["pff_variable"]): r.asDict() for r in long.collect()}
    # 3 geo rows × 3 variables (pop_1, hsp1, ghost)
    assert len(rows) == 9
    r = rows[("BK01", "pop_1")]
    assert (r["e"], r["m"], r["c"], r["p"], r["z"]) == (10.0, 1.0, 5.0, 100.0, 0.0)
    # hsp1 has only E/M in the sheet → c/p/z filled as NULL
    h = rows[("BK01", "hsp1")]
    assert (h["e"], h["m"]) == (7.0, 2.0)
    assert h["c"] is None and h["p"] is None and h["z"] is None
    assert r["domain"] == "demographic"
    assert "Unnamed: 3" not in long.columns


def test_manual_update_end_to_end(spark):
    out = manual_update(
        spark, [(_sheet(spark), "demographic")], ["pop_1", "hsp1"]
    )
    assert out.columns == OUTPUT_SCHEMA_COLUMNS
    rows = out.collect()
    # ghost dropped by the semi-join; BK03 dropped by the geotype dropna
    assert len(rows) == 4
    assert {r["pff_variable"] for r in rows} == {"pop_1", "hsp1"}
    assert all(r["census_geoid"] is None and r["geotype"] is None for r in rows)
    assert {r["labs_geotype"] for r in rows} == {"NTA2020"}
    assert {r["labs_geoid"] for r in rows} == {"BK01", "BK02"}
