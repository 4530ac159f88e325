"""REST-ingest adapter (sources/census_api.py) over a recorded-fixture
client: landed Parquet must be a drop-in ParquetWideSource root that
the engine computes correct statistics from."""

from pathlib import Path

import pytest

from db_factfinder_spark.catalog import Catalog, Variable
from db_factfinder_spark.operators.vertical import (
    AggregatedGeography2020,
    prepare_lookup_geo,
    prepare_ratio,
)
from db_factfinder_spark.plans.planner import FactFinderEngine, ParquetWideSource
from db_factfinder_spark.sources.census_api import CensusApiSource

FIXTURES = Path(__file__).parent / "fixtures"

# Recorded API responses: dataset → NAME-keyed rows per county geoquery.
# Two tracts in county 005; the B dataset carries pop E/M (with one
# sentinel estimate), the D dataset carries the profile column —
# exercising the cross-dataset NAME merge (download.py:114-122).
_RECORDED = {
    ("acs5", "county:005"): [
        {"NAME": "Census Tract 1", "state": "36", "county": "005",
         "tract": "000100", "B01001_001E": "1000", "B01001_001M": "50"},
        {"NAME": "Census Tract 2", "state": "36", "county": "005",
         "tract": "000200", "B01001_001E": "-666666666",
         "B01001_001M": "99"},
    ],
    ("acs5dp", "county:005"): [
        {"NAME": "Census Tract 1", "DP05_0001E": "999", "DP05_0001M": "9"},
        {"NAME": "Census Tract 2", "DP05_0001E": "1999", "DP05_0001M": "19"},
    ],
}


def _client(dataset, variables, geoquery):
    county = geoquery["in"].split("county:")[-1] if "county:" in geoquery["in"] else ""
    rows = _RECORDED.get((dataset, f"county:{county}"), [])
    # the real API returns only the requested columns + geo parts
    keep = set(variables) | {"state", "county", "tract", "place", "NAME"}
    return [{k: v for k, v in r.items() if k in keep} for r in rows]


@pytest.fixture(scope="module")
def landed_root(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("api_landing")
    src = CensusApiSource(spark, _client, year=2019, counties=("005",))
    pop = Variable(pff_variable="pop_1", census_variable=["B01001_001"])
    dp = Variable(pff_variable="pop_dp", census_variable=["DP05_0001"])
    paths = src.write(root, [pop, dp], ["tract"])
    assert set(paths) == {"tract"}
    return root


def test_landed_parquet_is_raw_capture(spark, landed_root):
    df = spark.read.parquet(str(landed_root / "tract.parquet"))
    rows = {r["tract"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"000100", "000200"}
    # sentinel landed RAW (scrub happens on read, readers.py:scrub_wide)
    assert rows["000200"]["B01001_001E"] == -666666666.0
    # cross-dataset merge put both datasets' columns on one row
    assert rows["000100"]["DP05_0001E"] == 999.0
    assert df.schema["state"].dataType.typeName() == "string"


def test_engine_runs_on_landed_root(spark, landed_root):
    cat = Catalog(
        FIXTURES / "metadata.json",
        FIXTURES / "median.json",
        FIXTURES / "special.json",
    )
    lookup_raw = spark.createDataFrame(
        [("360050001001000", "BX0101", "N", "BX01", "D", "2", "Bronx",
          "0", "0", "0")],
        "geoid string, nta2020 string, ntaname string, cdta2020 string,"
        " cdtaname string, borocode string, boroname string, fp_100 string,"
        " fp_500 string, park_access string",
    )
    ratio_raw = spark.createDataFrame(
        [("05000100", "05000100", "1.0")],
        "boroct2010 string, boroct2020 string, ratio string",
    )
    geo = AggregatedGeography2020(
        prepare_lookup_geo(lookup_raw), prepare_ratio(ratio_raw)
    )
    eng = FactFinderEngine(
        spark, cat, geo, ParquetWideSource(spark, landed_root)
    )
    rows = {
        r["census_geoid"]: r.asDict() for r in eng("pop_1", "tract").collect()
    }
    assert set(rows) == {"36005000100", "36005000200"}
    r = rows["36005000100"]
    assert r["e"] == 1000.0 and r["m"] == 50.0 and r["p"] == 100.0
    # the sentinel tract scrubbed on read: NaN-skip sum → e 0, and the
    # e==0 cleaning rule suppresses everything else
    s = rows["36005000200"]
    assert s["e"] == 0.0 and s["m"] is None and s["p"] is None


def test_geoquery_shapes():
    src = CensusApiSource(None, _client, counties=("005", "047"))
    assert src.geoqueries("tract") == [
        {"for": "tract:*", "in": "state:36 county:005"},
        {"for": "tract:*", "in": "state:36 county:047"},
    ]
    assert src.geoqueries("city") == [{"for": "place:51000", "in": "state:36"}]
    with pytest.raises(ValueError, match="unknown geotype"):
        src.geoqueries("galaxy")


def test_dataset_dispatch():
    v = Variable(
        pff_variable="mix",
        census_variable=["B01001_001", "DP05_0001", "P001001", "S0101_001"],
    )
    by = CensusApiSource.measure_columns(v)
    assert by["acs5"] == ["B01001_001E", "B01001_001M"]
    assert by["acs5dp"] == ["DP05_0001E", "DP05_0001M"]
    assert by["decennial"] == ["P001001"]
    assert by["acs5st"] == ["S0101_001E", "S0101_001M"]


def test_block_group_space_name_and_missing_part_raises(spark, tmp_path):
    """The live API names the block-group geo column 'block group'
    (space); the landing must accept it for the 'block_group' schema
    slot — and a genuinely missing geo part must raise, never land ''
    (an empty part silently truncates every census_geoid)."""
    rows = {
        ("acs5", "county:005"): [
            {"NAME": "BG 1", "state": "36", "county": "005",
             "tract": "000100", "block group": "1",
             "B01001_001E": "10", "B01001_001M": "1"},
        ]
    }

    def client(dataset, variables, geoquery):
        county = geoquery["in"].split("county:")[-1]
        return rows.get((dataset, f"county:{county}"), [])

    src = CensusApiSource(spark, client, year=2019, counties=("005",))
    v = Variable(pff_variable="pop", census_variable=["B01001_001"])
    out = src.write_geotype(tmp_path, [v], "block group")
    landed = spark.read.parquet(str(out))
    row = landed.collect()[0]
    assert row["block_group"] == "1"
    assert row["tract"] == "000100"

    # drop the geo part entirely → hard error, not ''
    rows[("acs5", "county:005")][0].pop("block group")
    with pytest.raises(Exception, match="missing geo part"):
        src.write_geotype(tmp_path, [v], "block group")


# ------------------------------------------------ production REST client
class TestCensusRestClient:
    """URL construction + JSON parse of the shipped production client
    (VERDICT r6 ask #5) — recorded-response replay, zero network."""

    def _client(self, **kw):
        from db_factfinder_spark.sources.census_api import CensusRestClient

        return CensusRestClient(**kw)

    def test_url_construction_acs5(self):
        c = self._client(year=2019, api_key="SECRET")
        url = c.url(
            "acs5",
            ["NAME", "B01001_001E", "B01001_001M"],
            {"for": "tract:*", "in": "state:36 county:005"},
        )
        assert url == (
            "https://api.census.gov/data/2019/acs/acs5"
            "?get=NAME,B01001_001E,B01001_001M"
            "&for=tract:*&in=state:36%20county:005&key=SECRET"
        )

    def test_url_dataset_routing(self):
        c = self._client(year=2019)
        assert "/2019/acs/acs5/profile?" in c.url(
            "acs5dp", ["NAME"], {"for": "place:51000"}
        )
        assert "/2019/acs/acs5/subject?" in c.url(
            "acs5st", ["NAME"], {"for": "place:51000"}
        )
        # decennial sf1 pins its own vintage (reference download.py:25)
        assert "/2010/dec/sf1?" in c.url(
            "decennial", ["NAME", "P001001"], {"for": "tract:*"}
        )

    def test_url_no_key_omits_param(self):
        c = self._client(year=2019)
        assert "key=" not in c.url("acs5", ["NAME"], {"for": "tract:*"})

    def test_unknown_dataset_raises(self):
        c = self._client()
        with pytest.raises(ValueError, match="unknown dataset"):
            c.url("nope", ["NAME"], {})

    def test_parse_recorded_response(self):
        recorded = (
            '[["NAME","B01001_001E","state","county","tract"],'
            '["Census Tract 1","1000","36","005","000100"],'
            '["Census Tract 2","-666666666","36","005","000200"]]'
        )
        seen = []

        def opener(url):
            seen.append(url)
            return recorded

        c = self._client(year=2019, opener=opener)
        rows = c(
            "acs5",
            ["NAME", "B01001_001E"],
            {"for": "tract:*", "in": "state:36 county:005"},
        )
        assert len(seen) == 1 and "acs/acs5" in seen[0]
        assert rows == [
            {"NAME": "Census Tract 1", "B01001_001E": "1000",
             "state": "36", "county": "005", "tract": "000100"},
            {"NAME": "Census Tract 2", "B01001_001E": "-666666666",
             "state": "36", "county": "005", "tract": "000200"},
        ]

    def test_empty_response(self):
        c = self._client(opener=lambda url: "[]")
        assert c("acs5", ["NAME"], {"for": "tract:*"}) == []

    def test_wired_into_adapter(self, spark, tmp_path):
        """End-to-end: CensusRestClient (replay transport) as the
        adapter's client, landing a ParquetWideSource root."""
        from db_factfinder_spark.sources.census_api import (
            CensusApiSource,
            CensusRestClient,
        )

        def opener(url):
            return (
                '[["NAME","B01001_001E","B01001_001M",'
                '"state","county","tract"],'
                '["T1","1000","50","36","005","000100"],'
                '["T2","2000","70","36","005","000200"]]'
            )

        client = CensusRestClient(year=2019, opener=opener)
        src = CensusApiSource(spark, client, counties=("005",))
        pop = Variable(pff_variable="pop_1",
                       census_variable=["B01001_001"])
        path = src.write_geotype(tmp_path, [pop], "tract")
        df = spark.read.parquet(str(path))
        got = {r["tract"]: r["B01001_001E"] for r in df.collect()}
        assert got == {"000100": 1000.0, "000200": 2000.0}
