"""Census REST → wide-Parquet ingest adapter (reference
factfinder/download.py:14-156) — the production story for S1.

The engine's scan side (``ParquetWideSource``, plans/planner.py:62-98)
reads ``{root}/{geotype}.parquet`` wide frames; this adapter produces
them from the census REST API:

* per geotype, the reference's county-sharded geoqueries
  (download.py:29-49);
* per variable, the dataset dispatch on the census column's first
  letter — D→acs5dp, S→acs5st, P→sf1/decennial, B→acs5
  (download.py:22-27) — fetching ``{col}E``/``{col}M`` for ACS columns
  and the raw name for decennial columns (metadata.py:16-29);
* responses for one geoquery are merged across datasets on ``NAME``
  exactly like download.py:114-122;
* values land RAW.  The reference scrubs sentinels at download
  (download.py:123-140); this engine scrubs ON READ
  (sources/readers.py::scrub_wide applies the same rules in the same
  order), so the landed Parquet is a faithful API capture and a
  re-scrub costs nothing.

No network in this environment, so the HTTP client is INJECTED:
``client(dataset, variables, geoquery) -> list[dict]`` (each dict one
row: geo part columns + requested measure columns, values as the
API's strings).  Production wires a thin ``requests`` wrapper;
tests replay recorded fixtures.

Scale note: the fetch loop is driver-side ON PURPOSE — one census
geoquery returns at most a few thousand rows (the reference pulls the
same volume through the ``census`` client into pandas), so there is
nothing to distribute; ingest parallelism at production scale comes
from running many (variable-batch × geotype) adapter calls
concurrently, each landing its own Parquet, while all heavy
computation happens in Spark after landing.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable
from urllib.parse import quote
from urllib.request import urlopen

from pyspark.sql import DataFrame, SparkSession

from db_factfinder_spark.catalog import Variable

# dataset dispatch by census-column first letter (download.py:22-27)
DATASETS = {"D": "acs5dp", "S": "acs5st", "P": "decennial", "B": "acs5"}
DEFAULT_DATASET = "acs5"

# geo part columns per geotype, in census_geoid concatenation order
# (download.py:146-156); these become the string columns of the wide
# Parquet that make_census_geoid later concatenates
GEO_COLUMNS = {
    "tract": ["state", "county", "tract"],
    "borough": ["state", "county"],
    "city": ["state", "place"],
    "block": ["state", "county", "tract", "block"],
    "block group": ["state", "county", "tract", "block_group"],
}

NYC_COUNTIES = ("005", "081", "085", "047", "061")


class CensusRestClient:
    """Production HTTP client for ``CensusApiSource`` — the shipped
    equivalent of the reference's ``census``-package wrapper
    (download.py:14-27, which instantiates ``census.Census`` clients
    acs5 / acs5dp / acs5st / sf1).  Zero third-party deps: stdlib
    ``urllib`` against the public data.census.gov JSON API.

    Instances are the ``client(dataset, variables, geoquery) ->
    list[dict]`` callable the adapter takes, so production wiring is::

        src = CensusApiSource(spark, CensusRestClient(api_key=KEY))

    The HTTP transport is injectable (``opener(url) -> str``) so tests
    replay recorded JSON without network — this sandbox has none, and
    CI should never depend on a live government API either.

    The census JSON shape is array-of-arrays with a header row::

        [["NAME","B01001_001E","state","county","tract"],
         ["Census Tract 1","1000","36","005","000100"], ...]

    parsed here into the adapter's row dicts.
    """

    # dataset → URL path fragment (the ``census`` package's routing:
    # acs5→acs/acs5, acs5dp→acs/acs5/profile, acs5st→acs/acs5/subject,
    # decennial sf1→dec/sf1)
    DATASET_PATHS = {
        "acs5": "acs/acs5",
        "acs5dp": "acs/acs5/profile",
        "acs5st": "acs/acs5/subject",
        "decennial": "dec/sf1",
    }
    # sf1 exists only for decennial years; the reference pins 2010
    DECENNIAL_YEAR = 2010

    def __init__(
        self,
        year: int = 2019,
        api_key: str | None = None,
        base_url: str = "https://api.census.gov/data",
        opener: Callable[[str], str] | None = None,
        timeout: float = 60.0,
    ):
        self.year = year
        self.api_key = api_key
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._opener = opener or self._default_opener

    def _default_opener(self, url: str) -> str:
        with urlopen(url, timeout=self.timeout) as resp:  # noqa: S310
            return resp.read().decode("utf-8")

    def url(self, dataset: str, variables: list[str], geoquery: dict) -> str:
        """Request URL for one (dataset, variables, geoquery) — the
        census API's ``get``/``for``/``in`` parameter convention."""
        path = self.DATASET_PATHS.get(dataset)
        if path is None:
            raise ValueError(
                f"unknown dataset {dataset!r} "
                f"(known: {sorted(self.DATASET_PATHS)})"
            )
        year = self.DECENNIAL_YEAR if dataset == "decennial" else self.year
        params = [("get", ",".join(variables))]
        if "for" in geoquery:
            params.append(("for", geoquery["for"]))
        if "in" in geoquery:
            params.append(("in", geoquery["in"]))
        if self.api_key:
            params.append(("key", self.api_key))
        qs = "&".join(
            f"{k}={quote(str(v), safe='*:,')}" for k, v in params
        )
        return f"{self.base_url}/{year}/{path}?{qs}"

    def __call__(
        self, dataset: str, variables: list[str], geoquery: dict
    ) -> list[dict]:
        body = self._opener(self.url(dataset, variables, geoquery))
        table = json.loads(body)
        if not table:
            return []
        header, *rows = table
        return [dict(zip(header, r)) for r in rows]


class CensusApiSource:
    """REST-ingest writer producing the ``ParquetWideSource`` layout."""

    def __init__(
        self,
        spark: SparkSession,
        client: Callable[[str, list[str], dict], list[dict]],
        year: int = 2019,
        state: str = "36",
        counties: tuple[str, ...] = NYC_COUNTIES,
    ):
        self.spark = spark
        self.client = client
        self.year = year
        self.state = state
        self.counties = counties

    # ---- query composition (download.py:29-49) ----------------------
    def geoqueries(self, geotype: str) -> list[dict]:
        if geotype == "tract":
            return [
                {"for": "tract:*", "in": f"state:{self.state} county:{c}"}
                for c in self.counties
            ]
        if geotype == "borough":
            return [
                {"for": f"county:{c}", "in": f"state:{self.state}"}
                for c in self.counties
            ]
        if geotype == "city":
            return [{"for": "place:51000", "in": f"state:{self.state}"}]
        if geotype == "block":
            return [
                {"for": "block:*", "in": f"state:{self.state} county:{c}"}
                for c in self.counties
            ]
        if geotype == "block group":
            return [
                {"for": "block group:*", "in": f"state:{self.state} county:{c}"}
                for c in self.counties
            ]
        raise ValueError(f"unknown geotype: {geotype!r}")

    # ---- column resolution (metadata.py:16-29) ----------------------
    @staticmethod
    def measure_columns(v: Variable) -> dict[str, list[str]]:
        """Requested API columns per dataset for one variable: E+M for
        ACS census columns, the raw name for decennial P-columns."""
        by_dataset: dict[str, list[str]] = {}
        for cv in v.census_variable:
            ds = DATASETS.get(cv[0], DEFAULT_DATASET)
            cols = [cv] if cv[0] == "P" else [f"{cv}E", f"{cv}M"]
            by_dataset.setdefault(ds, []).extend(cols)
        return by_dataset

    # ---- fetch + merge (download.py:89-122) -------------------------
    def fetch_rows(self, variables: list[Variable], geotype: str) -> list[dict]:
        """All geoqueries × all variables' datasets, merged on NAME
        within each geoquery (the reference's pd.merge on NAME)."""
        out: list[dict] = []
        for geoquery in self.geoqueries(geotype):
            merged: dict[str, dict] = {}
            for v in variables:
                for dataset, cols in self.measure_columns(v).items():
                    for row in self.client(dataset, ["NAME"] + cols, geoquery):
                        name = row["NAME"]
                        merged.setdefault(name, {}).update(row)
            out.extend(merged.values())
        return out

    # ---- landing (the ParquetWideSource contract) -------------------
    def write_geotype(
        self, root: str | Path, variables: list[Variable], geotype: str
    ) -> Path:
        """Fetch and land one ``{root}/{geotype}.parquet`` wide file:
        geo parts as strings, every measure column as raw double (the
        sentinel scrub happens on read)."""
        rows = self.fetch_rows(variables, geotype)
        if not rows:
            raise RuntimeError(
                f"census ingest returned no rows for geotype {geotype!r}"
            )
        geo_cols = GEO_COLUMNS[geotype]
        measure_cols = sorted(
            {c for v in variables for cols in self.measure_columns(v).values() for c in cols}
        )
        def geo_value(r: dict, g: str) -> str:
            # the census API names the block-group column 'block group'
            # (space); the landing schema uses 'block_group' — accept
            # both, and FAIL on a missing part rather than landing ''
            # (an empty part silently truncates every census_geoid)
            v = r.get(g)
            if v is None and "_" in g:
                v = r.get(g.replace("_", " "))
            if v is None:
                raise KeyError(
                    f"census row missing geo part {g!r} for geotype "
                    f"{geotype!r} (row keys: {sorted(r)[:8]}…)"
                )
            return str(v)

        data = [
            tuple(
                [geo_value(r, g) for g in geo_cols]
                + [
                    float(r[c]) if r.get(c) not in (None, "") else None
                    for c in measure_cols
                ]
            )
            for r in rows
        ]
        schema = ", ".join(
            [f"`{g}` string" for g in geo_cols]
            + [f"`{c}` double" for c in measure_cols]
        )
        df: DataFrame = self.spark.createDataFrame(data, schema)
        fname = geotype.replace(" ", "_")
        path = Path(root) / f"{fname}.parquet"
        df.repartition(1).write.mode("overwrite").parquet(str(path))
        return path

    def write(
        self, root: str | Path, variables: list[Variable], geotypes: list[str]
    ) -> dict[str, Path]:
        """Land every geotype; returns {geotype: path}.  The result
        directory is a drop-in ``ParquetWideSource`` root."""
        return {
            g: self.write_geotype(root, variables, g) for g in geotypes
        }
