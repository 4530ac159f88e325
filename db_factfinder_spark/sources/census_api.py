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

from pathlib import Path
from typing import Callable

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
