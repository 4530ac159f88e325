"""Vertical aggregation: small geographies → larger custom geographies.

Reference geography/2010_to_2020.py + geography/2010.py.  The reference
computes ``groupby(k).sum(e)`` and ``groupby(k).agg(agg_moe)(m)``
separately and merges them (2010_to_2020.py:52-65) — in Spark both
aggregates ride one ``groupBy``, so the join disappears and the whole
operator is a single shuffle on the target geography key.

Dimension lookups (block → NTA/CDTA/CD/flood-zone) are broadcast joins:
the lookup table is tiny (~39k NYC blocks) next to the fact side, so no
shuffle is paid for the join at any scale.  The pre-join
``select(...).distinct()`` is semantic, not cosmetic — the lookup has
block grain while the join is at tract/block-group grain, and without
the distinct the join would fan out duplicate rows (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.functions.geoid import (
    format_geoid_2010,
    format_geoid_2020,
    format_geotype_2010,
    format_geotype_2020,
)
from db_factfinder_spark.functions.stats import agg_moe, convert_moe, sum_skipna


def aggregate_to_geography(
    df: DataFrame, geo_col: str, geotype_label: str, pff_variable: str
) -> DataFrame:
    """``create_output`` (2010_to_2020.py:52-65): one shuffle computing
    both the NULL-skipping sum of ``e`` and the NaN→0 ``sqrt(Σ m²)``."""
    return (
        df.groupBy(F.col(geo_col).alias("census_geoid"))
        .agg(sum_skipna("e").alias("e"), agg_moe("m").alias("m"))
        .select(
            "census_geoid",
            F.lit(pff_variable).alias("pff_variable"),
            F.lit(geotype_label).alias("geotype"),
            "e",
            "m",
        )
    )


def ct2010_to_ct2020(df: DataFrame, ratio: DataFrame, pff_variable: str) -> DataFrame:
    """2010-tract facts → 2020 tracts by apportionment ratio
    (reference 2010_to_2020.py:82-108).

    Right join from the ratio side keeps every 2020 tract and yields one
    row per 2010→2020 split; ``e`` scales by the ratio and ``m`` deflates
    by the empirical power law (convert_moe).  The ratio table is a few
    thousand rows → broadcast; the only shuffle is the final groupBy on
    the 2020 tract.
    """
    joined = df.join(
        F.broadcast(ratio),
        df["census_geoid"] == ratio["geoid_ct2010"],
        "right",
    )
    e_2020 = F.col("e") * F.col("ratio")
    m_2020 = convert_moe(F.col("e"), F.col("m"), e_2020, F.col("ratio"))
    # bround(16) matches the reference's .round(16) on intermediates
    # (2010_to_2020.py:103-104) — half-even, like numpy.
    scaled = joined.select(
        F.col("geoid_ct2020"),
        F.bround(e_2020, 16).alias("e"),
        F.bround(m_2020, 16).alias("m"),
    )
    return aggregate_to_geography(scaled, "geoid_ct2020", "CT20", pff_variable)


def tract_to_dimension(
    df: DataFrame,
    lookup: DataFrame,
    ratio: DataFrame,
    pff_variable: str,
    dim_col: str,
    geotype_label: str,
) -> DataFrame:
    """2010 tracts → 2020 tracts → an NTA/CDTA-style dimension rollup
    (reference 2010_to_2020.py:110-142).  The block-grain lookup is
    projected to (tract, dim) and deduplicated before a broadcast left
    join, then one shuffle groups by the dimension."""
    ct20 = ct2010_to_ct2020(df, ratio, pff_variable)
    dim = (
        lookup.select(F.col("geoid_tract"), F.col(dim_col)).distinct()
    )
    joined = ct20.join(
        F.broadcast(dim), ct20["census_geoid"] == dim["geoid_tract"], "left"
    ).select(F.col(dim_col), "e", "m")
    # pandas groupby drops NaN keys (reference 2010_to_2020.py:58-61
    # aggregates after the merge with default dropna=True); Spark's
    # groupBy keeps a NULL group — filter tracts missing from the
    # lookup so the output matches row-for-row
    joined = joined.filter(F.col(dim_col).isNotNull())
    return aggregate_to_geography(joined, dim_col, geotype_label, pff_variable)


def _zone_rollup(
    df: DataFrame,
    dim: DataFrame,
    grain_col: str,
    zone_col: str,
    pff_variable: str,
    geotype_label: str,
) -> DataFrame:
    """Zone rollup with the reference's *right-join* semantics
    (2010_to_2020.py:144-197) restructured for scale: Spark cannot
    broadcast the preserved side of a right outer join (the hint is
    silently dropped and the whole fact table shuffle-joins), so
    instead the facts broadcast-*inner*-join the flagged units (no
    shuffle), aggregate per zone (one shuffle of map-side-combined
    partials), and the factless-but-flagged zones — the rows only the
    right join would keep — re-attach via a tiny zone-list left join,
    aggregating to 0 exactly like the pandas ``sum``/``agg_moe`` of an
    all-NaN group."""
    matched = df.join(
        F.broadcast(dim), df["census_geoid"] == dim[grain_col], "inner"
    ).select(F.col(zone_col), "e", "m")
    agg = matched.groupBy(F.col(zone_col).alias("census_geoid")).agg(
        sum_skipna("e").alias("e"), agg_moe("m").alias("m")
    )
    zones = dim.select(F.col(zone_col).alias("census_geoid")).distinct()
    return zones.join(F.broadcast(agg), "census_geoid", "left").select(
        "census_geoid",
        F.lit(pff_variable).alias("pff_variable"),
        F.lit(geotype_label).alias("geotype"),
        F.coalesce("e", F.lit(0.0)).alias("e"),
        F.coalesce("m", F.lit(0.0)).alias("m"),
    )


def block_group_to_zone(
    df: DataFrame,
    lookup: DataFrame,
    pff_variable: str,
    zone_col: str,
    geotype_label: str,
) -> DataFrame:
    """Block-group facts → flood-plain / park-access zone rollups
    (reference 2010_to_2020.py:144-197).  The lookup is pre-filtered to
    rows where the zone flag is set (the NULL filter is load-bearing:
    unflagged block groups drop out while flagged units with no facts
    still aggregate to 0 — see ``_zone_rollup``)."""
    dim = (
        lookup.filter(F.col(zone_col).isNotNull())
        .select("geoid_block_group", zone_col)
        .distinct()
    )
    return _zone_rollup(
        df, dim, "geoid_block_group", zone_col, pff_variable, geotype_label
    )


def prepare_lookup_geo(lookup_raw: DataFrame) -> DataFrame:
    """Derive the join-ready lookup columns from the raw block-grain
    crosswalk (reference 2010_to_2020.py:16-35): tract/block-group
    prefixes and flag-gated zone codes (zone code NULL when flag unset).
    All string-typed."""
    flag = lambda f: F.col(f).cast("int") != 0  # noqa: E731
    return lookup_raw.select(
        "*",
        F.substring("geoid", 1, 11).alias("geoid_tract"),
        F.substring("geoid", 1, 12).alias("geoid_block_group"),
        F.when(flag("fp_500"), F.col("cdta2020")).alias("cdta_fp_500"),
        F.when(flag("fp_100"), F.col("cdta2020")).alias("cdta_fp_100"),
        F.when(flag("park_access"), F.col("cdta2020")).alias("cdta_park_access"),
    )


def prepare_ratio(ratio_raw: DataFrame) -> DataFrame:
    """Normalize the apportionment table (reference 2010_to_2020.py:37-50):
    ratio → double (bround 18 like the reference's round(18)); tract
    geoids = '360' + zero-padded 8-char boro-tract code."""
    return ratio_raw.select(
        F.concat(F.lit("360"), F.lpad("boroct2010", 8, "0")).alias("geoid_ct2010"),
        F.concat(F.lit("360"), F.lpad("boroct2020", 8, "0")).alias("geoid_ct2020"),
        F.bround(F.col("ratio").cast("double"), 18).alias("ratio"),
    )


class AggregatedGeography2020:
    """Registry of vertical aggregators for the 2010→2020 geography
    (mirrors reference 2010_to_2020.py:199-219's ``options``)."""

    name = "2010_to_2020"
    format_geoid = staticmethod(format_geoid_2020)
    format_geotype = staticmethod(format_geotype_2020)

    def __init__(self, lookup: DataFrame, ratio: DataFrame):
        self.lookup = lookup
        self.ratio = ratio

    def options(self, source: str = "acs"):
        if source != "acs":
            return {}
        return {
            "tract": {
                "NTA": lambda df, var: tract_to_dimension(
                    df, self.lookup, self.ratio, var, "nta2020", "NTA"
                ),
                "CDTA": lambda df, var: tract_to_dimension(
                    df, self.lookup, self.ratio, var, "cdta2020", "CDTA"
                ),
                "CT20": lambda df, var: ct2010_to_ct2020(df, self.ratio, var),
            },
            "block group": {
                "cdta_fp_500": lambda df, var: block_group_to_zone(
                    df, self.lookup, var, "cdta_fp_500", "cdta_fp_500"
                ),
                "cdta_fp_100": lambda df, var: block_group_to_zone(
                    df, self.lookup, var, "cdta_fp_100", "cdta_fp_100"
                ),
                "cdta_park_access": lambda df, var: block_group_to_zone(
                    df, self.lookup, var, "cdta_park_access", "cdta_park_access"
                ),
            },
        }

    @property
    def aggregated_geography(self) -> list[str]:
        return sorted(
            {
                to_geo
                for from_map in self.options("acs").values()
                for to_geo in from_map.keys()
            }
        )

    def support_geoids(self) -> DataFrame:
        """Dimension export (reference 2010_to_2020.py:266-290):
        distinct NTA/CDTA/boro codes + the city row."""
        lk = self.lookup
        nta = (
            lk.select(
                F.col("nta2020").alias("geoid"), F.col("ntaname").alias("geogname")
            )
            .distinct()
            .withColumn("geotype", F.lit("NTA2020"))
        )
        cdta = (
            lk.select(
                F.col("cdta2020").alias("geoid"), F.col("cdtaname").alias("geogname")
            )
            .distinct()
            .withColumn("geotype", F.lit("CDTA2020"))
        )
        boro = (
            lk.select(
                F.col("borocode").alias("geoid"), F.col("boroname").alias("geogname")
            )
            .distinct()
            .withColumn("geotype", F.lit("Boro2020"))
        )
        city = lk.sparkSession.createDataFrame(
            [("0", "New York City", "City2020")], "geoid string, geogname string, geotype string"
        )
        return (
            nta.unionByName(cdta)
            .unionByName(boro)
            .unionByName(city)
            .select("geoid", "geotype", "geogname")
        )


# ---------------------------------------------------------------------------
# 2010 geography registry (reference geography/2010.py:16-243)
# ---------------------------------------------------------------------------

def prepare_lookup_geo_2010(lookup_raw: DataFrame) -> DataFrame:
    """Derive join-ready 2010 lookup columns from the raw block-grain
    crosswalk (reference geography/2010.py:16-38):

    * ``geoid_block``       = county_fips || ctcb2010
    * ``geoid_block_group`` = first 12 chars of geoid_block
    * ``geoid_tract``       = county_fips || ct2010
    * ``cd_fp_500`` / ``cd_fp_100`` / ``cd_park_access`` = the CD code
      when the flag is set, else NULL (flag-gated zone codes, same
      pattern as the 2020 lookup)

    All string-typed; one map-side projection, no shuffle.
    """
    flag = lambda f: F.col(f).cast("int") != 0  # noqa: E731
    block = F.concat(F.col("county_fips"), F.col("ctcb2010"))
    return lookup_raw.select(
        "*",
        block.alias("geoid_block"),
        F.substring(block, 1, 12).alias("geoid_block_group"),
        F.concat(F.col("county_fips"), F.col("ct2010")).alias("geoid_tract"),
        F.when(flag("fp_500"), F.col("cd")).alias("cd_fp_500"),
        F.when(flag("fp_100"), F.col("cd")).alias("cd_fp_100"),
        F.when(flag("park_access"), F.col("cd")).alias("cd_park_access"),
    )


def tract_to_dimension_2010(
    df: DataFrame,
    lookup: DataFrame,
    pff_variable: str,
    dim_col: str,
    geotype_label: str,
) -> DataFrame:
    """2010 tract facts → NTA / CD rollup (reference geography/2010.py:
    55-65, 171-184).  Unlike the 2020 path there is no crosswalk hop —
    the tract joins the dimension directly.  Block-grain lookup is
    projected to (tract, dim) + distinct (grain change), broadcast left
    join, then one shuffle on the dimension key."""
    dim = lookup.select("geoid_tract", dim_col).distinct()
    joined = df.join(
        F.broadcast(dim), df["census_geoid"] == dim["geoid_tract"], "left"
    ).select(F.col(dim_col), "e", "m")
    # pandas groupby drops NaN keys — match row-for-row
    joined = joined.filter(F.col(dim_col).isNotNull())
    return aggregate_to_geography(joined, dim_col, geotype_label, pff_variable)


def block_to_zone_2010(
    df: DataFrame,
    lookup: DataFrame,
    pff_variable: str,
    zone_col: str,
    geotype_label: str,
    grain_col: str = "geoid_block_group",
) -> DataFrame:
    """Block / block-group facts → CD flood-plain / park-access zones
    (reference geography/2010.py:67-169).  ``grain_col`` selects the
    ACS block-group grain (``geoid_block_group``) or the decennial
    block grain (``geoid_block``).  The NULL filter on the zone flag is
    load-bearing: unflagged units drop out while flagged units with no
    facts still aggregate to 0 (see ``_zone_rollup`` for why the
    reference's right join is restructured)."""
    dim = (
        lookup.filter(F.col(zone_col).isNotNull())
        .select(grain_col, zone_col)
        .distinct()
    )
    return _zone_rollup(
        df, dim, grain_col, zone_col, pff_variable, geotype_label
    )


class AggregatedGeography2010:
    """Registry of vertical aggregators for the 2010 geography
    (mirrors reference geography/2010.py:186-205's ``options``):
    tract → NTA / CD for both sources; zone rollups from block-group
    grain for ACS and block grain for decennial."""

    name = "2010"
    format_geoid = staticmethod(format_geoid_2010)
    format_geotype = staticmethod(format_geotype_2010)

    def __init__(self, lookup: DataFrame):
        self.lookup = lookup

    def _zones(self, grain_col: str):
        return {
            z: (
                lambda df, var, _z=z, _g=grain_col: block_to_zone_2010(
                    df, self.lookup, var, _z, _z, _g
                )
            )
            for z in ("cd_fp_500", "cd_fp_100", "cd_park_access")
        }

    def options(self, source: str = "acs"):
        tract = {
            "NTA": lambda df, var: tract_to_dimension_2010(
                df, self.lookup, var, "nta", "NTA"
            ),
            "cd": lambda df, var: tract_to_dimension_2010(
                df, self.lookup, var, "cd", "cd"
            ),
        }
        if source == "decennial":
            return {"tract": tract, "block": self._zones("geoid_block")}
        return {"tract": tract, "block group": self._zones("geoid_block_group")}

    @property
    def aggregated_geography(self) -> list[str]:
        return sorted(
            {
                to_geo
                for source in ("acs", "decennial")
                for from_map in self.options(source).values()
                for to_geo in from_map.keys()
            }
        )
