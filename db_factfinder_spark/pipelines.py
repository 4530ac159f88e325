"""Batch-driver equivalents of the reference ``pipelines/`` scripts.

Currently: the ACS *manual update* driver (reference
pipelines/acs_manual_update.py:96-163) — a statistics-free reshape of
analyst-provided workbook sheets into the published long schema:

    per sheet: strip ``Unnamed`` columns → melt ``{Var}{E|M|C|P|Z}``
    column groups into long rows (one stack generator, no shuffle) →
    tag domain; then: union sheets → drop rows with no geotype (P7) →
    catalog semi-join keeping only known variables (J7) → reorder into
    the output schema, where ``census_geoid``/``geotype`` are NULL and
    the sheet's geoid/geotype land in the ``labs_*`` columns
    (acs_manual_update.py:141-143's rename + reindex).

The Excel read itself stays out of the engine (SURVEY §2.1 S7): sheets
arrive as DataFrames — in production ``pandas.read_excel`` →
``spark.createDataFrame`` per sheet, a driver-side operation on a
workbook of a few thousand rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_factfinder_spark.operators.pivot import unpivot_cempz

# pipelines/acs_manual_update.py:9-21
OUTPUT_SCHEMA_COLUMNS = [
    "census_geoid",
    "labs_geoid",
    "geotype",
    "labs_geotype",
    "pff_variable",
    "c",
    "e",
    "m",
    "p",
    "z",
    "domain",
]

_MEASURES = "EMCPZ"


def extract_field_names(columns: list[str]) -> list[str]:
    """Distinct variable names from ``{Var}{measure}`` sheet columns,
    first-appearance order (acs_manual_update.py:59-60): drop
    GeoType/GeoID, strip the measure suffix, dedupe."""
    out: list[str] = []
    for c in columns:
        if c in ("GeoType", "GeoID") or c.startswith("Unnamed"):
            continue
        base = c[:-1]
        if base not in out:
            out.append(base)
    return out


def transform_sheet(df: DataFrame, domain: str) -> DataFrame:
    """One workbook sheet → long rows (acs_manual_update.py:44-56,
    96-108).  Melt is a single stack generator — row-local, no shuffle;
    measures a variable lacks in the sheet become NULL columns first
    (pandas concat alignment does the same)."""
    kept = [c for c in df.columns if not c.startswith("Unnamed")]
    df = df.select(*kept)
    fields = extract_field_names(kept)
    missing = {
        f"{v}{s}": F.lit(None).cast("double")
        for v in fields
        for s in _MEASURES
        if f"{v}{s}" not in kept
    }
    if missing:
        df = df.withColumns(missing)
    # reference lowercases both the variable name and the measure suffix
    renamed = df.select(
        F.col("GeoType").alias("geotype"),
        F.col("GeoID").alias("geoid"),
        *[
            F.col(f"`{v}{s}`").cast("double").alias(f"{v.lower()}{s.lower()}")
            for v in fields
            for s in _MEASURES
        ],
    )
    long = unpivot_cempz(
        renamed, [v.lower() for v in fields], ["geotype", "geoid"]
    )
    return long.withColumn("domain", F.lit(domain))


def manual_update(
    spark: SparkSession,
    sheets: list[tuple[DataFrame, str]],
    known_variables: list[str],
) -> DataFrame:
    """The full driver (acs_manual_update.py:111-157): melt every
    (sheet, domain), union, drop geotype-less rows, keep only
    catalog-known variables via a broadcast semi-join, and reorder into
    ``OUTPUT_SCHEMA_COLUMNS`` (census_geoid/geotype NULL — the workbook
    carries labs identifiers only)."""
    frames = [transform_sheet(df, domain) for df, domain in sheets]
    out = reduce(DataFrame.unionByName, frames)
    out = out.na.drop(subset=["geotype"])
    known = spark.createDataFrame(
        [(v,) for v in known_variables], "pff_variable string"
    ).distinct()
    out = out.join(F.broadcast(known), "pff_variable", "left_semi")
    return out.select(
        F.lit(None).cast("string").alias("census_geoid"),
        F.col("geoid").alias("labs_geoid"),
        F.lit(None).cast("string").alias("geotype"),
        F.col("geotype").alias("labs_geotype"),
        "pff_variable",
        "c",
        "e",
        "m",
        "p",
        "z",
        "domain",
    )
