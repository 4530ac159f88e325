"""Batch-driver equivalents of the reference ``pipelines/`` scripts.

Here: the ACS *community profiles* driver (reference
pipelines/acs_community_profiles.py:31-58) — see
:func:`community_profiles` — and the ACS *manual update* driver
(reference pipelines/acs_manual_update.py:96-163) — a
statistics-free reshape of
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


# ---------------------------------------------------------------------------
# Community profiles (reference pipelines/acs_community_profiles.py:31-58)
# ---------------------------------------------------------------------------

def _profile_frames(
    calculate,
    mappings: list[dict],
) -> tuple[list[tuple[DataFrame, list[str]]], list[str], list[tuple[str, str, str]]]:
    """Shared front half of both assembly modes: run
    ``calculate(pff_variable, geotype)`` per mapping, rename the measure
    letters to the published profile column names, select
    ``census_geoid`` + the mapped columns
    (acs_community_profiles.py:43-46), isolating per-mapping failures
    like the reference's bare try/except (:42-49).

    Returns (frames, ordered output columns, failures).  Output column
    names must be globally distinct — the reference's pandas merge would
    silently suffix colliding names with ``_x``/``_y``, which is never
    intended by the mapping file, so here it is a hard error."""
    frames: list[tuple[DataFrame, list[str]]] = []
    out_cols: list[str] = []
    failures: list[tuple[str, str, str]] = []
    for inp in mappings:
        var = inp["pff_variable"]
        geo = inp["geotype"]
        colmap = dict(inp["column_mapping"])
        vals = list(colmap.values())
        # collisions with earlier mappings AND within this mapping —
        # either would otherwise surface later as an opaque
        # AMBIGUOUS_REFERENCE during assembly
        dup = sorted(
            {c for c in vals if c in out_cols or vals.count(c) > 1}
        )
        if dup:
            raise ValueError(
                f"community_profiles: duplicate output column(s) {dup} "
                f"from mapping {var}/{geo}"
            )
        try:
            df = calculate(var, geo)
            frame = df.select(
                "census_geoid",
                *[
                    F.col(measure).cast("double").alias(out)
                    for measure, out in colmap.items()
                ],
            )
        except Exception as exc:  # noqa: BLE001 — reference :47-49
            failures.append((var, geo, str(exc)))
            continue
        frames.append((frame, list(colmap.values())))
        out_cols.extend(colmap.values())
    if failures:
        import logging

        for var, geo, msg in failures:
            logging.warning("community_profiles task failed: %s/%s: %s", var, geo, msg)
    if not frames:
        raise RuntimeError(
            "community_profiles: no mapping produced a frame"
            + (
                f"; all {len(failures)} failed, first: "
                f"{failures[0][0]}/{failures[0][1]}: {failures[0][2]}"
                if failures
                else " (empty mapping list)"
            )
        )
    return frames, out_cols, failures


def community_profiles(
    calculate,
    mappings: list[dict],
    assembly: str = "group",
) -> DataFrame:
    """Assemble one wide community-profile table from per-(variable,
    geotype) engine results (reference
    pipelines/acs_community_profiles.py:31-58).

    ``calculate``: the engine query API — ``calculate(pff_variable,
    geotype) -> DataFrame`` with a ``census_geoid`` column plus the
    measure letters; normally a :class:`~db_factfinder_spark.plans.
    planner.FactFinderEngine` instance.  ``mappings``: the parsed
    variable-mapping file, ``[{pff_variable, geotype, column_mapping:
    {measure_letter: output_column}}, ...]``
    (acs_community_profiles_variable_mapping.json).

    The reference assembles with ``reduce(pd.merge(..., on=
    ["census_geoid"], how="outer"))`` (:52-54) — for its 75 mappings
    that is 74 pairwise outer joins.  On Spark that plan is 74 chained
    sort-merge joins; since every engine result carries **at most one
    row per census_geoid** (one fact row per geography unit), the outer
    merge is equivalent to a union + one grouped ``first(ignorenulls)``
    per output column — each geoid's row for a column comes from
    exactly one mapping's frame, so "first non-null" IS that frame's
    value and the join collapses to one grouped aggregation on
    ``census_geoid`` regardless of mapping count (the SURVEY §2.3 J8
    formulation) — and when every branch aggregate already partitions
    on its geoid key with a common partition count, Spark's
    partition-aligned union lets the assembly reuse those exchanges,
    adding ZERO shuffles of its own (plan-audited in test_plans).  ``assembly="group"`` (default) is that plan;
    ``assembly="outer"`` is the literal reduce-full-outer-join for
    cross-checking (tests assert both produce identical results).

    NULL semantics match pandas: a geoid absent from a mapping's
    geography gets NULL in that mapping's columns.  Mixed geotypes
    (CDTA + borough + city rows in one table, disjoint geoid spaces)
    union, never merge — exactly the reference output shape."""
    frames, out_cols, _ = _profile_frames(calculate, mappings)
    if assembly == "outer":
        out = reduce(
            lambda left, right: left.join(right, ["census_geoid"], "full_outer"),
            [f for f, _ in frames],
        )
        return out.select("census_geoid", *out_cols)
    if assembly != "group":
        raise ValueError(f"community_profiles: unknown assembly {assembly!r}")
    padded = [
        f.select(
            "census_geoid",
            *[
                (F.col(c) if c in cols else F.lit(None).cast("double")).alias(c)
                for c in out_cols
            ],
        )
        for f, cols in frames
    ]
    unioned = reduce(DataFrame.unionByName, padded)
    return unioned.groupBy("census_geoid").agg(
        *[F.first(c, ignorenulls=True).alias(c) for c in out_cols]
    )


# ---------------------------------------------------------------------------
# Manual-update workbook ingest (reference pipelines/acs_manual_update.py:
# 71-115 — sheet_names registry + pd.read_excel(sheet_name=None))
# ---------------------------------------------------------------------------

def manual_update_sheet_names(year: str) -> list[tuple[str, str]]:
    """The reference's per-year (sheet_name, domain) registry
    (acs_manual_update.py:71-97): four domain sheets whose names carry
    a year-range suffix and, for 2010, an ``_Inflated`` marker (the
    app represents 2010 data in later-year dollars)."""
    if year == "2010":
        suffix, inflated = "0610", "_Inflated"
    elif year == "2020":
        suffix, inflated = "1620", ""
    elif year == "2021":
        suffix, inflated = "1721", ""
    else:
        raise ValueError(
            f"unknown manual-update year {year!r} (known: 2010/2020/2021)"
        )
    return [
        (f"Dem{suffix}", "demographic"),
        (f"Social{suffix}", "social"),
        (f"Econ{suffix}{inflated}", "economic"),
        (f"Housing{suffix}{inflated}", "housing"),
    ]


def read_manual_workbook(
    spark: SparkSession,
    path: str,
    sheet_domains: list[tuple[str, str]],
) -> list[tuple[DataFrame, str]]:
    """Workbook → the ``(DataFrame, domain)`` list ``manual_update``
    takes — the glue the reference implements with
    ``pd.read_excel(..., sheet_name=None, engine="openpyxl")``
    (acs_manual_update.py:114).

    Two source layouts:

    * ``*.xlsx`` — the reference's actual artifact; read driver-side
      via pandas/openpyxl (import-gated: this container ships
      neither the workbook nor openpyxl, so the path raises a clear
      error instead of an ImportError mid-pipeline);
    * a DIRECTORY of ``{sheet_name}.csv`` files — the recorded
      workbook layout used in tests and available anywhere (a
      workbook is a few thousand rows; CSV round-trips it exactly).

    The workbook is driver-sized by construction (SURVEY §2.1 S7), so
    ``spark.createDataFrame`` per sheet is the right boundary — the
    Spark-side reshape (melt/union/semi-join) is ``manual_update``.
    """
    import os

    out: list[tuple[DataFrame, str]] = []
    if str(path).endswith(".xlsx"):
        try:
            import pandas as _pd

            frames = _pd.read_excel(path, sheet_name=None, engine="openpyxl")
        except ImportError as e:  # pragma: no cover — env without openpyxl
            raise RuntimeError(
                "reading .xlsx manual-update workbooks needs openpyxl; "
                "install it, or export the workbook to a directory of "
                "{sheet_name}.csv files and pass that directory instead"
            ) from e
        for sheet, domain in sheet_domains:
            if sheet not in frames:
                raise KeyError(
                    f"workbook has no sheet {sheet!r} "
                    f"(sheets: {sorted(frames)})"
                )
            out.append((spark.createDataFrame(frames[sheet]), domain))
        return out
    for sheet, domain in sheet_domains:
        f = os.path.join(path, f"{sheet}.csv")
        if not os.path.exists(f):
            raise FileNotFoundError(
                f"no recorded sheet {sheet!r} at {f} — export the "
                "workbook sheet as CSV with its header row"
            )
        out.append(
            (spark.read.csv(f, header=True, inferSchema=False), domain)
        )
    return out


# ---------------------------------------------------------------------------
# the production ACS deliverable (reference pipelines/acs.py:36-63)
# ---------------------------------------------------------------------------

# create_acs.sql:4-16's column order — the exact shipped CSV shape
ACS_PRODUCTION_COLUMNS = [
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

# the published domains (reference pipelines/acs.py:48) — the catalog
# also carries community_profiles-domain variables the CSV doesn't ship
ACS_PRODUCTION_DOMAINS = ("demographic", "economic", "housing", "social")

# the production grid per geography vintage (reference
# pipelines/acs.py:44-46: tract joins the grid only outside the
# 2010_to_2020 geography)
ACS_PRODUCTION_GEOTYPES = ["NTA", "CDTA", "CT20", "city", "borough"]


def production_acs_run(
    engine,
    geotypes: list[str] | None = None,
    output_path: str | None = None,
    domains: tuple[str, ...] = ACS_PRODUCTION_DOMAINS,
) -> DataFrame:
    """The reference's shipped production artifact as ONE lazy plan:
    every published-domain catalog variable × the production geotype
    grid, tagged with ``domain`` and column-ordered exactly per
    create_acs.sql:4-16 (reference pipelines/acs.py:36-63 runs the
    same grid through a 10-process pool and ``pd.concat`` →
    ``to_csv``; here the grid is the set-based batch planner —
    plans/batch.py — and the sink is the distributed CSV writer).

    When ``output_path`` is given the frame is also written through
    ``write_csv`` (header on, overwrite) — the literal acs.csv the
    reference's CI publishes into pff_acs via \\COPY."""
    from db_factfinder_spark.sources.readers import write_csv

    dset = set(domains)
    variables = [
        m["pff_variable"]
        for m in engine.catalog.metadata
        if m.get("domain") in dset
    ]
    out = engine.calculate_batch_catalog(
        geotypes if geotypes is not None else ACS_PRODUCTION_GEOTYPES,
        variables=variables,
    ).select(*ACS_PRODUCTION_COLUMNS)
    if output_path is not None:
        write_csv(out, output_path)
        # the artifact is on disk — free the batch's persisted frames
        # so a long-lived session (repeated vintages, bench loops)
        # doesn't accumulate dead caches in the CacheManager
        for cached in getattr(engine, "_batch_caches", []):
            cached.unpersist()
        engine._batch_caches = []
    return out


def _two_batches(
    engine_new, engine_old, geotypes_new, geotypes_old, variables
):
    """Build the two vintages' batch plans on TWO driver threads.

    Each ``calculate_batch_catalog`` call spends seconds of
    JVM-blocking driver work (py4j round-trips, Catalyst analysis, and
    — under AQE — the eager in-build materialization of its
    lineage-truncation checkpoints), during which the other vintage's
    identical work can proceed: the officially-supported
    multi-threaded-driver pattern (optimization guide §2.6), already
    used INSIDE each batch for its per-geotype assemblies.  The two
    engines share nothing mutable (separate catalogs, sources,
    ``_batch_caches`` lists), and the returned frames are ordinary
    lazy plans — values are untouched, only wall-clock overlaps.
    Measured at sf0.1 (same-session interleaved A/B, warm passes):
    q383 build 10.9/9.4 s serial → 7.2/5.9 s threaded; warm totals
    19.5/15.9 s → 15.7/12.8 s (~0.80×), exec unchanged."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        f_new = ex.submit(
            engine_new.calculate_batch_catalog,
            geotypes_new,
            variables=variables,
            tag_domain=False,
        )
        f_old = ex.submit(
            engine_old.calculate_batch_catalog,
            geotypes_old,
            variables=variables,
            tag_domain=False,
        )
        return f_new.result(), f_old.result()


def vintage_change_table(
    engine_new,
    engine_old,
    geotypes: list[str],
    variables: list[str] | None = None,
) -> DataFrame:
    """Cross-vintage change table — the analytics product a census user
    builds next once two ACS vintages are published: per (variable ×
    geotype × geography unit), the estimate delta with the MOE of the
    difference ``sqrt(m_new² + m_old²)`` (the standard ACS
    difference-of-estimates formula — the same quadrature the
    reference's wrkrnothm special applies to a within-vintage
    difference, special.py / reference median.py conventions).

    Both vintages ride ONE lazy plan: each engine contributes its
    set-based catalog batch (plans/batch.py) and the two published
    frames inner-join on (geotype, geoid, variable) — variables or
    units present in only one vintage drop, like a SQL change table.
    NULL statistics (suppressed cells) propagate to NULL deltas.

    Scale shape: the join keys on the published-output grain (bounded
    by the catalog × geography, not the wide source), and both sides
    arrive pre-aggregated — at 100 TB the join input is the two
    output-sized frames, never the scans."""
    new, old = _two_batches(
        engine_new, engine_old, geotypes, geotypes, variables
    )
    keys = ["census_geoid", "geotype", "pff_variable"]
    n = new.select(
        *keys,
        F.col("labs_geoid"),
        F.col("labs_geotype"),
        F.col("e").alias("e_new"),
        F.col("m").alias("m_new"),
    )
    o = old.select(
        *keys,
        F.col("e").alias("e_old"),
        F.col("m").alias("m_old"),
    )
    j = n.join(o, keys, "inner")
    # + 0.0 canonicalizes a signed-zero delta; sqrt is IEEE-exact so
    # the quadrature is bit-stable across engines without rounding
    return j.select(
        *keys,
        "labs_geoid",
        "labs_geotype",
        "e_new",
        "e_old",
        (F.col("e_new") - F.col("e_old") + F.lit(0.0)).alias("delta_e"),
        "m_new",
        "m_old",
        F.sqrt(
            F.col("m_new") * F.col("m_new") + F.col("m_old") * F.col("m_old")
        ).alias("delta_m"),
    )


def cross_geography_change_table(
    engine_new,
    engine_old,
    variables: list[str] | None = None,
    geotype_new: str = "tract",
    geotype_old: str = "CT20",
) -> DataFrame:
    """Cross-GEOGRAPHY change table — the product NYC actually
    publishes compares a 2010-geography vintage against a
    2020-geography vintage, so the old vintage must first be
    apportioned onto 2020 tracts through the tract crosswalk
    (``ct2010_to_ct2020`` + ``convert_moe`` — reference geography/
    2010_to_2020.py:82-108) before the delta join.

    ``engine_old`` carries the 2010-sourced data on the 2010_to_2020
    geography: its set-based batch at ``CT20`` runs the ratio
    right-join, the power-law MOE deflation, and the 2020-tract fold —
    so the apportionment is the SAME operator the production grid uses
    (plans/batch.py), not a bespoke path.  ``engine_new`` is the
    2020-geography vintage at native tracts.  The reference builds
    CT20 geoids as ``'360' + boroct2020`` (2010_to_2020.py:47-50) —
    the same 11-char key space as native 2020 tract geoids — so the
    two sides inner-join directly on (census_geoid, pff_variable).
    2020 tracts that exist on only one side (redistricting splits with
    new-only codes) drop like a SQL inner change table; the
    status-classifying outer variant is ``vintage_change_table_outer``.

    Scale shape: both sides arrive pre-aggregated at the published
    grain (the crosswalk join happens inside the old batch against a
    broadcast ratio table), so at 100 TB the delta join's input is two
    output-sized frames, never the scans."""
    new, old = _two_batches(
        engine_new, engine_old, [geotype_new], [geotype_old], variables
    )
    keys = ["census_geoid", "pff_variable"]
    n = new.select(
        *keys,
        F.col("labs_geoid"),
        F.col("geotype").alias("geotype_new"),
        F.col("e").alias("e_new"),
        F.col("m").alias("m_new"),
    )
    o = old.select(
        *keys,
        F.col("geotype").alias("geotype_old"),
        F.col("e").alias("e_old"),
        F.col("m").alias("m_old"),
    )
    j = n.join(o, keys, "inner")
    return j.select(
        *keys,
        "geotype_new",
        "geotype_old",
        "labs_geoid",
        "e_new",
        "e_old",
        (F.col("e_new") - F.col("e_old") + F.lit(0.0)).alias("delta_e"),
        "m_new",
        "m_old",
        F.sqrt(
            F.col("m_new") * F.col("m_new") + F.col("m_old") * F.col("m_old")
        ).alias("delta_m"),
    )


def significant_change_table(
    engine_new,
    engine_old,
    geotypes: list[str],
    variables: list[str] | None = None,
) -> DataFrame:
    """The published ACS comparison product on top of
    ``vintage_change_table``: percent change and the Census Bureau's
    90%-confidence statistical-significance test.  With both MOEs at
    the 90% level the test statistic simplifies exactly:

        |e₁ − e₂| > 1.645 · √((m₁/1.645)² + (m₂/1.645)²)
                  = √(m₁² + m₂²)  =  delta_m

    (the ACS General Handbook's comparison formula), so ``significant``
    is a pure column expression over the delta frame — no extra
    shuffle, no re-scaling.  ``pct_change`` is NULL when the base
    estimate is 0 or either side is suppressed; ``significant`` is
    NULL when the deltas are (a suppressed cell cannot be tested)."""
    delta = vintage_change_table(
        engine_new, engine_old, geotypes, variables=variables
    )
    pct = F.when(
        F.col("e_old") != 0,
        F.col("delta_e") / F.col("e_old") * 100 + F.lit(0.0),
    )
    # 1.0/0.0/NULL double, not boolean: NULL booleans render
    # differently across engine->pandas bridges (None vs NaN), while
    # the numeric comparator canonicalizes NULL doubles
    sig = F.when(
        F.col("delta_e").isNotNull() & F.col("delta_m").isNotNull(),
        (F.abs(F.col("delta_e")) > F.col("delta_m")).cast("double"),
    )
    return delta.select(
        "*", pct.alias("pct_change"), sig.alias("significant")
    )


def vintage_change_table_outer(
    engine_new,
    engine_old,
    geotypes: list[str],
    variables: list[str] | None = None,
) -> DataFrame:
    """Outer-mode change table with status classification — the real
    change tables a data consumer publishes do not silently drop
    variables or units present in one vintage (the documented
    inner-join behavior of ``vintage_change_table``); they classify
    every (unit × variable) as

    * ``added``     — present only in the new vintage (a new catalog
      variable, or a geography unit created by the new vintage)
    * ``retired``   — present only in the old vintage
    * ``changed``   — present in both with a different estimate (two
      NULL/suppressed estimates compare as equal, like SQL
      ``IS DISTINCT FROM``)
    * ``unchanged`` — present in both with the same estimate

    (the corpus_diff pattern — llmdata/integrity.py — applied to the
    published grain).  Delta/quadrature columns are NULL for
    added/retired rows; labs formatting comes from whichever side has
    the row.  Real added/retired rows exist across the packaged
    2018/2019 catalogs (970 vs 1,047 variables)."""
    new, old = _two_batches(
        engine_new, engine_old, geotypes, geotypes, variables
    )
    keys = ["census_geoid", "geotype", "pff_variable"]
    n = new.select(
        *keys,
        F.col("labs_geoid").alias("labs_geoid_new"),
        F.col("labs_geotype").alias("labs_geotype_new"),
        F.col("e").alias("e_new"),
        F.col("m").alias("m_new"),
        F.lit(True).alias("in_new"),
    )
    o = old.select(
        *keys,
        F.col("labs_geoid").alias("labs_geoid_old"),
        F.col("labs_geotype").alias("labs_geotype_old"),
        F.col("e").alias("e_old"),
        F.col("m").alias("m_old"),
        F.lit(True).alias("in_old"),
    )
    j = n.join(o, keys, "full_outer")
    both = F.col("in_new").isNotNull() & F.col("in_old").isNotNull()
    status = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("retired"))
        .when(F.col("e_new").eqNullSafe(F.col("e_old")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *keys,
        F.coalesce("labs_geoid_new", "labs_geoid_old").alias("labs_geoid"),
        F.coalesce("labs_geotype_new", "labs_geotype_old").alias(
            "labs_geotype"
        ),
        status.alias("status"),
        "e_new",
        "e_old",
        F.when(
            both, F.col("e_new") - F.col("e_old") + F.lit(0.0)
        ).alias("delta_e"),
        "m_new",
        "m_old",
        F.when(
            both,
            F.sqrt(
                F.col("m_new") * F.col("m_new")
                + F.col("m_old") * F.col("m_old")
            ),
        ).alias("delta_m"),
    )
