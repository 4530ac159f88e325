"""The query planner — ``calculate(pff_variable, geotype)`` as a lazy
DataFrame plan.

This is the Spark lifecycle equivalent of the reference's
``Calculate.__call__`` (calculate.py:376-388): the catalog classifies
the variable (profile-only / median / special / base), the planner
composes the matching dataflow out of the operators in
``db_factfinder_spark.operators``, and Catalyst/AQE handle everything
the reference does imperatively (column pruning, join strategy, memory).

Key scale decisions:

* plans are memoized per ``(variable, geotype)`` — 103 distinct base
  variables serve 1,047 derived variables, so base subplans are shared,
  and ``persist_bases=True`` materializes them once per batch run;
* the per-task process pool of the reference (pipelines/acs.py:39) is
  replaced by *one* unioned lazy plan — Spark's scheduler parallelizes
  across the union branches and geographies;
* every dimension join is broadcast, every aggregate is a single
  shuffle on its output geography key.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from db_factfinder_spark.catalog import Catalog, Variable
from db_factfinder_spark.functions.geoid import make_census_geoid
from db_factfinder_spark.functions.stats import get_c, get_p, get_z, round_cempz
from db_factfinder_spark.operators.cleaning import cleaning
from db_factfinder_spark.operators.horizontal import aggregate_horizontal
from db_factfinder_spark.operators.median import calculate_median
from db_factfinder_spark.operators.pivot import pivot_e, pivot_e_m
from db_factfinder_spark.operators.special import SPECIAL_FUNCTIONS
from db_factfinder_spark.operators.vertical import (
    AggregatedGeography2010,
    AggregatedGeography2020,
)
from db_factfinder_spark.sources.cache import CheckpointCache
from db_factfinder_spark.sources.readers import read_wide, scrub_wide, scrub_wide_profile

FACT_COLUMNS = ["census_geoid", "pff_variable", "geotype", "c", "e", "m", "p", "z"]
OUTPUT_COLUMNS = [
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
]

POVERTY_VARIABLES = ["pbwpv", "pu18bwpv", "p65plbwpv"]


class ParquetWideSource:
    """Wide source table reader — the engine-side stand-in for the
    census REST ingest (download.py:51-141).  Expects
    ``{root}/{geotype}.parquet`` wide frames with geo-part string
    columns and raw census measure columns; applies the sentinel scrub
    and geoid synthesis on read."""

    def __init__(self, spark: SparkSession, root: str | Path):
        self.spark = spark
        self.root = Path(root)

    def _read(self, geotype: str) -> DataFrame:
        # spaces in geotype names → underscores in filenames
        fname = geotype.replace(" ", "_")
        path = self.root / f"{fname}.parquet"
        if not path.exists():
            available = sorted(p.stem for p in self.root.glob("*.parquet"))
            raise ValueError(
                f"no source table for geotype {geotype!r} under {self.root}"
                f" (available: {available})"
            )
        return read_wide(self.spark, str(path))

    def load_e_m(self, geotype: str, v: Variable) -> DataFrame:
        df = scrub_wide(self._read(geotype), v, geotype)
        df = make_census_geoid(df, geotype)
        return df.withColumns(
            {"geotype": F.lit(geotype), "pff_variable": F.lit(v.pff_variable)}
        )

    def load_e_m_p_z(self, geotype: str, v: Variable) -> DataFrame:
        df = scrub_wide_profile(self._read(geotype), v, geotype)
        df = make_census_geoid(df, geotype)
        return df.withColumns(
            {"geotype": F.lit(geotype), "pff_variable": F.lit(v.pff_variable)}
        )



class ColumnDeltaWideSource(ParquetWideSource):
    """A wide source with an in-flight raw-column update applied on
    read — the stand-in for "a corrected vintage partition landed":
    the named raw measure columns are shifted by their delta BEFORE
    the scrub/melt, exactly as if the upstream table had been
    republished.  Drives the incremental-maintenance proof (q367):
    ``incremental_catalog_update`` over this source must equal a full
    ``calculate_batch_catalog`` over it."""

    def __init__(
        self,
        spark: SparkSession,
        root: str | Path,
        column_deltas: dict[str, float],
    ):
        super().__init__(spark, root)
        self.column_deltas = dict(column_deltas)

    def _read(self, geotype: str) -> DataFrame:
        df = super()._read(geotype)
        updates = {
            c: F.col(c) + F.lit(float(d))
            for c, d in self.column_deltas.items()
            if c in df.columns
        }
        return df.withColumns(updates) if updates else df

class FactFinderEngine:
    """``engine(pff_variable, geotype) -> DataFrame`` (lazy)."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        geography: AggregatedGeography2020 | AggregatedGeography2010,
        source: ParquetWideSource,
        cache: CheckpointCache | None = None,
        persist_bases: bool = False,
    ):
        self.spark = spark
        self.catalog = catalog
        self.geo = geography
        self.source = source
        self.cache = cache or CheckpointCache(spark, None)
        self.persist_bases = persist_bases
        self._memo: dict[tuple[str, str], DataFrame] = {}

    # ---- core e/m pipeline (calculate.py:45-90) ---------------------
    def calculate_e_m(self, pff_variable: str, geotype: str) -> DataFrame:
        key = (pff_variable, geotype)
        if key in self._memo:
            return self._memo[key]

        def build() -> DataFrame:
            v = self.catalog.create_variable(pff_variable)
            aggregated = self.geo.aggregated_geography
            if geotype not in aggregated:
                from_geotype = geotype
                vertical = None
            else:
                options = self.geo.options(self.catalog.source)
                from_geotype = next(
                    (k for k, targets in options.items() if geotype in targets),
                    None,
                )
                if from_geotype is None:
                    # e.g. decennial on the 2010_to_2020 geography: the
                    # reference registers NO decennial rollups there
                    # (2010_to_2020.py:200-219 has only an "acs" key),
                    # so an aggregated geotype is unreachable
                    raise ValueError(
                        f"geotype {geotype!r} is not reachable for "
                        f"source={self.catalog.source!r} with the "
                        f"{self.geo.name} geography (no registered rollup)"
                    )
                vertical = options[from_geotype][geotype]
            df = self.source.load_e_m(from_geotype, v)
            df = aggregate_horizontal(df, v, self.catalog.source)
            if vertical is not None:
                df = vertical(df, pff_variable)
            return df

        df = self.cache.get_or_compute(
            "calculate",
            self.catalog.year,
            self.geo.name,
            geotype,
            pff_variable,
            build,
        )
        if self.persist_bases and pff_variable in self.catalog.base_variables:
            df = df.persist()
        self._memo[key] = df
        return df

    def calculate_e_m_multi(self, variables: list[str], geotype: str) -> DataFrame:
        """Union of per-variable plans (calculate.py:30-43) — one lazy
        plan; Spark parallelizes the branches."""
        dfs = [
            self.calculate_e_m_special(v, geotype)
            if v in self.catalog.special_variables
            else self.calculate_e_m(v, geotype)
            for v in variables
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # ---- median (calculate.py:131-169) ------------------------------
    def calculate_e_m_median(self, pff_variable: str, geotype: str) -> DataFrame:
        spec = self.catalog.median_spec(pff_variable)
        long_df = self.calculate_e_m_multi(spec.input_variables, geotype)
        pivoted = pivot_e(long_df, spec.input_variables)
        return calculate_median(pivoted, spec, geotype)

    # ---- special (calculate.py:184-196) -----------------------------
    def calculate_e_m_special(self, pff_variable: str, geotype: str) -> DataFrame:
        spec = self.catalog.special_spec(pff_variable)
        long_df = self.calculate_e_m_multi(spec.base_variables, geotype)
        pivoted = pivot_e_m(long_df, spec.base_variables)
        out = SPECIAL_FUNCTIONS[pff_variable](pivoted)
        return out.select(
            "census_geoid",
            F.lit(pff_variable).alias("pff_variable"),
            F.lit(geotype).alias("geotype"),
            "e",
            "m",
        )

    # ---- profile-only e/m/p/z (calculate.py:109-129) ----------------
    def calculate_e_m_p_z(self, pff_variable: str, geotype: str) -> DataFrame:
        v = self.catalog.create_variable(pff_variable)
        cv = v.census_variable[0]
        df = self.source.load_e_m_p_z(geotype, v)
        return df.select(
            "census_geoid",
            "pff_variable",
            "geotype",
            F.col(f"{cv}E").alias("e"),
            F.col(f"{cv}M").alias("m"),
            F.col(f"{cv}PE").alias("p"),
            F.col(f"{cv}PM").alias("z"),
        )

    # ---- poverty p/z twin join (calculate.py:171-182) ---------------
    def calculate_poverty_p_z(self, pff_variable: str, geotype: str) -> DataFrame:
        pct = self.calculate_e_m(f"{pff_variable}_pct", geotype)
        return pct.select(
            "census_geoid",
            "geotype",
            F.col("e").alias("p"),
            F.col("m").alias("z"),
        )

    # ---- full statistic assembly (calculate.py:198-291) -------------
    def calculate_c_e_m_p_z(self, pff_variable: str, geotype: str) -> DataFrame:
        v = self.catalog.create_variable(pff_variable)
        cat = self.catalog
        aggregated = self.geo.aggregated_geography

        if (
            pff_variable in cat.profile_only_variables
            and geotype not in aggregated
        ):
            df = self.calculate_e_m_p_z(pff_variable, geotype)

        elif pff_variable in cat.median_variables:
            df = (
                self.calculate_e_m_median(pff_variable, geotype)
                if geotype in aggregated
                else self.calculate_e_m(pff_variable, geotype)
            )
            p = F.lit(100.0) if geotype in ("city", "borough") else F.lit(None)
            df = df.withColumns(
                {"p": p.cast("double"), "z": F.lit(None).cast("double")}
            )
        else:
            use_special = (
                pff_variable in cat.special_variables and geotype in aggregated
            ) or pff_variable == "wrkrnothm"
            df = (
                self.calculate_e_m_special(pff_variable, geotype)
                if use_special
                else self.calculate_e_m(pff_variable, geotype)
            )
            if pff_variable not in cat.base_variables:
                if (
                    pff_variable in POVERTY_VARIABLES
                    and geotype not in aggregated
                    and cat.year != 2010
                ):
                    pz = self.calculate_poverty_p_z(pff_variable, geotype)
                    df = df.join(pz, ["census_geoid", "geotype"], "inner")
                elif v.base_variable != "nan":
                    # Reference quirk (calculate.py:248-259): the
                    # special-base branch is unconditionally overwritten
                    # by the plain calculate_e_m base unless the base is
                    # a median variable at an aggregated geotype —
                    # effective behavior replicated, wasted branch not.
                    if (
                        v.base_variable in cat.median_variables
                        and geotype in aggregated
                    ):
                        base = self.calculate_e_m_median(v.base_variable, geotype)
                    else:
                        base = self.calculate_e_m(v.base_variable, geotype)
                    base = base.select(
                        "census_geoid",
                        F.col("e").alias("agg_e"),
                        F.col("m").alias("agg_m"),
                    )
                    df = df.join(F.broadcast(base), "census_geoid", "left")
                    df = df.withColumn("p", get_p("e", "agg_e"))
                    df = df.withColumn(
                        "z", get_z("e", "m", "p", "agg_e", "agg_m")
                    ).drop("agg_e", "agg_m")
                else:
                    df = df.withColumns(
                        {
                            "p": F.lit(None).cast("double"),
                            "z": F.lit(None).cast("double"),
                        }
                    )
            else:
                df = df.withColumns(
                    {"p": F.lit(100.0), "z": F.lit(None).cast("double")}
                )

        df = df.withColumn("c", get_c("e", "m"))
        return df.select(*FACT_COLUMNS)

    # ---- output formatting (calculate.py:354-374) -------------------
    def labs_geoid(self, df: DataFrame) -> DataFrame:
        # formatters are vintage-specific: the geography registry
        # (2010 or 2010_to_2020) carries its own pair
        return df.select(
            "census_geoid",
            self.geo.format_geoid("census_geoid").alias("labs_geoid"),
            "geotype",
            self.geo.format_geotype("geotype").alias("labs_geotype"),
            "pff_variable",
            "c",
            "e",
            "m",
            "p",
            "z",
        )

    # ---- the query API (calculate.py:376-388) -----------------------
    def __call__(self, pff_variable: str, geotype: str) -> DataFrame:
        v = self.catalog.create_variable(pff_variable)
        df = self.calculate_c_e_m_p_z(pff_variable, geotype)
        df = df.withColumns(round_cempz(v.rounding))
        df = cleaning(
            df,
            self.catalog.base_variables,
            self.catalog.median_variables,
            self.catalog.special_variables,
            self.catalog.median_inputs,
        )
        return self.labs_geoid(df)

    # ---- batch driver (pipelines/acs.py:36-63) ----------------------
    def calculate_batch(
        self,
        tasks: list[tuple[str, str]],
        tag_domain: bool = True,
        retry_tries: int = 3,
        retry_delay: float = 5.0,
    ) -> DataFrame:
        """One unioned lazy plan over the (variable × geotype) grid —
        the Spark replacement for the reference's 10-process pool.
        Per-task failures are isolated like pipelines/acs.py:14-21,
        after ``retry_tries`` attempts each (reference calculate.py:376
        wraps every query in ``@retry(tries=3, delay=5)`` — here the
        retryable part is checkpoint-cache materialization I/O)."""
        from db_factfinder_spark.retry import with_retry

        plans: list[DataFrame] = []
        errors: list[tuple[str, str, str]] = []
        for var, geotype in tasks:
            try:
                df = with_retry(
                    lambda v=var, g=geotype: self(v, g),
                    tries=retry_tries,
                    delay=retry_delay,
                )
                if tag_domain:
                    domain = self.catalog.create_variable(var).domain
                    df = df.withColumn("domain", F.lit(domain))
                plans.append(df)
            except Exception as exc:  # noqa: BLE001
                errors.append((var, geotype, str(exc)))
        if errors:
            import logging

            for var, geotype, msg in errors:
                logging.warning("task failed: %s/%s: %s", var, geotype, msg)
        if not plans:
            raise RuntimeError(
                "calculate_batch: no task produced a plan"
                + (f"; all {len(errors)} failed, first: "
                   f"{errors[0][0]}/{errors[0][1]}: {errors[0][2]}"
                   if errors else " (empty task list)")
            )
        out = plans[0]
        for p in plans[1:]:
            out = out.unionByName(p)
        return out

    # ---- grid-scale batch (the whole catalog at once) ---------------
    def calculate_batch_catalog(
        self,
        geotypes: list[str],
        variables: list[str] | None = None,
        tag_domain: bool = True,
        checkpoint_mode: str = "local",
    ) -> DataFrame:
        """Set-based batch over (catalog × geotypes) — native AND
        every registered aggregated/zone rollup of both geography
        vintages: one source scan per download grain instead of one
        per (variable, geotype).  Result-identical to looping
        ``self(var, geotype)`` — see plans/batch.py for the
        row-locality argument and tests/test_catalog_batch.py for the
        pinned equivalence."""
        from db_factfinder_spark.plans.batch import calculate_batch_catalog

        return calculate_batch_catalog(
            self, geotypes, variables=variables, tag_domain=tag_domain,
            checkpoint_mode=checkpoint_mode,
        )
