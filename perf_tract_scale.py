"""Out-of-band scale probe for the catalog batches (r8 VERDICT ask 6).

The bench fixtures pin N_TRACTS=200 (NYC-ish), so sf only grows the
fixture *generation* input — the engine's wide table stays 200 rows and
the sf ladder cannot show the exec-side growth exponent.  This probe
scales the REAL data axis for this workload (geographic units): it
builds perf-only wide fixtures at 200 / 2,000 / 20,000 tracts (20k ≈ a
quarter of the national tract count) over the same customer table and
times the q331-shape (native grid) and q337-shape (aggregated grid)
batches, split into driver plan-build vs executor time.

Claim under test (plans/batch.py): driver cost is FLAT in data size
(constant catalog fan-out), exec is ~linear in unit count.

Usage: python perf_tract_scale.py [customer_sf_dir]   (default sf0.1)
       python perf_tract_scale.py [customer_sf_dir] --sink
       python perf_tract_scale.py [customer_sf_dir] --geo2010
Prints one JSON line; results recorded in PERF_NOTES "Round 9" (grids)
and "Round 10" (--sink: the q365 production run with the CSV sink at
the same unit ladder, split build / exec / write — r9 VERDICT ask 3;
--geo2010: the q384 shape).

Heap note: the 20k-unit aggregated rung shuffles ~21M-row folds in ONE
long-lived local JVM that has already run the native rungs — at the
default 8g driver heap that can OOM executor threads mid-shuffle
(observed r10).  Run the full ladder with SPARK_DRIVER_MEMORY=24g, or
one rung per process.  (This is measurement-harness capacity, not an
engine limit — a fresh JVM runs the same rung at 8g.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import synth_catalog


def _engine(spark, root, year=2019):
    from pyspark.sql import functions as F

    from db_factfinder_spark.catalog import Catalog
    from db_factfinder_spark.operators.vertical import (
        AggregatedGeography2020,
        prepare_lookup_geo,
        prepare_ratio,
    )
    from db_factfinder_spark.plans.planner import (
        FactFinderEngine,
        ParquetWideSource,
    )

    cat = Catalog.from_registry("acs", year)
    n = synth_catalog.N_TRACTS
    gids = spark.range(n).select(F.col("id").alias("gid"))
    code = F.concat(F.lit("47"), F.lpad(F.col("gid").cast("string"), 6, "0"))
    ratio_raw = gids.select(
        code.alias("boroct2010"),
        code.alias("boroct2020"),
        F.lit("1.000000000000000000").alias("ratio"),
    )
    lookup_raw = gids.select(
        F.concat(
            F.lit("36047"),
            F.lpad(F.col("gid").cast("string"), 6, "0"),
            F.lit("1000"),
        ).alias("geoid"),
        F.concat(
            F.lit("BX"), F.lpad((F.col("gid") % 100).cast("string"), 3, "0")
        ).alias("nta2020"),
        F.lit("nta name").alias("ntaname"),
        F.concat(
            F.lit("BK"), F.lpad((F.col("gid") % 40).cast("string"), 2, "0")
        ).alias("cdta2020"),
        F.lit("cdta name").alias("cdtaname"),
        F.lit("2").alias("borocode"),
        F.lit("Bronx").alias("boroname"),
        F.lit("0").alias("fp_100"),
        F.lit("0").alias("fp_500"),
        F.lit("0").alias("park_access"),
    )
    geo = AggregatedGeography2020(
        prepare_lookup_geo(lookup_raw).localCheckpoint(),
        prepare_ratio(ratio_raw).localCheckpoint(),
    )
    return FactFinderEngine(spark, cat, geo, ParquetWideSource(spark, root))


def _free(spark, eng) -> None:
    """Unpersist this measurement's frames before the next one — at
    n=20k accumulated melt caches put the JVM under GC pressure and
    inflated the NEXT measurement's plan-build 4x (measured)."""
    import gc

    for cached in getattr(eng, "_batch_caches", []):
        cached.unpersist()
    eng._batch_caches = []
    spark.catalog.clearCache()
    gc.collect()


def _ensure_scaled_fixture(sf_dir: str, n_tracts: int, year: int = 2019) -> str:
    """Perf-only wide fixture at ``n_tracts`` units.

    Coverage fix (r11): the fixture derives tract units from DISTINCT
    ``c_custkey % n_tracts`` values, so a rung larger than the customer
    row count silently caps at ~rows·(1−e^(−rows/n)) units — the r9/r10
    "20,000" rung over sf0.1's ~15k customers was really ~10.8k units,
    and a "200,000" rung would be ~14.4k (measured: near-flat exec,
    which first exposed this).  ``--fullcover`` replicates the customer
    arrays with shifted keys until expected coverage ≥95% of
    ``n_tracts``, so the rung label is honest; fixture roots are
    suffixed with the replication factor to avoid mixing with capped
    fixtures."""
    import math

    import numpy as np

    synth_catalog.N_TRACTS = n_tracts
    rep = 1
    if "--fullcover" in sys.argv:
        ck0, _ = synth_catalog._customer_arrays(sf_dir)
        rows = len(ck0)
        rep = max(1, math.ceil(3.0 * n_tracts / rows))
    suffix = "" if year == 2019 else f"_{year}"
    if rep > 1:
        suffix += f"_rep{rep}"
    root = os.path.join("/tmp", f"spark_graft_scale_{n_tracts}{suffix}")
    if not os.path.exists(os.path.join(root, "_DONE")):
        t0 = time.perf_counter()
        # bypass the shared cache dir: perf fixtures are keyed by
        # tract count, not by the value-spec version
        orig = synth_catalog.fixture_root
        orig_ca = synth_catalog._customer_arrays
        synth_catalog.fixture_root = lambda *a: root
        if rep > 1:
            def _replicated(sf, _orig=orig_ca, _rep=rep):
                ck, bal = _orig(sf)
                ck = np.concatenate(
                    [ck + i * 1_000_003 for i in range(_rep)]
                )
                bal = np.tile(bal, _rep)
                return ck, bal

            synth_catalog._customer_arrays = _replicated
        try:
            synth_catalog.ensure_fixture(sf_dir, "acs", year)
        finally:
            synth_catalog.fixture_root = orig
            synth_catalog._customer_arrays = orig_ca
        print(
            f"fixture n={n_tracts} y={year} rep={rep}: "
            f"{time.perf_counter()-t0:.1f}s",
            file=sys.stderr,
        )
    return root


def _ladder_ns(default=(200, 2_000, 20_000)) -> tuple[int, ...]:
    """--n 200,2000,200000 overrides the rung list (r10 VERDICT ask 4:
    the 200k rung is the literal 10x-data proof over the prior top)."""
    for i, a in enumerate(sys.argv):
        if a == "--n" and i + 1 < len(sys.argv):
            return tuple(int(x) for x in sys.argv[i + 1].split(","))
        if a.startswith("--n="):
            return tuple(int(x) for x in a[4:].split(","))
    return default


def main_change(sf_dir: str) -> None:
    """The q383 shape at the unit ladder: TWO full-catalog vintage
    batches (2019 + 2018) inner-joined on the published grain in ONE
    lazy plan (pipelines.vintage_change_table) — the claim under test
    is that the delta join's input stays output-sized, so the shape
    scales exactly like one batch, not two plus a data-sized join."""
    from db_factfinder_spark.pipelines import vintage_change_table
    from db_factfinder_spark.session import get_spark

    spark = get_spark(app_name="perf_change_scale")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for n_tracts in _ladder_ns():
        root_new = _ensure_scaled_fixture(sf_dir, n_tracts, 2019)
        root_old = _ensure_scaled_fixture(sf_dir, n_tracts, 2018)
        eng_new = _engine(spark, root_new, 2019)
        eng_old = _engine(spark, root_old, 2018)
        best_plan = best_exec = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = vintage_change_table(
                eng_new, eng_old, ["tract", "borough", "city"]
            )
            t1 = time.perf_counter()
            force(df)
            t2 = time.perf_counter()
            p, e = t1 - t0, t2 - t1
            best_plan = p if best_plan is None else min(best_plan, p)
            best_exec = e if best_exec is None else min(best_exec, e)
        out[str(n_tracts)] = {
            "plan_s": round(best_plan, 2), "exec_s": round(best_exec, 2)
        }
        print(f"n={n_tracts}: plan {best_plan:.1f}s exec {best_exec:.1f}s",
              file=sys.stderr, flush=True)
        _free(spark, eng_new)
        _free(spark, eng_old)
    print(json.dumps({"metric": "change_scale_ladder", "by_n_tracts": out}))


def main_sink(sf_dir: str) -> None:
    """The q365 shape at the unit ladder: the FULL production grid
    (native tract/borough/city + CT20/NTA/CDTA) through
    ``production_acs_run``, with the CSV sink timed as its own phase —
    the r9 ladder proved flat driver assembly for the grid; this one
    shows the sink scales with DATA, not with the catalog."""
    import shutil

    from db_factfinder_spark.pipelines import production_acs_run
    from db_factfinder_spark.session import get_spark
    from db_factfinder_spark.sources.readers import write_csv

    spark = get_spark(app_name="perf_sink_scale")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for n_tracts in _ladder_ns():
        root = _ensure_scaled_fixture(sf_dir, n_tracts)
        eng = _engine(spark, root)
        t0 = time.perf_counter()
        df = production_acs_run(
            eng, ["tract", "borough", "city", "CT20", "NTA", "CDTA"]
        )
        t1 = time.perf_counter()
        force(df)
        t2 = time.perf_counter()
        sink = os.path.join("/tmp", f"spark_graft_sinkscale_{n_tracts}")
        write_csv(df, sink)
        t3 = time.perf_counter()
        rows = df.count()
        out[str(n_tracts)] = {
            "build_s": round(t1 - t0, 2),
            "exec_s": round(t2 - t1, 2),
            "write_s": round(t3 - t2, 2),
            "rows": rows,
        }
        print(f"n={n_tracts}: build {t1-t0:.1f}s exec {t2-t1:.1f}s "
              f"write {t3-t2:.1f}s rows {rows}", file=sys.stderr, flush=True)
        shutil.rmtree(sink, ignore_errors=True)
        _free(spark, eng)
    print(json.dumps({"metric": "sink_scale_ladder", "by_n_tracts": out}))


def _engine_2010(spark, root, n_tracts):
    """ACS engine over the 2010 geography at a scaled tract count —
    the r10 chain's ladder fixture (tract-grain lookup: NTA gid%100,
    cd '79'+(gid%40); no zone geotypes, so no block grain needed)."""
    from pyspark.sql import functions as F

    from db_factfinder_spark.catalog import Catalog
    from db_factfinder_spark.operators.vertical import (
        AggregatedGeography2010,
        prepare_lookup_geo_2010,
    )
    from db_factfinder_spark.plans.planner import (
        FactFinderEngine,
        ParquetWideSource,
    )

    cat = Catalog.from_registry("acs", 2019)
    gids = spark.range(n_tracts).select(F.col("id").alias("gid"))
    tract6 = F.lpad(F.col("gid").cast("string"), 6, "0")
    lookup_raw = gids.select(
        F.lit("36047").alias("county_fips"),
        F.concat(tract6, F.lit("1001")).alias("ctcb2010"),
        tract6.alias("ct2010"),
        F.concat(
            F.lit("BX"), F.lpad((F.col("gid") % 100).cast("string"), 3, "0")
        ).alias("nta"),
        F.concat(
            F.lit("79"), F.lpad((F.col("gid") % 40).cast("string"), 4, "0")
        ).alias("cd"),
        F.lit("0").alias("fp_100"),
        F.lit("0").alias("fp_500"),
        F.lit("0").alias("park_access"),
    )
    geo = AggregatedGeography2010(
        prepare_lookup_geo_2010(lookup_raw).localCheckpoint()
    )
    return FactFinderEngine(spark, cat, geo, ParquetWideSource(spark, root))


def main_geo2010(sf_dir: str) -> None:
    """The r10 chain at the unit ladder: the full ACS catalog through
    ``_aggregated_2010_frames``' direct tract→NTA/cd rollup (the q384
    shape) at 200 / 2,000 / 20,000 tracts — same flat-driver /
    sublinear-exec claim as the 2020-chain ladder, now for the chain
    with no crosswalk hop."""
    from db_factfinder_spark.session import get_spark

    spark = get_spark(app_name="perf_geo2010_scale")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for n_tracts in _ladder_ns():
        root = _ensure_scaled_fixture(sf_dir, n_tracts)
        eng = _engine_2010(spark, root, n_tracts)
        best_plan = best_exec = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = eng.calculate_batch_catalog(["NTA", "cd"])
            t1 = time.perf_counter()
            force(df)
            t2 = time.perf_counter()
            p, e = t1 - t0, t2 - t1
            best_plan = p if best_plan is None else min(best_plan, p)
            best_exec = e if best_exec is None else min(best_exec, e)
        out[str(n_tracts)] = {
            "plan_s": round(best_plan, 2), "exec_s": round(best_exec, 2)
        }
        print(f"n={n_tracts}: plan {best_plan:.1f}s exec {best_exec:.1f}s",
              file=sys.stderr, flush=True)
        _free(spark, eng)
    print(json.dumps({"metric": "geo2010_scale_ladder", "by_n_tracts": out}))


def main() -> None:
    from db_factfinder_spark.session import get_spark

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/root/testdata/sf0.1"
    if "--sink" in sys.argv:
        main_sink(sf_dir)
        return
    if "--geo2010" in sys.argv:
        main_geo2010(sf_dir)
        return
    if "--change" in sys.argv:
        main_change(sf_dir)
        return
    spark = get_spark(app_name="perf_tract_scale")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for n_tracts in _ladder_ns():
        root = _ensure_scaled_fixture(sf_dir, n_tracts)
        eng = _engine(spark, root)
        rec: dict[str, float] = {}
        for shape, geos in (
            ("native", ["tract", "borough", "city"]),
            ("aggregated", ["CT20", "NTA"]),
        ):
            best_plan = best_exec = None
            for _ in range(2):
                t0 = time.perf_counter()
                df = eng.calculate_batch_catalog(geos)
                t1 = time.perf_counter()
                force(df)
                t2 = time.perf_counter()
                p, e = t1 - t0, t2 - t1
                best_plan = p if best_plan is None else min(best_plan, p)
                best_exec = e if best_exec is None else min(best_exec, e)
            rec[f"{shape}_plan_s"] = round(best_plan, 2)
            rec[f"{shape}_exec_s"] = round(best_exec, 2)
            # free this shape's persisted frames before the next
            # measurement: at n=20k the accumulated melt caches (~2 GB
            # over 2 passes x 2 shapes) put the JVM under GC pressure
            # and inflated the NEXT shape's plan-build 4x (measured:
            # aggregated plan 17->78 s before this isolation)
            for cached in getattr(eng, "_batch_caches", []):
                cached.unpersist()
            eng._batch_caches = []
            spark.catalog.clearCache()
            # localCheckpoint RDD blocks free via ContextCleaner when
            # the DataFrames are GC'd — make that prompt
            import gc

            gc.collect()
            print(f"n={n_tracts} {shape}: plan {best_plan:.1f}s "
                  f"exec {best_exec:.1f}s", file=sys.stderr, flush=True)
        out[str(n_tracts)] = rec
    print(json.dumps({"metric": "tract_scale_ladder", "by_n_tracts": out}))


if __name__ == "__main__":
    main()
