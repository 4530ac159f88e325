"""Same-session A/B: r11 (HEAD^-era) _aggregated_assembly vs r12
restructure, both module versions loaded in ONE JVM, interleaved reps.

Usage: python ab_r12_assembly.py <old_batch.py path> [reps]
Times q337's shape (CT20+NTA over the 2020 crosswalk engine) and
q366's (three zones): build (plan assembly incl. in-build checkpoint
jobs) and exec (noop sink) per rep, alternating NEW/OLD.
"""

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from db_factfinder_spark.plans import batch as batch_new
from db_factfinder_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_old(path):
    spec = importlib.util.spec_from_file_location("batch_old_r11", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def force(df):
    df.write.format("noop").mode("overwrite").save()


def run(mod, eng, geos, label, spark):
    spark.sparkContext.setJobDescription(f"ab_r12 {label}")
    t0 = time.perf_counter()
    df = mod.calculate_batch_catalog(eng, geos)
    t1 = time.perf_counter()
    force(df)
    t2 = time.perf_counter()
    # free the batch caches so reps don't accumulate executor blocks
    for cached in getattr(eng, "_batch_caches", []):
        cached.unpersist()
    eng._batch_caches = []
    return t1 - t0, t2 - t1


def main():
    old_path = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    shape = sys.argv[3] if len(sys.argv) > 3 else "q337"
    spark = get_spark(app_name="ab_r12_assembly")
    old = load_old(old_path)
    if shape == "q337":
        eng = entry._crosswalk_2020_engine(spark, SF_DIR)
        geos = ["CT20", "NTA"]
    else:
        eng = entry._zone_2020_engine(spark, SF_DIR)
        geos = ["cdta_fp_100", "cdta_fp_500", "cdta_park_access"]
    # JIT warmup rep each, not recorded
    run(batch_new, eng, geos, "warm new", spark)
    run(old, eng, geos, "warm old", spark)
    for r in range(reps):
        bn, en = run(batch_new, eng, geos, f"NEW rep{r}", spark)
        bo, eo = run(old, eng, geos, f"OLD rep{r}", spark)
        print(
            f"rep{r}: NEW build {bn:.2f} exec {en:.2f} | "
            f"OLD build {bo:.2f} exec {eo:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
