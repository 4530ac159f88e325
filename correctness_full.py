"""Full-surface correctness artifact: run EVERY ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB at the driver's gate scale
(sf0.01) and write ``CORRECTNESS_full_r{N}.json`` — one row per query
with rows/schema/values booleans.

The driver's own per-round record windows the first 50 queries; this
artifact gives the remaining ones a signed audit trail in-repo, rerun
each round (VERDICT r4 ask #4).

Usage: ``python correctness_full.py <round>`` (e.g. ``5``).
Env: ``FULL_SF_DIR`` overrides the scale dir.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from db_factfinder_spark.session import get_spark

SF_DIR = os.environ.get("FULL_SF_DIR", "/root/testdata/sf0.01")
# FULL_STRICT=1: floats must match at repr level (catches signed-zero
# -0.0 vs 0.0 asymmetries that == hides); the artifact is written with
# a "strict" marker so the two modes aren't conflated.
STRICT = os.environ.get("FULL_STRICT", "") == "1"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype("float64")
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("float64")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if STRICT:
            # repr-level equality: distinguishes -0.0 from 0.0 (a
            # value-hash over rendered values would too)
            return repr(a) == repr(b)
        return a == b
    return a == b


def main() -> None:
    rnd = int(sys.argv[1])
    spark = get_spark(app_name="correctness_full")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    out: dict[str, dict] = {}
    for name in sorted(queries):
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            rec["spark_rows"] = len(sdf)
            if name not in oracles:
                rec["err"] = "rows-only (no SQL oracle)"
                rec["rows_match"] = len(sdf) >= 0 and len(sdf.columns) > 0
            else:
                odf = _duck(oracles[name])
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                if rec["rows_match"] and rec["schema_match"]:
                    s, o = _normalize(sdf), _normalize(odf)
                    rec["hash_match"] = all(
                        _values_equal(a, b)
                        for col in s.columns
                        for a, b in zip(s[col].tolist(), o[col].tolist())
                    )
        except Exception as e:  # noqa: BLE001 — per-query isolation
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        out[name] = rec
        status = "PASS" if (
            rec["hash_match"] or (rec["err"] or "").startswith("rows-only")
        ) else "FAIL"
        print(f"{name}: {status}", flush=True)
    path = (
        f"CORRECTNESS_full_strict_r{rnd:02d}.json"
        if STRICT
        else f"CORRECTNESS_full_r{rnd:02d}.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    n_pass = sum(
        1 for r in out.values()
        if r["hash_match"] or (r["err"] or "").startswith("rows-only")
    )
    print(f"wrote {path}: {n_pass}/{len(out)} pass")


if __name__ == "__main__":
    main()
