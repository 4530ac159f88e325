"""Self-check of the driver contract: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB over the same parquet tables,
and compare row counts, column names, and values (order-insensitive) —
a faithful local mirror of the driver's t2 correctness gate.

Set ``PARITY_SF_DIR`` to switch scale (default sf0.001 for speed; the
driver gate runs sf0.01)."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype("float64")
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("float64")  # int64 vs uint/int32 parity
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, name):
    if name not in ORACLES:
        # non-SQL-expressible op (e.g. mapInPandas): the driver records
        # a rows-only check — mirror that here
        sdf = QUERIES[name](spark, SF_DIR)
        assert sdf.count() >= 0 and len(sdf.columns) > 0
        return
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = _duck(ORACLES[name])

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"

    s = _normalize(sdf)
    o = _normalize(odf)
    mismatches = []
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _values_equal(a, b):
                mismatches.append((col, i, a, b))
                if len(mismatches) > 5:
                    break
        if len(mismatches) > 5:
            break
    assert not mismatches, f"{name}: value mismatches {mismatches[:6]}"
