"""Shared synthetic wide-table spec for the full-catalog batch queries
(q331 ACS-2019 native grid, q332 decennial-2020, q336 NTA rollup).

One deterministic value formula per census column index, rendered twice
from the same integer constants:

* as numpy (``ensure_fixture`` writes the wide parquet the engine's
  ``ParquetWideSource`` reads), and
* as DuckDB SQL (``full_catalog_oracle_sql`` regenerates the same
  values straight from the ``customer`` table, so the oracle never
  touches the parquet fixture).

Every surviving value is an integer-valued double (sentinels are
scrubbed to NULL/0 by the engine), so sums are order-exact and the
Spark-vs-DuckDB comparison is bit-exact without any portable-math
shims.  Modulo is trunc-mod everywhere (DuckDB ``%``, Spark ``%``,
and the numpy ``_tmod`` below all take the dividend's sign).

Reference parity notes: the wide layout mirrors the Census API
download frame (reference download.py:51-141 — E/M per ACS variable,
PE/PM for data-profile variables, raw names for decennial P-vars); the
geo-part columns feed ``make_census_geoid`` (download.py:143-156).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Census sentinel codes (reference utils.py:8-21); keep in sync with
# db_factfinder_spark.functions.stats.OUTLIER_SENTINELS.
SENTINELS = [
    999999999.0, 333333333.0, 222222222.0, 666666666.0, 888888888.0,
    555555555.0, -999999999.0, -333333333.0, -222222222.0,
    -666666666.0, -888888888.0, -555555555.0,
]
CONTROLLED = [-555555555.0, 555555555.0]

# (county fips, boro digit) — geography/2010_to_2020.py:233
BOROS = [("005", "2"), ("047", "3"), ("061", "1"), ("081", "4"), ("085", "5")]

N_TRACTS = 200  # tract gid = c_custkey % N_TRACTS, county 047
# block-group bgid = c_custkey % N_BLOCK_GROUPS; tract = bgid % N_TRACTS,
# block-group digit = bgid // N_TRACTS + 1 (two block groups per tract)
N_BLOCK_GROUPS = 400
# block bid = c_custkey % N_BLOCKS; tract = bid % N_TRACTS, block code =
# '100' || (bid // N_TRACTS + 1) (three blocks per tract) — the decennial
# zone-rollup download grain (reference geography/2010.py:67-169)
N_BLOCKS = 600

SPEC_VERSION = 6  # bump to invalidate cached fixtures


# ---------------------------------------------------------------------------
# catalog introspection (raw JSON — deliberately independent of
# db_factfinder_spark.catalog so the oracle side shares no engine code)
# ---------------------------------------------------------------------------

_DATA = Path(__file__).parent / "db_factfinder_spark" / "data"

PROFILE_ONLY_EXCEPTIONS = [
    "abroad", "cvlfuem2", "dfhsdfcnt", "dfhssmcnt", "dfhsus", "hh5",
    "oochu4", "p65plbwpv", "pbwpv", "pu18bwpv",
]

POVERTY_VARIABLES = ["pbwpv", "pu18bwpv", "p65plbwpv"]


def load_meta(source: str, year: int) -> list[dict]:
    with open(_DATA / source / str(year) / "metadata.json") as f:
        return json.load(f)


def load_side(source: str, year: int, name: str):
    p = _DATA / source / str(year) / f"{name}.json"
    if not p.exists():
        return {} if name == "median" else []
    with open(p) as f:
        return json.load(f)


def profile_only(meta: list[dict], source: str) -> set[str]:
    """Reference metadata.py:84-101 semantics (decennial: none)."""
    if source == "decennial":
        return set()
    return {
        m["pff_variable"]
        for m in meta
        if m["census_variable"]
        and m["census_variable"][0][:2] == "DP"
        and len(m["census_variable"]) == 1
        and m["pff_variable"] not in PROFILE_ONLY_EXCEPTIONS
    }


def census_cols(meta: list[dict]) -> list[str]:
    """Distinct census columns, sorted — the column index assignment."""
    return sorted({cv for m in meta for cv in m["census_variable"]})


def profile_cols(meta: list[dict], source: str) -> list[str]:
    po = profile_only(meta, source)
    d = {m["pff_variable"]: m for m in meta}
    return sorted({d[v]["census_variable"][0] for v in po})


# ---------------------------------------------------------------------------
# the value spec — numpy rendering
# ---------------------------------------------------------------------------

def _tmod(a, b: int):
    """Trunc-mod (sign of dividend) for int64 arrays — matches Spark's
    ``%`` and DuckDB's ``%``; numpy's native ``%`` is floor-mod."""
    a = np.asarray(a, dtype=np.int64)
    q = np.sign(a) * (np.abs(a) // b)
    return a - b * q


def raw_values_np(i: int, s1, s2, s3):
    """E/M/PE/PM raw (pre-scrub) values for column index ``i`` over geo
    rows with seeds s1/s2/s3 (int64 arrays).  Plants: E sentinel, E==0,
    negative-E sentinel; M controlled + negative; PE sentinel +
    negative + >100; PM controlled."""
    s1 = np.asarray(s1, np.int64); s2 = np.asarray(s2, np.int64)
    s3 = np.asarray(s3, np.int64)
    h = s2 + (i + 1) * 7919
    # the main E value is FLOOR-mod (always >= 0): census estimates are
    # never negative, and a negative grouped-median bin total would make
    # sqrt(se²) NaN on Spark but an error on DuckDB.  The e<0 cleaning
    # rule keeps coverage through the explicit rare -5 plant (h%23; at
    # most 2 of a median's 23-26 bins can hit it per row, so bin totals
    # stay provably positive).
    e = np.where(
        _tmod(h, 37) == 0, 999999999,
        np.where(
            _tmod(h, 31) == 0, 0,
            np.where(
                _tmod(h, 29) == 0, -666666666,
                np.where(_tmod(h, 23) == 0, -5,
                         np.mod(s1 + i * s3, 99991)),
            ),
        ),
    )
    m = np.where(
        _tmod(h + 11, 41) == 0, 555555555,
        np.where(_tmod(h + 3, 43) == 0, -7,
                 _tmod(s1 * 3 + i * 17 + s3, 9973)),
    )
    pe = np.where(
        _tmod(h + 13, 59) == 0, 999999999,
        np.where(_tmod(h + 5, 47) == 0, -12, _tmod(s1 + i * 13, 1009)),
    )
    pm = np.where(_tmod(h + 7, 53) == 0, 555555555,
                  _tmod(s2 + i * 19, 97))
    return (e.astype(np.float64), m.astype(np.float64),
            pe.astype(np.float64), pm.astype(np.float64))


# the same spec as SQL fragments; `h`, `s1`, `s2`, `s3`, `i` are columns
E_SQL = ("CAST(CASE WHEN h % 37 = 0 THEN 999999999 "
         "WHEN h % 31 = 0 THEN 0 "
         "WHEN h % 29 = 0 THEN -666666666 "
         "WHEN h % 23 = 0 THEN -5 "
         "ELSE ((s1 + i * s3) % 99991 + 99991) % 99991 END AS DOUBLE)")
M_SQL = ("CAST(CASE WHEN (h + 11) % 41 = 0 THEN 555555555 "
         "WHEN (h + 3) % 43 = 0 THEN -7 "
         "ELSE (s1 * 3 + i * 17 + s3) % 9973 END AS DOUBLE)")
PE_SQL = ("CAST(CASE WHEN (h + 13) % 59 = 0 THEN 999999999 "
          "WHEN (h + 5) % 47 = 0 THEN -12 "
          "ELSE (s1 + i * 13) % 1009 END AS DOUBLE)")
PM_SQL = ("CAST(CASE WHEN (h + 7) % 53 = 0 THEN 555555555 "
          "ELSE (s2 + i * 19) % 97 END AS DOUBLE)")


# ---------------------------------------------------------------------------
# geo seeds from the customer table
# ---------------------------------------------------------------------------

def _customer_arrays(sf_dir: str):
    t = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                      columns=["c_custkey", "c_acctbal"])
    ck = np.asarray(t["c_custkey"], dtype=np.int64)
    bal = np.floor(np.asarray(t["c_acctbal"], dtype=np.float64)).astype(np.int64)
    return ck, bal


def _seeds_by(ck, bal, gid):
    """Per-gid (s1=Σ floor(acctbal), s2=Σ custkey, s3=count), sorted by gid."""
    order = np.argsort(gid, kind="stable")
    gid, ck, bal = gid[order], ck[order], bal[order]
    uniq, idx = np.unique(gid, return_index=True)
    s1 = np.add.reduceat(bal, idx)
    s2 = np.add.reduceat(ck, idx)
    s3 = np.diff(np.append(idx, len(gid)))
    return uniq, s1.astype(np.int64), s2.astype(np.int64), s3.astype(np.int64)


def geo_tables(sf_dir: str):
    """{geotype: (geo_part_cols: dict[str, list[str]], s1, s2, s3)}."""
    ck, bal = _customer_arrays(sf_dir)
    out = {}
    gid, s1, s2, s3 = _seeds_by(ck, bal, ck % N_TRACTS)
    out["tract"] = (
        {
            "state": ["36"] * len(gid),
            "county": ["047"] * len(gid),
            "tract": [f"{g:06d}" for g in gid],
        },
        s1, s2, s3,
    )
    bgid, g1, g2, g3 = _seeds_by(ck, bal, ck % N_BLOCK_GROUPS)
    out["block group"] = (
        {
            "state": ["36"] * len(bgid),
            "county": ["047"] * len(bgid),
            "tract": [f"{int(b) % N_TRACTS:06d}" for b in bgid],
            "block_group": [str(int(b) // N_TRACTS + 1) for b in bgid],
        },
        g1, g2, g3,
    )
    blid, k1, k2, k3 = _seeds_by(ck, bal, ck % N_BLOCKS)
    out["block"] = (
        {
            "state": ["36"] * len(blid),
            "county": ["047"] * len(blid),
            "tract": [f"{int(b) % N_TRACTS:06d}" for b in blid],
            "block": [f"{1000 + int(b) // N_TRACTS + 1}" for b in blid],
        },
        k1, k2, k3,
    )
    bid, b1, b2, b3 = _seeds_by(ck, bal, ck % 5)
    out["borough"] = (
        {
            "state": ["36"] * len(bid),
            "county": [BOROS[int(b)][0] for b in bid],
        },
        b1, b2, b3,
    )
    out["city"] = (
        {"state": ["36"], "place": ["51000"]},
        np.array([bal.sum()], np.int64),
        np.array([ck.sum()], np.int64),
        np.array([len(ck)], np.int64),
    )
    return out


# ---------------------------------------------------------------------------
# fixture builder
# ---------------------------------------------------------------------------

def native_varattr(source: str, year: int) -> list[tuple]:
    """Per-variable native-geotype classification rows for the oracle:
    (pff, domain, rounding, cls, pz_mode, base, twin, profile_cv).
    Mirrors the branch order of reference calculate.py:198-291 at a
    non-aggregated geotype; variables whose base is not in the catalog
    ('rate') are dropped — the reference task raises and the pool
    isolates it (pipelines/acs.py:14-21)."""
    meta = load_meta(source, year)
    med = load_side(source, year, "median")
    spec = load_side(source, year, "special")
    po = profile_only(meta, source)
    medians = set(med.keys())
    bases = {str(m["base_variable"]) for m in meta}
    names = {m["pff_variable"] for m in meta}
    rows = []
    for m in meta:
        pff = m["pff_variable"]
        base = str(m.get("base_variable", "nan"))
        rnd = int(m.get("rounding", 0))
        dom = m.get("domain", "")
        cls, pz, b, twin, pcv = "plain", "none", None, None, None
        if pff in po:
            cls, pz, pcv = "prof", "prof", m["census_variable"][0]
        elif pff in medians:
            cls, pz = "med", "med"
        else:
            if pff == "wrkrnothm":
                cls = "wrk"
            if pff not in bases:
                if pff in POVERTY_VARIABLES and year != 2010:
                    if pff + "_pct" not in names:
                        continue
                    pz, twin = "pov", pff + "_pct"
                elif base != "nan":
                    if base not in names:
                        continue  # dropped task ('rate' base)
                    pz, b = "base", base
            else:
                pz = "p100"
        rows.append((pff, dom, rnd, cls, pz, b, twin, pcv))
    return rows


# ---------------------------------------------------------------------------
# DuckDB oracle generator
# ---------------------------------------------------------------------------

_S = ", ".join(str(int(s)) for s in SENTINELS)
_C = "-555555555, 555555555"


def _he(x: str, d: int) -> str:
    """Half-even rounding to ``d`` digits — the q37/q327 idiom: DuckDB
    round() is half-away-from-zero, so exact dyadic ties get an
    explicit even-selection branch (matches Spark bround)."""
    if d == 0:
        return (
            f"CASE WHEN ({x}) - floor({x}) = 0.5 THEN "
            f"(CASE WHEN CAST(floor({x}) AS BIGINT) % 2 = 0 "
            f"THEN floor({x}) ELSE floor({x}) + 1 END) "
            f"ELSE round(({x}), 0) END"
        )
    f = 10**d
    return (
        f"CASE WHEN ({x}) * {f} - floor(({x}) * {f}) = 0.5 THEN "
        f"(CASE WHEN CAST(floor(({x}) * {f}) AS BIGINT) % 2 = 0 "
        f"THEN floor(({x}) * {f}) ELSE floor(({x}) * {f}) + 1 END) / {f} "
        f"ELSE round(({x}), {d}) END"
    )


def _q(v) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + str(v).replace("'", "''") + "'"


def _inlist(names) -> str:
    return ", ".join(_q(n) for n in sorted(names))


def _geo_sql(geotypes: list[str]) -> str:
    branches = []
    if "tract" in geotypes:
        branches.append(f"""
  SELECT 'tract' AS geotype,
         '36047' || lpad(CAST(gid AS VARCHAR), 6, '0') AS census_geoid,
         '3' || lpad(CAST(gid AS VARCHAR), 6, '0') AS labs_geoid,
         s1, s2, s3
  FROM (SELECT CAST(c_custkey % {N_TRACTS} AS BIGINT) AS gid,
               CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(c_custkey) AS BIGINT) AS s2,
               CAST(count(*) AS BIGINT) AS s3
        FROM customer GROUP BY 1)""")
    if "borough" in geotypes:
        county = " ".join(
            f"WHEN {i} THEN '{fips}'" for i, (fips, _) in enumerate(BOROS)
        )
        digit = " ".join(
            f"WHEN {i} THEN '{d}'" for i, (_, d) in enumerate(BOROS)
        )
        branches.append(f"""
  SELECT 'borough' AS geotype, '36' || CASE gid {county} END
           AS census_geoid,
         CASE gid {digit} END AS labs_geoid, s1, s2, s3
  FROM (SELECT CAST(c_custkey % 5 AS BIGINT) AS gid,
               CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(c_custkey) AS BIGINT) AS s2,
               CAST(count(*) AS BIGINT) AS s3
        FROM customer GROUP BY 1)""")
    if "city" in geotypes:
        branches.append("""
  SELECT 'city' AS geotype, '3651000' AS census_geoid,
         '0' AS labs_geoid,
         CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(c_custkey) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS s3
  FROM customer""")
    return "\nUNION ALL".join(branches)


def incremental_mutation_cvs(source: str = "acs", year: int = 2019):
    """The q367 vintage mutation: one census column each from a BASE
    variable (children's p/z must move), the wrkrnothm input (its
    every-geotype special must move), and a poverty twin (the pov p/z
    join must move) — chosen so the dependency closure is exercised on
    every native-grain edge type."""
    meta_by = {m["pff_variable"]: m for m in load_meta(source, year)}
    return sorted({
        meta_by["pop5pl1"]["census_variable"][0],
        meta_by["wrkr16pl"]["census_variable"][0],
        meta_by["pbwpv_pct"]["census_variable"][0],
    })


def second_mutation_cvs(source: str = "acs", year: int = 2019):
    """The q385 SECOND-round vintage mutation (disjoint from
    ``incremental_mutation_cvs``): hh2's census column (a base AND a
    special member — children's p/z and the mnhhinc formula must move)
    and the first profile-only variable's DP column (the direct
    profile edge — e comes straight off the mutated column)."""
    meta = load_meta(source, year)
    meta_by = {m["pff_variable"]: m for m in meta}
    po = sorted(profile_only(meta, source))
    cvs = sorted(
        {
            meta_by["hh2"]["census_variable"][0],
            meta_by[po[0]]["census_variable"][0],
        }
    )
    assert not set(cvs) & set(incremental_mutation_cvs(source, year))
    return cvs


def full_catalog_oracle_sql(
    source: str,
    year: int,
    geotypes: list[str],
    mutate_cvs=None,
    mutate_delta: float = 7.0,
    labs_vintage: str = "2020",
) -> str:
    """The DuckDB twin of ``calculate_batch_catalog`` over the
    synthetic wide spec — regenerates the same values from
    ``customer``, melts through a (pff, census column) mapping table,
    and applies the same scrub / horizontal / p-z / rounding /
    cleaning / labs pipeline set-based."""
    meta = load_meta(source, year)
    med = load_side(source, year, "median")
    spec = load_side(source, year, "special")
    cols = census_cols(meta)
    pcols = set(profile_cols(meta, source))
    decennial = source == "decennial"

    colmap = ",\n  ".join(
        f"({_q(cv)}, {i})" for i, cv in enumerate(cols)
    )
    varmap = ",\n  ".join(
        f"({_q(m['pff_variable'])}, {_q(cv)})"
        for m in meta
        for cv in m["census_variable"]
    )
    varattr = ",\n  ".join(
        f"({_q(p)}, {_q(d)}, {r}, {_q(c)}, {_q(z)}, {_q(b)}, {_q(t)}, {_q(pc)})"
        for (p, d, r, c, z, b, t, pc) in native_varattr(source, year)
    )

    bases = {str(m["base_variable"]) for m in meta}
    medians = set(med.keys())
    specials = {s["pff_variable"] for s in spec}
    med_inputs = [iv for v in med for iv in med[v]["ranges"].keys()]

    m_plain = (
        "CAST(NULL AS DOUBLE)"
        if decennial
        else "sqrt(0.0 + sum(coalesce(M * M, 0.0)))"
    )
    # variables with an EMPTY census-column list (the decennial
    # placeholders) have no melt rows: the engine still emits
    # e = Σ∅ = 0.0 (hsum([])), m = √0 for ACS / NULL for decennial
    e_fold = "coalesce(p0.e, 0.0)"
    m_fold = "CAST(NULL AS DOUBLE)" if decennial else "coalesce(p0.m, 0.0)"

    zx = "(e * agg_m / agg_e) * (e * agg_m / agg_e)"
    z_base = (
        f"CASE WHEN p = 0 THEN NULL WHEN p = 100 THEN NULL "
        f"WHEN agg_e = 0 THEN NULL "
        f"WHEN m * m - {zx} < 0 THEN sqrt(m * m + {zx}) / agg_e * 100 "
        f"ELSE sqrt(m * m - {zx}) / agg_e * 100 END"
    )

    def em_round(x: str) -> str:
        return (
            f"CASE rnd WHEN 1 THEN {_he(x, 1)} WHEN 2 THEN {_he(x, 2)} "
            f"ELSE {_he(x, 0)} END"
        )

    # cleaning tier 5/6 need the base/median lists; 7/8 conditional
    t7_rule = (
        f"pff_variable IN ({_inlist(med_inputs)}) "
        "AND pff_variable NOT LIKE '%rms%'"
        if med_inputs
        else "FALSE"
    )
    t8_rule = (
        f"pff_variable IN ({_inlist(specials)})" if specials else "FALSE"
    )
    med_list = _inlist(medians) if medians else "''"

    if labs_vintage == "2010":
        # format_geotype_2010 (reference geography/2010.py:232-243):
        # known labels get the 2010 suffix, unknown pass through
        labs_geotype = (
            "CASE geotype WHEN 'tract' THEN 'CT2010' "
            "WHEN 'borough' THEN 'Boro2010' WHEN 'city' THEN 'City2010' "
            "WHEN 'NTA' THEN 'NTA2010' ELSE geotype END"
        )
    else:
        labs_geotype = (
            "CASE geotype WHEN 'tract' THEN 'CT2010' "
            "WHEN 'borough' THEN 'Boro2020' WHEN 'city' THEN 'City2020' "
            "WHEN 'NTA' THEN 'NTA2020' WHEN 'CDTA' THEN 'CDTA2020' "
            "WHEN 'CT20' THEN 'CT2020' ELSE geotype END"
        )

    # vintage mutation (q367): the named census columns' raw E shifts
    # by delta BEFORE scrub — mirrors ColumnDeltaWideSource
    e_raw_sql = E_SQL
    if mutate_cvs:
        e_raw_sql = (
            f"CASE WHEN cv IN ({_inlist(mutate_cvs)}) "
            f"THEN ({E_SQL}) + {float(mutate_delta)!r} ELSE {E_SQL} END"
        )

    return f"""
WITH geo AS ({_geo_sql(geotypes)}),
colmap(cv, i) AS (VALUES
  {colmap}),
varmap(pff, cv) AS (VALUES
  {varmap}),
varattr(pff, domain, rnd, cls, pz, base, twin, prof_cv) AS (VALUES
  {varattr}),
rawv AS (
  SELECT geotype, census_geoid, labs_geoid, cv,
    {e_raw_sql} AS E_raw, {M_SQL} AS M_raw,
    {PE_SQL} AS PE_raw, {PM_SQL} AS PM_raw
  FROM (SELECT g.*, c.cv, c.i, (g.s2 + (c.i + 1) * 7919) AS h
        FROM geo g CROSS JOIN colmap c)),
scrub AS (
  SELECT geotype, census_geoid, labs_geoid, cv,
    CASE WHEN E_raw IN ({_S}) THEN NULL ELSE E_raw END AS E,
    CASE WHEN m1 IN ({_S}) THEN NULL ELSE m1 END AS M,
    CASE WHEN PE_raw IN ({_S}) THEN NULL ELSE PE_raw END AS PPE,
    CASE WHEN pm1 IN ({_S}) THEN NULL ELSE pm1 END AS PPM
  FROM (
    SELECT *,
      CASE WHEN geotype IN ('borough','city') AND m0 IN ({_C})
           THEN 0.0 ELSE m0 END AS m1,
      CASE WHEN geotype IN ('borough','city') AND PM_raw IN ({_C})
           THEN 0.0 ELSE PM_raw END AS pm1
    FROM (
      SELECT *, CASE WHEN E_raw IN ({_S}) THEN NULL
                     WHEN E_raw = 0 THEN 0.0
                     ELSE M_raw END AS m0
      FROM rawv) t1) t2),
plain AS (
  SELECT geotype, census_geoid, v.pff,
    0.0 + sum(coalesce(E, 0.0)) AS e,
    {m_plain} AS m
  FROM scrub s JOIN varmap v ON s.cv = v.cv
  GROUP BY 1, 2, 3),
wrk AS (
  SELECT geotype, census_geoid,
    max(CASE WHEN pff = 'wrkr16pl' THEN e END) AS we,
    max(CASE WHEN pff = 'wrkr16pl' THEN m END) AS wm,
    max(CASE WHEN pff = 'cw_wrkdhm' THEN e END) AS ce,
    max(CASE WHEN pff = 'cw_wrkdhm' THEN m END) AS cm
  FROM plain WHERE pff IN ('wrkr16pl', 'cw_wrkdhm') GROUP BY 1, 2),
asm AS (
  SELECT g.geotype, g.census_geoid, g.labs_geoid,
    a.pff, a.domain, a.rnd, a.pz,
    CASE a.cls WHEN 'prof' THEN pr.E
         WHEN 'wrk' THEN w.we - w.ce ELSE {e_fold} END AS e,
    CASE a.cls WHEN 'prof' THEN pr.M
         WHEN 'wrk' THEN sqrt(w.wm * w.wm + w.cm * w.cm)
         ELSE {m_fold} END AS m,
    pr.PPE AS prof_p, pr.PPM AS prof_z,
    b.e AS agg_e, b.m AS agg_m, t.e AS tw_e, t.m AS tw_m
  FROM geo g
  CROSS JOIN varattr a
  LEFT JOIN plain p0 ON p0.geotype = g.geotype
    AND p0.census_geoid = g.census_geoid AND p0.pff = a.pff
  LEFT JOIN plain b ON b.geotype = g.geotype
    AND b.census_geoid = g.census_geoid AND b.pff = a.base
  LEFT JOIN plain t ON t.geotype = g.geotype
    AND t.census_geoid = g.census_geoid AND t.pff = a.twin
  LEFT JOIN wrk w ON w.geotype = g.geotype
    AND w.census_geoid = g.census_geoid
  LEFT JOIN scrub pr ON pr.geotype = g.geotype
    AND pr.census_geoid = g.census_geoid AND pr.cv = a.prof_cv),
withp AS (
  SELECT *,
    CASE pz WHEN 'prof' THEN prof_p
         WHEN 'med' THEN CASE WHEN geotype IN ('borough','city')
                              THEN 100.0 ELSE NULL END
         WHEN 'pov' THEN tw_e
         WHEN 'p100' THEN 100.0
         WHEN 'base' THEN CASE WHEN agg_e = 0 THEN NULL
                               ELSE e / agg_e * 100 END
         ELSE NULL END AS p
  FROM asm),
stats AS (
  SELECT geotype, census_geoid, labs_geoid, pff, domain, rnd, e, m, p,
    CASE pz WHEN 'prof' THEN prof_z WHEN 'pov' THEN tw_m
         WHEN 'base' THEN {z_base}
         ELSE NULL END AS z,
    CASE WHEN e = 0 THEN NULL ELSE m / 1.645 / e * 100 END AS c
  FROM withp),
rounded AS (
  -- + 0.0 canonicalizes IEEE -0.0 -> +0.0 (mirrors the Spark frame;
  -- a value-hash distinguishes "-0.0" from "0.0")
  SELECT geotype, census_geoid, labs_geoid, pff AS pff_variable, domain,
    ({_he("c", 1)}) + 0.0 AS c,
    ({em_round("e")}) + 0.0 AS e,
    ({em_round("m")}) + 0.0 AS m,
    ({_he("p", 1)}) + 0.0 AS p,
    ({_he("z", 1)}) + 0.0 AS z
  FROM stats),
t1 AS (
  SELECT geotype, census_geoid, labs_geoid, pff_variable, domain,
    CASE WHEN c < 0 THEN NULL ELSE c END AS c,
    CASE WHEN e < 0 THEN NULL ELSE e END AS e,
    CASE WHEN m < 0 THEN NULL ELSE m END AS m,
    CASE WHEN p < 0 THEN NULL ELSE p END AS p,
    CASE WHEN z < 0 THEN NULL ELSE z END AS z
  FROM rounded),
t2 AS (SELECT geotype, census_geoid, labs_geoid, pff_variable, domain,
  c, e, m, CASE WHEN p > 100 THEN NULL ELSE p END AS p, z FROM t1),
t3 AS (SELECT geotype, census_geoid, labs_geoid, pff_variable, domain,
  c, e, m, p, CASE WHEN p IS NULL THEN NULL ELSE z END AS z FROM t2),
t4 AS (SELECT geotype, census_geoid, labs_geoid, pff_variable, domain,
  c, e, m, p, CASE WHEN p = 100 THEN 0.0 ELSE z END AS z FROM t3),
t5 AS (SELECT geotype, census_geoid, labs_geoid, pff_variable, domain,
  CASE WHEN geotype IN ('borough','city')
        AND pff_variable IN ({_inlist(bases)}) AND c IS NULL
       THEN 0.0 ELSE c END AS c,
  e,
  CASE WHEN geotype IN ('borough','city')
        AND pff_variable IN ({_inlist(bases)}) AND m IS NULL
       THEN 0.0 ELSE m END AS m,
  p, z FROM t4),
t6 AS (SELECT geotype, census_geoid, labs_geoid, pff_variable, domain,
  c, e, m,
  CASE WHEN pff_variable IN ({_inlist(bases)})
        AND pff_variable NOT IN ({med_list})
       THEN 100.0 ELSE p END AS p,
  CASE WHEN pff_variable IN ({_inlist(bases)})
        AND pff_variable NOT IN ({med_list})
       THEN 0.0 ELSE z END AS z
  FROM t5),
t7 AS (SELECT geotype, census_geoid, labs_geoid, pff_variable, domain,
  CASE WHEN {t7_rule} THEN NULL ELSE c END AS c, e,
  CASE WHEN {t7_rule} THEN NULL ELSE m END AS m,
  CASE WHEN {t7_rule} THEN NULL ELSE p END AS p,
  CASE WHEN {t7_rule} THEN NULL ELSE z END AS z
  FROM t6),
t8 AS (SELECT geotype, census_geoid, labs_geoid, pff_variable, domain,
  c, e, m,
  CASE WHEN {t8_rule} THEN NULL ELSE p END AS p,
  CASE WHEN {t8_rule} THEN NULL ELSE z END AS z
  FROM t7)
SELECT census_geoid, labs_geoid, geotype,
  {labs_geotype} AS labs_geotype,
  pff_variable,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE c END AS c,
  e,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE m END AS m,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE p END AS p,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE z END AS z,
  domain
FROM t8 ORDER BY geotype, pff_variable, census_geoid
"""


# ---------------------------------------------------------------------------
# aggregated-geotype (CT20/NTA) oracle generator for q337
# ---------------------------------------------------------------------------

def aggregated_varattr(source: str, year: int) -> list[tuple]:
    """Per-variable classification at an AGGREGATED geotype (the other
    branch order of calculate.py:198-291): no profile path, medians
    take the grouped-median algorithm, every special takes its
    formula; p/z come from the base (or the grouped MEDIAN when the
    base is a median — the calculate.py:248-259 quirk).  Rows:
    (pff, domain, rounding, cls, pz, base, medbase)."""
    meta = load_meta(source, year)
    med = load_side(source, year, "median")
    spec = load_side(source, year, "special")
    medians = set(med.keys())
    specials = {s["pff_variable"] for s in spec}
    bases = {str(m["base_variable"]) for m in meta}
    names = {m["pff_variable"] for m in meta}
    rows = []
    for m in meta:
        pff = m["pff_variable"]
        base = str(m.get("base_variable", "nan"))
        rnd = int(m.get("rounding", 0))
        dom = m.get("domain", "")
        cls, pz, b, mb = "plain", "none", None, None
        if pff in medians:
            cls, pz = "med", "med"
        else:
            if pff in specials or pff == "wrkrnothm":
                cls = "spec"
            if pff not in bases:
                if base != "nan":
                    if base not in names:
                        continue  # dropped task
                    if base in medians:
                        pz, mb = "medbase", base
                    else:
                        pz, b = "base", base
            else:
                pz = "p100"
        rows.append((pff, dom, rnd, cls, pz, b, mb))
    return rows


def _median_ctes(
    tag: str,
    src_cte: str,
    pff: str,
    spec: dict,
    rms: bool,
) -> tuple[str, str]:
    """Grouped-median CTE chain over per-bin COUNT COLUMNS pivoted from
    a long (census_geoid, pff, e) source — the q301 template
    (operators/median.py quirk-for-quirk: first-bin bottom-coding,
    the `&`-precedence upper-bound quirk, the row[-1] wraparound, the
    mdrms 0.5 floor) with the bins fed by aggregated estimates instead
    of row counts.  Returns (cte_sql_fragment, final_cte_name)."""
    bins = [(k, float(v[0]), float(v[1])) for k, v in spec["ranges"].items()]
    n = len(bins)
    lo = [b[1] for b in bins]
    hi = [b[2] for b in bins]
    df = float(spec["design_factor"])
    nl = ",\n    ".join(
        f"max(CASE WHEN pff = {_q(v)} THEN e END) AS n{i}"
        for i, (v, _, _) in enumerate(bins)
    )
    cums = ", ".join(
        f"{' + '.join(f'n{j}' for j in range(i + 1))} AS c{i}"
        for i in range(n)
    )
    mi_case = " ".join(f"WHEN c{i} >= c{n-1} / 2 THEN {i}" for i in range(n))
    nlist = ", ".join(f"n{i}" for i in range(n))
    clist = ", ".join(f"c{i}" for i in range(n))
    lolist = ", ".join(repr(float(x)) for x in lo)
    wlist = ", ".join(repr(float(h - l)) for l, h in zip(lo, hi))
    bot = f"WHEN mi = 0 THEN {float(hi[0])!r}" if spec["bottom_coding"] else ""
    top = f"WHEN mi = {n-1} THEN {float(lo[n-1])!r}" if spec["top_coding"] else ""
    lb_case = " ".join(f"WHEN cpl[{i+1}] > 50.0 - se THEN {i}" for i in range(n))
    ub_case = " ".join(f"WHEN cpl[{i+1}] > 50.0 + se THEN {i}" for i in range(n))
    fnz_case = " ".join(f"WHEN cpl[{i+1}] != 0.0 THEN {i}" for i in range(n))
    floor0 = 0.5 if rms else 0.0
    t = f"md_{pff}_{tag}"
    sql = f"""
{t}_counts AS (
  SELECT census_geoid,
    {nl}
  FROM {src_cte} GROUP BY census_geoid),
{t}_cums AS (SELECT *, {cums} FROM {t}_counts),
{t}_base AS (
  SELECT *, c{n-1} AS B, CASE {mi_case} END AS mi FROM {t}_cums),
{t}_med AS (
  SELECT *,
    list_value({nlist}) AS nlst,
    list_value({clist}) AS cl,
    list_value({lolist}) AS lol,
    list_value({wlist}) AS wl,
    CASE WHEN B = 0 THEN NULL
         {bot}
         WHEN cl[mi + 1] = 0 THEN NULL
         {top}
         ELSE lol[mi + 1]
              + (B / 2 - (cl[mi + 1] - nlst[mi + 1]))
                * wl[mi + 1] / nlst[mi + 1]
    END AS med_e
  FROM {t}_base),
{t}_moe AS (
  SELECT *,
    CASE WHEN B != 0
         THEN {df!r} * sqrt(93.0 / (7.0 * B) * 2500.0) END AS se,
    CASE WHEN B != 0 THEN list_transform(cl, c -> c / B * 100) END AS cpl
  FROM {t}_med),
{t}_bf AS (
  SELECT *,
    CASE {lb_case} END AS lb,
    CASE {ub_case} END AS ub,
    CASE {fnz_case} END AS fnz
  FROM {t}_moe),
{t}_bounds AS (
  SELECT *,
    CASE WHEN lb = fnz THEN {floor0!r} ELSE lol[lb + 1] END AS a1l,
    CASE WHEN lb = fnz THEN {float(lo[1])!r}
         WHEN lb + 1 <= {n-1} THEN lol[lb + 2] END AS a2l,
    CASE WHEN lb = 0 THEN 0.0 ELSE cpl[lb] END AS c1l,
    cpl[lb + 1] AS c2l,
    CASE WHEN (ub = (lb & ub)) AND ((lb & ub) = fnz) THEN 0.0
         WHEN ub = {n-1} THEN {float(lo[n-1])!r} ELSE lol[ub + 1] END AS a1u,
    CASE WHEN (ub = (lb & ub)) AND ((lb & ub) = fnz) THEN {float(lo[1])!r}
         WHEN ub = {n-1} THEN {float(lo[n-1])!r}
         WHEN ub + 1 <= {n-1} THEN lol[ub + 2] END AS a2u,
    cpl[((ub - 1 + {n}) % {n}) + 1] AS c1u,
    cpl[ub + 1] AS c2u
  FROM {t}_bf),
{t}_final AS (
  SELECT *,
    CASE WHEN ((c2l - c1l) + a1l) != 0 THEN
      CASE WHEN (c2l - c1l) = 0 THEN NULL
           ELSE ((50.0 - se) - c1l) * (a2l - a1l) / (c2l - c1l) + a1l END
    END AS lbound,
    CASE WHEN ((c2u - c1u) + a1u) != 0 THEN
      CASE WHEN (c2u - c1u) = 0 THEN NULL
           ELSE ((50.0 + se) - c1u) * (a2u - a1u) / (c2u - c1u) + a1u END
    END AS ubound
  FROM {t}_bounds),
{t} AS (
  SELECT census_geoid, med_e AS e,
    CASE WHEN med_e >= {float(lo[n-1])!r} THEN NULL
         WHEN B = 0 THEN NULL
         WHEN se >= 50 THEN NULL
         WHEN lb >= {n-1} THEN NULL
         ELSE (ubound - lbound) * 1.645 / 2 END AS m
  FROM {t}_final)"""
    return sql, t


def _rdiv(num: str, den: str) -> str:
    """try_divide parity: NULL when the denominator is 0 (or NULL)."""
    return f"CASE WHEN {den} = 0 THEN NULL ELSE {num} / ({den}) END"


def _ratio_m_sql(ne: str, nm: str, de: str, dm: str) -> str:
    """special.py _ratio_m: try_divide(sqrt(nm² + pow(ne·dm/de, 2)), de)."""
    inner = _rdiv(f"{ne} * {dm}", de)
    return _rdiv(f"sqrt({nm} * {nm} + pow({inner}, 2))", de)


def _special_sqls() -> dict[str, tuple[str, str]]:
    """(e_sql, m_sql) per special over the pivoted base columns
    ``{base}e`` / ``{base}m`` (+ wrknoe/wrknom = wrkrnothm's special
    values) — operand order mirrors operators/special.py exactly."""
    vac = lambda de, ne, nm, dm: (  # noqa: E731 — vacancy_rate_moe
        f"CASE WHEN {de} = 0 THEN 0.0 WHEN {ne} = 0 THEN 0.0 "
        f"WHEN {nm} * {nm} - pow({ne} * {dm} / {de}, 2) < 0 "
        f"THEN sqrt({nm} * {nm} + pow({ne} * {dm} / {de}, 2)) / {de} * 100 "
        f"ELSE sqrt({nm} * {nm} - pow({ne} * {dm} / {de}, 2)) / {de} * 100 END"
    )
    out = {
        "percapinc": (
            _rdiv("agip15ple", "pop_6e"),
            _ratio_m_sql("agip15ple", "agip15plm", "pop_6e", "pop_6m"),
        ),
        "mntrvtm": (
            _rdiv("agttme", "wrkr16ple - cw_wrkdhme"),
            _ratio_m_sql("agttme", "agttmm", "wrknoe", "wrknom"),
        ),
        "mnhhinc": (
            _rdiv("aghhince", "hh2e"),
            _ratio_m_sql("aghhince", "aghhincm", "hh5e", "hh5m"),
        ),
        "avghhsooc": (
            _rdiv("popoochue", "oochu1e"),
            _ratio_m_sql("popoochue", "popoochum", "oochu4e", "oochu4m"),
        ),
        "avghhsroc": (
            _rdiv("poprtochue", "rochu1e"),
            _ratio_m_sql("poprtochue", "poprtochum", "rochu2e", "rochu2m"),
        ),
        "avghhsz": (
            _rdiv("hhpop1e", "hh1e"),
            _rdiv(
                "sqrt(hhpop1m * hhpop1m + pow("
                + _rdiv("hh4m * hhpop1e", "hh4e")
                + ", 2))",
                "hh4e",
            ),
        ),
        "avgfmsz": (
            _rdiv("popinfmse", "fam1e"),
            _rdiv(
                "sqrt(popinfmsm * popinfmsm + pow("
                + _rdiv("fam3m * popinfmse", "fam3e")
                + ", 2))",
                "fam3e",
            ),
        ),
        "hovacrt": (
            "CASE WHEN e0h = 0 THEN NULL ELSE e0h END",
            vac("hovacue", "vacsalee", "vacsalem", "hovacum"),
        ),
        "rntvacrt": (
            "CASE WHEN e0r = 0 THEN NULL ELSE e0r END",
            vac("rntvacue", "vacrnte", "vacrntm", "rntvacum"),
        ),
        "wrkrnothm": ("wrknoe", "wrknom"),
    }
    return out


AGG2020_ORACLE = {
    "CT20": ("c", "roll_ct20"),
    "NTA": ("n", "roll_nta"),
    "CDTA": ("d", "roll_cdta"),
    # block-group zone rollups (flag predicate on bgid mirrors the
    # _zone_2020_engine lookup fixture)
    "cdta_fp_100": ("f1", "roll_f1"),
    "cdta_fp_500": ("f5", "roll_f5"),
    "cdta_park_access": ("pk", "roll_pk"),
}

ZONE_ORACLE_FLAGS = {
    "cdta_fp_100": "bgid % 4 = 0",
    "cdta_fp_500": "bgid % 3 = 0",
    "cdta_park_access": "bgid % 2 = 0",
}


# Split-crosswalk fixture rules (q386 — the cross-geography change
# table's old side; mirrored by _crosswalk_2020_engine's "split" mode):
#   gid % 10 == 9            SPLIT  -> keeps 0.375 in ct2020 code gid
#                                      (so the power-law-deflated MOE
#                                      REACHES the change-table join),
#                                      sheds 0.625 to new code
#                                      gid+110000 (drops in the inner
#                                      join; appears in outer mode)
#   gid % 20 == 18           MERGE  -> absorbed into ct2020 gid-10
#                                      (ratio 1, joining gid-10's own
#                                      identity row: a 2-element fold)
#   otherwise                identity (ratio 1)
# Ratios 0.375/0.625 are exact binary fractions (3/8, 5/8) so e·ratio
# is exact, and both power-law factors exceed 0.5 so bround16 of the
# deflated m is a bit-exact no-op in BOTH engines (doubles >= 0.5
# round-trip a 16-decimal half-even rounding unchanged; 0.25-class
# ratios give factors < 0.5 where that stops holding).  Every fold
# group has <= 2 members, so the float sums are order-independent
# (2-element IEEE addition is commutative) — no quantization needed.
SPLIT_RATIOS = (0.375, 0.625)


def nta_catalog_oracle_sql(
    year: int = 2019,
    geotypes: tuple[str, ...] = ("CT20", "NTA"),
    crosswalk: str = "identity",
    nta_move: tuple[int, str] | None = None,
    mutate_cvs=None,
    mutate_delta: float = 7.0,
) -> str:
    """DuckDB twin of the aggregated-geotype catalog batch (q337 /
    q365's aggregated half): tract melt → identity-ratio CT20 fold →
    dimension folds (NTA gid%20, CDTA gid%7 — mirroring the
    _crosswalk_2020_engine fixture) → grouped medians / special
    formulas / base and median-base p-z → rounding → cleaning → labs,
    for any subset of {CT20, NTA, CDTA}; zone geotypes (cdta_fp_100 /
    cdta_fp_500 / cdta_park_access) instead fold the BLOCK-GROUP melt
    through the flag-gated zone dimension with a (zone × variable)
    spine keeping factless zones at e=0/m=0 — mirroring
    _zone_frames / block_group_to_zone.

    ``crosswalk="split"`` swaps the identity CT20 fold for the real
    apportionment shape (the SPLIT_RATIOS fixture rules): ratio
    right-join + the convert_moe power law — the reference's
    2010_to_2020.py:82-108 with splits and merges actually present.
    Split mode supports CT20 only (split-target geoids have no
    dimension rows)."""
    if crosswalk == "split" and set(geotypes) != {"CT20"}:
        raise ValueError("split crosswalk oracle supports CT20 only")
    source = "acs"
    meta = load_meta(source, year)
    med = load_side(source, year, "median")
    spec = load_side(source, year, "special")
    cols = census_cols(meta)
    specials_sql = _special_sqls()
    spec_by = {s["pff_variable"]: s for s in spec}

    colmap = ",\n  ".join(f"({_q(cv)}, {i})" for i, cv in enumerate(cols))
    varmap = ",\n  ".join(
        f"({_q(m['pff_variable'])}, {_q(cv)})"
        for m in meta
        for cv in m["census_variable"]
    )
    varattr = ",\n  ".join(
        f"({_q(p)}, {_q(d)}, {r}, {_q(c)}, {_q(z)}, {_q(b)}, {_q(mb)})"
        for (p, d, r, c, z, b, mb) in aggregated_varattr(source, year)
    )

    # pivot columns for every PLAIN special base member (special members
    # like wrkrnothm ride their own computed columns — wrknoe/wrknom)
    members = sorted(
        {
            b
            for s in spec
            for b in s["base_variables"]
            if b not in spec_by
        }
    )
    piv_cols = ",\n    ".join(
        f"max(CASE WHEN pff = {_q(b)} THEN e END) AS {b}e,\n"
        f"    max(CASE WHEN pff = {_q(b)} THEN m END) AS {b}m"
        for b in members
    )

    bases = {str(m["base_variable"]) for m in meta}
    medians = set(med.keys())
    specials = set(spec_by.keys())
    med_inputs = [iv for v in med for iv in med[v]["ranges"].keys()]

    zone_geos = [g for g in geotypes if g in ZONE_ORACLE_FLAGS]
    zone_ctes = ""
    if zone_geos:
        parts = ["""
g_bg AS (
  SELECT CAST(c_custkey % {nbg} AS BIGINT) AS bgid,
         CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(c_custkey) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS s3
  FROM customer GROUP BY 1),
geo_bg AS (
  SELECT '36047' || lpad(CAST(bgid % {nt} AS VARCHAR), 6, '0')
           || CAST(bgid // {nt} + 1 AS VARCHAR) AS census_geoid,
         'BK' || lpad(CAST((bgid % {nt}) % 7 AS VARCHAR), 2, '0') AS cdta,
         bgid, s1, s2, s3
  FROM g_bg),
rawv_bg AS (
  SELECT census_geoid, cv, {E} AS E_raw, {M} AS M_raw
  FROM (SELECT g.census_geoid, c.cv, c.i, g.s1, g.s2, g.s3,
               (g.s2 + (c.i + 1) * 7919) AS h
        FROM geo_bg g CROSS JOIN colmap c)),
scrub_bg AS (
  SELECT census_geoid, cv,
    CASE WHEN E_raw IN ({S}) THEN NULL ELSE E_raw END AS E,
    CASE WHEN m0 IN ({S}) THEN NULL ELSE m0 END AS M
  FROM (SELECT *, CASE WHEN E_raw IN ({S}) THEN NULL
                       WHEN E_raw = 0 THEN 0.0
                       ELSE M_raw END AS m0
        FROM rawv_bg) t1),
plain_bg AS (
  SELECT census_geoid, v.pff,
    0.0 + sum(coalesce(E, 0.0)) AS e,
    sqrt(0.0 + sum(coalesce(M * M, 0.0))) AS m
  FROM scrub_bg s JOIN varmap v ON s.cv = v.cv
  GROUP BY 1, 2),
pffs_all AS (SELECT DISTINCT pff FROM varmap)""".format(
            nbg=N_BLOCK_GROUPS, nt=N_TRACTS, E=E_SQL, M=M_SQL, S=_S
        )]
        for zg in zone_geos:
            ztag, zroll = AGG2020_ORACLE[zg]
            flag = ZONE_ORACLE_FLAGS[zg]
            parts.append(f"""
zones_{ztag} AS (SELECT DISTINCT cdta FROM geo_bg WHERE {flag}),
match_{ztag} AS (
  SELECT g.cdta AS zone, p.pff,
    coalesce(sum(p.e), 0.0) AS e,
    sqrt(coalesce(sum(p.m * p.m), 0.0)) AS m
  FROM plain_bg p JOIN geo_bg g USING (census_geoid)
  WHERE {flag} GROUP BY 1, 2),
{zroll} AS (
  SELECT z.cdta AS census_geoid, f.pff,
    coalesce(m.e, 0.0) AS e, coalesce(m.m, 0.0) AS m
  FROM zones_{ztag} z CROSS JOIN pffs_all f
  LEFT JOIN match_{ztag} m ON m.zone = z.cdta AND m.pff = f.pff)""")
        zone_ctes = ",".join(parts) + ","

    geo_ctes: list[str] = []
    asm_parts: list[str] = []
    for geotype in geotypes:
        tag, roll = AGG2020_ORACLE[geotype]
        med_chain, med_union = [], []
        for mv in med:
            c_sql, c_name = _median_ctes(
                tag, roll, mv, med[mv], rms=(mv == "mdrms")
            )
            med_chain.append(c_sql)
            med_union.append(
                f"SELECT census_geoid, {_q(mv)} AS pff, e, m FROM {c_name}"
            )
        spec_sel = []
        for sname in spec_by:
            e_sql, m_sql = specials_sql[sname]
            spec_sel.append(
                f"SELECT census_geoid, {_q(sname)} AS pff,\n"
                f"  {e_sql} AS e,\n  {m_sql} AS m FROM spv_{tag}"
            )
        geo_ctes.append(
            ",\n".join(med_chain)
            + f""",
sp_{tag} AS (
  SELECT census_geoid,
    {piv_cols}
  FROM {roll} GROUP BY census_geoid),
spv_{tag} AS (
  SELECT *,
    wrkr16ple - cw_wrkdhme AS wrknoe,
    sqrt(wrkr16plm * wrkr16plm + cw_wrkdhmm * cw_wrkdhmm) AS wrknom,
    100 * ({_rdiv("vacsalee", "hovacue")}) AS e0h,
    100 * ({_rdiv("vacrnte", "rntvacue")}) AS e0r
  FROM sp_{tag}),
medall_{tag} AS (
  {" UNION ALL ".join(med_union)}),
specall_{tag} AS (
  {" UNION ALL ".join(spec_sel)}),
em_{tag} AS (
  SELECT r.census_geoid, r.pff, r.e, r.m
  FROM {roll} r JOIN varattr a USING (pff) WHERE a.cls = 'plain'
  UNION ALL SELECT census_geoid, pff, e, m FROM medall_{tag}
  UNION ALL SELECT census_geoid, pff, e, m FROM specall_{tag}),
asm_{tag} AS (
  SELECT '{geotype}' AS geotype, em.census_geoid, em.pff,
    a.domain, a.rnd, a.pz, em.e, em.m,
    b.e AS agg_e, b.m AS agg_m, mb.e AS mb_e, mb.m AS mb_m
  FROM em_{tag} em
  JOIN varattr a USING (pff)
  LEFT JOIN {roll} b ON b.census_geoid = em.census_geoid
    AND b.pff = a.base
  LEFT JOIN medall_{tag} mb ON mb.census_geoid = em.census_geoid
    AND mb.pff = a.medbase)"""
        )
        asm_parts.append(f"SELECT * FROM asm_{tag}")

    zx_b = "(e * agg_m / agg_e) * (e * agg_m / agg_e)"
    zx_m = "(e * mb_m / mb_e) * (e * mb_m / mb_e)"
    z_base = (
        f"CASE WHEN p = 0 THEN NULL WHEN p = 100 THEN NULL "
        f"WHEN agg_e = 0 THEN NULL "
        f"WHEN m * m - {zx_b} < 0 THEN sqrt(m * m + {zx_b}) / agg_e * 100 "
        f"ELSE sqrt(m * m - {zx_b}) / agg_e * 100 END"
    )
    z_medb = (
        f"CASE WHEN p = 0 THEN NULL WHEN p = 100 THEN NULL "
        f"WHEN mb_e = 0 THEN NULL "
        f"WHEN m * m - {zx_m} < 0 THEN sqrt(m * m + {zx_m}) / mb_e * 100 "
        f"ELSE sqrt(m * m - {zx_m}) / mb_e * 100 END"
    )

    def em_round(x: str) -> str:
        return (
            f"CASE rnd WHEN 1 THEN {_he(x, 1)} WHEN 2 THEN {_he(x, 2)} "
            f"ELSE {_he(x, 0)} END"
        )

    t7_rule = (
        f"pff_variable IN ({_inlist(med_inputs)}) "
        "AND pff_variable NOT LIKE '%rms%'"
    )
    t8_rule = f"pff_variable IN ({_inlist(specials)})"
    labs_geoid = (
        "CASE WHEN length(census_geoid) = 11 "
        "THEN '3' || substr(census_geoid, 6, 6) ELSE census_geoid END"
    )
    labs_geotype = (
        "CASE geotype WHEN 'CT20' THEN 'CT2020' "
        "WHEN 'NTA' THEN 'NTA2020' "
        "WHEN 'CDTA' THEN 'CDTA2020' ELSE geotype END"
    )

    # vintage mutation (q389's combined update): the named census
    # columns' raw E shifts by delta BEFORE scrub — mirrors
    # ColumnDeltaWideSource, same idiom as full_catalog_oracle_sql
    e_raw_sql = E_SQL
    if mutate_cvs:
        e_raw_sql = (
            f"CASE WHEN cv IN ({_inlist(mutate_cvs)}) "
            f"THEN ({E_SQL}) + {float(mutate_delta)!r} ELSE {E_SQL} END"
        )

    nta_sql = "'BX' || lpad(CAST(gid % 20 AS VARCHAR), 2, '0')"
    if nta_move is not None:
        # geography REVISION (q388): the raw crosswalk re-assigns one
        # tract to a different NTA (boundary fix)
        moved_gid, new_nta = nta_move
        nta_sql = (
            f"CASE WHEN gid = {int(moved_gid)} THEN {_q(new_nta)} "
            f"ELSE {nta_sql} END"
        )
    if crosswalk == "split":
        r_lo, r_hi = SPLIT_RATIOS
        tgt = (
            lambda off: "'36047' || lpad(CAST(gid + {off} AS VARCHAR), 6,"
            " '0')".format(off=off)
        )
        ct20_cte = f"""ratio_map AS (
  SELECT census_geoid AS ct2010, census_geoid AS ct2020,
    CAST(1.0 AS DOUBLE) AS ratio
  FROM geo WHERE gid % 10 != 9 AND gid % 20 != 18
  UNION ALL
  SELECT census_geoid,
    '36047' || lpad(CAST(gid - 10 AS VARCHAR), 6, '0'),
    CAST(1.0 AS DOUBLE)
  FROM geo WHERE gid % 20 = 18
  UNION ALL
  SELECT census_geoid, census_geoid, CAST({r_lo!r} AS DOUBLE)
  FROM geo WHERE gid % 10 = 9
  UNION ALL
  SELECT census_geoid, {tgt(110000)}, CAST({r_hi!r} AS DOUBLE)
  FROM geo WHERE gid % 10 = 9),
scaled_ct20 AS (
  SELECT r.ct2020 AS census_geoid, p.pff,
    p.e * r.ratio AS e,
    CASE WHEN r.ratio = 1 THEN p.m
         WHEN p.e * r.ratio = 0 THEN NULL
         WHEN pow(r.ratio * 100, 0.56901) * 7.96309 >= 100 THEN p.m
         ELSE pow(r.ratio * 100, 0.56901) * 7.96309 / 100 * p.m END AS m
  FROM ratio_map r JOIN plain p ON p.census_geoid = r.ct2010),
roll_ct20 AS (
  SELECT census_geoid, pff,
    coalesce(sum(e), 0.0) AS e,
    sqrt(coalesce(sum(m * m), 0.0)) AS m
  FROM scaled_ct20 GROUP BY 1, 2)"""
    else:
        ct20_cte = """roll_ct20 AS (
  SELECT census_geoid, pff,
    coalesce(sum(e), 0.0) AS e,
    sqrt(coalesce(sum(m * m), 0.0)) AS m
  FROM plain GROUP BY 1, 2)"""

    return f"""
WITH g_tract AS (
  SELECT CAST(c_custkey % {N_TRACTS} AS BIGINT) AS gid,
         CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(c_custkey) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS s3
  FROM customer GROUP BY 1),
geo AS (
  SELECT '36047' || lpad(CAST(gid AS VARCHAR), 6, '0') AS census_geoid,
         {nta_sql} AS nta,
         'BK' || lpad(CAST(gid % 7 AS VARCHAR), 2, '0') AS cdta,
         gid, s1, s2, s3
  FROM g_tract),
colmap(cv, i) AS (VALUES
  {colmap}),
varmap(pff, cv) AS (VALUES
  {varmap}),
varattr(pff, domain, rnd, cls, pz, base, medbase) AS (VALUES
  {varattr}),
rawv AS (
  SELECT census_geoid, cv, {e_raw_sql} AS E_raw, {M_SQL} AS M_raw
  FROM (SELECT g.census_geoid, c.cv, c.i, g.s1, g.s2, g.s3,
               (g.s2 + (c.i + 1) * 7919) AS h
        FROM geo g CROSS JOIN colmap c)),
scrub AS (
  SELECT census_geoid, cv,
    CASE WHEN E_raw IN ({_S}) THEN NULL ELSE E_raw END AS E,
    CASE WHEN m0 IN ({_S}) THEN NULL ELSE m0 END AS M
  FROM (SELECT *, CASE WHEN E_raw IN ({_S}) THEN NULL
                       WHEN E_raw = 0 THEN 0.0
                       ELSE M_raw END AS m0
        FROM rawv) t1),
plain AS (
  SELECT census_geoid, v.pff,
    0.0 + sum(coalesce(E, 0.0)) AS e,
    sqrt(0.0 + sum(coalesce(M * M, 0.0))) AS m
  FROM scrub s JOIN varmap v ON s.cv = v.cv
  GROUP BY 1, 2),
{ct20_cte},
roll_nta AS (
  SELECT g.nta AS census_geoid, r.pff,
    coalesce(sum(r.e), 0.0) AS e,
    sqrt(coalesce(sum(r.m * r.m), 0.0)) AS m
  FROM roll_ct20 r JOIN geo g ON r.census_geoid = g.census_geoid
  GROUP BY 1, 2),
roll_cdta AS (
  SELECT g.cdta AS census_geoid, r.pff,
    coalesce(sum(r.e), 0.0) AS e,
    sqrt(coalesce(sum(r.m * r.m), 0.0)) AS m
  FROM roll_ct20 r JOIN geo g ON r.census_geoid = g.census_geoid
  GROUP BY 1, 2),
{zone_ctes}
{",".join(geo_ctes)},
asm AS ({" UNION ALL ".join(asm_parts)}),
withp AS (
  SELECT *,
    CASE pz WHEN 'med' THEN NULL
         WHEN 'p100' THEN 100.0
         WHEN 'base' THEN CASE WHEN agg_e = 0 THEN NULL
                               ELSE e / agg_e * 100 END
         WHEN 'medbase' THEN CASE WHEN mb_e = 0 THEN NULL
                                  ELSE e / mb_e * 100 END
         ELSE NULL END AS p
  FROM asm),
stats AS (
  SELECT geotype, census_geoid, pff AS pff_variable, domain, rnd,
    e, m, p,
    CASE pz WHEN 'base' THEN {z_base}
         WHEN 'medbase' THEN {z_medb}
         ELSE NULL END AS z,
    CASE WHEN e = 0 THEN NULL ELSE m / 1.645 / e * 100 END AS c
  FROM withp),
rounded AS (
  -- + 0.0 canonicalizes IEEE -0.0 -> +0.0 (mirrors the Spark frame:
  -- signed-zero accumulation paths differ across engines and a
  -- value-hash distinguishes the two renderings)
  SELECT geotype, census_geoid, pff_variable, domain,
    ({_he("c", 1)}) + 0.0 AS c,
    ({em_round("e")}) + 0.0 AS e,
    ({em_round("m")}) + 0.0 AS m,
    ({_he("p", 1)}) + 0.0 AS p,
    ({_he("z", 1)}) + 0.0 AS z
  FROM stats),
t1 AS (
  SELECT geotype, census_geoid, pff_variable, domain,
    CASE WHEN c < 0 THEN NULL ELSE c END AS c,
    CASE WHEN e < 0 THEN NULL ELSE e END AS e,
    CASE WHEN m < 0 THEN NULL ELSE m END AS m,
    CASE WHEN p < 0 THEN NULL ELSE p END AS p,
    CASE WHEN z < 0 THEN NULL ELSE z END AS z
  FROM rounded),
t2 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m, CASE WHEN p > 100 THEN NULL ELSE p END AS p, z FROM t1),
t3 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m, p, CASE WHEN p IS NULL THEN NULL ELSE z END AS z FROM t2),
t4 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m, p, CASE WHEN p = 100 THEN 0.0 ELSE z END AS z FROM t3),
t6 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m,
  CASE WHEN pff_variable IN ({_inlist(bases)})
        AND pff_variable NOT IN ({_inlist(medians)})
       THEN 100.0 ELSE p END AS p,
  CASE WHEN pff_variable IN ({_inlist(bases)})
        AND pff_variable NOT IN ({_inlist(medians)})
       THEN 0.0 ELSE z END AS z
  FROM t4),
t7 AS (SELECT geotype, census_geoid, pff_variable, domain,
  CASE WHEN {t7_rule} THEN NULL ELSE c END AS c, e,
  CASE WHEN {t7_rule} THEN NULL ELSE m END AS m,
  CASE WHEN {t7_rule} THEN NULL ELSE p END AS p,
  CASE WHEN {t7_rule} THEN NULL ELSE z END AS z
  FROM t6),
t8 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m,
  CASE WHEN {t8_rule} THEN NULL ELSE p END AS p,
  CASE WHEN {t8_rule} THEN NULL ELSE z END AS z
  FROM t7)
SELECT census_geoid,
  {labs_geoid} AS labs_geoid,
  geotype,
  {labs_geotype} AS labs_geotype,
  pff_variable,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE c END AS c,
  e,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE m END AS m,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE p END AS p,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE z END AS z,
  domain
FROM t8 ORDER BY geotype, pff_variable, census_geoid
"""


PROD_ORDER = "ORDER BY geotype, pff_variable, census_geoid"
# the published domains (reference pipelines/acs.py:48) — the catalog
# also carries community_profiles-domain variables that the production
# CSV does NOT ship
PROD_DOMAINS = ("demographic", "economic", "housing", "social")


def production_oracle_sql(year: int = 2019) -> str:
    """DuckDB twin of the reference's SHIPPED production artifact
    (pipelines/acs.py:36-63 + create_acs.sql:4-16): the full catalog
    over the entire grid — native tract/borough/city UNION the
    aggregated CT20/NTA/CDTA rollups — in the create_acs.sql column
    order (census_geoid, labs_geoid, geotype, labs_geotype,
    pff_variable, c, e, m, p, z, domain).  Reuses the two audited
    generators verbatim; only the final ORDER BY moves outward."""
    nat = full_catalog_oracle_sql("acs", year, ["tract", "borough", "city"])
    agg = nta_catalog_oracle_sql(year, ("CT20", "NTA", "CDTA"))
    assert nat.rstrip().endswith(PROD_ORDER) and agg.rstrip().endswith(
        PROD_ORDER
    )
    strip = lambda q: q.rstrip()[: -len(PROD_ORDER)]  # noqa: E731
    doms = ", ".join(_q(d) for d in PROD_DOMAINS)
    return (
        f"SELECT * FROM ({strip(nat)}) WHERE domain IN ({doms})\n"
        f"UNION ALL\nSELECT * FROM ({strip(agg)}) WHERE domain IN ({doms})"
        f"\n{PROD_ORDER}"
    )


# ---------------------------------------------------------------------------
# 2010-geography aggregated oracle (decennial rollups — q380)
# ---------------------------------------------------------------------------

# 2010-geography fixture spec (mirrors _decennial_2010_engine in
# __spark_entry__.py): tract gid -> NTA 'BK'+(gid%10), cd '7903'+(gid%5);
# block bid -> flags fp_100: bid%4, fp_500: bid%3, park_access: bid%2
AGG2010_ORACLE = {
    "NTA": ("n10", "tract"),
    "cd": ("c10", "tract"),
    "cd_fp_100": ("zf1", "block"),
    "cd_fp_500": ("zf5", "block"),
    "cd_park_access": ("zpk", "block"),
}

ZONE2010_ORACLE_FLAGS = {
    "cd_fp_100": "bid % 4 = 0",
    "cd_fp_500": "bid % 3 = 0",
    "cd_park_access": "bid % 2 = 0",
}


def decennial_2010_agg_oracle_sql(geotypes: tuple[str, ...]) -> str:
    """DuckDB twin of the 2010-geography aggregated catalog batch for
    the DECENNIAL source (plans/batch.py ``_aggregated_2010_frames`` /
    the block-grain ``_zone_frames``; reference geography/2010.py:
    55-65, 67-169, 186-205): tract melt-fold → direct NTA/cd dimension
    rollups (no crosswalk hop), and block melt-fold → flag-gated cd
    zone rollups, each over a (unit × variable) spine so the 24
    empty-column placeholder variables keep e=0 rows and flagged
    zones with no facts keep e=0/m=0 like ``_zone_rollup``.  Decennial
    margins are NULL at the download grain and the NaN→0 rollup turns
    them into 0.0 at every aggregated geotype, so ``m`` is identically
    0.0 here — matching the per-variable ``agg_moe`` path.  Medians
    and specials are asserted absent (both decennial sidecars are
    empty)."""
    source, year = "decennial", 2010
    meta = load_meta(source, year)
    assert not load_side(source, year, "median"), "decennial has medians?"
    assert not load_side(source, year, "special"), "decennial has specials?"
    cols = census_cols(meta)
    bases = {str(m["base_variable"]) for m in meta}

    colmap = ",\n  ".join(f"({_q(cv)}, {i})" for i, cv in enumerate(cols))
    varmap = ",\n  ".join(
        f"({_q(m['pff_variable'])}, {_q(cv)})"
        for m in meta
        for cv in m["census_variable"]
    )
    varattr = ",\n  ".join(
        f"({_q(p)}, {_q(d)}, {r}, {_q(c)}, {_q(z)}, {_q(b)}, {_q(mb)})"
        for (p, d, r, c, z, b, mb) in aggregated_varattr(source, year)
    )

    need_tract = any(AGG2010_ORACLE[g][1] == "tract" for g in geotypes)
    need_block = any(AGG2010_ORACLE[g][1] == "block" for g in geotypes)

    grain_ctes: list[str] = []
    if need_tract:
        grain_ctes.append(f"""
g_tract AS MATERIALIZED (
  SELECT CAST(c_custkey % {N_TRACTS} AS BIGINT) AS gid,
         CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(c_custkey) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS s3
  FROM customer GROUP BY 1),
geo_t AS (
  SELECT '36047' || lpad(CAST(gid AS VARCHAR), 6, '0') AS census_geoid,
         'BK' || lpad(CAST(gid % 10 AS VARCHAR), 2, '0') AS nta,
         '7903' || lpad(CAST(gid % 5 AS VARCHAR), 2, '0') AS cd,
         gid, s1, s2, s3
  FROM g_tract),
plain_t AS MATERIALIZED (
  SELECT census_geoid, v.pff, 0.0 + sum(coalesce(E, 0.0)) AS e
  FROM (
    SELECT census_geoid, cv,
      CASE WHEN E_raw IN ({_S}) THEN NULL ELSE E_raw END AS E
    FROM (
      SELECT census_geoid, cv, {E_SQL} AS E_raw
      FROM (SELECT g.census_geoid, c.cv, c.i, g.s1, g.s2, g.s3,
                   (g.s2 + (c.i + 1) * 7919) AS h
            FROM geo_t g CROSS JOIN colmap c))) s
  JOIN varmap v ON s.cv = v.cv
  GROUP BY 1, 2)""")
    if need_block:
        grain_ctes.append(f"""
g_blk AS MATERIALIZED (
  SELECT CAST(c_custkey % {N_BLOCKS} AS BIGINT) AS bid,
         CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(c_custkey) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS s3
  FROM customer GROUP BY 1),
geo_b AS (
  SELECT '36047' || lpad(CAST(bid % {N_TRACTS} AS VARCHAR), 6, '0')
           || ('100' || CAST(bid // {N_TRACTS} + 1 AS VARCHAR))
           AS census_geoid,
         '7903' || lpad(CAST((bid % {N_TRACTS}) % 5 AS VARCHAR), 2, '0')
           AS cd,
         bid, s1, s2, s3
  FROM g_blk),
plain_b AS MATERIALIZED (
  SELECT census_geoid, v.pff, 0.0 + sum(coalesce(E, 0.0)) AS e
  FROM (
    SELECT census_geoid, cv,
      CASE WHEN E_raw IN ({_S}) THEN NULL ELSE E_raw END AS E
    FROM (
      SELECT census_geoid, cv, {E_SQL} AS E_raw
      FROM (SELECT g.census_geoid, c.cv, c.i, g.s1, g.s2, g.s3,
                   (g.s2 + (c.i + 1) * 7919) AS h
            FROM geo_b g CROSS JOIN colmap c))) s
  JOIN varmap v ON s.cv = v.cv
  GROUP BY 1, 2)""")

    geo_ctes: list[str] = []
    asm_parts: list[str] = []
    for geotype in geotypes:
        tag, grain = AGG2010_ORACLE[geotype]
        if grain == "tract":
            dim_col = {"NTA": "nta", "cd": "cd"}[geotype]
            roll = f"""
units_{tag} AS (SELECT DISTINCT {dim_col} AS unit FROM geo_t),
roll_{tag} AS MATERIALIZED (
  SELECT g.{dim_col} AS unit, p.pff, coalesce(sum(p.e), 0.0) AS e
  FROM plain_t p JOIN geo_t g USING (census_geoid)
  GROUP BY 1, 2),
spine_{tag} AS MATERIALIZED (
  SELECT u.unit AS census_geoid, a.pff,
    coalesce(r.e, 0.0) AS e, 0.0 AS m
  FROM units_{tag} u CROSS JOIN (SELECT DISTINCT pff FROM varattr) a
  LEFT JOIN roll_{tag} r ON r.unit = u.unit AND r.pff = a.pff)"""
        else:
            flag = ZONE2010_ORACLE_FLAGS[geotype]
            roll = f"""
units_{tag} AS (SELECT DISTINCT cd AS unit FROM geo_b WHERE {flag}),
roll_{tag} AS MATERIALIZED (
  SELECT g.cd AS unit, p.pff, coalesce(sum(p.e), 0.0) AS e
  FROM plain_b p JOIN geo_b g USING (census_geoid)
  WHERE {flag} GROUP BY 1, 2),
spine_{tag} AS MATERIALIZED (
  SELECT u.unit AS census_geoid, a.pff,
    coalesce(r.e, 0.0) AS e, 0.0 AS m
  FROM units_{tag} u CROSS JOIN (SELECT DISTINCT pff FROM varattr) a
  LEFT JOIN roll_{tag} r ON r.unit = u.unit AND r.pff = a.pff)"""
        geo_ctes.append(roll)
        asm_parts.append(
            f"""SELECT '{geotype}' AS geotype, s.census_geoid, s.pff,
    a.domain, a.rnd, a.pz, s.e, s.m, b.e AS agg_e, b.m AS agg_m
  FROM spine_{tag} s JOIN varattr a USING (pff)
  LEFT JOIN spine_{tag} b ON b.census_geoid = s.census_geoid
    AND b.pff = a.base"""
        )

    zx = "(e * agg_m / agg_e) * (e * agg_m / agg_e)"
    z_base = (
        f"CASE WHEN p = 0 THEN NULL WHEN p = 100 THEN NULL "
        f"WHEN agg_e = 0 THEN NULL "
        f"WHEN m * m - {zx} < 0 THEN sqrt(m * m + {zx}) / agg_e * 100 "
        f"ELSE sqrt(m * m - {zx}) / agg_e * 100 END"
    )

    def em_round(x: str) -> str:
        return (
            f"CASE rnd WHEN 1 THEN {_he(x, 1)} WHEN 2 THEN {_he(x, 2)} "
            f"ELSE {_he(x, 0)} END"
        )

    # format_geoid_2010: NTA prefixes pass through, '79' CD codes keep
    # the last 4 chars, everything else here is unreachable
    labs_geoid = (
        "CASE WHEN substr(census_geoid, 1, 2) IN "
        "('MN','QN','BX','BK','SI') THEN census_geoid "
        "WHEN substr(census_geoid, 1, 2) = '79' "
        "THEN substr(census_geoid, length(census_geoid) - 3, 4) END"
    )
    labs_geotype = (
        "CASE geotype WHEN 'NTA' THEN 'NTA2010' ELSE geotype END"
    )

    return f"""
WITH colmap(cv, i) AS (VALUES
  {colmap}),
varmap(pff, cv) AS (VALUES
  {varmap}),
varattr(pff, domain, rnd, cls, pz, base, medbase) AS (VALUES
  {varattr}),
{",".join(grain_ctes)},
{",".join(geo_ctes)},
asm AS ({" UNION ALL ".join(asm_parts)}),
withp AS (
  SELECT *,
    CASE pz WHEN 'p100' THEN 100.0
         WHEN 'base' THEN CASE WHEN agg_e = 0 THEN NULL
                               ELSE e / agg_e * 100 END
         ELSE NULL END AS p
  FROM asm),
stats AS (
  SELECT geotype, census_geoid, pff AS pff_variable, domain, rnd,
    e, m, p,
    CASE pz WHEN 'base' THEN {z_base} ELSE NULL END AS z,
    CASE WHEN e = 0 THEN NULL ELSE m / 1.645 / e * 100 END AS c
  FROM withp),
rounded AS (
  SELECT geotype, census_geoid, pff_variable, domain,
    ({_he("c", 1)}) + 0.0 AS c,
    ({em_round("e")}) + 0.0 AS e,
    ({em_round("m")}) + 0.0 AS m,
    ({_he("p", 1)}) + 0.0 AS p,
    ({_he("z", 1)}) + 0.0 AS z
  FROM stats),
t1 AS (
  SELECT geotype, census_geoid, pff_variable, domain,
    CASE WHEN c < 0 THEN NULL ELSE c END AS c,
    CASE WHEN e < 0 THEN NULL ELSE e END AS e,
    CASE WHEN m < 0 THEN NULL ELSE m END AS m,
    CASE WHEN p < 0 THEN NULL ELSE p END AS p,
    CASE WHEN z < 0 THEN NULL ELSE z END AS z
  FROM rounded),
t2 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m, CASE WHEN p > 100 THEN NULL ELSE p END AS p, z FROM t1),
t3 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m, p, CASE WHEN p IS NULL THEN NULL ELSE z END AS z FROM t2),
t4 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m, p, CASE WHEN p = 100 THEN 0.0 ELSE z END AS z FROM t3),
t6 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m,
  CASE WHEN pff_variable IN ({_inlist(bases)})
       THEN 100.0 ELSE p END AS p,
  CASE WHEN pff_variable IN ({_inlist(bases)})
       THEN 0.0 ELSE z END AS z
  FROM t4)
SELECT census_geoid,
  {labs_geoid} AS labs_geoid,
  geotype,
  {labs_geotype} AS labs_geotype,
  pff_variable,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE c END AS c,
  e,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE m END AS m,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE p END AS p,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE z END AS z,
  domain
FROM t6 ORDER BY geotype, pff_variable, census_geoid
"""


def acs_2010geo_oracle_sql(
    year: int = 2019, geotypes: tuple[str, ...] = ("NTA", "cd")
) -> str:
    """DuckDB twin of the ACS catalog through the 2010-GEOGRAPHY
    aggregated chain (plans/batch.py ``_aggregated_2010_frames``;
    reference geography/2010.py:55-65,171-184): tract melt-fold →
    DIRECT NTA/cd dimension rollup (no crosswalk hop, unlike the 2020
    chain's ratio right-join → CT20 → dimension) → the same grouped-
    median / special-formula / base and median-base p-z assembly as
    ``nta_catalog_oracle_sql``, with 2010 labs formatting (NTA codes
    pass through, '79…' CD codes keep the last 4 chars; NTA→NTA2010,
    cd passes through).  Dimension fixture mirrors
    ``_decennial_2010_engine``: NTA 'BK'+(gid%10), cd '7903'+(gid%5).

    The (unit × variable) spine the Spark chain builds is value-
    neutral for ACS (every variable has census columns, so the fold
    covers every unit) and is omitted here."""
    source = "acs"
    meta = load_meta(source, year)
    med = load_side(source, year, "median")
    spec = load_side(source, year, "special")
    cols = census_cols(meta)
    specials_sql = _special_sqls()
    spec_by = {s["pff_variable"]: s for s in spec}

    colmap = ",\n  ".join(f"({_q(cv)}, {i})" for i, cv in enumerate(cols))
    varmap = ",\n  ".join(
        f"({_q(m['pff_variable'])}, {_q(cv)})"
        for m in meta
        for cv in m["census_variable"]
    )
    varattr = ",\n  ".join(
        f"({_q(p)}, {_q(d)}, {r}, {_q(c)}, {_q(z)}, {_q(b)}, {_q(mb)})"
        for (p, d, r, c, z, b, mb) in aggregated_varattr(source, year)
    )

    members = sorted(
        {b for s in spec for b in s["base_variables"] if b not in spec_by}
    )
    piv_cols = ",\n    ".join(
        f"max(CASE WHEN pff = {_q(b)} THEN e END) AS {b}e,\n"
        f"    max(CASE WHEN pff = {_q(b)} THEN m END) AS {b}m"
        for b in members
    )

    bases = {str(m["base_variable"]) for m in meta}
    medians = set(med.keys())
    specials = set(spec_by.keys())
    med_inputs = [iv for v in med for iv in med[v]["ranges"].keys()]

    DIM2010 = {"NTA": ("n10", "nta"), "cd": ("c10", "cd")}
    geo_ctes: list[str] = []
    asm_parts: list[str] = []
    for geotype in geotypes:
        tag, dim_col = DIM2010[geotype]
        roll = f"roll_{tag}"
        geo_ctes.append(f"""
{roll} AS MATERIALIZED (
  SELECT g.{dim_col} AS census_geoid, p.pff,
    coalesce(sum(p.e), 0.0) AS e,
    sqrt(coalesce(sum(p.m * p.m), 0.0)) AS m
  FROM plain p JOIN geo g USING (census_geoid)
  GROUP BY 1, 2)""")
        med_chain, med_union = [], []
        for mv in med:
            c_sql, c_name = _median_ctes(
                tag, roll, mv, med[mv], rms=(mv == "mdrms")
            )
            med_chain.append(c_sql)
            med_union.append(
                f"SELECT census_geoid, {_q(mv)} AS pff, e, m FROM {c_name}"
            )
        spec_sel = []
        for sname in spec_by:
            e_sql, m_sql = specials_sql[sname]
            spec_sel.append(
                f"SELECT census_geoid, {_q(sname)} AS pff,\n"
                f"  {e_sql} AS e,\n  {m_sql} AS m FROM spv_{tag}"
            )
        geo_ctes.append(
            ",\n".join(med_chain)
            + f""",
sp_{tag} AS (
  SELECT census_geoid,
    {piv_cols}
  FROM {roll} GROUP BY census_geoid),
spv_{tag} AS (
  SELECT *,
    wrkr16ple - cw_wrkdhme AS wrknoe,
    sqrt(wrkr16plm * wrkr16plm + cw_wrkdhmm * cw_wrkdhmm) AS wrknom,
    100 * ({_rdiv("vacsalee", "hovacue")}) AS e0h,
    100 * ({_rdiv("vacrnte", "rntvacue")}) AS e0r
  FROM sp_{tag}),
medall_{tag} AS (
  {" UNION ALL ".join(med_union)}),
specall_{tag} AS (
  {" UNION ALL ".join(spec_sel)}),
em_{tag} AS (
  SELECT r.census_geoid, r.pff, r.e, r.m
  FROM {roll} r JOIN varattr a USING (pff) WHERE a.cls = 'plain'
  UNION ALL SELECT census_geoid, pff, e, m FROM medall_{tag}
  UNION ALL SELECT census_geoid, pff, e, m FROM specall_{tag}),
asm_{tag} AS (
  SELECT '{geotype}' AS geotype, em.census_geoid, em.pff,
    a.domain, a.rnd, a.pz, em.e, em.m,
    b.e AS agg_e, b.m AS agg_m, mb.e AS mb_e, mb.m AS mb_m
  FROM em_{tag} em
  JOIN varattr a USING (pff)
  LEFT JOIN {roll} b ON b.census_geoid = em.census_geoid
    AND b.pff = a.base
  LEFT JOIN medall_{tag} mb ON mb.census_geoid = em.census_geoid
    AND mb.pff = a.medbase)"""
        )
        asm_parts.append(f"SELECT * FROM asm_{tag}")

    zx_b = "(e * agg_m / agg_e) * (e * agg_m / agg_e)"
    zx_m = "(e * mb_m / mb_e) * (e * mb_m / mb_e)"
    z_base = (
        f"CASE WHEN p = 0 THEN NULL WHEN p = 100 THEN NULL "
        f"WHEN agg_e = 0 THEN NULL "
        f"WHEN m * m - {zx_b} < 0 THEN sqrt(m * m + {zx_b}) / agg_e * 100 "
        f"ELSE sqrt(m * m - {zx_b}) / agg_e * 100 END"
    )
    z_medb = (
        f"CASE WHEN p = 0 THEN NULL WHEN p = 100 THEN NULL "
        f"WHEN mb_e = 0 THEN NULL "
        f"WHEN m * m - {zx_m} < 0 THEN sqrt(m * m + {zx_m}) / mb_e * 100 "
        f"ELSE sqrt(m * m - {zx_m}) / mb_e * 100 END"
    )

    def em_round(x: str) -> str:
        return (
            f"CASE rnd WHEN 1 THEN {_he(x, 1)} WHEN 2 THEN {_he(x, 2)} "
            f"ELSE {_he(x, 0)} END"
        )

    t7_rule = (
        f"pff_variable IN ({_inlist(med_inputs)}) "
        "AND pff_variable NOT LIKE '%rms%'"
    )
    t8_rule = f"pff_variable IN ({_inlist(specials)})"
    labs_geoid = (
        "CASE WHEN substr(census_geoid, 1, 2) IN "
        "('MN','QN','BX','BK','SI') THEN census_geoid "
        "WHEN substr(census_geoid, 1, 2) = '79' "
        "THEN substr(census_geoid, length(census_geoid) - 3, 4) END"
    )
    labs_geotype = (
        "CASE geotype WHEN 'NTA' THEN 'NTA2010' ELSE geotype END"
    )

    return f"""
WITH g_tract AS (
  SELECT CAST(c_custkey % {N_TRACTS} AS BIGINT) AS gid,
         CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(c_custkey) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS s3
  FROM customer GROUP BY 1),
geo AS (
  SELECT '36047' || lpad(CAST(gid AS VARCHAR), 6, '0') AS census_geoid,
         'BK' || lpad(CAST(gid % 10 AS VARCHAR), 2, '0') AS nta,
         '7903' || lpad(CAST(gid % 5 AS VARCHAR), 2, '0') AS cd,
         gid, s1, s2, s3
  FROM g_tract),
colmap(cv, i) AS (VALUES
  {colmap}),
varmap(pff, cv) AS (VALUES
  {varmap}),
varattr(pff, domain, rnd, cls, pz, base, medbase) AS (VALUES
  {varattr}),
rawv AS (
  SELECT census_geoid, cv, {E_SQL} AS E_raw, {M_SQL} AS M_raw
  FROM (SELECT g.census_geoid, c.cv, c.i, g.s1, g.s2, g.s3,
               (g.s2 + (c.i + 1) * 7919) AS h
        FROM geo g CROSS JOIN colmap c)),
scrub AS (
  SELECT census_geoid, cv,
    CASE WHEN E_raw IN ({_S}) THEN NULL ELSE E_raw END AS E,
    CASE WHEN m0 IN ({_S}) THEN NULL ELSE m0 END AS M
  FROM (SELECT *, CASE WHEN E_raw IN ({_S}) THEN NULL
                       WHEN E_raw = 0 THEN 0.0
                       ELSE M_raw END AS m0
        FROM rawv) t1),
plain AS MATERIALIZED (
  SELECT census_geoid, v.pff,
    0.0 + sum(coalesce(E, 0.0)) AS e,
    sqrt(0.0 + sum(coalesce(M * M, 0.0))) AS m
  FROM scrub s JOIN varmap v ON s.cv = v.cv
  GROUP BY 1, 2),
{",".join(geo_ctes)},
asm AS ({" UNION ALL ".join(asm_parts)}),
withp AS (
  SELECT *,
    CASE pz WHEN 'med' THEN NULL
         WHEN 'p100' THEN 100.0
         WHEN 'base' THEN CASE WHEN agg_e = 0 THEN NULL
                               ELSE e / agg_e * 100 END
         WHEN 'medbase' THEN CASE WHEN mb_e = 0 THEN NULL
                                  ELSE e / mb_e * 100 END
         ELSE NULL END AS p
  FROM asm),
stats AS (
  SELECT geotype, census_geoid, pff AS pff_variable, domain, rnd,
    e, m, p,
    CASE pz WHEN 'base' THEN {z_base}
         WHEN 'medbase' THEN {z_medb}
         ELSE NULL END AS z,
    CASE WHEN e = 0 THEN NULL ELSE m / 1.645 / e * 100 END AS c
  FROM withp),
rounded AS (
  SELECT geotype, census_geoid, pff_variable, domain,
    ({_he("c", 1)}) + 0.0 AS c,
    ({em_round("e")}) + 0.0 AS e,
    ({em_round("m")}) + 0.0 AS m,
    ({_he("p", 1)}) + 0.0 AS p,
    ({_he("z", 1)}) + 0.0 AS z
  FROM stats),
t1 AS (
  SELECT geotype, census_geoid, pff_variable, domain,
    CASE WHEN c < 0 THEN NULL ELSE c END AS c,
    CASE WHEN e < 0 THEN NULL ELSE e END AS e,
    CASE WHEN m < 0 THEN NULL ELSE m END AS m,
    CASE WHEN p < 0 THEN NULL ELSE p END AS p,
    CASE WHEN z < 0 THEN NULL ELSE z END AS z
  FROM rounded),
t2 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m, CASE WHEN p > 100 THEN NULL ELSE p END AS p, z FROM t1),
t3 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m, p, CASE WHEN p IS NULL THEN NULL ELSE z END AS z FROM t2),
t4 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m, p, CASE WHEN p = 100 THEN 0.0 ELSE z END AS z FROM t3),
t6 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m,
  CASE WHEN pff_variable IN ({_inlist(bases)})
        AND pff_variable NOT IN ({_inlist(medians)})
       THEN 100.0 ELSE p END AS p,
  CASE WHEN pff_variable IN ({_inlist(bases)})
        AND pff_variable NOT IN ({_inlist(medians)})
       THEN 0.0 ELSE z END AS z
  FROM t4),
t7 AS (SELECT geotype, census_geoid, pff_variable, domain,
  CASE WHEN {t7_rule} THEN NULL ELSE c END AS c, e,
  CASE WHEN {t7_rule} THEN NULL ELSE m END AS m,
  CASE WHEN {t7_rule} THEN NULL ELSE p END AS p,
  CASE WHEN {t7_rule} THEN NULL ELSE z END AS z
  FROM t6),
t8 AS (SELECT geotype, census_geoid, pff_variable, domain,
  c, e, m,
  CASE WHEN {t8_rule} THEN NULL ELSE p END AS p,
  CASE WHEN {t8_rule} THEN NULL ELSE z END AS z
  FROM t7)
SELECT census_geoid,
  {labs_geoid} AS labs_geoid,
  geotype,
  {labs_geotype} AS labs_geotype,
  pff_variable,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE c END AS c,
  e,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE m END AS m,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE p END AS p,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE z END AS z,
  domain
FROM t8 ORDER BY geotype, pff_variable, census_geoid
"""


def decennial_2010_full_oracle_sql() -> str:
    """DuckDB twin of the q380 grid — the full 25-variable decennial
    2010 catalog over native tract/borough/city (2010 labs labels) plus
    the 2010 geography's every aggregated geotype (NTA, cd, and the
    three block-grain cd zone rollups), in one result."""
    nat = full_catalog_oracle_sql(
        "decennial", 2010, ["tract", "borough", "city"], labs_vintage="2010"
    )
    agg = decennial_2010_agg_oracle_sql(
        ("NTA", "cd", "cd_fp_100", "cd_fp_500", "cd_park_access")
    )
    assert nat.rstrip().endswith(PROD_ORDER) and agg.rstrip().endswith(
        PROD_ORDER
    )
    strip = lambda q: q.rstrip()[: -len(PROD_ORDER)]  # noqa: E731
    return (
        f"SELECT * FROM ({strip(nat)})\nUNION ALL\n"
        f"SELECT * FROM ({strip(agg)})\n{PROD_ORDER}"
    )


def fixture_root(sf_dir: str, source: str, year: int) -> str:
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{source}|{year}|v{SPEC_VERSION}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(),
                        f"spark_graft_wide_{source}{year}_{key}")


def ensure_fixture(sf_dir: str, source: str, year: int) -> str:
    """Write (once) the synthetic wide parquet per native geotype and
    return the source root for ``ParquetWideSource``."""
    root = fixture_root(sf_dir, source, year)
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)
    meta = load_meta(source, year)
    cols = census_cols(meta)
    pcols = set(profile_cols(meta, source))
    for geotype, (parts, s1, s2, s3) in geo_tables(sf_dir).items():
        data: dict[str, pa.Array] = {
            k: pa.array(v, pa.string()) for k, v in parts.items()
        }
        for i, cv in enumerate(cols):
            e, m, pe, pm = raw_values_np(i, s1, s2, s3)
            if cv[0] == "P":  # decennial raw column: no E/M suffix
                data[cv] = pa.array(e, pa.float64())
                continue
            data[f"{cv}E"] = pa.array(e, pa.float64())
            data[f"{cv}M"] = pa.array(m, pa.float64())
            if cv in pcols:
                data[f"{cv}PE"] = pa.array(pe, pa.float64())
                data[f"{cv}PM"] = pa.array(pm, pa.float64())
        fname = geotype.replace(" ", "_")
        pq.write_table(pa.table(data), os.path.join(root, f"{fname}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return root
