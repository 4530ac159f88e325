"""Set-based full-catalog batch planner — the grid-scale complement to
``FactFinderEngine.calculate_batch``.

The reference's production run computes ~1,040 variables × 5-6 geotypes
through a 10-process pool, one API download + pandas pipeline per task
(reference pipelines/acs.py:36-63).  ``calculate_batch``
(planner.py:337) replicates that shape as a union of per-variable lazy
plans — right for tens of variables, wrong for the whole catalog: a
1,047-branch union pays Catalyst analysis per branch and one source
scan per (variable, geotype), and a measured prototype that kept one
*column expression* per variable instead still spent minutes in
analysis (1,047 statistic expressions over a 2,874-column schema).

The shape that scales is the classic melt: per geotype,

    one scan → ``stack`` the wide row to (census column, E, M, PE, PM)
    long form (a single generated expression, parsed JVM-side) →
    column-local sentinel scrub → broadcast-join the driver-built
    (variable, census column) mapping → ONE groupBy (geoid, variable)
    computing the horizontal e/m → broadcast varattr + keyed
    self-joins of that one aggregated frame for base / poverty-twin /
    wrkrnothm values → shared p/z/c, rounding, cleaning, labs tail.

One source scan per geotype (vs 1,047), one shuffle (the horizontal
fold), and base variables are *reused through a self-join of the single
aggregated frame* instead of recomputed per dependent — the set-based
analog of the per-variable path's memoized base plans.  The catalog
never ships as data beyond the two tiny broadcast mappings; at 100 TB
the cost is the scan plus the catalog fan-out, which is the output's
own size.  Plan-audited in tests/test_catalog_batch.py.

Semantics parity is per-branch with reference calculate.py:198-291
(branch order: profile-only → median → special/plain with
poverty-twin / base / nan p-z; 'rate'-based tasks drop like the
reference pool's isolated failures) and is pinned by the stratified
equivalence test against ``FactFinderEngine.__call__``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.functions.geoid import make_census_geoid
from db_factfinder_spark.functions.stats import (
    OUTLIER_SENTINELS,
    get_c,
    get_p,
    get_z,
)
from db_factfinder_spark.operators.cleaning import cleaning
from db_factfinder_spark.plans.planner import POVERTY_VARIABLES
from db_factfinder_spark.sources.readers import CONTROLLED

def _null() -> Column:
    return F.lit(None).cast("double")


def calculate_batch_catalog(
    engine,
    geotypes: list[str],
    variables: list[str] | None = None,
    tag_domain: bool = True,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """One set-based lazy plan for (``variables`` × ``geotypes``) —
    result-identical to looping ``engine(var, geotype)`` +
    ``unionByName`` (equivalence pinned in tests/test_catalog_batch).

    Every registered rollup is supported set-based: native geotypes,
    the tract-sourced 2020 rollups (NTA / CDTA / CT20 —
    ``_aggregated_2020_frames``), the 2020 block-group zone rollups
    (cdta_fp_100 / cdta_fp_500 / cdta_park_access — ``_zone_frames``),
    and — since r10 — the 2010 geography's direct tract→NTA/cd
    rollups (``_aggregated_2010_frames``) and its cd zone rollups
    (block grain for decennial, block-group for acs).  The one
    rejection left is semantic, not a path gap: decennial on the
    2010_to_2020 geography, where the reference registers no rollups
    at all (2010_to_2020.py:200-219).

    ``checkpoint_mode`` (``llmdata.checkpointing`` policy) governs the
    aggregated-geotype frame: the rolled-up (geoid, variable, e, m)
    frame feeds ~22 downstream branches (10 grouped medians, 10
    special formulas, base/median-base self-joins), and without
    lineage truncation every branch re-embeds the melt→fold→crosswalk
    subtree — the driver then pays 22× the plan in Catalyst
    analysis/canonicalization memory (measured: OOMs a default-1g
    driver; a production 100 TB driver hits the same wall at larger
    heaps).  ``"local"`` truncates via ``localCheckpoint`` (single-JVM
    / static cluster), ``"reliable"`` via the checkpoint directory
    (dynamic-allocation clusters), ``"none"`` keeps the pure lazy plan
    (plan-inspection tests)."""
    aggregated = set(engine.geo.aggregated_geography)
    is_2010 = getattr(engine.geo, "name", "") == "2010"
    agg_dim = AGG2010_DIM if is_2010 else AGG2020_DIM
    zone_dim = ZONE2010_DIM if is_2010 else ZONE2020_DIM
    bad = [
        g
        for g in geotypes
        if g in aggregated and g not in agg_dim and g not in zone_dim
    ]
    if bad:
        raise NotImplementedError(
            f"calculate_batch_catalog: aggregated geotypes {bad} take "
            "the per-variable rollup path (calculate_batch)"
        )
    zone_geos = [g for g in geotypes if g in zone_dim and g in aggregated]
    agg_geos = [
        g for g in geotypes if g in aggregated and g not in zone_dim
    ]
    native_geos = [g for g in geotypes if g not in aggregated]
    cat, spark = engine.catalog, engine.spark
    # cache hygiene: every persisted frame this batch creates is
    # registered on the engine so a long-lived session (bench loops,
    # repeated production runs) can free them after the sink action —
    # Spark's CacheManager holds strong refs, so un-unpersisted batch
    # caches accumulate across calls
    if not hasattr(engine, "_batch_caches"):
        engine._batch_caches = []
    all_vars = [m["pff_variable"] for m in cat.metadata]
    vars_ = list(variables) if variables is not None else all_vars
    # classification and the two broadcast mappings are geotype-
    # independent at native grain — build them once per batch
    attr = _classify(cat, vars_)
    varmap = spark.createDataFrame(
        [
            (m["pff_variable"], cv)
            for m in cat.metadata
            for cv in m["census_variable"]
        ],
        "pff string, cv string",
    )
    varattr = spark.createDataFrame(
        attr,
        "pff string, domain string, rnd int, cls string, pz string,"
        " base string, twin string, prof_cv string",
    )
    frames = []
    shared_tract = None
    if native_geos:
        native_out, native_agg = _native_frames(
            engine, native_geos, attr, varmap, varattr, tag_domain
        )
        # the persisted frame (the role fold) is registered inside
        # _native_frames; native_agg is a projection of it
        frames.append(native_out)
        if "tract" in native_geos and agg_geos:
            # the aggregated chain's tract fold is value-identical to
            # the native fold's tract slice (integer-exact sums, no
            # controlled masking at tract, no PE/PM in the fold;
            # decennial margins fold to 0.0 either way) — reuse the
            # persisted native fold so the production grid scans the
            # tract wide table ONCE, not once per half
            shared_tract = native_agg.filter(
                F.col("geotype") == "tract"
            ).select("census_geoid", "pff", "e", "m")
    if agg_geos:
        agg_fn = _aggregated_2010_frames if is_2010 else _aggregated_2020_frames
        frames += agg_fn(
            engine, agg_geos, vars_, varmap, tag_domain, checkpoint_mode,
            agg_tract=shared_tract,
        )
    if zone_geos:
        if not is_2010 and cat.source != "acs":
            # the 2010_to_2020 registry returns NO rollup options for
            # decennial (reference 2010_to_2020.py:200-219) — zone
            # geotypes included; mirror the dimension path's rejection
            raise NotImplementedError(
                "set-based batch: the 2010_to_2020 geography registers "
                "no decennial zone rollups (2010_to_2020.py:200-219)"
            )
        # the 2010 registry rolls zones up from the BLOCK grain for
        # decennial and the block-group grain for acs
        # (reference geography/2010.py:186-205, 2010_to_2020.py:200-219)
        if is_2010 and cat.source == "decennial":
            grain, grain_col = "block", "geoid_block"
        else:
            grain, grain_col = "block group", "geoid_block_group"
        frames += _zone_frames(
            engine, zone_geos, vars_, varmap, tag_domain, checkpoint_mode,
            zone_dims=zone_dim, grain_geotype=grain, grain_col=grain_col,
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _classify(cat, variables):
    """Driver-side per-variable attributes (native-geotype branch order
    of calculate.py:198-291).  Returns rows
    (pff, domain, rounding, cls, pz, base, twin, prof_cv); variables
    whose base is missing from the catalog drop like the reference's
    isolated task failures."""
    meta_by = {m["pff_variable"]: m for m in cat.metadata}
    po = set(cat.profile_only_variables)
    medians = set(cat.median_variables)
    bases = set(cat.base_variables)
    rows = []
    for pff in variables:
        m = meta_by.get(pff)
        if m is None:
            continue  # unknown variable — task isolation parity
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
                if pff in POVERTY_VARIABLES and cat.year != 2010:
                    if f"{pff}_pct" not in meta_by:
                        continue
                    pz, twin = "pov", f"{pff}_pct"
                elif base != "nan":
                    if base not in meta_by:
                        continue  # 'rate' base — dropped task
                    pz, b = "base", base
            else:
                pz = "p100"
        rows.append((pff, dom, rnd, cls, pz, b, twin, pcv))
    return rows


def _stack_expr(cvs: list[str], prof_cvs: set[str]) -> str:
    """One ``stack`` over every census column → long (cv, E, M, PE,
    PM).  Generated as a single SQL string so the 1,100-column fan-out
    is parsed JVM-side instead of built expression-by-expression over
    py4j (measured: minutes → milliseconds)."""
    null = "CAST(NULL AS DOUBLE)"
    parts = []
    for cv in cvs:
        if cv[0] == "P":  # decennial raw column
            parts.append(f"'{cv}', CAST({cv} AS DOUBLE), {null}, {null}, {null}")
        else:
            pe = f"CAST({cv}PE AS DOUBLE)" if cv in prof_cvs else null
            pm = f"CAST({cv}PM AS DOUBLE)" if cv in prof_cvs else null
            parts.append(
                f"'{cv}', CAST({cv}E AS DOUBLE), CAST({cv}M AS DOUBLE), "
                f"{pe}, {pm}"
            )
    return (
        f"stack({len(cvs)}, " + ", ".join(parts)
        + ") AS (cv, E_raw, M_raw, PE_raw, PM_raw)"
    )


def _sentinel_null(c: Column) -> Column:
    return F.when(c.isin(OUTLIER_SENTINELS), _null()).otherwise(c)


def _native_frames(
    engine, geotypes: list[str], attr, varmap, varattr, tag_domain: bool
) -> tuple[DataFrame, DataFrame]:
    """All native geotypes in ONE plan: the per-geotype scans union
    under a ``geotype`` tag before the melt, so the 2,874-column stack
    is code-generated once and the horizontal fold is one shuffle keyed
    (geotype, geoid, variable) instead of one chain per geotype —
    measured ~2× on both driver plan-build and execution for the
    3-geotype production grid.  Geotype-conditional semantics (the
    city/borough CONTROLLED-margin zeroing, the median p=100 rule)
    ride as expressions on the tag column, value-identical to the
    per-geotype branches (pinned by the stratified equivalence
    tests).

    Assembly (r11): every value the tail needs — the variable's own
    e/m, its base's, its poverty twin's, the two wrkrnothm inputs, the
    profile passthrough — is folded in the ONE groupBy by tagging each
    melt row with the (consumer variable, role) pairs it feeds (a
    driver-built broadcast mapping, the same place the old
    (variable, census column) map lived).  The pre-r11 shape computed
    the plain fold and then re-attached base/twin/profile values with
    keyed SELF-JOINS of the output-sized frames: 5 sort-merge joins +
    a separate unit-spine scan, 8 exchanges, and ~16 sequential AQE
    jobs per execution (measured; the joins were byte-cheap but
    stage-latency-expensive locally and output-sized shuffles at 100 TB
    — optimization guide §2.4 "remove shuffles outright", §3.3).  Now
    the melt join fans each census column to every consumer that reads
    it (~1.9× the fold input rows — still melt-sized, never
    output-sized), and everything after the fold is one broadcast
    varattr join + pure column expressions in the fold's own stage:
    zero post-fold exchanges, one persisted frame instead of two.
    Variables with no census columns and no lookup inputs (decennial
    placeholders) keep their e = Σ∅ = 0.0 rows via an explicit pad
    union — the only remaining use of the unit spine."""
    cat = engine.catalog
    source = cat.source
    meta = cat.metadata
    cvs = sorted({cv for m in meta for cv in m["census_variable"]})
    prof_cvs = {pcv for (*_, pcv) in attr if pcv}

    # prune each scan to census_geoid + referenced census columns so
    # differing geo-part schemas can't block the union (and the union
    # column-prunes down to exactly what the melt reads)
    needed: list[str] = []
    for cv in cvs:
        if cv[0] == "P":
            needed.append(cv)
        else:
            needed += [f"{cv}E", f"{cv}M"]
            if cv in prof_cvs:
                needed += [f"{cv}PE", f"{cv}PM"]
    # selectExpr ships the ~5,700 projection names as ONE string list
    # (a plain select would create one py4j Column per name — measured
    # ~5 s of gateway round-trips at catalog width)
    raw = None
    for g in geotypes:
        r = make_census_geoid(engine.source._read(g), g).selectExpr(
            f"'{g}' AS geotype",
            "census_geoid",
            *[f"`{c}`" for c in needed],
        )
        raw = r if raw is None else raw.unionByName(r)

    # ---- melt + column-local scrub (download.py:74-87,123-140) ------
    long = raw.selectExpr(
        "geotype", "census_geoid", _stack_expr(cvs, prof_cvs)
    )
    e0 = F.col("E_raw")
    # plain-path M (E==0 → 0; E sentinel → NULL — disjoint conditions,
    # same result as scrub_wide's sequential masking)
    m0 = (
        F.when(e0.isin(OUTLIER_SENTINELS), _null())
        .when(e0 == 0, F.lit(0.0))
        .otherwise(F.col("M_raw"))
    )
    pm0 = F.col("PM_raw")
    is_ctrl = F.col("geotype").isin("city", "borough")
    m0 = F.when(is_ctrl & m0.isin(CONTROLLED), F.lit(0.0)).otherwise(m0)
    pm0 = F.when(is_ctrl & pm0.isin(CONTROLLED), F.lit(0.0)).otherwise(pm0)
    scrub = long.select(
        "geotype",
        "census_geoid",
        "cv",
        _sentinel_null(e0).alias("E"),
        _sentinel_null(m0).alias("M"),
        _sentinel_null(F.col("PE_raw")).alias("PPE"),
        _sentinel_null(pm0).alias("PPM"),
    )  # read exactly once (the role fold below) — no cache needed

    # ---- role map: (consumer variable, census column, role) ---------
    # 'self' covers the FULL catalog (the shared tract fold the
    # aggregated chain slices must match the old varmap fold exactly);
    # lookup roles (base / twin / prof / w / cw) cover the REQUESTED
    # variables (attr).  Variables with neither census columns nor
    # lookup inputs — decennial placeholders — are padded explicitly so
    # their e = Σ∅ = 0.0 rows survive (calculate.py:92-107).
    meta_by = {m["pff_variable"]: m for m in meta}
    role_rows: list[tuple[str, str, str]] = []
    for mm in meta:
        for mcv in mm["census_variable"]:
            role_rows.append((mm["pff_variable"], mcv, "self"))
    pads: list[str] = []
    for pff, _dom, _rnd, acls, _pz, base, twin, pcv in attr:
        n_lookup = 0
        if base:
            for mcv in meta_by[base]["census_variable"]:
                role_rows.append((pff, mcv, "base"))
                n_lookup += 1
        if twin:
            for mcv in meta_by[twin]["census_variable"]:
                role_rows.append((pff, mcv, "twin"))
                n_lookup += 1
        if pcv:
            role_rows.append((pff, pcv, "prof"))
            n_lookup += 1
        if acls == "wrk":
            for name, role in (("wrkr16pl", "w"), ("cw_wrkdhm", "cw")):
                for mcv in meta_by.get(name, {}).get("census_variable", []):
                    role_rows.append((pff, mcv, role))
                    n_lookup += 1
        if not meta_by[pff]["census_variable"] and n_lookup == 0:
            pads.append(pff)
    rolemap = engine.spark.createDataFrame(
        role_rows, "pff string, cv string, role string"
    )

    # ---- horizontal fold: ONE shuffle on (geotype, geoid, variable) --
    # Conditional sums are NULL when a group has no rows of that role —
    # exactly the old left-join-miss NULLs.  e sums carry the fold's
    # `0.0 +` head (canonicalizes -0.0); m stays as the squared sum so
    # the tail can apply the identical sqrt(0.0 + Σ) shape.
    role = F.col("role")
    colE, colM = F.col("E"), F.col("M")

    def _se(rname: str) -> Column:
        return F.lit(0.0) + F.sum(
            F.when(role == rname, F.coalesce(colE, F.lit(0.0)))
        )

    def _sm(rname: str) -> Column:
        return F.sum(
            F.when(role == rname, F.coalesce(colM * colM, F.lit(0.0)))
        )

    fold = (
        scrub.join(F.broadcast(rolemap), "cv")
        .groupBy("geotype", "census_geoid", "pff")
        .agg(
            _se("self").alias("e_self"),
            _sm("self").alias("msq_self"),
            _se("base").alias("e_base"),
            _sm("base").alias("msq_base"),
            _se("twin").alias("e_twin"),
            _sm("twin").alias("msq_twin"),
            _se("w").alias("e_w"),
            _sm("w").alias("msq_w"),
            _se("cw").alias("e_cw"),
            _sm("cw").alias("msq_cw"),
            F.max(F.when(role == "prof", colE)).alias("pr_e"),
            F.max(F.when(role == "prof", colM)).alias("pr_m"),
            F.max(F.when(role == "prof", F.col("PPE"))).alias("pr_p"),
            F.max(F.when(role == "prof", F.col("PPM"))).alias("pr_z"),
        )
        .persist()  # read twice: the assembly tail + the shared tract
        # slice the aggregated chain reuses (one wide scan per batch)
    )
    engine._batch_caches.append(fold)

    # the shared plain fold — value-identical to the old varmap fold:
    # a group has self rows iff the variable has census columns, and
    # e_self/msq_self sum exactly the old per-(geoid, variable) rows
    agg = fold.filter(F.col("e_self").isNotNull()).select(
        "geotype",
        "census_geoid",
        "pff",
        F.col("e_self").alias("e"),
        F.sqrt(F.lit(0.0) + F.col("msq_self")).alias("m"),
    )

    # ---- assembly: pad union + broadcast varattr + pure expressions --
    body = fold
    if pads:
        pad_geo = raw.select("geotype", "census_geoid")
        pad_pff = F.broadcast(
            engine.spark.createDataFrame([(p,) for p in pads], "pff string")
        )
        body = body.unionByName(
            pad_geo.crossJoin(pad_pff).withColumns(
                {
                    c: _null()
                    for c in (
                        "e_self", "msq_self", "e_base", "msq_base",
                        "e_twin", "msq_twin", "e_w", "msq_w", "e_cw",
                        "msq_cw", "pr_e", "pr_m", "pr_p", "pr_z",
                    )
                }
            )
        )
    df = body.join(F.broadcast(varattr), "pff")

    empty_m = (
        _null() if source == "decennial" else F.lit(0.0)  # hmoe([]) = √0
    )
    if source == "decennial":
        # the old path nulled the fold's m for self/base/twin reads
        # (agg_side); wrkrnothm reads stayed raw (ACS-only in practice)
        m_self, agg_m, tw_m = _null(), _null(), _null()
    else:
        m_self = F.sqrt(F.lit(0.0) + F.col("msq_self"))
        agg_m = F.sqrt(F.lit(0.0) + F.col("msq_base"))
        tw_m = F.sqrt(F.lit(0.0) + F.col("msq_twin"))
    e_fold = F.coalesce(F.col("e_self"), F.lit(0.0))
    m_fold = F.coalesce(m_self, empty_m)
    agg_e, tw_e = F.col("e_base"), F.col("e_twin")
    w_e, cw_e = F.col("e_w"), F.col("e_cw")
    w_m = F.sqrt(F.lit(0.0) + F.col("msq_w"))
    cw_m = F.sqrt(F.lit(0.0) + F.col("msq_cw"))

    cls = F.col("cls")
    e = (
        F.when(cls == "prof", F.col("pr_e"))
        .when(cls == "wrk", w_e - cw_e)
        .otherwise(e_fold)
    )
    m = (
        F.when(cls == "prof", F.col("pr_m"))
        .when(cls == "wrk", F.sqrt(w_m * w_m + cw_m * cw_m))
        .otherwise(m_fold)
    )
    pz = F.col("pz")
    p = (
        F.when(pz == "prof", F.col("pr_p"))
        .when(pz == "med", F.when(is_ctrl, F.lit(100.0)).otherwise(_null()))
        .when(pz == "pov", tw_e)
        .when(pz == "p100", F.lit(100.0))
        .when(pz == "base", get_p(e, agg_e))
        .otherwise(_null())
    )
    z = (
        F.when(pz == "prof", F.col("pr_z"))
        .when(pz == "pov", tw_m)
        .when(pz == "base", get_z(e, m, p, agg_e, agg_m))
        .otherwise(_null())
    )
    c = get_c(e, m)

    def _round_em(x: Column) -> Column:
        rnd = F.col("rnd")
        # + 0.0 canonicalizes IEEE -0.0 → +0.0 (identity elsewhere,
        # NULL-preserving): m=0 over a negative fold gives c = -0.0 on
        # one accumulation path and +0.0 on another, and a value-hash
        # distinguishes the two renderings.
        return (
            F.when(rnd == 1, F.bround(x, 1))
            .when(rnd == 2, F.bround(x, 2))
            .otherwise(F.bround(x, 0))
        ) + F.lit(0.0)

    stats = df.select(
        "census_geoid",
        "geotype",
        F.col("pff").alias("pff_variable"),
        "domain",
        (F.bround(c, 1) + F.lit(0.0)).alias("c"),
        _round_em(e).alias("e"),
        _round_em(m).alias("m"),
        (F.bround(p, 1) + F.lit(0.0)).alias("p"),
        (F.bround(z, 1) + F.lit(0.0)).alias("z"),
    )

    cleaned = cleaning(
        stats,
        cat.base_variables,
        cat.median_variables,
        cat.special_variables,
        cat.median_inputs,
    )
    out = cleaned.select(
        "census_geoid",
        engine.geo.format_geoid("census_geoid").alias("labs_geoid"),
        "geotype",
        engine.geo.format_geotype("geotype").alias("labs_geotype"),
        "pff_variable",
        "c",
        "e",
        "m",
        "p",
        "z",
        *(["domain"] if tag_domain else []),
    )
    # the persisted horizontal fold rides along so the caller can
    # share the tract slice with the aggregated chain (one tract scan)
    return out, agg


# ---------------------------------------------------------------------------
# aggregated geotypes on the 2010→2020 geography (tract-sourced rollups)
# ---------------------------------------------------------------------------

# output geotype → lookup dimension column (None = stop at CT20)
AGG2020_DIM = {"NTA": "nta2020", "CDTA": "cdta2020", "CT20": None}

# block-group zone rollups (flood-plain / park-access): output geotype
# → prepared-lookup zone column (prepare_lookup_geo gates the zone code
# on the flag, so a NULL filter is the flag filter)
ZONE2020_DIM = {
    "cdta_fp_100": "cdta_fp_100",
    "cdta_fp_500": "cdta_fp_500",
    "cdta_park_access": "cdta_park_access",
}

# 2010-geography tract-sourced rollups (reference geography/2010.py:
# 55-65, 171-205): output geotype → lookup dimension column.  Unlike
# the 2020 registry there is NO crosswalk hop — tracts join the
# dimension directly, for BOTH sources (acs and decennial).
AGG2010_DIM = {"NTA": "nta", "cd": "cd"}

# 2010-geography CD zone rollups (reference geography/2010.py:67-169):
# block grain for decennial, block-group grain for acs — the grain is
# chosen by the caller; the prepared-lookup zone columns are shared
ZONE2010_DIM = {
    "cd_fp_100": "cd_fp_100",
    "cd_fp_500": "cd_fp_500",
    "cd_park_access": "cd_park_access",
}


def _classify_aggregated(cat, variables):
    """Per-variable attributes at an AGGREGATED geotype (the other
    branch ordering of calculate.py:198-291: profile-only does NOT
    apply, medians take the grouped-median algorithm, every special
    takes its formula, poverty twins take the plain base join).
    Returns (pff, domain, rounding, cls, pz, base, medbase) with
    cls ∈ {plain, med, spec} and pz ∈ {med, p100, base, medbase,
    none}.  A special whose base is itself special rolls back to the
    base's PLAIN e/m — the reference computes the special base then
    unconditionally overwrites it (calculate.py:248-259)."""
    meta_by = {m["pff_variable"]: m for m in cat.metadata}
    medians = set(cat.median_variables)
    specials = set(cat.special_variables)
    bases = set(cat.base_variables)
    rows = []
    for pff in variables:
        m = meta_by.get(pff)
        if m is None:
            continue
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
                    if base not in meta_by:
                        continue  # dropped task (missing base)
                    if base in medians:
                        pz, mb = "medbase", base
                    else:
                        pz, b = "base", base
            else:
                pz = "p100"
        rows.append((pff, dom, rnd, cls, pz, b, mb))
    return rows


def _tract_fold(engine, varmap, cvs) -> DataFrame:
    """tract-grain melt + scrub + horizontal fold — the aggregated
    chain's source frame when no native batch fold is shared."""
    raw = make_census_geoid(engine.source._read("tract"), "tract")
    long = raw.selectExpr("census_geoid", _stack_expr(cvs, set()))
    e0 = F.col("E_raw")
    m0 = (
        F.when(e0.isin(OUTLIER_SENTINELS), _null())
        .when(e0 == 0, F.lit(0.0))
        .otherwise(F.col("M_raw"))
    )
    scrub = long.select(
        "census_geoid",
        "cv",
        _sentinel_null(e0).alias("E"),
        _sentinel_null(m0).alias("M"),
    )
    return (
        scrub.join(F.broadcast(varmap), "cv")
        .groupBy("census_geoid", "pff")
        .agg(
            (F.lit(0.0) + F.sum(F.coalesce(F.col("E"), F.lit(0.0)))).alias("e"),
            F.sqrt(
                F.lit(0.0)
                + F.sum(F.coalesce(F.col("M") * F.col("M"), F.lit(0.0)))
            ).alias("m"),
        )
    )


def _aggregated_2020_frames(
    engine,
    geotypes: list[str],
    variables,
    varmap,
    tag_domain: bool,
    checkpoint_mode: str = "local",
    agg_tract: DataFrame | None = None,
) -> list[DataFrame]:
    """Set-based full-catalog batch at the aggregated 2020 geotypes.

    Pipeline (mirrors tract_to_dimension / ct2010_to_ct2020 per
    variable — vertical.py:49-100 — but multi-variable and
    multi-geotype):

        tract melt-agg (one scan, one fold shuffle) → broadcast ratio
        right-join + convert_moe + bround16 → CT20 fold [MATERIALIZED
        ONCE, shared by every requested geotype] → per geotype:
        broadcast dimension join + output fold [materialized] →
        grouped medians (ONE shared bin pivot feeding all 10 specs,
        prebuilt median structs reused across geotypes) → special
        formulas (ONE shared member pivot; topologically ordered —
        mntrvtm consumes wrkrnothm's special values like
        calculate_e_m_multi's recursion) → base / median-base p-z
        joins → shared rounding/cleaning/labs tail.

    Driver-cost notes (measured at catalog size): the melt→fold→
    crosswalk chain is planned and executed ONCE for all geotypes
    (sharing the materialized CT20 frame), the ~26-bin median structs
    are built once and reused (they are unresolved expressions over
    bin names), and the median/special inputs pivot once per geotype
    instead of once per variable — 20 pivot shuffles collapse to 2.

    Contract note: the set-based right join reproduces the
    per-variable ratio semantics exactly when every crosswalk source
    tract has source rows (a factless tract would need fan-out to
    every variable); the synthetic fixtures guarantee it and the
    per-variable path remains for sparser crosswalks."""
    from db_factfinder_spark.functions.stats import (
        agg_moe,
        convert_moe,
        sum_skipna,
    )
    from db_factfinder_spark.llmdata.checkpointing import materialize
    from db_factfinder_spark.operators.median import median_struct

    cat = engine.catalog
    spark = engine.spark
    if cat.source != "acs":
        raise NotImplementedError(
            "aggregated set-based batch: acs source only (the 2010_to_"
            "2020 geography registers no decennial rollups)"
        )
    attr = _classify_aggregated(cat, variables)
    varattr = spark.createDataFrame(
        attr,
        "pff string, domain string, rnd int, cls string, pz string,"
        " base string, medbase string",
    )
    meta = cat.metadata
    cvs = sorted({cv for m in meta for cv in m["census_variable"]})

    def _mat(df: DataFrame) -> DataFrame:
        # persist caches DATA but leaves every downstream branch
        # re-embedding the full plan (the ~22-branch fan-out then OOMs
        # a small driver in Catalyst canonicalization) — default is
        # lineage truncation per the checkpoint_mode policy.
        if checkpoint_mode == "none":
            cached = df.persist()
            getattr(engine, "_batch_caches", []).append(cached)
            return cached
        return materialize(df, checkpoint_mode)

    # ---- tract-grain melt + scrub + horizontal fold (ONCE) ----------
    # (skipped entirely when the caller shares the native batch's
    # persisted tract fold — value-identical slice, one tract scan for
    # the whole production grid)
    if agg_tract is None:
        agg_tract = _tract_fold(engine, varmap, cvs)

    # ---- vertical: ratio right-join → CT20 fold (ONCE, shared) ------
    ratio = engine.geo.ratio
    j = agg_tract.join(
        F.broadcast(ratio),
        agg_tract["census_geoid"] == ratio["geoid_ct2010"],
        "right",
    )
    e2 = F.col("e") * F.col("ratio")
    m2 = convert_moe(F.col("e"), F.col("m"), e2, F.col("ratio"))
    scaled = j.select(
        "geoid_ct2020",
        "pff",
        F.bround(e2, 16).alias("e"),
        F.bround(m2, 16).alias("m"),
    )
    ct20_plan = scaled.groupBy(
        F.col("geoid_ct2020").alias("census_geoid"), "pff"
    ).agg(sum_skipna("e").alias("e"), agg_moe("m").alias("m"))

    # Driver-side build cost is py4j round-trips + Catalyst analysis —
    # all JVM-blocking, so independent pieces OVERLAP on threads (the
    # officially-supported multi-threaded-driver pattern; each thread
    # gets its own gateway connection, and Column objects are immutable
    # unresolved expressions).  Measured: the ct20 checkpoint planning
    # (~10 s: analysis of the 2,874-column stack) hides the ~6 s median
    # -struct build, and the per-geotype assemblies (~7 s each) overlap
    # each other — ~34 s serial → ~20 s.
    med_specs = {mv: cat.median_spec(mv) for mv in cat.median_variables}

    def _build_structs():
        return {
            mv: median_struct(spec, [F.col(v) for v in spec.input_variables])
            for mv, spec in med_specs.items()
        }

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        f_ct20 = ex.submit(_mat, ct20_plan)
        f_structs = ex.submit(_build_structs)
        ct20 = f_ct20.result()
        med_structs = f_structs.result()
    with ThreadPoolExecutor(max(1, len(geotypes))) as ex:
        return list(
            ex.map(
                lambda g: _one_aggregated_geotype(
                    engine, g, attr, varattr, ct20, med_specs,
                    med_structs, tag_domain, _mat,
                ),
                geotypes,
            )
        )


def _one_aggregated_geotype(
    engine,
    geotype: str,
    attr,
    varattr,
    ct20: DataFrame,
    med_specs,
    med_structs,
    tag_domain: bool,
    _mat,
) -> DataFrame:
    """One aggregated geotype's frame over the shared materialized CT20
    rollup (see ``_aggregated_2020_frames``)."""
    from db_factfinder_spark.functions.stats import agg_moe, sum_skipna

    dim_col = AGG2020_DIM[geotype]
    if dim_col is not None:
        dim = engine.geo.lookup.select("geoid_tract", dim_col).distinct()
        agg2 = _mat(
            ct20.join(
                F.broadcast(dim),
                ct20["census_geoid"] == dim["geoid_tract"],
                "left",
            )
            .filter(F.col(dim_col).isNotNull())
            .groupBy(F.col(dim_col).alias("census_geoid"), "pff")
            .agg(sum_skipna("e").alias("e"), agg_moe("m").alias("m"))
        )
    else:
        agg2 = ct20  # already materialized by the caller
    return _aggregated_assembly(
        engine, geotype, attr, varattr, agg2, med_specs, med_structs,
        tag_domain, _mat=_mat,
    )


def _aggregated_2010_frames(
    engine,
    geotypes: list[str],
    variables,
    varmap,
    tag_domain: bool,
    checkpoint_mode: str = "local",
    agg_tract: DataFrame | None = None,
) -> list[DataFrame]:
    """Set-based full-catalog batch at the 2010 geography's
    tract-sourced rollups (NTA / cd — reference geography/2010.py:
    55-65, 171-205).  Unlike the 2020 chain there is no crosswalk hop:

        tract melt-agg (one scan, one fold shuffle — or the shared
        native tract fold) [MATERIALIZED ONCE, shared by every
        requested geotype] → per geotype: broadcast dimension join +
        dimension fold, LEFT-joined onto a (unit × variable) spine so
        catalog variables with EMPTY census-column lists (the
        decennial placeholders) keep e=0 rows at the rollup grain
        exactly like the per-variable ``tract_to_dimension_2010`` over
        ``load_e_m``'s all-rows frame → the shared aggregated assembly
        tail (grouped medians / specials when the catalog has them —
        the decennial sidecars are empty and the branch sets
        degenerate cleanly, the q378 pin).

    Works for BOTH sources: decennial margins are NULL at tract grain
    and the NaN→0 ``agg_moe`` turns them into 0.0 at the dimension —
    identical to the batch fold's √Σcoalesce(m²,0) = 0.0 over the
    all-NULL melt margins of raw P-columns."""
    from concurrent.futures import ThreadPoolExecutor

    from db_factfinder_spark.functions.stats import agg_moe, sum_skipna
    from db_factfinder_spark.llmdata.checkpointing import materialize
    from db_factfinder_spark.operators.median import median_struct

    cat = engine.catalog
    spark = engine.spark
    attr = _classify_aggregated(cat, variables)
    varattr = spark.createDataFrame(
        attr,
        "pff string, domain string, rnd int, cls string, pz string,"
        " base string, medbase string",
    )
    meta = cat.metadata
    cvs = sorted({cv for m in meta for cv in m["census_variable"]})

    def _mat(df: DataFrame) -> DataFrame:
        if checkpoint_mode == "none":
            cached = df.persist()
            getattr(engine, "_batch_caches", []).append(cached)
            return cached
        return materialize(df, checkpoint_mode)

    med_specs = {mv: cat.median_spec(mv) for mv in cat.median_variables}

    def _build_structs():
        return {
            mv: median_struct(spec, [F.col(v) for v in spec.input_variables])
            for mv, spec in med_specs.items()
        }

    # overlap fold materialization with the driver-side struct build
    # (same multi-threaded-driver pattern as the CT20 chain); when the
    # caller shares the native batch's persisted tract fold, reuse it
    # as-is — it is already materialized
    shared = agg_tract is not None
    with ThreadPoolExecutor(2) as ex:
        f_tr = (
            None
            if shared
            else ex.submit(lambda: _mat(_tract_fold(engine, varmap, cvs)))
        )
        f_structs = ex.submit(_build_structs)
        tract_src = agg_tract if shared else f_tr.result()
        med_structs = f_structs.result()

    pff_list = F.broadcast(
        spark.createDataFrame(
            [(p,) for p in sorted({m["pff_variable"] for m in meta})],
            "pff string",
        )
    )
    # dimension units key off tracts PRESENT IN THE SOURCE (load_e_m
    # emits every wide row even for placeholder variables) — a pruned
    # geo-column scan, never the melt
    units = make_census_geoid(engine.source._read("tract"), "tract").select(
        "census_geoid"
    )

    def _one(geotype: str) -> DataFrame:
        dim_col = AGG2010_DIM[geotype]
        # pandas groupby drops NaN keys — an unassigned tract (NULL
        # nta/cd in the crosswalk) must not seed a NULL unit in the
        # spine or the fold (mirrors tract_to_dimension_2010 and the
        # 2020 chain's _one_aggregated_geotype)
        dim = (
            engine.geo.lookup.filter(F.col(dim_col).isNotNull())
            .select("geoid_tract", dim_col)
            .distinct()
        )
        dims = (
            units.join(
                F.broadcast(dim),
                units["census_geoid"] == dim["geoid_tract"],
            )
            .select(F.col(dim_col).alias("unit"))
            .distinct()
        )
        matched = (
            tract_src.join(
                F.broadcast(dim),
                tract_src["census_geoid"] == dim["geoid_tract"],
            )
            .groupBy(F.col(dim_col).alias("unit"), "pff")
            .agg(sum_skipna("e").alias("e"), agg_moe("m").alias("m"))
        )
        agg2 = _mat(
            dims.crossJoin(pff_list)
            .join(matched, ["unit", "pff"], "left")
            .select(
                F.col("unit").alias("census_geoid"),
                "pff",
                F.coalesce("e", F.lit(0.0)).alias("e"),
                F.coalesce("m", F.lit(0.0)).alias("m"),
            )
        )
        return _aggregated_assembly(
            engine, geotype, attr, varattr, agg2, med_specs, med_structs,
            tag_domain, _mat=_mat,
        )

    with ThreadPoolExecutor(max(1, len(geotypes))) as ex:
        return list(ex.map(_one, geotypes))


def _aggregated_assembly(
    engine,
    geotype: str,
    attr,
    varattr,
    agg2: DataFrame,
    med_specs,
    med_structs,
    tag_domain: bool,
    _mat=None,
) -> DataFrame:
    """The shared aggregated-geotype tail: from a MATERIALIZED
    (census_geoid, pff, e, m) rollup frame at the target grain to the
    finished labs frame — grouped medians (one shared bin pivot),
    special formulas (one shared member pivot, wrkrnothm-first
    topological order), base / median-base p-z joins, rounding,
    cleaning, labs formatting.  Used by both the tract-sourced 2020
    rollups (``_one_aggregated_geotype``) and the block-group zone
    rollups (``_zone_frames``).

    ``_mat`` (the caller's checkpoint policy) MATERIALIZES the
    all-medians struct frame (``med_all``).  History of the shape:
    the r10 baseline re-embedded the raw pivot subtree at every one of
    its ~20 references (q337: 740 operators / 133 Exchanges); r11
    checkpointed the two pivots (34 Exchanges) but still projected one
    frame per median over the checkpoint — ~20 multi-KB median-struct
    subtrees per geotype (two per median: em union + medbase lookup
    union, each struct evaluated twice per row) and one join per
    dependent special.  r12 computes every median struct ONCE in a
    single checkpointed projection (two field-extraction stacks read
    it) and chains the special formulas inline over ONE un-checkpointed
    member pivot — q337's plan drops 259→~90 operators / 140→~8
    ExistingRDD rescans, with one checkpoint job per geotype instead
    of two (guide §2.4 "remove shuffles outright", §3.3 "materialising
    an intermediate truncates the plan"; A/Bs in
    OPTIMIZATION_r11.md / OPTIMIZATION_r12.md)."""
    from db_factfinder_spark.operators.pivot import pivot_e, pivot_e_m
    from db_factfinder_spark.operators.special import SPECIAL_FUNCTIONS

    cat = engine.catalog
    spark = engine.spark
    long2 = agg2.select(
        "census_geoid",
        F.col("pff").alias("pff_variable"),
        F.lit(geotype).alias("geotype"),
        "e",
        "m",
    )

    # ---- grouped medians: ONE shared bin pivot → ONE struct projection
    # (empty branch sets — the decennial sidecars — degenerate to no
    # frames at all; the q378 empty-catalog pin at native grain).
    # Every median struct is computed ONCE in a single projection: the
    # pre-r12 shape projected one frame per median (each embedding the
    # multi-KB struct expression) and referenced each TWICE (the em
    # union + the medbase lookup union) — ~20 giant subtrees per
    # geotype in the plan and every struct evaluated twice per row.
    # One projection + two cheap field-extraction stacks keep ONE copy
    # of each struct and evaluate it once (guide §2.4/§3.3; r12 A/B in
    # OPTIMIZATION_r12.md).  The materialization moves from the bin
    # pivot to this frame — same single job per geotype, and the
    # downstream stacks read precomputed (e, m) struct values.
    med_all = None
    if med_specs:
        all_bins = sorted(
            {v for spec in med_specs.values() for v in spec.input_variables}
        )
        wide_med = pivot_e(
            long2.filter(F.col("pff_variable").isin(all_bins)), all_bins
        )
        med_all = wide_med.select(
            "census_geoid",
            *[med_structs[mv].alias(f"__med_{mv}") for mv in med_specs],
        )
        if _mat is not None:
            med_all = _mat(med_all)

    def _med_stack(mvs, names: str) -> DataFrame:
        parts = ", ".join(
            f"'{mv}', `__med_{mv}`.e, `__med_{mv}`.m" for mv in mvs
        )
        return med_all.selectExpr(
            "census_geoid", f"stack({len(mvs)}, {parts}) AS {names}"
        )

    # ---- special formulas: ONE shared member pivot, formulas CHAINED
    # in one projection (wrkrnothm first: mntrvtm consumes its SPECIAL
    # values — pre-r12 each dependent special re-JOINED the member
    # pivot to the dependency's frame on census_geoid; the pivot is
    # one row per geoid, so inline column reuse is value-identical
    # and join-free, and the pivot subtree now appears ONCE in the
    # final plan instead of needing its own checkpoint)
    order = [s for s in ("wrkrnothm",) if s in cat.special_variables]
    order += [s for s in cat.special_variables if s not in order]
    spec_wide = None
    if order:
        all_members = {
            b for s in order for b in cat.special_spec(s).base_variables
        }
        special_set = set(order)
        plain_members = sorted(b for b in all_members if b not in special_set)
        spec_wide = pivot_e_m(
            long2.filter(F.col("pff_variable").isin(plain_members)).select(
                "census_geoid", "pff_variable", "e", "m"
            ),
            plain_members,
        )
        for s in order:
            spec = cat.special_spec(s)
            deps = {}
            for b in spec.base_variables:
                if b in special_set:  # special member → its SPECIAL values
                    deps[f"{b}e"] = F.col(f"__sp_{b}e")
                    deps[f"{b}m"] = F.col(f"__sp_{b}m")
            if deps:
                spec_wide = spec_wide.withColumns(deps)
            spec_wide = SPECIAL_FUNCTIONS[s](spec_wide).withColumnsRenamed(
                {"e": f"__sp_{s}e", "m": f"__sp_{s}m"}
            )

    # ---- assemble e/m per class: THREE branches (plain slice +
    # median stack + special stack) instead of one union branch per
    # median/special variable (~21 branches pre-r12)
    plain_pffs = [r[0] for r in attr if r[3] == "plain"]
    med_pffs = [r[0] for r in attr if r[3] == "med"]
    spec_pffs = [r[0] for r in attr if r[3] == "spec"]
    em = long2.select(
        F.col("census_geoid"), F.col("pff_variable").alias("pff"), "e", "m"
    ).join(
        F.broadcast(
            spark.createDataFrame([(p,) for p in plain_pffs], "pff string")
        ),
        "pff",
    )
    if med_pffs:
        em = em.unionByName(_med_stack(med_pffs, "(pff, e, m)"))
    if spec_pffs:
        sparts = ", ".join(
            f"'{s}', `__sp_{s}e`, `__sp_{s}m`" for s in spec_pffs
        )
        em = em.unionByName(
            spec_wide.selectExpr(
                "census_geoid",
                f"stack({len(spec_pffs)}, {sparts}) AS (pff, e, m)",
            )
        )

    base_vals = agg2.select(
        "census_geoid",
        F.col("pff").alias("base"),
        F.col("e").alias("agg_e"),
        F.col("m").alias("agg_m"),
    )
    med_union = (
        _med_stack(list(med_specs), "(medbase, mb_e, mb_m)")
        if med_specs
        else None
    )

    df = em.join(F.broadcast(varattr), "pff").join(
        base_vals, ["census_geoid", "base"], "left"
    )
    if med_union is not None:
        df = df.join(med_union, ["census_geoid", "medbase"], "left")
    else:  # no medians in the catalog → no medbase children possible
        df = df.withColumns({"mb_e": _null(), "mb_m": _null()})
    pz = F.col("pz")
    e = F.col("e")
    m = F.col("m")
    p = (
        F.when(
            pz == "med",
            F.lit(100.0) if geotype in ("city", "borough") else _null(),
        )
        .when(pz == "p100", F.lit(100.0))
        .when(pz == "base", get_p(e, F.col("agg_e")))
        .when(pz == "medbase", get_p(e, F.col("mb_e")))
        .otherwise(_null())
    )
    z = (
        F.when(pz == "base", get_z(e, m, p, F.col("agg_e"), F.col("agg_m")))
        .when(pz == "medbase", get_z(e, m, p, F.col("mb_e"), F.col("mb_m")))
        .otherwise(_null())
    )
    c = get_c(e, m)
    rnd = F.col("rnd")

    def _round_em(x: Column) -> Column:
        # + 0.0 canonicalizes IEEE -0.0 → +0.0 (identity elsewhere,
        # NULL-preserving): the special-formula divisions can yield a
        # signed zero whose sign differs by accumulation path across
        # engines, and a value-hash distinguishes "-0.0" from "0.0".
        return (
            F.when(rnd == 1, F.bround(x, 1))
            .when(rnd == 2, F.bround(x, 2))
            .otherwise(F.bround(x, 0))
        ) + F.lit(0.0)

    stats = df.select(
        "census_geoid",
        F.lit(geotype).alias("geotype"),
        F.col("pff").alias("pff_variable"),
        "domain",
        (F.bround(c, 1) + F.lit(0.0)).alias("c"),
        _round_em(e).alias("e"),
        _round_em(m).alias("m"),
        (F.bround(p, 1) + F.lit(0.0)).alias("p"),
        (F.bround(z, 1) + F.lit(0.0)).alias("z"),
    )
    cleaned = cleaning(
        stats,
        cat.base_variables,
        cat.median_variables,
        cat.special_variables,
        cat.median_inputs,
    )
    return cleaned.select(
        "census_geoid",
        engine.geo.format_geoid("census_geoid").alias("labs_geoid"),
        "geotype",
        engine.geo.format_geotype("geotype").alias("labs_geotype"),
        "pff_variable",
        "c",
        "e",
        "m",
        "p",
        "z",
        *(["domain"] if tag_domain else []),
    )


# ---------------------------------------------------------------------------
# block-group zone rollups (flood-plain / park-access geotypes)
# ---------------------------------------------------------------------------

def _zone_frames(
    engine,
    geotypes: list[str],
    variables,
    varmap,
    tag_domain: bool,
    checkpoint_mode: str = "local",
    zone_dims: dict[str, str] | None = None,
    grain_geotype: str = "block group",
    grain_col: str = "geoid_block_group",
) -> list[DataFrame]:
    """Set-based full-catalog batch at the ZONE geotypes
    (reference 2010_to_2020.py:144-197 and geography/2010.py:67-169 —
    flood-plain / park-access rollups ride a download grain, not the
    tract crosswalk: block group for the 2020 registry and for 2010
    acs, BLOCK for 2010 decennial — the caller picks ``grain_geotype``
    / ``grain_col`` / ``zone_dims``):

        grain melt-agg (one scan, one fold shuffle — shared by
        every requested zone geotype) → per geotype: broadcast
        flag-gated zone dimension join + zone fold, LEFT-joined back
        onto the (zone × variable) spine so flagged zones with no
        facts keep e=0/m=0 rows exactly like the per-variable
        ``block_group_to_zone`` / ``block_to_zone_2010``
        (vertical.py:137, :321) → the shared aggregated assembly tail
        (grouped medians, special formulas, base / median-base p-z,
        rounding, cleaning, labs).

    Exactness: grain e values are integers and m = √S with
    integer S (fl(m²) == S), so every zone fold is an integer sum —
    order-free across engines and partitionings, the q337 argument at
    the download grain.  Decennial margins are NULL in the melt and
    fold to 0.0, matching the per-variable ``agg_moe`` path."""
    from concurrent.futures import ThreadPoolExecutor

    from db_factfinder_spark.functions.stats import agg_moe, sum_skipna
    from db_factfinder_spark.llmdata.checkpointing import materialize
    from db_factfinder_spark.operators.median import median_struct

    cat = engine.catalog
    spark = engine.spark
    if zone_dims is None:
        zone_dims = ZONE2020_DIM
    attr = _classify_aggregated(cat, variables)
    varattr = spark.createDataFrame(
        attr,
        "pff string, domain string, rnd int, cls string, pz string,"
        " base string, medbase string",
    )
    meta = cat.metadata
    cvs = sorted({cv for m in meta for cv in m["census_variable"]})

    def _mat(df: DataFrame) -> DataFrame:
        if checkpoint_mode == "none":
            cached = df.persist()
            getattr(engine, "_batch_caches", []).append(cached)
            return cached
        return materialize(df, checkpoint_mode)

    # ---- grain melt + scrub + horizontal fold (ONCE) ----------------
    raw = make_census_geoid(engine.source._read(grain_geotype), grain_geotype)
    long = raw.selectExpr("census_geoid", _stack_expr(cvs, set()))
    e0 = F.col("E_raw")
    m0 = (
        F.when(e0.isin(OUTLIER_SENTINELS), _null())
        .when(e0 == 0, F.lit(0.0))
        .otherwise(F.col("M_raw"))
    )
    scrub = long.select(
        "census_geoid",
        "cv",
        _sentinel_null(e0).alias("E"),
        _sentinel_null(m0).alias("M"),
    )
    agg_bg_plan = (
        scrub.join(F.broadcast(varmap), "cv")
        .groupBy("census_geoid", "pff")
        .agg(
            (F.lit(0.0) + F.sum(F.coalesce(F.col("E"), F.lit(0.0)))).alias("e"),
            F.sqrt(
                F.lit(0.0)
                + F.sum(F.coalesce(F.col("M") * F.col("M"), F.lit(0.0)))
            ).alias("m"),
        )
    )
    med_specs = {mv: cat.median_spec(mv) for mv in cat.median_variables}

    def _build_structs():
        return {
            mv: median_struct(spec, [F.col(v) for v in spec.input_variables])
            for mv, spec in med_specs.items()
        }

    # overlap the fold materialization (JVM-side analysis + job) with
    # the driver-side median-struct build — same pattern as the CT20
    # chain
    with ThreadPoolExecutor(2) as ex:
        f_bg = ex.submit(_mat, agg_bg_plan)
        f_structs = ex.submit(_build_structs)
        agg_bg = f_bg.result()
        med_structs = f_structs.result()
    pff_list = F.broadcast(
        spark.createDataFrame(
            [(p,) for p in sorted({m["pff_variable"] for m in meta})],
            "pff string",
        )
    )

    def _one_zone(geotype: str) -> DataFrame:
        zone_col = zone_dims[geotype]
        dim = (
            engine.geo.lookup.filter(F.col(zone_col).isNotNull())
            .select(grain_col, zone_col)
            .distinct()
        )
        matched = (
            agg_bg.join(
                F.broadcast(dim),
                agg_bg["census_geoid"] == dim[grain_col],
            )
            .groupBy(F.col(zone_col).alias("zone"), "pff")
            .agg(sum_skipna("e").alias("e"), agg_moe("m").alias("m"))
        )
        # (zone × variable) spine: flagged zones with no facts keep
        # e=0/m=0 like _zone_rollup's left join + coalesce
        zones = dim.select(F.col(zone_col).alias("zone")).distinct()
        agg2 = _mat(
            zones.crossJoin(pff_list)
            .join(matched, ["zone", "pff"], "left")
            .select(
                F.col("zone").alias("census_geoid"),
                "pff",
                F.coalesce("e", F.lit(0.0)).alias("e"),
                F.coalesce("m", F.lit(0.0)).alias("m"),
            )
        )
        return _aggregated_assembly(
            engine, geotype, attr, varattr, agg2, med_specs, med_structs,
            tag_domain, _mat=_mat,
        )

    with ThreadPoolExecutor(max(1, len(geotypes))) as ex:
        return list(ex.map(_one_zone, geotypes))


# ---------------------------------------------------------------------------
# incremental vintage maintenance (new wide partition → slice recompute)
# ---------------------------------------------------------------------------

def catalog_dependency_closure(cat, mutated_cvs) -> set[str]:
    """Variables whose published statistics can change when the given
    CENSUS COLUMNS change — the slice-recompute set for an incremental
    vintage update.

    Edges, iterated to fixpoint (a superset is always safe — it only
    recomputes more; a subset is a correctness bug):

    * direct: any of the variable's census columns (incl. its profile
      column) is mutated;
    * base / poverty-twin: the p/z inputs come from another variable's
      values (calculate.py:198-291);
    * wrkrnothm: consumes wrkr16pl and cw_wrkdhm at every geotype;
    * special formulas: consume their base members' values (incl. the
      wrkrnothm→mntrvtm special recursion);
    * grouped medians: consume their bin variables' rolled values.
    """
    mut = set(mutated_cvs)
    meta_by = {m["pff_variable"]: m for m in cat.metadata}
    deps: dict[str, set[str]] = {}
    for pff, m in meta_by.items():
        d = set()
        base = str(m.get("base_variable", "nan"))
        if base != "nan" and base in meta_by:
            d.add(base)
        if pff in POVERTY_VARIABLES and f"{pff}_pct" in meta_by:
            d.add(f"{pff}_pct")
        deps[pff] = d
    if "wrkrnothm" in meta_by:
        deps["wrkrnothm"] |= {"wrkr16pl", "cw_wrkdhm"}
    for s in cat.special_variables:
        deps.setdefault(s, set()).update(
            b for b in cat.special_spec(s).base_variables if b in meta_by
        )
    for mv in cat.median_variables:
        deps.setdefault(mv, set()).update(
            b for b in cat.median_spec(mv).input_variables if b in meta_by
        )
    affected = {
        pff
        for pff, m in meta_by.items()
        if mut.intersection(m["census_variable"])
    }
    changed = True
    while changed:
        changed = False
        for pff, d in deps.items():
            if pff not in affected and d & affected:
                affected.add(pff)
                changed = True
    return affected


def incremental_catalog_update(
    engine_new,
    prev: DataFrame,
    mutated_cvs,
    geotypes: list[str],
    variables: list[str] | None = None,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Incremental ACS vintage maintenance: a new wide partition
    arrived (``engine_new``'s source reads the UPDATED table), and only
    the (variable, geotype) slices whose census columns — or whose
    p/z / special / median inputs — changed are recomputed; everything
    else is spliced through from the previously-published frame
    ``prev`` (the stored artifact of the last full run, e.g. the
    production parquet/CSV read back — NOT a live plan over the old
    source).

    Correctness contract: the result is value-identical to a full
    ``calculate_batch_catalog`` over the updated source (pinned by
    q367's oracle, which computes the full mutated run in SQL).  Cost
    contract: the recompute touches one melt scan per geotype but the
    catalog fan-out — the expensive output-sized part — shrinks to the
    affected-variable slice, and the untouched slice is a pass-through
    scan of the stored artifact, never of the wide source."""
    cat = engine_new.catalog
    affected = catalog_dependency_closure(cat, mutated_cvs)
    if variables is not None:
        affected &= set(variables)
        keep = [v for v in variables if v not in affected]
    else:
        keep = [
            m["pff_variable"]
            for m in cat.metadata
            if m["pff_variable"] not in affected
        ]
    recomputed = engine_new.calculate_batch_catalog(
        geotypes,
        variables=sorted(affected),
        checkpoint_mode=checkpoint_mode,
    )
    # the geotype filter is load-bearing when ``prev`` was built over a
    # WIDER grid than requested: without it, stale rows for
    # unrequested geotypes would splice through while the recompute
    # only covers the requested grid
    untouched = prev.filter(F.col("pff_variable").isin(keep)).filter(
        F.col("geotype").isin(list(geotypes))
    )
    return untouched.unionByName(recomputed)


# The DIMENSION axis of incremental maintenance (the variable axis is
# catalog_dependency_closure): which published geotypes read which
# crosswalk field.  A revised ratio row re-apportions EVERY variable at
# every crosswalk-riding geotype; a revised dimension assignment (an
# NTA boundary fix) or zone flag touches only the geotypes that read
# that column.  Native geotypes never read the crosswalk, so they are
# never invalidated by a geography revision.  Keys mirror the raw
# lookup/ratio columns (reference 2010_to_2020.py:16-50,
# geography/2010.py:16-38).
GEO_FIELD_DEPENDENTS = {
    "2010_to_2020": {
        "ratio": ("CT20", "NTA", "CDTA"),
        "nta2020": ("NTA",),
        "cdta2020": ("CDTA",),
        "fp_100": ("cdta_fp_100",),
        "fp_500": ("cdta_fp_500",),
        "park_access": ("cdta_park_access",),
    },
    "2010": {
        "nta": ("NTA",),
        "cd": ("cd",),
        "fp_100": ("cd_fp_100",),
        "fp_500": ("cd_fp_500",),
        "park_access": ("cd_park_access",),
    },
}


def geography_dependency_closure(geo_name: str, changed_fields) -> set[str]:
    """Geotypes whose published statistics can change when the given
    crosswalk FIELDS change — the slice-recompute set for an
    incremental geography revision (the dimension-axis twin of
    ``catalog_dependency_closure``).  Unknown fields raise: silently
    ignoring one would under-invalidate, which is a correctness bug
    (a superset only recomputes more)."""
    table = GEO_FIELD_DEPENDENTS[geo_name]
    out: set[str] = set()
    for f in changed_fields:
        if f not in table:
            raise KeyError(
                f"geography_dependency_closure: unknown crosswalk field "
                f"{f!r} for geography {geo_name!r} (known: "
                f"{sorted(table)})"
            )
        out.update(table[f])
    return out


def incremental_geography_update(
    engine_new,
    prev: DataFrame,
    changed_fields,
    geotypes: list[str],
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Incremental GEOGRAPHY-revision maintenance: the crosswalk
    changed (a revised ratio row, an NTA boundary fix, a zone-flag
    correction — ``changed_fields`` names the raw lookup/ratio columns
    that moved), and only the aggregated geotypes that read those
    fields are recomputed over ``engine_new`` (whose geography carries
    the REVISED crosswalk); every other geotype — natives always
    included, since they never touch the crosswalk — is spliced
    through from the previously-published artifact ``prev``.

    Correctness contract: value-identical to a full
    ``calculate_batch_catalog`` over the revised geography (pinned by
    q388's oracle, which computes the full revised run in SQL).  Cost
    contract: the wide source is re-scanned once for the affected
    geotypes' shared fold, but the native grid — the bulk of the
    output — is a pass-through scan of the stored artifact."""
    affected = geography_dependency_closure(
        getattr(engine_new.geo, "name", ""), changed_fields
    )
    recompute = [g for g in geotypes if g in affected]
    keep = [g for g in geotypes if g not in affected]
    parts = []
    if keep:
        parts.append(prev.filter(F.col("geotype").isin(keep)))
    if recompute:
        parts.append(
            engine_new.calculate_batch_catalog(
                recompute, checkpoint_mode=checkpoint_mode
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def incremental_combined_update(
    engine_new,
    prev: DataFrame,
    mutated_cvs,
    changed_fields,
    geotypes: list[str],
    checkpoint_mode: str = "local",
) -> DataFrame:
    """BOTH maintenance axes in one update: a census-column correction
    (``mutated_cvs`` — the variable axis, ``catalog_dependency_closure``)
    landed together with a crosswalk revision (``changed_fields`` — the
    dimension axis, ``geography_dependency_closure``).  The recompute
    region is the UNION of the two rectangles

        (affected variables × every requested geotype)  ∪
        (every variable × affected geotypes)

    computed without overlap: one batch over the affected variables at
    ALL requested geotypes, one batch over the REMAINING variables at
    only the affected geotypes; everything outside both rectangles
    splices from the stored artifact.  Correctness contract: value-
    identical to a full ``calculate_batch_catalog`` over the mutated
    source + revised geography (q389's oracle)."""
    cat = engine_new.catalog
    vars_aff = sorted(catalog_dependency_closure(cat, mutated_cvs))
    geos_aff = geography_dependency_closure(
        getattr(engine_new.geo, "name", ""), changed_fields
    )
    geo_recompute = [g for g in geotypes if g in geos_aff]
    geo_keep = [g for g in geotypes if g not in geos_aff]
    vars_keep = [
        m["pff_variable"]
        for m in cat.metadata
        if m["pff_variable"] not in set(vars_aff)
    ]
    parts = []
    if geo_keep:
        parts.append(
            prev.filter(~F.col("pff_variable").isin(vars_aff)).filter(
                F.col("geotype").isin(geo_keep)
            )
        )
    if vars_aff and geotypes:
        parts.append(
            engine_new.calculate_batch_catalog(
                geotypes, variables=vars_aff,
                checkpoint_mode=checkpoint_mode,
            )
        )
    if geo_recompute and vars_keep:
        parts.append(
            engine_new.calculate_batch_catalog(
                geo_recompute, variables=vars_keep,
                checkpoint_mode=checkpoint_mode,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
