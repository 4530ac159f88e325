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
) -> DataFrame:
    """One set-based lazy plan for (``variables`` × ``geotypes``) —
    result-identical to looping ``engine(var, geotype)`` +
    ``unionByName`` (equivalence pinned in tests/test_catalog_batch).

    Native geotypes only: aggregated geographies go through the
    per-variable rollup operators (``calculate_batch``)."""
    aggregated = set(engine.geo.aggregated_geography)
    bad = [g for g in geotypes if g in aggregated]
    if bad:
        raise NotImplementedError(
            f"calculate_batch_catalog: aggregated geotypes {bad} take "
            "the per-variable rollup path (calculate_batch)"
        )
    cat, spark = engine.catalog, engine.spark
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
    frames = [
        _native_geotype_frame(engine, g, attr, varmap, varattr, tag_domain)
        for g in geotypes
    ]
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


def _native_geotype_frame(
    engine, geotype: str, attr, varmap, varattr, tag_domain: bool
) -> DataFrame:
    cat = engine.catalog
    source = cat.source
    meta = cat.metadata
    cvs = sorted({cv for m in meta for cv in m["census_variable"]})
    prof_cvs = {pcv for (*_, pcv) in attr if pcv}

    raw = make_census_geoid(engine.source._read(geotype), geotype)

    # ---- melt + column-local scrub (download.py:74-87,123-140) ------
    long = raw.selectExpr("census_geoid", _stack_expr(cvs, prof_cvs))
    e0 = F.col("E_raw")
    # plain-path M (E==0 → 0; E sentinel → NULL — disjoint conditions,
    # same result as scrub_wide's sequential masking)
    m0 = (
        F.when(e0.isin(OUTLIER_SENTINELS), _null())
        .when(e0 == 0, F.lit(0.0))
        .otherwise(F.col("M_raw"))
    )
    pm0 = F.col("PM_raw")
    if geotype in ("city", "borough"):
        m0 = F.when(m0.isin(CONTROLLED), F.lit(0.0)).otherwise(m0)
        pm0 = F.when(pm0.isin(CONTROLLED), F.lit(0.0)).otherwise(pm0)
    scrub = long.select(
        "census_geoid",
        "cv",
        _sentinel_null(e0).alias("E"),
        _sentinel_null(m0).alias("M"),
        _sentinel_null(F.col("PE_raw")).alias("PPE"),
        _sentinel_null(pm0).alias("PPM"),
    ).persist()  # the melt is read twice (horizontal fold + profile
    # values) — cache it so the wide table is scanned ONCE per geotype

    # ---- horizontal fold: ONE shuffle on (geoid, variable) ----------
    agg = (
        scrub.join(F.broadcast(varmap), "cv")
        .groupBy("census_geoid", "pff")
        .agg(
            (F.lit(0.0) + F.sum(F.coalesce(F.col("E"), F.lit(0.0)))).alias("e"),
            F.sqrt(
                F.lit(0.0)
                + F.sum(F.coalesce(F.col("M") * F.col("M"), F.lit(0.0)))
            ).alias("m"),
        )
        .persist()  # base variables are REUSED via self-joins below —
        # the set-based analog of the per-variable memoized base plans
    )

    # ---- assembly: (geoid × varattr) spine + keyed self-joins -------
    # The spine (a broadcast cross join against the pruned geo-column
    # scan) keeps variables with an EMPTY census-column list — the
    # decennial catalogs are mostly such placeholders, and the
    # per-variable path gives them e = Σ∅ = 0.0 rows, not absence
    # (hsum([]) — calculate.py:92-107).
    spine = raw.select("census_geoid").crossJoin(F.broadcast(varattr))
    empty_m = (
        _null() if source == "decennial" else F.lit(0.0)  # hmoe([]) = √0
    )
    agg_side = agg if source != "decennial" else agg.withColumn("m", _null())
    stats_em = spine.join(agg_side, ["census_geoid", "pff"], "left").select(
        "*",
        F.coalesce(F.col("e"), F.lit(0.0)).alias("e_fold"),
        F.coalesce(F.col("m"), empty_m).alias("m_fold"),
    ).drop("e", "m").withColumnsRenamed({"e_fold": "e", "m_fold": "m"})
    base_vals = agg_side.select(
        "census_geoid",
        F.col("pff").alias("base"),
        F.col("e").alias("agg_e"),
        F.col("m").alias("agg_m"),
    )
    twin_vals = agg_side.select(
        "census_geoid",
        F.col("pff").alias("twin"),
        F.col("e").alias("tw_e"),
        F.col("m").alias("tw_m"),
    )
    prof_vals = scrub.select(
        "census_geoid",
        F.col("cv").alias("prof_cv"),
        F.col("E").alias("pr_e"),
        F.col("M").alias("pr_m"),
        F.col("PPE").alias("pr_p"),
        F.col("PPM").alias("pr_z"),
    )
    df = (
        stats_em.join(base_vals, ["census_geoid", "base"], "left")
        .join(twin_vals, ["census_geoid", "twin"], "left")
        .join(prof_vals, ["census_geoid", "prof_cv"], "left")
    )
    if any(cls == "wrk" for (_, _, _, cls, *_rest) in attr):
        for name, ali in (("wrkr16pl", "w"), ("cw_wrkdhm", "cw")):
            side = agg.filter(F.col("pff") == name).select(
                "census_geoid",
                F.col("e").alias(f"{ali}_e"),
                F.col("m").alias(f"{ali}_m"),
            )
            df = df.join(side, "census_geoid", "left")
    else:
        df = df.withColumns(
            {c: _null() for c in ("w_e", "w_m", "cw_e", "cw_m")}
        )

    cls = F.col("cls")
    e = (
        F.when(cls == "prof", F.col("pr_e"))
        .when(cls == "wrk", F.col("w_e") - F.col("cw_e"))
        .otherwise(F.col("e"))
    )
    m = (
        F.when(cls == "prof", F.col("pr_m"))
        .when(
            cls == "wrk",
            F.sqrt(
                F.col("w_m") * F.col("w_m") + F.col("cw_m") * F.col("cw_m")
            ),
        )
        .otherwise(F.col("m"))
    )
    pz = F.col("pz")
    p = (
        F.when(pz == "prof", F.col("pr_p"))
        .when(
            pz == "med",
            F.lit(100.0) if geotype in ("city", "borough") else _null(),
        )
        .when(pz == "pov", F.col("tw_e"))
        .when(pz == "p100", F.lit(100.0))
        .when(pz == "base", get_p(e, F.col("agg_e")))
        .otherwise(_null())
    )
    z = (
        F.when(pz == "prof", F.col("pr_z"))
        .when(pz == "pov", F.col("tw_m"))
        .when(pz == "base", get_z(e, m, p, F.col("agg_e"), F.col("agg_m")))
        .otherwise(_null())
    )
    c = get_c(e, m)

    def _round_em(x: Column) -> Column:
        rnd = F.col("rnd")
        return (
            F.when(rnd == 1, F.bround(x, 1))
            .when(rnd == 2, F.bround(x, 2))
            .otherwise(F.bround(x, 0))
        )

    stats = df.select(
        "census_geoid",
        F.lit(geotype).alias("geotype"),
        F.col("pff").alias("pff_variable"),
        "domain",
        F.bround(c, 1).alias("c"),
        _round_em(e).alias("e"),
        _round_em(m).alias("m"),
        F.bround(p, 1).alias("p"),
        F.bround(z, 1).alias("z"),
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
