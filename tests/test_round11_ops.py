"""Round-11 additions: ADVICE fixes (adamic_adar one-shot flag
independence) plus the cross-geography / outer-mode change tables and
crosswalk-revision incremental maintenance added this round."""

import logging
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent.parent))

SF = "/root/testdata/sf0.001"


def test_adamic_adar_cap_log_independent_of_dedup_flag(spark, caplog):
    """adamic_adar's one-time CAPPED-plan marker must have its OWN
    flag: a process that already ran a capped dedup (dedup._CAP_LOGGED
    set) must still see the adamic_adar lower-bound message once."""
    from db_factfinder_spark.llmdata import components as C
    from db_factfinder_spark.llmdata import dedup as D

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    old_aa, old_dd = C._AA_CAP_LOGGED, D._CAP_LOGGED
    try:
        D._CAP_LOGGED = True  # dedup logged first in this process
        C._AA_CAP_LOGGED = False
        with caplog.at_level(
            logging.INFO, logger="db_factfinder_spark.llmdata.components"
        ):
            C.adamic_adar(edges)  # plan-time log, no action needed
        assert any(
            "adamic_adar" in r.getMessage() and "LOWER BOUND" in r.getMessage()
            for r in caplog.records
        )
        assert C._AA_CAP_LOGGED is True
        assert D._CAP_LOGGED is True  # dedup's flag untouched
        # and the marker stays one-shot
        caplog.clear()
        with caplog.at_level(
            logging.INFO, logger="db_factfinder_spark.llmdata.components"
        ):
            C.adamic_adar(edges)
        assert not any(
            "adamic_adar" in r.getMessage() for r in caplog.records
        )
    finally:
        C._AA_CAP_LOGGED, D._CAP_LOGGED = old_aa, old_dd


@pytest.fixture(scope="module")
def q386_rows(spark):
    import __spark_entry__ as E

    return E.queries()["q386_cross_geography_change_table"](
        spark, SF
    ).collect()


def test_cross_geography_change_table_covers_all_join_shapes(
    spark, q386_rows
):
    """The split crosswalk fixture must actually exercise every join
    shape in the checked output: identity tracts, merge targets (two
    2010 tracts folded into one 2020 tract), split-kept tracts (the
    convert_moe power-law-deflated MOE), and split-shed codes DROPPED
    by the inner join (values are oracle-pinned; this pins the
    fixture's coverage so a silent degeneration cannot pass)."""
    from pyspark.sql import functions as F

    from synth_catalog import N_TRACTS

    geoids = {r["census_geoid"] for r in q386_rows}
    gid = lambda g: int(g[5:])  # noqa: E731
    # expectations derive from the gids actually present in customer
    # (small scale factors do not cover all N_TRACTS)
    present = {
        r[0]
        for r in spark.read.parquet(f"{SF}/customer.parquet")
        .select((F.col("c_custkey") % N_TRACTS).cast("int"))
        .distinct()
        .collect()
    }
    # every present tract appears except the absorbed ones (gid%20==18,
    # whose old CT20 unit was folded into gid-10's code)
    assert geoids == {
        f"36047{g:06d}" for g in present if g % 20 != 18
    }
    assert all(gid(g) < N_TRACTS for g in geoids)  # shed codes dropped
    split_kept = {g for g in geoids if gid(g) % 10 == 9}
    merged = {g for g in geoids if gid(g) % 20 == 8}
    assert split_kept and merged
    # power law actually deflates: on a split-kept tract the old-side
    # MOE must differ from the new-side MOE distribution-wide (equal
    # only by coincidence); check at least one variable shows a
    # non-NULL m_old on a split tract
    some = [
        r
        for r in q386_rows
        if gid(r["census_geoid"]) % 10 == 9 and r["m_old"] is not None
        and r["m_old"] > 0
    ]
    assert some, "no split-kept row carried a deflated MOE"


def test_outer_change_table_pins_all_four_statuses(spark):
    """q387: the packaged 2018/2019 catalogs differ (970 vs 1,047
    variables), so added AND retired rows must both exist; changed and
    unchanged must both occur; one-sided rows carry NULL deltas."""
    import __spark_entry__ as E

    rows = E.queries()["q387_outer_change_table_status"](
        spark, SF
    ).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r)
    assert set(by_status) == {"added", "retired", "changed", "unchanged"}
    for r in by_status["added"]:
        assert r["e_old"] is None and r["delta_e"] is None
        assert r["delta_m"] is None
    for r in by_status["retired"]:
        assert r["e_new"] is None and r["delta_e"] is None
    for r in by_status["changed"][:50]:
        assert r["e_new"] is None or r["e_old"] is None or (
            r["e_new"] != r["e_old"]
        )
    # labs formatting survives from whichever side has the row
    assert all(r["labs_geoid"] is not None for r in rows)


def test_combined_update_rectangles(spark):
    """incremental_combined_update must recompute exactly the union of
    the two closure rectangles without overlap: (affected vars × all
    geotypes) in one batch, (remaining vars × affected geotypes) in the
    other, and the splice filter excludes both."""
    import types

    from db_factfinder_spark.catalog import Catalog
    from db_factfinder_spark.plans.batch import (
        catalog_dependency_closure,
        incremental_combined_update,
    )
    from synth_catalog import incremental_mutation_cvs

    cat = Catalog.from_registry("acs", 2019)
    mut = incremental_mutation_cvs("acs", 2019)
    cols = (
        "census_geoid string, geotype string, pff_variable string,"
        " e double"
    )
    calls = []

    class FakeEngine:
        catalog = cat
        geo = types.SimpleNamespace(name="2010_to_2020")

        def calculate_batch_catalog(
            self, geotypes, variables=None, checkpoint_mode="local"
        ):
            calls.append((tuple(geotypes), variables))
            return spark.createDataFrame(
                [("G", geotypes[0], "recomputed", 0.0)], cols
            )

    prev = spark.createDataFrame(
        [
            ("X", "tract", "pop_1", 1.0),      # unaffected var, native
            ("X", "NTA", "pop_1", 2.0),        # unaffected var, NTA
            ("X", "tract", "lgoenlep1", 3.0),  # affected var
        ],
        cols,
    )
    grid = ["tract", "CT20", "NTA"]
    out = incremental_combined_update(
        FakeEngine(), prev, mut, ["nta2020"], grid
    ).collect()
    aff = catalog_dependency_closure(cat, mut)
    assert "lgoenlep1" in aff and "pop_1" not in aff
    assert len(calls) == 2
    (g1, v1), (g2, v2) = calls
    assert g1 == tuple(grid) and set(v1) == aff
    assert g2 == ("NTA",)
    assert set(v2).isdisjoint(aff)
    assert set(v2) | aff == {m["pff_variable"] for m in cat.metadata}
    spliced = [r for r in out if r["census_geoid"] == "X"]
    # affected-var row and NTA rows must NOT splice through
    assert [(r["geotype"], r["pff_variable"]) for r in spliced] == [
        ("tract", "pop_1")
    ]


def test_significant_change_semantics(spark):
    """q390: significant == (|delta_e| > delta_m) wherever both deltas
    are non-NULL; NULL where either is suppressed; both outcomes
    occur; pct_change NULL on zero/suppressed base."""
    import math

    import __spark_entry__ as E

    rows = E.queries()["q390_significant_change_report"](
        spark, SF
    ).collect()
    seen = set()
    for r in rows:
        if r["delta_e"] is None or r["delta_m"] is None:
            assert r["significant"] is None
        else:
            want = abs(r["delta_e"]) > r["delta_m"]
            assert r["significant"] == (1.0 if want else 0.0)
            seen.add(want)
        if r["e_old"] in (None, 0.0):
            assert r["pct_change"] is None
        elif r["delta_e"] is not None:
            assert r["pct_change"] is not None
            assert math.isclose(
                r["pct_change"], r["delta_e"] / r["e_old"] * 100,
                rel_tol=0, abs_tol=0,
            )
    assert seen == {True, False}


def test_geography_dependency_closure_maps_fields():
    """The dimension axis of incremental maintenance: each crosswalk
    field invalidates exactly the geotypes that read it; a ratio
    revision invalidates every crosswalk rider; natives never appear;
    unknown fields raise (silent under-invalidation would be a
    correctness bug)."""
    from db_factfinder_spark.plans.batch import (
        geography_dependency_closure,
    )

    assert geography_dependency_closure("2010_to_2020", ["nta2020"]) == {
        "NTA"
    }
    assert geography_dependency_closure("2010_to_2020", ["ratio"]) == {
        "CT20",
        "NTA",
        "CDTA",
    }
    assert geography_dependency_closure(
        "2010_to_2020", ["fp_100", "park_access"]
    ) == {"cdta_fp_100", "cdta_park_access"}
    assert geography_dependency_closure("2010", ["cd"]) == {"cd"}
    with pytest.raises(KeyError, match="unknown crosswalk field"):
        geography_dependency_closure("2010_to_2020", ["boroct2020"])


def test_geography_update_splices_only_affected_geotypes(spark):
    """incremental_geography_update must leave unaffected geotypes as a
    pass-through of the stored artifact (not a recompute): revise the
    NTA assignment, splice over a PREV frame with sentinel values for
    tract/CT20 — the sentinels must survive verbatim, and only NTA
    rows may come from the live engine."""
    import __spark_entry__ as E

    from db_factfinder_spark.plans.batch import (
        incremental_geography_update,
    )

    eng = E._crosswalk_2020_engine(spark, SF, nta_move=(3, "BX09"))
    cols = (
        "census_geoid string, labs_geoid string, geotype string, "
        "labs_geotype string, pff_variable string, c double, e double,"
        " m double, p double, z double, domain string"
    )
    prev = spark.createDataFrame(
        [
            ("X1", "L1", "tract", "CT2010", "v", None, 1.0, None, None,
             None, "d"),
            ("X2", "L2", "CT20", "CT2020", "v", None, 2.0, None, None,
             None, "d"),
            ("X3", "L3", "NTA", "NTA2020", "v", None, 3.0, None, None,
             None, "d"),
        ],
        cols,
    )
    out = incremental_geography_update(
        eng, prev, ["nta2020"], ["tract", "CT20", "NTA"]
    )
    rows = out.collect()
    spliced = {r["census_geoid"]: r for r in rows if r["geotype"] != "NTA"}
    # tract/CT20 sentinels pass through verbatim — proof they were NOT
    # recomputed; the stale NTA sentinel must NOT survive
    assert set(spliced) == {"X1", "X2"}
    assert spliced["X1"]["e"] == 1.0 and spliced["X2"]["e"] == 2.0
    ntas = [r for r in rows if r["geotype"] == "NTA"]
    assert ntas and all(r["census_geoid"] != "X3" for r in ntas)
    # the revision is live in the recomputed slice: tract gid 3's
    # facts now roll into BX09
    assert any(r["census_geoid"] == "BX09" for r in ntas)
