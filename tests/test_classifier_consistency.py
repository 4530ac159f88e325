"""Engine-vs-oracle classifier consistency (no Spark needed).

The set-based batch classifies every catalog variable twice, in two
deliberately independent implementations: the ENGINE side
(``plans/batch._classify`` / ``_classify_aggregated`` over a
``Catalog``) and the ORACLE side (``synth_catalog.native_varattr`` /
``aggregated_varattr`` over the raw JSON — kept engine-free so the
DuckDB oracle shares no engine code).  A drift between them surfaces
as a value-hash mismatch that LOOKS like an engine bug; this module
pins bit-identical classification across every packaged vintage that
carries census columns.  (acs 2021 is metadata-only — no census
columns, manual-update pipeline only — and is excluded by design.)
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

import synth_catalog as sc
from db_factfinder_spark.catalog import Catalog
from db_factfinder_spark.plans.batch import _classify, _classify_aggregated

VINTAGES = [
    ("acs", 2010),
    ("acs", 2018),
    ("acs", 2019),
    ("acs", 2020),
    ("decennial", 2010),
    ("decennial", 2020),
]


@pytest.mark.parametrize("source,year", VINTAGES)
def test_native_classification_matches_oracle(source, year):
    cat = Catalog.from_registry(source, year)
    all_vars = [m["pff_variable"] for m in cat.metadata]
    engine_rows = _classify(cat, all_vars)
    oracle_rows = sc.native_varattr(source, year)
    assert len(engine_rows) == len(oracle_rows)
    assert engine_rows == oracle_rows


@pytest.mark.parametrize("source,year", VINTAGES)
def test_aggregated_classification_matches_oracle(source, year):
    cat = Catalog.from_registry(source, year)
    all_vars = [m["pff_variable"] for m in cat.metadata]
    engine_rows = _classify_aggregated(cat, all_vars)
    oracle_rows = sc.aggregated_varattr(source, year)
    assert len(engine_rows) == len(oracle_rows)
    assert engine_rows == oracle_rows


@pytest.mark.parametrize("source,year", VINTAGES)
def test_profile_only_matches_oracle(source, year):
    cat = Catalog.from_registry(source, year)
    assert set(cat.profile_only_variables) == sc.profile_only(
        sc.load_meta(source, year), source
    )
