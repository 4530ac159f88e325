"""Physical-plan audits: the properties that decide 100 TB behavior.

These assert *plan shape*, not results — predicate pushdown reaching
the parquet scan, dimension joins resolving to broadcast-hash, and no
accidental cartesian products.  Plans are built against sf0.001 (shape
is scale-independent; file statistics only affect AQE runtime re-plans,
which these static checks deliberately ignore).
"""

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
QUERIES = entry_mod.queries()


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(jvm.fromString("formatted"))


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_no_cartesian_product(spark, name):
    assert "CartesianProduct" not in _plan(spark, name), (
        f"{name} plans a cartesian product"
    )


def test_q01_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed"
    # projection pruning: the scan must not read unused wide columns
    assert "l_comment" not in plan, "unpruned column reaches the scan"


def test_q05_dimension_joins_broadcast(spark):
    plan = _plan(spark, "q05_dim_join_rollup")
    # supplier→nation→region chain: every dim join is broadcast-hash
    assert plan.count("BroadcastHashJoin") >= 3 * 2  # node + detail section
    assert "SortMergeJoin" not in plan


def test_q10_base_join_broadcast(spark):
    plan = _plan(spark, "q10_pz_stats")
    assert "SortMergeJoin" not in plan, "base-variable join must broadcast (J3)"


def test_q37_spine_broadcasts_base(spark):
    plan = _plan(spark, "q37_factfinder_e2e")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q29_broadcasts_probe_side(spark):
    # brute-force ANN: the probe set is broadcast, the corpus never
    # shuffles — BroadcastNestedLoopJoin is the *intended* operator
    # (non-equi self-exclusion predicate)
    plan = _plan(spark, "q29_ann_topk")
    assert "BroadcastNestedLoopJoin" in plan


def test_q34_candidate_join_is_equi(spark):
    # the LSH point: candidate generation must be an equi-join on the
    # (table, bucket) key, never a nested loop over the corpus
    plan = _plan(spark, "q34_ann_lsh_topk")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
