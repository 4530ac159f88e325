"""Round-11 optimization pins: multi-consumer frames must stay
materialized (lineage-truncated) so Spark cannot re-embed their
upstream pipeline once per reference.

The r11 baseline plans re-ran upstream work per reference: adamic_adar
re-scanned its source 16x (sym feeds the degree count and both wedge
sides), group_medoids ran 11 SortMergeJoins (tagged feeds both pair
sides; shingles computed twice), markov_attribution scanned events 9x
(seq feeds all four transition branches), and the aggregated catalog
assembly re-pivoted per median/special reference (q337: 133 Exchanges).
Each test pins the checkpoint boundary (a Scan ExistingRDD leaf in the
physical plan) that prevents the regression.  Values are pinned
elsewhere (strict oracle + equivalence suites); these are plan-shape
tests only.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_adamic_adar_wedge_sides_read_checkpoint(spark):
    from db_factfinder_spark.llmdata.components import adamic_adar

    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 11), (2, 11), (3, 11)],
        "src long, dst long",
    )
    plan = _plan(adamic_adar(edges))
    # the adjacency (and the symmetric edge list beneath it) must be a
    # checkpoint scan, not a re-embedded union+distinct pipeline
    assert "ExistingRDD" in plan
    # the source relation must not appear in the output plan at all —
    # every branch reads the checkpoints (r12, ADVICE: the SMJ bound
    # alone is trivially met on tiny fixtures where AQE broadcasts)
    assert "LocalTableScan" not in plan
    # one wedge self-join at most — never one join per re-embedding
    assert plan.count("SortMergeJoin") <= 1


def test_group_medoids_pair_sides_read_checkpoint(spark):
    from db_factfinder_spark.llmdata.components import group_medoids

    members = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, group_id long"
    )
    items = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a"]), (3, ["b"]), (9, ["z"])],
        "doc_id long, toks array<string>",
    )
    plan = _plan(group_medoids(members, items))
    assert "ExistingRDD" in plan
    # neither source relation may appear in the output plan — members
    # and items are consumed inside the checkpoint builds (r12, ADVICE:
    # scan-count pin beside the broadcast-sensitive SMJ bound)
    assert "LocalTableScan" not in plan
    # the shingle/token payload is joined in ONCE (the tagged frame);
    # both pair sides scan the checkpoint instead of re-joining items
    assert plan.count("SortMergeJoin") <= 2


def test_markov_attribution_branches_read_checkpoint(spark):
    from db_factfinder_spark.operators.funnel import markov_attribution

    ev = spark.createDataFrame(
        [
            ("u1", 1, "e1", "click", '{"k": 1}'),
            ("u1", 2, "e2", "view", '{"k": 2}'),
            ("u1", 3, "e3", "purchase", '{"k": 0}'),
            ("u2", 1, "e4", "click", '{"k": 3}'),
        ],
        "user_id string, ts_i long, event_id string, event_type string,"
        " props string",
    ).select(
        "user_id",
        F.timestamp_seconds(F.col("ts_i")).alias("ts"),
        "event_id",
        "event_type",
        "props",
    )
    out = markov_attribution(
        ev,
        touch_types=["click", "view"],
        conv_type="purchase",
        channel=F.get_json_object("props", "$.k").cast("int") % 5,
        n_channels=5,
    )
    plan = _plan(out)
    assert "ExistingRDD" in plan
    # the events relation must not appear in the output plan — every
    # transition branch reads the sequenced checkpoint (r12, ADVICE)
    assert "LocalTableScan" not in plan
    # all four transition branches read the sequenced checkpoint: the
    # per-user window pipeline appears once, not once per branch
    assert len(re.findall(r"row_number", plan)) <= 1


def test_aggregated_assembly_pivots_are_materialized(spark, tmp_path):
    """The shared bin/member pivots must be checkpoint leaves: with
    checkpoint_mode='local' the q337-shape plan carries a bounded
    Exchange count (the r11 regression was one exchange pair per
    median/special re-embedding — 133 for CT20+NTA)."""
    import __spark_entry__ as entry

    eng = entry._crosswalk_2020_engine(spark, "/root/testdata/sf0.001")
    out = eng.calculate_batch_catalog(["NTA"])
    plan = _plan(out)
    n_ex = len(re.findall(r"\bExchange\b", plan))
    assert n_ex <= 30, f"exchange explosion is back: {n_ex} Exchanges"
    for c in getattr(eng, "_batch_caches", []):
        c.unpersist()
