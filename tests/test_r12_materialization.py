"""Round-12 optimization pins: plan-shape regressions for the
restructured aggregated assembly and the attribution-family
materializations.

The r12 changes (OPTIMIZATION_r12.md):

* ``_aggregated_assembly`` computes every median struct ONCE in a
  single checkpointed projection (two field-extraction stacks read
  it) and chains the special formulas inline over ONE member pivot —
  the r11 shape projected one frame per median (each embedding the
  multi-KB struct expression, referenced twice) and joined the member
  pivot back per dependent special.  Regression symptom: plan-text /
  operator-count explosion and one checkpoint rescan per re-embedded
  reference (q337 baseline: 259 operators, 140 ExistingRDD scans).
* ``linear/position/time_decay_attribution`` materialize the narrow
  event projection and the assigned-touches frame — pre-r12 the whole
  union+descending-window pipeline re-ran for the direct-channel
  anti-join and the source was re-scanned per reference.

Values are pinned elsewhere (strict oracle + the test_catalog_batch
equivalence suites); these are plan-shape tests only.  Bounds are
upper bounds with slack: the r11 shapes exceeded every one of them
by 2x or more.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark):
    return spark.createDataFrame(
        [
            ("u1", 1, "e1", "click", 0.0),
            ("u1", 2, "e2", "view", 0.0),
            ("u1", 3, "e3", "purchase", 10.0),
            ("u2", 1, "e4", "click", 0.0),
            ("u2", 5, "e5", "purchase", 4.0),
            ("u3", 2, "e6", "view", 0.0),
        ],
        "user_id string, ts_i long, event_id string, event_type string,"
        " value double",
    ).select(
        "user_id",
        F.timestamp_seconds(F.col("ts_i")).alias("ts"),
        "event_id",
        "event_type",
        "value",
    )


def _attribution_plan_asserts(plan: str) -> None:
    # the assigned frame and the event projection are checkpoint
    # leaves...
    assert "Scan ExistingRDD" in plan
    # ...and NO branch bypasses them back to the source: the input
    # createDataFrame local relation must not appear in the output
    # plan at all (pre-r12 it appeared once per re-embedded reference)
    assert "LocalTableScan" not in plan
    # the union+descending-window assignment pipeline sits entirely
    # inside the checkpoint build — ZERO copies in the output plan
    # (pre-r12: one full copy per reference)
    assert "__is_probe" not in plan, plan[:2000]


def test_linear_attribution_assignment_runs_once(spark):
    from db_factfinder_spark.operators.funnel import linear_attribution

    out = linear_attribution(
        _events(spark),
        touch_types=["click", "view"],
        conv_type="purchase",
        horizon_us=10**9,
        channel=F.crc32(F.col("event_id")) % 3,
    )
    _attribution_plan_asserts(_plan(out))


def test_position_attribution_assignment_runs_once(spark):
    from db_factfinder_spark.operators.funnel import position_attribution

    out = position_attribution(
        _events(spark),
        touch_types=["click", "view"],
        conv_type="purchase",
        horizon_us=10**9,
        channel=F.crc32(F.col("event_id")) % 3,
    )
    _attribution_plan_asserts(_plan(out))


def test_time_decay_attribution_assignment_runs_once(spark):
    from db_factfinder_spark.operators.funnel import time_decay_attribution

    out = time_decay_attribution(
        _events(spark),
        touch_types=["click", "view"],
        conv_type="purchase",
        horizon_days=7,
        channel=F.crc32(F.col("event_id")) % 3,
    )
    _attribution_plan_asserts(_plan(out))


def test_aggregated_assembly_single_median_projection(spark):
    """The q337-shape plan (one aggregated geotype) must stay compact:
    the r11 shape carried ~70 checkpoint rescans and ~130 operators
    for a single geotype (one rescan + one multi-KB median-struct
    subtree per median reference, one join per dependent special);
    the r12 shape reads the all-medians checkpoint twice (em stack +
    medbase stack) and embeds the member pivot once."""
    import __spark_entry__ as entry

    eng = entry._crosswalk_2020_engine(spark, "/root/testdata/sf0.001")
    out = eng.calculate_batch_catalog(["NTA"])
    plan = _plan(out)
    n_rescan = len(re.findall(r"Scan ExistingRDD", plan))
    assert n_rescan <= 20, f"checkpoint rescan explosion: {n_rescan}"
    # the median-struct machinery lives INSIDE the med_all checkpoint
    # build, not in the output plan: with the r11 per-median-frame
    # shape this single-geotype plan string measured ~5x this bound
    # (one multi-KB struct subtree per median reference); the r12
    # shape is two field-extraction stacks over the checkpoint
    assert len(plan) < 200_000, f"plan-size explosion: {len(plan)} chars"
    for c in getattr(eng, "_batch_caches", []):
        c.unpersist()
