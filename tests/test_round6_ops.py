"""Round-6 operators: conservation and exactness properties for the
time-decay attribution split, KMV/PQ covered in test_llmdata."""

import pytest

from pyspark.sql import functions as F

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_factfinder_spark.operators.funnel import time_decay_attribution


def _ev_df(spark, rows):
    data = [
        (i, u, f"1970-01-{1 + d:02d} 00:00:00", et, c / 100.0,
         '{"k": %d}' % k)
        for i, (u, d, et, c, k) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, user_id long, ts_s string, event_type string,"
        " value double, props string",
    ).select(
        "event_id", "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type", "value", "props",
    )


_evrow = st.tuples(
    st.integers(min_value=0, max_value=2),      # user
    st.integers(min_value=0, max_value=12),     # day offset
    st.sampled_from(["click", "view", "purchase", "error"]),
    st.integers(min_value=-999, max_value=999),  # value cents
    st.integers(min_value=0, max_value=9),      # channel k
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_evrow, min_size=1, max_size=30))
def test_time_decay_conserves_cents(spark, rows):
    """Σ credited_cents over all channels (incl. direct −1) equals
    Σ purchase cents exactly whatever the touch/refund mix — the
    dyadic-weight largest-remainder split leaks nothing."""
    out = time_decay_attribution(
        _ev_df(spark, rows), ["click", "view"], "purchase",
        horizon_days=7,
        channel=F.get_json_object("props", "$.k").cast("int") % 5,
    ).collect()
    total = sum(c for (_, _, et, c, _) in rows if et == "purchase")
    assert sum(r["credited_cents"] or 0 for r in out) == total


def test_time_decay_weights_recency(spark):
    """Two touches 0 and 1 day(s) before a 3.00 conversion must split
    2:1 exactly (weights 2^7 vs 2^6); a touch beyond the horizon gets
    nothing; a touchless conversion lands on channel −1."""
    rows = [
        # user 1: touch d=1 (ch 0), touch d=2 (ch 1), purchase d=2
        (1, 1, "click", 0, 0),
        (1, 2, "view", 0, 1),
        (1, 2, "purchase", 300, 9),
        # user 2: touch 10 days before purchase → outside horizon
        (2, 0, "click", 0, 2),
        (2, 10, "purchase", 500, 9),
    ]
    out = {
        r["channel"]: r["credited_cents"]
        for r in time_decay_attribution(
            _ev_df(spark, rows), ["click", "view"], "purchase",
            horizon_days=7,
            channel=F.get_json_object("props", "$.k").cast("int") % 5,
        ).collect()
    }
    # ages: ch0 touch is 1 day old (w=64), ch1 touch 0 days (w=128)
    assert out[1] == 200 and out[0] == 100
    assert out[-1] == 500
    assert 2 not in out


def test_time_decay_rejects_bad_horizon(spark):
    with pytest.raises(ValueError):
        time_decay_attribution(
            _ev_df(spark, []), ["click"], "purchase", horizon_days=41,
            channel=F.lit(0),
        )


def test_calibration_bins_exact_toy(spark):
    """Hand-computed bins: h=2^27 (p=0.5) with y=1 → squared error
    (2^27-2^28)² = 2^54 → brier 0.25; same h with y=0 → 0.25 too;
    h=0,y=0 → brier 0; bin ids = h*10 div 2^28."""
    from db_factfinder_spark.operators.evaluation import calibration_bins

    two27 = 1 << 27
    df = spark.createDataFrame(
        [("g", two27, True), ("g", two27, False), ("g", 0, False)],
        "g string, score28 long, y boolean",
    )
    out = {r["bin"]: r for r in
           calibration_bins(df, ["g"], "score28", "y").collect()}
    assert out[5]["n"] == 2 and out[5]["n_pos"] == 1
    assert out[5]["mean_p"] == 0.5 and out[5]["frac_pos"] == 0.5
    assert out[5]["brier"] == 0.25
    assert out[0]["n"] == 1 and out[0]["brier"] == 0.0
    assert out[0]["mean_p"] == 0.0
