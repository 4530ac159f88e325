"""Edge-case tests for operators/funnel.py (cohort retention, funnel
next-event-within)."""

import datetime as dt

from pyspark.sql import functions as F

from db_factfinder_spark.operators.funnel import (
    cohort_retention,
    next_event_within,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_next_event_within_boundaries(spark):
    clicks = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1),  # purchase 1h later → inclusive edge
            (1, _ts("2024-01-01 12:00:00"), 2),  # purchase at SAME ts → converted
            (1, _ts("2024-01-01 14:00:00"), 3),  # next purchase 2h later → not conv
            (2, _ts("2024-01-01 10:00:00"), 4),  # user with no purchase at all
            (3, _ts("2024-01-01 10:00:00"), 5),  # only an EARLIER purchase → not conv
        ],
        "user_id long, ts timestamp, event_id long",
    )
    purchases = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 11:00:00")),
            (1, _ts("2024-01-01 12:00:00")),
            (1, _ts("2024-01-01 16:00:00")),
            (3, _ts("2024-01-01 09:00:00")),
        ],
        "user_id long, ts timestamp",
    )
    out = next_event_within(
        clicks, purchases, by="user_id", on="ts", horizon_us=3_600_000_000
    )
    got = {r.event_id: (r.converted, r.next_ts) for r in out.collect()}
    assert got[1] == (True, _ts("2024-01-01 11:00:00"))
    assert got[2] == (True, _ts("2024-01-01 12:00:00"))
    assert got[3] == (False, _ts("2024-01-01 16:00:00"))
    assert got[4] == (False, None)
    assert got[5] == (False, None)


def test_next_event_within_plan_no_join(spark):
    clicks = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1)],
        "user_id long, ts timestamp, event_id long",
    )
    purchases = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:30:00"))], "user_id long, ts timestamp"
    )
    out = next_event_within(
        clicks, purchases, by="user_id", on="ts", horizon_us=3_600_000_000
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # linear union-window form, not a self-join


def test_cohort_retention_triangle(spark):
    rows = [
        # user 10: first week of 2024-01-01 (Mon), active weeks 0 and 2
        (10, _ts("2024-01-02 00:00:00")),
        (10, _ts("2024-01-04 00:00:00")),  # same week, dedup via distinct
        (10, _ts("2024-01-16 00:00:00")),
        # user 11: same cohort, only week 0
        (11, _ts("2024-01-03 00:00:00")),
        # user 12: cohort of 2024-01-08, active weeks 0 and 1
        (12, _ts("2024-01-08 00:00:00")),
        (12, _ts("2024-01-15 00:00:00")),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = cohort_retention(ev)
    got = {
        (str(r.cohort_week.date()), r.offset_weeks): r.n_users
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


# ---------------------------------------------------------------------------
# Property test: random click/purchase streams vs brute force
# ---------------------------------------------------------------------------

from hypothesis import given, settings, HealthCheck  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ev = st.tuples(
    st.integers(min_value=0, max_value=2),    # key
    st.integers(min_value=0, max_value=40),   # seconds offset
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    clicks=st.lists(_ev, min_size=1, max_size=12),
    purchases=st.lists(_ev, min_size=0, max_size=12),
    horizon_s=st.sampled_from([0, 5, 20]),
)
def test_next_event_within_matches_bruteforce(
    spark, clicks, purchases, horizon_s
):
    base = dt.datetime(2024, 1, 1)
    cdf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=t)) for i, (k, t) in
         enumerate(clicks)],
        "cid long, user_id long, ts timestamp",
    )
    pset = sorted(set(purchases))
    pdf = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=t)) for k, t in pset],
        "user_id long, ts timestamp",
    ) if pset else spark.createDataFrame([], "user_id long, ts timestamp")
    out = next_event_within(
        cdf, pdf, by="user_id", on="ts", horizon_us=horizon_s * 1_000_000
    )
    got = {r.cid: (r.converted, r.next_ts) for r in out.collect()}
    for i, (k, t) in enumerate(clicks):
        future = [pt for pk, pt in pset if pk == k and pt >= t]
        if future:
            nxt = min(future)
            want = (nxt - t <= horizon_s,
                    base + dt.timedelta(seconds=nxt))
        else:
            want = (False, None)
        assert got[i] == want, f"click {i} (u{k}@{t})"


def test_merge_intervals_islands(spark):
    from db_factfinder_spark.operators.intervals import (
        covered_time,
        merge_intervals,
    )

    iv = spark.createDataFrame(
        [
            (1, 1, 0, 10),    # island A
            (1, 2, 5, 12),    # overlaps → A
            (1, 3, 12, 20),   # touches (s == running max e) → still A
            (1, 4, 25, 30),   # gap → island B
            (2, 5, 0, 1),
        ],
        "k int, id int, s long, e long",
    )
    m = {
        (r.k, r.island): (r.s, r.e, r.n_intervals)
        for r in merge_intervals(iv, "k", tiebreak="id").collect()
    }
    assert m == {
        (1, 1): (0, 20, 3),
        (1, 2): (25, 30, 1),
        (2, 1): (0, 1, 1),
    }
    c = {r.k: (r.covered, r.n_islands)
         for r in covered_time(iv, "k", tiebreak="id").collect()}
    assert c == {1: (25, 2), 2: (1, 1)}


_iv2 = st.tuples(
    st.integers(min_value=0, max_value=2),    # key
    st.integers(min_value=0, max_value=30),   # start
    st.integers(min_value=1, max_value=10),   # length
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivs=st.lists(_iv2, min_size=1, max_size=14))
def test_covered_time_matches_bruteforce(spark, ivs):
    from db_factfinder_spark.operators.intervals import covered_time

    df = spark.createDataFrame(
        [(k, i, s, s + ln) for i, (k, s, ln) in enumerate(ivs)],
        "k int, id int, s long, e long",
    )
    got = {r.k: (r.covered, r.n_islands)
           for r in covered_time(df, "k", tiebreak="id").collect()}
    for k in {k for k, _, _ in ivs}:
        pts = set()
        for kk, s, ln in ivs:
            if kk == k:
                pts.update(range(s, s + ln))
        covered = len(pts)
        # islands = maximal runs of consecutive covered points
        islands = sum(1 for p in pts if p - 1 not in pts)
        assert got[k] == (covered, islands), (k, got[k], covered, islands)


def test_transition_matrix_hand_computed(spark):
    from db_factfinder_spark.operators.funnel import transition_matrix
    from pyspark.sql import functions as F

    rows = [
        (1, 1, "2024-01-01 10:00:00", "view"),
        (1, 2, "2024-01-01 10:01:00", "click"),
        (1, 3, "2024-01-01 10:02:00", "view"),
        (2, 4, "2024-01-01 11:00:00", "view"),
        (2, 5, "2024-01-01 11:05:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, t string, event_type string"
    ).select("user_id", "event_id", F.to_timestamp("t").alias("ts"),
             "event_type")
    out = {(r["state"], r["next"]): r
           for r in transition_matrix(df).collect()}
    # transitions: u1 view→click, click→view; u2 view→click
    assert out[("view", "click")]["n_trans"] == 2
    assert out[("view", "click")]["p"] == 1.0      # view always → click
    assert out[("click", "view")]["n_trans"] == 1
    assert out[("click", "view")]["n_from"] == 1
