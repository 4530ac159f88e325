"""As-of join semantics: backward inclusive match per key."""

import pytest

from pyspark.sql import functions as F

from db_factfinder_spark.operators.asof import asof_join


def _frames(spark):
    probes = spark.createDataFrame(
        [(1, 10, "u1"), (2, 20, "u1"), (3, 5, "u1"), (4, 15, "u2"),
         (5, 30, "u3")],
        "event_id long, ts long, user_id string",
    )
    quotes = spark.createDataFrame(
        [("u1", 10, 1.5), ("u1", 18, 2.5), ("u2", 15, 7.0), ("u2", 16, 8.0)],
        "user_id string, ts long, value double",
    )
    return probes, quotes


def test_asof_backward_inclusive(spark):
    probes, quotes = _frames(spark)
    out = {r["event_id"]: r["value_asof"] for r in
           asof_join(probes, quotes, on="ts", by="user_id").collect()}
    assert out[1] == 1.5   # quote at the exact probe ts matches (>=)
    assert out[2] == 2.5   # latest prior quote (18 < 20), not the first
    assert out[3] is None  # no quote at-or-before ts=5
    assert out[4] == 7.0   # u2: quote@15 matches, quote@16 is after
    assert out[5] is None  # u3 has no quotes at all


def test_asof_preserves_probe_columns_and_rows(spark):
    probes, quotes = _frames(spark)
    out = asof_join(probes, quotes, on="ts", by="user_id")
    assert out.columns == ["event_id", "ts", "user_id", "value_asof"]
    assert out.count() == probes.count()


# ---------------------------------------------------------------------------
# Bucketed point-in-interval range join
# ---------------------------------------------------------------------------

from db_factfinder_spark.operators.rangejoin import (  # noqa: E402
    point_in_interval_join,
)


def test_range_join_boundaries_and_bucket_straddle(spark):
    points = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 150), (3, "u1", 201), (4, "u2", 150)],
        "pid long, user_id string, t long",
    )
    # interval [100, 200] straddles buckets with width 64; u2 has none
    intervals = spark.createDataFrame(
        [("u1", 100, 200), ("u1", 180, 300)],
        "user_id string, s long, e long",
    )
    pairs = point_in_interval_join(
        points, intervals, by="user_id", t_col="t",
        s_col="s", e_col="e", bucket_width=64,
    )
    got = {(r["pid"], r["s"]) for r in pairs.collect()}
    # inclusive boundaries: t=100 matches s=100; t=201 only the 2nd
    assert got == {(1, 100), (2, 100), (3, 180)}


def test_range_join_no_duplicate_pairs(spark):
    # an interval spanning many buckets must still pair once per point
    points = spark.createDataFrame(
        [(1, "u", 500)], "pid long, user_id string, t long"
    )
    intervals = spark.createDataFrame(
        [("u", 0, 1000)], "user_id string, s long, e long"
    )
    pairs = point_in_interval_join(
        points, intervals, by="user_id", t_col="t",
        s_col="s", e_col="e", bucket_width=10,
    )
    assert pairs.count() == 1


# ---------------------------------------------------------------------------
# Property tests: random corpora vs brute-force references
# ---------------------------------------------------------------------------

from hypothesis import given, settings, HealthCheck  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_row = st.tuples(
    st.integers(min_value=0, max_value=3),     # key
    st.integers(min_value=0, max_value=50),    # ts
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    probes=st.lists(_row, min_size=1, max_size=15),
    quotes=st.lists(_row, min_size=0, max_size=15),
)
def test_asof_matches_bruteforce(spark, probes, quotes):
    from db_factfinder_spark.operators.asof import asof_join

    pdf = spark.createDataFrame(
        [(i, f"u{k}", t) for i, (k, t) in enumerate(probes)],
        "pid long, user_id string, t long",
    )
    # unique (key, ts) quote grain — the operator's documented contract
    qrows = {(k, t): float(k * 100 + t) for k, t in quotes}
    if qrows:
        qdf = spark.createDataFrame(
            [(f"u{k}", t, v) for (k, t), v in qrows.items()],
            "user_id string, t long, value double",
        )
    else:
        qdf = spark.createDataFrame([], "user_id string, t long, value double")
    got = {
        r["pid"]: r["value_asof"]
        for r in asof_join(pdf, qdf, on="t", by="user_id").collect()
    }
    for i, (k, t) in enumerate(probes):
        eligible = [(qt, v) for (qk, qt), v in qrows.items()
                    if qk == k and qt <= t]
        want = max(eligible)[1] if eligible else None
        assert got[i] == want, f"probe {i} (u{k}@{t}): {got[i]} != {want}"


_iv = st.tuples(
    st.integers(min_value=0, max_value=3),     # key
    st.integers(min_value=0, max_value=60),    # start
    st.integers(min_value=0, max_value=25),    # length
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(_row, min_size=1, max_size=12),
    ivs=st.lists(_iv, min_size=0, max_size=12),
    width=st.sampled_from([1, 7, 16, 64]),
)
def test_range_join_matches_bruteforce(spark, points, ivs, width):
    from db_factfinder_spark.operators.rangejoin import point_in_interval_join

    pdf = spark.createDataFrame(
        [(i, f"u{k}", t) for i, (k, t) in enumerate(points)],
        "pid long, user_id string, t long",
    )
    iv_rows = [(f"u{k}", s, s + ln) for k, s, ln in ivs]
    idf = (
        spark.createDataFrame(iv_rows, "user_id string, s long, e long")
        if iv_rows
        else spark.createDataFrame([], "user_id string, s long, e long")
    )
    got = sorted(
        (r["pid"], r["s"], r["e"])
        for r in point_in_interval_join(
            pdf, idf, by="user_id", t_col="t", s_col="s", e_col="e",
            bucket_width=width,
        ).collect()
    )
    want = sorted(
        (i, s, e)
        for i, (k, t) in enumerate(points)
        for (uk, s, e) in iv_rows
        if uk == f"u{k}" and s <= t <= e
    )
    assert got == want


def test_asof_null_valued_quote_wins(spark):
    """A quote whose VALUE is NULL is still the as-of match (DuckDB
    ASOF JOIN semantics) — it must not be skipped in favor of a stale
    earlier value."""
    probes = spark.createDataFrame(
        [(1, 25, "u1")], "event_id long, ts long, user_id string"
    )
    quotes = spark.createDataFrame(
        [("u1", 10, 1.5), ("u1", 20, None)],
        "user_id string, ts long, value double",
    )
    out = asof_join(probes, quotes, on="ts", by="user_id").first()
    assert out["value_asof"] is None  # the t=20 NULL quote, not 1.5


# ------------------------------------------------- interval overlap
def _brute_overlap(L, R):
    return sorted(
        (k, li, ri)
        for (k, li, ls, le) in L
        for (k2, ri, rs, re) in R
        if k == k2 and ls <= re and rs <= le
    )


def test_interval_overlap_matches_bruteforce(spark):
    from db_factfinder_spark.operators.rangejoin import interval_overlap_join
    import random

    rng = random.Random(11)
    L = [(rng.randrange(3), i, s := rng.randrange(0, 500), s + rng.randrange(0, 80))
         for i, _ in enumerate(range(120))]
    R = [(rng.randrange(3), i, s := rng.randrange(0, 500), s + rng.randrange(0, 40))
         for i, _ in enumerate(range(120))]
    ldf = spark.createDataFrame(L, "k long, l_id long, l_start long, l_end long")
    rdf = spark.createDataFrame(R, "k long, r_id long, r_start long, r_end long")
    out = interval_overlap_join(ldf, rdf, by="k", bucket_width=64)
    got = sorted((r["k"], r["l_id"], r["r_id"]) for r in out.collect())
    assert got == _brute_overlap(L, R) and len(got) > 0
    # exactly-once: no duplicate pairs despite multi-bucket overlap
    assert len(got) == len(set(got))


def test_interval_overlap_inclusive_boundary_and_tiny_buckets(spark):
    from db_factfinder_spark.operators.rangejoin import interval_overlap_join

    # touching endpoints (l_end == r_start) overlap inclusively; width
    # far smaller than the spans forces many shared buckets — the
    # charge-to-overlap-start rule must still emit each pair once
    ldf = spark.createDataFrame(
        [(1, 10, 0, 100)], "k long, l_id long, l_start long, l_end long"
    )
    rdf = spark.createDataFrame(
        [(1, 20, 100, 200), (1, 21, 101, 200), (1, 22, 0, 100)],
        "k long, r_id long, r_start long, r_end long",
    )
    out = interval_overlap_join(ldf, rdf, by="k", bucket_width=7)
    got = sorted((r["l_id"], r["r_id"]) for r in out.collect())
    assert got == [(10, 20), (10, 22)]


def test_asof_forward_nearest_and_tolerance(spark):
    """Hand quotes at t=10 and t=20 around probes at 5/12/30:
    backward/forward/nearest and tolerance behave per merge_asof."""
    from db_factfinder_spark.operators.asof import asof_join

    probes = spark.createDataFrame(
        [(1, "u", 5), (2, "u", 12), (3, "u", 30), (4, "u", 15)],
        "pid long, user_id string, ts long",
    )
    quotes = spark.createDataFrame(
        [("u", 10, 100), ("u", 20, 200)],
        "user_id string, ts long, value long",
    )

    def run(**kw):
        return {
            r["pid"]: r["value_asof"]
            for r in asof_join(probes, quotes, **kw).collect()
        }

    assert run() == {1: None, 2: 100, 3: 200, 4: 100}
    assert run(direction="forward") == {1: 100, 2: 200, 3: None, 4: 200}
    # nearest: probe 15 is equidistant (gap 5 both ways) → backward
    assert run(direction="nearest") == {1: 100, 2: 100, 3: 200, 4: 100}
    # tolerance 5: probe 30's backward match (gap 10) drops out
    assert run(tolerance=5) == {1: None, 2: 100, 3: None, 4: 100}
    assert run(direction="forward", tolerance=5) == {
        1: 100, 2: None, 3: None, 4: 200
    }
    with pytest.raises(ValueError):
        asof_join(probes, quotes, direction="sideways")


def test_asof_nearest_tolerance_both_sides(spark):
    from db_factfinder_spark.operators.asof import asof_join

    probes = spark.createDataFrame(
        [(1, "u", 14)], "pid long, user_id string, ts long"
    )
    quotes = spark.createDataFrame(
        [("u", 10, 100), ("u", 16, 200)],
        "user_id string, ts long, value long",
    )
    out = asof_join(
        probes, quotes, direction="nearest", tolerance=3
    ).collect()[0]
    # backward gap 4 > tol, forward gap 2 ≤ tol → forward wins
    assert out["value_asof"] == 200
