"""Tests for the scale-path operators: Bloom semi-join pruning,
Misra–Gries heavy hitters, time-series gap fill."""

import pytest
from pyspark.sql import functions as F

from db_factfinder_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)
from db_factfinder_spark.operators.timeseries import gap_fill_daily
from db_factfinder_spark.llmdata.sketches import heavy_hitters


# ------------------------------------------------------------- bloom
def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", m_bits=1 << 12, k=5)
    hits = keys.filter(
        bloom_might_contain(F.col("k"), words, 1 << 12, 5)
    ).count()
    assert hits == 500  # a Bloom filter can never miss a member


def test_bloom_semi_join_exact_even_with_saturated_bitmap(spark):
    """With m_bits tiny the bitmap saturates (≈100% false positives);
    the exact semi-join must still make the result identical to the
    plain semi-join."""
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    build = spark.range(0, 1000, 7).select(F.col("id").alias("b"))
    got = sorted(
        r["k"]
        for r in bloom_semi_join(probe, build, "k", "b", m_bits=64).collect()
    )
    want = sorted(range(0, 1000, 7))
    assert got == want


def test_bloom_prunes_most_nonmembers(spark):
    """At 10 bits/key the FP rate should be ~1%: the pruned probe side
    must be close to the true match count — the whole point of the
    operator is that non-members die before the join."""
    probe = spark.range(0, 10_000).select(F.col("id").alias("k"))
    build = spark.range(0, 100).select(F.col("id").alias("b"))
    words = bloom_build(build.select(F.col("b").alias("k")), "k", 1 << 12, 5)
    passed = probe.filter(
        bloom_might_contain(F.col("k"), words, 1 << 12, 5)
    ).count()
    assert 100 <= passed < 600  # 100 members + a few hundred FPs max


# ----------------------------------------------------- heavy hitters
def test_heavy_hitters_exact_on_skewed_stream(spark):
    # 600×'hot', 250×'warm', 150 singletons → n=1000; k=4 ⇒
    # threshold n/5 = 200: {hot, warm} qualify, nothing else.
    rows = (
        [("hot",)] * 600 + [("warm",)] * 250 + [(f"u{i}",) for i in range(150)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = {
        r["item"]: r["n_item"]
        for r in heavy_hitters(df, "item", k=4).collect()
    }
    assert got == {"hot": 600, "warm": 250}


def test_heavy_hitters_ignores_nulls(spark):
    rows = [("a",)] * 10 + [(None,)] * 90
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {(r["item"], r["n_item"], r["n_total"])
           for r in heavy_hitters(df, "item", k=3).collect()}
    assert got == {("a", 10, 10)}  # NULLs are not items, n excludes them


def test_heavy_hitters_partition_invariant(spark):
    rows = [("x",)] * 300 + [("y",)] * 100 + [(f"z{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "item string")
    a = sorted(
        (r["item"], r["n_item"])
        for r in heavy_hitters(df.repartition(1), "item", k=4).collect()
    )
    b = sorted(
        (r["item"], r["n_item"])
        for r in heavy_hitters(df.repartition(16), "item", k=4).collect()
    )
    assert a == b and ("x", 300) in a


# ---------------------------------------------------------- gap fill
def test_gap_fill_zeros_and_forward_fill(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0),
            (1, "2024-01-01 11:00:00", 7.0),
            (1, "2024-01-04 09:00:00", 2.0),
            (2, "2024-01-02 00:00:00", 1.0),
        ],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    out = {
        (r["user_id"], str(r["day"])): r
        for r in gap_fill_daily(df).collect()
    }
    assert len(out) == 5  # user1 spans 4 days, user2 spans 1
    assert out[(1, "2024-01-01")]["n_events"] == 2
    assert out[(1, "2024-01-02")]["n_events"] == 0
    assert out[(1, "2024-01-02")]["day_max"] is None
    assert out[(1, "2024-01-02")]["ff_value"] == 7.0  # carried forward
    assert out[(1, "2024-01-04")]["ff_value"] == 2.0  # replaced by new obs
    assert out[(2, "2024-01-02")]["n_events"] == 1


def test_gap_fill_partition_invariant(spark):
    df = (
        spark.range(0, 200)
        .select(
            (F.col("id") % 7).alias("user_id"),
            F.to_timestamp(
                F.concat(
                    F.lit("2024-01-"),
                    F.lpad(((F.col("id") * 3) % 25 + 1).cast("string"), 2, "0"),
                    F.lit(" 12:00:00"),
                )
            ).alias("ts"),
            (F.col("id") % 13).cast("double").alias("value"),
        )
    )
    a = sorted(map(tuple, gap_fill_daily(df.repartition(1)).collect()))
    b = sorted(map(tuple, gap_fill_daily(df.repartition(16)).collect()))
    assert a == b and len(a) > 0


# ----------------------------------------------------------- skyline
def _brute_skyline(points):
    out = []
    for (pid, c, g) in points:
        dominated = any(
            bc <= c and bg >= g and (bc < c or bg > g)
            for (_, bc, bg) in points
        )
        if not dominated:
            out.append((pid, c, g))
    return sorted(out)


def test_skyline_matches_bruteforce(spark):
    from db_factfinder_spark.operators.skyline import skyline2d
    import random

    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 40), rng.randrange(0, 40)) for i in range(300)]
    df = spark.createDataFrame(pts, "id long, cost long, gain long")
    got = sorted(
        (r["id"], r["cost"], r["gain"])
        for r in skyline2d(df, "cost", "gain").collect()
    )
    assert got == _brute_skyline(pts) and len(got) > 0


def test_skyline_keeps_duplicate_frontier_points(spark):
    from db_factfinder_spark.operators.skyline import skyline2d

    df = spark.createDataFrame(
        [(1, 5, 9), (2, 5, 9), (3, 5, 8), (4, 6, 9), (5, 4, 1)],
        "id long, cost long, gain long",
    )
    got = sorted(r["id"] for r in skyline2d(df, "cost", "gain").collect())
    # (5,9) twins both survive (neither strictly dominates the other);
    # (5,8) and (6,9) dominated; (4,1) is cheapest → frontier
    assert got == [1, 2, 5]


def test_skyline_excludes_null_coordinates(spark):
    from db_factfinder_spark.operators.skyline import skyline2d

    df = spark.createDataFrame(
        [(1, None, 9), (2, 5, None), (3, 5, 9)],
        "id long, cost long, gain long",
    )
    got = [r["id"] for r in skyline2d(df, "cost", "gain").collect()]
    assert got == [3]


# ------------------------------------------------------- two-hop reach
def test_two_hop_counts_path_graph(spark):
    from db_factfinder_spark.llmdata.components import two_hop_counts

    # path 1-2-3-4-5: reach2(1)={2,3}, reach2(3)={1,2,4,5}
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r["src"]: r["n_reach"] for r in two_hop_counts(df).collect()}
    assert got == {1: 2, 2: 3, 3: 4, 4: 3, 5: 2}


def test_two_hop_counts_dedupes_and_drops_selfloops(spark):
    from db_factfinder_spark.llmdata.components import two_hop_counts

    # duplicate edges, reversed duplicates, and a self-loop must not
    # inflate the distinct reach; triangle 1-2-3: everyone reaches 2
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1)],
        "src long, dst long",
    )
    got = {r["src"]: r["n_reach"] for r in two_hop_counts(df).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


# ------------------------------------------------ adaptive skew join
def test_adaptive_salted_join_equals_plain(spark):
    from db_factfinder_spark.operators.skew import adaptive_salted_join

    big = spark.range(0, 5000).select(
        (F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 7)).alias(
            "k"
        ),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(7)], "dk long, name string"
    )
    got = (
        adaptive_salted_join(big, small, "k", "dk", hot_threshold=1000)
        .groupBy("name")
        .count()
        .collect()
    )
    want = (
        big.join(small, big["k"] == small["dk"])
        .groupBy("name")
        .count()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_adaptive_salted_join_no_hot_keys_falls_back(spark):
    from db_factfinder_spark.operators.skew import adaptive_salted_join

    big = spark.range(0, 100).select((F.col("id") % 10).alias("k"),
                                     F.col("id").alias("v"))
    small = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "dk long, w long"
    )
    out = adaptive_salted_join(big, small, "k", "dk", hot_threshold=10_000)
    assert out.count() == 100 and "w" in out.columns


# ------------------------------------------------- NULL-robustness
def test_bloom_semi_join_null_probe_keys_dropped(spark):
    from db_factfinder_spark.operators.bloom import bloom_semi_join

    probe = spark.createDataFrame(
        [(1,), (None,), (2,)], "k long"
    )
    build = spark.createDataFrame([(1,), (2,)], "b long")
    got = sorted(
        r["k"] for r in bloom_semi_join(probe, build, "k", "b", m_bits=64).collect()
    )
    assert got == [1, 2]  # NULL never equi-matches; bloom must agree


def test_gap_fill_null_values_dont_break_forward_fill(spark):
    from db_factfinder_spark.operators.timeseries import gap_fill_daily

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 4.0),
            (1, "2024-01-02 10:00:00", None),
            (1, "2024-01-03 10:00:00", None),
        ],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    out = {str(r["day"]): r for r in gap_fill_daily(df).collect()}
    # day2/3 active but valueless: day_max NULL, ff carries day1's max
    assert out["2024-01-02"]["n_events"] == 1
    assert out["2024-01-02"]["day_max"] is None
    assert out["2024-01-02"]["ff_value"] == 4.0
    assert out["2024-01-03"]["ff_value"] == 4.0


def test_heavy_hitters_empty_input(spark):
    from db_factfinder_spark.llmdata.sketches import heavy_hitters

    df = spark.createDataFrame([], "item string")
    assert heavy_hitters(df, "item", k=4).count() == 0


def test_twap_hand_computed(spark):
    from db_factfinder_spark.operators.timeseries import twap

    # u1: v=1.00 for 10s, v=3.00 for 30s, final obs no weight
    #     → (100·10 + 300·30)/40 = 250.0 cents
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:00:10", 3.0),
            (1, "2024-01-01 00:00:40", 9.0),
            (2, "2024-01-01 00:00:00", 5.0),  # single obs: zero span
        ],
        "user_id int, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    out = {r["key"]: r for r in twap(df).collect()}
    assert out[1]["twap_c"] == 250.0
    assert out[1]["span_s"] == 40 and out[1]["n_obs"] == 3
    assert out[2]["twap_c"] is None and out[2]["span_s"] == 0


def test_ohlc_bars_open_close_ties(spark):
    from db_factfinder_spark.operators.timeseries import ohlc_bars

    # two rows share the opening timestamp: the tie breaks on value
    # (smaller value wins min-struct → open), deterministic
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", 7.0),
            (1, "2024-01-01 09:00:00", 3.0),
            (1, "2024-01-01 12:00:00", 10.0),
            (1, "2024-01-01 15:00:00", 5.0),
            (1, "2024-01-02 09:00:00", 2.0),
        ],
        "user_id int, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    out = {r["bar"].day: r for r in ohlc_bars(df).collect()}
    d1 = out[1]
    assert (d1["open_c"], d1["high_c"], d1["low_c"], d1["close_c"]) == (
        300, 1000, 300, 500,
    )
    assert d1["n"] == 4
    d2 = out[2]
    assert (d2["open_c"], d2["close_c"]) == (200, 200)


def test_cumulative_uniques_counts_first_seen_once(spark):
    from db_factfinder_spark.operators.timeseries import (
        cumulative_uniques,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-03 10:00:00"),  # repeat — not a new unique
            (2, "2024-01-01 11:00:00"),
            (3, "2024-01-03 09:00:00"),
        ],
        "user_id int, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    rows = {str(r["day"]): r for r in cumulative_uniques(df).collect()}
    assert rows["2024-01-01"]["new_keys"] == 2
    assert rows["2024-01-01"]["total_keys"] == 2
    assert rows["2024-01-03"]["new_keys"] == 1
    assert rows["2024-01-03"]["total_keys"] == 3
