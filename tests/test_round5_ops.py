"""Round-5 operators: randomized brute-force cross-checks (the
asof/funnel test strategy) for gini/cardinality, fixed-fixture truth
tables for zone maps and phrase search."""

import pytest

from pyspark.sql import functions as F

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_factfinder_spark.operators.cardinality import equi_join_cardinality
from db_factfinder_spark.operators.concentration import gini_concentration
from db_factfinder_spark.operators.zonemap import zone_map_stats
from db_factfinder_spark.llmdata.textstats import phrase_search

_grow = st.tuples(
    st.integers(min_value=0, max_value=2),     # group
    st.integers(min_value=0, max_value=1000),  # cents
)


def _gini_brute(xs):
    xs = sorted(xs)
    n, s = len(xs), sum(xs)
    si = sum(i * x for i, x in enumerate(xs, start=1))
    return float(2 * si - (n + 1) * s) / float(n * s)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_grow, min_size=1, max_size=40))
def test_gini_matches_bruteforce(spark, rows):
    # keep every group's sum positive (gini undefined at all-zero)
    rows = [(g, c + 1) for g, c in rows]
    df = spark.createDataFrame(
        [(g, c, i) for i, (g, c) in enumerate(rows)],
        "g int, cents long, id long",
    )
    got = {
        r["g"]: (r["n"], r["gini"])
        for r in gini_concentration(df, "g", F.col("cents"), "id").collect()
    }
    by_g = {}
    for g, c in rows:
        by_g.setdefault(g, []).append(c)
    for g, xs in by_g.items():
        assert got[g][0] == len(xs)
        assert got[g][1] == _gini_brute(xs)


def test_gini_known_values(spark):
    # perfectly equal values → G = 0; [0,...,0,1] → G = (n-1)/n
    eq = spark.createDataFrame(
        [(0, 7, i) for i in range(4)], "g int, cents long, id long"
    )
    assert gini_concentration(eq, "g", F.col("cents"), "id").first()[
        "gini"
    ] == 0.0
    onehot = spark.createDataFrame(
        [(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 5, 3)],
        "g int, cents long, id long",
    )
    assert gini_concentration(onehot, "g", F.col("cents"), "id").first()[
        "gini"
    ] == 0.75


_krow = st.integers(min_value=0, max_value=5)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lk=st.lists(_krow, min_size=1, max_size=25),
    rk=st.lists(_krow, min_size=1, max_size=25),
)
def test_join_cardinality_matches_actual_join(spark, lk, rk):
    left = spark.createDataFrame([(k,) for k in lk], "k long")
    right = spark.createDataFrame([(k,) for k in rk], "k long")
    got = equi_join_cardinality(left, right, "k", "k").first()
    actual = left.join(right, "k").count()
    if actual == 0:
        assert got["n_keys"] == 0 and (
            got["est_rows"] is None or got["est_rows"] == 0
        )
        return
    assert got["est_rows"] == actual
    prods = {
        k: lk.count(k) * rk.count(k)
        for k in set(lk) & set(rk)
    }
    assert got["n_keys"] == len(prods)
    assert got["max_key_product"] == max(prods.values())
    assert got["skew_ratio"] == float(
        max(prods.values()) * len(prods)
    ) / float(actual)


def test_zone_map_stats_prune_flags(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 6), ("b", 9)], "b string, v long"
    )
    out = {
        r["bucket"]: r
        for r in zone_map_stats(
            df,
            F.col("b"),
            {"v": F.col("v")},
            {
                "p_gt5": ("v", ">", 5),    # skip when max <= 5
                "p_ge6": ("v", ">=", 6),   # skip when max < 6
                "p_lt6": ("v", "<", 6),    # skip when min >= 6
                "p_le5": ("v", "<=", 5),   # skip when min > 5
            },
        ).collect()
    }
    a, b = out["a"], out["b"]
    assert (a["n_rows"], a["min_v"], a["max_v"]) == (2, 1, 5)
    assert (a["p_gt5"], a["p_ge6"], a["p_lt6"], a["p_le5"]) == (
        True, True, False, False,
    )
    assert (b["p_gt5"], b["p_ge6"], b["p_lt6"], b["p_le5"]) == (
        False, False, True, True,
    )


def test_zone_map_stats_rejects_bad_op(spark):
    df = spark.createDataFrame([("a", 1)], "b string, v long")
    with pytest.raises(ValueError, match="unsupported op"):
        zone_map_stats(
            df, F.col("b"), {"v": F.col("v")}, {"p": ("v", "==", 1)}
        ).collect()


def test_phrase_search_counts_and_overlaps(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash join is a hash join thing"),   # 2 hits
            (2, "join hash"),                        # reversed: 0
            (3, "a a a a"),                          # overlapping "a a": 3
            (4, None),
            (5, "Hash  JOIN, now"),                  # normalization: 1
        ],
        "doc_id long, text string",
    )
    two = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_search(docs, ["hash", "join"]).collect()
    }
    assert two == {1: 2, 5: 1}
    over = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_search(docs, ["a", "a"]).collect()
    }
    assert over == {3: 3}  # overlapping occurrences each count
    tri = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_search(docs, ["hash", "join", "is"]).collect()
    }
    assert tri == {1: 1}


def test_phrase_search_rejects_short_phrase(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="phrase needs"):
        phrase_search(docs, ["x"])


def test_bigram_lm_known_counts(spark):
    from db_factfinder_spark.llmdata.textstats import bigram_lm

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x"), (4, None)],
        "doc_id long, text string",
    )
    rows = {
        (r["w1"], r["w2"]): r for r in bigram_lm(docs).collect()
    }
    # bigrams: (a,b)x3, (b,a)x1, (b,c)x1; vocab = {a,b,c,x} = 4
    assert rows[("a", "b")]["c_bigram"] == 3
    assert rows[("b", "a")]["c_bigram"] == 1
    assert rows[("b", "c")]["c_bigram"] == 1
    assert set(rows) == {("a", "b"), ("b", "a"), ("b", "c")}
    assert rows[("a", "b")]["c_prev"] == 3
    assert rows[("b", "a")]["c_prev"] == 2
    assert rows[("a", "b")]["vocab"] == 4
    assert rows[("a", "b")]["p_smoothed"] == 4.0 / 7.0
    assert rows[("b", "c")]["p_smoothed"] == 2.0 / 6.0


_evrow = st.tuples(
    st.integers(min_value=0, max_value=2),      # user
    st.integers(min_value=0, max_value=50),     # ts seconds
    st.sampled_from(["click", "view", "purchase", "error"]),
    st.integers(min_value=-999, max_value=999), # value cents (refunds too)
    st.integers(min_value=0, max_value=9),      # channel k
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_evrow, min_size=1, max_size=30))
def test_linear_attribution_conserves_cents(spark, rows):
    """The operator's contract: Σ credited_cents over all channels
    (incl. direct −1) equals Σ purchase cents exactly — the
    largest-remainder split leaks nothing."""
    from db_factfinder_spark.operators.funnel import linear_attribution

    data = [
        (i, u, f"1970-01-01 00:00:{s:02d}"[:19], et, c / 100.0,
         '{"k": %d}' % k)
        for i, (u, s, et, c, k) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, user_id long, ts_s string, event_type string,"
        " value double, props string",
    ).select(
        "event_id", "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type", "value", "props",
    )
    out = linear_attribution(
        ev, ["click", "view"], "purchase", horizon_us=10_000_000,
        channel=F.get_json_object("props", "$.k").cast("int") % 5,
    ).collect()
    total_purchases = sum(c for (_, _, et, c, _) in rows if et == "purchase")
    assert sum(r["credited_cents"] or 0 for r in out) == total_purchases
    # credits are exact integers (negative allowed: refund conversions)
    assert all(
        isinstance(r["credited_cents"], int) for r in out
    )


def test_linear_attribution_split_and_direct(spark):
    from db_factfinder_spark.operators.funnel import linear_attribution

    # user 1: 3 touches then a 100.04 purchase → 3335/3335/3334 split;
    # user 2: purchase with no touch → direct; a touch AFTER the
    # purchase gets nothing.
    ev = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:00", "click", 0.0, '{"k": 0}'),
            (2, 1, "2024-01-01 10:00:01", "view", 0.0, '{"k": 1}'),
            (3, 1, "2024-01-01 10:00:02", "click", 0.0, '{"k": 2}'),
            (4, 1, "2024-01-01 10:00:03", "purchase", 100.04, "{}"),
            (5, 2, "2024-01-01 11:00:00", "purchase", 7.00, "{}"),
            (6, 2, "2024-01-01 12:00:00", "click", 0.0, '{"k": 3}'),
        ],
        "event_id long, user_id long, s string, event_type string,"
        " value double, props string",
    ).select(
        "event_id", "user_id", F.col("s").cast("timestamp").alias("ts"),
        "event_type", "value", "props",
    )
    out = {
        r["channel"]: (r["n_credits"], r["credited_cents"])
        for r in linear_attribution(
            ev, ["click", "view"], "purchase", horizon_us=3_600_000_000,
            channel=F.get_json_object("props", "$.k").cast("int") % 5,
        ).collect()
    }
    # 10004 = 3334*3 + 2 → first two touches get 3335
    assert out[0] == (1, 3335)
    assert out[1] == (1, 3335)
    assert out[2] == (1, 3334)
    assert out[-1] == (1, 700)
    assert 3 not in out  # post-purchase touch uncredited


_runrow = st.tuples(
    st.integers(min_value=0, max_value=1),  # user
    st.integers(min_value=0, max_value=20), # ts seconds
    st.sampled_from(["a", "b", "c"]),
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_runrow, min_size=1, max_size=25))
def test_event_runs_matches_bruteforce(spark, rows):
    from db_factfinder_spark.operators.funnel import event_runs

    data = [
        (i, u, f"1970-01-01 00:00:{s:02d}", t)
        for i, (u, s, t) in enumerate(rows)
    ]
    ev = spark.createDataFrame(
        data, "event_id long, user_id long, s string, event_type string"
    ).select(
        "event_id", "user_id",
        F.col("s").cast("timestamp").alias("ts"), "event_type",
    )
    got = {
        (r["user_id"], r["run_seq"]):
            (r["state"], r["run_len"], r["start_us"], r["end_us"])
        for r in event_runs(ev).collect()
    }
    # brute force RLE per user over (ts, event_id) order
    by_u = {}
    for i, (u, s, t) in enumerate(rows):
        by_u.setdefault(u, []).append((s * 1_000_000, i, t))
    exp = {}
    for u, evs in by_u.items():
        evs.sort()
        seq = 0
        prev = object()
        for us, _, t in evs:
            if t != prev:
                seq += 1
                exp[(u, seq)] = [t, 0, us, us]
                prev = t
            exp[(u, seq)][1] += 1
            exp[(u, seq)][3] = us
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_sequence_gaps_known(spark):
    from db_factfinder_spark.operators.quality import sequence_gaps

    df = spark.createDataFrame(
        [(1,), (2,), (5,), (6,), (9,), (9,)], "x long"
    )
    got = sorted(
        (r["gap_start"], r["gap_end"], r["missing"])
        for r in sequence_gaps(df, "x").collect()
    )
    assert got == [(3, 4, 2), (7, 8, 2)]
    # dense sequence → no gaps
    dense = spark.createDataFrame([(i,) for i in range(5)], "x long")
    assert sequence_gaps(dense, "x").count() == 0
    # single id → no gaps
    one = spark.createDataFrame([(42,)], "x long")
    assert sequence_gaps(one, "x").count() == 0


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.sets(st.integers(min_value=0, max_value=40), min_size=1))
def test_sequence_gaps_matches_bruteforce(spark, ids):
    from db_factfinder_spark.operators.quality import sequence_gaps

    df = spark.createDataFrame([(i,) for i in ids], "x long")
    got = sorted(
        (r["gap_start"], r["gap_end"], r["missing"])
        for r in sequence_gaps(df, "x").collect()
    )
    s = sorted(ids)
    exp = [
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(s, s[1:]) if b > a + 1
    ]
    assert got == exp


def test_sequence_gaps_ignores_nulls(spark):
    from db_factfinder_spark.operators.quality import sequence_gaps

    df = spark.createDataFrame(
        [(1,), (None,), (4,), (None,)], "x long"
    )
    got = sorted(
        (r["gap_start"], r["gap_end"], r["missing"])
        for r in sequence_gaps(df, "x").collect()
    )
    assert got == [(2, 3, 2)]


def test_join_cardinality_self_fast_path(spark):
    """`left is right` takes the single-histogram path: same answer,
    one scan, no count-table join."""
    df = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 5]], "k long")
    got = equi_join_cardinality(df, df, "k", "k").first()
    assert (got["n_keys"], got["est_rows"], got["max_key_product"]) == (
        3, 9 + 1 + 1, 9,
    )
    plan = equi_join_cardinality(
        df, df, "k", "k"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_poisson_weight_distribution_and_determinism(spark):
    from db_factfinder_spark.operators.bootstrap import poisson_weight

    df = spark.range(0, 20_000)
    w = df.select(
        poisson_weight(F.col("id").cast("string"), 0).alias("w")
    )
    counts = {r["w"]: r["count"] for r in w.groupBy("w").count().collect()}
    n = 20_000
    # Poisson(1): P(0)=P(1)≈0.368, P(2)≈0.184 — wide tolerance, the
    # md5-uniform just has to look Poisson-ish, not pass a GOF test
    assert abs(counts[0] / n - 0.368) < 0.02
    assert abs(counts[1] / n - 0.368) < 0.02
    assert abs(counts[2] / n - 0.184) < 0.02
    assert max(counts) <= 5
    # deterministic: same draw twice, different draw per resample id
    again = {
        r["w"]: r["count"]
        for r in df.select(
            poisson_weight(F.col("id").cast("string"), 0).alias("w")
        ).groupBy("w").count().collect()
    }
    assert again == counts
    other = {
        r["w"]: r["count"]
        for r in df.select(
            poisson_weight(F.col("id").cast("string"), 1).alias("w")
        ).groupBy("w").count().collect()
    }
    assert other != counts  # same marginal, different assignment


def test_poisson_bootstrap_ci_contains_mean(spark):
    from db_factfinder_spark.operators.bootstrap import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame(
        [(0, i, 100 + (i * 37) % 50) for i in range(400)],
        "g int, id long, cents long",
    )
    row = poisson_bootstrap_ci(
        df, ["g"], F.col("cents"), F.col("id").cast("string"), b=32,
        trim=1,
    ).first()
    assert row["n"] == 400
    assert row["ci_lo"] <= row["mean"] <= row["ci_hi"]
    # interval is tight for n=400, low-variance data
    assert row["ci_hi"] - row["ci_lo"] < 10.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="2\\*trim"):
        poisson_bootstrap_ci(
            df, ["g"], F.col("cents"), F.col("id"), b=4, trim=2
        )


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(
        st.sampled_from(["x", "y", "z"]), min_size=1, max_size=30
    ),
    k=st.integers(min_value=1, max_value=5),
)
def test_proximity_search_matches_bruteforce(spark, toks, k):
    from db_factfinder_spark.llmdata.textstats import (
        build_postings,
        proximity_search,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_pairs"]
        for r in proximity_search(
            build_postings(docs), "x", "y", k=k
        ).collect()
    }
    exp = sum(
        1
        for i, a in enumerate(toks)
        for j, b in enumerate(toks)
        if a == "x" and b == "y" and abs(i - j) <= k
    )
    assert got.get(1, 0) == exp


def test_proximity_search_rejects_bad_args(spark):
    from db_factfinder_spark.llmdata.textstats import (
        build_postings,
        proximity_search,
    )

    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    p = build_postings(docs)
    with pytest.raises(ValueError, match="terms must differ"):
        proximity_search(p, "x", "x", k=2)
    with pytest.raises(ValueError, match="k must be"):
        proximity_search(p, "x", "y", k=0)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 99), st.booleans()),
        min_size=0, max_size=20,
    ),
    b=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9), st.booleans()),
        min_size=0, max_size=10,
    ),
)
def test_incremental_join_row_identical_to_recompute(spark, a, b):
    """The delta rule must reproduce the full join ROW-FOR-ROW (as a
    multiset), however the old/delta split falls."""
    from db_factfinder_spark.operators.incremental import (
        incremental_join_update,
    )

    A = spark.createDataFrame(
        [(k, v, d) for k, v, d in a] or [(None, None, None)],
        "ak int, av int, a_is_delta boolean",
    ).filter(F.col("ak").isNotNull())
    B = spark.createDataFrame(
        [(k, v, d) for k, v, d in b] or [(None, None, None)],
        "bk int, bv int, b_is_delta boolean",
    ).filter(F.col("bk").isNotNull())
    a_old, a_delta = A.filter(~F.col("a_is_delta")), A.filter("a_is_delta")
    b_old, b_delta = B.filter(~F.col("b_is_delta")), B.filter("b_is_delta")
    prev = a_old.join(b_old, a_old["ak"] == b_old["bk"])
    view = incremental_join_update(
        prev, a_delta, b_delta, a_old, b_old, "ak", "bk"
    ).select("ak", "av", "a_is_delta", "bk", "bv", "b_is_delta")
    full = A.join(B, A["ak"] == B["bk"]).select(
        "ak", "av", "a_is_delta", "bk", "bv", "b_is_delta"
    )
    got = sorted(map(tuple, view.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
    )
)
def test_global_rank_matches_single_partition_window(spark, vals):
    from db_factfinder_spark.operators.ranking import global_rank

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v long, id long"
    )
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, ["v", "id"], partitions=4).collect()
    }
    order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
    want = {i: k + 1 for k, i in enumerate(order)}
    assert got == want


def test_global_rank_plan_has_no_unpartitioned_window(spark):
    from db_factfinder_spark.operators.ranking import global_rank

    df = spark.range(0, 1000).withColumn("v", F.col("id") % 97)
    ranked = global_rank(df, ["v", "id"], partitions=8)
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = ranked._jdf.queryExecution().explainString(
        jvm.fromString("formatted")
    )
    for line in plan.splitlines():
        if line.strip().startswith("Window ") or "] Window" in line:
            assert "__pid" in line, f"unpartitioned window:\n{line}"


def test_quantile_normalize_single_group_is_identity(spark):
    from db_factfinder_spark.operators.ranking import quantile_normalize

    df = spark.createDataFrame(
        [("a", v, i) for i, v in enumerate([5, 1, 9, 1, 7])],
        "g string, x long, id long",
    )
    out = quantile_normalize(df, "g", "x", "id", partitions=3).collect()
    # one group: r == global rank position, ceil(r*N/N) = r → identity
    assert all(r["x"] == r["norm"] for r in out)
    assert len(out) == 5


def test_quantile_normalize_pulls_groups_to_common_scale(spark):
    from db_factfinder_spark.operators.ranking import quantile_normalize

    # group "lo" = {1,2,3}, "hi" = {101,102,103}: after normalization
    # both groups' medians map to the same global quantile values
    df = spark.createDataFrame(
        [("lo", 1, 0), ("lo", 2, 1), ("lo", 3, 2),
         ("hi", 101, 3), ("hi", 102, 4), ("hi", 103, 5)],
        "g string, x long, id long",
    )
    out = {
        (r["g"], r["x"]): r["norm"]
        for r in quantile_normalize(df, "g", "x", "id", partitions=2).collect()
    }
    # r/ng = 1/3, 2/3, 3/3 → global idx 2, 4, 6 for BOTH groups;
    # global sorted values [1,2,3,101,102,103] → norms 2, 101, 103
    assert out[("lo", 1)] == out[("hi", 101)] == 2
    assert out[("lo", 2)] == out[("hi", 102)] == 101
    assert out[("lo", 3)] == out[("hi", 103)] == 103


def test_log2_histogram_buckets_and_bounds(spark):
    from db_factfinder_spark.operators.quality import log2_histogram

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 7), ("a", 8), ("a", None),
         ("a", 0), ("b", 1024)],
        "g string, v long",
    )
    out = {
        (r["g"], r["bucket"]): (r["lo"], r["hi"], r["n"], r["min_v"], r["max_v"])
        for r in log2_histogram(df, ["g"], "v").collect()
    }
    assert out[("a", 1)] == (1, 1, 1, 1, 1)       # [1,1]
    assert out[("a", 2)] == (2, 3, 2, 2, 3)       # [2,3]
    assert out[("a", 3)] == (4, 7, 1, 7, 7)       # [4,7]
    assert out[("a", 4)] == (8, 15, 1, 8, 8)      # [8,15]
    assert out[("b", 11)] == (1024, 2047, 1, 1024, 1024)
    # NULL and non-positive rows dropped, never silently binned
    assert sum(v[2] for k, v in out.items() if k[0] == "a") == 5


def test_longest_prefix_match_picks_most_specific(spark):
    from db_factfinder_spark.operators.lpm import longest_prefix_match

    facts = spark.createDataFrame(
        [(1, "abcdef"), (2, "abzzzz"), (3, "zzzzzz"), (4, "abcdzz")],
        "id long, k string",
    )
    rules = spark.createDataFrame(
        [("ab", "R-ab"), ("abcd", "R-abcd"), ("abcdef", "R-exact")],
        "pfx string, payload string",
    )
    out = {
        r["id"]: (r["rule_len"], r["payload"])
        for r in longest_prefix_match(
            facts, "k", rules, "pfx", "payload", lengths=[2, 4, 6]
        ).collect()
    }
    assert out[1] == (6, "R-exact")   # all three match; longest wins
    assert out[2] == (2, "R-ab")      # only the 2-prefix matches
    assert out[4] == (4, "R-abcd")
    assert 3 not in out               # no rule at any level → dropped


def test_longest_prefix_match_rejects_bad_lengths(spark):
    from db_factfinder_spark.operators.lpm import longest_prefix_match

    df = spark.createDataFrame([(1, "a")], "id long, k string")
    with pytest.raises(ValueError, match="lengths"):
        longest_prefix_match(df, "k", df, "k", "k", lengths=[2, 2])
    with pytest.raises(ValueError, match="lengths"):
        longest_prefix_match(df, "k", df, "k", "k", lengths=[])


# ---- grouped AUC (q206) ----------------------------------------------

from db_factfinder_spark.operators.evaluation import grouped_auc

_aucrow = st.tuples(
    st.integers(min_value=0, max_value=1),    # group
    st.booleans(),                            # label
    st.integers(min_value=0, max_value=8),    # score (small → many ties)
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_aucrow, min_size=1, max_size=40))
def test_grouped_auc_matches_pair_counting(spark, rows):
    df = spark.createDataFrame(
        [(g, b, s) for g, b, s in rows], "g int, y boolean, s long"
    )
    got = {
        r["g"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in grouped_auc(df, ["g"], "y", "s").collect()
    }
    by_g = {}
    for g, y, s in rows:
        by_g.setdefault(g, []).append((y, s))
    for g, obs in by_g.items():
        pos = [s for y, s in obs if y]
        neg = [s for y, s in obs if not y]
        n_pos, n_neg, auc = got[g]
        assert (n_pos, n_neg) == (len(pos), len(neg))
        if not pos or not neg:
            assert auc is None
        else:
            # numerator 2·wins + ties is exact; divide once like the op
            num2 = sum(
                2 if p > n else (1 if p == n else 0)
                for p in pos for n in neg
            )
            assert auc == num2 / (2 * len(pos) * len(neg))


def test_grouped_auc_perfect_separation(spark):
    df = spark.createDataFrame(
        [(1, True, 100), (1, True, 90), (1, False, 10), (1, False, 5)],
        "g int, y boolean, s long",
    )
    [r] = grouped_auc(df, ["g"], "y", "s").collect()
    assert r["auc"] == 1.0


# ---- sequential pairs (q207) -----------------------------------------

from db_factfinder_spark.operators.funnel import (
    sequential_pairs,
    transition_matrix,
)

_seq = st.lists(
    st.integers(min_value=0, max_value=3), min_size=0, max_size=10
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seqs=st.lists(_seq, min_size=1, max_size=5),
       gap=st.integers(min_value=1, max_value=4))
def test_sequential_pairs_matches_bruteforce(spark, seqs, gap):
    rows, eid = [], 0
    for u, seq in enumerate(seqs):
        for i, ev in enumerate(seq):
            rows.append((u, i, eid, f"e{ev}"))
            eid += 1
    if not rows:
        return
    df = spark.createDataFrame(
        [(u, f"2024-01-01 00:00:{i:02d}", e, t) for u, i, e, t in rows],
        "user_id long, ts string, event_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["a"], r["b"]): (r["n_pairs"], r["n_keys"])
        for r in sequential_pairs(df, max_gap=gap).collect()
    }
    want, keys = {}, {}
    for u, seq in enumerate(seqs):
        for i in range(len(seq)):
            for j in range(i + 1, min(i + gap, len(seq) - 1) + 1):
                k = (f"e{seq[i]}", f"e{seq[j]}")
                want[k] = want.get(k, 0) + 1
                keys.setdefault(k, set()).add(u)
    assert got == {k: (n, len(keys[k])) for k, n in want.items()}


def test_sequential_pairs_gap1_equals_transitions(spark):
    df = spark.createDataFrame(
        [(1, f"2024-01-01 00:00:{i:02d}", i, t)
         for i, t in enumerate("abcabcab")],
        "user_id long, ts string, event_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    sp = {
        (r["a"], r["b"]): r["n_pairs"]
        for r in sequential_pairs(df, max_gap=1).collect()
    }
    tm = {
        (r["state"], r["next"]): r["n_trans"]
        for r in transition_matrix(df).collect()
    }
    assert sp == tm


# ---- dyadic EWMA (q208) ----------------------------------------------

from db_factfinder_spark.operators.timeseries import ewma_dyadic


def test_ewma_dyadic_gap_aware_weights(spark):
    # days 1, 2, 4 (day 3 missing): at day 4 the frame holds Δ=0,2,3
    df = spark.createDataFrame(
        [("k", "2024-01-01", 100), ("k", "2024-01-02", 200),
         ("k", "2024-01-04", 400)],
        "k string, day string, cents long",
    ).withColumn("day", F.to_date("day"))
    got = {
        str(r["day"]): (r["ewma_num"], r["ewma_den"], r["ewma"])
        for r in ewma_dyadic(df, "k", "day", "cents", window_days=8).collect()
    }
    # Δ weights: 2^(7-Δ)
    assert got["2024-01-01"] == (100 * 128, 128, 100.0)
    assert got["2024-01-02"] == (200 * 128 + 100 * 64, 192,
                                 (200 * 128 + 100 * 64) / 192)
    assert got["2024-01-04"] == (
        400 * 128 + 200 * 32 + 100 * 16, 176,
        (400 * 128 + 200 * 32 + 100 * 16) / 176,
    )


def test_ewma_dyadic_horizon_truncates(spark):
    # an observation window_days back contributes nothing
    df = spark.createDataFrame(
        [("k", "2024-01-01", 999), ("k", "2024-01-09", 500)],
        "k string, day string, cents long",
    ).withColumn("day", F.to_date("day"))
    got = {
        str(r["day"]): (r["ewma_den"], r["ewma"])
        for r in ewma_dyadic(df, "k", "day", "cents", window_days=8).collect()
    }
    assert got["2024-01-09"] == (128, 500.0)


def test_ewma_dyadic_sums_same_day(spark):
    df = spark.createDataFrame(
        [("k", "2024-01-01", 30), ("k", "2024-01-01", 70)],
        "k string, day string, cents long",
    ).withColumn("day", F.to_date("day"))
    [r] = ewma_dyadic(df, "k", "day", "cents", window_days=4).collect()
    assert (r["cents"], r["ewma"]) == (100, 100.0)


# ---- item-item cosine² (q209) ----------------------------------------

from db_factfinder_spark.operators.basket import item_similarity


def test_item_similarity_identical_vectors_hit_one(spark):
    # items 10 and 20 have IDENTICAL rating vectors → cos² exactly 1.0
    df = spark.createDataFrame(
        [(1, 10, 2), (1, 20, 2), (2, 10, 5), (2, 20, 5),
         (2, 30, 1), (3, 30, 7)],
        "b long, i long, q long",
    )
    rows = item_similarity(df, "b", "i", "q", min_co=2, k=10).collect()
    top = rows[0]
    assert (top["item_x"], top["item_y"], top["cos2"]) == (10, 20, 1.0)
    # (10,30)/(20,30) co-occur once only → pruned by min_co=2
    assert {(r["item_x"], r["item_y"]) for r in rows} == {(10, 20)}


def test_item_similarity_exact_ratio(spark):
    # r10 = {b1:1, b2:1}, r20 = {b1:2, b2:2}: dot=4, norms 2 and 8
    df = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (2, 20, 2), (2, 10, 1)],
        "b long, i long, q long",
    )
    [r] = item_similarity(df, "b", "i", "q", min_co=2, k=5).collect()
    assert r["dot"] == 1 * 2 + 1 * 2
    assert r["cos2"] == (4 * 4) / (2 * 8)


# ---- decile gains (q210) ---------------------------------------------

from db_factfinder_spark.operators.evaluation import decile_gains


def test_decile_gains_matches_bruteforce(spark):
    # 20 rows, scores 1..20, positives = top 5 scores → first quarter
    rows = [(i, i >= 16, i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id long, y boolean, s long")
    got = {
        r["bucket"]: (r["n_rows"], r["n_pos"], r["pos_rate"], r["cum_gain"])
        for r in decile_gains(df, "y", "s", "id", n_buckets=4).collect()
    }
    # desc order: bucket 0 = scores 20..16, all positive
    assert got[0] == (5, 5, 1.0, 1.0)
    assert got[1] == (5, 0, 0.0, 1.0)
    assert got[3] == (5, 0, 0.0, 1.0)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(
    st.tuples(st.booleans(), st.integers(min_value=0, max_value=9)),
    min_size=1, max_size=30,
))
def test_decile_gains_bucket_sizes_and_gains(spark, rows):
    data = [(i, y, s) for i, (y, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, y boolean, s long")
    out = sorted(
        decile_gains(df, "y", "s", "id", n_buckets=3).collect(),
        key=lambda r: r["bucket"],
    )
    # brute force: sort desc by (s, -id)? tiebreak is id ASC on the
    # negated score, i.e. sort by (-s, id)
    order = sorted(data, key=lambda t: (-t[2], t[0]))
    n = len(order)
    want = {}
    for rk, (i, y, s) in enumerate(order, start=1):
        b = (rk - 1) * 3 // n
        nr, np_ = want.get(b, (0, 0))
        want[b] = (nr + 1, np_ + (1 if y else 0))
    assert {r["bucket"]: (r["n_rows"], r["n_pos"]) for r in out} == want
    total_pos = sum(p for _, p in want.values())
    cum = 0
    for r in out:
        cum += r["n_pos"]
        if total_pos:
            assert r["cum_gain"] == cum / total_pos
        else:
            assert r["cum_gain"] is None


# ---- exact rolling distinct (q211) -----------------------------------

from db_factfinder_spark.operators.timeseries import rolling_exact_distinct

_udays = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # user
        st.integers(min_value=0, max_value=15),  # day offset
    ),
    min_size=1, max_size=25,
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(obs=_udays, w=st.integers(min_value=1, max_value=8))
def test_rolling_exact_distinct_matches_bruteforce(spark, obs, w):
    import datetime as dt
    base = dt.date(2024, 1, 1)
    rows = [
        ("t", dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=d), u, i)
        for i, (u, d) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, user_id long, event_id long"
    )
    got = {
        (r["event_type"], str(r["day"])): r["u"]
        for r in rolling_exact_distinct(
            df, window_days=w
        ).collect()
    }
    days = sorted({d for _, d in obs})
    want = {}
    for d in days:
        users = {u for u, o in obs if d - (w - 1) <= o <= d}
        want[("t", str(base + dt.timedelta(days=d)))] = len(users)
    assert got == want


# ---- linear interpolation (q212) -------------------------------------

from db_factfinder_spark.operators.timeseries import interpolate_daily_linear


def test_interpolate_fills_gap_linearly(spark):
    df = spark.createDataFrame(
        [("k", "2024-01-01", 100), ("k", "2024-01-05", 500)],
        "k string, day string, v long",
    ).withColumn("day", F.to_date("day"))
    got = {
        str(r["day"]): (r["val"], r["is_interp"])
        for r in interpolate_daily_linear(df, "k", "day", "v").collect()
    }
    assert got == {
        "2024-01-01": (100.0, False),
        "2024-01-02": (200.0, True),
        "2024-01-03": (300.0, True),
        "2024-01-04": (400.0, True),
        "2024-01-05": (500.0, False),
    }


def test_interpolate_no_extrapolation_or_cross_key_leak(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01", 10), ("b", "2024-01-04", 40)],
        "k string, day string, v long",
    ).withColumn("day", F.to_date("day"))
    rows = interpolate_daily_linear(df, "k", "day", "v").collect()
    assert len(rows) == 2 and not any(r["is_interp"] for r in rows)


def test_interpolate_exact_ratio_division(spark):
    # gap of 3 with delta 100 → 100/3 is ONE division of exact ints
    df = spark.createDataFrame(
        [("k", "2024-01-01", 0), ("k", "2024-01-04", 100)],
        "k string, day string, v long",
    ).withColumn("day", F.to_date("day"))
    got = {
        str(r["day"]): r["val"]
        for r in interpolate_daily_linear(df, "k", "day", "v").collect()
    }
    assert got["2024-01-02"] == 100 / 3
    assert got["2024-01-03"] == 200 / 3


# ---- top-p truncation (q213) -----------------------------------------

from db_factfinder_spark.llmdata.textstats import top_p_truncate


def test_top_p_minimal_covering_prefix(spark):
    # counts 50, 30, 15, 5: p=0.8 → 50+30 = 80 exactly covers; the
    # third item starts AT the target (cum_before 80 = 0.8·100) so it
    # is excluded — strict < rule.
    df = spark.createDataFrame(
        [("g", "a", 50), ("g", "b", 30), ("g", "c", 15), ("g", "d", 5)],
        "g string, tok string, n long",
    )
    kept = top_p_truncate(df, "g", "tok", "n", 8, 10).collect()
    assert [(r["tok"], r["rank"], r["cum"]) for r in
            sorted(kept, key=lambda r: r["rank"])] == [
        ("a", 1, 50), ("b", 2, 80)]


def test_top_p_one_includes_everything_and_ties_break_on_token(spark):
    df = spark.createDataFrame(
        [("g", "b", 10), ("g", "a", 10), ("g", "c", 1)],
        "g string, tok string, n long",
    )
    kept = sorted(
        top_p_truncate(df, "g", "tok", "n", 1, 1).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["tok"] for r in kept] == ["a", "b", "c"]


def test_top_p_rejects_bad_p(spark):
    df = spark.createDataFrame([("g", "a", 1)], "g string, tok string, n long")
    with pytest.raises(ValueError):
        top_p_truncate(df, "g", "tok", "n", 0, 10)
    with pytest.raises(ValueError):
        top_p_truncate(df, "g", "tok", "n", 11, 10)


# ---- skip-gram counts (q214) -----------------------------------------

from db_factfinder_spark.llmdata.textstats import skipgram_counts


def test_skipgram_counts_window_and_symmetry(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, None)], "doc_id long, text string"
    )
    got = {
        (r["center"], r["context"]): r["n"]
        for r in skipgram_counts(docs, window=2, min_count=1).collect()
    }
    # positions: a1 b2 c3 a4
    # fwd pairs |Δ|∈[1,2]: (a1,b2),(a1,c3),(b2,c3),(b2,a4),(c3,a4)
    want = {
        ("a", "b"): 1 + 1,   # fwd (a,b) + swap of (b,a)
        ("b", "a"): 1 + 1,   # fwd (b,a) + swap of (a,b)
        ("a", "c"): 1 + 1,   # fwd (a,c) + swap of (c,a)
        ("c", "a"): 1 + 1,
        ("b", "c"): 1,
        ("c", "b"): 1,
    }
    assert got == want


def test_skipgram_min_count_prunes(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y x y")], "doc_id long, text string"
    )
    got = skipgram_counts(docs, window=1, min_count=3).collect()
    # adjacent pairs: (x,y)x3, (y,x)x2 → symmetric n(x,y)=n(y,x)=5
    assert {(r["center"], r["context"]): r["n"] for r in got} == {
        ("x", "y"): 5, ("y", "x"): 5,
    }


# ---- seasonal anomalies (q215) ---------------------------------------

from db_factfinder_spark.operators.timeseries import seasonal_anomalies


def test_seasonal_anomalies_flags_within_weekday_only(spark):
    import datetime as dt
    # Mondays: counts 10, 10, 40 (spike); the 40 would NOT be an
    # anomaly vs a flat all-days baseline polluted by huge Fridays.
    rows = []
    eid = 0
    for wk, n in [(0, 10), (1, 10), (2, 40)]:
        day = dt.datetime(2024, 1, 1, 9) + dt.timedelta(weeks=wk)  # Mondays
        for _ in range(n):
            rows.append(("t", day, eid)); eid += 1
    for wk in range(3):
        day = dt.datetime(2024, 1, 5, 9) + dt.timedelta(weeks=wk)  # Fridays
        for _ in range(500):
            rows.append(("t", day, eid)); eid += 1
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long"
    )
    out = {
        (str(r["day"])): r
        for r in seasonal_anomalies(df, k=1).collect()
    }
    assert out["2024-01-15"]["is_anomaly"]          # the 40-Monday
    assert not out["2024-01-01"]["is_anomaly"]
    assert not out["2024-01-05"]["is_anomaly"]      # Fridays are normal
    # weekday baseline: Monday cell has n_days=3, s1=60
    assert out["2024-01-15"]["n_days"] == 3
    assert out["2024-01-15"]["dev_n"] == 40 * 3 - 60


def test_seasonal_anomalies_portable_dow(spark):
    import datetime as dt
    # 1970-01-01 (dn=0) was a Thursday → dow 0; 1970-01-05 Monday → 4
    df = spark.createDataFrame(
        [("t", dt.datetime(1970, 1, 1, 1), 0),
         ("t", dt.datetime(1970, 1, 5, 1), 1)],
        "event_type string, ts timestamp, event_id long",
    )
    got = {str(r["day"]): r["dow"] for r in seasonal_anomalies(df).collect()}
    assert got == {"1970-01-01": 0, "1970-01-05": 4}


# ---- dispersion audit (q216) -----------------------------------------

from db_factfinder_spark.operators.timeseries import dispersion_stats


def test_dispersion_exact_values(spark):
    import datetime as dt
    # daily counts 1, 3 → n=2, S1=4, S2=10: var_n2 = 20-16 = 4
    rows = [("t", dt.datetime(2024, 1, 1, 1), 0)]
    rows += [("t", dt.datetime(2024, 1, 2, 1), i) for i in range(1, 4)]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long"
    )
    [r] = dispersion_stats(df).collect()
    assert (r["n_days"], r["total"]) == (2, 4)
    assert r["fano"] == 4 / 8          # (2·10−16)/(2·4)
    assert r["cv2"] == 4 / 16
    assert not r["overdispersed"]      # var 1 < mean 2


def test_dispersion_overdispersed_flag(spark):
    import datetime as dt
    # counts 1, 9 → n=2, S1=10, S2=82: var_n2 = 64 > n·S1 = 20
    rows = [("t", dt.datetime(2024, 1, 1, 1), 0)]
    rows += [("t", dt.datetime(2024, 1, 2, 1), i) for i in range(1, 10)]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long"
    )
    [r] = dispersion_stats(df).collect()
    assert r["overdispersed"] and r["fano"] == 64 / 20


# ---- cluster silhouette (q218) ---------------------------------------

from db_factfinder_spark.llmdata.similarity import cluster_silhouette


def test_silhouette_separated_singletons(spark):
    # two singleton clusters: each point IS its centroid → a2 = 0,
    # b2 > 0 → sil exactly 1.0
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r["id"]: r for r in cluster_silhouette(df).collect()}
    assert got[1]["a2"] == 0.0 and got[1]["sil"] == 1.0
    assert got[2]["a2"] == 0.0 and got[2]["sil"] == 1.0


def test_silhouette_single_cluster_null(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = cluster_silhouette(df).collect()
    assert all(r["b2"] is None and r["sil"] is None for r in rows)


def test_silhouette_exact_distances(spark):
    # cluster 0: codes quantize to (127, 0) and (0, 127) → n=2,
    # S=(127,127); cluster 1: one point (−127, 0).
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0), (3, [-1.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r["id"]: r for r in cluster_silhouette(df).collect()}
    # point 1 vs own centroid: ((2·127−127)² + (0−127)²)/4 = 2·127²/4
    assert got[1]["a2"] == 2 * 127 * 127 / 4
    # point 1 vs cluster-1 centroid (n=1): (127−(−127))² = 254²
    assert got[1]["b2"] == 254.0 * 254.0
    assert got[3]["a2"] == 0.0 and got[3]["sil"] == 1.0


# ---- target encoding (q219) ------------------------------------------

from db_factfinder_spark.operators.encoding import target_encode_loo


def test_target_encode_loo_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 100)],
        "id long, cat string, y long",
    )
    got = {r["id"]: r for r in
           target_encode_loo(df, "cat", "y", "id", smoothing=2).collect()}
    # row 1: loo = (60-10)/2 = 25; smoothed = (4·50 + 2·160)/(4·(2+2))
    assert got[1]["enc_loo"] == 25.0
    assert got[1]["enc_smooth"] == (4 * 50 + 2 * 160) / (4 * 4)
    # singleton category: loo NULL, smoothed defined
    assert got[4]["enc_loo"] is None
    assert got[4]["enc_smooth"] == (4 * 0 + 2 * 160) / (4 * 2)


def test_target_encode_smoothing_zero_singleton_null(spark):
    df = spark.createDataFrame(
        [(1, "a", 10)], "id long, cat string, y long"
    )
    [r] = target_encode_loo(df, "cat", "y", "id", smoothing=0).collect()
    assert r["enc_loo"] is None and r["enc_smooth"] is None
    with pytest.raises(ValueError):
        target_encode_loo(df, "cat", "y", "id", smoothing=-1)


# ---- feature hashing (q220) ------------------------------------------

from db_factfinder_spark.llmdata.textstats import hashed_features


def test_hashed_features_deterministic_and_bounded(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, None)],
        "doc_id long, text string",
    )
    a = sorted(
        (r["id"], r["bucket"], r["w"])
        for r in hashed_features(docs, n_buckets=8).collect()
    )
    b = sorted(
        (r["id"], r["bucket"], r["w"])
        for r in hashed_features(docs, n_buckets=8).collect()
    )
    assert a == b and a
    assert all(0 <= bk < 8 for _, bk, _ in a)
    # repeated token accumulates: |w| for alpha's bucket ≥ 2 unless a
    # colliding token cancels — with 3 distinct tokens in 8 buckets,
    # total |w| is at most 4 and the sum of |w| has alpha parity
    assert sum(abs(w) for _, _, w in a) >= 2


def test_hashed_features_single_bucket_sums_signs(spark):
    docs = spark.createDataFrame(
        [(1, "x x x")], "doc_id long, text string"
    )
    rows = hashed_features(docs, n_buckets=1).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0
    assert abs(rows[0]["w"]) == 3     # one token → one sign, 3 copies
    with pytest.raises(ValueError):
        hashed_features(docs, n_buckets=0)


# ---- entity resolution composition (q221) ----------------------------

def test_entity_resolution_components(spark):
    from db_factfinder_spark.llmdata.components import connected_components
    from db_factfinder_spark.llmdata.strmatch import edit1_join

    clean = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme  corp"), (3, "zenith ltd")],
        "sid long, name string",
    )
    probes = spark.createDataFrame(
        [(101, "acme corp"), (103, "zenith ltdx")],
        "pid long, name string",
    )
    pairs = edit1_join(probes, clean, "pid", "name", "sid", "name")
    comp = connected_components(pairs, src="pid", dst="sid")
    got = {r["id"]: r["label"] for r in comp.collect()}
    # probe 101 links suppliers 1 and 2 (both within edit-1) → rep 1
    assert got[101] == 1 and got[1] == 1 and got[2] == 1
    assert got[103] == 3 and got[3] == 3


# ---- mutual top-k (q222) ---------------------------------------------

from db_factfinder_spark.llmdata.similarity import mutual_topk


def test_mutual_topk_requires_reciprocity(spark):
    # a and b are near-identical; c's nearest is a, but a's top-1 is b
    # → at k=1 only (a, b) is mutual
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.01]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<float>",
    )
    rows = mutual_topk(df, k=1).collect()
    assert [(r["item_a"], r["item_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["rank_ab"] == 1 and rows[0]["rank_ba"] == 1


def test_mutual_topk_full_k_is_symmetric_pairs(spark):
    # with k = n−1 every pair is mutual: C(3,2) rows
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = mutual_topk(df, k=2).collect()
    assert {(r["item_a"], r["item_b"]) for r in rows} == {
        (1, 2), (1, 3), (2, 3)
    }


# ---- survival hazard table (q224) ------------------------------------

from db_factfinder_spark.operators.survival import hazard_table


def test_hazard_table_sweep_line_and_censoring(spark):
    import datetime as dt
    # corpus days 1..10 (maxd = day 10):
    #   u1: [1, 3]  → death on 3 (10−3 > 2)
    #   u2: [2, 10] → censored (10−10 = 0 ≤ 2)
    #   u3: [1, 8]  → censored? 10−8 = 2 ≤ 2 → censored
    def ev(u, d):
        return (u, dt.datetime(2024, 1, d, 12))
    df = spark.createDataFrame(
        [ev(1, 1), ev(1, 3), ev(2, 2), ev(2, 10), ev(3, 1), ev(3, 8)],
        "user_id long, ts timestamp",
    )
    got = {str(r["day"]): r for r in hazard_table(df, censor_gap=2).collect()}
    assert len(got) == 10
    # risk sets: d1 {u1,u3}=2, d2 {u1,u2,u3}=3, d3 =3, d4 {u2,u3}=2,
    # d8 =2, d9 {u2}=1, d10 {u2}=1
    assert got["2024-01-01"]["n_risk"] == 2
    assert got["2024-01-02"]["n_risk"] == 3
    assert got["2024-01-03"]["n_risk"] == 3
    assert got["2024-01-04"]["n_risk"] == 2
    assert got["2024-01-09"]["n_risk"] == 1
    # only u1 dies, on day 3: hazard = 1/3 exactly; censored exits
    # never appear as deaths
    assert got["2024-01-03"]["d_events"] == 1
    assert got["2024-01-03"]["hazard"] == 1 / 3
    assert sum(r["d_events"] for r in got.values()) == 1
    assert got["2024-01-10"]["d_events"] == 0


def test_hazard_table_rejects_negative_gap(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError):
        hazard_table(df, censor_gap=-1)


# ---- top-k churn (q227) ----------------------------------------------

from db_factfinder_spark.operators.diff import topk_churn


def test_topk_churn_statuses(spark):
    import datetime as dt
    # half 1 (t ≤ mid): a×3, b×2, c×1; half 2: a×1, b×3, d×2
    # k=3 → t1 = a(1) b(2) c(3); t2 = b(1) d(2) a(3)
    rows = []
    eid = [0]
    def add(key, day, n):
        for _ in range(n):
            rows.append((key, dt.datetime(2024, 1, day, 12))); eid[0] += 1
    add("a", 1, 3); add("b", 1, 2); add("c", 1, 1)
    add("a", 9, 1); add("b", 9, 3); add("d", 9, 2)
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r["key"]: r for r in topk_churn(df, "user_id", "ts", k=3).collect()}
    assert got["a"]["status"] == "moved" and (got["a"]["r1"], got["a"]["r2"]) == (1, 3)
    assert got["b"]["status"] == "moved" and (got["b"]["r1"], got["b"]["r2"]) == (2, 1)
    assert got["c"]["status"] == "dropped" and got["c"]["r2"] is None
    assert got["d"]["status"] == "added" and got["d"]["r1"] is None


def test_topk_churn_held_rank(spark):
    import datetime as dt
    rows = []
    for day, counts in [(1, {"x": 2, "y": 1}), (9, {"x": 5, "y": 2})]:
        for key, n in counts.items():
            for _ in range(n):
                rows.append((key, dt.datetime(2024, 1, day, 12)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r["key"]: r["status"]
           for r in topk_churn(df, "user_id", "ts", k=2).collect()}
    assert got == {"x": "held", "y": "held"}


# ---- sorted-neighborhood blocking (q228) -----------------------------

from db_factfinder_spark.llmdata.strmatch import sorted_neighborhood_pairs


def test_sorted_neighborhood_finds_adjacent_typos(spark):
    df = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corpx"), (3, "zenith")],
        "rid long, name string",
    )
    rows = sorted_neighborhood_pairs(df, "rid", "name", window=2).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in rows] == [(1, 2, 1)]


def test_sorted_neighborhood_window_limits_recall(spark):
    # "aa" and "ab" are edit-1 but separated by 3 sort positions →
    # window=2 misses them, window=3 finds them (the documented
    # trade-off)
    df = spark.createDataFrame(
        [(1, "aa"), (2, "aax"), (3, "aay"), (4, "aaz"), (5, "ab")],
        "rid long, name string",
    )
    near = sorted_neighborhood_pairs(df, "rid", "name", window=2).collect()
    assert (1, 5) not in {(r["id_a"], r["id_b"]) for r in near}
    far = sorted_neighborhood_pairs(df, "rid", "name", window=4).collect()
    assert (1, 5) in {(r["id_a"], r["id_b"]) for r in far}
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "rid", "name", window=0)


# ---- subtree rollup (q229) -------------------------------------------

from db_factfinder_spark.operators.hierarchy import (
    decimal_ancestors,
    subtree_rollup,
)


def test_subtree_rollup_decimal_tree(spark):
    # leaves 12, 15, 19, 3: node 1 covers {12,15,19}; root 0 covers all
    df = spark.createDataFrame(
        [(12, 100), (15, 200), (19, 400), (3, 800)], "k long, v long"
    )
    got = {
        r["node"]: (r["n_leaves"], r["subtree_sum"])
        for r in subtree_rollup(
            df, "k", "v", decimal_ancestors("k", 3)
        ).collect()
    }
    assert got[12] == (1, 100) and got[3] == (1, 800)
    assert got[1] == (3, 700)          # 12, 15, 19
    assert got[0] == (4, 1500)         # everything, charged ONCE each


def test_decimal_ancestors_dedups_root(spark):
    df = spark.createDataFrame([(5,)], "k long")
    [r] = df.select(decimal_ancestors("k", 5).alias("a")).collect()
    assert sorted(r["a"]) == [0, 5]    # root appears once despite 5 levels
    with pytest.raises(ValueError):
        decimal_ancestors("k", 0)


# ---- ORC / JSONL source-sink roundtrips ------------------------------

def test_orc_roundtrip_pushdown(spark, tmp_path):
    from db_factfinder_spark.sources.readers import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, s string, x double"
    )
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    plan = back.filter("id = 1")._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    from db_factfinder_spark.sources.readers import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "x", None), (2, None, 3)], "id long, s string, n long"
    )
    p = str(tmp_path / "jsonl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, schema="id long, s string, n long")
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


# ---- perceptual aHash dedup (q230) -----------------------------------

from db_factfinder_spark.llmdata.multimodal import (
    ahash_near_pairs,
    perceptual_ahash,
)


def test_perceptual_ahash_bits(spark):
    # 2×2 source → 2×2 thumb (identity): bytes [10, 10, 10, 250]:
    # total 280, n=4 → bit set only where v·4 > 280, i.e. the 250
    df = spark.createDataFrame(
        [(1, bytearray([10, 10, 10, 250]), 2, 2),
         (2, bytearray([7, 7, 7, 7]), 2, 2),      # flat → no bit set
         (3, None, 2, 2)],
        "media_id long, payload binary, width int, height int",
    )
    got = {
        r["media_id"]: r["ahash"]
        for r in perceptual_ahash(df, hash_w=2, hash_h=2).collect()
    }
    assert got[1] == 0b0001
    assert got[2] == 0
    assert got[3] is None


def test_ahash_near_pairs_pigeonhole_recall(spark):
    # distance-2 pair whose differing bits land in TWO different
    # blocks — a single-table blocker could miss it; the d+1 tables
    # guarantee agreement on the remaining block
    a = (1 << 55) | 1            # bits in block 0 and block 2
    b = 0
    far = (1 << 55) | (1 << 30) | 1   # hamming 3 from b
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, far)], "media_id long, ahash long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_pairs(df, bits=56, max_hamming=2).collect()
    }
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 1          # far is hamming-1 from a
    assert (2, 3) not in got         # hamming 3 → excluded
    with pytest.raises(ValueError):
        ahash_near_pairs(df, bits=56, max_hamming=56)


# ---- rising trend (q231) ---------------------------------------------

from db_factfinder_spark.operators.timeseries import rising_trend


def test_rising_trend_offset_frames_gap_correct(spark):
    import datetime as dt
    # days 1,2,3 at 1/day, then a gap, then day 7 with 9 events:
    # at day 7 recent window {5,6,7} sees 9, prior {2,3,4} sees 2
    rows = [("t", dt.datetime(2024, 1, d, 12)) for d in (1, 2, 3)]
    rows += [("t", dt.datetime(2024, 1, 7, 12))] * 9
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {str(r["day"]): r for r in rising_trend(df, recent_days=3).collect()}
    d7 = got["2024-01-07"]
    assert (d7["c_recent"], d7["c_prior"]) == (9, 2)
    assert d7["ratio"] == 10 / 3 and d7["rising"]
    d1 = got["2024-01-01"]
    assert (d1["c_recent"], d1["c_prior"], d1["rising"]) == (1, 0, True)
    with pytest.raises(ValueError):
        rising_trend(df, recent_days=0)


# ---- incremental components (q232) -----------------------------------

from db_factfinder_spark.llmdata.components import (
    connected_components,
    incremental_components,
)

_edge = st.tuples(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=9),
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(_edge, min_size=1, max_size=15),
    mask=st.lists(st.booleans(), min_size=15, max_size=15),
)
def test_incremental_components_equals_recompute(spark, edges, mask):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    base_e = [e for e, m in zip(edges, mask) if m]
    delta_e = [e for e, m in zip(edges, mask) if not m]
    if not base_e or not delta_e:
        return
    mk = lambda es: spark.createDataFrame(es, "id_a long, id_b long")  # noqa: E731
    full = {
        (r["id"], r["label"])
        for r in connected_components(mk(edges)).collect()
    }
    base_labels = connected_components(mk(base_e))
    inc = {
        (r["id"], r["label"])
        for r in incremental_components(base_labels, mk(delta_e)).collect()
    }
    assert inc == full


# ---- Cohen's kappa (q233) --------------------------------------------

from db_factfinder_spark.operators.quality import cohens_kappa


def test_cohens_kappa_textbook_value(spark):
    # classic 2×2: a=20 agree-yes, d=15 agree-no, b=5, c=10 (N=50)
    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15
        + [("y", "n")] * 5 + [("n", "y")] * 10
    )
    df = spark.createDataFrame(rows, "g string, p string")
    [r] = cohens_kappa(df, "g", "p").collect()
    # po=35/50; pe=(25·30 + 25·20)/2500 = 1250/2500
    # κ = (50·35 − 1250)/(2500 − 1250) = 500/1250
    assert (r["n"], r["n_agree"], r["pe_num"]) == (50, 35, 1250)
    assert r["kappa"] == 500 / 1250


def test_cohens_kappa_perfect_and_degenerate(spark):
    perfect = spark.createDataFrame(
        [("a", "a"), ("b", "b")], "g string, p string"
    )
    assert cohens_kappa(perfect, "g", "p").first()["kappa"] == 1.0
    # both raters constant → pe = n² → undefined
    const = spark.createDataFrame(
        [("a", "a"), ("a", "a")], "g string, p string"
    )
    assert cohens_kappa(const, "g", "p").first()["kappa"] is None
    # NULLs excluded
    nulls = spark.createDataFrame(
        [("a", None), (None, "a"), ("a", "a")], "g string, p string"
    )
    assert cohens_kappa(nulls, "g", "p").first()["n"] == 1


# ---- hierarchy contribution / vocab growth (q234/q235) ---------------

def test_hierarchy_contribution_shares(spark):
    import __spark_entry__ as em
    # use the real query at the smallest scale: shares under each
    # parent must sum to ≤ 1 and to exactly 1 over complete families
    rows = em.queries()["q234_hierarchy_contribution"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_node = {r["node"]: r for r in rows}
    root = by_node[0]
    assert root["parent_sum"] is None and root["share"] is None
    # children of the root are nodes 1..9; part key 0 is a LEAF at
    # the root itself, so the kids cover root-minus-leaf-0 exactly
    kids = [r for r in rows if 1 <= r["node"] <= 9]
    leaf0_direct = root["subtree_sum"] - sum(k["subtree_sum"] for k in kids)
    assert 0 < leaf0_direct < root["subtree_sum"]
    for k in kids:
        assert k["parent_sum"] == root["subtree_sum"]
        assert k["share"] == k["subtree_sum"] / root["subtree_sum"]


def test_vocab_growth_first_seen_identity(spark):
    from pyspark.sql import functions as F
    # hand corpus: day0 {a b}, day1 {b c c}: new types 2 then 1
    docs = spark.createDataFrame(
        [(0, "a b"), (30, "b c c")], "doc_id long, text string"
    )
    import __spark_entry__ as em
    # mirror the query body on the tiny frame via the same exprs
    from db_factfinder_spark.llmdata.textstats import tokens
    toks = docs.select((F.col("doc_id") % 30).alias("day"),
                       F.explode(tokens("text")).alias("tok"))
    per_day = toks.groupBy("day").count().collect()
    assert {r["day"]: r["count"] for r in per_day} == {0: 5}
    # both docs land on day 0 (30 % 30 == 0): 5 tokens, 3 types
    first = toks.groupBy("tok").agg(F.min("day")).count()
    assert first == 3


# ---- total variation drift (q236) ------------------------------------

from db_factfinder_spark.operators.quality import total_variation


def test_total_variation_known_values(spark):
    # A: {x:3, y:1}; B: {x:1, y:3} → TVD = |3·4−1·4| + |1·4−3·4| over
    # 2·16 = (8+8)/32 = 0.5
    rows = [("A", "x")] * 3 + [("A", "y")] + [("B", "x")] + [("B", "y")] * 3
    df = spark.createDataFrame(rows, "seg string, b string")
    [r] = total_variation(df, "seg", "b", "A", "B").collect()
    assert (r["n_a"], r["n_b"], r["n_buckets"], r["tvd"]) == (4, 4, 2, 0.5)


def test_total_variation_identical_and_disjoint(spark):
    same = spark.createDataFrame(
        [("A", "x"), ("B", "x")], "seg string, b string"
    )
    assert total_variation(same, "seg", "b", "A", "B").first()["tvd"] == 0.0
    disj = spark.createDataFrame(
        [("A", "x"), ("B", "y")], "seg string, b string"
    )
    assert total_variation(disj, "seg", "b", "A", "B").first()["tvd"] == 1.0
    empty = spark.createDataFrame([("A", "x")], "seg string, b string")
    assert total_variation(empty, "seg", "b", "A", "B").first()["tvd"] is None


# ---- audience overlap (q237) -----------------------------------------

from db_factfinder_spark.operators.timeseries import audience_overlap


def test_audience_overlap_jaccard(spark):
    import datetime as dt
    # day1 {1,2,3}, day2 {2,3,4}: inter 2, union 4 → 0.5
    rows = [
        (u, dt.datetime(2024, 1, 1, 9)) for u in (1, 2, 3)
    ] + [
        (u, dt.datetime(2024, 1, 2, 9)) for u in (2, 3, 4)
    ] + [(2, dt.datetime(2024, 1, 1, 15))]   # dup visit → still distinct
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    [r] = audience_overlap(df).collect()
    assert (r["n_a"], r["n_b"], r["n_inter"]) == (3, 3, 2)
    assert r["jaccard"] == 2 / 4
