"""Edge-case tests for the CDC merge (operators/merge.py) and SCD2
interval build (operators/scd.py)."""

from pyspark.sql import functions as F

from db_factfinder_spark.operators.merge import merge_upsert
from db_factfinder_spark.operators.scd import scd2_intervals


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_merge_insert_update_delete(spark):
    base = spark.createDataFrame(
        [(1, 10, "a", False), (2, 10, "b", False)],
        "k int, v int, payload string, is_delete boolean",
    )
    upd = spark.createDataFrame(
        [
            (2, 20, "b2", False),  # update wins (newer v)
            (3, 5, "c", False),    # pure insert
            (1, 30, "x", True),    # tombstone deletes k=1
        ],
        "k int, v int, payload string, is_delete boolean",
    )
    out = merge_upsert(
        base, upd, keys=["k"], order_by=["v"],
        delete_flag=F.col("is_delete"),
    )
    assert _rows(out, "k", "payload") == [(2, "b2"), (3, "c")]


def test_merge_stale_update_loses(spark):
    base = spark.createDataFrame([(1, 10, "new")], "k int, v int, p string")
    upd = spark.createDataFrame([(1, 5, "old")], "k int, v int, p string")
    out = merge_upsert(base, upd, keys=["k"], order_by=["v"])
    assert _rows(out, "k", "p") == [(1, "new")]


def test_merge_tie_prefers_update_side(spark):
    base = spark.createDataFrame([(1, 10, "base")], "k int, v int, p string")
    upd = spark.createDataFrame([(1, 10, "upd")], "k int, v int, p string")
    out = merge_upsert(base, upd, keys=["k"], order_by=["v"])
    assert _rows(out, "k", "p") == [(1, "upd")]


def test_merge_stale_tombstone_does_not_delete(spark):
    """A tombstone older than the base row loses the window; the key
    survives with the base payload."""
    base = spark.createDataFrame(
        [(1, 10, "live", False)], "k int, v int, p string, is_delete boolean"
    )
    upd = spark.createDataFrame(
        [(1, 5, "dead", True)], "k int, v int, p string, is_delete boolean"
    )
    out = merge_upsert(
        base, upd, keys=["k"], order_by=["v"],
        delete_flag=F.col("is_delete"),
    )
    assert _rows(out, "k", "p") == [(1, "live")]


def test_merge_plan_is_single_shuffle_no_join(spark):
    base = spark.createDataFrame([(1, 1, "a")], "k int, v int, p string")
    upd = spark.createDataFrame([(1, 2, "b")], "k int, v int, p string")
    out = merge_upsert(base, upd, keys=["k"], order_by=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_basic_runs(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"),
            (2, 1, "x"),
        ],
        "k int, t int, attr string",
    )
    out = scd2_intervals(df, key="k", order_by=["t"], attr="attr")
    got = [
        tuple(r)
        for r in out.select("k", "attr", "valid_from", "valid_to", "n_obs")
        .orderBy("k", "valid_from")
        .collect()
    ]
    assert got == [
        (1, "a", 1, 3, 2),
        (1, "b", 3, 4, 1),
        (1, "a", 4, None, 1),  # same attr re-appears → NEW interval
        (2, "x", 1, None, 1),
    ]


def test_scd2_null_attr_segments(spark):
    """NULL attr values form their own runs (null-safe compare), and a
    leading NULL still opens the first segment."""
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, None), (1, 3, "a")],
        "k int, t int, attr string",
    )
    out = scd2_intervals(df, key="k", order_by=["t"], attr="attr")
    got = [
        tuple(r)
        for r in out.select("k", "attr", "valid_from", "n_obs")
        .orderBy("valid_from")
        .collect()
    ]
    assert got == [(1, None, 1, 2), (1, "a", 3, 1)]


def test_scd2_tiebreak_order(spark):
    """Equal timestamps break on the secondary order column, so the
    segmentation is deterministic."""
    df = spark.createDataFrame(
        [(1, 1, 2, "b"), (1, 1, 1, "a")], "k int, t int, id int, attr string"
    )
    out = scd2_intervals(df, key="k", order_by=["t", "id"], attr="attr")
    got = [
        tuple(r)
        for r in out.select("attr", "valid_to", "n_obs").orderBy("attr").collect()
    ]
    # order is (t=1,id=1,'a') then (t=1,id=2,'b') → two 1-row runs
    assert got == [("a", 1, 1), ("b", None, 1)]


def test_table_diff_statuses_and_changed_cols(spark):
    from db_factfinder_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (5, None, "e")],
        "k int, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 21.0, "B"), (4, 40.0, "d"), (5, None, "e")],
        "k int, v double, s string",
    )
    out = table_diff(old, new, keys=["k"], compare_cols=["v", "s"])
    got = {r.k: (r.status, r.changed_cols) for r in out.collect()}
    # k=1 same (excluded), k=5 same with NULLs both sides (null-safe)
    assert got == {
        2: ("changed", "v,s"),
        3: ("removed", ""),
        4: ("added", ""),
    }
    # include_same keeps the unchanged keys, NULL==NULL counts as same
    full = table_diff(
        old, new, keys=["k"], compare_cols=["v", "s"], include_same=True
    )
    got_full = {r.k: r.status for r in full.collect()}
    assert got_full[1] == "same" and got_full[5] == "same"


def test_table_diff_null_to_value_is_changed(spark):
    from db_factfinder_spark.operators.diff import table_diff

    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "x")], "k int, v string")
    out = table_diff(old, new, keys=["k"], compare_cols=["v"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0].status == "changed"
    assert rows[0].changed_cols == "v"


# ---------------------------------------------------------------------------
# Property tests: random change-logs vs brute-force references
# ---------------------------------------------------------------------------

from hypothesis import given, settings, HealthCheck  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_kv = st.tuples(
    st.integers(min_value=0, max_value=3),    # key
    st.integers(min_value=0, max_value=20),   # version
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(_kv, min_size=0, max_size=12),
    upd=st.lists(st.tuples(_kv, st.booleans()), min_size=0, max_size=12),
)
def test_merge_matches_bruteforce(spark, base, upd):
    # unique version per (key, side): ties then exist only ACROSS
    # sides, where the documented contract (update wins) applies
    brows = dict.fromkeys(base)
    urows = {kv: d for kv, d in reversed([(kv, d) for kv, d in upd])}
    bdf = spark.createDataFrame(
        [(k, v, False) for k, v in brows], "k int, v int, is_delete boolean"
    ) if brows else spark.createDataFrame([], "k int, v int, is_delete boolean")
    udf = spark.createDataFrame(
        [(k, v, d) for (k, v), d in urows.items()],
        "k int, v int, is_delete boolean",
    ) if urows else spark.createDataFrame([], "k int, v int, is_delete boolean")
    out = merge_upsert(
        bdf, udf, keys=["k"], order_by=["v"],
        delete_flag=F.col("is_delete"),
    )
    got = {r.k: r.v for r in out.collect()}

    want = {}
    all_rows = [(k, v, 0, False) for k, v in brows] + [
        (k, v, 1, d) for (k, v), d in urows.items()
    ]
    for k in {r[0] for r in all_rows}:
        winner = max(
            (r for r in all_rows if r[0] == k), key=lambda r: (r[1], r[2])
        )
        if not winner[3]:
            want[k] = winner[1]
    assert got == want


_obs = st.tuples(
    st.integers(min_value=0, max_value=2),    # key
    st.integers(min_value=0, max_value=15),   # ts
    st.sampled_from(["a", "b", None]),        # attr
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_obs, min_size=1, max_size=15))
def test_scd2_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(k, t, i, a) for i, (k, t, a) in enumerate(rows)],
        "k int, t int, idx int, attr string",
    )
    out = scd2_intervals(df, key="k", order_by=["t", "idx"], attr="attr")
    got = [
        (r.k, r.attr, r.valid_from, r.valid_to, r.n_obs)
        for r in out.collect()
    ]

    want = []
    for k in {r[0] for r in rows}:
        seq = sorted(
            [(t, i, a) for i, (kk, t, a) in enumerate(rows) if kk == k],
            key=lambda r: (r[0], r[1]),
        )
        runs = []
        for t, _, a in seq:
            if not runs or runs[-1][0] != a:
                runs.append([a, t, 0])
            runs[-1][2] += 1
        for j, (a, vf, n) in enumerate(runs):
            vt = runs[j + 1][1] if j + 1 < len(runs) else None
            want.append((k, a, vf, vt, n))
    # multiset compare — tuples contain Nones, which don't sort
    from collections import Counter

    assert Counter(got) == Counter(want)


def test_incremental_state_merge_equals_direct(spark):
    from db_factfinder_spark.operators.incremental import (
        agg_state,
        merge_agg_states,
        state_to_result,
    )

    df = spark.createDataFrame(
        [("a", 1.25), ("a", 2.50), ("b", -1.00), ("a", 0.01), ("b", 9.99)],
        "g string, v double",
    )
    # arbitrary split — states must compose regardless of partition
    s1 = agg_state(df.limit(2), ["g"], "v")
    s2 = agg_state(df.subtract(df.limit(2)), ["g"], "v")
    merged = state_to_result(merge_agg_states([s1, s2], ["g"]))
    direct = state_to_result(agg_state(df, ["g"], "v"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    got = {r.g: (r.n, r.sum_v, r.min_v, r.max_v) for r in merged.collect()}
    assert got["a"] == (3, 3.76, 0.01, 2.5)
    assert got["b"] == (2, 8.99, -1.0, 9.99)


def test_incremental_state_merge_disjoint_keys(spark):
    from db_factfinder_spark.operators.incremental import (
        agg_state,
        merge_agg_states,
        state_to_result,
    )

    s1 = agg_state(
        spark.createDataFrame([("only1", 1.0)], "g string, v double"),
        ["g"], "v",
    )
    s2 = agg_state(
        spark.createDataFrame([("only2", 2.0)], "g string, v double"),
        ["g"], "v",
    )
    out = {r.g: r.n for r in
           state_to_result(merge_agg_states([s1, s2], ["g"])).collect()}
    assert out == {"only1": 1, "only2": 1}


def test_grouped_linreg_known_line(spark):
    from pyspark.sql import functions as F
    from db_factfinder_spark.operators.regression import grouped_linreg

    # exact line y = 3x + 7 → slope 3, intercept 7, regardless of noise-free fit
    rows = [("g", x, 3 * x + 7) for x in range(10)]
    # degenerate group: all x equal → NULL slope
    rows += [("d", 5, 1), ("d", 5, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: (r.n, r.slope_u, r.intercept_u) for r in
           grouped_linreg(df, ["g"], F.col("x"), F.col("y")).collect()}
    assert out["g"] == (10, 3.0, 7.0)
    assert out["d"][1] is None


def test_fk_violations_nulls_and_orphans(spark):
    from db_factfinder_spark.operators.quality import fk_violations

    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 20)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    bad = sorted(r.id for r in
                 fk_violations(child, parent, fk="fk", pk="pk").collect())
    assert bad == [2, 3]  # orphan key AND null fk are violations


def test_profile_columns_single_pass(spark):
    from db_factfinder_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k int, s string"
    )
    out = {r.col_name: (r.n_rows, r.n_null, r.n_distinct)
           for r in profile_columns(df, ["k", "s"]).collect()}
    assert out == {"k": (3, 0, 2), "s": (3, 1, 2)}
    # single job: the plan contains exactly one scan of the source
    plan = profile_columns(df, ["k", "s"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


# --------------------------------------------------------- observe
def test_observed_metrics_match_direct_agg(spark):
    from db_factfinder_spark.operators.quality import observed
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    out, obs = observed(
        df,
        "audit",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.count(F.lit(1)) - F.count("v"),
            "sum_id": F.sum("id"),
        },
    )
    out.write.format("noop").mode("overwrite").save()  # ONE pass
    got = obs.get
    assert got["n_rows"] == 1000
    assert got["n_null_v"] == 100
    assert got["sum_id"] == sum(range(1000))
