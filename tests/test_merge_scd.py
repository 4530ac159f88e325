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
