"""Table-maintenance surface: small-file compaction and the
exactly-once streaming upsert sink (replay idempotency, tombstones,
torn-write recovery)."""

import os

from pyspark.sql import functions as F

from db_factfinder_spark.sources.compaction import (
    compact_parquet,
    plan_compaction,
)
from db_factfinder_spark.streaming.sink import (
    UpsertSink,
    committed_batches,
    read_table,
)


def _parquet_files(d):
    return sorted(
        f for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def test_compaction_shrinks_files_preserving_rows(spark, tmp_path):
    src = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(src)
    assert len(_parquet_files(src)) == 40

    plan = plan_compaction(src, target_bytes=1 << 30)
    assert plan["n_files"] == 40
    assert plan["target_files"] == 1
    assert plan["small_files"] == 40

    dst = str(tmp_path / "compact")
    out = compact_parquet(spark, src, dst, target_bytes=1 << 30)
    assert out["files_written"] == 1
    got = spark.read.parquet(dst)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compaction_targets_byte_sized_file_count(spark, tmp_path):
    src = str(tmp_path / "frag2")
    spark.range(0, 50_000).withColumn(
        "pad", F.md5(F.col("id").cast("string"))
    ).repartition(20).write.parquet(src)
    total = plan_compaction(src)["total_bytes"]
    target = total // 4 + 1
    dst = str(tmp_path / "compact2")
    out = compact_parquet(spark, src, dst, target_bytes=target)
    # ceil(total/target) in {4,5}; coalesce may merge unevenly but the
    # planned count must be honored exactly by the writer
    assert out["files_written"] == out["target_files"]
    assert 3 <= out["files_written"] <= 5
    assert spark.read.parquet(dst).count() == 50_000


def test_upsert_sink_exactly_once_and_tombstones(spark, tmp_path):
    table = str(tmp_path / "tbl")
    sink = UpsertSink(
        table, keys=["id"], order_by=["ver", "id"], delete_col="deleted"
    )
    b0 = spark.createDataFrame(
        [(1, 1, "a", False), (2, 1, "b", False)],
        "id long, ver long, val string, deleted boolean",
    )
    sink(b0, 0)
    assert {
        (r["id"], r["val"]) for r in read_table(spark, table).collect()
    } == {(1, "a"), (2, "b")}

    # batch 1: update key 1, delete key 2, insert key 3
    b1 = spark.createDataFrame(
        [(1, 2, "a2", False), (2, 2, "x", True), (3, 1, "c", False)],
        "id long, ver long, val string, deleted boolean",
    )
    sink(b1, 1)
    after = {
        (r["id"], r["val"]) for r in read_table(spark, table).collect()
    }
    assert after == {(1, "a2"), (3, "c")}

    # crash-replay of batch 1: identical result, no new version
    versions_before = sorted(os.listdir(table))
    sink(b1, 1)
    assert sorted(os.listdir(table)) == versions_before
    assert {
        (r["id"], r["val"]) for r in read_table(spark, table).collect()
    } == after
    assert committed_batches(table) == {0, 1}


def test_upsert_sink_recovers_from_torn_snapshot(spark, tmp_path):
    """Crash AFTER the snapshot parquet write but BEFORE the marker:
    the replayed batch must overwrite the orphan and commit, and a
    reader in between must still see the previous version."""
    table = str(tmp_path / "tbl2")
    sink = UpsertSink(table, keys=["id"], order_by=["ver", "id"])
    b0 = spark.createDataFrame([(1, 1, "a")], "id long, ver long, val string")
    sink(b0, 0)

    # simulate the torn write: snapshot v2 exists, marker does not
    b1 = spark.createDataFrame([(1, 2, "A")], "id long, ver long, val string")
    orphan = os.path.join(table, "v00000002")
    b1.write.parquet(orphan)
    assert read_table(spark, table).first()["val"] == "a"  # not torn-read

    sink(b1, 1)  # replay: overwrites the orphan, then commits
    assert read_table(spark, table).first()["val"] == "A"
    assert committed_batches(table) == {0, 1}


def test_upsert_sink_drives_real_stream(spark, tmp_path):
    """End-to-end through Structured Streaming: one file per
    micro-batch via maxFilesPerTrigger, last-writer-wins across
    batches."""
    src = str(tmp_path / "stream_src")
    d1 = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b")], "id long, ver long, val string"
    )
    d2 = spark.createDataFrame(
        [(1, 2, "a2"), (3, 1, "c")], "id long, ver long, val string"
    )
    d1.coalesce(1).write.parquet(src + "/f=0")
    d2.coalesce(1).write.parquet(src + "/f=1")

    table = str(tmp_path / "tbl3")
    sink = UpsertSink(table, keys=["id"], order_by=["ver", "id"])
    q = (
        spark.readStream.schema(d1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f=*")
        .writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["id"], r["val"]) for r in read_table(spark, table).collect()
    }
    assert got == {(1, "a2"), (2, "b"), (3, "c")}
    assert len(committed_batches(table)) >= 1


def test_vacuum_keeps_latest_and_ledger(spark, tmp_path):
    from db_factfinder_spark.streaming.sink import vacuum

    table = str(tmp_path / "tbl4")
    sink = UpsertSink(table, keys=["id"], order_by=["ver", "id"])
    for b in range(3):
        sink(
            spark.createDataFrame(
                [(1, b, f"v{b}")], "id long, ver long, val string"
            ),
            b,
        )
    removed = vacuum(table, keep_last=1)
    assert [os.path.basename(p) for p in removed] == [
        "v00000001", "v00000002",
    ]
    # current version still readable, ledger intact → replay still no-op
    assert read_table(spark, table).first()["val"] == "v2"
    assert committed_batches(table) == {0, 1, 2}
    sink(
        spark.createDataFrame([(1, 0, "v0")], "id long, ver long, val string"),
        0,
    )
    assert read_table(spark, table).first()["val"] == "v2"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_last"):
        vacuum(table, keep_last=0)


def test_read_table_time_travel(spark, tmp_path):
    from db_factfinder_spark.streaming.sink import vacuum

    table = str(tmp_path / "tbl5")
    sink = UpsertSink(table, keys=["id"], order_by=["ver", "id"])
    for b in range(3):
        sink(
            spark.createDataFrame(
                [(1, b, f"s{b}")], "id long, ver long, val string"
            ),
            b,
        )
    assert read_table(spark, table, version=1).first()["val"] == "s0"
    assert read_table(spark, table, version=3).first()["val"] == "s2"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="never committed"):
        read_table(spark, table, version=9)
    vacuum(table, keep_last=1)
    with _pytest.raises(ValueError, match="vacuumed"):
        read_table(spark, table, version=1)


def test_targeted_delete_prunes_untouched_files(spark, tmp_path):
    """Key-clustered 4-file table, 2 target keys in one file: exactly
    one file rewrites; pruned files stay BYTE-IDENTICAL; remaining
    rows are exactly the non-targets."""
    import os

    from db_factfinder_spark.sources.targeted_delete import (
        plan_targeted_delete,
        targeted_delete,
    )

    d = str(tmp_path / "tbl")
    os.makedirs(d)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(4):
        keys = list(range(i * 100, i * 100 + 100))
        pq.write_table(
            pa.table({"k": keys, "v": [x * 2 for x in keys]}),
            os.path.join(d, f"part-{i}.parquet"),
        )
    before = {
        f: open(os.path.join(d, f), "rb").read()
        for f in os.listdir(d)
    }
    plan = plan_targeted_delete(d, "k", [105, 142])
    assert [os.path.basename(p) for p in plan["affected"]] == [
        "part-1.parquet"
    ]
    stats = targeted_delete(d, "k", [105, 142])
    assert stats == {
        "files_total": 4, "files_rewritten": 1, "rows_deleted": 2
    }
    for f, blob in before.items():
        same = open(os.path.join(d, f), "rb").read() == blob
        assert same == (f != "part-1.parquet")
    left = spark.read.parquet(d)
    assert left.count() == 398
    assert left.filter(F.col("k").isin(105, 142)).count() == 0


def test_targeted_delete_missing_stats_is_safe(tmp_path):
    """A file whose footer lacks key stats must count as affected
    (correctness over pruning) — and a no-match affected file is NOT
    rewritten."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from db_factfinder_spark.sources.targeted_delete import (
        plan_targeted_delete,
        targeted_delete,
    )

    d = str(tmp_path / "tbl2")
    os.makedirs(d)
    pq.write_table(
        pa.table({"k": [1, 2, 3], "v": [1, 1, 1]}),
        os.path.join(d, "a.parquet"),
        write_statistics=False,
    )
    plan = plan_targeted_delete(d, "k", [99])
    assert [os.path.basename(p) for p in plan["affected"]] == ["a.parquet"]
    stats = targeted_delete(d, "k", [99])
    assert stats["files_rewritten"] == 0 and stats["rows_deleted"] == 0
