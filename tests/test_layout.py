"""Tests for Z-order layout (sources/layout.py): Morton-code
correctness, quantization edges, and — the point of the operator —
that the written layout actually tightens per-row-group min-max
bounds, i.e. enables data skipping on every interleaved dimension."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from db_factfinder_spark.sources.layout import (
    quantize_minmax,
    zorder_write,
    zvalue,
)


def test_zvalue_bit_interleave(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (2, 3)], "x long, y long")
    got = [r.z for r in df.select(zvalue(["x", "y"], bits=2).alias("z")).collect()]
    # x bits land at even positions, y bits at odd:
    # (3,1)=0b11,0b01 → 1+2+4 = 7; (2,3)=0b10,0b11 → 0+2+4+8 = 14
    assert got == [7, 0, 14]


def test_quantize_minmax_edges(spark):
    df = spark.createDataFrame([(0,), (50,), (100,)], "v long")
    q = quantize_minmax(df, ["v"], bits=8)
    got = sorted(r["__q_v"] for r in q.collect())
    assert got[0] == 0 and got[-1] == 255 and 0 < got[1] < 255
    # degenerate span (constant column) maps everything to 0
    const = spark.createDataFrame([(7,), (7,)], "v long")
    qc = quantize_minmax(const, ["v"], bits=8)
    assert [r["__q_v"] for r in qc.collect()] == [0, 0]


def _rowgroup_area(path_glob: str) -> int:
    """Sum over row groups of (x range) × (y range) — the query-space
    area a scan must consider; smaller = better data skipping."""
    area = 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sx = g.column(cols["x"]).statistics
            sy = g.column(cols["y"]).statistics
            area += (sx.max - sx.min + 1) * (sy.max - sy.min + 1)
    return area


def test_zorder_layout_tightens_bounds(spark, tmp_path):
    n, side = 16384, 128
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        ((F.col("id") * 7919) % side).alias("y"),
    )
    natural = str(tmp_path / "natural")
    zordered = str(tmp_path / "zorder")
    df.repartition(8).write.mode("overwrite").parquet(natural)
    zorder_write(df, ["x", "y"], zordered, num_files=8, bits=7, quantize=False)

    a_nat = _rowgroup_area(f"{natural}/*.parquet")
    a_z = _rowgroup_area(f"{zordered}/*.parquet")
    # natural row groups span ~the full 128×128 square each; z-order
    # files cover disjoint z-ranges → each bounds a small sub-square
    assert a_z * 2 < a_nat, (a_z, a_nat)

    # the layout is a pure reorder: same multiset of rows
    back = spark.read.parquet(zordered)
    assert back.count() == n
    assert back.groupBy().agg(F.sum("x"), F.sum("y")).collect() == \
        df.groupBy().agg(F.sum("x"), F.sum("y")).collect()


def test_zorder_write_quantized_roundtrip(spark, tmp_path):
    df = spark.range(1000).select(
        (F.col("id") * 13 % 997).alias("x"),
        (F.col("id") * 31 % 997).alias("y"),
    )
    out = str(tmp_path / "zq")
    zorder_write(df, ["x", "y"], out, num_files=4, bits=8, quantize=True)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert sorted(back.columns) == ["x", "y"]


def test_zvalue_rejects_overflowing_bit_budget(spark):
    import pytest

    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    with pytest.raises(ValueError, match="exceeds 63"):
        df.select(zvalue(["a", "b", "c", "d"], bits=16))
    # 4 × 15 = 60 bits is fine
    assert df.select(zvalue(["a", "b", "c", "d"], bits=15)).collect()


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from db_factfinder_spark.sources.layout import compact_parquet
    import glob

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 64
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1  # tiny input → one file
    a = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == list(range(10_000))  # lossless


def test_scale_profile_partition_sizing():
    """Session scale profiles: local == cores (every extra partition
    on one JVM is scheduling overhead); cluster == 3x cores so no
    shuffle partition outgrows executor memory at 100 TB and AQE
    coalesces the excess at runtime.  Explicit count always wins."""
    import pytest

    from db_factfinder_spark.session import resolve_shuffle_partitions

    assert resolve_shuffle_partitions(32, None, "local") == 32
    assert resolve_shuffle_partitions(32, None, "cluster") == 96
    assert resolve_shuffle_partitions(32, 7, "cluster") == 7
    with pytest.raises(ValueError):
        resolve_shuffle_partitions(32, None, "laptop")


def test_hive_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy layout + a partition-key predicate must
    prune at PLAN time: the scan's PartitionFilters carries the
    predicate, PartitionCount drops to 1 of 5, and non-matching
    partition directories are never touched — the layout decision
    that makes time/tenant predicates read ~0% of a 100 TB table."""
    d = str(tmp_path / "part_events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(d)

    df = spark.read.parquet(d).filter(F.col("event_type") == "click")
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(
        jvm.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    assert "isnotnull(event_type" in plan or "event_type" in plan.split(
        "PartitionFilters"
    )[1][:200]
    # physical evidence: exactly the one matching partition is read
    import re as _re

    m = _re.search(r"partition count: (\d+)", plan.lower())
    if m:  # Spark 4 formatted plans expose the pruned count
        assert int(m.group(1)) == 1
    got = df.count()
    want = ev.filter(F.col("event_type") == "click").count()
    assert got == want
