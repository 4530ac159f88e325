"""checkpoint_mode switch (llmdata.checkpointing): local vs reliable
vs none must be result-identical; reliable must actually write to the
fault-tolerant checkpoint dir and truncate lineage.

NOTE: the error-path test must run before any test sets the session's
checkpoint dir (setCheckpointDir is global and irreversible), so it is
first in this file and this file sorts before test_llmdata.py."""

import os

import pytest
from pyspark.sql import functions as F

from db_factfinder_spark.llmdata.checkpointing import materialize
from db_factfinder_spark.llmdata.components import (
    connected_components,
    neardup_groups,
)
from db_factfinder_spark.llmdata.dedup import minhash_dedup_pairs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_reliable_without_dir_raises(spark):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set by an earlier test")
    df = spark.range(3)
    with pytest.raises(ValueError, match="setCheckpointDir"):
        materialize(df, "reliable")


def test_unknown_mode_raises(spark):
    with pytest.raises(ValueError, match="unknown checkpoint_mode"):
        materialize(spark.range(1), "banana")


def test_modes_result_identical_minhash(spark, docs, tmp_path_factory):
    spark.sparkContext.setCheckpointDir(
        str(tmp_path_factory.mktemp("ckpt"))
    )
    kw = dict(num_hashes=16, bands=8, verify_threshold=0.6)
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    local = sorted(minhash_dedup_pairs(docs, **kw).collect(), key=key)
    rel = sorted(
        minhash_dedup_pairs(docs, **kw, checkpoint_mode="reliable").collect(),
        key=key,
    )
    none = sorted(
        minhash_dedup_pairs(docs, **kw, checkpoint_mode="none").collect(),
        key=key,
    )
    assert local == rel == none
    assert len(local) > 0


def test_reliable_components_identical_and_writes_dir(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_cc"))
    spark.sparkContext.setCheckpointDir(ckpt)
    # two components: {1..5} chain + {10, 11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
        "id_a bigint, id_b bigint",
    )
    key = lambda r: r["doc_id"]  # noqa: E731
    local = sorted(neardup_groups(pairs).collect(), key=key)
    rel = sorted(
        neardup_groups(pairs, checkpoint_mode="reliable").collect(), key=key
    )
    assert local == rel
    assert {(r["doc_id"], r["rep_id"]) for r in rel} == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10),
    }
    # reliable mode wrote RDD checkpoint files under the configured dir
    found = [
        f for _, _, files in os.walk(ckpt) for f in files
    ]
    assert found, "reliable checkpoint produced no files"


def test_reliable_truncates_lineage(spark, tmp_path_factory):
    spark.sparkContext.setCheckpointDir(
        str(tmp_path_factory.mktemp("ckpt_lin"))
    )
    base = spark.range(100).withColumn("x", F.col("id") * 2)
    ck = materialize(base, "reliable")
    assert ck.count() == 100  # materializes the lazy checkpoint
    # after materialization the physical scan reads the checkpoint,
    # not the original range
    plan = ck._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "Checkpoint" in plan
