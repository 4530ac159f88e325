"""Cluster-profile smoke (VERDICT r6 ask #8): the 3x-cores shuffle
sizing the session docstrings promise must hold — run the top-10
headline queries under the cluster shuffle-partition count and assert
results identical to the local profile and no plan blowup.

``spark.sql.shuffle.partitions`` is runtime-configurable, so the test
flips it on the shared session (one JVM) instead of building a second
SparkSession — the same mechanism a cluster deployment uses, and the
thing actually under test (partition-count invariance of every
operator's results).
"""

import pytest

from db_factfinder_spark.session import resolve_shuffle_partitions

SF_DIR = "/root/testdata/sf0.001"

# top-10 by cost in BENCH_r06 (stable ranking across rounds)
TOP10 = [
    "q245_kcore_prune",
    "q111_prefix_filter_pairs",
    "q277_group_medoids",
    "q240_pq_adc_topk",
    "q48_simhash_multiprobe",
    "q52_dedup_survivors",
    "q146_countmin_freq",
    "q178_admission_with_state",
    "q130_span_removal",
    "q183_mad_outliers",
]


def _freeze(df):
    cols = sorted(df.columns)
    rows = [
        tuple(str(r[c]) for c in cols)
        for r in df.select(*cols).collect()
    ]
    return sorted(rows)


def test_profile_math():
    assert resolve_shuffle_partitions(32, None, "local") == 32
    assert resolve_shuffle_partitions(32, None, "cluster") == 96
    assert resolve_shuffle_partitions(32, 7, "cluster") == 7
    with pytest.raises(ValueError):
        resolve_shuffle_partitions(32, None, "galaxy")


@pytest.mark.slow
def test_top10_identical_under_cluster_profile(spark):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    cpus = int(spark.conf.get("spark.sql.shuffle.partitions"))
    local = {}
    for name in TOP10:
        local[name] = _freeze(qs[name](spark, SF_DIR))
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(resolve_shuffle_partitions(cpus, None, "cluster")),
    )
    try:
        for name in TOP10:
            df = qs[name](spark, SF_DIR)
            assert _freeze(df) == local[name], name
            # no plan blowup: the executed plan stays the same order
            # of magnitude (partition count must not multiply nodes)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert len(plan) < 2_000_000, (name, len(plan))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
