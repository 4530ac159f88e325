"""Physical-plan audits: the properties that decide 100 TB behavior.

These assert *plan shape*, not results — predicate pushdown reaching
the parquet scan, dimension joins resolving to broadcast-hash, and no
accidental cartesian products.  Plans are built against sf0.001 (shape
is scale-independent; file statistics only affect AQE runtime re-plans,
which these static checks deliberately ignore).
"""

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
QUERIES = entry_mod.queries()


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(jvm.fromString("formatted"))


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_no_cartesian_product(spark, name):
    assert "CartesianProduct" not in _plan(spark, name), (
        f"{name} plans a cartesian product"
    )


def test_q01_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed"
    # projection pruning: the scan must not read unused wide columns
    assert "l_comment" not in plan, "unpruned column reaches the scan"


def test_q05_dimension_joins_broadcast(spark):
    plan = _plan(spark, "q05_dim_join_rollup")
    # supplier→nation→region chain: every dim join is broadcast-hash
    assert plan.count("BroadcastHashJoin") >= 3 * 2  # node + detail section
    assert "SortMergeJoin" not in plan


def test_q10_base_join_broadcast(spark):
    plan = _plan(spark, "q10_pz_stats")
    assert "SortMergeJoin" not in plan, "base-variable join must broadcast (J3)"


def test_q37_spine_broadcasts_base(spark):
    plan = _plan(spark, "q37_factfinder_e2e")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q29_broadcasts_probe_side(spark):
    # brute-force ANN: the probe set is broadcast, the corpus never
    # shuffles — BroadcastNestedLoopJoin is the *intended* operator
    # (non-equi self-exclusion predicate)
    plan = _plan(spark, "q29_ann_topk")
    assert "BroadcastNestedLoopJoin" in plan


def test_bucketed_join_no_shuffle(spark):
    """The point of write_bucketed: a fact↔fact equi-join on the bucket
    key must plan with ZERO Exchange nodes — both scans are already
    hash-partitioned and per-bucket sorted."""
    from db_factfinder_spark.sources.bucketing import (
        bucketed_equi_join,
        write_bucketed,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li_b = write_bucketed(li, "lineitem_plan_audit", "l_orderkey", buckets=8)
    o_b = write_bucketed(orders, "orders_plan_audit", "o_orderkey", buckets=8)
    joined = bucketed_equi_join(li_b, o_b, "l_orderkey", "o_orderkey")
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = joined._jdf.queryExecution().explainString(jvm.fromString("formatted"))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    assert "Bucketed: true" in plan
    # and the result is the plain join's result
    expected = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).count()
    assert joined.count() == expected


def test_q42_join_subtree_has_no_exchange(spark):
    """End-to-end q42: everything at or below the SortMergeJoin is
    exchange-free (bucketed co-partitioned scans); the only shuffles in
    the whole plan are the small post-join groupBy and orderBy."""
    plan = _plan(spark, "q42_bucketed_join")
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    join_at = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
    below_join = "\n".join(lines[join_at:])
    assert "Exchange" not in below_join, f"join subtree shuffles:\n{tree}"
    above = "\n".join(lines[:join_at])
    n_exchange = sum("Exchange" in line for line in above.splitlines())
    assert n_exchange == 2, f"expected groupBy + orderBy exchanges only:\n{tree}"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """The production sink layout (partitionBy geotype) must yield
    partition PRUNING on read-back: a geotype filter becomes a
    PartitionFilter on the scan (directory-level skip — at 100 TB the
    non-matching geotypes are never opened), not a post-scan Filter."""
    from pyspark.sql import functions as F

    from db_factfinder_spark.sources.readers import write_parquet

    src = spark.read.parquet(f"{SF_DIR}/nation.parquet").select(
        F.col("n_nationkey").alias("census_geoid"),
        F.when(F.col("n_nationkey") % 2 == 0, "NTA").otherwise("tract").alias(
            "geotype"
        ),
        F.col("n_regionkey").cast("double").alias("e"),
    )
    path = str(tmp_path / "fact_by_geotype")
    write_parquet(src, path, partition_by=["geotype"])
    back = spark.read.parquet(path).filter(F.col("geotype") == "NTA")
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = back._jdf.queryExecution().explainString(jvm.fromString("formatted"))
    assert "PartitionFilters" in plan and "geotype" in plan.split(
        "PartitionFilters"
    )[1].splitlines()[0], f"geotype not a partition filter:\n{plan}"
    # pruning actually happened: only the NTA directory is scanned
    assert back.count() == src.filter(F.col("geotype") == "NTA").count()
    files = [r[0] for r in back.select(F.input_file_name()).distinct().collect()]
    assert files and all("geotype=NTA" in f for f in files), files


def test_q41_runs_real_stream(spark):
    """q41 must come from an actual Structured Streaming execution and
    equal the batch aggregation (stream↔batch equivalence)."""
    q41 = QUERIES["q41_stream_windowed_counts"](spark, SF_DIR)
    q20 = QUERIES["q20_event_windows"](spark, SF_DIR)
    got = {
        (r["w_start"], r["event_type"], r["n_events"])
        for r in q41.collect()
    }
    want = {
        (r["w_start"], r["event_type"], r["n_events"])
        for r in q20.collect()
    }
    assert got == want and len(got) > 0


def test_q43_shuffle_key_includes_salt(spark):
    """The salt must actually reach the join's shuffle key — otherwise
    the hot keys still land on single reduce tasks."""
    plan = _plan(spark, "q43_salted_skew_join")
    assert "__ff_salt" in plan
    assert "SortMergeJoin" in plan
    # the exchange feeding the join partitions on (key, salt)
    import re

    ex = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("grp" in e and "__ff_salt" in e for e in ex), ex


def test_q44_two_phase_partials(spark):
    """Two HashAggregate pairs: the salted partial on (key, salt) and
    the final merge on key."""
    plan = _plan(spark, "q44_two_phase_skew_agg")
    assert "__ff_salt" in plan


def test_q34_candidate_join_is_equi(spark):
    # the LSH point: candidate generation must be an equi-join on the
    # (table, bucket) key, never a nested loop over the corpus
    plan = _plan(spark, "q34_ann_lsh_topk")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_infer_filters_from_generate_stays_excluded(spark):
    """session.get_spark disables InferFiltersFromGenerate (the inferred
    size()>0 filter gets substituted+pushed below repartitions,
    re-running expensive generator expressions — measured 2x on LSH
    plans).  A Spark upgrade that renames/reshuffles the rule would
    silently re-enable it; assert both the conf and the optimized-plan
    shape so that regresses loudly."""
    from pyspark.sql import functions as F

    from db_factfinder_spark.llmdata.dedup import shingles

    rules = spark.conf.get("spark.sql.optimizer.excludedRules") or ""
    assert "InferFiltersFromGenerate" in rules

    df = spark.range(8).select(
        "id",
        shingles(
            F.concat(F.lit("a b c d e f "), F.col("id").cast("string"))
        ).alias("sh"),
    )
    plan = (
        df.select("id", F.explode("sh").alias("g"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the generator expression itself legitimately contains size(); an
    # *inferred* filter node above the Generate is what must not appear
    bad = [
        ln for ln in plan.splitlines() if "Filter" in ln and "size(" in ln
    ]
    assert not bad, f"InferFiltersFromGenerate leaked back in: {bad}"


def test_q47_geo2010_rollups_broadcast(spark):
    # every dimension/zone join in the 2010 registry is broadcast-hash;
    # the restructured zone rollup must not fall back to shuffle joins
    # (the right-outer form silently dropped the broadcast hint)
    plan = _plan(spark, "q47_geo2010_rollup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q49_decennial_spine_broadcasts(spark):
    plan = _plan(spark, "q49_decennial_e2e")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_operator_is_single_keyed_shuffle(spark):
    # the union-window as-of form: ONE hash exchange (the by-key
    # window), never a join operator at all.  Tested on the bare
    # operator — q56 adds a quote pre-aggregation shuffle of its own.
    from pyspark.sql import functions as F

    from db_factfinder_spark.operators.asof import asof_join
    from db_factfinder_spark.sources.readers import read_events

    ev = read_events(spark, f"{SF_DIR}/events.parquet")
    probes = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    quotes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    df = asof_join(probes, quotes, on="ts", by="user_id")
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(jvm.fromString("formatted"))
    assert "Join" not in plan
    assert plan.count("hashpartitioning") == 1


def test_q57_range_join_is_equi_not_nested_loop(spark):
    # the bucketed form turns the inequality join into an equi-join;
    # a BroadcastNestedLoopJoin would mean the rewrite regressed
    plan = _plan(spark, "q57_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q68_profile_assembly_adds_no_shuffle(spark):
    # the union + grouped first(ignorenulls) assembly plans NO join at
    # all (the reference's 74 chained outer merges would be 74 join
    # stages) and adds NO exchange of its own: every branch is already
    # hash-partitioned on its groupBy key (aliased to census_geoid)
    # with a common partition count, and Spark's partition-aligned
    # union lets the final first() aggregate reuse those exchanges —
    # the only hash exchanges in the plan are the three per-mapping
    # aggregates' own
    plan = _plan(spark, "q68_community_profiles")
    import re as _re

    assert "Join" not in plan
    hashes = _re.findall(r"hashpartitioning\(\w+", plan)
    assert len(hashes) == 3, f"assembly added an exchange: {hashes}\n{plan}"
    assert all("_groupingexpression" in h for h in hashes), hashes


def test_q73_merge_is_one_hash_shuffle_no_join(spark):
    """CDC merge: union + one row_number window on the merge key —
    never a base⋈updates join (which would shuffle both sides and
    need a second pass for insert-only keys)."""
    plan = _plan(spark, "q73_merge_upsert")
    assert "Join" not in plan
    # one hash exchange (the merge-key window); the only other
    # exchange is the presentation sort's range partitioning
    assert plan.count("hashpartitioning(") == 1
    # Spark 4's WindowGroupLimit prunes per-key rows below rank 1
    # map-side BEFORE the shuffle — the merge ships winners, not logs
    assert "WindowGroupLimit" in plan


def test_q75_corpus_size_is_broadcast(spark):
    """tf-idf: N arrives as a broadcast 1-row frame, not a collected
    literal — the plan stays lazy end to end."""
    plan = _plan(spark, "q75_tfidf_topterms")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q77_zvalue_is_map_only(spark):
    """Morton codes are pure projection work: no aggregation, no join,
    no hash shuffle — the only exchange is the final presentation
    sort's range partitioning."""
    plan = _plan(spark, "q77_zorder_values")
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "hashpartitioning(" not in plan
    assert "rangepartitioning" in plan  # presentation sort only


def test_q80_funnel_has_no_self_join(spark):
    """Funnel conversion: the click×purchase inequality self-join is
    replaced by the union-window forward carry — one hash shuffle for
    the window, one for the per-user aggregate (AQE may reuse)."""
    plan = _plan(spark, "q80_funnel_conversion")
    assert "Join" not in plan
    assert plan.count("hashpartitioning(") <= 2


def test_scd2_over_bucketed_log_is_shuffle_free(spark):
    """Event-log compaction at scale: over a change-log stored
    bucketed (and per-bucket sorted) on the entity key, the ENTIRE
    SCD2 pipeline — change window, segment roll-up, valid_to chaining
    — plans with ZERO Exchange nodes.  The scan's bucket layout
    satisfies every stage's clustering requirement, so a 100 TB
    compaction reads and writes without moving a single row between
    executors."""
    from db_factfinder_spark.operators.scd import scd2_intervals
    from db_factfinder_spark.sources.bucketing import write_bucketed

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "user_id", "event_id", "event_type"
    )
    tbl = write_bucketed(ev, "events_scd_audit", "user_id", buckets=8)
    out = scd2_intervals(
        tbl, key="user_id", order_by=["event_id"], attr="event_type"
    )
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = out._jdf.queryExecution().explainString(jvm.fromString("formatted"))
    assert "Exchange" not in plan, plan.split("\n\n")[0]
    assert "Bucketed: true" in plan
    # identical result to the unbucketed path
    base = scd2_intervals(
        ev, key="user_id", order_by=["event_id"], attr="event_type"
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, base.collect())
    )


def test_q86_cross_corpus_join_is_equi(spark):
    """Decontamination candidates must come from the (band, bucket)
    equi-join across corpora — never a nested loop over either side."""
    plan = _plan(spark, "q86_decontaminate")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_q105_stage_frames_materialize_once(spark):
    """The chained-funnel stages must not re-derive: inline, Catalyst
    re-computes s1 three times and s2 twice (6 raw scans); with the
    stage frames materialized the plan holds at most 4 scans (3 raw
    pushes + reused RDD frames)."""
    plan = _plan(spark, "q105_ordered_funnel")
    tree = plan.split("\n\n")[0]
    n_scans = tree.count("Scan parquet") + tree.count("Scan ExistingRDD")
    assert n_scans <= 4, tree


def test_partition_invariance_of_order_sensitive_queries(spark):
    """Whole-contract partition invariance: the queries whose internals
    are most order-sensitive (struct-sorted collect_list paths, window
    cumsum packing over a filtered chain) must return IDENTICAL rows
    under a radically different shuffle layout — the property that
    makes results reproducible on any cluster size."""
    targets = [
        "q90_session_paths",
        "q100_curation_pipeline",
        # round-4 order-sensitive internals: TakeOrdered τ thresholds
        # (priority sampling), greedy keep-lowest-id over a cluster
        # self-join (semantic dedup), vocabulary LIMIT ties (BPE)
        "q147_priority_sample",
        "q155_semantic_dedup",
        "q156_bpe_merges",
        # round-5 order-sensitive internals: rank-weighted Gini sums,
        # largest-remainder attribution (row_number ordered split),
        # RLE run numbering, gap boundary pairing windows
        "q189_gini_concentration",
        "q194_linear_attribution",
        "q195_event_runs",
        "q196_sequence_gaps",
        # repartitionByRange's sampled boundaries must not reach the
        # output: offsets correct for any boundary placement
        "q203_quantile_normalize",
        "q210_decile_gains",
        # minimal-covering-prefix boundary under ties
        "q213_top_p_vocab",
        # round-6 order-sensitive internals: PQ argmin tie-breaks,
        # KMV k-min rank windows + TakeOrdered, largest-remainder
        # time-decay split, iterative peel with materialized rounds,
        # nearest-asof tie rule
        "q240_pq_adc_topk",
        "q241_kmv_distinct",
        "q242_timedecay_attribution",
        "q245_kcore_prune",
        "q246_kmv_intersect",
        "q256_asof_directions",
        # round-6 late additions: global/grouped largest-remainder
        # ranks, HITS top-k ties, medoid argmin, min-struct walk picks,
        # waterline windows, Gini stump rank
        "q268_largest_remainder",
        "q270_hits_authorities",
        "q277_group_medoids",
        "q278_deterministic_walks",
        "q279_maxmin_fair_quota",
        "q281_topdown_reconcile",
        "q283_decision_stump",
        # session-close rank-bearing additions: floor/fill selection,
        # vocab cut ties, smoothed-rate ranks, top-10 RBO lists
        "q289_diversified_topn",
        "q291_vocab_coverage",
        "q297_smoothed_rates",
        "q298_rbo_rankings",
    ]
    before = {}
    for name in targets:
        before[name] = [tuple(r) for r in QUERIES[name](spark, SF_DIR).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for name in targets:
            again = [tuple(r) for r in QUERIES[name](spark, SF_DIR).collect()]
            assert again == before[name], f"{name} is partition-dependent"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_q112_bloom_filter_prunes_before_join(spark):
    """The Bloom membership test must sit in a Filter BEFORE the exact
    semi-join — pruning at the scan is the whole point."""
    plan = _plan(spark, "q112_bloom_semi_join")
    assert "forall" in plan and "md5" in plan, "bloom probe test missing"
    f = plan.find("Filter")
    j = plan.find("BroadcastHashJoin")
    assert f != -1 and j != -1
    assert "SortMergeJoin" not in plan  # key set broadcasts


def test_q115_cube_single_expand(spark):
    """CUBE compiles to ONE Expand (all 4 grouping sets in one
    shuffle), never one scan per set."""
    plan = _plan(spark, "q115_cube_agg")
    assert plan.count("Expand") >= 1
    assert plan.count("Scan parquet") == 2  # one scan: node + detail


def test_q127_grouping_sets_single_scan(spark):
    plan = _plan(spark, "q127_grouping_sets")
    assert plan.count("Scan parquet") == 2 and "Expand" in plan


def test_q131_adaptive_join_two_branches(spark):
    """Hot branch (salted) + cold branch (plain) union into one plan;
    both join branches stay broadcast (dim side is tiny)."""
    plan = _plan(spark, "q131_adaptive_skew_join")
    assert "Union" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_q116_skyline_no_global_sort_of_raw_data(spark):
    """The window runs on the distinct-cost frame AFTER the groupBy —
    the raw part table is never globally sorted.  Plan order: the
    (single-partition) Window must consume an Aggregate, and the
    left-semi join back broadcasts the tiny frontier."""
    plan = _plan(spark, "q116_skyline")
    assert plan.count("Window (") == 1 or plan.count("Window") >= 1
    # exactly one window node (node + detail mention) over the
    # aggregated frame, and the frontier joins back via broadcast
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_q146_sketch_probe_join_is_broadcast_equi(spark):
    """Count–Min probe: the depth×width sketch (a constant-size frame)
    broadcasts into an equi hash join on (row, bucket) — never a
    shuffle of the probe side against the sketch, never nested-loop."""
    plan = _plan(spark, "q146_countmin_freq")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_q147_priority_sample_uses_take_ordered(spark):
    """Top-(k+1) by priority is TakeOrdered (per-partition heap +
    driver merge) — the weighted population is never shuffle-sorted
    (the only Sort nodes order the ≤k-row result); τ comes back as a
    broadcast, not a collect."""
    plan = _plan(spark, "q147_priority_sample")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    # no exchange below the TakeOrdered: the population is consumed
    # in place (scan → project → per-partition heap)
    below = plan.split("TakeOrderedAndProject")[-1]
    assert "Exchange hashpartitioning" not in below.split("(1) Scan")[0]


def test_q149_bm25_scans_corpus_twice_only(spark):
    """BM25 tokenizes the corpus exactly twice (the doc-length pass
    and the postings pass — both materialized once, never per term or
    per consumer) and joins term/corpus stats via broadcast."""
    plan = _plan(spark, "q149_bm25_search")
    assert plan.count("Scan parquet") <= 2
    assert "BroadcastHashJoin" in plan


def test_q159_blocklist_is_broadcast_semi_then_anti(spark):
    """Suffix blocklisting: the blocklist probes as a BROADCAST
    left-semi (never a shuffle against the corpus), and the final
    filter is an anti join — no LIKE scan, no nested loop."""
    plan = _plan(spark, "q159_domain_blocklist")
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q164_rules_stat_joins_broadcast(spark):
    """Association rules: item counts and the basket total join as
    broadcasts; the only real shuffle partners are the basket
    self-join and the pair groupBy."""
    plan = _plan(spark, "q164_association_rules")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q166_containment_candidates_are_equi(spark):
    """Containment join: candidate generation is an equi hash/merge
    join on the shingle key — never a nested-loop pair scan."""
    plan = _plan(spark, "q166_containment_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q169_shuffle_is_one_shard_window(spark):
    """Epoch sharding: the rank window partitions on the shard key
    (n_shards-way parallel) and nothing funnels through a single
    partition — the failure mode of orderBy(rand()) / global
    row_number.  (The other exchanges are the _docs fixture
    repartition and the presentation orderBy.)"""
    import re

    plan = _plan(spark, "q169_shuffle_shards")
    ex = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any(e.startswith("shard#") for e in ex), ex
    assert "SinglePartition" not in plan


def test_q176_spatial_join_is_cell_equi(spark):
    """Grid distance join: candidates come from an equi join on the
    cell key — never a nested-loop point-pair scan."""
    plan = _plan(spark, "q176_grid_distance_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_q178_state_path_scans_corpus_text_once(spark, tmp_path):
    """The incremental-ingest contract, audited at the plan level:
    with a warm CorpusDedupState, corpus TEXT appears in the admission
    plan exactly once — the bounded candidate verify — never for
    fingerprints, shingles, or signatures (those come from the
    persisted state frames).  Corpus and batch live in separate
    parquet files so the scan count is unambiguous."""
    from db_factfinder_spark.llmdata.dedup import (
        admit_new_documents,
        build_corpus_state,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    corpus_path = str(tmp_path / "corpus.parquet")
    new_path = str(tmp_path / "new.parquet")
    spark.createDataFrame(
        [(0, base), (2, "completely unrelated corpus text here")],
        "doc_id int, text string",
    ).write.parquet(corpus_path)
    spark.createDataFrame(
        [(1, base), (3, base.replace("tok7", "zzz")), (5, None)],
        "doc_id int, text string",
    ).write.parquet(new_path)
    corpus = spark.read.parquet(corpus_path)
    new = spark.read.parquet(new_path)

    state = build_corpus_state(corpus, max_bucket=None)
    # warm the state the way a real pipeline would (persisted tables);
    # the lazy localCheckpoints truncate lineage at first action
    state.fingerprints.count()
    state.band_keys.count()

    df = admit_new_documents(
        corpus, new, max_bucket=None, corpus_state=state
    )
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(jvm.fromString("formatted"))
    assert plan.count("corpus.parquet") == 1, plan


def test_q180_drift_grid_is_bounded_and_materialized(spark):
    """Vocabulary drift: the chi-square grid machinery runs over
    MATERIALIZED grid-bounded frames — without lineage truncation the
    multi-consumer observed/cells frames re-evaluated the token
    explode per consumer (measured ~96 source scans; now the corpus
    tokenizes twice: vocabulary pass + restricted pass)."""
    plan = _plan(spark, "q180_vocab_drift")
    assert plan.count("Scan parquet") <= 2, plan.count("Scan parquet")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange ") <= 20


def test_q183_mad_passes_share_one_scan(spark):
    """MAD outliers: the narrow rows/dev projections are materialized
    so the two median passes and both flag joins share one source
    read instead of re-scanning per consumer (was 18 scans)."""
    plan = _plan(spark, "q183_mad_outliers")
    assert plan.count("Scan parquet") <= 1
    assert "BroadcastNestedLoopJoin" not in plan


def test_q182_anomaly_stats_join_broadcast(spark):
    """Count anomalies: per-key stats re-join the daily counts as a
    BROADCAST (key-cardinality frame), never a shuffle of the daily
    frame against itself."""
    plan = _plan(spark, "q182_count_anomalies")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q179_surprisal_vocab_join_is_keyed(spark):
    """Surprisal: the tf→vocabulary join is a keyed equi-join on the
    token (never nested-loop); the corpus total rides as a one-row
    broadcast."""
    plan = _plan(spark, "q179_unigram_surprisal")
    assert "CartesianProduct" not in plan
    ex_nlj = plan.count("BroadcastNestedLoopJoin")
    # exactly the one-row total broadcast(s), nothing data-sized
    assert ex_nlj <= 2


def test_q199_queries_never_rescan_corpus_text(spark):
    """The postings index is materialized once; the two phrase
    queries' final plan must contain NO parquet scan of the documents
    table — every term fetch reads the truncated-lineage index."""
    plan = _plan(spark, "q199_phrase_index_reuse")
    tree = plan.split("\n\n")[0]
    assert "Scan parquet" not in tree, tree
    assert "Scan ExistingRDD" in tree, tree


def test_q211_exact_rolling_distinct_has_no_expand(spark):
    """The coverage-interval identity means NO count-distinct anywhere:
    a COUNT DISTINCT would plan an Expand (or a two-phase distinct
    aggregate); the whole point of q211 is that plain COUNT suffices
    because the explode emits each user at most once per covered day."""
    plan = _plan(spark, "q211_rolling_exact_distinct")
    assert "Expand" not in plan


def test_q214_skipgram_plans_no_join(spark):
    """Skip-grams come from lead-k windows + a union of projections —
    the positions² self-join the naive formulation needs must never
    appear (a join here is the scale bug the operator exists to avoid)."""
    plan = _plan(spark, "q214_skipgram_counts")
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin"):
        assert node not in plan, f"q214 plans a {node}"


def test_q219_encoding_joins_are_broadcast(spark):
    """Target encoding joins per-category stats and the one-row global
    aggregate back onto the fact rows: both must broadcast — the fact
    table never shuffles for a stats lookup."""
    plan = _plan(spark, "q219_target_encoding")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
