"""Scale-ladder evidence for the headline dedup set (VERDICT r4 ask #5).

sf0.1 correctness says nothing about the growth ORDER of a pipeline —
a hidden quadratic candidate stage or a driver-side loop looks fine at
5k docs and dies at 5M.  This ladder synthesizes a k-times corpus whose
replicas are SHINGLE-DISJOINT (every token salted with its replica id,
ids re-keyed), so the dedup structure is exactly k independent copies
of the base corpus: candidate counts, group sizes, and pair yields all
scale by k, and a linear engine must scale ≈ k while a quadratic
candidate stage scales ≈ k².

Asserted per query, 1x vs 6x:

* runtime grows ≲ linearly (generous 2.5x slack per step + a fixed
  absorber for constant overheads — a quadratic stage would show ≥ 20x
  and trip the bound even under heavy timer noise);
* the physical plan keeps the SAME number of shuffle exchanges
  (shuffle-stable: scale must change data volume, never plan shape).
"""

import time

import pytest

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
LADDER = ["q111_prefix_filter_pairs", "q130_span_removal",
          "q48_simhash_multiprobe", "q52_dedup_survivors",
          # round-5: lead-k skip-grams must scale with tokens x window
          "q214_skipgram_counts",
          # round-7: winnowing postings join (shingle-disjoint replicas
          # -> fingerprint spaces disjoint, pair yield scales by k) and
          # the per-doc LM scoring join (model grows by k, doc-side
          # lookups stay per-bigram)
          "q302_winnow_pairs", "q324_bigram_perplexity"]
QUERIES = entry_mod.queries()


def _write_scaled_docs(spark, k: int, out_dir: str) -> None:
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(k):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                # salt every alphanumeric run IN PLACE (suffix survives
                # normalize_text as part of the token — a separator like
                # '_' would normalize into a standalone token between
                # every word, making any one shared vocabulary word a
                # shared shingle and the workload itself quadratic) →
                # replica shingle spaces are disjoint, per-replica
                # structure identical to base
                F.regexp_replace("text", r"([A-Za-z0-9]+)", f"$1zq{i}").alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _exchanges(spark, df) -> int:
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = df._jdf.queryExecution().explainString(jvm.fromString("formatted"))
    return plan.count("Exchange ")


@pytest.mark.slow
def test_scale_ladder_linear_and_shuffle_stable(spark, tmp_path):
    scales = (1, 6)
    dirs = {}
    for k in scales:
        d = str(tmp_path / f"x{k}")
        _write_scaled_docs(spark, k, d)
        dirs[k] = d

    for name in LADDER:
        t, ex = {}, {}
        for k in scales:
            df = QUERIES[name](spark, dirs[k])
            ex[k] = _exchanges(spark, df)
            t0 = time.perf_counter()
            _force(df)
            t[k] = time.perf_counter() - t0
        assert ex[6] == ex[1], (
            f"{name}: plan not shuffle-stable across scale "
            f"({ex[1]} vs {ex[6]} exchanges)"
        )
        # linear bound with 2.5x slack + 3s fixed-cost absorber
        bound = 6 * 2.5 * t[1] + 3.0
        assert t[6] <= bound, (
            f"{name}: 6x corpus took {t[6]:.1f}s vs 1x {t[1]:.1f}s "
            f"(bound {bound:.1f}s) — superlinear growth"
        )


def _write_scaled_events(spark, k: int, out_dir: str) -> None:
    """k replicas with disjoint user/event id spaces: every per-user
    window/join workload becomes k independent copies of the base."""
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    parts = []
    for i in range(k):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * 1_000_000_000)).alias(
                    "event_id"
                ),
                "ts",
                (F.col("user_id") + F.lit(i * 1_000_000_000)).alias(
                    "user_id"
                ),
                "event_type", "value", "props",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


EVENT_LADDER = ["q194_linear_attribution", "q195_event_runs",
                # round-5: gap-k pairs (window), coverage-interval
                # rolling distinct (bounded explode, no re-scan)
                "q207_sequential_pairs", "q211_rolling_exact_distinct"]


@pytest.mark.slow
def test_event_ladder_linear_and_shuffle_stable(spark, tmp_path):
    """Same ladder discipline for the keyed event-stream operators:
    the union-window attribution and RLE must scale with rows (their
    shuffles key on the user), never with users² or events²."""
    scales = (1, 6)
    dirs = {}
    for k in scales:
        d = str(tmp_path / f"ev{k}")
        _write_scaled_events(spark, k, d)
        dirs[k] = d

    for name in EVENT_LADDER:
        t, ex = {}, {}
        for k in scales:
            df = QUERIES[name](spark, dirs[k])
            ex[k] = _exchanges(spark, df)
            t0 = time.perf_counter()
            _force(df)
            t[k] = time.perf_counter() - t0
        assert ex[6] == ex[1], (
            f"{name}: plan not shuffle-stable across scale "
            f"({ex[1]} vs {ex[6]} exchanges)"
        )
        bound = 6 * 2.5 * t[1] + 3.0
        assert t[6] <= bound, (
            f"{name}: 6x events took {t[6]:.1f}s vs 1x {t[1]:.1f}s "
            f"(bound {bound:.1f}s) — superlinear growth"
        )


def _write_scaled_embs(spark, k: int, out_dir: str) -> None:
    """k replicas with disjoint vec_ids (labels kept: the PQ/IVF
    codebooks stay k-invariant, so runtime must scale with corpus
    rows only — codebook work is a constant)."""
    em = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts = [
        em.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding", "label",
        )
        for i in range(k)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def _write_scaled_lineitem(spark, k: int, out_dir: str) -> None:
    """k replicas with disjoint order/part/supplier key spaces: the
    KMV distinct stage sees k× distinct hashes per group while the
    k-min state stays constant-size."""
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 1_000_000_000)).alias(
                "l_orderkey"
            ),
            (F.col("l_partkey") + F.lit(i * 1_000_000_000)).alias(
                "l_partkey"
            ),
            *[c for c in li.columns
              if c not in ("l_orderkey", "l_partkey")],
        )
        for i in range(k)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


@pytest.mark.slow
def test_round6_ladder_linear_and_shuffle_stable(spark, tmp_path):
    """Round-6 operators under the same discipline: PQ encode+ADC must
    scale with corpus rows (codebook literal is constant), KMV with
    distinct values (state constant), time-decay attribution and
    triples with events (all shuffles key on the user)."""
    scales = (1, 6)
    dirs = {}
    for k in scales:
        d = str(tmp_path / f"r6x{k}")
        _write_scaled_embs(spark, k, d)
        _write_scaled_lineitem(spark, k, d)
        _write_scaled_events(spark, k, d)
        dirs[k] = d

    for name in ["q240_pq_adc_topk", "q241_kmv_distinct",
                 "q242_timedecay_attribution", "q244_sequential_triples"]:
        t, ex = {}, {}
        for k in scales:
            df = QUERIES[name](spark, dirs[k])
            ex[k] = _exchanges(spark, df)
            t0 = time.perf_counter()
            _force(df)
            t[k] = time.perf_counter() - t0
        assert ex[6] == ex[1], (
            f"{name}: plan not shuffle-stable across scale "
            f"({ex[1]} vs {ex[6]} exchanges)"
        )
        bound = 6 * 2.5 * t[1] + 3.0
        assert t[6] <= bound, (
            f"{name}: 6x data took {t[6]:.1f}s vs 1x {t[1]:.1f}s "
            f"(bound {bound:.1f}s) — superlinear growth"
        )


def _write_scaled_orders(spark, k: int, out_dir: str) -> None:
    # orderkey offsets MATCH _write_scaled_lineitem's (i·1e9) so the
    # orders⋈lineitem joins still pair within each replica
    o = spark.read.parquet(f"{BASE}/orders.parquet")
    parts = [
        o.select(
            (F.col("o_orderkey") + F.lit(i * 1_000_000_000)).alias(
                "o_orderkey"
            ),
            (F.col("o_custkey") + F.lit(i * 10_000_000)).alias(
                "o_custkey"
            ),
            *[c for c in o.columns
              if c not in ("o_orderkey", "o_custkey")],
        )
        for i in range(k)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")


@pytest.mark.slow
def test_round6_late_ladder_linear_and_shuffle_stable(spark, tmp_path):
    """Late round-6 operators under the ladder discipline: FIFO's
    cumulative-axis join scales with lineitems per part (replicas add
    parts, not per-part depth), the walks' per-step joins with edges,
    the stump's window with distinct bands."""
    scales = (1, 6)
    dirs = {}
    for k in scales:
        d = str(tmp_path / f"r6lx{k}")
        _write_scaled_lineitem(spark, k, d)
        _write_scaled_orders(spark, k, d)
        dirs[k] = d

    for name in ["q272_fifo_cogs", "q278_deterministic_walks",
                 "q283_decision_stump"]:
        t, ex = {}, {}
        for k in scales:
            df = QUERIES[name](spark, dirs[k])
            ex[k] = _exchanges(spark, df)
            t0 = time.perf_counter()
            _force(df)
            t[k] = time.perf_counter() - t0
        assert ex[6] == ex[1], (
            f"{name}: plan not shuffle-stable across scale "
            f"({ex[1]} vs {ex[6]} exchanges)"
        )
        bound = 6 * 2.5 * t[1] + 3.0
        assert t[6] <= bound, (
            f"{name}: 6x data took {t[6]:.1f}s vs 1x {t[1]:.1f}s "
            f"(bound {bound:.1f}s) — superlinear growth"
        )


def _write_scaled_graph(spark, k: int, out_dir: str) -> None:
    """k replicas with FULLY disjoint customer AND supplier node
    spaces (the generic lineitem scaler keeps suppkeys shared, which
    would grow supplier-hub degrees by k and make the wedge workload
    itself quadratic).  The custkey offset is a multiple of 11 so the
    q303 family's ``o_custkey % 11`` filter selects the same customers
    in every replica — the graph is exactly k independent copies."""
    o = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    oparts = [
        o.select(
            (F.col("o_orderkey") + F.lit(i * 1_000_000_000)).alias(
                "o_orderkey"
            ),
            (F.col("o_custkey") + F.lit(i * 11_000_000)).alias(
                "o_custkey"
            ),
            *[c for c in o.columns
              if c not in ("o_orderkey", "o_custkey")],
        )
        for i in range(k)
    ]
    lparts = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * 1_000_000_000)).alias(
                "l_orderkey"
            ),
            (F.col("l_suppkey") + F.lit(i * 1_000_000)).alias(
                "l_suppkey"
            ),
            *[c for c in li.columns
              if c not in ("l_orderkey", "l_suppkey")],
        )
        for i in range(k)
    ]
    u = oparts[0]
    for p in oparts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    u = lparts[0]
    for p in lparts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


@pytest.mark.slow
def test_round8_ladder_linear_and_shuffle_stable(spark, tmp_path):
    """Round-8 cost leaders under the ladder discipline (VERDICT r7
    ask #5): the Kneser-Ney LM join scales with bigram volume, the
    Adamic-Adar wedge join with Σdeg² over disjoint replica graphs
    (capped and uncapped twins both), the capped winnow postings join
    with fingerprint postings."""
    scales = (1, 6)
    doc_dirs, graph_dirs = {}, {}
    for k in scales:
        d = str(tmp_path / f"r8dx{k}")
        _write_scaled_docs(spark, k, d)
        doc_dirs[k] = d
        g = str(tmp_path / f"r8gx{k}")
        _write_scaled_graph(spark, k, g)
        graph_dirs[k] = g

    cases = [
        ("q309_kneser_ney_bigram", doc_dirs),
        ("q335_winnow_pairs_capped", doc_dirs),
        ("q303_adamic_adar", graph_dirs),
        ("q336_adamic_adar_capped", graph_dirs),
    ]
    for name, dirs in cases:
        t, ex = {}, {}
        for k in scales:
            df = QUERIES[name](spark, dirs[k])
            ex[k] = _exchanges(spark, df)
            t0 = time.perf_counter()
            _force(df)
            t[k] = time.perf_counter() - t0
        assert ex[6] == ex[1], (
            f"{name}: plan not shuffle-stable across scale "
            f"({ex[1]} vs {ex[6]} exchanges)"
        )
        bound = 6 * 2.5 * t[1] + 3.0
        assert t[6] <= bound, (
            f"{name}: 6x data took {t[6]:.1f}s vs 1x {t[1]:.1f}s "
            f"(bound {bound:.1f}s) — superlinear growth"
        )


def _write_scaled_embs(spark, k: int, out_dir: str) -> None:
    """k replicas with disjoint vec_id spaces; the q338/q344 probe sets
    (vec_id < 6 / < 8) stay fixed, so corpus-side work must scale by k
    while the broadcast probe side is constant."""
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts = [
        e.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(k)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


@pytest.mark.slow
def test_round8_new_ops_ladder_linear_and_shuffle_stable(spark, tmp_path):
    """The round-8 retrieval/curation operators under the ladder
    discipline: MaxSim scoring scales with corpus tokens (fixed
    broadcast query side), hashed-logit with token volume (the model
    broadcast grows but stays KB-scale), the novelty curves with gram
    volume (shingle-disjoint replicas keep per-replica structure), and
    crawl scheduling with per-host queue length."""
    scales = (1, 6)
    doc_dirs, emb_dirs = {}, {}
    for k in scales:
        d = str(tmp_path / f"r8nx{k}")
        _write_scaled_docs(spark, k, d)
        doc_dirs[k] = d
        e = str(tmp_path / f"r8ex{k}")
        _write_scaled_embs(spark, k, e)
        emb_dirs[k] = e

    cases = [
        ("q338_maxsim_late_interaction", emb_dirs),
        ("q340_hashed_quality_logit", doc_dirs),
        ("q341_ngram_novelty", doc_dirs),
        ("q342_crawl_schedule", doc_dirs),
        ("q343_novelty_with_state", doc_dirs),
    ]
    for name, dirs in cases:
        t, ex = {}, {}
        for k in scales:
            df = QUERIES[name](spark, dirs[k])
            ex[k] = _exchanges(spark, df)
            t0 = time.perf_counter()
            _force(df)
            t[k] = time.perf_counter() - t0
        assert ex[6] == ex[1], (
            f"{name}: plan not shuffle-stable across scale "
            f"({ex[1]} vs {ex[6]} exchanges)"
        )
        bound = 6 * 2.5 * t[1] + 3.0
        assert t[6] <= bound, (
            f"{name}: 6x data took {t[6]:.1f}s vs 1x {t[1]:.1f}s "
            f"(bound {bound:.1f}s) — superlinear growth"
        )


@pytest.mark.slow
def test_round8_second_wave_ladder(spark, tmp_path):
    """The round-8 second-wave operators under the ladder discipline:
    C4/Gopher cleaning scale with token volume (map-side / two keyed
    shuffles), redirect resolution with chain count (fixed doubling
    rounds — plan shape must not change with data), the typeahead
    index with vocabulary (salted replicas have disjoint vocabs), the
    attribution split with journey volume, and the recrawl estimator
    with visit volume."""
    scales = (1, 6)
    doc_dirs, ev_dirs = {}, {}
    for k in scales:
        d = str(tmp_path / f"r8wx{k}")
        _write_scaled_docs(spark, k, d)
        doc_dirs[k] = d
        e = str(tmp_path / f"r8vx{k}")
        _write_scaled_events(spark, k, e)
        ev_dirs[k] = e

    cases = [
        ("q345_c4_cleaning", doc_dirs),
        ("q346_gopher_rules", doc_dirs),
        ("q347_redirect_resolution", doc_dirs),
        ("q353_typeahead_completions", doc_dirs),
        ("q356_recrawl_priority", ev_dirs),
        ("q358_position_attribution", ev_dirs),
        ("q359_markov_attribution", ev_dirs),
        ("q362_dedup_yield_curve", doc_dirs),
        ("q363_curation_v4", doc_dirs),
    ]
    for name, dirs in cases:
        t, ex = {}, {}
        for k in scales:
            df = QUERIES[name](spark, dirs[k])
            ex[k] = _exchanges(spark, df)
            t0 = time.perf_counter()
            _force(df)
            t[k] = time.perf_counter() - t0
        assert ex[6] == ex[1], (
            f"{name}: plan not shuffle-stable across scale "
            f"({ex[1]} vs {ex[6]} exchanges)"
        )
        bound = 6 * 2.5 * t[1] + 3.0
        assert t[6] <= bound, (
            f"{name}: 6x data took {t[6]:.1f}s vs 1x {t[1]:.1f}s "
            f"(bound {bound:.1f}s) — superlinear growth"
        )
