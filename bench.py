"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced to full materialization through the noop sink
(no driver-side collect overhead, no result truncation).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from db_factfinder_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the shuffles
# and joins that dominate at scale.
HEADLINE = [
    "q01_pricing_summary",      # scan + group agg
    "q05_dim_join_rollup",      # broadcast join chain
    "q07_crosswalk_apportion",  # window ratio + apportionment + re-agg
    "q08_median_groups",        # pivot + median expressions
    "q10_pz_stats",             # two aggs + base join + MOE stats
    "q12_pivot_status",         # pivot
    "q17_topk_per_group",       # window top-k
    "q21_sessionize",           # double window pass
    "q25_exact_dedup",          # text normalize + hash agg
    "q26_jaccard_pairs",        # shingle explode + self-join
    "q27_minhash_signatures",   # minhash expression stack
    "q29_ann_topk",             # broadcast NLJ + vector math
    "q31_embedding_centroids",  # posexplode + group agg
    "q32_lsh_neardup_pairs",    # banded LSH bucket join + verify
    "q34_ann_lsh_topk",         # hyperplane LSH bucketed ANN
    "q37_factfinder_e2e",       # full factfinder spine
    "q47_geo2010_rollup",       # 2010 registry rollups + labs format
    "q48_simhash_multiprobe",   # d+1 blocked-prefix-table simhash join
    "q49_decennial_e2e",        # decennial spine via 2010 registry
    "q52_dedup_survivors",      # LSH pairs → components → survivor window
    "q53_vocab_topk",           # vocab heavy-hitters (explode + rank)
    "q54_sample_split",         # md5-stable split buckets, map-side
    "q73_merge_upsert",         # CDC union + row_number merge (1 shuffle)
    "q75_tfidf_topterms",       # explode → tf/df counts → top-k window
    "q77_zorder_values",        # Morton codes, pure codegen map
    "q80_funnel_conversion",    # forward as-of union-window funnel
    "q84_hll_distinct",         # portable HLL sketch + exact twin
    "q86_decontaminate",        # cross-corpus LSH decontamination
    "q100_curation_pipeline",   # filter→dedup→mix→pack, one lazy plan
    "q110_line_dedup",          # line-key counts → strip → re-assembly
    "q111_prefix_filter_pairs", # AllPairs exact sim-join (PPJoin bounds)
    "q113_heavy_hitters",       # Misra-Gries 2-pass frequent items
    "q116_skyline",             # distinct-cost Pareto frontier
    "q130_span_removal",        # ExactSubstr span dedup + re-assembly
    "q146_countmin_freq",       # CMS build + broadcast probe join
    "q149_bm25_search",         # postings-only BM25 + TakeOrdered
    "q150_collocations",        # vocab-pruned pair self-join + lift
    "q152_twap",                # lead-window durations + exact agg
    "q157_jl_projection",       # int8 quantize + sign-matrix dots
    "q178_admission_with_state",  # state-reuse incremental ingest gate
    "q179_unigram_surprisal",   # corpus-vocab keyed join + doc re-agg
    "q183_mad_outliers",        # two-pass integer median composition
    "q189_gini_concentration",  # rank window + decimal sufficient stats
    "q193_bigram_lm",           # tail-zip bigrams + window c_prev
    "q194_linear_attribution",  # union-window assign + remainder split
    "q195_event_runs",          # gaps-and-islands RLE, one key shuffle
    "q211_rolling_exact_distinct",  # coverage-interval explode, no distinct
    "q214_skipgram_counts",     # posexplode + lead-k windows + symmetrize
    "q240_pq_adc_topk",         # PQ codes scan + literal-codebook ADC
    "q241_kmv_distinct",        # KMV sketch: distinct → k-min → merge
    "q245_kcore_prune",         # iterative degree peel, materialized rounds
    "q272_fifo_cogs",           # cumulative-axis FIFO overlap join
    "q277_group_medoids",       # LSH groups → within-group medoid argmin
    "q278_deterministic_walks", # 3 keyed join steps + min-struct collapse
    "q301_acs_catalog_median",  # packaged-catalog 23-bin median spine
    "q302_winnow_pairs",        # winnowing fingerprints + postings join
    "q303_adamic_adar",         # wedge join + quantized ln-discount sum
    "q306_char_entropy",        # bounded-alphabet entropy, map-side
    "q308_zipf_slope",          # rank window + portable-ln coded OLS
    "q309_kneser_ney_bigram",   # bigram groupBy + w1 windows + backoff
    "q312_data_card",           # per-source curation report capstone
    "q331_acs_full_catalog_batch",  # WHOLE 1,047-var catalog, set-based
    "q333_real_crosswalk_weights",  # packaged real ratio.csv apportionment
    "q335_winnow_pairs_capped",     # q302's scale-safe max_df form
    "q336_adamic_adar_capped",      # q303's scale-safe max_degree form
    "q337_acs_catalog_batch_nta",   # catalog batch at AGGREGATED geotypes
    "q338_maxsim_late_interaction", # multi-vector MaxSim broadcast NLJ
    "q340_hashed_quality_logit",    # hashed-feature linear scoring
    "q341_ngram_novelty",           # gram min-id novelty, 2 partial aggs
    "q345_c4_cleaning",             # C4 sentence rules, zero-shuffle map
    "q346_gopher_rules",            # Gopher rule vector, 2 keyed shuffles
    "q347_redirect_resolution",     # pointer-doubling chain resolution
    "q353_typeahead_completions",   # vocab-bounded prefix index build
    "q357_bloom_parameter_plan",    # square-and-multiply FPR fold
    "q358_position_attribution",    # U-shaped split on shared assignment
    "q359_markov_attribution",      # journey windows + bounded-chain folds
    "q362_dedup_yield_curve",       # one-pass threshold-sweep report
    "q363_curation_v4",             # C4 -> Gopher -> near-dup -> stamp
    "q364_ivf_pq_topk",             # inverted lists + compressed codes
    "q365_acs_production_run",      # THE shipped artifact: full grid + CSV sink
    "q366_acs_catalog_batch_zones", # block-group zone rollups, set-based
    "q380_decennial2010_full_grid", # decennial grid: native + 2010 rollups
    "q383_cross_vintage_change_table",  # two vintage batches in ONE plan
    "q386_cross_geography_change_table",  # crosswalk-apportioned delta join
    "q388_geography_revision_splice",   # dimension-axis incremental maint
    # q198_bootstrap_ci is deliberately NOT a headline entry: its warm
    # time is ~95% driver-side Catalyst/AQE assembly of the 64-wide
    # aggregate tree (re-execution of the built plan runs in ~0.2 s,
    # flat from sf0.01 to sf0.1) — a fixed cost that amortizes over a
    # real scan and says nothing about data throughput at bench scale
    # (measurements in operators/bootstrap.py's docstring rationale).
    # q155_semantic_dedup is deliberately NOT a headline entry: its
    # in-cluster pair scan is n²/k by design and the oracle pins k=4
    # (SemDeDup grows k with the corpus); at fixed k it measures the
    # synthetic corpus's density, not engine throughput.
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _host_calibration(spark) -> float:
    """Fixed synthetic canary (never changes across rounds): a codegen
    sum over 30M rows plus a 4096-key shuffle over 3M rows, median of
    3 runs.  Its cost depends only on the host (CPU speed/steal, JIT),
    not on any repo code, so cross-round bench comparisons can divide
    out host variance instead of inferring it from per-query ratios
    (the PERF_NOTES r5 checkout-control methodology, automated —
    VERDICT r7 ask #6)."""
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 30_000_000, 1, 32).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        _force(
            spark.range(0, 3_000_000, 1, 32)
            .selectExpr("id % 4096 AS k", "id AS v")
            .groupBy("k")
            .sum("v")
        )
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[1], 3)


def _carried_comparison(
    times: dict, cal_now: float, here: str, sf: float | None
) -> dict | None:
    """Round-over-round carried-set ratio, divided by the host-speed
    factor (VERDICT r10 ask 1: a single start-of-run canary cannot see
    mid-run load drift, so raw driver-bench ratios were host-noise-
    dominated — r10's artifact read 1.106x while the same code's local
    capture read 0.849x).  Compares the carried query intersection
    against the newest PRIOR committed BENCH_local_r*.json and reports
    both the raw ratio and the ratio divided by cal_now/cal_prev."""
    import glob

    rnd = os.environ.get("SPARK_GRAFT_ROUND", "")
    cands = []
    for p in glob.glob(os.path.join(here, "BENCH_local_r*.json")):
        m = re.search(r"BENCH_local_r(\d+)\.json$", p)
        if m and (not rnd.isdigit() or int(m.group(1)) < int(rnd)):
            cands.append((int(m.group(1)), p))
    if not cands:
        return None
    _, prev_path = max(cands)
    try:
        with open(prev_path) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if prev.get("sf") != sf:
        # different scale factor — a time ratio would compare workloads,
        # not rounds
        return {"baseline": os.path.basename(prev_path),
                "skipped": f"sf mismatch ({prev.get('sf')} vs {sf})"}
    pq = prev.get("queries", {})
    carried = sorted(set(times) & set(pq))
    if not carried:
        return None
    t_now = sum(times[q] for q in carried)
    t_prev = sum(pq[q] for q in carried)
    if not t_prev:
        return None
    out = {
        "baseline": os.path.basename(prev_path),
        "n_carried": len(carried),
        "total_now": round(t_now, 3),
        "total_prev": round(t_prev, 3),
        "ratio_raw": round(t_now / t_prev, 4),
    }
    cal_prev = prev.get("host_calibration_mean") or prev.get(
        "host_calibration"
    )
    if cal_prev and cal_now:
        host_factor = cal_now / cal_prev
        out["host_speed_factor"] = round(host_factor, 4)
        out["ratio_calibrated"] = round(t_now / t_prev / host_factor, 4)
    return out


def main() -> None:
    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else None

    spark = get_spark(app_name="bench")
    queries = entry.queries()
    host_cal = _host_calibration(spark)

    # Session startup: the first job through a fresh JVM pays session
    # wiring, parquet-reader init, noop-sink registration, and baseline
    # JIT — previously absorbed by whichever query ran first (q01's
    # cold time was ~15s of which ~14s was this).  Measured on a
    # trivial scan+agg and reported as its own field so cold numbers
    # are per-query codegen cost, comparable round-over-round.
    t0 = time.perf_counter()
    _force(spark.read.parquet(f"{SF_DIR}/region.parquet").selectExpr("count(*)"))
    startup_s = round(time.perf_counter() - t0, 3)

    # Cold pass: first execution pays one-time whole-stage-codegen
    # (janino) compilation of each query's expression stack — recorded
    # separately so the headline number is engine throughput, which is
    # what repeated production runs (and a long-lived cluster) see.
    cold: dict[str, float] = {}
    plan_build: dict[str, float] = {}
    built = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        built[name] = queries[name](spark, SF_DIR)
        t1 = time.perf_counter()
        _force(built[name])
        cold[name] = round(time.perf_counter() - t0, 3)
        # driver-side plan assembly (py4j + Catalyst analysis + any
        # in-build checkpoint materializations) vs executor time — the
        # split that makes a plan-cost regression (let-chains, py4j
        # storms, lineage blow-ups) visible as its own number
        # (VERDICT r8 ask 5).  For the catalog batches this is ~85% of
        # cold and FLAT in data size; exec is the scaling part.
        plan_build[name] = round(t1 - t0, 3)

    # mid-sweep canary: the cold pass is the longest uninterrupted
    # stretch, so host load that arrives during it is invisible to the
    # pre canary — bracketing (pre / mid / post) bounds the drift
    host_cal_mid = _host_calibration(spark)

    # Steady state: best of two passes per query, REBUILDING the plan
    # each pass — rebuilding keeps lazily-materialized localCheckpoint
    # stages (shingles, simhash signatures) inside the measurement, so
    # warm numbers stay comparable round-over-round and honestly price
    # a production re-run of the query.  Single-pass numbers swing
    # ±15-20% with background machine load; the minimum is the engine's
    # throughput, and it stabilizes comparisons.
    times: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            t0 = time.perf_counter()
            _force(queries[name](spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
    total = sum(times.values())

    # Plan-reuse pass: re-execute the ALREADY-BUILT DataFrames — what a
    # long-lived session re-running a held plan pays (no py4j plan
    # assembly, checkpointed stages reused).  Reported separately.
    reexec: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(built[name])
        reexec[name] = round(time.perf_counter() - t0, 3)

    # post-sweep canary closes the bracket (VERDICT r10 ask 1): the
    # same fixed synthetic workload before, during, and after the sweep
    # turns "was the host loaded mid-run?" from a guess into a number.
    host_cal_post = _host_calibration(spark)
    cals = [host_cal, host_cal_mid, host_cal_post]
    host_cal_mean = round(sum(cals) / len(cals), 3)
    # >15% spread across the bracket = the host speed CHANGED mid-run;
    # per-query deltas inside this run are then suspect at that scale
    host_drift = round((max(cals) - min(cals)) / min(cals), 4)
    carried = _carried_comparison(
        times, host_cal_mean, os.path.dirname(os.path.abspath(__file__)), sf
    )

    # Per-query cold/reexec detail goes to a sidecar file: round 4's
    # headline line grew past the driver's stdout tail capture and was
    # truncated mid-line, losing the round's number.  The LAST stdout
    # line is now a compact headline (warm per-query map + scalar
    # totals only) so tail-based parsers always see complete JSON.
    detail = {
        "metric": "headline_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "startup_s": startup_s,
        "host_calibration": host_cal,
        "host_calibration_pre": host_cal,
        "host_calibration_mid": host_cal_mid,
        "host_calibration_post": host_cal_post,
        "host_calibration_mean": host_cal_mean,
        "host_drift": host_drift,
        "carried_vs_prev": carried,
        "cold_total": round(sum(cold.values()), 3),
        "queries_cold": cold,
        "queries_plan_build": plan_build,
        "plan_build_total": round(sum(plan_build.values()), 3),
        "reexec_total": round(sum(reexec.values()), 3),
        "queries_reexec": reexec,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    headline = {
        "metric": "headline_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "startup_s": startup_s,
        "host_calibration": host_cal,
        "host_calibration_pre": host_cal,
        "host_calibration_mid": host_cal_mid,
        "host_calibration_post": host_cal_post,
        "host_calibration_mean": host_cal_mean,
        "host_drift": host_drift,
        "carried_vs_prev": carried,
        "cold_total": round(sum(cold.values()), 3),
        "reexec_total": round(sum(reexec.values()), 3),
        # committed build/exec split for the catalog-batch entries
        # (VERDICT r9 ask 5): bench_detail.json is gitignored, so the
        # split for the plan-heavy entries rides the committed file —
        # a round-over-round plan-cost regression now diffs in git
        "plan_exec_split": {
            name: {"build": plan_build[name], "exec": reexec[name]}
            for name in (
                "q331_acs_full_catalog_batch",
                "q337_acs_catalog_batch_nta",
                "q365_acs_production_run",
                "q366_acs_catalog_batch_zones",
                "q380_decennial2010_full_grid",
                "q383_cross_vintage_change_table",
                "q386_cross_geography_change_table",
                "q388_geography_revision_splice",
            )
            if name in plan_build
        },
        "detail": "bench_detail.json",
    }
    # Driver-proof artifact (VERDICT r6 ask #6): also WRITE the
    # headline to BENCH_local_r{N}.json in-repo so a driver capture
    # gap can never lose a round's numbers again (r5's were lost).
    # Round number from $SPARK_GRAFT_ROUND, default a dateless
    # "latest" slot so repeated local runs don't litter.
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "")
    local_name = (
        f"BENCH_local_r{int(rnd):02d}.json" if rnd.isdigit()
        else "BENCH_local_latest.json"
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), local_name),
        "w",
    ) as f:
        json.dump(headline, f, indent=1)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
