"""Round-8 second-wave operators: web-corpus cleaning (C4 sentence
rules, Gopher rule vector), redirect-chain resolution.

Planted-case discipline: every rule/branch gets a row that flips it,
so a silently inverted predicate cannot stay green.
"""

import pytest
from pyspark.sql import functions as F

from db_factfinder_spark.llmdata.urls import resolve_redirects
from db_factfinder_spark.llmdata.webclean import c4_clean, gopher_rules


def _rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


class TestC4Clean:
    def test_sentence_rules(self, spark):
        # sent_len=3, min_sent_tokens=2: doc 1 has one kept sentence
        # ("the x y"), one dropped for no stopword ("p q r"), one
        # dropped for badword ("the javascript z"), and a short tail.
        docs = spark.createDataFrame(
            [(1, "the x y p q r the javascript z tail")],
            "doc_id long, text string",
        )
        out = c4_clean(
            docs, sent_len=3, min_sent_tokens=2,
            min_kept_sentences=1, min_doc_tokens=1,
        ).collect()[0]
        assert out["n_sentences"] == 4
        assert out["n_kept"] == 1
        assert out["n_tokens_kept"] == 3
        assert out["kept"] is True

    def test_doc_rules(self, spark):
        # two docs: one with 3 kept sentences (kept), one with 2
        # (dropped by min_kept_sentences=3)
        three = "the a b " * 3
        two = "the a b " * 2
        docs = spark.createDataFrame(
            [(1, three.strip()), (2, two.strip())],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in c4_clean(
                docs, sent_len=3, min_sent_tokens=2,
                min_kept_sentences=3, min_doc_tokens=1,
            ).collect()
        }
        assert out[1]["kept"] is True
        assert out[2]["kept"] is False

    def test_token_bounds(self, spark):
        docs = spark.createDataFrame(
            [(1, "the a b"), (2, "the a b the c d")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["kept"]
            for r in c4_clean(
                docs, sent_len=3, min_sent_tokens=2,
                min_kept_sentences=1, min_doc_tokens=4,
            ).collect()
        }
        assert out == {1: False, 2: True}

    def test_empty_text(self, spark):
        docs = spark.createDataFrame(
            [(1, "   ")], "doc_id long, text string"
        )
        out = c4_clean(docs).collect()[0]
        assert out["n_sentences"] == 0
        assert out["kept"] is False

    def test_map_side_only(self, spark):
        docs = spark.createDataFrame(
            [(1, "the a b")], "doc_id long, text string"
        )
        plan = c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # zero shuffles by construction


class TestGopherRules:
    def test_rule_flips(self, spark):
        base = "the a and of " + " ".join(
            f"word{chr(97 + i % 26)}{chr(97 + i // 26)}" for i in range(46)
        )
        docs = spark.createDataFrame(
            [
                (1, base),                       # passes everything
                (2, "the a " + "x " * 10),       # too few tokens
                (3, "the of " + "zz9 " * 48),    # non-alpha tokens
                (4, " ".join(f"w{i}" for i in range(50))),  # no stopwords
                (5, "the a and of " + "dup " * 46),  # top unigram flood
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in gopher_rules(docs, max_top_unigram_frac=0.2).collect()
        }
        assert out[1]["kept"] is True
        assert out[2]["r_len"] is False and out[2]["kept"] is False
        assert out[3]["r_alpha"] is False and out[3]["kept"] is False
        assert out[4]["r_stop"] is False and out[4]["kept"] is False
        assert out[5]["r_top"] is False and out[5]["kept"] is False

    def test_mean_word_len_bounds(self, spark):
        # 50 single-char tokens -> mwl 1.0 < 3.0
        docs = spark.createDataFrame(
            [(1, "the a " + "b " * 48)], "doc_id long, text string"
        )
        row = gopher_rules(docs).collect()[0]
        assert row["mean_word_len"] < 3.0
        assert row["r_mwl"] is False

    def test_empty_doc_rules_are_false_not_null(self, spark):
        docs = spark.createDataFrame(
            [(1, "   ")], "doc_id long, text string"
        )
        row = gopher_rules(docs).collect()[0]
        assert row["r_mwl"] is False
        assert row["r_alpha"] is False
        assert row["r_top"] is False
        assert row["kept"] is False
        assert row["mean_word_len"] is None  # ratio honestly undefined

    def test_statistics_exact(self, spark):
        docs = spark.createDataFrame(
            [(1, "the the cat sat")], "doc_id long, text string"
        )
        row = gopher_rules(docs).collect()[0]
        assert row["n_tok"] == 4
        assert row["stop_count"] == 2
        assert row["mean_word_len"] == pytest.approx(3.0)
        assert row["top_unigram_frac"] == pytest.approx(0.5)


class TestResolveRedirects:
    def test_chain_and_terminal(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
        )
        out = {
            r["url"]: (r["final_url"], r["hops"], r["resolved"])
            for r in resolve_redirects(edges, max_hops=8).collect()
        }
        assert out["a"] == ("d", 3, True)
        assert out["b"] == ("d", 2, True)
        assert out["d"] == ("d", 0, True)  # terminal maps to itself

    def test_cycle_unresolved(self, spark):
        edges = spark.createDataFrame(
            [("x", "y"), ("y", "x"), ("a", "x")], "src string, dst string"
        )
        out = {
            r["url"]: r["resolved"]
            for r in resolve_redirects(edges, max_hops=8).collect()
        }
        assert out["x"] is False and out["y"] is False
        assert out["a"] is False  # chain feeding a cycle never lands

    def test_long_chain_beyond_cap(self, spark):
        # chain of 20 > max_hops=8 (doubling reaches 2^3): unresolved
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(20)], "src long, dst long"
        )
        out = {
            r["url"]: (r["final_url"], r["resolved"])
            for r in resolve_redirects(edges, max_hops=8).collect()
        }
        assert out[0] == (8, False)  # walked 2^3 hops, not terminal
        assert out[15] == (20, True)

    def test_plan_truncated_per_round(self, spark):
        edges = spark.createDataFrame(
            [("a", "b")], "src string, dst string"
        )
        # a self-join whose input is a live plan re-embeds the subtree
        # on BOTH sides (2^rounds leaf copies by the last round); the
        # per-round materialize keeps the visible plan to the final
        # round's join + the terminal-flag join
        plan = (
            resolve_redirects(edges, max_hops=16)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert plan.count("Join") <= 3

    def test_non_power_of_two_max_hops_raises(self, spark):
        edges = spark.createDataFrame(
            [("a", "b")], "src string, dst string"
        )
        with pytest.raises(ValueError):
            resolve_redirects(edges, max_hops=5)

    def test_checkpoint_mode_none_keeps_pure_plan(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
        out = {
            r["url"]: (r["final_url"], r["hops"], r["resolved"])
            for r in resolve_redirects(
                edges, max_hops=4, checkpoint_mode="none"
            ).collect()
        }
        assert out["a"] == ("c", 2, True)


class TestIsotonicFit:
    def _fit(self, spark, rows):
        from db_factfinder_spark.operators.evaluation import isotonic_fit

        df = spark.createDataFrame(rows, "bin long, n long, sum_y long")
        return {
            r["bin"]: r["fitted"] for r in isotonic_fit(df).collect()
        }

    def test_pools_violation(self, spark):
        # rates 0.5, 0.2, 0.8 -> PAV pools the first two to 2/7
        out = self._fit(spark, [(0, 2, 1), (1, 5, 1), (2, 5, 4)])
        assert out[0] == pytest.approx(2 / 7)
        assert out[1] == pytest.approx(2 / 7)
        assert out[2] == pytest.approx(0.8)

    def test_monotone_input_unchanged(self, spark):
        out = self._fit(spark, [(0, 4, 1), (1, 4, 2), (2, 4, 3)])
        assert out == {
            0: pytest.approx(0.25),
            1: pytest.approx(0.5),
            2: pytest.approx(0.75),
        }

    def test_output_is_monotone(self, spark):
        rows = [(b, 7, (b * 13) % 8) for b in range(10)]
        out = self._fit(spark, rows)
        fitted = [out[b] for b in range(10)]
        assert fitted == sorted(fitted)

    def test_total_pool_on_decreasing(self, spark):
        # strictly decreasing rates -> one global pool at the mean
        out = self._fit(spark, [(0, 2, 2), (1, 2, 1), (2, 2, 0)])
        assert all(v == pytest.approx(0.5) for v in out.values())


class TestSprtDecision:
    def _run(self, spark, rows, **kw):
        from db_factfinder_spark.operators.evaluation import sprt_decision

        df = spark.createDataFrame(
            rows, "arm long, event_id long, success boolean"
        )
        kw.setdefault("p0", (1, 4))
        kw.setdefault("p1", (3, 4))
        kw.setdefault("alpha", (1, 10))
        kw.setdefault("beta", (1, 10))
        return {
            r["arm"]: r
            for r in sprt_decision(
                df, ["arm"], "event_id", "success", **kw
            ).collect()
        }

    def test_h1_on_successes(self, spark):
        # c1 = ln 3 ~ 1.0986e9 nano; A = ln 9 ~ 2.1972e9: 2 successes
        rows = [(0, i, True) for i in range(5)]
        out = self._run(spark, rows)[0]
        assert out["decision"] == "h1"
        assert out["decided_at"] == 1  # second event crosses
        assert out["n_events"] == 5

    def test_h0_on_failures(self, spark):
        rows = [(0, i, False) for i in range(5)]
        out = self._run(spark, rows)[0]
        assert out["decision"] == "h0"
        assert out["decided_at"] == 1

    def test_continue_on_alternating(self, spark):
        # success+failure nets ln3 + ln(1/3) = 0: never crosses
        rows = [(0, i, i % 2 == 0) for i in range(6)]
        out = self._run(spark, rows)[0]
        assert out["decision"] == "continue"
        assert out["decided_at"] is None
        assert out["llr_at_decision"] is None

    def test_first_crossing_sticks(self, spark):
        # cross h1 at event 1, then wander back below the bound:
        # decision and decided_at stay at the first crossing
        rows = [(0, 0, True), (0, 1, True)] + [
            (0, i, False) for i in range(2, 10)
        ]
        out = self._run(spark, rows)[0]
        assert out["decision"] == "h1"
        assert out["decided_at"] == 1
        assert out["final_llr_nano"] < out["llr_at_decision"]

    def test_groups_independent(self, spark):
        rows = [(0, i, True) for i in range(3)] + [
            (1, i, False) for i in range(3)
        ]
        out = self._run(spark, rows)
        assert out[0]["decision"] == "h1"
        assert out[1]["decision"] == "h0"

    def test_invalid_rational_raises(self, spark):
        with pytest.raises(ValueError):
            self._run(spark, [(0, 0, True)], p0=(5, 4))


class TestTopkRecall:
    def test_overlap_counting(self, spark):
        from db_factfinder_spark.llmdata.similarity import topk_recall

        ref = spark.createDataFrame(
            [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
            "probe_id long, neighbor_id long",
        )
        cand = spark.createDataFrame(
            [(1, 11), (1, 12), (1, 99), (2, 77), (2, 88), (2, 99)],
            "probe_id long, neighbor_id long",
        )
        out = {
            r["probe_id"]: (r["n_overlap"], r["recall"])
            for r in topk_recall(ref, cand, k=3).collect()
        }
        assert out[1] == (2, pytest.approx(2 / 3))
        assert out[2] == (0, pytest.approx(0.0))  # zero-overlap reported


class TestTClosenessAudit:
    def _audit(self, spark, rows, t=(1, 5)):
        from db_factfinder_spark.operators.privacy import t_closeness_audit

        df = spark.createDataFrame(rows, "grp string, cat long")
        return {
            r["grp"]: r
            for r in t_closeness_audit(df, ["grp"], "cat", t=t).collect()
        }

    def test_hand_computed_emd(self, spark):
        # global: 3x cat0 + 3x cat1; group a all cat0, group b all cat1
        # -> each EMD = |3/3 - 3/6| / (2-1) = 0.5
        rows = [("a", 0)] * 3 + [("b", 1)] * 3
        out = self._audit(spark, rows)
        assert out["a"]["emd"] == pytest.approx(0.5)
        assert out["b"]["emd"] == pytest.approx(0.5)
        assert out["a"]["is_close"] is False  # 0.5 > 1/5

    def test_identical_distribution_is_close(self, spark):
        rows = [("a", 0), ("a", 1), ("b", 0), ("b", 1)]
        out = self._audit(spark, rows)
        assert out["a"]["emd"] == pytest.approx(0.0)
        assert out["a"]["is_close"] is True

    def test_zero_cells_materialized(self, spark):
        # group b never sees cat 2: the spine must still produce the
        # cumulative row, or b's EMD silently shrinks
        rows = [("a", 0), ("a", 1), ("a", 2), ("b", 0), ("b", 1), ("b", 1)]
        out = self._audit(spark, rows)
        assert out["b"]["group_size"] == 3
        assert out["b"]["emd"] > 0.0

    def test_single_category_edge(self, spark):
        rows = [("a", 7), ("b", 7)]
        out = self._audit(spark, rows)
        assert out["a"]["emd"] == 0.0
        assert out["a"]["is_close"] is True

    def test_threshold_cross_multiplication(self, spark):
        # EMD exactly 1/2: t=(1,2) accepts (<=), t=(49,100) rejects
        rows = [("a", 0)] * 3 + [("b", 1)] * 3
        assert self._audit(spark, rows, t=(1, 2))["a"]["is_close"] is True
        assert (
            self._audit(spark, rows, t=(49, 100))["a"]["is_close"] is False
        )


class TestLooInfluence:
    def _run(self, spark, rows):
        from db_factfinder_spark.operators.regression import loo_influence

        df = spark.createDataFrame(rows, "grp long, x long, y long")
        return {
            r["grp"]: r
            for r in loo_influence(
                df, ["grp"], F.col("x"), F.col("y")
            ).collect()
        }

    def test_removing_outlier_group_restores_slope(self, spark):
        rows = [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 1, 10), (1, 2, 20)]
        out = self._run(spark, rows)
        # without the 10x group the fit is exactly y = x
        assert out[1]["slope_without"] == pytest.approx(1.0)
        assert out[0]["slope_without"] == pytest.approx(10.0)
        assert out[0]["slope_full"] == out[1]["slope_full"]
        assert out[1]["influence"] == pytest.approx(
            1.0 - out[1]["slope_full"]
        )

    def test_degenerate_refit_is_null(self, spark):
        # without group 1 only x=5 remains: zero variance -> NULL
        rows = [(0, 5, 1), (0, 5, 2), (1, 1, 1), (1, 2, 2)]
        out = self._run(spark, rows)
        assert out[1]["slope_without"] is None
        assert out[1]["influence"] is None
        assert out[0]["slope_without"] == pytest.approx(1.0)


class TestTypeaheadCompletions:
    def test_index_contents(self, spark):
        from db_factfinder_spark.llmdata.strmatch import (
            typeahead_completions,
        )

        docs = spark.createDataFrame(
            [(1, "apple apple apply band")], "doc_id long, text string"
        )
        out = typeahead_completions(docs, max_prefix_len=3, k=2).collect()
        by_prefix = {}
        for r in out:
            by_prefix.setdefault(r["prefix"], []).append(
                (r["rank"], r["token"], r["cnt"])
            )
        assert by_prefix["a"] == [(1, "apple", 2), (2, "apply", 1)]
        assert by_prefix["app"] == [(1, "apple", 2), (2, "apply", 1)]
        assert by_prefix["b"] == [(1, "band", 1)]
        # prefixes never exceed max_prefix_len
        assert max(len(p) for p in by_prefix) == 3

    def test_tie_breaks_lexicographic(self, spark):
        from db_factfinder_spark.llmdata.strmatch import (
            typeahead_completions,
        )

        docs = spark.createDataFrame(
            [(1, "beta bear")], "doc_id long, text string"
        )
        out = {
            (r["prefix"], r["rank"]): r["token"]
            for r in typeahead_completions(
                docs, max_prefix_len=2, k=2
            ).collect()
        }
        assert out[("be", 1)] == "bear"
        assert out[("be", 2)] == "beta"


class TestLshParameterPlan:
    def test_plan_shape_and_optimum(self, spark):
        from db_factfinder_spark.llmdata.dedup import lsh_parameter_plan

        rows = lsh_parameter_plan(
            spark, total_hashes=128, threshold=(4, 5)
        ).collect()
        assert len(rows) == 6
        assert {(r["bands"], r["rows_per_band"]) for r in rows} == {
            (64, 2), (32, 4), (16, 8), (8, 16), (4, 32), (2, 64),
        }
        by_r = {r["rows_per_band"]: r for r in rows}
        # extremes lose: r=2 floods false positives, r=64 floods false
        # negatives; a middle split wins the total
        best = min(rows, key=lambda r: (r["total_nano"], r["bands"]))
        assert best["rows_per_band"] in (8, 16, 32)
        assert by_r[2]["fp_nano"] > best["fp_nano"]
        assert by_r[64]["fn_nano"] > best["fn_nano"]

    def test_non_power_of_two_raises(self, spark):
        from db_factfinder_spark.llmdata.dedup import lsh_parameter_plan

        with pytest.raises(ValueError):
            lsh_parameter_plan(spark, total_hashes=96)


class TestCopelandFuse:
    def _fuse(self, spark, rows, sources, k=10):
        from db_factfinder_spark.llmdata.similarity import copeland_fuse

        df = spark.createDataFrame(
            rows, "query_id long, doc_id string, rank long, source string"
        )
        return copeland_fuse(df, sources, k=k).collect()

    def test_condorcet_winner(self, spark):
        rows = [
            (0, "A", 1, "s1"), (0, "B", 2, "s1"),
            (0, "A", 1, "s2"), (0, "C", 2, "s2"),
            (0, "B", 1, "s3"), (0, "A", 2, "s3"),
        ]
        out = self._fuse(spark, rows, ["s1", "s2", "s3"])
        got = [(r["rank"], r["doc_id"], r["copeland_x2"]) for r in out]
        # A beats B 2-1 and C 3-0 (missing ranks below all listed);
        # B beats C 2-1
        assert sorted(got) == [(1, "A", 4), (2, "B", 2), (3, "C", 0)]

    def test_both_missing_is_tie(self, spark):
        # B and C both absent from s2: that retriever contributes a
        # tie, s1 decides B over C
        rows = [
            (0, "A", 1, "s1"), (0, "B", 2, "s1"), (0, "C", 3, "s1"),
            (0, "A", 1, "s2"),
        ]
        out = {r["doc_id"]: r["copeland_x2"] for r in self._fuse(
            spark, rows, ["s1", "s2"]
        )}
        assert out["A"] == 4
        assert out["B"] == 2
        assert out["C"] == 0

    def test_single_candidate_surfaces(self, spark):
        # one retriever, one doc: no opponents, but the query must
        # still fuse (score 0, rank 1) — the inner-join shape drops it
        rows = [(0, "only", 1, "s1")]
        out = self._fuse(spark, rows, ["s1"])
        assert len(out) == 1
        assert out[0]["doc_id"] == "only"
        assert out[0]["copeland_x2"] == 0
        assert out[0]["rank"] == 1

    def test_k_truncates(self, spark):
        rows = [(0, f"d{i}", i + 1, "s1") for i in range(5)]
        out = self._fuse(spark, rows, ["s1"], k=2)
        assert len(out) == 2
        assert out[0]["doc_id"] == "d0"


class TestRecrawlPriority:
    def _run(self, spark, rows):
        from db_factfinder_spark.llmdata.crawl import recrawl_priority

        df = spark.createDataFrame(
            rows, "url string, visit_id long, content_hash string"
        )
        return {r["url"]: r for r in recrawl_priority(df).collect()}

    def test_change_rate(self, spark):
        import math

        rows = [
            ("a", 0, "x"), ("a", 1, "x"), ("a", 2, "y"), ("a", 3, "y"),
        ]
        out = self._run(spark, rows)["a"]
        assert out["n_intervals"] == 3
        assert out["n_changed"] == 1
        assert out["saturated"] is False
        # lambda = ln(3) - ln(2) in nano-nats (portable_ln < 1e-10 rel)
        expect = round((math.log(3) - math.log(2)) * 1e9)
        assert abs(out["lambda_nano"] - expect) <= 5

    def test_saturated_history(self, spark):
        rows = [("b", 0, "p"), ("b", 1, "q"), ("b", 2, "r")]
        out = self._run(spark, rows)["b"]
        assert out["saturated"] is True
        assert out["lambda_nano"] is None

    def test_single_visit_has_no_estimate(self, spark):
        rows = [("c", 0, "x"), ("d", 0, "x"), ("d", 1, "x")]
        out = self._run(spark, rows)
        assert "c" not in out  # no interval to estimate from
        assert out["d"]["n_changed"] == 0
        assert out["d"]["lambda_nano"] == 0  # ln(1) - ln(1)


class TestBloomParameterPlan:
    def test_curve_against_theory(self, spark):
        from db_factfinder_spark.operators.bloom import bloom_parameter_plan

        rows = bloom_parameter_plan(spark).collect()
        assert len(rows) == 32
        best = {
            r["bits_per_key"]: r["k_hashes"]
            for r in rows
            if r["is_best_k"]
        }
        # optimal k = (m/n) ln2: 4->2.77, 8->5.55, 12->8.3, 16->11.1
        assert best[4] == 3
        assert best[8] in (5, 6)
        assert best[12] == 8   # capped at max_k
        assert best[16] == 8
        # more bits per key strictly lowers the best-k FPR
        best_fpr = {
            r["bits_per_key"]: r["fpr_nano"]
            for r in rows
            if r["is_best_k"]
        }
        assert best_fpr[4] > best_fpr[8] > best_fpr[12] > best_fpr[16]

    def test_dialect_guard(self):
        from db_factfinder_spark.operators.bloom import (
            bloom_parameter_plan_sql,
        )

        with pytest.raises(ValueError):
            bloom_parameter_plan_sql("postgres")


class TestPositionAttribution:
    def _run(self, spark, rows):
        import datetime

        from db_factfinder_spark.operators.funnel import (
            position_attribution,
        )

        base = datetime.datetime(2024, 1, 1)
        data = [
            (
                eid,
                base + datetime.timedelta(seconds=sec),
                uid,
                etype,
                val,
                ch,
            )
            for eid, sec, uid, etype, val, ch in rows
        ]
        df = spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, ch int",
        )
        return {
            r["channel"]: r["credited_cents"]
            for r in position_attribution(
                df, ["touch"], "conv", 10**12, F.col("ch")
            ).collect()
        }

    def test_u_shape_four_touches(self, spark):
        rows = [
            (0, 0, 1, "touch", 0.0, 0),
            (1, 1, 1, "touch", 0.0, 1),
            (2, 2, 1, "touch", 0.0, 2),
            (3, 3, 1, "touch", 0.0, 3),
            (4, 4, 1, "conv", 10.0, 9),
        ]
        out = self._run(spark, rows)
        assert out == {0: 400, 1: 100, 2: 100, 3: 400}

    def test_degenerate_paths(self, spark):
        rows = [
            (0, 0, 1, "touch", 0.0, 0),
            (1, 1, 1, "conv", 10.0, 9),     # single touch: all 1000
            (2, 0, 2, "touch", 0.0, 1),
            (3, 1, 2, "touch", 0.0, 2),
            (4, 2, 2, "conv", 10.01, 9),    # two touches: 501/500
        ]
        out = self._run(spark, rows)
        assert out[0] == 1000
        assert out[1] == 501  # first touch takes the odd cent
        assert out[2] == 500

    def test_conservation_with_truncation(self, spark):
        # 101 cents, 3 touches: first 40, last 40, middle absorbs 21
        rows = [
            (0, 0, 1, "touch", 0.0, 0),
            (1, 1, 1, "touch", 0.0, 1),
            (2, 2, 1, "touch", 0.0, 2),
            (3, 3, 1, "conv", 1.01, 9),
        ]
        out = self._run(spark, rows)
        assert out == {0: 40, 1: 21, 2: 40}
        assert sum(out.values()) == 101

    def test_direct_channel(self, spark):
        rows = [(0, 0, 1, "conv", 5.0, 9)]
        out = self._run(spark, rows)
        assert out == {-1: 500}


class TestMarkovAttribution:
    def _run(self, spark, rows, n_channels=2, **kw):
        import datetime

        from db_factfinder_spark.operators.funnel import markov_attribution

        base = datetime.datetime(2024, 1, 1)
        data = [
            (e, base + datetime.timedelta(seconds=s), u, t, c)
            for e, s, u, t, c in rows
        ]
        df = spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, ch int",
        )
        return {
            r["removed"]: r
            for r in markov_attribution(
                df, ["click"], "purchase", F.col("ch"), n_channels, **kw
            ).collect()
        }

    # chains: START->{ch0 x2, ch1, CONV}; ch0->{ch1, NULL}; ch1->CONV
    _PLANTED = [
        (0, 0, 1, "click", 0), (1, 1, 1, "click", 1),
        (2, 2, 1, "purchase", 9),
        (3, 0, 2, "click", 0),
        (4, 0, 3, "click", 1), (5, 1, 3, "purchase", 9),
        (6, 0, 4, "purchase", 9),
    ]

    def test_hand_computed_chain(self, spark):
        out = self._run(spark, self._PLANTED)
        # base P(conv) = 1/4 + 1/2*1/2 + 1/4 = 3/4; removing ch0
        # leaves 1/2; removing ch1 leaves 1/4
        assert out[-1]["p_conv_nano"] == 750_000_000
        assert out[0]["p_conv_nano"] == 500_000_000
        assert out[1]["p_conv_nano"] == 250_000_000
        assert out[0]["effect_nano"] == 250_000_000
        assert out[1]["effect_nano"] == 500_000_000
        assert out[0]["share"] == pytest.approx(1 / 3)
        assert out[1]["share"] == pytest.approx(2 / 3)
        assert out[-1]["effect_nano"] is None

    def test_no_conversions(self, spark):
        rows = [(0, 0, 1, "click", 0), (1, 1, 1, "click", 1)]
        out = self._run(spark, rows)
        assert out[-1]["p_conv_nano"] == 0
        assert out[0]["share"] is None  # sum of effects is 0

    def test_direct_only_conversions(self, spark):
        # purchases with no touches: START->CONV only, removals no-op
        rows = [(0, 0, 1, "purchase", 9), (1, 0, 2, "purchase", 9)]
        out = self._run(spark, rows)
        assert out[-1]["p_conv_nano"] == 1_000_000_000
        assert out[0]["effect_nano"] == 0

    def test_rounds_converge(self, spark):
        # a 2-cycle between channels with slow leak: more rounds move
        # the iterate strictly toward absorption, never past it
        rows = [
            (0, 0, 1, "click", 0), (1, 1, 1, "click", 1),
            (2, 2, 1, "click", 0), (3, 3, 1, "click", 1),
            (4, 4, 1, "purchase", 9),
        ]
        lo = self._run(spark, rows, rounds=5)[-1]["p_conv_nano"]
        hi = self._run(spark, rows, rounds=80)[-1]["p_conv_nano"]
        assert lo <= hi <= 1_000_000_000
        assert hi >= 999_999_000  # single-journey chain converges to 1


class TestCorpusChecksums:
    def test_order_and_partition_invariance(self, spark):
        from db_factfinder_spark.llmdata.integrity import corpus_checksums

        rows = [(i, f"text number {i}") for i in range(40)]
        a = spark.createDataFrame(rows, "doc_id long, text string")
        b = spark.createDataFrame(
            list(reversed(rows)), "doc_id long, text string"
        ).repartition(7)
        ca = {r["shard"]: r for r in corpus_checksums(a).collect()}
        cb = {r["shard"]: r for r in corpus_checksums(b).collect()}
        assert ca.keys() == cb.keys()
        for s in ca:
            assert (ca[s]["xor_hi"], ca[s]["xor_lo"], ca[s]["n_docs"]) == (
                cb[s]["xor_hi"], cb[s]["xor_lo"], cb[s]["n_docs"]
            )

    def test_detects_single_doc_change(self, spark):
        from db_factfinder_spark.llmdata.integrity import corpus_checksums

        rows = [(i, f"text number {i}") for i in range(40)]
        mutated = list(rows)
        mutated[13] = (13, "text number 13 CHANGED")
        a = {r["shard"]: r for r in corpus_checksums(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()}
        b = {r["shard"]: r for r in corpus_checksums(
            spark.createDataFrame(mutated, "doc_id long, text string")
        ).collect()}
        diff = [s for s in a if s >= 0
                and (a[s]["xor_hi"], a[s]["xor_lo"])
                != (b[s]["xor_hi"], b[s]["xor_lo"])]
        assert len(diff) == 1  # mismatch localizes to one shard
        assert (a[-1]["xor_hi"], a[-1]["xor_lo"]) != (
            b[-1]["xor_hi"], b[-1]["xor_lo"]
        )

    def test_id_swap_detected(self, spark):
        # same multiset of texts, swapped between ids: roots must differ
        from db_factfinder_spark.llmdata.integrity import corpus_checksums

        a = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "doc_id long, text string"
        )
        b = spark.createDataFrame(
            [(1, "beta"), (2, "alpha")], "doc_id long, text string"
        )
        ra = corpus_checksums(a).filter("shard = -1").collect()[0]
        rb = corpus_checksums(b).filter("shard = -1").collect()[0]
        assert (ra["xor_hi"], ra["xor_lo"]) != (rb["xor_hi"], rb["xor_lo"])


class TestTruncationPlan:
    def _plan(self, spark, turns, budget, pin_first=True):
        from db_factfinder_spark.llmdata.conversations import (
            truncation_plan,
        )

        df = spark.createDataFrame(
            [(1, turns)], "doc_id long, turns array<string>"
        )
        return truncation_plan(
            df, "turns", budget, pin_first=pin_first
        ).collect()[0]

    def test_keeps_latest_suffix_with_pin(self, spark):
        # tokens: [2, 3, 3, 2]; budget 7 with pin: 2 + suffix<=5 ->
        # suffix from turn 2 (3+2=5): kept_from=2, n_kept=3
        out = self._plan(
            spark, ["s s", "a a a", "b b b", "c c"], 7
        )
        assert out["total_tokens"] == 10
        assert out["kept_from"] == 2
        assert out["n_kept"] == 3
        assert out["kept_tokens"] == 7

    def test_everything_fits(self, spark):
        out = self._plan(spark, ["s", "a", "b"], 100)
        assert out["kept_from"] == 1  # full suffix after the pin
        assert out["n_kept"] == 3
        assert out["kept_tokens"] == 3

    def test_pinned_only_yields_null_sentinel(self, spark):
        # budget fits the pin but no suffix turn: kept_from is the
        # empty-suffix sentinel (NULL), n_kept counts the pin
        out = self._plan(spark, ["s s", "a a a a"], 3)
        assert out["kept_from"] is None
        assert out["n_kept"] == 1
        assert out["kept_tokens"] == 2

    def test_unpinned_nothing_fits_is_null(self, spark):
        out = self._plan(
            spark, ["a a a a a a"], 3, pin_first=False
        )
        assert out["kept_from"] is None  # not an out-of-range index
        assert out["n_kept"] == 0
        assert out["kept_tokens"] == 0

    def test_pinned_turn_too_big(self, spark):
        out = self._plan(spark, ["s s s s s", "a"], 3)
        assert out["kept_from"] is None
        assert out["n_kept"] == 0
        assert out["kept_tokens"] == 0

    def test_no_pin(self, spark):
        # budget 4, no pin: suffix [b b, c c] fits (4)
        out = self._plan(
            spark, ["a a a", "b b", "c c"], 4, pin_first=False
        )
        assert out["kept_from"] == 1
        assert out["n_kept"] == 2
        assert out["kept_tokens"] == 4


class TestDedupYieldCurve:
    def test_curve_monotone_and_exact(self, spark):
        from db_factfinder_spark.llmdata.dedup import dedup_yield_curve

        # two identical docs (jaccard 1.0), one near-dup pair around
        # 0.6, one unrelated
        base = "alpha beta gamma delta epsilon zeta eta theta"
        near = "alpha beta gamma delta epsilon zeta eta iota"
        docs = spark.createDataFrame(
            [(1, base), (2, base), (3, near), (4, "x y z w v u t s")],
            "doc_id long, text string",
        )
        out = {
            r["t_num"]: (r["n_pairs_ge"], r["n_docs_ge"])
            for r in dedup_yield_curve(docs, n=3).collect()
        }
        # monotone non-increasing in the threshold
        ts = sorted(out)
        for lo, hi in zip(ts, ts[1:]):
            assert out[lo][0] >= out[hi][0]
            assert out[lo][1] >= out[hi][1]
        assert out[19] == (1, 2)   # only the identical pair at 0.95
        assert out[10][0] >= 2     # identical + near pair at 0.5

    def test_exact_boundary_cross_multiplication(self, spark):
        from db_factfinder_spark.llmdata.dedup import dedup_yield_curve

        # 12-token A -> 10 shingles, 13-token B -> 11 shingles, one
        # shared ("a b c"): jaccard = 1/20 EXACTLY = threshold 1/20 —
        # the integer test fires on equality, a double compare could
        # go either way
        a = "a b c " + " ".join(f"p{i}" for i in range(9))
        b = "a b c " + " ".join(f"q{i}" for i in range(10))
        docs = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        out = {
            r["t_num"]: r["n_pairs_ge"]
            for r in dedup_yield_curve(
                docs, n=3, thresholds_x20=(1, 2)
            ).collect()
        }
        assert out[1] == 1  # fires exactly at the boundary
        assert out[2] == 0


class TestIvfPqTopk:
    def _fixture(self, spark):
        import __spark_entry__ as entry_mod

        embs = entry_mod._embs(spark, "/root/testdata/sf0.001")
        cents = entry_mod._ivf_centroids(embs)
        cb = entry_mod._pq_codebooks(embs)
        return embs, cents, cb

    def test_equals_adc_restricted_to_probed_lists(self, spark):
        # IVF-PQ == full PQ-ADC filtered to (probe, neighbor) pairs
        # sharing a probed list, re-ranked — the composition adds
        # pruning, never different scores
        from db_factfinder_spark.llmdata.similarity import (
            _centroid_argmax,
            _collect_codebook,
            ivf_pq_topk,
            pq_adc_topk,
            pq_encode,
        )
        from pyspark.sql import Window

        embs, cents, cb = self._fixture(spark)
        probes = embs.filter(F.col("vec_id") < 4)
        got = {
            (r["probe_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"])
            for r in ivf_pq_topk(
                probes, embs, cents, cb, m=8, nprobe=2, k=3
            ).collect()
        }
        # reference: full ADC + explicit list filter
        rows = _collect_codebook(cb)
        codes = pq_encode(embs, rows, m=8)
        full = pq_adc_topk(probes, codes, cb, m=8, k=10**6)
        assign = embs.select(
            F.col("vec_id").alias("neighbor_id"),
            _centroid_argmax(cents)(F.col("embedding")).alias("cl"),
        )
        pl = (
            probes.select(F.col("vec_id").alias("probe_id"), "embedding")
            .crossJoin(cents)
            .withColumn(
                "cos",
                F.expr(
                    "aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)), centroid, (a, b) -> a * b), 0D, (a, x) -> a + x)"
                ),
            )
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.desc("cos"), F.asc("cluster_id")
        )
        # note: cosine vs dot product order differs only by norms, so
        # use the operator's own probe-list assignment instead
        from db_factfinder_spark.llmdata.similarity import (
            cosine_similarity,
        )

        pl = (
            probes.select(F.col("vec_id").alias("probe_id"), "embedding")
            .crossJoin(cents)
            .withColumn(
                "cos", cosine_similarity(F.col("embedding"), F.col("centroid"))
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select("probe_id", F.col("cluster_id").alias("cl"))
        )
        ref = (
            full.join(assign, "neighbor_id")
            .join(pl, ["probe_id", "cl"])
            .select("probe_id", "neighbor_id", "adc_dist")
        )
        wr = Window.partitionBy("probe_id").orderBy(
            F.asc("adc_dist"), F.asc("neighbor_id")
        )
        want = {
            (r["probe_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"])
            for r in ref.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= 3)
            .collect()
        }
        assert got == want

    def test_candidates_only_from_probed_lists(self, spark):
        from db_factfinder_spark.llmdata.similarity import (
            _centroid_argmax,
            ivf_pq_topk,
        )

        embs, cents, cb = self._fixture(spark)
        probes = embs.filter(F.col("vec_id") < 4)
        out = ivf_pq_topk(probes, embs, cents, cb, m=8, nprobe=1, k=50)
        assign = embs.select(
            F.col("vec_id").alias("neighbor_id"),
            _centroid_argmax(cents)(F.col("embedding")).alias("cl"),
        )
        joined = out.join(assign, "neighbor_id")
        # with nprobe=1 every probe's candidates share ONE list
        n_lists = (
            joined.groupBy("probe_id")
            .agg(F.count_distinct("cl").alias("nl"))
            .agg(F.max("nl"))
            .collect()[0][0]
        )
        assert n_lists == 1

    def test_equi_join_not_nlj(self, spark):
        from db_factfinder_spark.llmdata.similarity import ivf_pq_topk

        embs, cents, cb = self._fixture(spark)
        probes = embs.filter(F.col("vec_id") < 4)
        plan = (
            ivf_pq_topk(probes, embs, cents, cb, m=8, nprobe=2, k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the CANDIDATE join must be a hash join keyed on cluster_id —
        # never the full-corpus nested loop q240 pays; the one
        # permitted BNLJ is the bounded probes x centroids assignment
        # spine
        joins = [
            ln.strip() for ln in plan.splitlines() if "Join" in ln
        ]
        cand = [
            ln for ln in joins
            if "BroadcastHashJoin [cluster_id" in ln
        ]
        assert cand, f"no hash candidate join in: {joins}"
        assert (
            sum("BroadcastNestedLoopJoin" in ln for ln in joins) <= 1
        )
