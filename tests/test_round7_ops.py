"""Round-7 extension operators: winnowing, stitching, Adamic-Adar,
curriculum interleave, boilerplate density, char entropy, Zipf slope."""

import math

import pytest
from pyspark.sql import functions as F

from db_factfinder_spark.llmdata.components import adamic_adar
from db_factfinder_spark.llmdata.lines import boilerplate_density
from db_factfinder_spark.llmdata.sampling import curriculum_interleave
from db_factfinder_spark.llmdata.textstats import char_entropy, zipf_slope
from db_factfinder_spark.llmdata.winnow import (
    stitch_candidates,
    winnow_fingerprint_sets,
    winnow_pairs,
)


# ------------------------------------------------------------ winnowing
def test_winnow_guarantee_shared_passage(spark):
    """SIGMOD'03 Thm 1: a shared substring of >= k + w - 1 normalized
    chars always yields >= 1 shared fingerprint."""
    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, f"alpha bravo {shared} charlie delta"),
            (2, f"totally different prefix {shared} and suffix"),
            (3, "nothing in common with the others at all xyzzy"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_pairs(df, k=5, w=4, min_shared=1, max_df=None).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_density(spark):
    """Fingerprint count is ~2/(w+1) of the gram count, never more
    than the window count."""
    text = " ".join(f"tok{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = winnow_fingerprint_sets(df, k=5, w=4).collect()[0]
    n_grams = len(" ".join(f"tok{i}" for i in range(100))) - 5 + 1
    assert 1 <= len(row["fps"]) <= n_grams - 4 + 1


def test_winnow_short_text_single_window(spark):
    df = spark.createDataFrame(
        [(1, "abcdefg"), (2, "abc")], "doc_id long, text string"
    )
    rows = {r["id"]: r["fps"] for r in
            winnow_fingerprint_sets(df, k=5, w=4).collect()}
    assert len(rows[1]) == 1          # 3 grams < w -> one window min
    assert 2 not in rows              # shorter than k -> no fingerprints


def test_winnow_max_df_subset(spark):
    rows = [(i, f"common shared passage here unique{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r["id_a"], r["id_b"])
             for r in winnow_pairs(df, min_shared=1, max_df=None).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in winnow_pairs(df, min_shared=1, max_df=5).collect()}
    assert capped <= exact


# ------------------------------------------------------------ stitching
def test_stitch_detects_split_docs(spark):
    # fragment B resumes exactly 30 normalized chars before A ends
    s = "boundary run xyz shared middle"          # 30 chars, clean
    assert len(s) == 30
    a = "first fragment body text here " + s
    b = s + " second fragment continues on"
    df = spark.createDataFrame(
        [(10, a), (11, b), (12, "unrelated content entirely")],
        "doc_id long, text string",
    )
    got = stitch_candidates(df, k=30).collect()
    assert {(r["id_prev"], r["id_next"]) for r in got} == {(10, 11)}
    assert got[0]["boundary"] == s


def test_stitch_no_self_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a" * 100), (2, "a" * 100)], "doc_id long, text string"
    )
    got = {(r["id_prev"], r["id_next"])
           for r in stitch_candidates(df, k=30).collect()}
    # identical texts stitch in both directions but never to self
    assert got == {(1, 2), (2, 1)}


# ------------------------------------------------------------ adamic-adar
def test_adamic_adar_hand_example(spark):
    # u(1) and w(2) share middles 10 (deg 2) and 11 (deg 3)
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 11), (2, 11), (3, 11)],
        "src long, dst long",
    )
    rows = {(r["id_a"], r["id_b"]): r for r in
            adamic_adar(edges, max_degree=None).collect()}
    r12 = rows[(1, 2)]
    assert r12["n_common"] == 2
    want = int(math.floor(1e9 / math.log(2) + 0.5)) + int(
        math.floor(1e9 / math.log(3) + 0.5)
    )
    assert r12["aa_units"] == want


def test_adamic_adar_max_degree_drops_hub_middles(spark):
    edges = [(u, 99) for u in range(10)] + [(1, 50), (2, 50)]
    df = spark.createDataFrame(edges, "src long, dst long")
    full = adamic_adar(df, max_degree=None).collect()
    capped = adamic_adar(df, max_degree=5).collect()
    full_pairs = {(r["id_a"], r["id_b"]) for r in full}
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert capped_pairs <= full_pairs
    # pairs only reachable through the hub vanish; (1,2) survives via 50
    assert (1, 2) in capped_pairs
    assert (3, 4) in full_pairs and (3, 4) not in capped_pairs


# ------------------------------------------------- curriculum interleave
def test_curriculum_interleave_round_robin(spark):
    rows = [(b, i, float(100 - i)) for b in range(3) for i in range(10)]
    df = spark.createDataFrame(rows, "bucket int, id long, score double")
    out = curriculum_interleave(
        df, "bucket", F.desc("score"), "id", per_bucket=4
    ).orderBy("interleave_pos").collect()
    assert len(out) == 12
    # first n_buckets positions are each bucket's best item
    assert [r["bucket"] for r in out[:3]] == [0, 1, 2]
    assert all(r["within_rank"] == 1 for r in out[:3])
    # positions are a dense permutation
    assert sorted(r["interleave_pos"] for r in out) == list(range(12))


def test_curriculum_interleave_dense_over_gappy_buckets(spark):
    rows = [(7, 1, 1.0), (42, 2, 1.0)]
    df = spark.createDataFrame(rows, "bucket int, id long, score double")
    out = {r["bucket"]: r for r in curriculum_interleave(
        df, "bucket", F.desc("score"), "id"
    ).collect()}
    assert out[7]["bucket_rank"] == 1 and out[42]["bucket_rank"] == 2
    assert out[7]["interleave_pos"] == 0 and out[42]["interleave_pos"] == 1


# ------------------------------------------------- boilerplate density
def test_boilerplate_density(spark):
    docs = [
        (i, f"unique line {i}\nshared footer\nanother unique {i}")
        for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           boilerplate_density(df, min_df=5).collect()}
    for i in range(6):
        assert out[i]["n_lines"] == 3
        assert out[i]["n_boiler"] == 1
        assert abs(out[i]["boiler_frac"] - 1 / 3) < 1e-12


def test_boilerplate_within_doc_repeat_not_boiler(spark):
    """A line repeated inside ONE doc is repetition, not boilerplate —
    df counts distinct docs."""
    df = spark.createDataFrame(
        [(1, "same\nsame\nsame"), (2, "other\nlines\nhere")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           boilerplate_density(df, min_df=2).collect()}
    assert out[1]["n_boiler"] == 0


# ------------------------------------------------------- char entropy
def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, "....")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["e"] for r in df.select(
        "doc_id", char_entropy("text").alias("e")
    ).collect()}
    assert out[1] == 0.0                         # single symbol
    assert abs(out[2] - math.log(2)) < 1e-12     # two equal symbols
    assert abs(out[3] - math.log(4)) < 1e-12     # four equal symbols
    assert out[4] is None                        # normalizes to empty


def test_char_entropy_quantized_matches_python(spark):
    text = "the quick brown fox 123"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = df.select(
        char_entropy("text", quantize=10**9).alias("u")
    ).collect()[0]["u"]
    import collections
    norm = text.lower()
    cnt = collections.Counter(norm)
    n = len(norm)
    want = sum(
        int(math.floor((-(c / n) * math.log(c / n)) * 1e9 + 0.5))
        for _, c in sorted(cnt.items())
    )
    assert got == want


# --------------------------------------------------------- zipf slope
def test_zipf_slope_on_zipfian_text(spark):
    # frequencies ~ 1/rank -> slope ~ -1
    words = []
    for rank in range(1, 51):
        words += [f"w{rank:03d}"] * (1000 // rank)
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    row = zipf_slope(df, top_ranks=50).collect()[0]
    assert row["n"] == 50
    assert -1.1 < row["slope_u"] < -0.9


def test_zipf_slope_grouped(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c", "s1"), (2, "x x y", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in
            zipf_slope(df, by="source", top_ranks=10).collect()}
    assert set(rows) == {"s1", "s2"}
    assert rows["s1"]["n"] == 3 and rows["s2"]["n"] == 2
    assert rows["s1"]["slope_u"] < 0


# ------------------------------------------------------- portable_ln
def test_portable_ln_bit_identical_to_duckdb(spark):
    """The whole point of portable_ln: identical BITS in both engines
    (libm ln diverges by 1 ulp on ~5% of inputs; this must not)."""
    import struct

    import duckdb

    from db_factfinder_spark.functions.portable_math import (
        portable_ln,
        portable_ln_sql,
    )

    vals = list(range(1, 2000)) + [10**6, 10**9, 10**12, 2**40, 2**40 + 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    srows = {
        r["v"]: r["pl"]
        for r in df.select("v", portable_ln(F.col("v")).alias("pl")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    orows = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT v, {portable_ln_sql('v')} FROM t"
        ).fetchall()
    }
    for v in vals:
        assert struct.pack("d", srows[v]) == struct.pack("d", orows[v]), v


def test_portable_ln_accuracy():
    """Within 1e-10 relative of the true ln (determinism is the
    contract; accuracy must still be far below the 1e-6 grid)."""
    import duckdb

    from db_factfinder_spark.functions.portable_math import portable_ln_sql

    con = duckdb.connect()
    for v in [2, 3, 7, 97, 12345, 10**8, 2**50 - 1]:
        got = con.execute(f"SELECT {portable_ln_sql(str(v))}").fetchone()[0]
        assert abs(got - math.log(v)) <= 1e-10 * max(1.0, math.log(v)), v


# ---------------------------------------------------- kneser-ney bigram
def test_kneser_ney_probabilities_sum_to_one_per_context(spark):
    """For a context w1 where every following type was observed,
    sum over OBSERVED w2 of P_KN(w2|w1) equals
    1 - D·N1+(w1,·)/c(w1)·(1 - Σ_observed P_cont) ≈ 1 when the
    observed w2 set covers all continuations; check the exact
    identity instead: Σ max(c-D,0)/c_prev = 1 - D·n1_fw/c_prev."""
    from db_factfinder_spark.llmdata.textstats import kneser_ney_bigram

    df = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "b a b c a b")],
        "doc_id long, text string",
    )
    rows = kneser_ney_bigram(df).collect()
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r["w1"], []).append(r)
    for w1, rs in by_ctx.items():
        c_prev = rs[0]["c_prev"]
        n1_fw = rs[0]["n1_fw"]
        discounted = sum(max(r["c_bigram"] - 0.75, 0.0) for r in rs)
        assert abs(discounted / c_prev - (1 - 0.75 * n1_fw / c_prev)) < 1e-12
    # continuation prob reflects context diversity, not raw frequency
    r_map = {(r["w1"], r["w2"]): r for r in rows}
    assert r_map[("a", "b")]["n1_bw"] >= 1


def test_kneser_ney_continuation_beats_frequency(spark):
    """'of the' pathology: a token frequent in ONE context only gets a
    LOW continuation count even if its raw frequency is high."""
    from db_factfinder_spark.llmdata.textstats import kneser_ney_bigram

    # 'thing' follows only 'the' (freq 4); 'x' follows a, b, c, d
    df = spark.createDataFrame(
        [(1, "the thing the thing the thing the thing"),
         (2, "a x b x c x d x")],
        "doc_id long, text string",
    )
    rows = {(r["w1"], r["w2"]): r for r in kneser_ney_bigram(df).collect()}
    assert rows[("the", "thing")]["n1_bw"] == 1      # one context
    assert rows[("a", "x")]["n1_bw"] == 4            # four contexts


# --------------------------------------------------------- heaps law
def test_heaps_law_growing_vocab(spark):
    """Synthetic corpus where each doc introduces new types: beta
    should be near 1 (vocab grows linearly with tokens)."""
    from db_factfinder_spark.llmdata.textstats import heaps_law_fit

    # tokens must survive normalization (underscores are stripped)
    docs = [(i, " ".join(f"t{i}x{j}" for j in range(10)))
            for i in range(64)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = heaps_law_fit(df, [7, 15, 31, 63]).collect()[0]
    assert row["n_points"] == 4
    assert 0.98 < row["slope_u"] < 1.02


def test_heaps_law_saturated_vocab(spark):
    """All docs share one tiny vocabulary: beta ~ 0."""
    from db_factfinder_spark.llmdata.textstats import heaps_law_fit

    docs = [(i, "alpha beta gamma") for i in range(64)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = heaps_law_fit(df, [7, 15, 31, 63]).collect()[0]
    assert abs(row["slope_u"]) < 1e-9


# ------------------------------------------------------------- rouge
def test_rouge_identical_and_disjoint(spark):
    from db_factfinder_spark.llmdata.textstats import rouge_n_pairs

    pairs = spark.createDataFrame(
        [(1, "the cat sat on the mat", "the cat sat on the mat"),
         (2, "alpha beta gamma", "delta epsilon zeta"),
         (3, "a b c d", "b c d e")],
        "pair_id long, cand string, ref string",
    )
    out = {r["pair_id"]: r for r in rouge_n_pairs(pairs, n=2).collect()}
    assert out[1]["precision"] == 1.0 and out[1]["recall"] == 1.0
    assert out[1]["f1"] == 1.0
    assert out[2]["n_match"] == 0 and out[2]["f1"] == 0.0
    # bigrams of cand: ab bc cd; ref: bc cd de -> 2 matches
    assert out[3]["n_match"] == 2
    assert abs(out[3]["precision"] - 2 / 3) < 1e-12


def test_rouge_clipping_is_multiset(spark):
    """Repeated gram in cand counts only up to its ref multiplicity."""
    from db_factfinder_spark.llmdata.textstats import rouge_n_pairs

    pairs = spark.createDataFrame(
        [(1, "x y x y x y", "x y z")],
        "pair_id long, cand string, ref string",
    )
    r = rouge_n_pairs(pairs, n=2).collect()[0]
    # cand bigrams: xy yx xy yx xy (3 xy, 2 yx); ref: xy yz (1 xy)
    assert r["n_match"] == 1


# ------------------------------------------------------------ woe
def test_woe_sign_and_iv(spark):
    from db_factfinder_spark.operators.encoding import woe_encode

    rows = [("good", 1)] * 8 + [("good", 0)] * 2 \
        + [("bad", 1)] * 2 + [("bad", 0)] * 8
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {r["cat"]: r for r in woe_encode(df, "cat", "y").collect()}
    assert out["good"]["woe"] > 0 > out["bad"]["woe"]
    # IV contributions are positive for informative buckets
    assert out["good"]["iv_contrib"] > 0 and out["bad"]["iv_contrib"] > 0
    # smoothing keeps empty cells finite
    df2 = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 0)], "cat string, y int"
    )
    vals = woe_encode(df2, "cat", "y").collect()
    assert all(r["woe"] is not None for r in vals)


# ------------------------------------------------------------- ks
def test_ks_identical_and_shifted(spark):
    from db_factfinder_spark.operators.regression import ks_statistic

    same = [("g", s, float(v)) for v in range(50) for s in (0, 1)]
    shifted = [("h", 0, float(v)) for v in range(50)] + [
        ("h", 1, float(v + 25)) for v in range(50)
    ]
    df = spark.createDataFrame(same + shifted, "g string, s int, v double")
    out = {r["g"]: r for r in
           ks_statistic(df, ["g"], "s", "v").collect()}
    assert out["g"]["ks"] == 0.0
    assert abs(out["h"]["ks"] - 0.5) < 1e-12   # half the mass shifted


def test_ks_matches_scipy_style_brute(spark):
    import random

    from db_factfinder_spark.operators.regression import ks_statistic

    rng = random.Random(7)
    s0 = [rng.randint(0, 30) for _ in range(80)]
    s1 = [rng.randint(5, 40) for _ in range(60)]
    rows = [("g", 0, float(v)) for v in s0] + [("g", 1, float(v)) for v in s1]
    df = spark.createDataFrame(rows, "g string, s int, v double")
    got = ks_statistic(df, ["g"], "s", "v").collect()[0]["ks"]
    vals = sorted(set(s0 + s1))
    want = max(
        abs(sum(1 for x in s0 if x <= v) / len(s0)
            - sum(1 for x in s1 if x <= v) / len(s1))
        for v in vals
    )
    assert abs(got - want) < 1e-12


# -------------------------------------------------------- linkage
def test_fs_linkage_blocks_and_scores(spark):
    from db_factfinder_spark.operators.linkage import (
        FieldSpec,
        block_pairs,
        fs_score,
    )

    recs = spark.createDataFrame(
        [
            (1, "blk1", 10, "A"),
            (2, "blk1", 10, "A"),   # same block, full agreement with 1
            (3, "blk1", 99, "B"),   # same block, disagreement
            (4, "blk2", 10, "A"),   # different block: never paired
        ],
        "rid long, blk string, nat int, seg string",
    )
    pairs = block_pairs(recs, "rid", "blk")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}
    scored = fs_score(
        pairs,
        [
            (FieldSpec("nat", 0.9, 0.1), F.col("nat_a") == F.col("nat_b")),
            (FieldSpec("seg", 0.8, 0.2), F.col("seg_a") == F.col("seg_b")),
        ],
    ).collect()
    by = {(r["id_a"], r["id_b"]): r["fs_score"] for r in scored}
    import math as _m

    full = _m.log(0.9 / 0.1) + _m.log(0.8 / 0.2)
    none = _m.log(0.1 / 0.9) + _m.log(0.2 / 0.8)
    assert abs(by[(1, 2)] - full) < 1e-12
    assert abs(by[(1, 3)] - none) < 1e-12


def test_fs_fieldspec_validation():
    import pytest as _pytest

    from db_factfinder_spark.operators.linkage import FieldSpec

    with _pytest.raises(ValueError, match="0 < u < m < 1"):
        FieldSpec("x", 0.2, 0.9)


def test_block_pairs_max_block(spark):
    from db_factfinder_spark.operators.linkage import block_pairs

    recs = spark.createDataFrame(
        [(i, "hot") for i in range(10)] + [(100, "ok"), (101, "ok")],
        "rid long, blk string",
    )
    out = block_pairs(recs, "rid", "blk", max_block=5).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(100, 101)}


# ------------------------------------------------------------ psi
def test_psi_identical_and_shifted(spark):
    from db_factfinder_spark.operators.quality import psi_drift

    same = [(b, s) for b in range(10) for s in (0, 1) for _ in range(20)]
    df = spark.createDataFrame(same, "bucket int, snap int")
    r = psi_drift(df, "bucket", "snap").collect()[0]
    assert r["psi_units"] == 0 and r["psi"] == 0.0
    moved = [(b, 0) for b in range(5) for _ in range(40)] + [
        (b, 1) for b in range(5, 10) for _ in range(40)
    ]
    df2 = spark.createDataFrame(moved, "bucket int, snap int")
    r2 = psi_drift(df2, "bucket", "snap").collect()[0]
    assert r2["psi"] > 0.25   # fully disjoint -> severe drift


# ------------------------------------------------------------ ucb1
def test_ucb1_explore_exploit(spark):
    from db_factfinder_spark.operators.bandit import ucb1_scores

    # arm A: 100 pulls at mean 0.5; arm B: 2 pulls at mean 0.4 —
    # UCB must rank the under-explored B first despite lower mean
    rows = [("A", 50) for _ in range(50)] + [("A", 51) for _ in range(50)]
    rows += [("B", 40), ("B", 40)]
    df = spark.createDataFrame(rows, "arm string, ru long")
    out = {r["arm"]: r for r in
           ucb1_scores(df, "arm", "ru", unit_scale=100).collect()}
    assert out["A"]["mean_reward"] > out["B"]["mean_reward"]
    assert out["B"]["bonus"] > out["A"]["bonus"]
    assert out["B"]["rank"] == 1


def test_ucb1_bonus_formula(spark):
    import math as _m

    from db_factfinder_spark.operators.bandit import ucb1_scores

    df = spark.createDataFrame(
        [("A", 1)] * 10 + [("B", 1)] * 30, "arm string, ru long"
    )
    out = {r["arm"]: r for r in ucb1_scores(df, "arm", "ru").collect()}
    # portable_ln is within 1e-10 of true ln
    assert abs(out["A"]["bonus"] - _m.sqrt(2 * _m.log(40) / 10)) < 1e-9


# ------------------------------------------------------ conformal
def test_conformal_threshold_coverage(spark):
    from db_factfinder_spark.operators.evaluation import (
        conformal_threshold,
    )

    rows = [("g", float(v)) for v in range(1, 100)]   # n=99
    df = spark.createDataFrame(rows, "g string, score double")
    r = conformal_threshold(df, ["g"], "score", alpha=0.1).collect()[0]
    # k = min{c : c/100 >= 0.9} = 90 -> threshold = 90.0
    assert r["n"] == 99 and r["k"] == 90
    assert r["threshold"] == 90.0
    assert abs(r["coverage_target"] - 0.9) < 1e-15
    # empirical coverage on the calibration set itself >= target
    covered = sum(1 for v in range(1, 100) if v <= r["threshold"])
    assert covered / 100 >= 0.9 - 1e-12


def test_conformal_tiny_group_null(spark):
    from db_factfinder_spark.operators.evaluation import (
        conformal_threshold,
    )

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0)], "g string, score double"
    )
    r = conformal_threshold(df, ["g"], "score", alpha=0.1).collect()[0]
    # k = min{c : c/3 >= 0.9} = 3 > n=2 -> no threshold
    assert r["k"] == 3 and r["threshold"] is None


# --------------------------------------------------- trimmed mean
def test_trimmed_mean_drops_outliers(spark):
    from db_factfinder_spark.operators.median import trimmed_mean

    vals = list(range(1, 9)) + [1000, -1000]          # n=10, trim 1 each
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v long"
    )
    r = trimmed_mean(df, ["g"], F.col("v"), trim=0.1).collect()[0]
    assert r["n"] == 10 and r["n_trimmed_each"] == 1 and r["n_kept"] == 8
    assert r["mean_units"] == sum(range(1, 9)) / 8


def test_trimmed_mean_overtrim_empty(spark):
    from db_factfinder_spark.operators.median import trimmed_mean

    df = spark.createDataFrame([("g", 1), ("g", 2)], "g string, v long")
    out = trimmed_mean(df, ["g"], F.col("v"), trim=0.5).collect()
    # k = 1 each side on n=2 -> nothing kept -> group absent
    assert out == []


# ------------------------------------------------ max_count probe
def test_max_count_for_ratio_sweep(spark):
    from db_factfinder_spark.llmdata.dedup import max_count_for_ratio

    def brute(n, t):
        c = n
        while c >= 0 and not (c / n) <= t:
            c -= 1
        return c

    df = spark.createDataFrame([(n,) for n in range(1, 201)], "n int")
    for t in [0.07, 0.1, 0.3, 0.5, 0.9, 1.0 / 3.0]:
        got = {
            r["n"]: r["c"]
            for r in df.select(
                "n", max_count_for_ratio(F.col("n"), t).alias("c")
            ).collect()
        }
        for n in range(1, 201):
            assert got[n] == brute(n, t), (t, n, got[n])


# ------------------------------------------------- grouped psi
def test_psi_grouped(spark):
    from db_factfinder_spark.operators.quality import psi_drift

    rows = [("stable", b, s) for b in range(5) for s in (0, 1)
            for _ in range(10)]
    rows += [("moved", b, 0) for b in range(3) for _ in range(20)]
    rows += [("moved", b, 1) for b in range(3, 6) for _ in range(20)]
    df = spark.createDataFrame(rows, "g string, bucket int, snap int")
    out = {r["g"]: r for r in
           psi_drift(df, "bucket", "snap", group_cols=["g"]).collect()}
    assert out["stable"]["psi"] == 0.0
    assert out["moved"]["psi"] > 0.25


# ------------------------------------------------------- dp counts
def test_dp_noisy_counts_deterministic_and_centered(spark):
    from db_factfinder_spark.operators.privacy import dp_noisy_counts

    rows = [(f"g{i % 50}",) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string")
    a = {r["g"]: r for r in
         dp_noisy_counts(df, ["g"], epsilon=1.0, seed="s1").collect()}
    b = {r["g"]: r for r in
         dp_noisy_counts(df, ["g"], epsilon=1.0, seed="s1").collect()}
    assert a == b                                  # same seed = replay
    c = {r["g"]: r for r in
         dp_noisy_counts(df, ["g"], epsilon=1.0, seed="s2").collect()}
    assert any(a[g]["noise_units"] != c[g]["noise_units"] for g in a)
    # Laplace(1) noise: mean near 0, spread of order b=1
    noises = [r["noise_units"] / 1e6 for r in a.values()]
    assert abs(sum(noises) / len(noises)) < 1.0
    assert max(abs(x) for x in noises) < 15.0      # tail sanity
    # tighter epsilon -> larger noise scale
    d = {r["g"]: r for r in
         dp_noisy_counts(df, ["g"], epsilon=0.1, seed="s1").collect()}
    # same uniforms, b scales ~linearly (exact up to the floor grid)
    assert all(
        abs(d[g]["noise_units"] - 10 * a[g]["noise_units"]) <= 10
        for g in a
    )


def test_dp_rejects_bad_epsilon(spark):
    import pytest as _pytest

    from db_factfinder_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([("g",)], "g string")
    with _pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(df, ["g"], epsilon=0.0)


# --------------------------------------------------- fuzzy linkage
def test_levenshtein_agreement_links_typos(spark):
    from db_factfinder_spark.operators.linkage import (
        FieldSpec,
        block_pairs,
        fs_score,
    )

    recs = spark.createDataFrame(
        [
            (1, "b", "jonathan smith"),
            (2, "b", "jonathan smth"),     # 1 deletion
            (3, "b", "completely other"),
        ],
        "rid long, blk string, name string",
    )
    pairs = block_pairs(recs, "rid", "blk")
    scored = fs_score(
        pairs,
        [(FieldSpec("nm", 0.97, 0.02),
          F.levenshtein("name_a", "name_b") <= 1)],
        threshold=1.0,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in scored} == {(1, 2)}


# -------------------------------------------------- bigram perplexity
def test_bigram_perplexity_flags_shuffled_text(spark):
    from db_factfinder_spark.llmdata.textstats import bigram_perplexity

    fluent = "the cat sat on the mat and the dog sat on the rug"
    # same unigrams, scrambled order -> unseen bigrams -> higher NLL
    soup = "mat the on dog sat rug the cat the and on sat the"
    corpus = [(i, fluent) for i in range(10)] + [(100, soup)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_perplexity(df).collect()}
    assert out[100]["nats_per_bigram"] > out[0]["nats_per_bigram"]


def test_bigram_perplexity_external_model(spark):
    from db_factfinder_spark.llmdata.textstats import (
        bigram_lm,
        bigram_perplexity,
    )

    ref = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    model = bigram_lm(ref)
    probe = spark.createDataFrame(
        [(9, "a b a b"), (10, "x y z w")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           bigram_perplexity(probe, model=model).collect()}
    # in-distribution doc scores lower than fully-novel doc
    assert out[9]["nats_per_bigram"] < out[10]["nats_per_bigram"]


# ------------------------------------------------------- modularity
def test_modularity_perfect_vs_random(spark):
    from db_factfinder_spark.llmdata.components import modularity_score

    # two 4-cliques, no cross edges: near-maximal modularity (~0.5)
    edges = []
    for base in (0, 10):
        ids = [base + i for i in range(4)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    mem = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(10 + i, 1) for i in range(4)],
        "doc_id long, group_id long",
    )
    r = modularity_score(e, mem).collect()[0]
    assert abs(r["modularity"] - 0.5) < 1e-9
    # one cluster containing everything: Q = 1 - 1 = ... intra = m,
    # degree-sum = 2m -> Q = 1 - 1 = 0
    mem_all = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(10 + i, 0) for i in range(4)],
        "doc_id long, group_id long",
    )
    r2 = modularity_score(e, mem_all).collect()[0]
    assert abs(r2["modularity"]) < 1e-9


def test_modularity_unclustered_singletons(spark):
    from db_factfinder_spark.llmdata.components import modularity_score

    e = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    mem = spark.createDataFrame([(1, 7)], "doc_id long, group_id long")
    r = modularity_score(e, mem).collect()[0]
    # vertex 2 unclustered -> singleton cluster; no intra edges at all
    assert r["n_clusters"] == 2 and r["m_edges"] == 1
    assert r["modularity"] < 0


def test_stitch_max_key_df_drops_boilerplate_heads(spark):
    from db_factfinder_spark.llmdata.winnow import stitch_candidates

    banner = "this site uses cookies to improve your experience ok"
    rows = [(i, banner + f" body {i}") for i in range(20)]
    rows += [(100, "x" * 50 + " " + banner[:40])]   # tail ends like banner head? no — unrelated
    rows += [(200, "unique ending alpha beta gamma delta epsilon zeta"),
             (201, "gamma delta epsilon zeta" + " continues here with more words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r["id_prev"], r["id_next"])
            for r in stitch_candidates(df, k=20).collect()}
    capped = {(r["id_prev"], r["id_next"])
              for r in stitch_candidates(df, k=20, max_key_df=5).collect()}
    assert capped <= full


# ----------------------------------------------- sorted neighborhood
def test_sorted_neighborhood_window_semantics(spark):
    from db_factfinder_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    recs = spark.createDataFrame(
        [(i, f"name{i:03d}") for i in range(10)], "rid long, k string"
    )
    got = {(r["id_a"], r["id_b"]) for r in
           sorted_neighborhood_pairs(recs, "rid", F.col("k"), window=2)
           .collect()}
    want = {(i, j) for i in range(10) for j in range(10)
            if 1 <= j - i <= 2}
    assert got == want


def test_sorted_neighborhood_catches_typos_across_hash_blocks(spark):
    from db_factfinder_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    recs = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "jonathan smith x"),
         (3, "zzz unrelated")],
        "rid long, k string",
    )
    got = {(r["id_a"], r["id_b"]) for r in
           sorted_neighborhood_pairs(recs, "rid", F.col("k"), window=1)
           .collect()}
    assert (1, 2) in got and (1, 3) not in got


# ---------------------------------------------------- l-diversity
def test_l_diversity(spark):
    from db_factfinder_spark.operators.privacy import l_diversity_audit

    rows = [("g1", "a"), ("g1", "b"), ("g1", "c"),
            ("g2", "same"), ("g2", "same"), ("g2", "same")]
    df = spark.createDataFrame(rows, "quasi string, sens string")
    out = {r["quasi"]: r for r in
           l_diversity_audit(df, ["quasi"], "sens", 2).collect()}
    assert out["g1"]["is_diverse"] and out["g1"]["n_sensitive_values"] == 3
    assert not out["g2"]["is_diverse"]


# ------------------------------------------------ percolate negation
def test_percolate_negation(spark):
    from db_factfinder_spark.llmdata.textstats import (
        percolate_with_negation,
    )

    docs = spark.createDataFrame(
        [(1, "kubernetes cluster with helm charts"),
         (2, "kubernetes cluster plain manifests")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [("knh", ["kubernetes"], ["helm"]),
         ("k", ["kubernetes"], None)],
        "query_id string, terms array<string>, exclude_terms array<string>",
    )
    got = {(r["doc_id"], r["query_id"]) for r in
           percolate_with_negation(docs, qs).collect()}
    assert got == {(2, "knh"), (1, "k"), (2, "k")}
