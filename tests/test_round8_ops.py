"""Round-8 additions: packaged real data files (crosswalk weights,
community-profiles mapping), the by-header-name ratio reader fix, and
the PIL-gated real-image-codec path."""

import csv
import json
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent.parent))

from db_factfinder_spark.sources.readers import (
    packaged_profile_mapping_path,
    packaged_ratio_path,
    read_ratio,
)

try:
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


# ---------------------------------------------------------------------------
# packaged crosswalk weights (VERDICT r7 ask #2)
# ---------------------------------------------------------------------------

def test_packaged_ratio_row_count_and_shape():
    with open(packaged_ratio_path()) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2416
    assert set(rows[0]) == {"boroct2010", "boroct2020", "ratio"}
    assert len({r["boroct2010"] for r in rows}) == 2167
    assert len({r["boroct2020"] for r in rows}) == 2327
    # every code is an 8-char boro+tract string (leading zeros intact)
    assert all(len(r["boroct2010"]) == 8 for r in rows)
    ratios = [float(r["ratio"]) for r in rows]
    assert sum(1 for x in ratios if x == 1.0) == 2051
    assert min(ratios) >= 0.0 and max(ratios) <= 1.0


def test_read_ratio_matches_by_header_name(spark, tmp_path):
    """The real file orders columns (boroct2020, boroct2010, ratio); a
    positional schema would silently swap the crosswalk direction."""
    df = read_ratio(spark)  # packaged default
    first = df.orderBy("boroct2010", "boroct2020").first()
    # file row "05000100","05000100" is symmetric — use an asymmetric
    # split row to prove the direction: find one where 2010 != 2020
    asym = (
        df.filter(F.col("boroct2010") != F.col("boroct2020"))
        .orderBy("boroct2010", "boroct2020")
        .first()
    )
    with open(packaged_ratio_path()) as f:
        rows = [r for r in csv.DictReader(f)
                if r["boroct2010"] != r["boroct2020"]]
    expect = min((r["boroct2010"], r["boroct2020"]) for r in rows)
    assert (asym["boroct2010"], asym["boroct2020"]) == expect
    assert first["ratio"] == "1.000000000000000000"


def test_prepare_ratio_on_packaged_weights(spark):
    from db_factfinder_spark.operators.vertical import prepare_ratio

    r = prepare_ratio(read_ratio(spark))
    rows = r.collect()
    assert len(rows) == 2416
    assert all(x["geoid_ct2010"].startswith("360") for x in rows[:50])
    assert all(len(x["geoid_ct2010"]) == 11 for x in rows[:50])
    # apportionment shares for a split 2010 tract stay in [0, 1]
    assert all(0.0 <= x["ratio"] <= 1.0 for x in rows)


# ---------------------------------------------------------------------------
# packaged community-profiles mapping (VERDICT r7 ask #3)
# ---------------------------------------------------------------------------

def test_packaged_profile_mapping_shape():
    with open(packaged_profile_mapping_path()) as f:
        mappings = json.load(f)
    assert len(mappings) == 75
    geos = {m["geotype"] for m in mappings}
    assert geos == {"CDTA", "borough", "city", "cdta_fp_100",
                    "cdta_fp_500"}
    out_cols = [oc for m in mappings for oc in m["column_mapping"].values()]
    assert len(out_cols) == 105
    assert len(set(out_cols)) == 105  # duplicate-column guard holds
    letters = {lt for m in mappings for lt in m["column_mapping"]}
    assert letters <= {"c", "e", "m", "p", "z"}


def test_real_mapping_through_community_profiles(spark):
    """The real 75-mapping file drives the one-shuffle assembly: 105
    output columns, CDTA and flood-zone values landing on the same
    geoid rows (the reference's outer-merge shape)."""
    from db_factfinder_spark.pipelines import community_profiles

    with open(packaged_profile_mapping_path()) as f:
        mappings = json.load(f)
    vi = {v: i for i, v in enumerate(
        sorted({m["pff_variable"] for m in mappings})
    )}

    def calc(var, geo):
        keys = {"CDTA": range(15), "borough": range(5), "city": range(1),
                "cdta_fp_100": range(0, 15, 3),
                "cdta_fp_500": range(0, 15, 2)}[geo]
        pref = {"CDTA": "CD", "borough": "B", "city": "Z",
                "cdta_fp_100": "CD", "cdta_fp_500": "CD"}[geo]
        i = vi[var]
        rows = [
            (f"{pref}{k:02d}", *(float(k * (i + 1) + l) for l in range(5)))
            for k in keys
        ]
        return spark.createDataFrame(
            rows,
            "census_geoid string, c double, e double, m double,"
            " p double, z double",
        )

    out = community_profiles(calc, mappings)
    assert len(out.columns) == 106  # census_geoid + 105 mapped columns
    rows = {r["census_geoid"]: r for r in out.collect()}
    # CDTA geoids carry BOTH plain-CDTA and flood-zone columns
    assert "CD00" in rows and "B00" in rows and "Z00" in rows
    fp_cols = [
        oc
        for m in mappings
        if m["geotype"] == "cdta_fp_100"
        for oc in m["column_mapping"].values()
    ]
    assert any(rows["CD00"][c] is not None for c in fp_cols)
    assert all(rows["CD01"][c] is None for c in fp_cols)  # 1 % 3 != 0


# ---------------------------------------------------------------------------
# capped headliner twins (VERDICT r7 ask #4): the caps must BIND under
# a planted flood/hub, keeping candidate counts bounded
# ---------------------------------------------------------------------------

def test_winnow_max_df_bounds_planted_flood(spark):
    """20 documents sharing one long boilerplate passage: uncapped the
    postings join emits all C(20,2)=190 boilerplate pairs; with
    max_df=4 every flood fingerprint drops and ONLY the planted
    2-document unique overlap survives."""
    from db_factfinder_spark.llmdata.winnow import winnow_pairs

    boiler = "this license text is identical boilerplate " * 4
    uniq = "a genuinely shared unique passage of real content here"
    rows = [(i, boiler + f" tail{i}") for i in range(20)]
    rows += [(100, uniq + " alpha ending one"), (101, uniq + " beta end")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = winnow_pairs(docs, k=20, w=8, min_shared=2, max_df=None).count()
    capped = winnow_pairs(docs, k=20, w=8, min_shared=2, max_df=4)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert uncapped >= 190
    assert got == {(100, 101)}


def test_adamic_max_degree_bounds_planted_hub(spark):
    """A degree-50 hub middle: uncapped the wedge join emits
    C(50,2)=1225 hub pairs; max_degree=25 drops the hub, leaving only
    the planted degree-2 middle's single wedge (whose score is exact,
    not truncated — the cap is a subset contract on middles)."""
    from db_factfinder_spark.llmdata.components import adamic_adar

    hub = [(i, 9999) for i in range(1000, 1050)]  # hub node 9999
    small = [(2001, 8888), (2002, 8888)]          # degree-2 middle
    edges = spark.createDataFrame(hub + small, "src long, dst long")

    uncapped = adamic_adar(edges, "src", "dst", max_degree=None).count()
    capped = adamic_adar(edges, "src", "dst", max_degree=25).collect()
    assert uncapped == 1225 + 1
    assert len(capped) == 1
    r = capped[0]
    assert (r["id_a"], r["id_b"], r["n_common"]) == (2001, 2002, 1)
    import math

    assert r["aa_units"] == math.floor(1e9 / math.log(2.0) + 0.5)


# ---------------------------------------------------------------------------
# real image codec gate (VERDICT r7 ask #7)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(HAS_PIL, reason="PIL present: gate does not raise")
def test_png_codec_without_pil_raises_documented_gate(spark):
    from db_factfinder_spark.llmdata.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytes(8), 4, 2)],
        "media_id long, payload binary, width int, height int",
    )
    out = resize_images(df, 2, 2, codec="png")
    with pytest.raises(Exception, match="NotImplementedError|needs PIL"):
        out.collect()


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed here")
def test_png_codec_with_pil_pins_resized_pixels(spark):
    """When a decoder exists, the png codec rides the SAME mapInPandas
    plan and the output pixels are pinned (nearest-neighbor grayscale,
    same _resize_nn as the raw codec) — re-encoded bytes would couple
    the test to an encoder build, pixels don't."""
    import io

    import numpy as np
    from PIL import Image

    from db_factfinder_spark.llmdata.multimodal import (
        _resize_nn,
        resize_images,
    )

    arr = np.arange(8, dtype=np.uint8).reshape(2, 4) * 30
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue(), 4, 2), (2, None, 4, 2)],
        "media_id long, payload binary, width int, height int",
    )
    rows = {
        r["media_id"]: r
        for r in resize_images(df, 2, 2, codec="png").collect()
    }
    assert bytes(rows[1]["payload"]) == _resize_nn(arr, 2, 2).tobytes()
    assert rows[2]["payload"] is None


# ---------------------------------------------------------------------------
# round-8 retrieval/curation operators
# ---------------------------------------------------------------------------

def test_maxsim_topk_hand_computed(spark):
    """Orthogonal unit token vectors make MaxSim exactly countable:
    score = number of query tokens with a matching doc token."""
    from db_factfinder_spark.llmdata.similarity import maxsim_topk

    ex = [1.0, 0.0, 0.0]
    ey = [0.0, 1.0, 0.0]
    ez = [0.0, 0.0, 1.0]
    qt = spark.createDataFrame(
        [(0, 0, ex), (0, 1, ey)],
        "query_id int, tok_pos int, vec array<double>",
    )
    dt = spark.createDataFrame(
        [
            (10, 0, ex), (10, 1, ey),   # matches both  → 2.0
            (11, 0, ex), (11, 1, ez),   # matches x only → 1.0
            (12, 0, ez), (12, 1, ez),   # matches none  → 0.0
        ],
        "doc_id int, tok_pos int, vec array<double>",
    )
    out = {
        r["doc_id"]: r
        for r in maxsim_topk(qt, dt, k=3).collect()
    }
    assert out[10]["score"] == 2.0 and out[10]["rank"] == 1
    assert out[11]["score"] == 1.0 and out[11]["rank"] == 2
    assert out[12]["score"] == 0.0 and out[12]["rank"] == 3


def test_maxsim_zero_norm_token_contributes_zero(spark):
    from db_factfinder_spark.llmdata.similarity import maxsim_topk

    qt = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (0, 1, [0.0, 0.0])],  # 2nd token zero-norm
        "query_id int, tok_pos int, vec array<double>",
    )
    dt = spark.createDataFrame(
        [(5, 0, [1.0, 0.0])],
        "doc_id int, tok_pos int, vec array<double>",
    )
    [r] = maxsim_topk(qt, dt, k=1).collect()
    assert r["score"] == 1.0  # zero-norm token adds 0, not NULL


def test_maxsim_plan_corpus_never_shuffles_before_score(spark):
    """The corpus token frame must reach the scoring join without an
    Exchange: query tokens broadcast (BroadcastNestedLoopJoin), the
    only shuffles are the two aggregate grains."""
    from db_factfinder_spark.llmdata.similarity import maxsim_topk

    qt = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])],
        "query_id int, tok_pos int, vec array<double>",
    )
    dt = spark.createDataFrame(
        [(i, 0, [float(i), 1.0]) for i in range(20)],
        "doc_id int, tok_pos int, vec array<double>",
    )
    plan = maxsim_topk(qt, dt, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rrf_fuse_formula_and_missing_source(spark):
    from db_factfinder_spark.llmdata.similarity import rrf_fuse

    rankings = spark.createDataFrame(
        [
            (0, 100, 1, "a"), (0, 101, 2, "a"),
            (0, 101, 1, "b"), (0, 102, 2, "b"),
        ],
        "query_id int, doc_id int, rank int, source string",
    )
    rows = {r["doc_id"]: r for r in rrf_fuse(rankings, ["a", "b"], k=10).collect()}
    assert rows[101]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert rows[100]["rrf_score"] == 1.0 / 61          # missing in b → 0
    assert rows[102]["rrf_score"] == 1.0 / 62
    assert rows[101]["rank"] == 1
    # tie-break: 100 (1/61) > 102 (1/62)
    assert rows[100]["rank"] == 2 and rows[102]["rank"] == 3


def test_rrf_fuse_plan_has_no_join(spark):
    """Fusion is one pivot aggregate + a window — no join stage."""
    from db_factfinder_spark.llmdata.similarity import rrf_fuse

    rankings = spark.createDataFrame(
        [(0, 1, 1, "a")], "query_id int, doc_id int, rank int, source string"
    )
    plan = (
        rrf_fuse(rankings, ["a", "b"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan


def test_hashed_linear_score_exact_sums_and_oov(spark):
    from db_factfinder_spark.llmdata.textstats import hashed_linear_score

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma"), (3, " ")],
        "doc_id int, text string",
    )
    # weights for alpha/beta's buckets only — gamma is OOV
    dim = 1 << 20
    buckets = spark.sql(
        f"SELECT tok, pmod(cast(conv(substring(md5(tok), 1, 15), 16, 10)"
        f" AS long), {dim}) AS bucket"
        " FROM VALUES ('alpha'), ('beta') AS t(tok)"
    ).collect()
    bk = {r["tok"]: r["bucket"] for r in buckets}
    weights = spark.createDataFrame(
        [(bk["alpha"], 10), (bk["beta"], -4)], "bucket long, w long"
    )
    rows = {
        r["doc_id"]: r
        for r in hashed_linear_score(docs, weights, dim=dim).collect()
    }
    assert rows[1]["n_toks"] == 3 and rows[1]["feat_sum"] == 16
    assert rows[1]["logit"] == 16.0 / 3.0
    assert rows[2]["n_toks"] == 1 and rows[2]["feat_sum"] == 0  # OOV
    assert rows[3]["n_toks"] == 0 and rows[3]["logit"] is None


def test_hashed_linear_score_plan_broadcasts_model(spark):
    from db_factfinder_spark.llmdata.textstats import hashed_linear_score

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id int, text string"
    )
    weights = spark.createDataFrame([(1, 1)], "bucket long, w long")
    plan = (
        hashed_linear_score(docs, weights)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_novelty_first_dup_and_empty(spark):
    from db_factfinder_spark.llmdata.textstats import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "one two three four"),       # 2 grams, both novel
            (2, "one two three five"),       # "one two three" seen
            (3, "one two three four"),       # exact dup → 0 novel
            (4, ""),                          # no grams
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert rows[1]["n_grams"] == 2 and rows[1]["novelty"] == 1.0
    assert rows[2]["n_grams"] == 2 and rows[2]["n_novel"] == 1
    assert rows[3]["n_grams"] == 2 and rows[3]["n_novel"] == 0
    assert rows[4]["n_grams"] == 0 and rows[4]["novelty"] is None


def test_crawl_schedule_politeness_and_sticky_worker(spark):
    from db_factfinder_spark.llmdata.crawl import crawl_schedule

    frontier = spark.createDataFrame(
        [
            ("a.com", 1, 50), ("a.com", 2, 90), ("a.com", 3, 90),
            ("b.org", 4, 10),
        ],
        "host string, url int, priority int",
    )
    rows = crawl_schedule(
        frontier, n_workers=4, per_host_delay_s=7
    ).collect()
    by_url = {r["url"]: r for r in rows}
    # priority desc, url asc: 2 (90), 3 (90 tie → url), 1 (50)
    assert [by_url[u]["slot"] for u in (2, 3, 1)] == [0, 1, 2]
    assert by_url[1]["fetch_offset_s"] == 14
    assert by_url[4]["slot"] == 0
    # worker sticky per host
    a_workers = {r["worker"] for r in rows if r["host"] == "a.com"}
    assert len(a_workers) == 1 and 0 <= a_workers.pop() < 4
    # per-host politeness: offsets within a host are distinct multiples
    a_offsets = sorted(
        r["fetch_offset_s"] for r in rows if r["host"] == "a.com"
    )
    assert a_offsets == [0, 7, 14]


def test_crawl_schedule_plan_single_host_window(spark):
    """No global window: the only sort is partitioned by host."""
    from db_factfinder_spark.llmdata.crawl import crawl_schedule

    frontier = spark.createDataFrame(
        [("h", 1, 1)], "host string, url int, priority int"
    )
    plan = (
        crawl_schedule(frontier)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan and "Join" not in plan


def test_novelty_with_state_excludes_known_grams(spark):
    from db_factfinder_spark.llmdata.textstats import (
        build_gram_state,
        ngram_novelty_with_state,
    )

    old = spark.createDataFrame(
        [(0, "one two three four")], "doc_id int, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "one two three five"),   # "one two three" known
            (2, "one two three five"),   # dup of 1 within batch
            (3, "six seven eight"),      # all new
        ],
        "doc_id int, text string",
    )
    state = build_gram_state(old, n=3)
    rows = {
        r["doc_id"]: r
        for r in ngram_novelty_with_state(batch, state, n=3).collect()
    }
    assert rows[1]["n_grams"] == 2 and rows[1]["n_novel"] == 1
    assert rows[2]["n_novel"] == 0        # both grams taken (state/doc1)
    assert rows[3]["novelty"] == 1.0


def test_hard_negative_mining_excludes_same_label(spark):
    from db_factfinder_spark.llmdata.similarity import hard_negative_topk

    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [1.0, 0.01], 7),   # nearest but SAME label — excluded
            (2, [1.0, 0.2], 3),    # nearest different-label
            (3, [0.0, 1.0], 3),
        ],
        "vec_id int, embedding array<double>, label int",
    )
    out = hard_negative_topk(
        embs.filter("vec_id = 0"), embs, k=2
    ).collect()
    assert [r["neighbor_id"] for r in out] == [2, 3]
    assert all(r["neighbor_label"] != 7 for r in out)
