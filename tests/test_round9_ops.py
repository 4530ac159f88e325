"""Round-9 operator tests: default-on safety caps, the rrf_fuse /
rrf_fuse_pair split, the q365 production deliverable sink, zone-rollup
batch support, and incremental catalog maintenance."""

import inspect

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def test_default_caps_are_on():
    """winnow_pairs / adamic_adar ship with the flood/hub guard ON —
    a 100 TB caller gets the cap without reading PERF_NOTES; explicit
    ``None`` restores exact uncapped semantics (r8 VERDICT ask 4)."""
    from db_factfinder_spark.llmdata.components import (
        DEFAULT_MAX_DEGREE,
        adamic_adar,
    )
    from db_factfinder_spark.llmdata.winnow import DEFAULT_MAX_DF, winnow_pairs

    assert (
        inspect.signature(winnow_pairs).parameters["max_df"].default
        == DEFAULT_MAX_DF
        == 128
    )
    assert (
        inspect.signature(adamic_adar).parameters["max_degree"].default
        == DEFAULT_MAX_DEGREE
        == 1024
    )


def test_winnow_default_cap_drops_flood_fingerprints(spark):
    """130 identical documents: every fingerprint has df=130 > 128, so
    the DEFAULT call emits zero pairs while max_df=None emits all
    C(130,2) — the subset contract, now opt-out."""
    from db_factfinder_spark.llmdata.winnow import winnow_pairs

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, text) for i in range(130)], "doc_id long, text string"
    )
    assert winnow_pairs(docs, min_shared=1).count() == 0
    assert winnow_pairs(docs, min_shared=1, max_df=None).count() == (
        130 * 129 // 2
    )


def test_adamic_adar_default_cap_drops_hub_middles(spark):
    """A 1,025-degree hub middle exceeds DEFAULT_MAX_DEGREE, so the
    default call emits no wedge through it; max_df=None counts all
    C(1025,2) spoke pairs."""
    from db_factfinder_spark.llmdata.components import adamic_adar

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 1026)], "src long, dst long"
    )
    assert adamic_adar(edges).count() == 0
    assert adamic_adar(edges, max_degree=None).count() == 1025 * 1024 // 2


def test_rrf_fuse_names_distinct():
    """Both fusion forms are importable under distinct names from the
    package root (r8 VERDICT ask 3): the two-frame pair form and the
    N-source multi-query form no longer shadow each other."""
    from db_factfinder_spark.llmdata import rrf_fuse, rrf_fuse_pair
    from db_factfinder_spark.llmdata.similarity import (
        rrf_fuse as sim_form,
    )
    from db_factfinder_spark.llmdata.textstats import (
        rrf_fuse_pair as pair_form,
    )

    assert rrf_fuse is sim_form
    assert rrf_fuse_pair is pair_form
    assert rrf_fuse is not rrf_fuse_pair
    params = inspect.signature(rrf_fuse_pair).parameters
    assert "ranked_a" in params and "ranked_b" in params
    assert "sources" in inspect.signature(rrf_fuse).parameters


def test_production_csv_sink_contract(spark, tmp_path):
    """The shipped acs.csv contract (create_acs.sql:4-16): header row
    carries the 11 columns in exact order, doubles roundtrip
    value-exact, NULLs roundtrip as NULLs (r8 VERDICT ask 1's sink
    half; the full-pipeline values are pinned by q365's oracle)."""
    import glob

    from db_factfinder_spark.pipelines import ACS_PRODUCTION_COLUMNS
    from db_factfinder_spark.sources.readers import write_csv

    assert ACS_PRODUCTION_COLUMNS == [
        "census_geoid", "labs_geoid", "geotype", "labs_geotype",
        "pff_variable", "c", "e", "m", "p", "z", "domain",
    ]
    df = spark.createDataFrame(
        [
            ("36047000001", "3000001", "tract", "CT2010", "pop_1",
             1.2, 100.0, 16.4, None, None, "demographic"),
            ("3651000", "0", "city", "City2020", "lgoenlep1",
             None, 0.0, None, None, None, "social"),
        ],
        "census_geoid string, labs_geoid string, geotype string,"
        " labs_geotype string, pff_variable string, c double, e double,"
        " m double, p double, z double, domain string",
    ).select(*ACS_PRODUCTION_COLUMNS)
    path = str(tmp_path / "acs_csv")
    write_csv(df, path)
    parts = sorted(glob.glob(path + "/part-*.csv"))
    assert parts, "CSV sink wrote no part files"
    with open(parts[0]) as f:
        header = f.readline().strip()
    assert header == ",".join(ACS_PRODUCTION_COLUMNS)
    back = spark.read.schema(df.schema).csv(path, header=True)
    got = {r["census_geoid"]: r for r in back.collect()}
    assert got["36047000001"]["c"] == 1.2
    assert got["36047000001"]["m"] == 16.4
    assert got["36047000001"]["p"] is None
    assert got["3651000"]["c"] is None and got["3651000"]["e"] == 0.0


def test_production_run_filters_domains(spark):
    """production_acs_run ships only the 4 published domains
    (pipelines/acs.py:48) — community_profiles-domain variables stay
    catalog-resident but never reach the CSV."""
    from db_factfinder_spark.catalog import Catalog
    from db_factfinder_spark.pipelines import (
        ACS_PRODUCTION_DOMAINS,
        ACS_PRODUCTION_GEOTYPES,
    )

    cat = Catalog.from_registry("acs", 2019)
    doms = {m.get("domain") for m in cat.metadata}
    assert "community_profiles" in doms
    assert set(ACS_PRODUCTION_DOMAINS) <= doms
    published = [
        m["pff_variable"]
        for m in cat.metadata
        if m.get("domain") in set(ACS_PRODUCTION_DOMAINS)
    ]
    assert len(published) == 1040 and len(cat.metadata) == 1047
    # the reference's 2010_to_2020 grid (tract rides only on the 2010
    # geography — acs.py:44-46)
    assert ACS_PRODUCTION_GEOTYPES == ["NTA", "CDTA", "CT20", "city",
                                       "borough"]


def test_catalog_dependency_closure_edges():
    """Every closure edge type, hand-checked on the real 2019 catalog:
    direct column hit, base child, poverty twin, the wrkrnothm chain
    (incl. its mntrvtm special consumer), median bins, and — crucially
    — variables with NO path from the mutation stay OUT."""
    from db_factfinder_spark.catalog import Catalog
    from db_factfinder_spark.plans.batch import catalog_dependency_closure

    cat = Catalog.from_registry("acs", 2019)
    meta_by = {m["pff_variable"]: m for m in cat.metadata}

    # base edge: mutating pop5pl1's column pulls in its children
    aff = catalog_dependency_closure(
        cat, {meta_by["pop5pl1"]["census_variable"][0]}
    )
    assert "pop5pl1" in aff and "lgoenlep1" in aff
    assert "mdage" not in aff and "hh1" not in aff

    # wrkrnothm chain: its input pulls the special AND mntrvtm (which
    # consumes wrkrnothm's special values)
    aff = catalog_dependency_closure(
        cat, {meta_by["wrkr16pl"]["census_variable"][0]}
    )
    assert {"wrkr16pl", "wrkrnothm", "mntrvtm"} <= aff

    # poverty twin: the _pct column moves the pov p/z pair
    aff = catalog_dependency_closure(
        cat, {meta_by["pbwpv_pct"]["census_variable"][0]}
    )
    assert {"pbwpv_pct", "pbwpv"} <= aff

    # median bins: a bin variable's column pulls the grouped median
    # and the median's own p/z children
    bin_cv = meta_by["mdhhi10t14"]["census_variable"][0]
    aff = catalog_dependency_closure(cat, {bin_cv})
    assert "mdhhi10t14" in aff and "mdhhinc" in aff and "mdhh" in aff

    # empty mutation → empty closure
    assert catalog_dependency_closure(cat, set()) == set()


def test_production_run_frees_batch_caches(spark, tmp_path):
    """After the sink action, production_acs_run unpersists every
    frame the batch registered — a long-lived session running repeated
    vintages must not accumulate dead caches (Spark's CacheManager
    holds strong refs; GC never frees them)."""
    import __spark_entry__ as entry_mod
    from db_factfinder_spark.pipelines import production_acs_run

    eng = entry_mod._catalog_batch_engine(
        spark, "/root/testdata/sf0.001", "acs", 2019
    )
    # register one batch's caches WITHOUT a sink, then run the
    # production sink: both generations must be freed (checking the
    # registered frames' own storage levels — a global CacheManager
    # emptiness check would be polluted by other tests sharing the
    # session)
    eng.calculate_batch_catalog(["borough", "city"])
    before = list(eng._batch_caches)
    assert before, "batch registered no caches"
    production_acs_run(
        eng, ["borough", "city"], output_path=str(tmp_path / "acs")
    )
    assert eng._batch_caches == []
    for frame in before:
        lvl = frame.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), (
            "batch cache leaked past the sink"
        )


def test_pii_redact_hand_example(spark):
    from db_factfinder_spark.llmdata.webclean import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org, ssn 123-45-6789, "
                "call 212-555-0000, host 10.0.0.1 end"),
            (2, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_redact(df).collect()}
    r1 = rows[1]
    assert (r1["n_email"], r1["n_ssn"], r1["n_phone"], r1["n_ipv4"]) == (
        2, 1, 1, 1,
    )
    assert r1["n_pii"] == 5
    assert r1["clean_text"] == (
        "mail [EMAIL] and [EMAIL], ssn [SSN], call [PHONE], "
        "host [IP] end"
    )
    r2 = rows[2]
    assert r2["n_pii"] == 0 and r2["clean_text"] == "no pii here at all"


def test_pii_redact_precedence(spark):
    """A digits-and-dots run inside an email redacts as EMAIL (first
    listed), not as an IP fragment — and the raw-text counts still
    record both matches (independent scans)."""
    from db_factfinder_spark.llmdata.webclean import pii_redact

    df = spark.createDataFrame(
        [(1, "write 1.2.3.4@mail.example.com now")],
        "doc_id long, text string",
    )
    r = pii_redact(df).collect()[0]
    assert r["clean_text"] == "write [EMAIL] now"
    assert r["n_email"] == 1 and r["n_ipv4"] == 1


def test_dsir_weights_orders_target_like_docs_first(spark):
    """Candidates sharing the target's trigram profile must out-score
    disjoint candidates; identical docs tie exactly (integer units)."""
    from db_factfinder_spark.llmdata.sampling import dsir_weights

    tgt_text = "the quick brown fox jumps over the lazy dog"
    other = "zzz qqq xxx vvv kkk www yyy uuu"
    cands = spark.createDataFrame(
        [(1, tgt_text), (2, tgt_text), (3, other)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, tgt_text)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dsir_weights(cands, target).collect()}
    assert rows[1]["weight_units"] == rows[2]["weight_units"]
    assert rows[1]["weight_units"] > rows[3]["weight_units"]


def test_dsir_weights_short_text_excluded(spark):
    from db_factfinder_spark.llmdata.sampling import dsir_weights

    cands = spark.createDataFrame(
        [(1, "ab"), (2, "abcdef")], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(9, "abcdef")], "doc_id long, text string"
    )
    rows = {r["doc_id"] for r in dsir_weights(cands, target).collect()}
    assert rows == {2}


def test_bpe_train_classic_example(spark):
    """Sennrich-style fixture: 'es' (newest 6 + widest 3 = 9) must win
    round 1, then 'est'; ties break lexicographic; counts are
    freq-weighted."""
    from db_factfinder_spark.llmdata.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                      + ["widest"] * 3))],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, 3)
    assert [(m["left"], m["right"], m["pair_count"]) for m in merges] == [
        ("e", "s", 9), ("es", "t", 9), ("l", "o", 7),
    ]


def test_bpe_merge_scan_semantics(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] — the
    left-to-right non-overlapping scan, not [aa, a, a]."""
    from pyspark.sql import functions as F

    from db_factfinder_spark.llmdata.bpe import _apply_merge

    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],), (["b"],)],
        "syms array<string>",
    )
    out = [
        r["m"]
        for r in df.select(
            _apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    assert out == [["aa", "aa"], ["aa", "a"], ["b"]]


def test_bpe_train_stops_when_dry(spark):
    from db_factfinder_spark.llmdata.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    assert bpe_train(docs, 5) == []


def test_bpe_encode_counts(spark):
    """Encoding under the trained merges: token counts follow the
    merge table exactly (low→1 token after (l,o),(lo,w); unseen
    symbols stay characters)."""
    from db_factfinder_spark.llmdata.bpe import bpe_encode, bpe_train

    corpus = spark.createDataFrame(
        [(1, " ".join(["low"] * 9 + ["lot"] * 2))],
        "doc_id long, text string",
    )
    merges = bpe_train(corpus, 2)
    assert [(m["left"], m["right"]) for m in merges] == [
        ("l", "o"), ("lo", "w"),
    ]
    probe = spark.createDataFrame(
        [(1, "low low lot"), (2, "zzz")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bpe_encode(probe, merges).collect()}
    # low = [low] (1 tok) x2, lot = [lo, t] (2 tok)
    assert (rows[1]["n_words"], rows[1]["n_tokens"]) == (3, 4)
    assert (rows[2]["n_words"], rows[2]["n_tokens"]) == (1, 3)


def test_corpus_diff_statuses(spark):
    from db_factfinder_spark.llmdata.integrity import corpus_diff

    old = spark.createDataFrame(
        [(1, "a b"), (2, "x"), (3, None), (4, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "A  b!"), (2, "y"), (3, None), (5, "fresh")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()
    }
    # normalization absorbs case/punct/whitespace churn for doc 1;
    # NULL-text doc 3 is present-and-unchanged, not removed
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "added"}


def test_incremental_closure_is_a_small_slice():
    """The efficiency contract behind q367/q374: the three-column
    vintage mutation pulls in 31 of 1,047 variables — the recompute is
    a SLICE, not a re-run wearing a trench coat."""
    from db_factfinder_spark.catalog import Catalog
    from db_factfinder_spark.plans.batch import catalog_dependency_closure
    from synth_catalog import incremental_mutation_cvs

    cat = Catalog.from_registry("acs", 2019)
    aff = catalog_dependency_closure(
        cat, set(incremental_mutation_cvs("acs", 2019))
    )
    assert len(aff) == 31
    assert {"pop5pl1", "lgoenlep1", "wrkr16pl", "wrkrnothm", "mntrvtm",
            "pbwpv", "pbwpv_pct"} <= aff


def test_incremental_splice_filters_unrequested_geotypes(spark):
    """r10 fix (ADVICE r9): when ``prev`` was built over a WIDER grid
    than the requested geotypes, its stale rows for unrequested
    geotypes must NOT leak through the splice — the output covers
    exactly the requested grid."""
    import __spark_entry__ as entry_mod
    from db_factfinder_spark.plans.batch import incremental_catalog_update
    from synth_catalog import incremental_mutation_cvs

    eng = entry_mod._catalog_batch_engine(
        spark, "/root/testdata/sf0.001", "acs", 2019
    )
    variables = ["pop5pl1", "lgoenlep1", "hh1"]  # base+child+untouched
    # prev covers borough AND city; the update requests borough only
    prev = eng.calculate_batch_catalog(
        ["borough", "city"], variables=variables
    ).localCheckpoint()
    out = incremental_catalog_update(
        eng,
        prev,
        incremental_mutation_cvs("acs", 2019),
        ["borough"],
        variables=variables,
    )
    geos = {r["geotype"] for r in out.select("geotype").distinct().collect()}
    assert geos == {"borough"}, geos


def test_mmr_rerank_diversifies(spark):
    """Redundant near-duplicates of the top pick must lose to a
    diverse lower-relevance doc at rank 2; scores are exact integers."""
    from db_factfinder_spark.llmdata.similarity import mmr_rerank

    rows = [
        (0, 1, 100, [1.0, 0.0]),
        (0, 2, 90, [1.0, 0.0]),       # duplicate of 1
        (0, 3, 80, [0.99, 0.01]),     # near-duplicate of 1
        (0, 4, 50, [0.0, 1.0]),       # orthogonal
    ]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, rel_units long,"
        " vec array<double>"
    )
    got = [
        (r["rank"], r["doc_id"], r["mmr_units"])
        for r in mmr_rerank(df, 3).orderBy("rank").collect()
    ]
    assert got[0] == (1, 1, 100)
    assert got[1] == (2, 4, 50)       # diversity beats redundancy
    assert got[2][1] == 3             # near-dup only after diverse


def test_within_doc_line_dedup(spark):
    from db_factfinder_spark.llmdata.lines import dedup_lines_within_doc

    df = spark.createDataFrame(
        [(1, "Nav Bar\nreal one\nnav bar\n\nreal two\n\nNAV BAR  "),
         (2, "only line")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_lines_within_doc(df).collect()}
    r1 = rows[1]
    # re-cased/re-padded banner copies drop; BOTH blank layout lines stay
    assert r1["clean_text"] == "Nav Bar\nreal one\n\nreal two\n"
    assert (r1["n_lines"], r1["n_dropped"]) == (7, 2)
    assert rows[2]["n_dropped"] == 0
