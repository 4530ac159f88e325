"""Tests for the training-data-pipeline operators over the driver's
synthetic documents/embeddings tables (sf0.001)."""

import math

import pytest
from pyspark.sql import functions as F

from db_factfinder_spark.llmdata.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_pairs,
)
from db_factfinder_spark.llmdata.similarity import (
    brute_force_topk,
    cosine_similarity,
    lsh_bucketed_topk,
)
from db_factfinder_spark.llmdata.textstats import add_text_stats, language_id
from db_factfinder_spark.llmdata.multimodal import extract_features

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_text_stats_columns(docs):
    out = add_text_stats(docs)
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    assert row["n_tokens"] > 0
    assert 0 <= row["quality"] <= 1
    assert len(row["fingerprint"]) == 32
    # deterministic: same text → same fingerprint
    again = add_text_stats(docs).filter(F.col("doc_id") == 0).collect()[0]
    assert again["fingerprint"] == row["fingerprint"]


def test_language_id_on_synthetic(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the hat and it is flat",),
            ("el perro y el gato en la casa de los abuelos",),
            ("xyzzy plugh qwerty",),
        ],
        "text string",
    )
    out = [r[0] for r in df.select(language_id("text")).collect()]
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "und"


def test_exact_dedup_with_injected_dupes(spark, docs):
    # duplicate every doc_id < 5 with a shifted id
    dupes = docs.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    groups = exact_dedup(docs.unionByName(dupes))
    n_docs = docs.count()
    assert groups.count() == n_docs  # 5 dupes collapsed
    assert groups.filter(F.col("n_copies") == 2).count() == 5
    # representative is the lowest id
    assert groups.filter(F.col("doc_id") >= 100000).count() == 0


def test_shingles_short_text(spark):
    df = spark.createDataFrame([("one two",), ("a b c d",), ("",)], "text string")
    out = [r[0] for r in df.select(shingles("text", 3)).collect()]
    assert out[0] == []  # fewer tokens than n → empty, not garbage
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []


def test_minhash_lsh_finds_near_duplicates(spark, docs):
    # a near-dup: copy of doc 0 with one token appended
    base = docs.filter(F.col("doc_id") == 0)
    near = base.withColumn("doc_id", F.lit(999999)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" extra"))
    )
    corpus = docs.unionByName(near)
    pairs = minhash_dedup_pairs(corpus, verify_threshold=0.8).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 999999 for r in pairs)
    for r in pairs:
        assert r["jaccard"] >= 0.8


def test_jaccard_pairs_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             jaccard_pairs(df, threshold=0.1).collect()}
    # docs 1,2: shingles 4 each, 3 common → 3/5
    assert abs(pairs[(1, 2)] - 3 / 5) < 1e-12
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_locality(spark, docs):
    base = docs.filter(F.col("doc_id") == 0)
    near = base.withColumn("doc_id", F.lit(999999)).withColumn(
        "text", F.concat(F.col("text"), F.lit(" extra"))
    )
    two = base.unionByName(near).select("doc_id", simhash("text").alias("sig"))
    sigs = {r["doc_id"]: r["sig"] for r in two.collect()}
    hamming = bin(sigs[0] ^ sigs[999999]).count("1")
    assert hamming <= 4  # near-identical docs → close fingerprints


def test_brute_force_topk(spark, embs):
    probes = embs.filter(F.col("vec_id") < 3)
    out = brute_force_topk(probes, embs, k=5)
    rows = out.collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == {0, 1, 2}
    for probe, neighbors in by_probe.items():
        assert len(neighbors) == 5
        ranks = sorted(n["rank"] for n in neighbors)
        assert ranks == [1, 2, 3, 4, 5]
        sims = [n["cosine"] for n in sorted(neighbors, key=lambda x: x["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(n["neighbor_id"] != probe for n in neighbors)


def test_lsh_topk_recall(spark, embs):
    probes = embs.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(probes, embs, k=5).filter(F.col("rank") == 1)
    # NN cosines in this table are ~0.35 (θ≈70°, s≈0.61): planes=2,
    # tables=8 → expected recall 1−(1−s²)⁸ ≈ 0.97
    approx = lsh_bucketed_topk(probes, embs, k=5, planes=2, tables=8)
    exact_top = {r["probe_id"]: r["neighbor_id"] for r in exact.collect()}
    approx_by_probe = {}
    for r in approx.filter(F.col("rank") == 1).collect():
        approx_by_probe[r["probe_id"]] = r["neighbor_id"]
    # LSH with 4 planes: ≥half the probes should recover their exact NN
    hits = sum(
        1 for p, n in exact_top.items() if approx_by_probe.get(p) == n
    )
    assert hits >= len(exact_top) // 2


def test_cosine_of_identical_is_one(spark, embs):
    row = embs.limit(1)
    out = row.select(
        cosine_similarity(F.col("embedding"), F.col("embedding")).alias("c")
    ).collect()[0]["c"]
    assert abs(out - 1.0) < 1e-9


def test_multimodal_feature_extraction(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x10\xff" * 100), "image", "png", 10, 10, None),
         (2, None, "image", "png", 0, 0, None)],
        "media_id long, payload binary, media_type string, format string,"
        " width int, height int, duration_ms long",
    )
    out = {r["media_id"]: r.asDict() for r in extract_features(df).collect()}
    assert out[1]["n_bytes"] == 300
    assert len(out[1]["feature"]) == 8
    assert abs(sum(out[1]["feature"]) - 1.0) < 1e-9
    assert out[2]["payload_hash"] is None and out[2]["feature"] == []


def test_embedding_neardup_matches_bruteforce(spark, embs):
    """LSH near-dup candidates that survive the threshold must be a
    subset of the true ≥ τ pair set, and each reported cosine exact."""
    from db_factfinder_spark.llmdata.similarity import embedding_neardup_pairs

    tau = 0.35
    approx = embedding_neardup_pairs(
        embs, threshold=tau, dim=64, planes=4, tables=4
    ).collect()
    a = embs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = embs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
        .collect()
    )
    exact_map = {(r["id_a"], r["id_b"]): r["cosine"] for r in exact}
    assert len(approx) > 0
    for r in approx:
        assert (r["id_a"], r["id_b"]) in exact_map
        assert r["cosine"] == exact_map[(r["id_a"], r["id_b"])]
    # multi-table LSH at this (low) similarity: expect partial recall
    assert len(approx) >= len(exact) // 4


def test_ivf_topk_candidates_exact_within_lists(spark, embs):
    """IVF results must come from the probed inverted lists with exact
    cosines — rank-1 should match brute force for most probes when
    nprobe covers the NN's cluster."""
    from db_factfinder_spark.llmdata.similarity import ivf_topk

    exploded = embs.select("label", F.posexplode("embedding").alias("pos", "val"))
    centroids = (
        exploded.groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("s"))
        .select(
            F.col("label").alias("cluster_id"),
            F.transform("s", lambda x: x["cv"]).alias("centroid"),
        )
    )
    probes = embs.filter(F.col("vec_id") < 10)
    approx = ivf_topk(probes, embs, centroids, k=5, nprobe=10)
    exact = brute_force_topk(probes, embs, k=5)
    # nprobe = all clusters → IVF degenerates to exact search
    ae = {(r["probe_id"], r["rank"]): r["neighbor_id"] for r in approx.collect()}
    ex = {(r["probe_id"], r["rank"]): r["neighbor_id"] for r in exact.collect()}
    assert ae == ex


def test_bpe_token_count(spark):
    from db_factfinder_spark.llmdata.textstats import bpe_token_count

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "a1b23 x!?"), (3, ""), (4, None)],
        "id long, text string",
    )
    out = {
        r["id"]: r["n"]
        for r in df.select("id", bpe_token_count("text").alias("n")).collect()
    }
    # "a1b23" → a,1,b,2,3 ; "x!?" → x, "!?"  ⇒ 7
    assert out[1] == 2 and out[2] == 7 and out[3] == 0 and out[4] is None


def test_resize_images_raw_codec(spark):
    """The raw codec resizes end-to-end: 4×4 row-major grayscale bytes
    → 2×2 by nearest-neighbor floor mapping (rows/cols 0 and 2)."""
    from db_factfinder_spark.llmdata.multimodal import resize_images

    src = bytes(range(16))  # 4x4: row r, col c → value 4r+c
    df = spark.createDataFrame(
        [(1, bytearray(src), 4, 4), (2, None, 4, 4), (3, bytearray(b"x"), 0, 4),
         (5, bytearray(src), None, 4)],
        "media_id long, payload binary, width int, height int",
    )
    out = {r["media_id"]: r.asDict() for r in resize_images(df, 2, 2).collect()}
    # (r,c) → src[(r*4)//2 * 4 + (c*4)//2] = [0, 2, 8, 10]
    assert bytes(out[1]["payload"]) == bytes([0, 2, 8, 10])
    assert out[1]["width"] == 2 and out[1]["height"] == 2
    assert out[2]["payload"] is None  # NULL payload isolated, not fatal
    assert out[3]["payload"] is None  # non-positive dims isolated
    # NULL width arrives as NaN through Arrow → must isolate, not crash
    assert out[5]["payload"] is None
    # short payload zero-pads before resampling
    short = spark.createDataFrame(
        [(4, bytearray(bytes([7, 7])), 4, 4)],
        "media_id long, payload binary, width int, height int",
    )
    got = resize_images(short, 2, 2).first()["payload"]
    assert bytes(got) == bytes([7, 0, 0, 0])


def test_resize_images_nonraw_codec_raises_at_execution(spark):
    """Non-raw codecs keep the stub contract: a valid, analyzable lazy
    plan that raises the documented error only at execution."""
    from db_factfinder_spark.llmdata.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"xx"))], "media_id long, payload binary"
    )
    out = resize_images(df, 32, 32, codec="jpeg")
    assert out.columns == ["media_id", "payload", "width", "height"]
    import pytest as _pytest
    with _pytest.raises(Exception, match="NotImplementedError|image codec"):
        out.collect()


def test_frame_sample_timestamps(spark):
    from db_factfinder_spark.llmdata.multimodal import frame_sample

    df = spark.createDataFrame(
        [(1, 3500), (2, None)], "media_id long, duration_ms long"
    )
    out = {r["media_id"]: r["sample_ts_ms"] for r in frame_sample(df, 1000).collect()}
    assert out[1] == [0, 1000, 2000, 3000]
    assert out[2] is None


# ------------------------------------------------------------- k-means
def test_kmeans_separates_obvious_clusters(spark):
    from db_factfinder_spark.llmdata.kmeans import kmeans_assignments

    # three tight groups on orthogonal axes (+ jitter in one coordinate)
    def vec(axis, jitter):
        v = [0.0] * 6
        v[axis] = 10.0
        v[(axis + 3) % 6] = jitter
        return v

    # interleaved ids (j*3 + axis) so the lowest-id seeds span all three
    # groups — lowest-id seeding is deterministic, not smart (k-means++
    # would be the production seeding; Lloyd's convergence is what's
    # under test here)
    rows = [(j * 3 + axis, vec(axis, 0.1 * j)) for axis in range(3) for j in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assignments(df, k=3, iters=4).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"] % 3)
    # every cluster is pure: one axis-group per cluster, all three found
    assert len(by_cluster) == 3
    assert all(len(groups) == 1 for groups in by_cluster.values())
    for r in out:
        assert r["cosine"] > 0.99


def test_kmeans_zero_norm_vectors_unassigned(spark):
    from db_factfinder_spark.llmdata.kmeans import kmeans_assignments

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_assignments(df, k=2, iters=2).collect()
    ids = {r["vec_id"] for r in out}
    assert 3 not in ids, "zero-norm vector must stay unassigned"
    assert ids == {0, 1, 2}


def test_kmeans_deterministic_across_partitionings(spark):
    from db_factfinder_spark.llmdata.kmeans import kmeans_assignments

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = {
        (r["vec_id"], r["cluster_id"], r["cosine"])
        for r in kmeans_assignments(embs.repartition(3, "vec_id"), k=3, iters=2).collect()
    }
    b = {
        (r["vec_id"], r["cluster_id"], r["cosine"])
        for r in kmeans_assignments(embs.repartition(17, "label"), k=3, iters=2).collect()
    }
    assert a == b


# ------------------------------------------------- connected components
def test_connected_components_chain_and_island(spark):
    from db_factfinder_spark.llmdata.components import neardup_groups

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: (r["rep_id"], r["group_size"])
           for r in neardup_groups(pairs).collect()}
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}


def test_connected_components_long_chain_converges(spark):
    # diameter-9 path graph: exercises multiple propagation rounds and
    # the convergence check (min-label moves one hop per iteration)
    from db_factfinder_spark.llmdata.components import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    labels = {r["id"]: r["label"] for r in connected_components(pairs).collect()}
    assert labels == {i: 0 for i in range(10)}


# ---------------------------------------------------------------------------
# Hot-bucket caps (cap_hot_buckets): a boilerplate flood must not turn
# into an O(m²) within-bucket pair explosion
# ---------------------------------------------------------------------------

BOILER = (
    "apache license standard boilerplate header text repeated verbatim"
    " at the top of every generated source file in the corpus"
)
REAL = "the quick brown fox jumps over the lazy dog near the river at dawn"


def _skew_docs(spark):
    rows = [(i, BOILER) for i in range(40)]
    rows += [(100, REAL), (101, REAL)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_hot_bucket_cap(spark):
    df = _skew_docs(spark)
    uncapped = minhash_dedup_pairs(
        df, num_hashes=8, bands=4, max_bucket=None
    ).count()
    assert uncapped == 40 * 39 // 2 + 1  # boilerplate clique + real pair
    capped = minhash_dedup_pairs(df, num_hashes=8, bands=4, max_bucket=10)
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(100, 101)}


def test_simhash_hot_bucket_cap(spark):
    df = _skew_docs(spark)
    uncapped = simhash_near_pairs(
        df, bits=32, max_hamming=1, prefix_bits=8, max_bucket=None
    ).count()
    assert uncapped == 40 * 39 // 2 + 1
    capped = simhash_near_pairs(
        df, bits=32, max_hamming=1, prefix_bits=8, max_bucket=10
    )
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(100, 101)}


def test_embedding_hot_bucket_cap(spark):
    from db_factfinder_spark.llmdata.similarity import embedding_neardup_pairs

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    rows += [(100, [0.0, 1.0, 0.0, 0.1]), (101, [0.0, 1.0, 0.0, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = embedding_neardup_pairs(
        df, threshold=0.9, dim=4, planes=4, tables=2, max_bucket=None
    ).count()
    assert uncapped == 40 * 39 // 2 + 1
    capped = embedding_neardup_pairs(
        df, threshold=0.9, dim=4, planes=4, tables=2, max_bucket=10
    )
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(100, 101)}


def test_default_cap_leaves_small_corpus_unchanged(spark, docs):
    """The default max_bucket is far above any bucket the test corpus
    produces — capped and uncapped results must be identical (this is
    what keeps the driver oracle queries green)."""
    a = minhash_dedup_pairs(docs, num_hashes=8, bands=4, n=3,
                            verify_threshold=0.6)
    b = minhash_dedup_pairs(docs, num_hashes=8, bands=4, n=3,
                            verify_threshold=0.6, max_bucket=None)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_simhash_multiprobe_guaranteed_recall(spark, docs):
    """d+1 blocked tables must find EVERY pair with hamming ≤ d
    (pigeonhole) — compare against the brute-force all-pairs join."""
    from db_factfinder_spark.llmdata.dedup import simhash_multiprobe_pairs

    d = 3
    probe = simhash_multiprobe_pairs(docs, bits=32, max_hamming=d)
    sh = docs.select(
        F.col("doc_id").alias("id"), simhash("text", 32).alias("sig")
    ).filter(F.col("sig").isNotNull())
    a, b = sh.alias("a"), sh.alias("b")
    brute = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= d)
    )
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in probe.collect()}
    want = {(r["id_a"], r["id_b"], r["hamming"]) for r in brute.collect()}
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# Survivor selection + deterministic sampling
# ---------------------------------------------------------------------------

def test_select_survivors_keeps_best_quality(spark):
    from db_factfinder_spark.llmdata.components import select_survivors

    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.7)],
        "doc_id long, quality double",
    )
    groups = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3)],
        "doc_id long, rep_id long, group_size long",
    )
    out = {r["doc_id"]: r.asDict() for r in
           select_survivors(scored, groups).collect()}
    # group {1,2,3}: 2 and 3 tie at 0.9 → lowest id (2) survives
    assert out[2]["keep"] is True
    assert out[1]["keep"] is False and out[3]["keep"] is False
    # doc 4 is in no pair → singleton group of itself, kept
    assert out[4]["keep"] is True and out[4]["group_id"] == 4
    assert out[4]["group_size"] == 1


def test_deterministic_split_is_stable_and_partition_invariant(spark):
    from db_factfinder_spark.llmdata.sampling import split_column

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = df.withColumn("split", split_column("doc_id"))
    b = (
        df.repartition(13)
        .withColumn("split", split_column("doc_id"))
    )
    ra = {r["doc_id"]: r["split"] for r in a.collect()}
    rb = {r["doc_id"]: r["split"] for r in b.collect()}
    assert ra == rb  # partitioning-independent
    frac = sum(1 for v in ra.values() if v == "train") / len(ra)
    assert 0.75 < frac < 0.85  # ~80% train


def test_deterministic_sample_fraction(spark):
    from db_factfinder_spark.llmdata.sampling import deterministic_sample

    df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    kept = df.filter(deterministic_sample("doc_id", 0.25)).count()
    assert 0.22 * 5000 < kept < 0.28 * 5000
    # same selection on every evaluation
    assert kept == df.filter(deterministic_sample("doc_id", 0.25)).count()


def test_multiprobe_capped_and_uncapped_paths_agree(spark, docs):
    """The capped path (bucket join + distinct) and the uncapped path
    (first-matching-table join condition) are different plans; on a
    corpus with no hot buckets they must produce identical pair sets."""
    from db_factfinder_spark.llmdata.dedup import simhash_multiprobe_pairs

    capped = simhash_multiprobe_pairs(docs, bits=32, max_hamming=2)
    uncapped = simhash_multiprobe_pairs(
        docs, bits=32, max_hamming=2, max_bucket=None
    )
    a = {(r["id_a"], r["id_b"], r["hamming"]) for r in capped.collect()}
    b = {(r["id_a"], r["id_b"], r["hamming"]) for r in uncapped.collect()}
    assert a == b and len(a) > 0


def test_redact_pii_rules_and_counts(spark):
    from db_factfinder_spark.llmdata.redact import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+x@e-f.org call 555-123-4567"),
            (2, "server at 192.168.0.1 and 10.0.0.255 no contacts"),
            (3, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in redact_pii(df, "text").collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_phone"] == 1
    assert out[1]["text_redacted"] == (
        "mail <EMAIL> and <EMAIL> call <PHONE>"
    )
    assert out[2]["n_ipv4"] == 2
    assert "<IP>" in out[2]["text_redacted"]
    assert out[3]["text_redacted"] == out[3]["text"]
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_ipv4"] == 0


def test_repetition_stats_boilerplate_vs_varied(spark):
    from db_factfinder_spark.llmdata.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    # pure repetition: one distinct token owns everything
    assert out[1]["distinct_ratio"] == 1 / 6
    assert out[1]["top_token_frac"] == 1.0
    assert out[1]["top_bigram_frac"] == 1.0
    # fully varied: every token and bigram unique
    assert out[2]["distinct_ratio"] == 1.0
    assert abs(out[2]["top_token_frac"] - 1 / 6) < 1e-12
    assert abs(out[2]["top_bigram_frac"] - 1 / 5) < 1e-12
    # token-less: NULL ratios, zero tokens
    assert out[3]["n_tokens"] == 0 and out[3]["distinct_ratio"] is None


def test_pack_sequences_assignment(spark):
    from db_factfinder_spark.llmdata.textstats import pack_sequences

    df = spark.createDataFrame(
        [(1, "a", 3000), (2, "a", 2000), (3, "a", 100), (4, "b", 5000)],
        "doc_id long, lang string, n_tok long",
    )
    out = {r["doc_id"]: r.asDict() for r in pack_sequences(
        df, seq_len=4096, token_col="n_tok",
        order_col="doc_id", part_col="lang",
    ).collect()}
    assert out[1]["chunk_id"] == 0 and out[1]["chunk_offset"] == 0
    # doc 2 starts at token 3000 — inside chunk 0
    assert out[2]["chunk_id"] == 0 and out[2]["chunk_offset"] == 3000
    # doc 3 starts at 5000 → chunk 1 offset 904
    assert out[3]["chunk_id"] == 1 and out[3]["chunk_offset"] == 5000 - 4096
    # separate stream restarts at zero
    assert out[4]["chunk_id"] == 0 and out[4]["chunk_offset"] == 0


def test_mixture_sample_respects_group_weights(spark):
    from db_factfinder_spark.llmdata.sampling import mixture_sample

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "keep_all").otherwise("drop_all").alias(
            "src"
        ),
    )
    kept = df.filter(
        mixture_sample("doc_id", "src", {"keep_all": 1.0, "drop_all": 0.0})
    )
    rows = kept.groupBy("src").count().collect()
    got = {r["src"]: r["count"] for r in rows}
    assert got.get("keep_all") == 2000 and "drop_all" not in got


def test_ngram_contamination_shared_spans(spark):
    from db_factfinder_spark.llmdata.dedup import ngram_contamination

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, shared + " in the morning light today"),
            (2, shared + " at the river bank yesterday"),
            (3, "completely unrelated words forming a different text"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in
           ngram_contamination(df, n=5).collect()}
    # docs 1,2 share the 5 five-grams inside the common 9-token prefix
    assert out[1]["shared_frac"] > 0 and out[2]["shared_frac"] > 0
    assert out[3]["shared_frac"] == 0.0
    # 2 tokens < n → no shingles → NULL fraction
    assert out[4]["n_grams"] == 0 and out[4]["shared_frac"] is None


def test_cap_hot_buckets_properties(spark):
    """cap_hot_buckets is drop-only: the capped frame is a subset of
    the input, no surviving bucket exceeds the cap, and buckets at or
    under the cap survive intact."""
    from db_factfinder_spark.llmdata.dedup import cap_hot_buckets

    rows = [(i, "hot") for i in range(25)]
    rows += [(100 + i, "warm") for i in range(10)]
    rows += [(200, "cold")]
    df = spark.createDataFrame(rows, "id long, bucket string")
    capped = cap_hot_buckets(df, ["bucket"], 10)
    got = {(r["id"], r["bucket"]) for r in capped.collect()}
    assert all(t in {(r["id"], r["bucket"]) for r in df.collect()} for t in got)
    sizes = {}
    for _, b in got:
        sizes[b] = sizes.get(b, 0) + 1
    assert "hot" not in sizes          # over the cap → dropped whole
    assert sizes.get("warm") == 10     # exactly at the cap → intact
    assert sizes.get("cold") == 1
    # None disables entirely
    assert cap_hot_buckets(df, ["bucket"], None).count() == df.count()


def test_quantized_topk_tracks_float_topk(spark, embs):
    """Int8-quantized cosine must rank the same rank-1 neighbor as
    full-precision cosine for most probes (quantization error ~1e-2 vs
    neighbor gaps), and codes must be within int8 range."""
    from db_factfinder_spark.llmdata.similarity import (
        quantize_embeddings,
        quantized_topk,
    )

    q = quantize_embeddings(embs)
    row = q.first()
    assert all(-127 <= v <= 127 for v in row["q"])
    assert row["scale"] > 0

    probes = embs.filter(F.col("vec_id") < 10)
    exact1 = {
        r["probe_id"]: r["neighbor_id"]
        for r in brute_force_topk(probes, embs, k=1).collect()
    }
    quant1 = {
        r["probe_id"]: r["neighbor_id"]
        for r in quantized_topk(probes, embs, k=1).collect()
    }
    hits = sum(1 for p, n in exact1.items() if quant1.get(p) == n)
    assert hits >= len(exact1) // 2


def test_mixture_sample_empty_weights_uses_default(spark):
    from db_factfinder_spark.llmdata.sampling import mixture_sample

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("src")
    )
    kept = df.filter(mixture_sample("doc_id", "src", {}, default=0.5)).count()
    assert 400 < kept < 600


def test_select_survivors_giant_group_skew(spark):
    """A 10k-member component (upstream caps disabled) must not change
    the plan shape: ONE hash exchange on group_id for the survivor
    window (row_number is sort-based/streaming — no per-group memory),
    and exactly one survivor comes out of the giant group."""
    from db_factfinder_spark.llmdata.components import select_survivors

    n = 10_000
    scored = spark.range(0, n + 50).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 997).cast("double").alias("quality"),
    )
    groups = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).cast("bigint").alias("rep_id"),
        F.lit(n).cast("bigint").alias("group_size"),
    )
    out = select_survivors(scored, groups)
    jvm = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = out._jdf.queryExecution().explainString(jvm.fromString("formatted"))
    assert plan.count("hashpartitioning(group_id") == 1, plan
    assert "CartesianProduct" not in plan

    rows = out.collect()
    giant = [r for r in rows if r["group_id"] == 0]
    keepers = [r for r in giant if r["keep"]]
    assert len(giant) == n and len(keepers) == 1
    # best quality 996.0, ties broken by lowest doc_id
    assert keepers[0]["doc_id"] == 996 and keepers[0]["quality"] == 996.0
    # ungrouped docs form singleton groups and all survive
    singles = [r for r in rows if r["doc_id"] >= n]
    assert len(singles) == 50 and all(r["keep"] for r in singles)


def test_shared_span_stats_planted_copy(spark):
    """A verbatim 10-token span shared by two docs shows up as one
    8-long 3-gram run in each; an unrelated doc reports zero."""
    from db_factfinder_spark.llmdata.dedup import shared_span_stats

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, base + " unique tail words here"),
            (2, "prefix padding " + base + " different ending"),
            (3, "totally unrelated content runs through many distinct tokens"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in shared_span_stats(df, n=3).collect()}
    # doc 1: 14 tokens → 12 grams; the 8 base grams are shared, contiguous
    assert out[1]["n_grams"] == 12
    assert out[1]["n_shared_pos"] == 8
    assert out[1]["max_shared_run"] == 8
    # doc 2: same base span at a different offset
    assert out[2]["n_shared_pos"] == 8 and out[2]["max_shared_run"] == 8
    # doc 3: nothing shared
    assert out[3]["n_shared_pos"] == 0 and out[3]["max_shared_run"] == 0


def test_shared_span_scattered_vs_contiguous(spark):
    """Same shared *fraction*, different contiguity: the run statistic
    separates a verbatim block from scattered overlaps."""
    from db_factfinder_spark.llmdata.dedup import shared_span_stats

    block = "one two three four five six"
    df = spark.createDataFrame(
        [
            # doc 1 carries the block intact; docs 2 carries its grams
            # but interrupted in the middle
            (1, block + " filler alpha beta"),
            (2, "one two three four interruptor three four five six pad"),
            (3, block + " other ending tokens"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in shared_span_stats(df, n=3).collect()}
    # docs 1 and 3 share the whole 6-token block → 4-gram run
    assert out[1]["max_shared_run"] == 4 and out[3]["max_shared_run"] == 4
    # doc 2 shares fragments of it, but its longest run is shorter
    assert 0 < out[2]["max_shared_run"] < 4


def test_tfidf_top_terms_known_corpus(spark):
    from db_factfinder_spark.llmdata.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_top_terms(docs, k=2)
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df, r.score)
        for r in out.collect()
    }
    # N=3. doc1: apple tf2 df1 → 6.0; banana tf1 df2 → 1.5
    assert got[(1, 1)] == ("apple", 2, 1, 6.0)
    assert got[(1, 2)] == ("banana", 1, 2, 1.5)
    # doc2: banana 1*3/2=1.5, cherry 1*3/2=1.5 → tie broken by term asc
    assert got[(2, 1)][0] == "banana" and got[(2, 2)][0] == "cherry"
    # doc3: cherry tf3 df2 → 4.5 beats durian tf1 df1 → 3.0
    assert got[(3, 1)] == ("cherry", 3, 2, 4.5)
    assert got[(3, 2)] == ("durian", 1, 1, 3.0)


def test_cap_per_group_quota_and_determinism(spark):
    from db_factfinder_spark.llmdata.sampling import cap_per_group

    df = spark.createDataFrame(
        [("a", i, 100 - i) for i in range(5)] + [("b", 10, 7)],
        "g string, id int, score int",
    )
    kept = cap_per_group(
        df, ["g"], [F.col("score").desc(), F.col("id")], cap=2
    )
    got = sorted((r.g, r.id, r.rank) for r in kept.collect())
    # group a keeps its two highest scores (ids 0, 1); b is under cap
    assert got == [("a", 0, 1), ("a", 1, 2), ("b", 10, 1)]
    # ties broken by id: two rows with equal score rank deterministically
    tie = spark.createDataFrame(
        [("t", 2, 5), ("t", 1, 5), ("t", 3, 5)], "g string, id int, score int"
    )
    kept2 = cap_per_group(tie, ["g"], [F.col("score").desc(), F.col("id")], cap=2)
    assert sorted(r.id for r in kept2.collect()) == [1, 2]


def test_hll_distinct_accuracy_and_mergeability(spark):
    from db_factfinder_spark.llmdata.sketches import hll_distinct

    n = 5000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    out = hll_distinct(df, ["g"], "v").collect()[0]
    # m=64 → rsd ≈ 1.04/√64 ≈ 13%; allow 3σ
    assert abs(out.hll_raw - n) / n < 0.4, out.hll_raw

    # sketch is union-mergeable: duplicating every value changes nothing
    # (bucket-wise max is idempotent), so the estimate is identical
    doubled = df.union(df)
    out2 = hll_distinct(doubled, ["g"], "v").collect()[0]
    assert out2.hll_raw == out.hll_raw
    assert out2.n_buckets == out.n_buckets


def test_hll_distinct_small_group_determinism(spark):
    from db_factfinder_spark.llmdata.sketches import hll_distinct

    df = spark.createDataFrame(
        [("a", i) for i in range(3)] + [("b", 7)], "g string, v int"
    )
    rows = {r.g: r for r in hll_distinct(df, ["g"], "v").collect()}
    # partitioning-independent: repartitioned input gives identical sketch
    rows2 = {
        r.g: r
        for r in hll_distinct(df.repartition(7), ["g"], "v").collect()
    }
    for g in rows:
        assert rows[g].hll_raw == rows2[g].hll_raw
        assert rows[g].n_buckets == rows2[g].n_buckets


def test_cross_corpus_matches_planted_dup(spark):
    from db_factfinder_spark.llmdata.dedup import cross_corpus_matches

    text = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(0, text), (2, "completely unrelated material about spark plans")],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [
            (1, text),                       # exact copy → must match doc 0
            (3, "novel content with no twin in the training corpus at all"),
        ],
        "doc_id long, text string",
    )
    m = cross_corpus_matches(
        corpus, probe, num_hashes=8, bands=4, n=3,
        verify_threshold=0.6, max_bucket=None,
    )
    rows = [(r.probe_id, r.corpus_id, r.jaccard) for r in m.collect()]
    assert rows == [(1, 0, 1.0)]
    # no self-pairs, no probe×probe or corpus×corpus pairs by shape:
    # ids 1/3 only appear as probe_id, 0/2 only as corpus_id


def test_frame_energy_known_payloads(spark):
    from db_factfinder_spark.llmdata.multimodal import frame_energy

    rows = [
        (1, bytes([128] * 10)),        # silence → all energies 0
        (2, bytes([129, 127])),        # (+1)² + (−1)² = 2
        (3, bytes(range(256)) * 2),    # exactly 2 full frames, equal
        (4, None),                     # NULL payload
        (5, b""),                      # empty payload
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: (r.n_frames, r.total_energy, r.max_frame_energy)
           for r in frame_energy(df, frame_len=256).collect()}
    assert got[1] == (1, 0, 0)
    assert got[2] == (1, 2, 2)
    e = sum((v - 128) ** 2 for v in range(256))
    assert got[3] == (2, 2 * e, e)
    assert got[4] == (0, 0, 0)
    assert got[5] == (0, 0, 0)
    # partial trailing frame: 300 samples → frames of 256 and 44
    df2 = spark.createDataFrame(
        [(6, bytes([130] * 300))], "media_id long, payload binary"
    )
    r6 = frame_energy(df2, frame_len=256).collect()[0]
    assert (r6.n_frames, r6.total_energy, r6.max_frame_energy) == (
        2, 300 * 4, 256 * 4
    )


def test_sampled_quantiles_tracks_exact(spark):
    from db_factfinder_spark.llmdata.sketches import sampled_quantiles

    n = 20000
    df = spark.range(n).select(
        F.lit("g").alias("g"),
        F.col("id").alias("sid"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    out = sampled_quantiles(
        df, ["g"], "v", probs=[0.5], sample_id="sid", fraction=0.1
    ).collect()[0]
    # uniform 0..999 → true median 499.5; rank error ≈ 1/√(0.1·n) ≈ 2%
    assert abs(out.q50 - 499.5) < 60, out.q50
    assert 1500 < out.n_sampled < 2500  # ~10% of 20k
    # determinism: identical result on a different partitioning
    out2 = sampled_quantiles(
        df.repartition(13), ["g"], "v", probs=[0.5],
        sample_id="sid", fraction=0.1,
    ).collect()[0]
    assert out2.q50 == out.q50 and out2.n_sampled == out.n_sampled


def test_edit1_join_exact_semantics(spark):
    from db_factfinder_spark.llmdata.strmatch import edit1_join

    left = spark.createDataFrame(
        [(1, "abc"), (2, "ab"), (3, "xyz"), (4, "")],
        "lid int, ls string",
    )
    right = spark.createDataFrame(
        [(10, "abc"),   # equal → dist 0
         (11, "abd"),   # substitution → 1
         (12, "abcd"),  # insertion → 1
         (13, "ba"),    # "ab" vs "ba": shares deletion keys, dist 2 → filtered
         (14, "a")],    # "ab" minus b → 1; "" plus a → 1
        "rid int, rs string",
    )
    got = sorted(
        (r.lid, r.rid, r.dist)
        for r in edit1_join(left, right, "lid", "ls", "rid", "rs").collect()
    )
    assert got == [
        (1, 10, 0), (1, 11, 1), (1, 12, 1),
        (2, 10, 1), (2, 11, 1), (2, 14, 1),
        (4, 14, 1),
    ]


def test_edit1_join_plan_is_equi_not_cross(spark):
    from db_factfinder_spark.llmdata.strmatch import edit1_join

    l = spark.createDataFrame([(1, "aa")], "lid int, ls string")
    r = spark.createDataFrame([(2, "ab")], "rid int, rs string")
    plan = edit1_join(l, r, "lid", "ls", "rid", "rs") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_budget_fill_maximal_prefix(spark):
    from db_factfinder_spark.llmdata.sampling import budget_fill

    df = spark.createDataFrame(
        [("a", 1, 40), ("a", 2, 50), ("a", 3, 20), ("a", 4, 5),
         ("b", 5, 200)],
        "g string, id int, sz int",
    )
    kept = budget_fill(df, ["g"], [F.col("id")], "sz", budget=100)
    got = {(r.g, r.id): r.cum_size for r in kept.collect()}
    # a: 40, 90 fit; id=3 → 110 overflows and everything after is out
    # (prefix semantics: id=4 would fit alone but is after the cut)
    assert got == {("a", 1): 40, ("a", 2): 90}
    # a group whose first row already overflows keeps nothing
    assert ("b", 5) not in got


def test_hll_distinct_ignores_nulls(spark):
    from db_factfinder_spark.llmdata.sketches import hll_distinct

    with_nulls = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2), ("g", None)],
        "g string, v int",
    )
    without = spark.createDataFrame(
        [("g", 1), ("g", 2)], "g string, v int"
    )
    a = hll_distinct(with_nulls, ["g"], "v").collect()[0]
    b = hll_distinct(without, ["g"], "v").collect()[0]
    # count_distinct semantics: NULLs contribute nothing
    assert (a.n_buckets, a.hll_raw) == (b.n_buckets, b.hll_raw)
    # an all-NULL group vanishes (0 distinct), it doesn't yield NULL
    all_null = spark.createDataFrame([("g", None)], "g string, v int")
    assert hll_distinct(all_null, ["g"], "v").count() == 0


def test_triangle_counts_known_graphs(spark):
    from db_factfinder_spark.llmdata.components import triangle_counts

    # K4 on {1,2,3,4}: every node sits in C(3,2)=3 triangles;
    # a star 10-(11,12,13) has none; edge 20-21 is triangle-free
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    star = [(10, 11), (10, 12), (10, 13)]
    edges = spark.createDataFrame(
        k4 + star + [(20, 21)], "id_a int, id_b int"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # duplicate edges don't double-count
    dup = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 2)], "id_a int, id_b int"
    )
    got2 = {r.node: r.n_triangles for r in triangle_counts(dup).collect()}
    assert got2 == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_bidirectional_edges(spark):
    """An undirected edge arriving in BOTH orientations (and with
    self-loops) must count each triangle exactly once."""
    from db_factfinder_spark.llmdata.components import triangle_counts

    sym = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (2, 2)]
    edges = spark.createDataFrame(sym, "id_a int, id_b int")
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


# ------------------------------------------------------ prefix filtering
def test_prefix_filter_matches_bruteforce(spark, docs):
    """AllPairs must reproduce the quadratic jaccard_pairs answer
    EXACTLY (same pairs, same jaccard values) on the real corpus."""
    from db_factfinder_spark.llmdata.dedup import prefix_filter_pairs

    brute = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, n=3, threshold=0.6).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_pairs(docs, n=3, threshold=0.6).collect()
    }
    assert fast == brute and len(brute) > 0


def test_prefix_filter_no_false_negative_boundary(spark):
    """A pair sitting exactly AT the threshold must survive the prefix
    index (the ⌈τ·n⌉ ceiling is where off-by-ones live)."""
    from db_factfinder_spark.llmdata.dedup import prefix_filter_pairs

    # 6 tokens → 4 trigram shingles each, 3 shared → J = 3/5 = 0.6
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
        ],
        "doc_id long, text string",
    )
    out = prefix_filter_pairs(df, n=3, threshold=0.6).collect()
    assert len(out) == 1 and abs(out[0]["jaccard"] - 0.6) < 1e-12


# ------------------------------------------------------ line-level dedup
def test_line_dedup_strips_boilerplate(spark):
    from db_factfinder_spark.llmdata.lines import line_dedup

    df = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique body one\n\nfooter text"),
            (2, "cookie banner\nunique body two\nfooter text"),
            (3, "all original\ncontent here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, max_docs=2).collect()}
    # banner (case-insensitive) + footer occur in 2 docs → dropped;
    # blank line kept; body survives
    assert out[1]["clean_text"] == "unique body one\n"
    assert out[1]["n_lines"] == 4 and out[1]["n_dropped"] == 2
    assert out[2]["clean_text"] == "unique body two"
    assert out[3]["clean_text"] == "all original\ncontent here"
    assert out[3]["n_dropped"] == 0
    assert out[4]["clean_text"] is None and out[4]["n_lines"] == 0


def test_line_dedup_within_doc_repeat_kept(spark):
    """A line repeated many times WITHIN one document is not
    boilerplate (distinct-doc count = 1) — it must survive."""
    from db_factfinder_spark.llmdata.lines import line_dedup

    df = spark.createDataFrame(
        [(1, "echo\necho\necho"), (2, "other stuff")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, max_docs=2).collect()}
    assert out[1]["clean_text"] == "echo\necho\necho"
    assert out[1]["n_dropped"] == 0


def test_line_dedup_all_dropped_yields_empty_string(spark):
    from db_factfinder_spark.llmdata.lines import line_dedup

    df = spark.createDataFrame(
        [(1, "same line"), (2, "same line"), (3, "same line")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, max_docs=2).collect()}
    assert all(out[i]["clean_text"] == "" for i in (1, 2, 3))
    assert all(out[i]["n_dropped"] == 1 for i in (1, 2, 3))


# ------------------------------------------------------- span removal
def test_remove_duplicated_spans_cross_doc(spark):
    from db_factfinder_spark.llmdata.dedup import remove_duplicated_spans

    shared = "one two three four five six seven eight"  # exactly 8 tokens
    df = spark.createDataFrame(
        [
            (1, f"{shared} unique tail one"),
            (2, f"{shared} other ending here"),
            (3, "completely different text entirely"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, n=8).collect()}
    # the shared 8-gram occurs twice → its 8 tokens vanish from both
    assert out[1]["clean_text"] == "unique tail one"
    assert out[1]["n_removed"] == 8 and out[1]["n_tokens"] == 11
    assert out[2]["clean_text"] == "other ending here"
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "completely different text entirely"
    assert out[4]["clean_text"] is None and out[4]["n_tokens"] == 0


def test_remove_duplicated_spans_within_doc_repeat(spark):
    from db_factfinder_spark.llmdata.dedup import remove_duplicated_spans

    # the same 8-gram twice INSIDE one doc also counts (corpus count 2)
    eight = "a b c d e f g h"
    df = spark.createDataFrame(
        [(1, f"{eight} X {eight}"), (2, "nothing shared with anyone")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, n=8).collect()}
    assert out[1]["clean_text"] == "x"
    assert out[1]["n_removed"] == 16


def test_remove_duplicated_spans_short_docs_untouched(spark):
    from db_factfinder_spark.llmdata.dedup import remove_duplicated_spans

    df = spark.createDataFrame(
        [(1, "short doc"), (2, "short doc")],  # < 8 tokens → no grams
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, n=8).collect()}
    assert out[1]["n_removed"] == 0 and out[1]["clean_text"] == "short doc"


# ---------------------------------------------------- integer pagerank
def test_integer_pagerank_hand_computed_path(spark):
    from db_factfinder_spark.llmdata.components import integer_pagerank

    # path 1-2-3; degrees 1,2,1; one iteration by hand (scale 1e12):
    # c = p//deg = [1e12, 5e11, 1e12]
    # s(1) = c(2) = 5e11 ; s(2) = c(1)+c(3) = 2e12 ; s(3) = 5e11
    # p' = 15e10 + 85*s//100 → [575e9, 1850e9, 575e9]
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["node"]: r["p"] for r in integer_pagerank(df, iters=1).collect()}
    assert got == {1: 575_000_000_000, 2: 1_850_000_000_000, 3: 575_000_000_000}


def test_integer_pagerank_partition_invariant_and_mass_bounded(spark):
    from db_factfinder_spark.llmdata.components import integer_pagerank
    import random

    rng = random.Random(3)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    df = spark.createDataFrame(
        [e for e in edges if e[0] != e[1]], "src long, dst long"
    )
    a = sorted(map(tuple, integer_pagerank(df.repartition(1), iters=3).collect()))
    b = sorted(map(tuple, integer_pagerank(df.repartition(16), iters=3).collect()))
    assert a == b and len(a) > 0
    # total mass stays ≈ |V|·scale (floor losses only shrink it)
    total = sum(p for _, p in a)
    assert total <= len(a) * 1_000_000_000_000
    assert total >= len(a) * 900_000_000_000


# ------------------------------------------------- temperature mixture
def test_temperature_mixture_shrinks_big_domains(spark):
    import __spark_entry__ as E

    out = {
        r["domain"]: r
        for r in E.queries()["q138_temperature_mixture"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # domain '1' holds src1 + src10..19 (11 sources) — the big one
    big, small = out["1"], out["2"]
    assert big["n_orig"] > small["n_orig"]
    assert big["thr"] < small["thr"] == 10_000  # smallest keeps all
    assert big["n_kept"] < big["n_orig"]


def test_prefix_filter_threshold_sweep_matches_bruteforce(spark):
    """The ⌈τ·n⌉ prefix arithmetic and the PPJoin bounds must hold at
    every threshold shape (ceil boundaries differ per τ) — sweep τ
    over one random corpus and demand exact agreement each time."""
    import random

    from db_factfinder_spark.llmdata.dedup import (
        jaccard_pairs,
        prefix_filter_pairs,
    )

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(6, 30))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for tau in (0.3, 0.5, 0.6, 0.8, 0.95):
        brute = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_pairs(df, n=3, threshold=tau).collect()
        }
        fast = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in prefix_filter_pairs(df, n=3, threshold=tau).collect()
        }
        assert fast == brute, f"tau={tau}: {len(fast)} vs {len(brute)}"


# ---------------------------------------------------------------------
# Count–Min sketch (q146)
# ---------------------------------------------------------------------

def test_countmin_never_undercounts_and_is_bounded(spark):
    from db_factfinder_spark.llmdata.sketches import (
        countmin_estimate,
        countmin_partials,
    )

    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 7 + ["b"] * 3 + ["c"] * 1 + [None]],
        "k string",
    )
    sketch = countmin_partials(df, "k", depth=4, width=8)
    # sketch is bounded by depth*width counters and its mass is
    # depth × (non-null rows)
    rows = sketch.collect()
    assert len(rows) <= 4 * 8
    assert sum(r["__cnt"] for r in rows) == 4 * 11
    keys = df.filter(F.col("k").isNotNull()).groupBy("k").count()
    est = countmin_estimate(keys, sketch, "k", depth=4, width=8)
    merged = {r["k"]: r["cm_est"] for r in est.collect()}
    exact = {r["k"]: r["count"] for r in keys.collect()}
    for k, n in exact.items():
        assert merged[k] >= n  # CMS guarantee: only over-counts


def test_countmin_composes_under_union(spark):
    from db_factfinder_spark.llmdata.sketches import countmin_partials

    a = spark.createDataFrame([("x",), ("y",), ("x",)], "k string")
    b = spark.createDataFrame([("y",), ("z",)], "k string")
    direct = countmin_partials(a.unionAll(b), "k", depth=2, width=4)
    merged = (
        countmin_partials(a, "k", depth=2, width=4)
        .unionAll(countmin_partials(b, "k", depth=2, width=4))
        .groupBy("__row", "__bucket")
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


# ---------------------------------------------------------------------
# Priority sampling (q147)
# ---------------------------------------------------------------------

def test_priority_sample_small_population_degenerates_to_census(spark):
    from db_factfinder_spark.llmdata.sampling import priority_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id int, w int"
    )
    out = priority_sample(df, "id", "w", k=5).collect()
    # n ≤ k: everything kept, τ = 0, estimator is the true weight
    assert len(out) == 3
    assert all(r["est"] == float(r["w"]) for r in out)


def test_priority_sample_partition_invariant_and_dominates_weight(spark):
    from db_factfinder_spark.llmdata.sampling import priority_sample

    rows = [(i, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, w int")
    a = priority_sample(df, "id", "w", k=20).collect()
    b = priority_sample(df.repartition(13), "id", "w", k=20).collect()
    assert sorted(r["id"] for r in a) == sorted(r["id"] for r in b)
    assert len(a) == 20
    # estimator never falls below the item's true weight
    assert all(r["est"] >= r["w"] for r in a)


# ---------------------------------------------------------------------
# Simpson diversity (q148)
# ---------------------------------------------------------------------

def test_token_diversity_hand_computed(spark):
    from db_factfinder_spark.llmdata.textstats import token_diversity

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "x x x x"), (3, None)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in token_diversity(df).collect()}
    r1 = out[1]  # counts {a:2, b:1}: n=3, Σc²=5
    assert (r1["n_tokens"], r1["n_distinct"], r1["sum_c2"]) == (3, 2, 5)
    assert r1["simpson"] == 5.0 / 9.0
    assert r1["eff_vocab"] == 9.0 / 5.0
    r2 = out[2]  # degenerate: one token owns the mass
    assert r2["simpson"] == 1.0 and r2["eff_vocab"] == 1.0
    assert 3 not in out  # NULL text has no tokens — excluded


# ---------------------------------------------------------------------
# BM25 (q149)
# ---------------------------------------------------------------------

def test_bm25_ranks_density_and_coverage(spark):
    from db_factfinder_spark.llmdata.textstats import bm25_search

    df = spark.createDataFrame(
        [
            (1, "spark join spark join"),        # both terms, dense, short
            (2, "spark " + "filler " * 50),       # one term, long
            (3, "join plans and join hints " + "pad " * 20),
            (4, "nothing relevant here"),
        ],
        "doc_id int, text string",
    )
    out = bm25_search(df, ["spark", "join"], k=10)
    rows = out.collect()
    ids = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    # doc 4 has no query term — no postings, absent from the result
    assert 4 not in ids
    # the short dense doc with BOTH terms wins
    assert ids[0] == 1
    hit = {r["doc_id"]: r["n_terms_hit"] for r in rows}
    assert hit[1] == 2 and hit[2] == 1 and hit[3] == 1


def test_bm25_length_normalization(spark):
    from db_factfinder_spark.llmdata.textstats import bm25_search

    # same tf for the single query term; the longer document must
    # score strictly lower (b > 0 length penalty)
    df = spark.createDataFrame(
        [
            (1, "spark runs fast"),
            (2, "spark " + "and much other prose goes on " * 10),
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r["score"]
        for r in bm25_search(df, ["spark"], k=10).collect()
    }
    assert rows[1] > rows[2]


# ---------------------------------------------------------------------
# Collocation lift (q150)
# ---------------------------------------------------------------------

def test_collocation_lift_hand_computed(spark):
    from db_factfinder_spark.llmdata.textstats import collocation_lift

    # 4 docs: (a,b) always co-occur (lift 4·2/(2·2)=2);
    # (a,c)/(b,c) never do; c pairs with d once.
    df = spark.createDataFrame(
        [
            (1, "a b"),
            (2, "a b"),
            (3, "c d"),
            (4, "c d"),
        ],
        "doc_id int, text string",
    )
    out = {
        (r["t1"], r["t2"]): r
        for r in collocation_lift(
            df, vocab_size=10, min_pair_count=2, k=10
        ).collect()
    }
    assert set(out) == {("a", "b"), ("c", "d")}
    ab = out[("a", "b")]
    assert (ab["c_pair"], ab["c1"], ab["c2"]) == (2, 2, 2)
    assert ab["lift"] == 2.0  # 2·4/(2·2)


def test_collocation_pair_space_is_vocab_bounded(spark):
    from db_factfinder_spark.llmdata.textstats import collocation_lift

    # one giant doc with 100 distinct tokens: with vocab_size=5 the
    # pair space is C(5,2)=10, not C(100,2)
    text = " ".join(f"tok{i:03d}" for i in range(100))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id int, text string"
    )
    out = collocation_lift(df, vocab_size=5, min_pair_count=2, k=100)
    assert out.count() == 10


# ---------------------------------------------------------------------
# Per-group priority sampling (q151)
# ---------------------------------------------------------------------

def test_priority_sample_per_group_independent_strata(spark):
    from db_factfinder_spark.llmdata.sampling import (
        priority_sample,
        priority_sample_per_group,
    )

    rows = [(i, "g1" if i < 100 else "g2", (i % 9) + 1) for i in range(150)]
    df = spark.createDataFrame(rows, "id int, g string, w int")
    out = priority_sample_per_group(df, "id", "w", "g", k=10).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    assert len(by_g["g1"]) == 10 and len(by_g["g2"]) == 10
    # each stratum's kept set equals an independent global sample of
    # that stratum alone (same priorities, same τ)
    solo = priority_sample(
        df.filter(F.col("g") == "g1").select("id", "w"), "id", "w", k=10
    ).collect()
    assert sorted(r["id"] for r in by_g["g1"]) == sorted(
        r["id"] for r in solo
    )
    assert sorted(r["est"] for r in by_g["g1"]) == sorted(
        r["est"] for r in solo
    )


def test_priority_sample_per_group_census_degeneracy(spark):
    from db_factfinder_spark.llmdata.sampling import (
        priority_sample_per_group,
    )

    df = spark.createDataFrame(
        [(1, "tiny", 5), (2, "tiny", 7)], "id int, g string, w int"
    )
    out = priority_sample_per_group(df, "id", "w", "g", k=10).collect()
    assert len(out) == 2
    assert all(r["est"] == float(r["w"]) for r in out)


# ---------------------------------------------------------------------
# Semantic dedup (q155)
# ---------------------------------------------------------------------

def test_semantic_dedup_drops_planted_neardup(spark):
    from db_factfinder_spark.llmdata.similarity import semantic_dedup

    # vec 10 ≈ vec 11 (cosine ~1); vec 20 orthogonal.  With k=2 the
    # near pair lands in one cluster; the higher id (11) is dropped.
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0]),
        (11, [0.999, 0.01, 0.0, 0.0]),
        (20, [0.0, 1.0, 0.0, 0.0]),
        (21, [0.0, 0.98, 0.2, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(df, k=2, iters=2, threshold=0.95).collect()}
    assert out[10] == 1 and out[11] == 0
    assert out[20] == 1 and out[21] == 0  # cos(20,21) ≈ 0.98 ≥ 0.95


def test_semantic_dedup_pairs_stay_within_clusters(spark):
    from db_factfinder_spark.llmdata.similarity import semantic_dedup

    # identical vectors in DIFFERENT dominant directions: k-means
    # separates them, so cross-cluster twins are NOT compared and
    # everything is kept at a threshold their cosine would fail anyway
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(df, k=2, iters=1, threshold=0.5).collect()}
    assert out == {1: 1, 2: 1}


# ---------------------------------------------------------------------
# BPE merge candidates (q156) / JL projection (q157)
# ---------------------------------------------------------------------

def test_bpe_merges_weighted_by_word_freq(spark):
    from db_factfinder_spark.llmdata.textstats import bpe_merge_candidates

    df = spark.createDataFrame(
        [("low lower",), ("low low newest",), ("a",)],
        "text string",
    )
    out = {(r["lhs"], r["rhs"]): r["pair_count"]
           for r in bpe_merge_candidates(df, k=10, min_count=2).collect()}
    # 'low'×3 + 'lower' → l-o 4, o-w 4; 'lower'+'newest' → w-e 1+1=2;
    # the 1-char word 'a' contributes nothing (and must not error)
    assert out[("l", "o")] == 4 and out[("o", "w")] == 4
    assert out[("w", "e")] == 2


def test_jl_projection_exact_signed_sums(spark):
    from db_factfinder_spark.llmdata.similarity import (
        jl_projection,
        jl_sign_matrix,
    )

    v = [float(i - 2) for i in range(4)]  # [-2,-1,0,1]; max|x|=2
    df = spark.createDataFrame(
        [(1, v)], "vec_id int, embedding array<double>"
    )
    row = jl_projection(df, out_dim=3, dim=4, seed="t").first()
    signs = jl_sign_matrix(3, 4, seed="t")
    scale = 2.0 / 127.0
    import math
    q = [math.floor(x / scale + 0.5) for x in v]
    expect = [sum(s * qi for s, qi in zip(signs[j], q)) for j in range(3)]
    assert list(row["proj"]) == expect
    assert row["q_self"] == sum(x * x for x in q)


# ---------------------------------------------------------------------
# HLL intersection (q158) / blocklist (q159)
# ---------------------------------------------------------------------

def test_hll_intersect_identities(spark):
    from db_factfinder_spark.llmdata.sketches import (
        hll_distinct,
        hll_intersect,
    )

    df = spark.createDataFrame(
        [(i, "a" if i < 60 else "b") for i in range(100)]
        + [(i, "b") for i in range(40, 60)],  # overlap 40..59
        "uid int, grp string",
    )
    row = hll_intersect(
        df, F.col("grp") == "a", F.col("grp") == "b", "uid"
    ).first()
    # slice estimates must equal the stand-alone per-group sketch
    solo = {
        r["grp"]: r["hll_raw"]
        for r in hll_distinct(df, ["grp"], "uid").collect()
    }
    assert row["est_a"] == solo["a"] and row["est_b"] == solo["b"]
    # inclusion–exclusion identity holds exactly by construction
    assert row["est_intersect"] == (
        row["est_a"] + row["est_b"] - row["est_union"]
    )
    # m=64 sketch on ~100 keys: coarse, but the overlap (truth 20 of
    # 100 union) must land in a sane band, and union ≤ a + b
    assert row["est_union"] <= row["est_a"] + row["est_b"]


def test_domain_blocklist_label_boundary(spark):
    from db_factfinder_spark.llmdata.redact import domain_blocklist_filter

    df = spark.createDataFrame(
        [
            (1, "ads.spam.com"),
            (2, "spam.com"),
            (3, "notspam.com"),   # must NOT match 'spam.com'
            (4, "spam.com.evil"), # suffix chain never yields 'spam.com'
            (5, None),
        ],
        "id int, dom string",
    )
    kept = domain_blocklist_filter(df, "dom", ["spam.com"])
    assert sorted(r["id"] for r in kept.collect()) == [3, 4, 5]
    allowed = domain_blocklist_filter(df, "dom", ["spam.com"], keep=True)
    assert sorted(r["id"] for r in allowed.collect()) == [1, 2]


def test_grouped_weighted_median_hand_computed(spark):
    from db_factfinder_spark.operators.median import (
        grouped_weighted_median,
    )

    df = spark.createDataFrame(
        [
            ("g", 10, 1), ("g", 20, 2), ("g", 30, 1),  # W=4, cum(20)=3 ≥ 2
            ("h", 5, 9), ("h", 100, 1),                # heavy low value
            ("z", 7, 0),                               # zero weight: excluded
            ("z", 9, 2),
        ],
        "k string, v int, w int",
    )
    out = {r["k"]: r for r in
           grouped_weighted_median(df, ["k"], "v", "w").collect()}
    assert (out["g"]["w_median"], out["g"]["w_total"]) == (20, 4)
    assert out["h"]["w_median"] == 5
    assert (out["z"]["w_median"], out["z"]["w_total"]) == (9, 2)


def test_components_star_matches_propagation_on_chain(spark):
    """The star contraction must land on the identical fixpoint as
    min-label propagation — exercised on the propagation-hostile
    shape (a long chain), plus a clique and a dangling leaf."""
    from db_factfinder_spark.llmdata.components import (
        connected_components,
        connected_components_star,
    )

    pairs = (
        [(i, i + 1) for i in range(30)]             # 31-node chain
        + [(100, 101), (101, 102), (100, 102)]      # triangle
        + [(15, 200)]                               # leaf off the chain
    )
    df = spark.createDataFrame(pairs, "id_a int, id_b int")
    star = sorted(
        map(tuple, connected_components_star(df).collect())
    )
    prop = sorted(
        map(tuple,
            connected_components(df, max_iter=40)
            .select("id", "label").collect())
    )
    assert star == prop
    assert all(lbl == 0 for _id, lbl in star if _id <= 30 or _id == 200)


def test_char_chunker_udtf_overlap_and_tail(spark):
    from db_factfinder_spark.llmdata.textstats import char_chunker_udtf

    spark.udtf.register("t_chunk", char_chunker_udtf(size=5, stride=3))
    rows = spark.sql(
        "SELECT * FROM t_chunk('abcdefgh')"
    ).collect()
    got = [(r["chunk_id"], r["start_pos"], r["piece"]) for r in rows]
    # 8 chars, size 5, stride 3: [abcde], [defgh] — second chunk
    # reaches the end, so no third
    assert got == [(0, 1, "abcde"), (1, 4, "defgh")]
    # empty string: one empty chunk (still one row per input)
    rows2 = spark.sql("SELECT * FROM t_chunk('')").collect()
    assert [(r["chunk_id"], r["piece"]) for r in rows2] == [(0, "")]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        char_chunker_udtf(size=3, stride=5)


def test_changed_buckets_localizes_mutations(spark):
    from db_factfinder_spark.operators.diff import (
        bucket_fingerprints,
        changed_buckets,
    )

    old = spark.createDataFrame(
        [(i, i * 10, "ok") for i in range(200)], "k int, v int, s string"
    )
    # mutate one row, drop one row, add one row
    new = (
        old.filter(F.col("k") != 7)
        .withColumn(
            "v", F.when(F.col("k") == 13, F.lit(-1)).otherwise(F.col("v"))
        )
        .unionByName(
            spark.createDataFrame([(9999, 1, "new")], "k int, v int, s string")
        )
    )
    out = changed_buckets(old, new, "k", ["v", "s"], buckets=32).collect()
    # ≤ 3 buckets can disagree (one per touched key, maybe colliding)
    assert 1 <= len(out) <= 3
    # identical snapshots produce NO disagreeing buckets
    same = changed_buckets(old, old, "k", ["v", "s"], buckets=32)
    assert same.count() == 0
    # incrementality: xor of row-hash in == xor out (self-inverse)
    fp = {r["bucket"]: r["fp"] for r in
          bucket_fingerprints(old, "k", ["v", "s"], 32).collect()}
    fp2 = {r["bucket"]: r["fp"] for r in
           bucket_fingerprints(old.unionByName(old), "k", ["v", "s"], 32)
           .collect()}
    assert all(v == 0 for v in fp2.values())  # every hash xors itself out
    assert fp.keys() == fp2.keys()


def test_association_rules_hand_computed(spark):
    from db_factfinder_spark.operators.basket import association_rules

    # 4 baskets: {a,b} ×3, {a,c} ×1 → a:4, b:3, c:1 baskets
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "b int, i string")
    out = {(r["antecedent"], r["consequent"]): r
           for r in association_rules(df, "b", "i", min_support=2, k=10)
           .collect()}
    # c is pruned (1 < min_support): no a→c / c→a rule
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    assert ab["support"] == 3 and ab["n_ante"] == 4 and ab["n_cons"] == 3
    assert ab["confidence"] == 3.0 / 4.0
    assert ab["lift"] == (3 * 4) / (4 * 3)  # = 1.0
    ba = out[("b", "a")]
    assert ba["confidence"] == 1.0 and ba["lift"] == 1.0


def test_rfm_scores_direction_and_coding(spark):
    from db_factfinder_spark.operators.basket import rfm_scores

    # 10 customers with strictly increasing recency gaps, order
    # counts and spend — scores must track rank in each dimension
    rows = []
    for c in range(10):
        for o in range(c + 1):  # customer c has c+1 orders
            rows.append((c, f"2001-0{(c % 9) + 1}-15", (c + 1) * 1000))
    df = spark.createDataFrame(
        rows, "cust int, d string, amt int"
    ).select("cust", F.to_timestamp("d").alias("d"), "amt")
    out = {r["cust"]: r for r in
           rfm_scores(df, "cust", "d", "amt", "2001-12-31").collect()}
    # the heaviest/most frequent/most recent customer scores top
    assert out[8]["f_score"] == 5 and out[8]["m_score"] == 5
    assert out[0]["f_score"] == 1 and out[0]["m_score"] == 1
    # recency: customer 8 ordered latest (2001-09) → best r_score
    assert out[8]["r_score"] == 5
    assert out[0]["rfm"] == "111"
    assert all(1 <= out[c][s] <= 5 for c in out
               for s in ("r_score", "f_score", "m_score"))


def test_containment_asymmetry_vs_jaccard(spark):
    """A short excerpt fully inside a long page: containment from the
    excerpt side ≈ 1 (pair found), Jaccard tiny (prefix_filter_pairs
    must NOT find it at the same threshold)."""
    from db_factfinder_spark.llmdata.dedup import (
        containment_pairs,
        prefix_filter_pairs,
    )

    base = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(10, 20))
    df = spark.createDataFrame(
        [(1, base), (2, excerpt), (3, "totally different text here ok")],
        "doc_id int, text string",
    )
    cont = {(r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs(df, n=3, threshold=0.9).collect()}
    assert (2, 1) in cont and cont[(2, 1)] == 1.0   # excerpt ⊂ page
    assert (1, 2) not in cont                        # page ⊄ excerpt
    jac = prefix_filter_pairs(df, n=3, threshold=0.9).collect()
    assert not [r for r in jac if {r["id_a"], r["id_b"]} == {1, 2}]


def test_rolling_hll_merges_window_days(spark):
    from db_factfinder_spark.llmdata.sketches import (
        hll_distinct,
        rolling_hll_distinct,
    )

    # day1: users 0-49, day2: 50-99, day9: 0-9.  2-day window on day2
    # must equal a direct sketch of the union 0-99; day9 stands alone.
    rows = (
        [(u, "2024-01-01 10:00:00") for u in range(50)]
        + [(u, "2024-01-02 10:00:00") for u in range(50, 100)]
        + [(u, "2024-01-09 10:00:00") for u in range(10)]
    )
    df = spark.createDataFrame(rows, "uid int, t string").select(
        "uid", F.to_timestamp("t").alias("t")
    )
    out = {r["day"].isoformat(): r for r in
           rolling_hll_distinct(df, "t", "uid", window_days=2).collect()}
    direct_union = (
        hll_distinct(df.filter("t < '2024-01-03'").withColumn("g", F.lit(1)),
                     ["g"], "uid").first()["hll_raw"]
    )
    assert out["2024-01-02"]["hll_raw"] == direct_union
    direct_day9 = (
        hll_distinct(df.filter("t > '2024-01-08'").withColumn("g", F.lit(1)),
                     ["g"], "uid").first()["hll_raw"]
    )
    assert out["2024-01-09"]["hll_raw"] == direct_day9


def test_shuffle_shards_reproducible_permutation(spark):
    from db_factfinder_spark.llmdata.sampling import shuffle_shards

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(500)], "doc_id int, text string"
    )
    a = {(r["doc_id"]): (r["shard"], r["shard_rank"])
         for r in shuffle_shards(df, "doc_id", 8).collect()}
    b = {(r["doc_id"]): (r["shard"], r["shard_rank"])
         for r in shuffle_shards(df.repartition(13), "doc_id", 8).collect()}
    assert a == b  # layout-independent permutation
    # ranks are contiguous 1..n within every shard
    by_shard = {}
    for doc, (s, r) in a.items():
        by_shard.setdefault(s, []).append(r)
    for s, ranks in by_shard.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # and it is a permutation: every doc appears exactly once
    assert len(a) == 500


def test_normalize_urls_collides_spellings(spark):
    from db_factfinder_spark.llmdata.urls import normalize_urls

    df = spark.createDataFrame(
        [
            (1, "HTTP://WWW.Example.COM:80/a/b/?q=1#x"),
            (2, "http://example.com/a/b"),
            (3, "https://sub.shop.example.com:8443/c"),
            (4, "not a url"),
        ],
        "id int, url string",
    )
    out = {r["id"]: r for r in normalize_urls(df).collect()}
    # two spellings of one page collide on the canonical key
    assert out[1]["url_norm"] == out[2]["url_norm"] == "http://example.com/a/b"
    assert out[1]["site"] == "example.com"
    r3 = out[3]
    assert r3["host"] == "sub.shop.example.com"
    assert r3["site"] == "example.com"
    assert r3["url_norm"] == "https://sub.shop.example.com:8443/c"
    # unparseable input surfaces as NULLs, not guesses
    assert out[4]["scheme"] is None and out[4]["url_norm"] is None


def test_chi_square_known_tables(spark):
    from db_factfinder_spark.operators.regression import (
        chi_square_independence,
    )

    # perfectly independent 2×2 (all cells 25): chi2 = 0
    rows = [("x", "u")] * 25 + [("x", "v")] * 25 \
        + [("y", "u")] * 25 + [("y", "v")] * 25
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square_independence(df, "a", "b").collect()
    assert all(r["chi2"] == 0.0 for r in out)
    assert out[0]["dof"] == 1 and out[0]["n"] == 100
    # maximally dependent 2×2 (diagonal): chi2 = n
    rows2 = [("x", "u")] * 30 + [("y", "v")] * 30
    df2 = spark.createDataFrame(rows2, "a string, b string")
    out2 = chi_square_independence(df2, "a", "b").collect()
    assert all(r["chi2"] == 60.0 for r in out2)


def test_grouped_weighted_quantiles_consistent_with_median(spark):
    from db_factfinder_spark.operators.median import (
        grouped_weighted_median,
        grouped_weighted_quantiles,
    )

    df = spark.createDataFrame(
        [("g", v, w) for v, w in [(10, 1), (20, 2), (30, 1), (40, 4)]],
        "k string, v int, w int",
    )
    out = grouped_weighted_quantiles(
        df, ["k"], "v", "w", [0.25, 0.5, 0.9]
    ).first()
    med = grouped_weighted_median(df, ["k"], "v", "w").first()
    assert out["q50"] == med["w_median"]
    # W=8: cum(10)=1, cum(20)=3, cum(30)=4, cum(40)=8
    assert out["q25"] == 20   # first cum ≥ 2
    assert out["q90"] == 40   # first cum ≥ 7.2
    assert out["w_total"] == 8


def test_ab_test_summary_known_split(spark):
    from db_factfinder_spark.operators.regression import ab_test_summary

    # constant values per arm: variance 0 in each arm would make t
    # infinite, so vary one value; verify arms are stable and the
    # sufficient statistics land in the right columns
    df = spark.createDataFrame(
        [(i, 100 + (i % 3)) for i in range(400)], "uid int, v int"
    )
    row = ab_test_summary(df, "uid", "v", salt="s1").first()
    assert row["n_a"] + row["n_b"] == 400
    assert abs(row["mean_a"] - 101.0) < 1.5 and abs(row["mean_b"] - 101.0) < 1.5
    # same salt → identical assignment on re-run; new salt → different
    again = ab_test_summary(df, "uid", "v", salt="s1").first()
    assert (row["n_a"], row["mean_a"]) == (again["n_a"], again["mean_a"])
    other = ab_test_summary(df, "uid", "v", salt="s2").first()
    assert other["n_a"] != row["n_a"] or other["mean_a"] != row["mean_a"]


# ---------------------------------------------------------------------
# Round-4 edge-case robustness (ANSI mode: degenerate inputs must
# yield empty/NULL results, never runtime errors)
# ---------------------------------------------------------------------

def test_round4_ops_survive_degenerate_inputs(spark):
    from db_factfinder_spark.llmdata.dedup import containment_pairs
    from db_factfinder_spark.llmdata.sampling import (
        priority_sample,
        shuffle_shards,
    )
    from db_factfinder_spark.llmdata.textstats import (
        bm25_search,
        bpe_merge_candidates,
        collocation_lift,
        token_diversity,
    )
    from db_factfinder_spark.operators.median import (
        grouped_weighted_median,
    )

    empty_docs = spark.createDataFrame([], "doc_id int, text string")
    nulls = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id int, text string"
    )
    for frame in (empty_docs, nulls):
        assert bm25_search(frame, ["x", "y"]).count() == 0
        assert token_diversity(frame).count() == 0
        assert collocation_lift(frame).count() == 0
        assert bpe_merge_candidates(frame).count() == 0
        assert containment_pairs(frame).count() == 0
    # all-zero weights: no rows qualify, empty result (not div-by-zero)
    zw = spark.createDataFrame([("g", 1, 0)], "k string, v int, w int")
    assert grouped_weighted_median(zw, ["k"], "v", "w").count() == 0
    # empty population: priority sample and shards are empty
    ep = spark.createDataFrame([], "id int, w int")
    assert priority_sample(ep, "id", "w", k=5).count() == 0
    assert shuffle_shards(ep, "id").count() == 0


def test_benford_perfect_and_skewed(spark):
    import math

    from db_factfinder_spark.operators.quality import benford_digit_test

    # values engineered to hit each digit proportionally to Benford
    # (1000 draws quantized) → tiny chi2; all-1-leading values → huge
    rows = []
    for d in range(1, 10):
        k = round(1000 * math.log10(1 + 1 / d))
        rows += [(float(d),)] * k
    df = spark.createDataFrame(rows, "v double")
    near = benford_digit_test(df, "v", scale=100).first()["chi2"]
    ones = spark.createDataFrame([(1.23,)] * 500, "v double")
    far = benford_digit_test(ones, "v", scale=100).first()["chi2"]
    assert near < 1.0 < far
    # absent digits still carry expected mass (9 rows always)
    assert benford_digit_test(ones, "v", scale=100).count() == 9


def test_grid_distance_pairs_matches_bruteforce(spark):
    from db_factfinder_spark.operators.spatial import grid_distance_pairs

    import itertools
    import random

    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 400), rng.randrange(0, 400))
           for i in range(120)]
    df = spark.createDataFrame(pts, "id int, x int, y int")
    r = 60
    got = {(a, b): d for a, b, d in
           grid_distance_pairs(df, "id", "x", "y", radius=r).collect()}
    want = {}
    for (i, xi, yi), (j, xj, yj) in itertools.combinations(pts, 2):
        d2 = (xi - xj) ** 2 + (yi - yj) ** 2
        if d2 <= r * r:
            want[(min(i, j), max(i, j))] = d2
    assert got == want
    # boundary exactness: distance exactly r is INCLUDED
    df2 = spark.createDataFrame(
        [(1, 0, 0), (2, 60, 0), (3, 61, 0)], "id int, x int, y int"
    )
    out2 = {(a, b) for a, b, _ in
            grid_distance_pairs(df2, "id", "x", "y", radius=60).collect()}
    assert (1, 2) in out2 and (1, 3) not in out2
    # cell < radius is rejected (would drop cross-cell pairs)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        grid_distance_pairs(df2, "id", "x", "y", radius=60, cell=30)


def test_admit_new_documents_statuses(spark):
    from db_factfinder_spark.llmdata.dedup import admit_new_documents

    base = " ".join(f"tok{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(0, base), (2, "completely unrelated corpus text here")],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),                                    # byte-identical
            (3, base.replace("tok7", "zzz")),             # near-dup
            (5, "fresh material nothing shares shingles"),
            (7, None),                                    # NULL text
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["status"] for r in
           admit_new_documents(corpus, new, max_bucket=None).collect()}
    assert out[1] == "exact_dup"
    assert out[3] == "near_dup"
    assert out[5] == "admitted"
    assert out[7] == "admitted"
    assert len(out) == 4  # every newcomer classified exactly once


def test_admission_state_path_matches_bootstrap(spark):
    """The persisted-state path (build_corpus_state + corpus_state=)
    must be answer-identical to the bootstrap path — that equality IS
    the incremental-ingest contract q178 pins against the oracle."""
    from db_factfinder_spark.llmdata.dedup import (
        admit_new_documents,
        build_corpus_state,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(0, base), (2, "completely unrelated corpus text here")],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),
            (3, base.replace("tok7", "zzz")),
            (5, "fresh material nothing shares shingles"),
            (7, None),
        ],
        "doc_id int, text string",
    )
    boot = {r["doc_id"]: r["status"] for r in
            admit_new_documents(corpus, new, max_bucket=None).collect()}
    state = build_corpus_state(corpus, max_bucket=None)
    via_state = {r["doc_id"]: r["status"] for r in
                 admit_new_documents(
                     corpus, new, max_bucket=None, corpus_state=state
                 ).collect()}
    assert via_state == boot
    # parameters travel with the state: probe hashing uses the state's
    # (num_hashes, bands, n), so a mismatched call-site default can't
    # silently split buckets
    state2 = build_corpus_state(
        corpus, num_hashes=16, bands=8, max_bucket=None
    )
    via_state2 = {r["doc_id"]: r["status"] for r in
                  admit_new_documents(
                      corpus, new, max_bucket=None, corpus_state=state2
                  ).collect()}
    assert via_state2[1] == "exact_dup" and via_state2[7] == "admitted"


def test_union_corpus_state_equals_rebuild(spark):
    """Delta-grown state never drifts from a rebuild:
    union_corpus_state(build(A), B) is row-identical to build(A ∪ B)
    on both frames — so a corpus ingested batch-by-batch over months
    classifies newcomers exactly like a from-scratch re-index would."""
    from db_factfinder_spark.llmdata.dedup import (
        build_corpus_state,
        union_corpus_state,
    )

    base = " ".join(f"w{i}" for i in range(25))
    a = spark.createDataFrame(
        [(0, base), (2, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id int, text string",
    )
    b = spark.createDataFrame(
        [(4, base.replace("w3", "q")), (6, None),
         (8, "one two three four five six seven eight")],
        "doc_id int, text string",
    )
    grown = union_corpus_state(build_corpus_state(a, max_bucket=None), b,
                               max_bucket=None)
    rebuilt = build_corpus_state(a.union(b), max_bucket=None)
    assert sorted(r["fp"] for r in grown.fingerprints.collect()) == \
        sorted(r["fp"] for r in rebuilt.fingerprints.collect())
    key = lambda r: (r["id"], r["band"], r["bucket"])  # noqa: E731
    assert sorted(map(key, grown.band_keys.collect())) == \
        sorted(map(key, rebuilt.band_keys.collect()))
    assert (grown.num_hashes, grown.bands, grown.n) == \
        (rebuilt.num_hashes, rebuilt.bands, rebuilt.n)


def test_surprisal_score_flat_and_skewed(spark):
    """Flat corpus (every token unique) scores the vocabulary size for
    every doc; a doc of the corpus's most common token scores the
    minimum; token-less docs are excluded."""
    from db_factfinder_spark.llmdata.textstats import surprisal_score

    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd"), (3, None)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in surprisal_score(df).collect()}
    assert set(out) == {1, 2}
    # 4 occurrences, each c_w=1 → N/c_w = 4 for every token
    assert out[1]["surprisal"] == 4.0 and out[2]["surprisal"] == 4.0
    df2 = spark.createDataFrame(
        [(1, "x x x"), (2, "x y")], "doc_id int, text string"
    )
    o2 = {r["doc_id"]: r["surprisal"] for r in surprisal_score(df2).collect()}
    # N=5, c_x=4, c_y=1: doc1 = 5/4; doc2 = (5/4 + 5)/2
    assert o2[1] == 1.25 and o2[2] == 3.125


def test_temperature_allocation_exact_budget(spark):
    """Σ alloc == budget exactly; sqrt weighting gives the tail more
    than proportional share; largest-remainder ties break by name."""
    from db_factfinder_spark.llmdata.sampling import temperature_allocation

    rows = [(i, "big") for i in range(900)] + [(i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    out = {r["source"]: r for r in
           temperature_allocation(df, "source", budget=100).collect()}
    assert out["big"]["alloc"] + out["small"]["alloc"] == 100
    # proportional would give small 10; sqrt temperature gives it 25
    assert out["small"]["alloc"] == 25
    # degenerate: one domain takes the whole budget
    one = spark.createDataFrame([(1, "only")], "doc_id int, source string")
    (r,) = temperature_allocation(one, "source", budget=7).collect()
    assert r["alloc"] == 7


def test_vocabulary_drift_grid_is_complete(spark):
    """Every (domain, vocab-token) cell exists even when a domain
    never uses a token (zero cells contribute E to χ²), and the
    restricted vocabulary caps the grid width."""
    from db_factfinder_spark.operators.quality import vocabulary_drift_test

    df = spark.createDataFrame(
        [(1, "aa aa bb", "s1"), (2, "aa cc cc cc", "s2")],
        "doc_id int, text string, source string",
    )
    out = vocabulary_drift_test(df, top_v=2).collect()
    # vocab = top-2 by count: aa(3), cc(3) tie bb(1) → (count desc,
    # token asc) picks aa, cc; grid = 2 domains x 2 tokens
    cells = {(r["a"], r["b"]): r["n_obs"] for r in out}
    assert set(cells) == {("s1", "aa"), ("s1", "cc"), ("s2", "aa"), ("s2", "cc")}
    assert cells[("s1", "cc")] == 0 and cells[("s2", "cc")] == 3
    assert all(r["dof"] == 1 for r in out)


def test_count_anomalies_flags_spike_day(spark):
    """A 10x spike day is flagged; steady days are not; a key with
    zero variance flags nothing (threshold 0, |dev| 0)."""
    from datetime import datetime

    from db_factfinder_spark.operators.timeseries import count_anomalies

    rows = []
    for d in range(1, 22):
        # a lone spike among n steady days sits at sqrt(n-1)·sigma —
        # n = 21 puts it at sqrt(20) ≈ 4.47 sigma, clearly past k=3
        # (n = 10 would land EXACTLY on 3.0 and the strict > keeps it)
        n = 100 if d < 21 else 1000
        rows += [("click", datetime(2024, 1, d, 12, 0, 0))] * n
    for d in range(1, 6):
        rows += [("view", datetime(2024, 1, d, 9, 0, 0))] * 7  # flat
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {(r["event_type"], r["day"].day): r["is_anomaly"]
           for r in count_anomalies(df, k=3).collect()}
    assert out[("click", 21)] is True
    assert all(not v for k, v in out.items() if k != ("click", 21))


def test_grouped_mad_outliers_exact_counts(spark):
    """Median/MAD from the lower-median rule; |v − med| > k·MAD flags
    exactly the planted outlier; a constant group (MAD 0) flags every
    deviating row."""
    from db_factfinder_spark.operators.median import grouped_mad_outliers

    rows = [("a", v) for v in [10, 11, 12, 13, 14, 1000]] + [
        ("b", 5), ("b", 5), ("b", 5), ("b", 9)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in
           grouped_mad_outliers(df, ["g"], "v", k=3).collect()}
    # a: sorted 10..14,1000 → lower median 12; devs 2,1,0,1,2,988 →
    # MAD (lower median of 0,1,1,2,2,988) = 1; only 988 > 3
    assert out["a"]["med"] == 12 and out["a"]["mad"] == 1
    assert out["a"]["n_outliers"] == 1
    # b: median 5, MAD 0 → the single 9 deviates
    assert out["b"]["mad"] == 0 and out["b"]["n_outliers"] == 1


def test_dimensional_rollup_levels_and_totals(spark):
    """One pass produces finest cells, per-prefix subtotals, and the
    grand total; rolled-up slots read 'ALL'; measures are additive
    across levels."""
    from db_factfinder_spark.operators.rollup_cascade import (
        dimensional_rollup,
    )

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
        "d1 string, d2 string, v long",
    )
    out = {(r["d1"], r["d2"]): (r["level"], r["n"])
           for r in dimensional_rollup(
               df, ["d1", "d2"], {"n": F.sum("v")}).collect()}
    assert out[("a", "x")] == (0, 1) and out[("a", "y")] == (0, 2)
    assert out[("a", "ALL")] == (1, 3) and out[("b", "ALL")] == (1, 4)
    assert out[("ALL", "ALL")] == (3, 7)
    assert len(out) == 6  # 3 cells + 2 d1 subtotals + grand total


def test_rolling_daily_stats_gap_correct(spark):
    """The RANGE frame is time-bounded: a calendar gap larger than the
    window excludes old days (a ROWS frame would stretch across it)."""
    from datetime import datetime

    from db_factfinder_spark.operators.timeseries import rolling_daily_stats

    rows = (
        [("e", datetime(2024, 1, 1, 1))] * 10
        + [("e", datetime(2024, 1, 2, 1))] * 20
        # 12-day gap — outside any 7-day window
        + [("e", datetime(2024, 1, 14, 1))] * 30
    )
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["day"].day: (r["roll_sum"], r["roll_days"], r["roll_avg"])
           for r in rolling_daily_stats(df, window_days=7).collect()}
    assert out[1] == (10, 1, 10.0)
    assert out[2] == (30, 2, 15.0)
    assert out[14] == (30, 1, 30.0)  # gap excluded days 1-2


def test_cusum_detects_level_shift_z_test_misses(spark):
    """A quiet +2-per-day level shift over the second half never trips
    the per-day 3-sigma screen but integrates past the CUSUM decision
    interval — the exact separation the two operators exist for.  Also
    pins the closed form against the textbook recursion."""
    from datetime import datetime

    from db_factfinder_spark.operators.timeseries import (
        count_anomalies,
        cusum_drift,
    )

    rows = []
    counts = [10] * 15 + [12] * 15  # subtle shift at day 16
    for d, n in enumerate(counts, start=1):
        rows += [("e", datetime(2024, 1, d, 12))] * n
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    assert not any(
        r["is_anomaly"] for r in count_anomalies(df, k=3).collect()
    )
    out = sorted(
        cusum_drift(df, h=4).collect(), key=lambda r: r["day"]
    )
    assert any(r["drifted"] for r in out)
    # closed form == recursion max(0, S + d)
    n, s1 = 30, sum(counts)
    s = 0
    for r in out:
        s = max(0, s + r["c"] * n - s1)
        assert r["cusum_n"] == s, (r["day"], r["cusum_n"], s)


def test_stratified_split_exact_quotas_and_stability(spark):
    """Every stratum hits its integer quotas exactly (hash splits only
    approximate them), assignment is partition-invariant, and invalid
    percentages are rejected."""
    import pytest as _pytest

    from db_factfinder_spark.llmdata.sampling import stratified_split

    rows = [(i, "a") for i in range(17)] + [(1000 + i, "b") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_split(df, "source", "doc_id", 80, 10).collect()
    from collections import Counter

    by = Counter((r["source"], r["split"]) for r in out)
    # a: n=17 → train 13 (17*80//100), val 2 (17*90//100 − 13), test 2
    assert by[("a", "train")] == 13 and by[("a", "val")] == 2
    assert by[("a", "test")] == 2
    # b: n=5 → train 4, val 0 (5*90//100 = 4), test 1
    assert by[("b", "train")] == 4 and by[("b", "val")] == 0
    assert by[("b", "test")] == 1
    # partition-invariance: same assignment from a different layout
    out2 = stratified_split(
        df.repartition(7), "source", "doc_id", 80, 10
    ).collect()
    assert {(r["doc_id"], r["split"]) for r in out} == {
        (r["doc_id"], r["split"]) for r in out2
    }
    with _pytest.raises(ValueError):
        stratified_split(df, "source", "doc_id", 95, 10)


def test_grouped_correlation_exact_and_degenerate(spark):
    """Perfect linear relation gives r = 1 up to the two documented
    sqrt roundings (√6·√24 = 11.999999999999998, not 12 — the value is
    deterministic, which is the contract; exactly-1.0 is not);
    zero-variance groups yield NULL, never NaN."""
    from pyspark.sql import functions as F

    from db_factfinder_spark.operators.regression import grouped_correlation

    rows = [("a", 1, 2), ("a", 2, 4), ("a", 3, 6),
            ("b", 5, 1), ("b", 5, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r["r"] for r in
           grouped_correlation(df, ["g"], F.col("x"), F.col("y")).collect()}
    assert abs(out["a"] - 1.0) < 1e-12
    assert out["b"] is None


def test_pq_encode_toy_exact_with_tiebreak(spark):
    """Hand-computed codes on a 4-dim / m=2 toy: each subspace picks
    the nearest codeword by exact int squared distance, equal
    distances resolve to the LOWEST code, and recon_err is the sum of
    the two winning distances."""
    from db_factfinder_spark.llmdata.similarity import pq_encode

    # integer-friendly values: x*1e6 is exact
    corpus = spark.createDataFrame(
        [(0, [0.0, 0.0, 3.0, 3.0]),
         (1, [2.0, 2.0, 0.0, 0.0]),
         (2, [1.0, 1.0, 1.0, 1.0])],  # equidistant → code 0 both
        "vec_id long, embedding array<double>",
    )
    cb = spark.createDataFrame(
        [(0, [0, 0, 0, 0]),
         (1, [2_000_000, 2_000_000, 2_000_000, 2_000_000])],
        "code int, centroid array<long>",
    )
    out = {r["vec_id"]: r for r in
           pq_encode(corpus, cb, m=2).collect()}
    assert list(out[0]["codes"]) == [0, 1]
    assert list(out[1]["codes"]) == [1, 0]
    # vec 2: dist to code0 = 2*(1e6)^2, to code1 = 2*(1e6)^2 → tie → 0
    assert list(out[2]["codes"]) == [0, 0]
    m = 1_000_000
    assert out[0]["recon_err"] == 0 + 2 * m * m  # [3,3] vs [2,2]
    assert out[2]["recon_err"] == 4 * m * m


def test_pq_adc_equals_reconstructed_distance(spark, embs):
    """ADC distance computed from codes + literal codebook must equal
    the explicit squared distance between the probe's int vector and
    the neighbor's codeword-reconstructed vector (same integer domain
    — an exact equality, not a tolerance)."""
    import __spark_entry__ as em
    from db_factfinder_spark.llmdata.similarity import (
        int_quantized_vec,
        pq_adc_topk,
        pq_encode,
    )

    cb = em._pq_codebooks(embs)
    codes = pq_encode(embs, cb, m=8)
    probes = embs.filter(F.col("vec_id") < 3)
    out = pq_adc_topk(probes, codes, cb, m=8, k=500).collect()

    cb_rows = {r["code"]: list(r["centroid"]) for r in cb.collect()}
    code_rows = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    pvecs = {
        r["vec_id"]: list(r["vi"])
        for r in probes.select(
            "vec_id", int_quantized_vec(F.col("embedding")).alias("vi")
        ).collect()
    }
    assert len(out) == 3 * (codes.count() - 1)
    for r in out[:200]:
        pv = pvecs[r["probe_id"]]
        recon = []
        for s, c in enumerate(code_rows[r["neighbor_id"]]):
            recon.extend(cb_rows[c][s * 8:(s + 1) * 8])
        want = sum((a - b) * (a - b) for a, b in zip(pv, recon))
        assert r["adc_dist"] == want


def test_pq_encode_rejects_bad_m(spark):
    from db_factfinder_spark.llmdata.similarity import pq_encode

    corpus = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    cb = spark.createDataFrame(
        [(0, [0, 0, 0])], "code int, centroid array<long>"
    )
    with pytest.raises(ValueError):
        pq_encode(corpus, cb, m=2)


def test_kmv_merge_equals_direct_sketch(spark):
    """Merged per-shard KMV partials must be BIT-IDENTICAL to a direct
    sketch of the union — the algebraic-merge property that lets a
    warehouse persist per-day state.  Also: duplicate values across
    shards must not double-count (array_distinct in the merge)."""
    from db_factfinder_spark.llmdata.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_partials,
    )

    rows = [("g", i % 3, f"v{i % 500}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, shard int, v string")
    merged = kmv_merge(
        kmv_partials(df, ["g"], "v", k=32, shard_cols=["shard"]),
        ["g"],
        k=32,
    )
    direct = kmv_partials(df, ["g"], "v", k=32)
    assert merged.collect()[0]["kmins"] == direct.collect()[0]["kmins"]
    est = kmv_estimate(merged, k=32).collect()[0]
    # 500 distinct, k=32 → relative error well under 3/sqrt(k) ≈ 53%
    assert 0.5 * 500 < est["est_distinct"] < 1.5 * 500
    assert est["n_kept"] == 32


def test_kmv_small_group_is_exact(spark):
    from db_factfinder_spark.llmdata.sketches import (
        kmv_estimate,
        kmv_partials,
    )

    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", "a"), ("g", None)],
        "g string, v string",
    )
    out = kmv_estimate(kmv_partials(df, ["g"], "v", k=64), k=64).collect()
    assert out[0]["est_distinct"] == 2.0 and out[0]["n_kept"] == 2


def test_kmv_intersect_partial_overlap(spark):
    """A = {0..599}, B = {400..999} → |A∪B| = 1000, |A∩B| = 200,
    Jaccard 0.2: the ρ·|U| estimate must land within KMV error bounds,
    and the slice k-min sets must be full (n_a = n_b = k)."""
    from db_factfinder_spark.llmdata.sketches import kmv_intersect

    rows = [(f"v{i}", i < 600, i >= 400) for i in range(1000)]
    df = spark.createDataFrame(rows, "v string, a boolean, b boolean")
    out = kmv_intersect(
        df, F.col("a"), F.col("b"), "v", k=128
    ).collect()[0]
    assert out["n_a"] == 128 and out["n_b"] == 128
    assert out["n_union_kept"] == 128
    assert 700 < out["est_union"] < 1400
    assert 80 < out["est_intersect"] < 360
    # containment sanity: intersection never exceeds union estimate
    assert out["est_intersect"] <= out["est_union"]


def test_kmv_intersect_disjoint_and_exact(spark):
    from db_factfinder_spark.llmdata.sketches import kmv_intersect

    rows = [(f"x{i}", True, False) for i in range(10)] + [
        (f"y{i}", False, True) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "v string, a boolean, b boolean")
    out = kmv_intersect(df, F.col("a"), F.col("b"), "v", k=64).collect()[0]
    # below k everything is exact: union 20, intersection 0
    assert out["est_union"] == 20.0 and out["est_intersect"] == 0.0
    assert out["n_common"] == 0


def test_pq_adc_table_path_identical(spark, embs):
    """The driver-side distance-table path must be bit-identical to
    the per-pair expression path (same exact int64 distances)."""
    import __spark_entry__ as em
    from db_factfinder_spark.llmdata.similarity import (
        _collect_codebook,
        pq_adc_topk,
        pq_encode,
    )

    cb = _collect_codebook(em._pq_codebooks(embs))
    codes = pq_encode(embs, cb, m=8)
    probes = embs.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, pq_adc_topk(
        probes, codes, cb, m=8, k=7, table_probes=False).collect()))
    b = sorted(map(tuple, pq_adc_topk(
        probes, codes, cb, m=8, k=7, table_probes=True).collect()))
    assert a == b and len(a) == 5 * 7


def test_char_shingles_basic_and_agnostic_pipeline(spark):
    """Char 4-grams of 'ab cd' normalize to {'ab c','b cd'}; short
    strings yield empty; the LSH pipeline accepts the swapped basis
    and still finds the exact duplicate pair."""
    from db_factfinder_spark.llmdata.dedup import (
        char_shingles,
        minhash_dedup_pairs,
    )

    df = spark.createDataFrame(
        [(1, "Ab cd"), (2, "ab")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["g"] for r in df.select(
        "doc_id", char_shingles("text", 4).alias("g")
    ).collect()}
    assert sorted(out[1]) == ["ab c", "b cd"]
    assert out[2] == []

    dup = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "completely different words here")],
        "doc_id long, text string",
    )
    pairs = minhash_dedup_pairs(
        dup, num_hashes=8, bands=4, verify_threshold=0.6,
        max_bucket=None, shingle_fn=lambda c: char_shingles(c, 4),
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] == 1.0
