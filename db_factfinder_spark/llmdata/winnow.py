"""Winnowing fingerprints (MOSS) and document-stitching detection.

Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS plagiarism
detector) selects, for every sliding window of ``w`` consecutive char
``k``-gram hashes, the window MINIMUM — guaranteeing that any shared
substring of length ≥ ``k + w − 1`` contributes at least one shared
fingerprint, while keeping the fingerprint density at ~``2/(w+1)`` of
the grams.  It is the LOCAL-similarity complement to MinHash (which
sketches whole-set resemblance): two documents sharing one long
passage but nothing else have near-zero Jaccard yet many shared
winnowing fingerprints.

The reference has no counterpart (its 2,156 LoC are census ETL); this
is extension surface for the training-data pipeline, where winnowing
is the standard license-text / quotation / plagiarism detector.

Scale shape: fingerprinting is per-row expressions only (one md5 per
k-gram, window minima via ``transform``+``slice`` over the let-bound
hash array — no shuffle, no UDF); the pair stage is one equi-join on
the fingerprint key with the same hot-bucket hazard as every postings
join — ``max_df`` reuses :func:`cap_hot_buckets`'s drop-the-flood
contract (capped result ⊆ exact result).

All hashing is the engine's md5-28-bit idiom so the DuckDB oracle
reproduces signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db_factfinder_spark.functions.expr import let
from db_factfinder_spark.llmdata.checkpointing import materialize
from db_factfinder_spark.llmdata.dedup import _md5_long28, cap_hot_buckets
from db_factfinder_spark.llmdata.textstats import normalize_text

# Default flood-fingerprint cap (documents sharing one fingerprint):
# pair fan-out per fingerprint is C(df, 2), so one boilerplate passage
# shared by 10^5 docs alone emits 5×10^9 candidate pairs at corpus
# scale.  128 keeps every plausible quotation/near-dup cluster while
# bounding any single fingerprint's fan-out at ~8k pairs.
DEFAULT_MAX_DF = 128

__all__ = [
    "winnow_fingerprint_sets",
    "winnow_pairs",
    "stitch_candidates",
]


def _winnow_fps(text: Column, k: int, w: int) -> Column:
    """Distinct winnowing fingerprints of one normalized text —
    ``array<long>``, empty when the text is shorter than ``k``.

    Both the normalized text and the hash array are let-bound: the
    per-gram lambda must slice a MATERIALIZED string, not re-run the
    normalize regexes per gram (the O(len²) trap ``shingles()``
    documents — inlining cost a measured 50× here), and the window
    minima must slice a materialized hash array."""

    def over_hashes(hs: Column) -> Column:
        m = F.size(hs) - (w - 1)
        # fewer grams than one window → a single whole-text window
        # (the standard winnowing boundary convention)
        n_win = F.greatest(m, F.lit(1))
        return F.when(
            F.size(hs) >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_win),
                    lambda j: F.array_min(F.slice(hs, j, w)),
                )
            ),
        ).otherwise(F.array().cast("array<long>"))

    def over_t(t: Column) -> Column:
        n = F.length(t)
        hashes = F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: _md5_long28(t.substr(i, F.lit(k))),
            ),
        ).otherwise(F.array().cast("array<long>"))
        return let(hashes, over_hashes)

    return let(normalize_text(text), over_t)


def winnow_fingerprint_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Per-document winnowing fingerprint set: ``id, fps`` with
    ``fps`` the distinct window-minimum hashes.  Pure map-side."""
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        _winnow_fps(F.col(text_col), k, w).alias("fps"),
    ).filter(F.size("fps") >= 1)


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = DEFAULT_MAX_DF,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints
    — the passage-level near-dup/quotation detector.

    One explode + one equi-join on the fingerprint; ``max_df`` drops
    flood fingerprints (ubiquitous boilerplate passages) before the
    self-join, subset contract as in :func:`cap_hot_buckets`.  The
    cap is ON BY DEFAULT (``DEFAULT_MAX_DF`` = 128: a fingerprint
    shared by more documents is boilerplate, and its pair fan-out is
    quadratic) so a corpus-scale caller gets the flood guard without
    reading PERF_NOTES; pass ``max_df=None`` explicitly for the
    exact uncapped semantics.
    Guarantee (SIGMOD'03 Thm. 1): a shared substring of length
    ≥ ``k + w − 1`` normalized chars always produces ≥ 1 shared
    fingerprint, so ``min_shared`` trades recall on short quotes for
    precision on boilerplate echoes.
    """
    # materialize the fingerprinted postings once: the self-join would
    # otherwise re-run normalize -> k-gram md5 -> window minima on
    # BOTH sides (Spark reuses no exchange across differently-aliased
    # self-join inputs) — the same shingle-once discipline as
    # jaccard_pairs
    fps = winnow_fingerprint_sets(df, text_col, id_col, k, w)
    posted = materialize(
        fps.select("id", F.explode("fps").alias("fp")), checkpoint_mode
    )
    posted = cap_hot_buckets(posted, ["fp"], max_df)
    a, b = posted.alias("a"), posted.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def stitch_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 30,
    max_key_df: int | None = None,
) -> DataFrame:
    """Detect documents that are FRAGMENTS of one original: pairs
    where A's trailing ``k`` normalized chars equal B's leading ``k``
    — the split-record/pagination artifact a crawl pipeline stitches
    back together before training.

    Head/tail fingerprints are per-row md5 expressions; the candidate
    stage is one equi-join on the 28-bit key with an exact string
    verify (hash collisions removed), so no false positives.  Docs
    shorter than ``k`` normalized chars cannot anchor a stitch and are
    excluded.  Self-pairs are excluded; A→B and B→A are distinct
    directions (tail-of-A = head-of-B is asymmetric).

    ``max_key_df`` is the hot-key guard: a boilerplate opening (the
    same cookie banner starting thousands of docs) makes one head key
    match every tail ending with it — O(m·n) join rows in one task.
    With a cap, any head/tail key carried by more than ``max_key_df``
    records is dropped WHOLESALE before the join (cap_hot_buckets'
    subset contract: such a key stitches nothing specific anyway).

    Returns ``id_prev, id_next, boundary`` (the shared k-char run).
    """
    t = normalize_text(F.col(text_col))
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), t.alias("t"))
        .filter(F.length("t") >= k)
    )
    heads = base.select(
        F.col("id").alias("id_next"),
        F.substring("t", 1, k).alias("head"),
        _md5_long28(F.substring("t", 1, k)).alias("hk"),
    )
    tails = base.select(
        F.col("id").alias("id_prev"),
        F.col("t").substr(F.length("t") - (k - 1), F.lit(k)).alias("tail"),
    ).withColumn("tk", _md5_long28(F.col("tail")))
    heads = cap_hot_buckets(heads, ["hk"], max_key_df)
    tails = cap_hot_buckets(tails, ["tk"], max_key_df)
    return (
        tails.join(heads, F.col("tk") == F.col("hk"))
        .filter(
            (F.col("id_prev") != F.col("id_next"))
            & (F.col("tail") == F.col("head"))
        )
        .select("id_prev", "id_next", F.col("tail").alias("boundary"))
    )
