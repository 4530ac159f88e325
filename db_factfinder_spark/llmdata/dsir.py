"""DSIR-flavored target-domain data selection over hashed n-grams.

The data-curation move popularized by DSIR (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling"): score every
raw-corpus document by how much its token distribution looks like a
small target domain, using hashed n-gram bucket counts as the feature
space.  The published estimator multiplies per-bucket probability
ratios — a float product whose value depends on accumulation order,
which this engine refuses in parity-checked paths.  Instead the same
signal is extracted with exact integers only:

* a bucket ``b`` is **target-favored** iff its target rate exceeds its
  raw rate, decided by the exact int64 cross-multiplication
  ``cnt_target(b) * tot_raw > cnt_raw(b) * tot_target`` (no division);
* a document's **affinity** is the fraction of its token occurrences
  landing in target-favored buckets — at most one IEEE division per
  document, applied to exact integer numerator/denominator at the very
  end, so results are bit-stable under any partitioning.

Scale shape (100 TB): each corpus is scanned once; one explode +
groupBy builds the bucket table, which is at most ``n_buckets`` rows
*regardless of corpus size* and therefore always broadcastable.
Scoring is a map-side broadcast probe plus one groupBy on the doc id.
Corpus totals cross the plan as one-row broadcast aggregates (the
engine's scalar idiom), never via ``collect``.

Reference analogy: factfinder keeps per-variable metadata tiny and
broadcast-shaped next to big fact scans (``calculate.py:49-58``); the
bucket table plays the same role here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["target_favored_buckets", "dsir_affinity"]


def _bucket28(token: Column, n_buckets: int) -> Column:
    """Stable bucket in [0, n_buckets): first 28 md5 bits of the token.

    DuckDB equivalent (oracle mirror):
    ``('0x' || substr(md5(t), 1, 7))::BIGINT % n_buckets``.
    """
    h = F.conv(F.substring(F.md5(token), 1, 7), 16, 10).cast("long")
    return h % F.lit(n_buckets)


def _token_buckets(
    docs: DataFrame, text_col: str, n_buckets: int
) -> DataFrame:
    """One row per token occurrence with its hashed bucket."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t")
        )
        .filter(F.col("t") != "")
        .select(_bucket28(F.col("t"), n_buckets).alias("bucket"))
    )


def target_favored_buckets(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-bucket occurrence counts with the target-favored verdict.

    Returns ``bucket, cnt_target, cnt_raw, favored`` where ``favored``
    is the exact cross-multiply ``cnt_target·tot_raw > cnt_raw·
    tot_target``.  A bucket seen only in the target corpus is favored
    (lhs > 0 = rhs); one seen only raw is not.  Output is bounded by
    ``n_buckets`` rows — broadcastable at any corpus size.
    """
    t = (
        _token_buckets(target, text_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt_target"))
    )
    r = (
        _token_buckets(raw, text_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt_raw"))
    )
    both = t.join(r, "bucket", "full").fillna(
        0, subset=["cnt_target", "cnt_raw"]
    )
    totals = both.agg(
        F.sum("cnt_target").alias("tot_target"),
        F.sum("cnt_raw").alias("tot_raw"),
    )
    return both.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "cnt_target",
        "cnt_raw",
        (
            F.col("cnt_target") * F.col("tot_raw")
            > F.col("cnt_raw") * F.col("tot_target")
        ).alias("favored"),
    )


def dsir_affinity(
    docs: DataFrame,
    buckets: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document target affinity over a favored-bucket table.

    Returns ``{id_col}, n_tok, n_fav, affinity`` where ``n_tok`` /
    ``n_fav`` are exact int64 token-occurrence counts and ``affinity``
    is the single terminal IEEE division ``n_fav / n_tok``.  ``buckets``
    (from :func:`target_favored_buckets`, or persisted from a prior
    run — the table is tiny and reusable across scoring batches) is
    broadcast; tokens absent from it count as not favored.
    """
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t"),
        )
        .filter(F.col("t") != "")
        .select(id_col, _bucket28(F.col("t"), n_buckets).alias("bucket"))
    )
    probed = toks.join(
        F.broadcast(buckets.select("bucket", "favored")), "bucket", "left"
    )
    return probed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(
            F.when(F.coalesce(F.col("favored"), F.lit(False)), 1).otherwise(0)
        ).alias("n_fav"),
        (
            F.sum(
                F.when(
                    F.coalesce(F.col("favored"), F.lit(False)), 1
                ).otherwise(0)
            )
            / F.count(F.lit(1))
        ).alias("affinity"),
    )
