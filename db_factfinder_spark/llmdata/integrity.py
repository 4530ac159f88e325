"""Corpus reproducibility fingerprints (anti-entropy checksums).

Two pipeline runs that SHOULD have produced the same training corpus
need a cheap, order-independent way to prove it — row order, partition
count, and task scheduling all legitimately differ between runs, so
the fingerprint must be invariant to them.  The classic answer
(Dynamo/Cassandra anti-entropy, Merkle-style) is a per-shard XOR fold
of per-record digests: XOR is commutative and associative, so any
partitioning and any arrival order produce the same shard checksum,
and shard checksums XOR together into the corpus root — the same
algebraic-merge shape as the HLL partials (`llmdata/sketches.py`).

md5 is the digest (engine-portable, never engine-native hash); the two
60-bit halves keep the fold in exact BIGINT territory on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_checksums", "merge_checksums"]


def _digest_halves(key: Column) -> tuple[Column, Column]:
    h = F.md5(key)
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
        F.conv(F.substring(h, 16, 15), 16, 10).cast("long"),
    )


def corpus_checksums(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 16,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Per-shard XOR checksums + the corpus root row.

    Each document digests as ``md5(id || ':' || text)`` (the id is
    part of the record identity: two runs that swap texts between ids
    must NOT collide).  Shard = md5(id) mod ``n_shards`` — stable
    across runs, independent of physical partitioning.  Output: one
    row per shard (``shard, n_docs, xor_hi, xor_lo``) plus the corpus
    root as ``shard = -1``, derived by merging the SHARD rows (XOR of
    XORs, sum of counts — the algebraic-merge property a two-run diff
    exploits to localize a mismatch to a shard without re-reading the
    corpus).

    One map-side-combined groupBy over the data; the shard frame is
    materialized (``checkpoint_mode``) so the root-merge union branch
    reuses it instead of re-scanning and re-digesting the corpus.
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    rec = F.concat(
        F.col(id_col).cast("string"), F.lit(":"), F.col(text_col)
    )
    hi, lo = _digest_halves(rec)
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(n_shards).cast("long"),
    )
    shards = (
        df.select(
            shard.alias("shard"), hi.alias("__hi"), lo.alias("__lo")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("bit_xor(__hi)").alias("xor_hi"),
            F.expr("bit_xor(__lo)").alias("xor_lo"),
        )
    )
    shards = materialize(shards, checkpoint_mode)
    return shards.unionByName(merge_checksums(shards))


def merge_checksums(shards: DataFrame) -> DataFrame:
    """Fold shard checksum rows into the corpus root (``shard = -1``):
    XOR of XORs, exact count sum.  Works on any subset of shards —
    the mismatch-localization primitive (diff roots; if they differ,
    diff shards; only mismatching shards need re-reading)."""
    return shards.agg(
        F.sum("n_docs").alias("n_docs"),
        F.expr("bit_xor(xor_hi)").alias("xor_hi"),
        F.expr("bit_xor(xor_lo)").alias("xor_lo"),
    ).select(
        F.lit(-1).cast("long").alias("shard"),
        "n_docs",
        "xor_hi",
        "xor_lo",
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: per document id,
    classify ``added`` / ``removed`` / ``changed`` / ``unchanged`` by
    content fingerprint (md5 of the normalized text — the same
    content-defined key the dedup family uses, so re-partitioning or
    re-ingestion order can never show up as a change).

    One full-outer join on the id — the release-gate readout before a
    new corpus version ships (how much churned, what to re-embed /
    re-dedup incrementally).  NULL text fingerprints as NULL and
    compares NULL-safely (two NULL-text versions of a doc are
    ``unchanged``).

    Returns ``(id_col, status, old_fp, new_fp)``."""
    from db_factfinder_spark.llmdata.textstats import fingerprint

    o = old.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("old_fp")
    )
    n = new.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("new_fp")
    )
    # presence must be tracked separately from the fingerprint —
    # a NULL-text doc is PRESENT with a NULL fingerprint
    j = o.withColumn("in_old", F.lit(True)).join(
        n.withColumn("in_new", F.lit(True)), id_col, "full_outer"
    )
    status = (
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(id_col, status.alias("status"), "old_fp", "new_fp")
