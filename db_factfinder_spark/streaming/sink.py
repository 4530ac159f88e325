"""Exactly-once keyed upsert sink for Structured Streaming.

``foreachBatch`` gives at-least-once delivery: after a crash the
engine REPLAYS the last micro-batch, so a sink that blindly appends
double-counts and one that blindly merges re-applies.  The standard
fix (what Delta's idempotent writes and the Kafka transactional sink
do) is to make the sink transactional on ``(batch_id)``: each batch
commits a new table version together with a marker naming the batch
that produced it, and a replayed ``batch_id`` that already has a
marker is acknowledged without touching the table.

This module implements that contract over plain parquet:

    table_dir/
      v00000001/ ... parquet snapshot versions ...
      _commits/00000001   (content: snapshot version; written last)

Writer protocol per batch: read latest committed snapshot → fold the
micro-batch in with ``merge_upsert`` (last-writer-wins + tombstones,
one shuffle) → write snapshot v+1 → write the commit marker.  The
marker is the commit point: a crash before it leaves an orphan
snapshot directory that the next attempt simply overwrites; readers
resolve the latest *marked* version, so they never observe a torn
write.  Replay safety + marker-last ordering = effectively-once
output.

Scale: state per commit is one small marker file; the snapshot
rewrite is the standard copy-on-write table format trade-off (Delta
without the transaction log compaction).  For huge tables the same
sink composes with partition-pruned snapshots; the *protocol* — which
is what this module pins with tests — is unchanged.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from db_factfinder_spark.operators.merge import merge_upsert

__all__ = ["UpsertSink", "read_table", "committed_batches", "vacuum"]


def _commit_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_commits")


def _latest_version(table_dir: str) -> int | None:
    cd = _commit_dir(table_dir)
    if not os.path.isdir(cd):
        return None
    versions = []
    for marker in os.listdir(cd):
        if not marker.isdigit():
            continue  # in-flight .tmp markers are not commits
        with open(os.path.join(cd, marker)) as f:
            versions.append(int(f.read().strip()))
    return max(versions) if versions else None


def committed_batches(table_dir: str) -> set[int]:
    cd = _commit_dir(table_dir)
    if not os.path.isdir(cd):
        return set()
    return {int(m) for m in os.listdir(cd) if m.isdigit()}


def read_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame | None:
    """Latest committed snapshot (or, with ``version``, the time-travel
    read of that committed version), or None before the first commit.
    Never reads an un-marked (torn) snapshot; a requested version that
    was never committed — or was vacuumed — raises rather than
    silently serving a torn or missing directory."""
    if version is None:
        version = _latest_version(table_dir)
        if version is None:
            return None
    else:
        committed = set()
        cd = _commit_dir(table_dir)
        if os.path.isdir(cd):
            for marker in os.listdir(cd):
                if marker.isdigit():
                    with open(os.path.join(cd, marker)) as f:
                        committed.add(int(f.read().strip()))
        if version not in committed:
            raise ValueError(f"version {version} was never committed")
    path = os.path.join(table_dir, f"v{version:08d}")
    if not os.path.isdir(path):
        raise ValueError(f"version {version} has been vacuumed")
    return spark.read.parquet(path)


class UpsertSink:
    """``foreachBatch`` handler: exactly-once keyed upsert into a
    versioned parquet table.

    >>> sink = UpsertSink(table_dir, keys=["id"], order_by=["ver", "id"])
    >>> stream.writeStream.foreachBatch(sink).trigger(availableNow=True)

    ``delete_col`` (optional) names a boolean column marking
    tombstones — rows whose winning version deletes the key.
    """

    def __init__(
        self,
        table_dir: str,
        keys: Sequence[str],
        order_by: Sequence[str],
        delete_col: str | None = None,
    ) -> None:
        self.table_dir = table_dir
        self.keys = list(keys)
        self.order_by = list(order_by)
        self.delete_col = delete_col
        os.makedirs(_commit_dir(table_dir), exist_ok=True)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F

        if batch_id in committed_batches(self.table_dir):
            return  # replay of an already-committed batch: ack, no-op
        spark = batch_df.sparkSession
        base = read_table(spark, self.table_dir)
        delete_flag = (
            F.col(self.delete_col) if self.delete_col else None
        )
        if base is None:
            merged = merge_upsert(
                batch_df.limit(0), batch_df, self.keys, self.order_by,
                delete_flag=delete_flag,
            )
        else:
            merged = merge_upsert(
                base, batch_df, self.keys, self.order_by,
                delete_flag=delete_flag,
            )
        cur = _latest_version(self.table_dir)
        nxt = (cur or 0) + 1
        snap = os.path.join(self.table_dir, f"v{nxt:08d}")
        # overwrite handles the orphan left by a crash after the
        # snapshot write but before the marker (the replayed batch
        # lands on the same version number)
        merged.write.mode("overwrite").parquet(snap)
        marker = os.path.join(_commit_dir(self.table_dir), f"{batch_id:08d}")
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, marker)  # atomic commit point


def vacuum(table_dir: str, keep_last: int = 1) -> list[str]:
    """Garbage-collect old snapshot versions, keeping the newest
    ``keep_last`` committed ones — the copy-on-write table's disk
    reclamation pass (Delta's VACUUM).

    Commit markers are NEVER removed: they are the replay-idempotency
    ledger (a few bytes per batch) and deleting them would let a
    crash-replayed batch re-apply.  Returns the removed snapshot
    paths.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    cd = _commit_dir(table_dir)
    committed = []
    if os.path.isdir(cd):
        for marker in os.listdir(cd):
            if not marker.isdigit():
                continue
            with open(os.path.join(cd, marker)) as f:
                committed.append(int(f.read().strip()))
    keep = set(sorted(committed)[-keep_last:])
    removed = []
    for entry in os.listdir(table_dir):
        if not (entry.startswith("v") and entry[1:].isdigit()):
            continue
        if int(entry[1:]) in keep:
            continue
        path = os.path.join(table_dir, entry)
        shutil.rmtree(path)
        removed.append(path)
    return sorted(removed)
