"""Small-file compaction — the table-maintenance pass every streaming
or incremental lakehouse table needs.

Micro-batch sinks and per-partition writers leave thousands of tiny
parquet files behind; at 100 TB the scan then pays one task + one
footer read + one open/close per file, and the NameNode/object-store
listing becomes the bottleneck before any byte of data does.  The fix
is periodic rewrite into ~target-sized files.  This module plans the
rewrite from actual on-disk bytes (never row counts — row width
varies) and executes it with a single shuffle-free coalesce when
shrinking, or a hash repartition when files must grow in number.

The reference engine never needs this (single-node, one output file);
it's part of the operational surface a cluster deployment adds.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["plan_compaction", "compact_parquet"]


def plan_compaction(
    src_dir: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Inspect a parquet directory and size the rewrite.

    Returns ``{"n_files", "total_bytes", "target_files",
    "small_files"}`` where ``small_files`` counts inputs under half
    the target — the fragmentation signal that triggers compaction
    (the usual policy: compact when small_files / n_files is high).
    Driver-side listing is O(files) metadata, no data reads.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    files = [
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    sizes = [os.path.getsize(f) for f in files]
    total = sum(sizes)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_files": max(1, math.ceil(total / target_bytes)),
        "small_files": sum(1 for s in sizes if s < target_bytes // 2),
    }


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``src_dir``'s parquet files into ``dst_dir`` at
    ~``target_bytes`` per file.  Rows are preserved exactly (no
    ordering contract — parquet scans don't have one).

    When the file count shrinks — the overwhelmingly common case —
    the rewrite uses ``coalesce``: a narrow dependency, NO shuffle,
    each output task just concatenates input splits.  Only a rewrite
    that must *increase* parallelism pays a round-robin repartition.
    Returns the plan dict with ``"files_written"`` added.
    """
    plan = plan_compaction(src_dir, target_bytes)
    df: DataFrame = spark.read.parquet(src_dir)
    n = plan["target_files"]
    if n <= max(plan["n_files"], 1):
        out = df.coalesce(n)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst_dir)
    written = [
        f
        for f in os.listdir(dst_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    plan["files_written"] = len(written)
    return plan
