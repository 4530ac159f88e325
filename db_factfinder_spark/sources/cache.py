"""Parquet checkpoint cache — the engine's answer to the reference's
two-level pickle memoization (download.py:158-167, calculate.py:49-58,
utils.py:63-69).

Keyed ``year=/geography=/geotype=/variable`` exactly like the
reference's cache paths, but stored as Parquet so a cached intermediate
is itself a first-class, partition-prunable table.  Within a session,
plan-level memoization (plans/planner.py) plus optional ``persist()``
covers the hot path; this layer makes results durable across sessions
and across batch-driver restarts.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class CheckpointCache:
    def __init__(self, spark: SparkSession, root: str | Path | None):
        self.spark = spark
        self.root = Path(root) if root else None

    def _path(self, layer: str, year: int, geography: str, geotype: str, variable: str) -> Path:
        assert self.root is not None
        return (
            self.root
            / layer
            / f"year={year}"
            / f"geography={geography}"
            / f"geotype={geotype}"
            / variable
        )

    def get_or_compute(
        self,
        layer: str,
        year: int,
        geography: str,
        geotype: str,
        variable: str,
        compute: Callable[[], DataFrame],
    ) -> DataFrame:
        """Return the cached frame if present, else compute → write →
        re-read (so downstream plans scan Parquet, not the original
        lineage — same cut-the-lineage effect as checkpointing)."""
        if self.root is None:
            return compute()
        path = self._path(layer, year, geography, geotype, variable)
        marker = path / "_SUCCESS"
        if not marker.exists():
            compute().write.mode("overwrite").parquet(str(path))
        return self.spark.read.parquet(str(path))
