"""Crawl-frontier scheduling — the acquisition side of a training-data
pipeline.  A 100 TB corpus starts as a URL frontier; fetching it is
bounded not by cluster throughput but by per-host politeness (one
request per host per delay window), so the scheduler's job is to turn
a ranked frontier into (worker, time-slot) assignments that keep every
worker busy WITHOUT two workers ever hitting the same host.

Shape: one window per host (rank by priority) + a sticky host→worker
hash — no global ordering, no driver-side loop.  Hosts are the natural
partition key; the per-host window never shuffles more than a host's
own URLs, and the worker assignment is a map-side expression, so the
plan is two exchanges (window + none) regardless of frontier size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["crawl_schedule"]


def crawl_schedule(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    n_workers: int = 8,
    per_host_delay_s: int = 10,
) -> DataFrame:
    """Assign each frontier URL a worker and a fetch offset.

    * ``slot``: the URL's position in its host's queue (priority desc,
      url asc — deterministic).
    * ``fetch_offset_s`` = slot × ``per_host_delay_s``: the earliest
      politeness-legal fetch time relative to crawl start.
    * ``worker``: md5(host) mod ``n_workers`` — STICKY per host, so
      politeness is enforceable locally by one worker with a monotone
      clock; no cross-worker coordination.

    Output: host, url, priority, slot, fetch_offset_s, worker.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.desc(priority_col), F.asc(url_col)
    )
    slot = F.row_number().over(w) - F.lit(1)
    worker = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(host_col).cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(n_workers).cast("long"),
    )
    return df.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(priority_col).alias("priority"),
        slot.alias("slot"),
        (slot.cast("long") * F.lit(per_host_delay_s)).alias(
            "fetch_offset_s"
        ),
        worker.alias("worker"),
    )
