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


def recrawl_priority(
    df: DataFrame,
    url_col: str = "url",
    order_col: str = "visit_id",
    state_col: str = "content_hash",
) -> DataFrame:
    """Per-URL change-rate estimation for recrawl scheduling (Cho &
    Garcia-Molina 2003): from each URL's visit history, count the
    intervals whose content changed and estimate the Poisson change
    rate ``λ = −ln(1 − X/n)`` per interval — the score a crawler
    sorts by to spend its budget on fast-changing pages.

    ``λ`` reduces to ``ln(n) − ln(n−X)`` — portable_ln over EXACT
    INTEGER counts, quantized to nano-units: bit-identical on any
    engine, no libm.  Saturated histories (every interval changed,
    X = n) break the estimator (ln 0); they surface as
    ``saturated = true`` with NULL lambda — schedule them at maximum
    priority by flag, don't fake a rate.

    Plan: one lag window per URL + one groupBy on the same key (AQE
    reuses the exchange); linear in visits.
    """
    from db_factfinder_spark.functions.portable_math import portable_ln

    w = Window.partitionBy("url").orderBy("__ord")
    flagged = df.select(
        F.col(url_col).alias("url"),
        F.col(order_col).alias("__ord"),
        F.col(state_col).alias("__state"),
    ).withColumn("__prev", F.lag("__state").over(w))
    agg = (
        flagged.filter(F.col("__prev").isNotNull())
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(
                (~F.col("__state").eqNullSafe(F.col("__prev"))).cast("long")
            ).alias("n_changed"),
        )
    )
    n = F.col("n_intervals")
    x = F.col("n_changed")
    lam = F.floor(
        (portable_ln(n) - portable_ln(n - x)) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    return agg.select(
        "url",
        "n_intervals",
        "n_changed",
        (x == n).alias("saturated"),
        F.when((x < n) & (n > 0), lam).alias("lambda_nano"),
    )
